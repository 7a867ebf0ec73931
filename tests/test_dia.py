"""DIA operator: the roofline XLA apply, transpose apply, and automatic
format selection.  (The hand-scheduled Pallas DIA kernel was removed in
round 3: it measured 12% SLOWER than the XLA lowering of the same traffic-
bound op — see PARITY.md.)"""

import numpy as np
import jax.numpy as jnp
import scipy.sparse as sp

from permon_tpu.core.dia import Dia, _dia_mv_xla
from permon_tpu.core.matutils import make_operator
from permon_tpu.core.linop import Ell


def _laplacian_2d(nx):
    n1 = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(nx, nx), format="csr")
    i1 = sp.identity(nx, format="csr")
    return (sp.kron(n1, i1) + sp.kron(i1, n1)).tocsr()


class TestDia:
    def test_mv_rmv_match_dense(self):
        a = _laplacian_2d(13)  # n=169, not a multiple of 128
        op = Dia.from_scipy(a)
        x = np.random.RandomState(0).rand(a.shape[0])
        np.testing.assert_allclose(np.asarray(op.mv(jnp.asarray(x))), a @ x, atol=1e-12)
        np.testing.assert_allclose(np.asarray(op.rmv(jnp.asarray(x))), a.T @ x, atol=1e-12)
        np.testing.assert_allclose(np.asarray(op.diagonal()), a.diagonal(), atol=1e-12)
        np.testing.assert_allclose(np.asarray(op.todense()), a.toarray(), atol=1e-12)

    def test_f32_apply_matches_f64(self):
        # the perf path runs f32; it must agree with the f64 apply to f32 eps
        a = _laplacian_2d(16)
        op = Dia.from_scipy(a)
        data = op.data.astype(jnp.float32)
        x32 = jnp.asarray(np.random.RandomState(1).rand(a.shape[0]), jnp.float32)
        y32 = _dia_mv_xla(data, x32, op.offsets)
        y64 = _dia_mv_xla(op.data, x32.astype(jnp.float64), op.offsets)
        np.testing.assert_allclose(np.asarray(y32), np.asarray(y64), atol=1e-4)


class TestMakeOperator:
    def test_banded_goes_dia(self):
        assert isinstance(make_operator(_laplacian_2d(10)), Dia)

    def test_unstructured_square_goes_sell(self):
        from permon_tpu.core.sell import SEll

        rng = np.random.RandomState(3)
        a = sp.random(200, 200, density=0.05, random_state=rng, format="csr")
        assert isinstance(make_operator(a), SEll)

    def test_rectangular_goes_ell(self):
        a = sp.random(50, 80, density=0.1, random_state=np.random.RandomState(4))
        assert isinstance(make_operator(a), Ell)
