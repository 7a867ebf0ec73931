"""DIA operator: XLA path, sublane-dense Pallas kernel (interpret mode on
CPU), transpose apply, and automatic format selection."""

import numpy as np
import jax.numpy as jnp
import scipy.sparse as sp

from permon_tpu.core.dia import Dia, _dia_mv_pallas, _dia_mv_xla
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

    def test_pallas_kernel_interpret_matches_xla(self):
        # small shape, interpret mode (no TPU needed); f32 like the perf path
        a = _laplacian_2d(16)  # n=256, offsets 0, +-1, +-16
        op = Dia.from_scipy(a)
        data = op.data.astype(jnp.float32)
        x = jnp.asarray(np.random.RandomState(1).rand(a.shape[0]), jnp.float32)
        y_ref = _dia_mv_xla(data, x, op.offsets)
        y_pal = _dia_mv_pallas(data, x, op.offsets, tr=8, interpret=True)
        np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref), atol=1e-5)

    def test_pallas_kernel_unaligned_n(self):
        a = _laplacian_2d(13)  # n=169: exercises the lane-padding branch
        op = Dia.from_scipy(a)
        data = op.data.astype(jnp.float32)
        x = jnp.asarray(np.random.RandomState(2).rand(a.shape[0]), jnp.float32)
        y_ref = _dia_mv_xla(data, x, op.offsets)
        y_pal = _dia_mv_pallas(data, x, op.offsets, tr=8, interpret=True)
        np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref), atol=1e-5)


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
