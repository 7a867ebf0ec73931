"""SELL gather-scheduled sparse operator (core/sell.py): round algebra vs
scipy on both the XLA path and the Pallas kernel (interpret mode on CPU),
scheduler constraint stress cases, and make_operator format selection."""

import numpy as np
import jax.numpy as jnp
import scipy.sparse as sp

from permon_tpu.core.sell import RB, SEll, _sell_mv_pallas
from permon_tpu.core.dia import Dia
from permon_tpu.core.linop import Ell
from permon_tpu.core.matutils import make_operator


def _permuted_laplacian_2d(nx, seed=0):
    n1 = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(nx, nx), format="csr")
    i1 = sp.identity(nx, format="csr")
    a = (sp.kron(n1, i1) + sp.kron(i1, n1)).tocsr()
    perm = np.random.RandomState(seed).permutation(a.shape[0])
    return a[perm][:, perm].tocsr()


def _check(a, op, rtol=1e-12):
    x = np.random.RandomState(1).rand(a.shape[1])
    y = np.asarray(op.mv(jnp.asarray(x)))
    ref = a @ x
    np.testing.assert_allclose(y, ref, atol=rtol * max(np.abs(ref).max(), 1.0))


class TestSEll:
    def test_mv_matches_scipy_xla(self):
        a = _permuted_laplacian_2d(40)  # n=1600: 2 tiles, arbitrary pattern
        rep = {}
        op = SEll.from_scipy(a, report=rep)
        assert rep["rounds"] >= 1 and op.tid.shape[0] % RB == 0
        _check(a, op)

    def test_pallas_interpret_matches_scipy(self):
        a = _permuted_laplacian_2d(40)
        for win in (1024, 2048, 4096):
            op = SEll.from_scipy(a, win=win)
            x = np.random.RandomState(2).rand(1600).astype(np.float32)
            y = _sell_mv_pallas(
                op.wstart, op.tid, op.SC, op.V.astype(jnp.float32),
                op._x2d(jnp.asarray(x)), op.ntiles, op.win // 128,
                interpret=True,
            )[: a.shape[0]]
            ref = (a @ x).astype(np.float32)
            np.testing.assert_allclose(np.asarray(y), ref, atol=1e-4)

    def test_wider_windows_raise_slot_efficiency(self):
        a = _permuted_laplacian_2d(40)
        effs = {}
        for win in (1024, 4096):
            rep = {}
            SEll.from_scipy(a, win=win, report=rep)
            effs[win] = rep["efficiency"]
        assert effs[4096] >= effs[1024]

    def test_auto_window_reports_choice(self):
        a = _permuted_laplacian_2d(40)
        rep = {}
        op = SEll.from_scipy(a, win="auto", report=rep)
        assert rep["win"] == op.win and op.win in (1024, 2048, 4096)
        _check(a, op)

    def test_rectangular_with_transpose(self):
        b = sp.random(300, 1600, density=0.01, random_state=np.random.RandomState(3)).tocsr()
        op = SEll.from_scipy(b, with_transpose=True)
        _check(b, op)
        y = np.random.RandomState(4).rand(300)
        np.testing.assert_allclose(
            np.asarray(op.rmv(jnp.asarray(y))), b.T @ y, atol=1e-12
        )

    def test_dense_column_lane_conflicts(self):
        # a dense column forces many rows in one sublane group to read the
        # SAME window lane — the scheduler must resolve via extra rounds
        a = _permuted_laplacian_2d(20).tolil()
        a[:, 7] = 1.5
        a = a.tocsr()
        _check(a, op=SEll.from_scipy(a))

    def test_small_and_unaligned_sizes(self):
        for m, n in [(5, 5), (130, 130), (1025, 1025), (1024, 300)]:
            a = sp.random(m, n, density=0.05, random_state=np.random.RandomState(m))
            a = a.tocsr()
            _check(a, SEll.from_scipy(a))

    def test_rows_and_tiles_without_nonzeros(self):
        # rows 0..1023 empty: tile 0 must still be written (zeroed)
        a = sp.lil_matrix((2048, 2048))
        a[1500, 3] = 2.0
        a[2047, 2047] = -1.0
        _check(a.tocsr(), SEll.from_scipy(a.tocsr()))

    def test_python_scheduler_matches_native(self):
        from permon_tpu.utils import native as nat

        a = _permuted_laplacian_2d(20, seed=5)
        lib = nat._lib
        try:
            nat._lib, nat._tried = None, True  # force python fallback
            op_py = SEll.from_scipy(a)
        finally:
            nat._lib, nat._tried = lib, True
        op_nat = SEll.from_scipy(a)
        x = np.random.RandomState(6).rand(a.shape[0])
        np.testing.assert_allclose(
            np.asarray(op_py.mv(jnp.asarray(x))),
            np.asarray(op_nat.mv(jnp.asarray(x))), atol=1e-12,
        )


class TestGatherPlan:
    """Pure-gather plans (core/sell.gather_plan): an arbitrary index table
    run through the SELL round machinery must MOVE values bitwise — the
    masked-select kernel gathers the raw 32-bit words (two channels per
    f64), so full mantissas, subnormals and signed zeros survive and
    solver trajectories cannot shift."""

    def _plan_and_ref(self, seed=0, nslots=5000, n_src=700, kernel=False):
        from permon_tpu.core.sell import gather_plan

        rng = np.random.RandomState(seed)
        idx = rng.randint(0, n_src, size=nslots).astype(np.int64)
        idx[rng.rand(nslots) < 0.3] = n_src  # pad slots
        plan = gather_plan(idx, n_src)
        if kernel:  # exercise the production kernel path on CPU
            plan = plan.replace(use_pallas=True, interpret=True)
        return plan, idx

    def test_f32_fallback_bitwise(self):
        plan, idx = self._plan_and_ref()
        assert not plan.use_pallas  # CPU backend -> table-gather fallback
        x = np.random.RandomState(1).rand(700).astype(np.float32)
        xp = np.concatenate([x, [0.0]]).astype(np.float32)
        got = np.asarray(plan(jnp.asarray(x)))
        assert got.dtype == np.float32
        np.testing.assert_array_equal(got, xp[np.minimum(idx, 700)])

    def test_f64_kernel_bitwise(self):
        plan, idx = self._plan_and_ref(seed=2, kernel=True)
        # values that do NOT fit f32: full f64 mantissas, wide exponents,
        # f64 subnormals, signed zero
        x = np.random.RandomState(3).rand(700) * np.exp(
            np.random.RandomState(4).randn(700) * 30
        )
        x[10] = 5e-324
        x[11] = -0.0
        x[12] = np.nan
        xp = np.concatenate([x, [0.0]])
        got = np.asarray(plan(jnp.asarray(x)))
        assert got.dtype == np.float64
        np.testing.assert_array_equal(
            got.view(np.int64), xp[np.minimum(idx, 700)].view(np.int64)
        )

    def test_f32_kernel_bitwise(self):
        plan, idx = self._plan_and_ref(seed=5, nslots=3000, n_src=2500,
                                       kernel=True)
        x = np.random.RandomState(6).rand(2500).astype(np.float32)
        xp = np.concatenate([x, [0.0]]).astype(np.float32)
        got = np.asarray(plan(jnp.asarray(x)))
        np.testing.assert_array_equal(
            got.view(np.int32), xp[np.minimum(idx, 2500)].view(np.int32)
        )


class TestExtensionSellGather:
    """SubdomainExtension.with_sell_gather: mv/rmv bitwise-identical to the
    plain gather-table path (the contract that lets the large path swap the
    kernel in without re-pinning any iteration-count oracle)."""

    def _ext(self, seed=0):
        from permon_tpu.core.extension import SubdomainExtension

        rng = np.random.RandomState(seed)
        ns, nl, m, nnz = 6, 500, 900, 2500
        rows = rng.randint(0, m, nnz)
        cols = rng.randint(0, ns * nl, nnz)
        vals = rng.randn(nnz)
        B = SubdomainExtension.from_coo(rows, cols, vals, m=m, ns=ns, nl=nl)
        return B.with_gather_apply()

    @staticmethod
    def _kernelize(B):
        """Route the attached plans through the interpreted pallas kernel
        (the TPU production path, runnable on CPU)."""
        return B.replace(
            sB=B.sB.replace(use_pallas=True, interpret=True),
            sBt=B.sBt.replace(use_pallas=True, interpret=True),
        )

    def test_mv_rmv_bitwise_f64(self):
        B = self._ext()
        Bs = B.with_sell_gather()
        u = np.random.RandomState(1).randn(B.ns * B.nl)
        lam = np.random.RandomState(2).randn(B.m_dual)
        np.testing.assert_array_equal(
            np.asarray(Bs.mv(jnp.asarray(u))), np.asarray(B.mv(jnp.asarray(u)))
        )
        np.testing.assert_array_equal(
            np.asarray(Bs.rmv(jnp.asarray(lam))),
            np.asarray(B.rmv(jnp.asarray(lam))),
        )

    def test_mv_rmv_bitwise_f32(self):
        B = self._ext(seed=3)
        Bs = B.with_sell_gather()
        u = np.random.RandomState(4).randn(B.ns * B.nl).astype(np.float32)
        lam = np.random.RandomState(5).randn(B.m_dual).astype(np.float32)
        np.testing.assert_array_equal(
            np.asarray(Bs.mv(jnp.asarray(u))), np.asarray(B.mv(jnp.asarray(u)))
        )
        np.testing.assert_array_equal(
            np.asarray(Bs.rmv(jnp.asarray(lam))),
            np.asarray(B.rmv(jnp.asarray(lam))),
        )

    def test_mv_rmv_bitwise_kernel_path(self):
        """The interpreted pallas kernel path (what the TPU runs) is
        bitwise-identical to the table path for f64 vectors."""
        B = self._ext(seed=6)
        Bs = self._kernelize(B.with_sell_gather())
        u = np.random.RandomState(7).randn(B.ns * B.nl)
        lam = np.random.RandomState(8).randn(B.m_dual)
        np.testing.assert_array_equal(
            np.asarray(Bs.mv(jnp.asarray(u))), np.asarray(B.mv(jnp.asarray(u)))
        )
        np.testing.assert_array_equal(
            np.asarray(Bs.rmv(jnp.asarray(lam))),
            np.asarray(B.rmv(jnp.asarray(lam))),
        )


class TestMakeOperatorSelection:
    def test_unstructured_square_symmetric_goes_sell(self):
        a = _permuted_laplacian_2d(20)
        op = make_operator(a)
        assert isinstance(op, SEll) and op.symmetric
        x = np.random.RandomState(0).rand(400)
        np.testing.assert_allclose(np.asarray(op.rmv(jnp.asarray(x))), a.T @ x, atol=1e-12)

    def test_unstructured_square_nonsymmetric_gets_t_plan(self):
        a = sp.random(500, 500, density=0.03, random_state=np.random.RandomState(7)).tocsr()
        op = make_operator(a)
        assert isinstance(op, SEll) and not op.symmetric and op.t_plan is not None
        x = np.random.RandomState(8).rand(500)
        np.testing.assert_allclose(np.asarray(op.rmv(jnp.asarray(x))), a.T @ x, atol=1e-12)

    def test_banded_still_goes_dia(self):
        n1 = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(100, 100), format="csr")
        assert isinstance(make_operator(n1), Dia)

    def test_rectangular_goes_ell(self):
        a = sp.random(50, 80, density=0.1, random_state=np.random.RandomState(9))
        assert isinstance(make_operator(a), Ell)
