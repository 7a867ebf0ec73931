"""Unit tests for the breadth components: transforms (scale/normalize/
freeze), TAO-analog solvers, PCPG, sys (options/tracing), vec utils, and the
Timer/OneRow operators.

Reference behaviors mirrored: QPTScaleObjectiveByScalar/Normalize*
(qptransform.c:1574-1771), QPTFreezeIneq (:1810-1826), QPSPCPG (pcpg.c),
QPSTAO (qpstao.c), permonvecutils.c, permonsys.h.
"""

import numpy as np
import pytest

import jax.numpy as jnp
import scipy.sparse as sp

import permon_tpu as pt
from permon_tpu.core.convergence import ConvergedReason, Tolerances
from permon_tpu.qp.transforms import (
    Solution,
    all_in_one,
    freeze_ineq,
    normalize_hessian,
    normalize_objective,
    scale,
    scale_objective_by_scalar,
)


def small_box_qp(n=40, seed=0):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((n, n))
    A = M @ M.T + n * np.eye(n)
    b = rng.standard_normal(n)
    lb = -0.1 * np.ones(n)
    return pt.QP.create(A, b, lb=lb)


class TestObjectiveScaling:
    def test_scale_objective_roundtrip(self):
        qp = small_box_qp()
        child, post = scale_objective_by_scalar(qp, 0.25, 2.0)
        res = pt.solve(child)
        sol = post(Solution(x=res.x))
        ref = pt.solve(qp)
        np.testing.assert_allclose(np.asarray(sol.x), np.asarray(ref.x), atol=1e-8)

    @pytest.mark.parametrize("tf", [normalize_objective, normalize_hessian])
    def test_normalize(self, tf):
        qp = small_box_qp()
        child, post = tf(qp)
        # normalized Hessian has unit norm
        assert abs(float(pt.max_eigenvalue(child.A)) - 1.0) < 1e-2
        res = pt.solve(child)
        sol = post(Solution(x=res.x))
        ref = pt.solve(qp)
        np.testing.assert_allclose(np.asarray(sol.x), np.asarray(ref.x), atol=1e-6)

    def test_inf_bounds_survive_scaling(self):
        n = 10
        qp = pt.QP.create(np.eye(n), np.ones(n), lb=np.full(n, -np.inf))
        child, _ = scale_objective_by_scalar(qp, 0.5, 3.0)
        assert np.all(np.isinf(np.asarray(child.box.lb)))


class TestFreezeIneq:
    def test_freeze_matches_dualized_solution(self):
        # equality-feasible problem: freeze BI -> BE and solve with SMALXE
        rng = np.random.default_rng(1)
        n = 20
        M = rng.standard_normal((n, n))
        A = M @ M.T + n * np.eye(n)
        b = rng.standard_normal(n)
        BI = rng.standard_normal((3, n))
        qp = pt.QP.create(A, b)
        qp = qp.replace(BI=pt.Dense.create(jnp.asarray(BI)), cI=jnp.zeros(3))
        child, post = freeze_ineq(qp)
        assert child.BI is None and child.BE is not None
        assert child.BE.shape == (3, n)
        res = pt.solve(child, qps_type="smalxe")
        sol = post(Solution(x=res.x, lambda_E=jnp.zeros(3)))
        assert sol.lambda_I is not None and sol.lambda_E is None
        # frozen constraints hold as equalities
        np.testing.assert_allclose(BI @ np.asarray(sol.x), 0.0, atol=1e-4)


class TestScale:
    def test_row_norm_scaling_preserves_solution(self):
        rng = np.random.default_rng(2)
        n = 15
        M = rng.standard_normal((n, n))
        A = M @ M.T + n * np.eye(n)
        b = rng.standard_normal(n)
        BE = rng.standard_normal((2, n))
        qp = pt.QP.create(A, b)
        qp = qp.replace(BE=pt.Dense.create(jnp.asarray(BE)), cE=jnp.zeros(2))
        child, post = scale(qp, scale_E="rows_norm_2")
        rows = np.asarray(child.BE.todense())
        np.testing.assert_allclose(np.linalg.norm(rows, axis=1), 1.0, atol=1e-12)
        from permon_tpu.solvers.cg import pcpg

        r1 = pcpg(child)
        r0 = pcpg(qp)
        np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r0.x), atol=1e-6)


class TestPCPG:
    def test_pcpg_solves_equality_qp(self):
        rng = np.random.default_rng(3)
        n = 30
        M = rng.standard_normal((n, n))
        A = M @ M.T + n * np.eye(n)
        b = rng.standard_normal(n)
        BE = rng.standard_normal((4, n))
        cE = rng.standard_normal(4) * 0.1
        qp = pt.QP.create(A, b)
        qp = qp.replace(BE=pt.Dense.create(jnp.asarray(BE)), cE=jnp.asarray(cE))
        res = pt.solve(qp, qps_type="pcpg")
        assert int(res.reason) > 0
        x = np.asarray(res.x)
        np.testing.assert_allclose(BE @ x, cE, atol=1e-8)
        # KKT: gradient orthogonal to ker BE
        g = A @ x - b
        P = np.eye(n) - BE.T @ np.linalg.solve(BE @ BE.T, BE)
        np.testing.assert_allclose(P @ g, 0.0, atol=1e-4)


class TestTAO:
    @pytest.mark.parametrize("tao_type", ["gpcg", "blmvm"])
    def test_matches_mprgp(self, tao_type):
        qp = small_box_qp()
        ref = pt.solve(qp, tol=Tolerances(rtol=1e-10))
        res = pt.solve(qp, qps_type="tao", tao_type=tao_type)
        assert int(res.reason) > 0
        np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x), atol=1e-4)


class TestAllInOne:
    def test_feti_style_pipeline(self):
        # equality-constrained QP through dualize+project, matches direct KKT
        rng = np.random.default_rng(4)
        n = 25
        M = rng.standard_normal((n, n))
        A = M @ M.T + n * np.eye(n)
        b = rng.standard_normal(n)
        BE = rng.standard_normal((3, n))
        qp = pt.QP.create(A, b)
        qp = qp.replace(BE=pt.Dense.create(jnp.asarray(BE)), cE=jnp.zeros(3))
        child, post = all_in_one(qp, dual=True, project=True)
        res = pt.solve(child)
        sol = post(Solution(x=res.x))
        x = np.asarray(sol.x)
        np.testing.assert_allclose(BE @ x, 0.0, atol=1e-6)
        kkt = np.block([[A, BE.T], [BE, np.zeros((3, 3))]])
        xs = np.linalg.solve(kkt, np.concatenate([b, np.zeros(3)]))
        np.testing.assert_allclose(x, xs[:n], atol=1e-5)


class TestSys:
    def test_options_parse_and_solve(self):
        from permon_tpu.sys.options import Options, solve_from_options

        opts = Options.from_args(
            ["-qps_rtol", "1e-7", "-qps_type", "mpgp", "-qps_mpgp_gamma", "1.0"],
            rc=False,
        )
        assert opts.get("qps_rtol") == 1e-7
        assert opts.sub("qps_mpgp_") == {"gamma": 1.0}
        qp = small_box_qp()
        res = solve_from_options(qp, opts)
        assert int(res.reason) > 0
        assert float(res.rnorm) <= 1e-7 * np.linalg.norm(np.asarray(qp.b))

    def test_tracing_events_and_counters(self):
        from permon_tpu.sys import tracing

        tracing.reset()
        with tracing.trace("setup_phase"):
            pass
        op = pt.Timer(inner=pt.Identity.create(4), name="K")
        op.mv(jnp.ones(4))
        op.rmv(jnp.ones(4))
        rep = tracing.event_report()
        assert "setup_phase" in rep and "K.mv" in rep
        assert tracing.op_counts[("K", "mv")] == 1


class TestVecUtils:
    def test_invalidate_sentinel(self):
        from permon_tpu.core import vec

        v = jnp.arange(4.0)
        vi = vec.invalidate(v)
        assert bool(vec.is_invalidated(vi))
        assert not bool(vec.is_invalidated(v))
        assert bool(vec.has_valid_values(v))
        assert not bool(vec.has_valid_values(vi))

    def test_scale_skip_inf(self):
        from permon_tpu.core import vec

        v = jnp.array([1.0, -jnp.inf, 2.0, jnp.inf])
        out = np.asarray(vec.scale_skip_inf(v, 3.0))
        np.testing.assert_allclose(out, [3.0, -np.inf, 6.0, np.inf])

    def test_is_helpers(self):
        from permon_tpu.core import vec

        assert list(vec.is_add([1, 2], 10)) == [11, 12]
        ind = vec.vec_from_is([0, 3], 5)
        assert list(vec.is_from_vec(ind)) == [0, 3]


class TestOneRow:
    def test_one_row(self):
        v = jnp.array([1.0, 2.0, 3.0])
        op = pt.OneRow(v=v)
        assert op.shape == (1, 3)
        np.testing.assert_allclose(np.asarray(op.mv(jnp.ones(3))), [6.0])
        np.testing.assert_allclose(np.asarray(op.rmv(jnp.array([2.0]))), [2, 4, 6])
        np.testing.assert_allclose(np.asarray(op.todense()), [[1, 2, 3]])


class TestResidualHistory:
    def test_mprgp_history_hook(self):
        from permon_tpu.core.convergence import history_from_aux, make_history_test

        qp = small_box_qp()
        conv_test, aux0 = make_history_test(qp.b, Tolerances(), 256)
        res = pt.mprgp(qp, conv_test=conv_test, conv_aux=aux0)
        hist = history_from_aux(res.aux, res.iterations)
        assert len(hist) == int(res.iterations) + 1
        assert not np.isnan(hist).any()
        assert hist[-1] <= 1e-5 * np.linalg.norm(np.asarray(qp.b))


class TestSmalxeView:
    def test_view_convergence_smalxe(self):
        rng = np.random.default_rng(8)
        n = 20
        M = rng.standard_normal((n, n))
        A = M @ M.T + n * np.eye(n)
        b = rng.standard_normal(n)
        BE = rng.standard_normal((2, n))
        qp = pt.QP.create(A, b)
        qp = qp.replace(BE=pt.Dense.create(jnp.asarray(BE)), cE=jnp.zeros(2))
        res = pt.solve(qp, qps_type="smalxe")
        from permon_tpu.viewers import view_convergence_smalxe

        txt = view_convergence_smalxe(res)
        # reference QPSViewConvergence_SMALXE format (smalxe.c:1000-1019)
        assert "Total number of inner iterations" in txt
        assert "#hits    of M1, eta:" in txt
        assert "#updates of M1, rho:" in txt
        assert txt.count("last QPSSolve") == 2  # outer + nested inner view


class TestSplitAndRemoveGluing:
    def test_split_be(self):
        from permon_tpu.qp.transforms import split_be

        B = np.array([[1.0, -1, 0, 0], [0, 0, 1, 0], [0, 1, 0, -1], [1, 0, 0, 0]])
        qp = pt.QP.create(np.eye(4) * 4, np.ones(4))
        qp = qp.replace(BE=pt.Dense.create(jnp.asarray(B)), cE=jnp.arange(4.0))
        child, post = split_be(qp)
        Bc = np.asarray(child.BE.todense())
        nnz = (np.abs(Bc) > 0).sum(axis=1)
        assert list(nnz) == [2, 2, 1, 1]  # gluing rows first, Dirichlet last
        np.testing.assert_allclose(np.asarray(child.cE), [0, 2, 1, 3])
        sol = post(Solution(x=jnp.zeros(4), lambda_E=jnp.array([10.0, 20, 30, 40])))
        np.testing.assert_allclose(np.asarray(sol.lambda_E), [10, 30, 20, 40])

    def test_remove_gluing_of_dirichlet(self):
        from permon_tpu.qp.transforms import remove_gluing_of_dirichlet_dofs

        B = np.array([[1.0, -1, 0, 0], [0, 0, 1, -1], [0, 1, -1, 0]])
        qp = pt.QP.create(np.eye(4) * 4, np.ones(4))
        qp = qp.replace(BE=pt.Dense.create(jnp.asarray(B)), cE=jnp.zeros(3))
        child, post = remove_gluing_of_dirichlet_dofs(qp, [0])
        assert child.BE.shape[0] == 2  # row 0 touches dirichlet dof 0
        sol = post(Solution(x=jnp.zeros(4), lambda_E=jnp.array([7.0, 8.0])))
        np.testing.assert_allclose(np.asarray(sol.lambda_E), [0, 7, 8])


class TestPCDual:
    def test_none_and_lumped(self):
        from permon_tpu.pc import PCDual

        rng = np.random.default_rng(9)
        B = pt.Dense.create(jnp.asarray(rng.standard_normal((3, 8))))
        K = pt.Dense.create(jnp.asarray(rand_spd_small(8)))
        x = jnp.asarray(rng.standard_normal(3))
        none = PCDual.create(B, pc_type="none")
        np.testing.assert_allclose(np.asarray(none.mv(x)), np.asarray(x))
        lump = PCDual.create(B, K, "lumped")
        Bd, Kd = np.asarray(B.todense()), np.asarray(K.todense())
        np.testing.assert_allclose(
            np.asarray(lump.mv(x)), Bd @ Kd @ Bd.T @ np.asarray(x), atol=1e-10
        )
        # pass-through fast path for the projected 'none' pc
        P = lambda v: v * 2.0
        assert none.projected(P) is P


def rand_spd_small(n, seed=10):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((n, n))
    return M @ M.T + n * np.eye(n)


class TestSVM:
    def test_svm_trains(self):
        from examples.svm import main

        acc = main(120, 1.0)
        assert acc >= 0.9
