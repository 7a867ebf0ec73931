"""Tests of the QP transform chain: dualize / homogenize / projector /
penalty / orthonormalization, including the ex3 parity oracle and
generalized-inverse identities the reference checks in debug mode."""

import jax.numpy as jnp
import numpy as np
import pytest

import permon_tpu as pt
from permon_tpu.core.convergence import ConvergedReason, Tolerances
from permon_tpu.core.factor import detect_nullspace_dense, make_inv
from permon_tpu.qp.orth import orth_rows
from permon_tpu.qp.projector import Projector, dense_rows
from permon_tpu.qp.transforms import (
    Solution,
    compose,
    dualize,
    enforce_eq_by_penalty,
    enforce_eq_by_projector,
    homogenize_eq,
    orthonormalize_eq,
)
from examples.ex1 import build


class TestEx3Parity:
    def test_counts_and_kkt(self):
        from examples.ex3 import main

        qp, dual, res, sol = main(100, view=False)
        assert int(res.reason) == ConvergedReason.CONVERGED_RTOL
        # reference oracle: src/tutorials/output/ex3_1.out
        assert int(res.iterations) == 44
        assert int(res.nmv) == 71
        assert int(res.ncg) == 17
        assert int(res.nexp) == 26
        assert int(res.nprop) == 1
        # primal stationarity ||A x - b + BI' lambda|| tiny
        A, b, obst = build(100)
        x = np.asarray(sol.x)
        lamI = np.asarray(sol.lambda_I)
        r = A @ x - b + (-np.eye(100)).T @ lamI
        assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-10
        # primal solution matches ex1's (same problem, different formulation)
        qp1 = pt.QP.create(A, b, lb=obst)
        res1 = pt.solve(qp1)
        np.testing.assert_allclose(x, np.asarray(res1.x), atol=1e-4)


class TestProjector:
    def test_projector_identities(self):
        rng = np.random.default_rng(7)
        G = pt.Dense.create(rng.normal(size=(4, 20)))
        pf = Projector.create(G)
        v = rng.normal(size=20)
        Pv = pf.apply_p(v)
        # idempotency & complementarity (reference debug checks, qppf.c:423-433)
        np.testing.assert_allclose(pf.apply_p(Pv), Pv, atol=1e-12)
        np.testing.assert_allclose(np.asarray(G.mv(Pv)), 0, atol=1e-12)
        Qv = pf.apply_q(v)
        np.testing.assert_allclose(Qv + Pv, v, atol=1e-12)

    def test_orthonormal_shortcut(self):
        rng = np.random.default_rng(8)
        B = rng.normal(size=(3, 15))
        Q, T = orth_rows(B, "gs")
        np.testing.assert_allclose(Q @ Q.T, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(T @ B, Q, atol=1e-12)
        pf = Projector.create(pt.Dense.create(Q), orthonormal_rows=True)
        v = rng.normal(size=15)
        pf2 = Projector.create(pt.Dense.create(Q), orthonormal_rows=False)
        np.testing.assert_allclose(pf.apply_p(v), pf2.apply_p(v), atol=1e-12)

    def test_orth_rows_cholesky(self):
        rng = np.random.default_rng(9)
        B = rng.normal(size=(5, 30))
        Q, T = orth_rows(B, "cholesky")
        np.testing.assert_allclose(Q @ Q.T, np.eye(5), atol=1e-10)


class TestGeneralizedInverse:
    def test_kplus_on_singular(self):
        """K K+ K = K for the regularized inverse of a singular K
        (the reference's debug identity, qptransform.c:1060-1081)."""
        n = 12
        L = np.diag(np.full(n, 2.0)) + np.diag(np.full(n - 1, -1.0), 1) + np.diag(
            np.full(n - 1, -1.0), -1
        )
        # free-free Laplacian: constant nullspace
        L[0, 0] = L[-1, -1] = 1.0
        R, defect = detect_nullspace_dense(np.asarray(L, dtype=np.float64))
        assert defect == 1
        Kplus = make_inv(pt.Dense.create(L), R=pt.Dense.create(np.asarray(R)))
        X = np.asarray(Kplus.todense())
        np.testing.assert_allclose(L @ X @ L, L, atol=1e-9)


class TestChain:
    def _eq_qp(self, n=24, seed=3, cE_nonzero=True):
        rng = np.random.default_rng(seed)
        A = np.diag(np.full(n, 2.0)) + np.diag(np.full(n - 1, -1.0), 1) + np.diag(
            np.full(n - 1, -1.0), -1
        ) + 0.3 * np.eye(n)
        b = rng.normal(size=n)
        BE = rng.normal(size=(3, n))
        cE = rng.normal(size=3) * (1.0 if cE_nonzero else 0.0)
        return pt.QP.create(A, b, BE=BE, cE=cE)

    def _scipy_eq(self, qp):
        A = np.asarray(qp.A.todense())
        BE = np.asarray(qp.BE.todense())
        b = np.asarray(qp.b)
        cE = np.asarray(qp.cE) if qp.cE is not None else np.zeros(BE.shape[0])
        n, m = A.shape[0], BE.shape[0]
        KKT = np.block([[A, BE.T], [BE, np.zeros((m, m))]])
        rhs = np.concatenate([b, cE])
        sol = np.linalg.solve(KKT, rhs)
        return sol[:n], sol[n:]

    def test_homogenize_projector_cg(self):
        """Equality-only QP via homogenize + projector + CG (PCPG path)."""
        qp = self._eq_qp()
        xref, lamref = self._scipy_eq(qp)
        steps = []
        child, post1 = homogenize_eq(qp)
        steps.append((child, post1))
        child2, post2 = enforce_eq_by_projector(child)
        steps.append((child2, post2))
        res = pt.solve(child2, qps_type="cg", tol=Tolerances(rtol=1e-10))
        sol = compose(steps)(Solution(x=res.x))
        np.testing.assert_allclose(np.asarray(sol.x), xref, atol=1e-7)
        # recovered multiplier satisfies A x - b + BE'lambda_E = 0 (PERMON sign)
        np.testing.assert_allclose(np.asarray(sol.lambda_E), lamref, atol=1e-6)

    def test_penalty_matches(self):
        qp = self._eq_qp(cE_nonzero=False)
        xref, _ = self._scipy_eq(qp)
        child, post = enforce_eq_by_penalty(qp, rho=1e8)
        res = pt.solve(child, qps_type="cg", tol=Tolerances(rtol=1e-12))
        sol = post(Solution(x=res.x))
        np.testing.assert_allclose(np.asarray(sol.x), xref, atol=1e-5)

    def test_orthonormalize_eq_chain(self):
        qp = self._eq_qp()
        xref, lamref = self._scipy_eq(qp)
        steps = []
        c1, p1 = orthonormalize_eq(qp, "gs")
        steps.append((c1, p1))
        c2, p2 = homogenize_eq(c1)
        steps.append((c2, p2))
        c3, p3 = enforce_eq_by_projector(c2)
        steps.append((c3, p3))
        res = pt.solve(c3, qps_type="cg", tol=Tolerances(rtol=1e-10))
        sol = compose(steps)(Solution(x=res.x))
        np.testing.assert_allclose(np.asarray(sol.x), xref, atol=1e-7)
        np.testing.assert_allclose(np.asarray(sol.lambda_E), lamref, atol=1e-6)

    def test_dualize_with_nullspace(self):
        """Singular Hessian + equality constraints: the TFETI algebra
        (dual QP with coarse space G = R'B')."""
        n = 16
        L = np.diag(np.full(n, 2.0)) + np.diag(np.full(n - 1, -1.0), 1) + np.diag(
            np.full(n - 1, -1.0), -1
        )
        L[0, 0] = L[-1, -1] = 1.0  # free-free: constant nullspace
        rng = np.random.default_rng(4)
        BE = rng.normal(size=(4, n))
        b = rng.normal(size=n)
        b = b - np.mean(b)  # admissible rhs not needed (BE' mu handles it)
        R = np.full((n, 1), 1.0 / np.sqrt(n))
        qp = pt.QP.create(L, b, BE=BE, cE=np.zeros(4), R=R)
        dual, post = dualize(qp)
        assert dual.BE is not None  # G present
        # solve dual (equality-constrained, no box) via projector + CG
        steps = [(dual, post)]
        c1, p1 = homogenize_eq(dual)
        steps.append((c1, p1))
        c2, p2 = enforce_eq_by_projector(c1)
        steps.append((c2, p2))
        res = pt.solve(c2, qps_type="cg", tol=Tolerances(rtol=1e-12))
        sol = compose(steps)(Solution(x=res.x))
        x = np.asarray(sol.x)
        # check primal feasibility and stationarity via KKT
        np.testing.assert_allclose(BE @ x, 0, atol=1e-8)
        lamE = np.asarray(sol.lambda_E)
        r = L @ x - b + BE.T @ lamE
        assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-8


class TestEx3NullspaceVariant:
    """-empty_nullsp variant (oracle ex3_nullspace.out): SMALXE over a 0-row
    equality block — 1 outer iteration, 46 inner its, 74 Hessian mults,
    18 CG / 27 expansion / 1 proportioning."""

    def test_exact_counts(self):
        from examples.ex3 import main

        qp, dual, res, sol = main(100, view=False, empty_nullsp=True)
        assert int(res.reason) > 0
        assert int(res.iterations) == 1
        assert int(res.inner_iterations) == 46
        assert (int(res.nmv), int(res.ncg), int(res.nexp), int(res.nprop)) == (74, 18, 27, 1)


class TestDualizeKplusModes:
    """-qpt_dualize_Kplus_left/_mp (qptransform.c:1019-1087): the debug-mode
    generalized-inverse identities K K+ K = K (left) and K+ K K+ = K+ (MP)."""

    def test_left_and_mp_identities(self):
        import jax.numpy as jnp

        from examples.feti_ex1 import build
        from permon_tpu.feti import FetiOptions
        from permon_tpu.feti.solve import assemble_qp, make_blockdiag_kplus
        from permon_tpu.qp.transforms import dualize

        prob = build(3, 4)
        qp, Kb, fixed, nb = assemble_qp(prob, FetiOptions())
        kplus = make_blockdiag_kplus(Kb, fixed, prob, nb)
        for mode in ("left", "mp"):
            dual, post = dualize(qp, kplus=kplus, kplus_mode=mode)
            Kp = dual.A.ops[1]  # the composed K+ inside F = B K+ B'
            K = qp.A
            v = jnp.asarray(np.random.default_rng(0).standard_normal(qp.b.shape[0]))
            # K K+ K v == K v  (left generalized inverse)
            np.testing.assert_allclose(
                np.asarray(K.mv(Kp.mv(K.mv(v)))), np.asarray(K.mv(v)), atol=1e-8
            )
            if mode == "mp":
                # K+ K K+ v == K+ v  (Moore-Penrose)
                np.testing.assert_allclose(
                    np.asarray(Kp.mv(K.mv(Kp.mv(v)))), np.asarray(Kp.mv(v)), atol=1e-8
                )


class TestFetiPrepare:
    """QPTFetiPrepare / QPTFetiPrepareReuseCP analogs (qptransform.c:1200-1251)."""

    def _eq_qp(self):
        # SINGULAR Hessian with a 2-dim nullspace so the dual carries a
        # nonempty coarse space G = R'B' (the TFETI situation)
        rng = np.random.default_rng(11)
        n = 20
        Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        R = Q[:, :2]
        A = Q[:, 2:] @ np.diag(1.0 + rng.random(n - 2)) @ Q[:, 2:].T
        b = rng.standard_normal(n)
        BE = rng.standard_normal((3, n))
        qp = pt.QP.create(A, b)
        qp = qp.replace(
            BE=pt.Dense.create(jnp.asarray(BE)),
            cE=jnp.zeros(3),
            R=pt.Dense.create(jnp.asarray(R)),
        )
        return qp, A, b, BE

    def test_feti_prepare_matches_kkt(self):
        from permon_tpu.qp.transforms import Solution, feti_prepare

        qp, A, b, BE = self._eq_qp()
        child, post = feti_prepare(qp)
        res = pt.solve(child)
        x = np.asarray(post(Solution(x=res.x)).x)
        kkt = np.block([[A, BE.T], [BE, np.zeros((3, 3))]])
        xs = np.linalg.solve(kkt, np.concatenate([b, np.zeros(3)]))
        np.testing.assert_allclose(x, xs[: len(b)], atol=1e-5)

    def test_reuse_cp_caches_projector(self):
        from permon_tpu.qp.transforms import Solution, feti_prepare_reuse_cp

        qp, A, b, BE = self._eq_qp()
        c1, post1 = feti_prepare_reuse_cp(qp)
        # second solve, different rhs, same constraints -> same projector obj
        qp2 = qp.replace(b=qp.b * 2.0)
        c2, post2 = feti_prepare_reuse_cp(qp2)
        # the cached coarse factorization must be reused (same ggt_chol array)
        assert c1.pf is not None and c2.pf is not None
        assert c1.pf.ggt_chol is c2.pf.ggt_chol or c1.pf is c2.pf
        x2 = np.asarray(post2(Solution(x=pt.solve(c2).x)).x)
        kkt = np.block([[A, BE.T], [BE, np.zeros((3, 3))]])
        xs = np.linalg.solve(kkt, np.concatenate([2.0 * b, np.zeros(3)]))
        np.testing.assert_allclose(x2, xs[: len(b)], atol=1e-5)


class TestQPMultiplierUtils:
    """QPComputeLagrangianGradient / MissingEqMultiplier / MissingBox /
    CompareEqMultiplierWithLeastSquare analogs (qp.c)."""

    def test_missing_eq_multiplier_is_least_squares(self):
        rng = np.random.default_rng(12)
        n = 15
        M = rng.standard_normal((n, n))
        A = M @ M.T + n * np.eye(n)
        b = rng.standard_normal(n)
        BE = rng.standard_normal((3, n))
        qp = pt.QP.create(A, b, BE=BE, cE=np.zeros(3))
        # solve the KKT system directly
        kkt = np.block([[A, BE.T], [BE, np.zeros((3, 3))]])
        xs = np.linalg.solve(kkt, np.concatenate([b, np.zeros(3)]))
        x, lam = xs[:n], xs[n:]
        lam_rec = np.asarray(qp.compute_missing_eq_multiplier(jnp.asarray(x)))
        np.testing.assert_allclose(lam_rec, lam, atol=1e-8)
        assert float(qp.compare_eq_multiplier_with_least_square(
            jnp.asarray(x), jnp.asarray(lam))) < 1e-8
        r = qp.lagrangian_gradient(jnp.asarray(x), lambda_E=jnp.asarray(lam))
        assert float(jnp.linalg.norm(r)) < 1e-8

    def test_missing_box_multipliers(self):
        from examples.ex1 import build

        A, b, lb = build(60)
        qp = pt.QP.create(A, b, lb=lb)
        res = pt.solve(qp)
        llb, lub = qp.compute_missing_box_multipliers(res.x, g=res.g)
        # KKT: r = g - llb + lub ~ 0, llb >= 0, complementarity
        r = qp.lagrangian_gradient(res.x, llb=llb, lub=lub)
        nb = float(jnp.linalg.norm(qp.b))
        assert float(jnp.linalg.norm(r)) / nb < 1e-4
        # sign violations are bounded by the solver tolerance (the reference
        # reports them as the ||min(lambda_lb,0)|| KKT residual, not as exact)
        assert float(jnp.linalg.norm(jnp.minimum(llb, 0.0))) / nb < 1e-4

    def test_reuse_cp_reset(self):
        from permon_tpu.qp.transforms import (
            _REUSE_CP_CACHE, feti_prepare_reuse_cp_reset)

        feti_prepare_reuse_cp_reset()
        assert len(_REUSE_CP_CACHE) == 0
