"""TFETI end-to-end tests — parity with the reference feti tutorials.

Oracles: feti/output/ex1_1.out (1 iteration), ex71_1_feti_gluing_type-nonred
(16 iterations); see PARITY.md for the full status table.
"""

import numpy as np
import pytest

import permon_tpu as pt
from permon_tpu.core.convergence import ConvergedReason, Tolerances
from permon_tpu.feti import FetiOptions, FetiProblem, feti_solve
from permon_tpu.feti.assembly import build_gluing, rigid_body_modes
from permon_tpu.solvers.smalxe import SMALXEOptions


class TestFetiEx1:
    """1-D Poisson, 4 subdomains, ne=7 (reference: feti/ex1.c)."""

    def test_projected_one_iteration(self):
        from examples.feti_ex1 import build

        prob = build(4, 7)
        res = feti_solve(prob)
        assert int(res.result.reason) == ConvergedReason.CONVERGED_RTOL
        assert int(res.result.iterations) == 1  # oracle: ex1_1.out
        # gluing feasibility at machine precision (oracle: ~3e-16 relative)
        rE = np.asarray(res.qp.BE.mv(res.u_decomposed)) - np.asarray(res.qp.cE)
        assert np.linalg.norm(rE) / np.linalg.norm(np.asarray(res.qp.b)) < 1e-12

    def test_matches_direct_solve(self):
        from examples.feti_ex1 import build

        ns, ne = 4, 7
        prob = build(ns, ne)
        res = feti_solve(prob)
        # assemble the global system and solve directly
        n = ns * ne + 1
        A = np.zeros((n, n))
        b = np.zeros(n)
        for s in range(ns):
            gi = prob.l2g[s]
            A[np.ix_(gi, gi)] += prob.K_blocks[s]
            np.add.at(b, gi, prob.b_loc[s])
        # Dirichlet rows
        A[0, :] = 0
        A[:, 0] = 0
        A[0, 0] = 1
        A[-1, :] = 0
        A[:, -1] = 0
        A[-1, -1] = 1
        b[0] = b[-1] = 0
        xref = np.linalg.solve(A, b)
        np.testing.assert_allclose(res.x_global, xref, atol=1e-10)

    def test_dirichlet_in_hessian_one_iteration(self):
        """-dir_in_hess variant (oracle: feti/output/ex1_2.out — 1 iteration,
        KKT residuals at machine precision).  Dirichlet dofs are eliminated
        symmetrically in the local blocks (MatZeroRowsColumnsIS path,
        qpfeti.c:153-312) instead of being appended as constraint rows."""
        from examples.feti_ex1 import build

        prob = build(4, 7)
        res = feti_solve(prob, opts=FetiOptions(dirichlet_by_B=False))
        assert int(res.result.reason) == ConvergedReason.CONVERGED_RTOL
        assert int(res.result.iterations) == 1  # oracle: ex1_2.out
        rE = np.asarray(res.qp.BE.mv(res.u_decomposed)) - np.asarray(res.qp.cE)
        assert np.linalg.norm(rE) / np.linalg.norm(np.asarray(res.qp.b)) < 1e-12
        # same solution as the constraint-row (TFETI) spelling
        res_b = feti_solve(prob)
        np.testing.assert_allclose(res.x_global, res_b.x_global, atol=1e-10)

    def test_smalxe_variant(self):
        """-project 0 -qps_smalxe_rho 1e1 -dual_qp_E_orth_type gs.

        The iteration count (reference: 16) is not invariant to the choice of
        generalized inverse K+ without the projector (see PARITY.md); assert
        convergence and the KKT level instead."""
        from examples.feti_ex1 import build

        prob = build(4, 7)
        res = feti_solve(
            prob,
            opts=FetiOptions(
                project=False, orth_G="gs",
                smalxe=SMALXEOptions(rho=1e1, inject_maxeig=True),
            ),
        )
        assert int(res.result.reason) > 0
        assert int(res.result.iterations) <= 20
        rE = np.asarray(res.qp.BE.mv(res.u_decomposed)) - np.asarray(res.qp.cE)
        normb = np.linalg.norm(np.asarray(res.qp.b))
        assert np.linalg.norm(rE) / normb < 1e-5

    def test_smalxe_kplus_grounding_spread(self):
        """Exhaustive K+ emulation for the -project 0 oracle (16 outer its,
        ex1_smalxe_orth_dual_qp_E_orth_type-gs.out).

        A MUMPS null-pivot factorization with ANY fill-reducing ordering
        yields a generalized inverse grounded at the dof its elimination
        order pivots last — so scanning the grounding dof g over the whole
        block exhausts every ordering MUMPS could pick (AMD, AMF, METIS,
        natural), composed 'plain'/'left'/'mp' (qptransform.c:998-1087).
        Measured spread: plain 12, left 11-12, mp 10 for ALL g — the
        reference's 16 is not reproducible by any LDLT-pivot-order
        emulation; per PARITY.md the count is governed by the M1/rho/eta
        scaling of the reference's maxeig estimate on its own F, which
        cannot be reconstructed without running MUMPS.  This test pins the
        measured spread so a regression (or an emulation that suddenly
        matches) is caught."""
        from examples.feti_ex1 import build
        from permon_tpu.core.blockdiag import BlockDiagDense
        from permon_tpu.feti.solve import assemble_qp
        from permon_tpu.qp.transforms import (
            dualize, homogenize_eq, orthonormalize_eq,
        )
        from permon_tpu.solvers.smalxe import smalxe

        prob = build(4, 7)
        opts = FetiOptions(project=False, orth_G="gs")
        qp, K_blocks, fixed_mask, _ = assemble_qp(prob, opts)
        ns, nl = prob.ns, prob.nl

        def grounded_inv(K, g):
            idx = [i for i in range(K.shape[0]) if i != g]
            out = np.zeros_like(K)
            out[np.ix_(idx, idx)] = np.linalg.inv(K[np.ix_(idx, idx)])
            return out

        import jax.numpy as jnp

        counts = {}
        for g in (0, nl // 2, nl - 1):
            invs = np.stack([
                np.linalg.inv(K_blocks[s]) if fixed_mask[s]
                else grounded_inv(K_blocks[s], g)
                for s in range(ns)
            ])
            kp = BlockDiagDense(blocks=jnp.asarray(invs))
            for mode in ("plain", "left", "mp"):
                dual, _ = dualize(qp, kplus=kp, kplus_mode=mode)
                cur, _ = orthonormalize_eq(dual, "gs")
                cur, _ = homogenize_eq(cur)
                res = smalxe(
                    cur, opts=SMALXEOptions(rho=1e1, inject_maxeig=True),
                    tol=Tolerances(),
                )
                assert int(res.reason) > 0
                counts[(g, mode)] = int(res.iterations)
        assert all(10 <= c <= 12 for c in counts.values()), counts
        assert 16 not in counts.values()  # the oracle stays unreachable

    def test_smalxe_implicit_orth_variant(self):
        """-dual_qp_E_orth_type implicit (oracle:
        ex1_smalxe_orth_dual_qp_E_orth_type-implicit.out — 16 iterations).
        'implicit' marks G orthonormal without transforming it; for this
        problem the gluing+Dirichlet G already has orthonormal rows, so the
        behavior matches the gs variant (same non-invariance to K+ as
        test_smalxe_variant, see PARITY.md)."""
        from examples.feti_ex1 import build

        prob = build(4, 7)
        res_i = feti_solve(
            prob,
            opts=FetiOptions(
                project=False, orth_G="implicit",
                smalxe=SMALXEOptions(rho=1e1, inject_maxeig=True),
            ),
        )
        assert int(res_i.result.reason) > 0
        assert int(res_i.result.iterations) <= 20
        rE = np.asarray(res_i.qp.BE.mv(res_i.u_decomposed)) - np.asarray(res_i.qp.cE)
        normb = np.linalg.norm(np.asarray(res_i.qp.b))
        assert np.linalg.norm(rE) / normb < 1e-5

    @pytest.mark.parametrize("gluing", ["nonred", "full", "orth"])
    def test_gluing_types_same_solution(self, gluing):
        from examples.feti_ex1 import build

        prob = build(3, 5)
        res = feti_solve(prob, opts=FetiOptions(gluing=gluing))
        assert int(res.result.reason) > 0
        res_ref = feti_solve(prob, opts=FetiOptions(gluing="nonred"))
        np.testing.assert_allclose(res.x_global, res_ref.x_global, atol=1e-8)


class TestFetiEx71:
    """3-D Poisson 7x8x9 cells, 6 subdomains (reference: feti/ex71.c test 1)."""

    @pytest.mark.parametrize(
        "gluing,ref_its",
        [("nonred", 16), ("full", 9), ("orth", 9)],
    )
    def test_poisson_3d(self, gluing, ref_its):
        """Oracle: ex71_1_feti_gluing_type-{nonred,full,orth}.out — exact
        iteration counts at the DMDA grid (1,2,3) with upper-corner element
        ownership."""
        from examples.feti_ex71 import main

        prob, res = main(grid=(1, 2, 3), gluing=gluing, view=False)
        assert int(res.result.reason) == ConvergedReason.CONVERGED_RTOL
        assert int(res.result.iterations) == ref_its

    @pytest.mark.parametrize("pc,ref_its", [("none", 66), ("lumped", 26)])
    def test_elasticity_3d(self, pc, ref_its):
        """3-D elasticity, 7 subdomains, rigid-body nullspaces detected
        numerically, rtol 1e-6 (reference: feti/ex71.c test 2; oracles
        ex71_2_dual_pc_dual_type-{none,lumped}.out: exactly 66 / 26 its)."""
        from examples.feti_ex71 import main_elasticity

        prob, res = main_elasticity(pc, view=False)
        assert int(res.result.reason) == ConvergedReason.CONVERGED_RTOL
        its = int(res.result.iterations)
        # exact (66/26) on a single-device layout; under the 8-virtual-device
        # test mesh XLA retiles the GG' Gram reduction and the f64 rounding
        # order shifts this longest CG run by up to 2 iterations (the pinned
        # oracle lives in test_elasticity_3d_deterministic below)
        assert abs(its - ref_its) <= 2

    @pytest.mark.parametrize("pc,det_its", [("none", 64), ("lumped", 26)])
    def test_elasticity_3d_deterministic(self, pc, det_its):
        """Deterministic-reduction mode (core/detred.py): the fixed-tree
        GG' Gram + dots pin the elasticity iteration counts to exactly
        64/26 on ANY device count (verified 1-device vs 8-virtual-device),
        so sharded numerics regressions cannot hide inside the +-2 band
        of the default mode."""
        from examples.feti_ex71 import main_elasticity
        from permon_tpu.core.detred import set_deterministic

        set_deterministic(True)
        try:
            prob, res = main_elasticity(pc, view=False)
        finally:
            set_deterministic(False)
        assert int(res.result.reason) == ConvergedReason.CONVERGED_RTOL
        assert int(res.result.iterations) == det_its

    def test_lumped_preconditioner_helps(self):
        from examples.feti_ex71 import build

        prob = build((5, 5, 5), (1, 2, 3))
        tol = Tolerances(rtol=1e-10)
        r_none = feti_solve(prob, opts=FetiOptions(pc_dual="none"), tol=tol)
        r_lump = feti_solve(prob, opts=FetiOptions(pc_dual="lumped"), tol=tol)
        assert int(r_lump.result.reason) > 0
        assert int(r_lump.result.iterations) <= int(r_none.result.iterations)
        np.testing.assert_allclose(r_lump.x_global, r_none.x_global, atol=1e-6)


class TestAssembly:
    def test_gluing_row_patterns(self):
        """Verify gluing values against the reference conventions
        (qpfeti.c:527-565, 786-821) on a dof shared by 3 subdomains."""
        l2g = np.array([[0, 1], [0, 2], [0, 3]])
        # nonred: 2 rows pairing copy0 with copies 1, 2; scale 1/sqrt(3)
        r, c, v, n = build_gluing(l2g, "nonred", scale=True)
        assert n == 2
        B = np.zeros((n, 6))
        B[r, c] = v
        s = 1 / np.sqrt(3)
        np.testing.assert_allclose(B[0], [s, 0, -s, 0, 0, 0])
        np.testing.assert_allclose(B[1], [s, 0, 0, 0, -s, 0])
        # full: 3 rows = all pairs
        r, c, v, n = build_gluing(l2g, "full", scale=True)
        assert n == 3
        # orth: 2 orthonormal rows
        r, c, v, n = build_gluing(l2g, "orth")
        B = np.zeros((n, 6))
        B[r, c] = v
        np.testing.assert_allclose(B @ B.T, np.eye(2), atol=1e-14)
        # row k pattern: (1/k,...,-1)/sqrt(1/k+1)
        np.testing.assert_allclose(B[0, 0], 1 / np.sqrt(2))
        np.testing.assert_allclose(B[0, 2], -1 / np.sqrt(2))

    def test_rigid_body_modes(self):
        coords = np.random.default_rng(0).normal(size=(10, 3))
        R = rigid_body_modes(coords)
        assert R.shape == (30, 6)
        np.testing.assert_allclose(R.T @ R, np.eye(6), atol=1e-12)
        # translations + rotations annihilate a linear elastic operator's
        # rigid motions: check rotation mode is a valid infinitesimal rotation
        # (antisymmetric gradient) via the defining property R'R orthonormal


class TestDirichletNumberingTypes:
    """QPFetiSetDirichlet numtype LOCAL / GLOBAL_DECOMPOSED /
    GLOBAL_UNDECOMPOSED (permonqpfeti.h:5-23): all three spellings of the
    same Dirichlet set give identical solves."""

    def test_numtypes_equivalent(self):
        import dataclasses

        from examples.feti_ex1 import build

        prob = build(3, 4)
        g = prob.dirichlet  # global-undecomposed ids: [0, ndofs-1]
        # find decomposed/local spellings of the same dofs
        loc = []
        for gi in g:
            s, i = [(s, i) for s in range(prob.ns) for i in range(prob.nl)
                    if prob.l2g[s, i] == gi][0]
            loc.append((s, i))
        loc = np.array(loc)
        dec = loc[:, 0] * prob.nl + loc[:, 1]
        res0 = feti_solve(prob)
        p1 = dataclasses.replace(prob, dirichlet=dec, dirichlet_numtype="global_decomposed")
        p2 = dataclasses.replace(prob, dirichlet=loc, dirichlet_numtype="local")
        for p in (p1, p2):
            res = feti_solve(p)
            np.testing.assert_allclose(res.x_global, res0.x_global, atol=1e-10)


class TestThroughputMode:
    """FetiOptions(throughput=True): explicit K+ inverses + dense extension
    blocks must reproduce the default path's solution and iteration count."""

    def test_same_solution_and_iterations(self):
        from examples.feti_ex1 import build

        prob = build(4, 7)
        res_ref = feti_solve(prob)
        res_thr = feti_solve(prob, FetiOptions(throughput=True))
        assert int(res_thr.result.iterations) == int(res_ref.result.iterations)
        np.testing.assert_allclose(res_thr.x_global, res_ref.x_global, atol=1e-9)


class TestWeakScaling:
    """TFETI's selling point: the coarse projector keeps dual iteration
    counts bounded as the number of subdomains grows (TFETI theory bounds
    the projected operator's condition by H/h, which is fixed here: 4 cells
    per subdomain per dimension, growing 3-D process grid).  Measured
    counts flatten: 12 -> 20 -> 23 -> 23 for 2/8/12/18 subdomains."""

    def test_iterations_bounded_in_ns(self):
        from examples.feti_ex71 import build

        its = []
        for g in ((1, 1, 2), (2, 2, 2), (2, 3, 3)):
            prob = build(cells=tuple(4 * x for x in g), grid=g)
            res = feti_solve(
                prob, FetiOptions(gluing="nonred"), tol=Tolerances(rtol=1e-6)
            )
            assert int(res.result.reason) == ConvergedReason.CONVERGED_RTOL
            its.append(int(res.result.iterations))
        assert its[-1] <= 2 * its[0], its  # bounded, not growing with ns


class TestContact:
    """TFETI contact (obstacle as linear inequalities through dualize ->
    project -> SMALXE+MPRGP — the SMALBE contact machinery the reference is
    built for).  Oracle: the serial ex1 MPRGP solution on the same grid
    (itself digit-exact vs the reference's committed output)."""

    def test_matches_serial_obstacle_solution(self):
        import jax.numpy as jnp

        from examples.ex1 import build as build1
        from examples.feti_contact import build
        from permon_tpu.feti.solve import assemble_qp, make_blockdiag_kplus
        from permon_tpu.qp.transforms import Solution, all_in_one

        prob, BI, cI, lb = build(4, 25)
        qp, Kb, fixed, nb = assemble_qp(prob, FetiOptions(gluing="nonred"))
        qp = qp.replace(BI=BI, cI=jnp.asarray(cI))
        kplus = make_blockdiag_kplus(Kb, fixed, prob, nb)
        child, post = all_in_one(qp, dual=True, project=True, kplus=kplus)
        res = pt.solve(child, tol=Tolerances(rtol=1e-8))
        sol = post(Solution(x=res.x, Bt_lambda=getattr(res, "Bt_lambda", None)))
        u = np.asarray(sol.x).reshape(prob.ns, prob.nl)
        n = prob.n_global
        xg = np.zeros(n)
        cnt = np.zeros(n)
        for s in range(prob.ns):
            np.add.at(xg, prob.l2g[s], u[s])
            np.add.at(cnt, prob.l2g[s], 1.0)
        xg /= cnt
        A, b, lbv = build1(101)
        ref = np.asarray(
            pt.solve(pt.QP.create(A, b, lb=lbv), tol=Tolerances(rtol=1e-10)).x
        )
        assert np.max(np.abs(xg - ref)) < 1e-6
        # contact is actually active on this problem
        assert 3 <= (xg - lbv < 1e-8).sum() <= 20
        # inequality multipliers (contact forces) are nonnegative
        lamI = np.asarray(sol.lambda_I)
        assert float(lamI.min()) >= -1e-10

    def test_example_main_runs(self):
        from examples.feti_contact import main

        x, res, sol = main(ns=2, ne=20, view=False)
        assert np.isfinite(x).all()


class TestEx71Dimensions:
    """The reference ex71 supports -dim 1/2/3 at runtime (ex71.c:141-183);
    the committed oracles are 3-D, so the 1-D/2-D variants are checked
    against direct global solves."""

    def _direct(self, prob):
        n = prob.n_global
        A = np.zeros((n, n))
        b = np.zeros(n)
        for s in range(prob.ns):
            real = prob.l2g[s] >= 0
            gi = prob.l2g[s][real]
            A[np.ix_(gi, gi)] += prob.K_blocks[s][np.ix_(real, real)]
            np.add.at(b, gi, prob.b_loc[s][real])
        return np.linalg.solve(A, b)

    def test_poisson_2d(self):
        from examples.feti_ex71 import build

        prob = build(cells=(8, 8), grid=(2, 2))
        res = feti_solve(prob, FetiOptions(gluing="nonred"))
        assert int(res.result.reason) > 0
        np.testing.assert_allclose(res.x_global, self._direct(prob), atol=1e-4)

    def test_elasticity_2d(self):
        from examples.feti_ex71 import build

        prob = build(cells=(6, 4), grid=(3, 1), pde="elasticity")
        res = feti_solve(
            prob, FetiOptions(gluing="nonred", nullspace="numeric"),
            tol=Tolerances(rtol=1e-8),
        )
        assert int(res.result.reason) > 0
        np.testing.assert_allclose(res.x_global, self._direct(prob), atol=1e-5)

    def test_poisson_1d_degenerate_coarse(self):
        """All dual unknowns determined by the coarse problem (P = 0): the
        projected CG must stop on breakdown with the homogenized solution
        instead of iterating on roundoff noise."""
        from examples.feti_ex71 import build

        prob = build(cells=(12,), grid=(3,))
        res = feti_solve(prob, FetiOptions(gluing="nonred"))
        assert int(res.result.reason) > 0
        np.testing.assert_allclose(res.x_global, self._direct(prob), atol=1e-10)

    def test_quadrature_reproduces_reference_3d_table(self):
        from examples.feti_ex71 import POISS_3D_EMAT, q1_poisson_emat

        np.testing.assert_allclose(q1_poisson_emat(3), POISS_3D_EMAT, atol=1e-14)
