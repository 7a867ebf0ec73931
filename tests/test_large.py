"""Sparse-blocks TFETI path (feti/large.py): end-to-end solve vs the
assembled system, iteration-count agreement with the dense path (projected
pipeline is K+-invariant), mixed-precision factorization, and RCM reorder
fusion."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from examples.feti_large import assembled_system, build_sparse
from permon_tpu.core.convergence import Tolerances
from permon_tpu.feti.large import (
    SparseFetiProblem,
    assemble_qp_sparse,
    feti_solve_sparse,
    reorder_rcm,
)
from permon_tpu.feti.solve import FetiOptions


CELLS = (12, 12, 12)
GRID = (2, 2, 2)


@pytest.fixture(scope="module")
def prob():
    return build_sparse(CELLS, GRID)


class TestSparseFeti:
    def test_solves_assembled_system(self, prob):
        res = feti_solve_sparse(
            prob, FetiOptions(gluing="nonred"), tol=Tolerances(rtol=1e-5)
        )
        A, b = assembled_system(CELLS)
        resid = np.linalg.norm(A @ res.x_global - b) / np.linalg.norm(b)
        assert resid < 2e-5, resid

    def test_iteration_count_matches_dense_path(self, prob):
        """The projected dual pipeline is invariant to the K+ choice
        (PARITY.md): band K+ with fixing-dof regularization must track the
        dense regularized-Cholesky path's CG iteration count.  The large
        path runs the full-PCPG recurrence (w = P r every iteration — the
        on-chip stability fix, see _solve_prepared), which converges one or
        two iterations EARLIER than the project-once dense form in fp; the
        solutions must still agree."""
        from examples.feti_ex71 import build as build71
        from permon_tpu.feti.solve import feti_solve

        res_s = feti_solve_sparse(
            prob, FetiOptions(gluing="nonred"), tol=Tolerances(rtol=1e-5)
        )
        prob_d = build71(cells=CELLS, grid=GRID)
        res_d = feti_solve(
            prob_d, FetiOptions(gluing="nonred"), tol=Tolerances(rtol=1e-5)
        )
        it_s, it_d = int(res_s.result.iterations), int(res_d.result.iterations)
        assert it_s <= it_d and it_d - it_s <= 2, (it_s, it_d)
        np.testing.assert_allclose(res_s.x_global, res_d.x_global, atol=1e-4)

    def test_f32_factor_with_refinement(self, prob):
        res = feti_solve_sparse(
            prob, FetiOptions(gluing="nonred"), tol=Tolerances(rtol=1e-5),
            kplus_dtype=jnp.float32, kplus_refine=2,
        )
        A, b = assembled_system(CELLS)
        resid = np.linalg.norm(A @ res.x_global - b) / np.linalg.norm(b)
        assert resid < 2e-5, resid

    def test_f32_primal_defect_correction_reaches_f64_grade(self, prob):
        """f32 factors + accurate post chain + 1 defect-correction pass must
        deliver an f64-grade assembled residual (the mixed-precision recipe
        the 1M-dof single-chip run relies on)."""
        res = feti_solve_sparse(
            prob, FetiOptions(gluing="nonred"), tol=Tolerances(rtol=1e-6),
            kplus_dtype=jnp.float32, kplus_refine=2, primal_refine=1,
        )
        A, b = assembled_system(CELLS)
        resid = np.linalg.norm(A @ res.x_global - b) / np.linalg.norm(b)
        assert resid < 1e-8, resid

    def test_sparse_coarse_matches_dense_coarse(self, prob):
        """coarse='sparse' (lazy G = R'B' + host sparse GG') must reproduce
        the dense coarse build's iteration count and solution."""
        res_d = feti_solve_sparse(
            prob, FetiOptions(gluing="nonred", coarse="dense"),
            tol=Tolerances(rtol=1e-6),
        )
        res_s = feti_solve_sparse(
            prob, FetiOptions(gluing="nonred", coarse="sparse"),
            tol=Tolerances(rtol=1e-6),
        )
        assert int(res_s.result.iterations) == int(res_d.result.iterations)
        np.testing.assert_allclose(res_s.x_global, res_d.x_global, atol=1e-6)

    def test_rcm_reorder_fused_same_solution(self, prob):
        resn = feti_solve_sparse(
            prob, FetiOptions(gluing="nonred"), tol=Tolerances(rtol=1e-7)
        )
        resr = feti_solve_sparse(
            reorder_rcm(prob), FetiOptions(gluing="nonred"),
            tol=Tolerances(rtol=1e-7),
        )
        np.testing.assert_allclose(resr.x_global, resn.x_global, atol=1e-5)

    def test_lumped_dual_preconditioner(self, prob):
        res_n = feti_solve_sparse(
            prob, FetiOptions(gluing="nonred"), tol=Tolerances(rtol=1e-5)
        )
        res_l = feti_solve_sparse(
            prob, FetiOptions(gluing="nonred", pc_dual="lumped"),
            tol=Tolerances(rtol=1e-5),
        )
        # lumped PC converges (typically in fewer iterations) to the same x
        assert int(res_l.result.reason) == 2
        np.testing.assert_allclose(res_l.x_global, res_n.x_global, atol=1e-3)

    def test_assemble_pads_to_block_multiple(self, prob):
        qp, kplus, NB, _ = assemble_qp_sparse(prob, FetiOptions(gluing="nonred"))
        assert NB % 128 == 0
        assert qp.BE.nl % NB == 0
        assert kplus.shape[1] == qp.BE.ns * qp.BE.nl

    def test_gather_kernel_identical_solve(self, prob):
        """FetiOptions(gather_kernel=True) — the SELL in-register gather for
        the B/B' tables — must leave the ENTIRE solve bit-identical to the
        table path: same dual iterates, same counts, same solution (the
        plans only move 32-bit words; core/sell.SEllGather)."""
        tol = Tolerances(rtol=1e-6)
        r_tab = feti_solve_sparse(
            prob, FetiOptions(gluing="nonred", gather_kernel=False,
                              deterministic=True), tol=tol,
        )
        r_sell = feti_solve_sparse(
            prob, FetiOptions(gluing="nonred", gather_kernel=True,
                              deterministic=True), tol=tol,
        )
        assert int(r_sell.result.iterations) == int(r_tab.result.iterations)
        np.testing.assert_array_equal(r_sell.x_global, r_tab.x_global)


class TestSparseContact:
    """Contact (box-constrained dual / SMALBE) through the LARGE path:
    inequality rows ride the sparse-blocks pipeline — dualize VStacks
    [B_gluing+Dirichlet; B_obstacle], the projected dual keeps its box and
    is solved by SMALXE/MPRGP instead of CG (feti/large.py round 3)."""

    def test_matches_dense_contact_pipeline(self):
        from examples.feti_contact import build as build_contact
        from permon_tpu.feti.solve import feti_solve

        ns, ne = 4, 25
        prob_d, BI, cI, lb = build_contact(ns, ne)
        r_ref = feti_solve(
            prob_d, FetiOptions(gluing="nonred"), BI=BI, cI=cI,
            tol=Tolerances(rtol=1e-6),
        )
        sprob = SparseFetiProblem(
            K_blocks=[sp.csr_matrix(prob_d.K_blocks[s]) for s in range(ns)],
            b_loc=prob_d.b_loc, l2g=prob_d.l2g,
            floating=np.ones(ns, dtype=bool),
            dirichlet=prob_d.dirichlet,
        )
        r = feti_solve_sparse(
            sprob, FetiOptions(gluing="nonred"), BI=BI, cI=cI,
            tol=Tolerances(rtol=1e-6),
        )
        # same decomposition, same pipeline, band K+ instead of dense K+ —
        # the projected pipeline is K+-invariant (PARITY.md)
        np.testing.assert_allclose(r.x_global, r_ref.x_global, atol=1e-5)
        # obstacle respected to the dual solve's feasibility level
        assert (r.x_global >= lb - 5e-4).all()

    def test_3d_obstacle_vs_assembled_mprgp(self):
        """3-D contact through the large path (far-face ceiling on the
        Poisson box) must match the serial MPRGP solve of the assembled
        box-constrained QP — cross-solver, cross-formulation oracle."""
        import jax.numpy as jnp

        import permon_tpu as pt
        from examples.feti_large import assembled_system, build_obstacle
        from permon_tpu.qpc.box import BoxConstraint

        cells, grid = (10,) * 3, (2,) * 3
        prob, BI, cI, cap = build_obstacle(cells, grid)
        r = feti_solve_sparse(
            prob, FetiOptions(gluing="nonred"), BI=BI, cI=cI,
            tol=Tolerances(rtol=1e-7),
        )
        A, b = assembled_system(cells)
        Mx = cells[0] + 1
        ub = np.full(len(b), np.inf)
        ub[np.arange(len(b)) % Mx == Mx - 1] = cap
        qp = pt.QP(
            A=pt.make_operator(A), b=jnp.asarray(b),
            box=BoxConstraint.create(len(b), ub=jnp.asarray(ub)),
        )
        ref = pt.solve(qp, tol=Tolerances(rtol=1e-9, max_it=3000))
        xref = np.asarray(ref.x)
        # contact must actually be active for the test to mean anything
        assert (xref >= ub - 1e-6).any()
        np.testing.assert_allclose(r.x_global, xref, atol=2e-4)

    def test_smalbe_unprojected_adaptive_twin(self):
        """SMALBE proper (project=False + contact): the augmented-Lagrangian
        outer loop enforces G lam = 0 itself, so the semi-monotonic M1/rho
        adaptation ACTUALLY ITERATES — unlike the projected variant, whose
        iterates stay in ker G and converge in one outer (VERDICT r4
        missing #2).  CPU CI twin of the 512k-dof on-chip capture
        (scripts/northstar_contact.py): same recipe, trajectory pinned in
        deterministic mode, solution agreeing with the projected pipeline."""
        from examples.feti_large import build_obstacle
        from permon_tpu.feti.large import FetiSolverSparse
        from permon_tpu.solvers.smalxe import SMALXEOptions

        cells, grid = (16,) * 3, (2,) * 3
        cap = 0.1 * cells[0] ** 2 / 2.0
        prob, BI, cI, _ = build_obstacle(cells, grid, cap=cap)
        tol = Tolerances(rtol=1e-6)
        base = dict(gluing="nonred", deterministic=True, coarse="sparse")
        r_proj = FetiSolverSparse(
            prob, FetiOptions(**base), kplus_dtype=jnp.float32,
            kplus_refine=2, BI=BI, cI=cI,
        ).solve(tol=tol)
        assert int(r_proj.result.iterations) == 1  # the degenerate case
        r = FetiSolverSparse(
            prob,
            FetiOptions(**base, project=False,
                        smalxe=SMALXEOptions(rtol_E=0.1)),
            kplus_dtype=jnp.float32, kplus_refine=2, BI=BI, cI=cI,
        ).solve(tol=tol)
        res = r.result
        assert int(res.reason) == 2
        # the adaptive machinery ran: many outers, M1 AND rho updates
        # trajectory pinned for the CURRENT factor pipeline (the
        # unprojected SMALBE is K+-noise-sensitive: the round-5 in-scan
        # regularization injection moved the f32 factors by 1 ulp and the
        # inner count by 1)
        assert int(res.iterations) == 39, int(res.iterations)
        assert int(res.inner_iterations) == 122, int(res.inner_iterations)
        assert int(res.M1_updates) == 13 and int(res.rho_updates) == 1
        # AL-grade constraint satisfaction: agrees with the projected
        # pipeline to the dual tolerance level
        err = np.abs(r.x_global - r_proj.x_global).max()
        assert err < 5e-3, err

    def test_solver_reuse_contact(self):
        """Contact through FetiSolverSparse: repeated solves reuse the band
        factors and the coarse projector; the fast path runs SMALXE inside
        the one-dispatch executable."""
        from examples.feti_contact import build as build_contact
        from permon_tpu.feti.large import FetiSolverSparse

        ns, ne = 4, 25
        prob_d, BI, cI, lb = build_contact(ns, ne)
        sprob = SparseFetiProblem(
            K_blocks=[sp.csr_matrix(prob_d.K_blocks[s]) for s in range(ns)],
            b_loc=prob_d.b_loc, l2g=prob_d.l2g,
            floating=np.ones(ns, dtype=bool),
            dirichlet=prob_d.dirichlet,
        )
        solver = FetiSolverSparse(
            sprob, FetiOptions(gluing="nonred", coarse="sparse"),
            BI=BI, cI=cI,
        )
        r1 = solver.solve(tol=Tolerances(rtol=1e-6))
        r2 = solver.solve(tol=Tolerances(rtol=1e-6))  # fast path
        np.testing.assert_allclose(r2.x_global, r1.x_global, atol=1e-8)
        ref = feti_solve_sparse(
            sprob, FetiOptions(gluing="nonred", coarse="sparse"),
            BI=BI, cI=cI, tol=Tolerances(rtol=1e-6),
        )
        np.testing.assert_allclose(r1.x_global, ref.x_global, atol=1e-6)


class TestNorthStarShape:
    """CI-sized twin of the 1M-dof north star (101^3, 64 subdomains of
    <= 27^3 — scripts/northstar.py, captured on-chip in round 3: 44 dual CG
    iterations, reason 2, f32 factors + 2-step refinement + one f64 primal
    defect correction): the SAME 4x4x4 decomposition and precision recipe at
    20^3 cells, with the iteration count pinned."""

    def test_64_subdomain_f32_pipeline_pinned(self):
        import jax.numpy as jnp

        from examples.feti_large import assembled_system, build_sparse

        prob = build_sparse((20,) * 3, (4,) * 3)
        assert prob.ns == 64 and prob.n_global == 9261
        res = feti_solve_sparse(
            prob, FetiOptions(gluing="nonred"), tol=Tolerances(rtol=1e-5),
            kplus_dtype=jnp.float32, kplus_refine=2, primal_refine=1,
        )
        assert int(res.result.reason) == 2
        assert int(res.result.iterations) == 23
        A, b = assembled_system((20,) * 3)
        resid = np.linalg.norm(A @ res.x_global - b) / np.linalg.norm(b)
        assert resid < 1e-8, resid


class TestFetiSolverSparse:
    def test_reuse_matches_fresh_solve(self):
        from permon_tpu.feti.large import FetiSolverSparse

        prob = build_sparse(CELLS, GRID)
        solver = FetiSolverSparse(
            prob, FetiOptions(gluing="nonred"),
            kplus_dtype=jnp.float32, kplus_refine=2, primal_refine=1,
        )
        r1 = solver.solve(tol=Tolerances(rtol=1e-6))
        assert solver._pf is not None  # coarse factor captured for reuse
        b2 = prob.b_loc * 1.5
        r2 = solver.solve(b_loc=b2, tol=Tolerances(rtol=1e-6))
        import dataclasses

        ref = feti_solve_sparse(
            dataclasses.replace(prob, b_loc=b2),
            FetiOptions(gluing="nonred"), tol=Tolerances(rtol=1e-6),
            kplus_dtype=jnp.float32, kplus_refine=2, primal_refine=1,
        )
        # linearity sanity + reuse correctness
        np.testing.assert_allclose(r2.x_global, ref.x_global, atol=1e-7)
        np.testing.assert_allclose(r2.x_global, 1.5 * r1.x_global, atol=1e-6)

    def test_first_solve_direct_pf_matches_eager(self):
        """coarse='sparse' triggers the direct host pf build (_ensure_pf):
        the FIRST solve already rides the one-dispatch executable and must
        match the eager-path solve bit-for-near (same sparse coarse Gram)."""
        from permon_tpu.feti.large import FetiSolverSparse

        prob = build_sparse(CELLS, GRID)
        solver = FetiSolverSparse(
            prob, FetiOptions(gluing="nonred", coarse="sparse"),
            kplus_dtype=jnp.float32, kplus_refine=2, primal_refine=1,
        )
        assert solver._pf is None
        r1 = solver.solve(tol=Tolerances(rtol=1e-6))
        # the direct pf was built before the first solve -> fast path ran
        assert solver._pf is not None
        ref = feti_solve_sparse(
            prob, FetiOptions(gluing="nonred", coarse="sparse"),
            tol=Tolerances(rtol=1e-6),
            kplus_dtype=jnp.float32, kplus_refine=2, primal_refine=1,
        )
        # counts are from the defect-correction pass whose rhs is
        # noise-scale; the on-device defect (qp.A stencil) vs the eager
        # host scipy defect differ in the last bits, so allow a small gap
        assert abs(int(r1.result.iterations) - int(ref.result.iterations)) <= 3
        np.testing.assert_allclose(r1.x_global, ref.x_global, atol=1e-7)

    def test_fast_path_lumped_pc(self):
        """pc_dual='lumped' must ride the one-dispatch fast executable
        (round 3: the preconditioner is passed into the jitted solve as a
        pytree argument) — fewer CG iterations than unpreconditioned, same
        solution on repeated solves."""
        from permon_tpu.feti.large import FetiSolverSparse

        prob = build_sparse(CELLS, GRID)
        solver = FetiSolverSparse(
            prob, FetiOptions(gluing="nonred", pc_dual="lumped")
        )
        r1 = solver.solve(tol=Tolerances(rtol=1e-6))
        r2 = solver.solve(b_loc=prob.b_loc * 2.0, tol=Tolerances(rtol=1e-6))
        np.testing.assert_allclose(r2.x_global, 2.0 * r1.x_global, atol=1e-6)
        assert int(r2.result.reason) == 2
        # the eager (first) and fast (warm) paths agree on the count; note
        # lumped on a small homogeneous Poisson box INCREASES the count vs
        # none (23 -> 39, dense path identical) — its payoff is the
        # elasticity/heterogeneous regime, same as the reference's PCDual
        assert int(r1.result.iterations) == int(r2.result.iterations)


class TestShardedLargePath:
    """The large path under a device mesh (round-4 headline): the band K+
    factor scan batched over a SHARDED subdomain axis, the extension triplet
    scatter-add + one psum per F application, the coarse projector
    replicated (or redundancy-group distributed).  Iteration counts must
    EQUAL the single-device solve in deterministic mode; nothing else about
    the pipeline may change (reference per-rank layout:
    matinv.c:481-590, qppf.c:182-333)."""

    @pytest.fixture(scope="class")
    def mesh8(self):
        import jax

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 (virtual) devices")
        from permon_tpu.parallel import make_mesh

        return make_mesh(8)

    @pytest.fixture(scope="class")
    def ref_linear(self, prob):
        return feti_solve_sparse(
            prob,
            FetiOptions(gluing="nonred", deterministic=True, coarse="sparse"),
            tol=Tolerances(rtol=1e-6),
        )

    def test_linear_matches_single_device(self, prob, mesh8, ref_linear):
        res = feti_solve_sparse(
            prob,
            FetiOptions(gluing="nonred", deterministic=True, coarse="sparse",
                        mesh=mesh8),
            tol=Tolerances(rtol=1e-6),
        )
        assert int(res.result.iterations) == int(ref_linear.result.iterations)
        np.testing.assert_allclose(
            res.x_global, ref_linear.x_global, atol=1e-7
        )

    def test_solver_class_fast_path_sharded(self, prob, mesh8, ref_linear):
        from permon_tpu.feti.large import FetiSolverSparse

        solver = FetiSolverSparse(
            prob,
            FetiOptions(gluing="nonred", deterministic=True, coarse="sparse",
                        mesh=mesh8),
        )
        r1 = solver.solve(tol=Tolerances(rtol=1e-6))
        assert int(r1.result.iterations) == int(ref_linear.result.iterations)
        np.testing.assert_allclose(r1.x_global, ref_linear.x_global, atol=1e-7)
        # reused factors + warm executable with a new rhs
        r2 = solver.solve(b_loc=prob.b_loc * 2.0, tol=Tolerances(rtol=1e-6))
        np.testing.assert_allclose(
            r2.x_global, 2.0 * ref_linear.x_global, atol=1e-6
        )

    def test_sharded_layout(self, prob, mesh8):
        """The factor arrays really shard: each device holds 1/8 of the
        subdomain axis of Dinv/F and of the stencil data."""
        from permon_tpu.feti.large import assemble_qp_sparse
        from permon_tpu.parallel import shard_qp_sparse

        qp, kplus, NB, _ = assemble_qp_sparse(
            prob, FetiOptions(gluing="nonred")
        )
        qp_sh, kplus_sh, _ = shard_qp_sparse(qp, kplus, mesh8)
        assert len(kplus_sh.Dinv.sharding.device_set) == 8
        shard_shapes = {
            s.data.shape for s in kplus_sh.Dinv.addressable_shards
        }
        nb, ns, NBs, _ = kplus_sh.Dinv.shape
        assert shard_shapes == {(nb, ns // 8, NBs, NBs)}
        assert len(qp_sh.A.data.sharding.device_set) == 8
        # the dual-major gather table is dropped under the mesh (it would
        # all-gather the sharded primal); the primal-major one shards
        assert qp_sh.BE.gB_cols is None
        assert qp_sh.BE.gBt_rows is not None

    def test_contact_matches_single_device(self, mesh8):
        from examples.feti_large import build_obstacle
        from permon_tpu.feti.large import FetiSolverSparse

        prob, BI, cI, cap = build_obstacle((15,) * 3, (2,) * 3)
        tol = Tolerances(rtol=1e-5)
        base = dict(gluing="nonred", deterministic=True, coarse="sparse")
        r0 = FetiSolverSparse(
            prob, FetiOptions(**base), BI=BI, cI=cI
        ).solve(tol=tol)
        r1 = FetiSolverSparse(
            prob, FetiOptions(**base, mesh=mesh8), BI=BI, cI=cI
        ).solve(tol=tol)
        assert int(r1.result.iterations) == int(r0.result.iterations)
        assert int(r1.result.inner_iterations) == int(
            r0.result.inner_iterations
        )
        np.testing.assert_allclose(r1.x_global, r0.x_global, atol=1e-8)

    def test_redundancy_groups_two_level_mesh(self, mesh8):
        """qppf_redundancy on a ('host', 'sd') mesh: the GG' factor sharded
        over the within-group axis, one distributed copy per host group —
        counts and solution match full replication (-qppf_redundancy,
        qppf.c:182-333)."""
        from examples.feti_large import build_obstacle
        from permon_tpu.feti.large import FetiSolverSparse
        from permon_tpu.parallel import make_mesh2

        prob, BI, cI, cap = build_obstacle((15,) * 3, (2,) * 3)
        tol = Tolerances(rtol=1e-5)
        base = dict(gluing="nonred", deterministic=True, coarse="sparse")
        r0 = FetiSolverSparse(
            prob, FetiOptions(**base), BI=BI, cI=cI
        ).solve(tol=tol)
        mesh2 = make_mesh2((2, 4))
        r2 = FetiSolverSparse(
            prob, FetiOptions(**base, mesh=mesh2, qppf_redundancy=True),
            BI=BI, cI=cI,
        ).solve(tol=tol)
        assert int(r2.result.iterations) == int(r0.result.iterations)
        np.testing.assert_allclose(r2.x_global, r0.x_global, atol=1e-6)

    def test_northstar_twin_sharded_midsize(self, mesh8):
        """The north-star CI twin (20^3 cells, 4x4x4 = 64 subdomains, 23 dual
        CG its, f32 factors + refine + f64 defect correction) run UNDER the
        mesh — realistic fan-in with the overflow COO, the sparse coarse and
        the full precision recipe interacting at once (VERDICT r4 weak 5):
        (a) flat 8-device mesh, (b) ('host','sd') (2,4) mesh with
        redundancy-group coarse.  Counts must equal the serial twin's pinned
        23 and the assembled residual stays f64-grade."""
        from examples.feti_large import assembled_system, build_sparse
        from permon_tpu.parallel import make_mesh2

        prob = build_sparse((20,) * 3, (4,) * 3)
        assert prob.ns == 64
        A, b = assembled_system((20,) * 3)
        tol = Tolerances(rtol=1e-5)
        base = dict(gluing="nonred", deterministic=True, coarse="sparse")
        recipe = dict(kplus_dtype=jnp.float32, kplus_refine=2,
                      primal_refine=1)
        r_flat = feti_solve_sparse(
            prob, FetiOptions(**base, mesh=mesh8), tol=tol, **recipe
        )
        assert int(r_flat.result.iterations) == 23
        resid = np.linalg.norm(A @ r_flat.x_global - b) / np.linalg.norm(b)
        assert resid < 1e-8, resid
        r_red = feti_solve_sparse(
            prob,
            FetiOptions(**base, mesh=make_mesh2((2, 4)),
                        qppf_redundancy=True),
            tol=tol, **recipe,
        )
        assert int(r_red.result.iterations) == 23
        resid = np.linalg.norm(A @ r_red.x_global - b) / np.linalg.norm(b)
        assert resid < 1e-8, resid


class TestLargePathOptionParity:
    """FetiOptions behave identically (or refuse loudly) across the dense
    and sparse facades (VERDICT r3 missing #3/#4)."""

    def test_project_false_raises(self, prob):
        with pytest.raises(NotImplementedError, match="project"):
            feti_solve_sparse(prob, FetiOptions(project=False))

    def test_orth_g_raises(self, prob):
        with pytest.raises(NotImplementedError, match="orth_G"):
            feti_solve_sparse(prob, FetiOptions(orth_G="gs"))

    def test_throughput_raises(self, prob):
        """throughput=True is the dense leaf/explicit-inverse path; on the
        large path it used to be a silent no-op (VERDICT r4 weak 7)."""
        with pytest.raises(NotImplementedError, match="throughput"):
            feti_solve_sparse(prob, FetiOptions(throughput=True))

    def test_dirichlet_in_hessian_matches_by_b(self):
        """dirichlet_by_B=False (classical FETI: symmetric elimination in K,
        touched blocks grounded) must reproduce the TFETI by-B solution AND
        the dense path's dir-in-hess solution (qpfeti.c:153-312)."""
        from examples.feti_ex1 import build
        from permon_tpu.feti.solve import feti_solve

        ns, ne = 4, 6
        prob_d = build(ns, ne)
        tol = Tolerances(rtol=1e-8)
        sprob = SparseFetiProblem(
            K_blocks=[sp.csr_matrix(prob_d.K_blocks[s]) for s in range(ns)],
            b_loc=prob_d.b_loc, l2g=prob_d.l2g,
            floating=np.ones(ns, dtype=bool),
            dirichlet=prob_d.dirichlet,
        )
        r_byB = feti_solve_sparse(
            sprob, FetiOptions(gluing="nonred"), tol=tol
        )
        r_inK = feti_solve_sparse(
            sprob, FetiOptions(gluing="nonred", dirichlet_by_B=False), tol=tol
        )
        r_dense = feti_solve(
            prob_d, FetiOptions(gluing="nonred", dirichlet_by_B=False),
            tol=tol,
        )
        np.testing.assert_allclose(r_inK.x_global, r_byB.x_global, atol=1e-7)
        np.testing.assert_allclose(
            r_inK.x_global, r_dense.x_global, atol=1e-7
        )
        # Dirichlet rows actually hold: boundary values are exact
        assert abs(r_inK.x_global[0]) < 1e-10
        assert abs(r_inK.x_global[-1]) < 1e-10

    def test_dirichlet_in_hessian_values(self):
        """Nonzero Dirichlet values through the sparse dir-in-hess path."""
        from examples.feti_ex1 import build

        ns, ne = 4, 6
        prob_d = build(ns, ne)
        vals = np.array([0.5, -0.25])
        sprob = SparseFetiProblem(
            K_blocks=[sp.csr_matrix(prob_d.K_blocks[s]) for s in range(ns)],
            b_loc=prob_d.b_loc, l2g=prob_d.l2g,
            floating=np.ones(ns, dtype=bool),
            dirichlet=prob_d.dirichlet, dirichlet_values=vals,
        )
        tol = Tolerances(rtol=1e-9)
        r_byB = feti_solve_sparse(
            dataclasses.replace(sprob), FetiOptions(gluing="nonred"), tol=tol
        )
        r_inK = feti_solve_sparse(
            sprob, FetiOptions(gluing="nonred", dirichlet_by_B=False), tol=tol
        )
        np.testing.assert_allclose(r_inK.x_global[0], 0.5, atol=1e-8)
        np.testing.assert_allclose(r_inK.x_global[-1], -0.25, atol=1e-8)
        np.testing.assert_allclose(
            r_inK.x_global, r_byB.x_global, atol=1e-6
        )

    @staticmethod
    def _dirichlet_sprob(vals=(0.5, -0.25)):
        from examples.feti_ex1 import build

        ns, ne = 4, 6
        prob_d = build(ns, ne)
        return SparseFetiProblem(
            K_blocks=[sp.csr_matrix(prob_d.K_blocks[s]) for s in range(ns)],
            b_loc=prob_d.b_loc, l2g=prob_d.l2g,
            floating=np.ones(ns, dtype=bool),
            dirichlet=prob_d.dirichlet,
            dirichlet_values=np.asarray(vals, dtype=float),
        )

    def test_resolve_new_rhs_reapplies_dirichlet_elimination(self):
        """solve(b_loc=...) with dirichlet_by_B=False must re-apply the
        rhs-side elimination (lift + alpha*value rows) so a re-solve with a
        new rhs equals a fresh solve of that rhs (advisor r4 medium)."""
        from permon_tpu.feti.large import FetiSolverSparse

        sprob = self._dirichlet_sprob()
        tol = Tolerances(rtol=1e-10)
        opts = FetiOptions(gluing="nonred", dirichlet_by_B=False)
        solver = FetiSolverSparse(sprob, opts)
        solver.solve(tol=tol)
        b2 = sprob.b_loc * 1.7 + 0.3
        r2 = solver.solve(b_loc=b2, tol=tol)
        fresh = FetiSolverSparse(
            dataclasses.replace(sprob, b_loc=b2), opts
        ).solve(tol=tol)
        np.testing.assert_allclose(r2.x_global, fresh.x_global, atol=1e-9)
        # the boundary conditions actually hold on the re-solve
        np.testing.assert_allclose(r2.x_global[0], 0.5, atol=1e-9)
        np.testing.assert_allclose(r2.x_global[-1], -0.25, atol=1e-9)

    def test_primal_refine_dirichlet_in_hessian(self):
        """primal_refine defect passes must compute the residual against the
        ELIMINATED blocks/rhs (the system the factors solve), keeping the
        Dirichlet dofs exact instead of drifting O(r/alpha) per pass
        (advisor r4 low).  f32 factors + 1 refine pass reach f64-grade
        boundary values."""
        from permon_tpu.feti.large import FetiSolverSparse

        sprob = self._dirichlet_sprob()
        tol = Tolerances(rtol=1e-10)
        res = FetiSolverSparse(
            sprob, FetiOptions(gluing="nonred", dirichlet_by_B=False),
            kplus_dtype=jnp.float32, primal_refine=1,
        ).solve(tol=tol)
        np.testing.assert_allclose(res.x_global[0], 0.5, atol=1e-8)
        np.testing.assert_allclose(res.x_global[-1], -0.25, atol=1e-8)
        byB = FetiSolverSparse(
            self._dirichlet_sprob(), FetiOptions(gluing="nonred")
        ).solve(tol=tol)
        np.testing.assert_allclose(res.x_global, byB.x_global, atol=1e-6)


class TestElasticityLargePath:
    """3-D Q1 elasticity through the sparse/large path (ex71 -pde_type
    Elasticity at scale — reference element tables ex71.c:26-99, rigid-body
    nullspace feti/ex71.c:331-339): band K+ over the 3-dofs/node interleaved
    blocks, 6-mode RBM nullspace from nodal coords (nullspace='rbm'), TFETI
    Dirichlet by B rows or classical in-Hessian elimination."""

    CELLS = (6, 6, 6)
    GRID = (2, 2, 1)

    @pytest.fixture(scope="class")
    def eprob(self):
        from examples.feti_large import build_sparse_elasticity

        return build_sparse_elasticity(self.CELLS, self.GRID)

    @pytest.fixture(scope="class")
    def oracle(self):
        import scipy.sparse.linalg as spla

        from examples.feti_large import assembled_elasticity_system

        K, b = assembled_elasticity_system(self.CELLS)
        return K, b, spla.spsolve(K.tocsc(), b)

    @pytest.fixture(scope="class")
    def ref_byB(self, eprob):
        return feti_solve_sparse(
            eprob,
            FetiOptions(gluing="nonred", nullspace="rbm", dirichlet_by_B=True),
            tol=Tolerances(rtol=1e-6),
        )

    def test_solves_assembled_system(self, eprob, oracle, ref_byB):
        K, b, x = oracle
        assert int(ref_byB.result.reason) > 0
        err = np.linalg.norm(ref_byB.x_global - x) / np.linalg.norm(x)
        assert err < 1e-6, err

    def test_dirichlet_in_hessian(self, eprob, oracle):
        """Classical FETI: the clamped-face blocks are eliminated + grounded
        (no RBM columns); solution must match the TFETI by-B variant's."""
        K, b, x = oracle
        res = feti_solve_sparse(
            eprob,
            FetiOptions(gluing="nonred", nullspace="rbm",
                        dirichlet_by_B=False),
            tol=Tolerances(rtol=1e-6),
        )
        err = np.linalg.norm(res.x_global - x) / np.linalg.norm(x)
        assert err < 1e-6, err

    def test_iteration_count_matches_dense_path(self, eprob, oracle, ref_byB):
        """The projected pipeline is invariant to the K+/R realization:
        band K+ with analytic RBMs must track the dense path with its
        NUMERIC per-block nullspace (same counts, PARITY.md).  Solutions
        are compared through the direct oracle: by-B Dirichlet enforcement
        is only solver-tolerance exact, so the pointwise cross-path diff is
        dominated by near-zero clamped dofs."""
        from permon_tpu.feti.assembly import FetiProblem
        from permon_tpu.feti.solve import feti_solve

        K, b, x = oracle
        Kd = np.stack([Ks.toarray() for Ks in eprob.K_blocks])
        dprob = FetiProblem(
            K_blocks=Kd, b_loc=eprob.b_loc, l2g=eprob.l2g,
            dirichlet=eprob.dirichlet,
            dirichlet_numtype=eprob.dirichlet_numtype,
            coords=eprob.coords,
        )
        res_d = feti_solve(
            dprob,
            FetiOptions(gluing="nonred", nullspace="numeric",
                        dirichlet_by_B=True),
            tol=Tolerances(rtol=1e-6),
        )
        it_s, it_d = int(ref_byB.result.iterations), int(res_d.result.iterations)
        assert abs(it_s - it_d) <= 1, (it_s, it_d)
        err = np.linalg.norm(res_d.x_global - x) / np.linalg.norm(x)
        assert err < 1e-6, err

    def test_f32_factors_with_refine(self, eprob, oracle):
        """The production recipe (f32 band factors + iterative refinement)
        stays within a few iterations and reaches engineering accuracy."""
        K, b, x = oracle
        res = feti_solve_sparse(
            eprob,
            FetiOptions(gluing="nonred", nullspace="rbm", dirichlet_by_B=True),
            tol=Tolerances(rtol=1e-6),
            kplus_dtype=jnp.float32, kplus_refine=2,
        )
        err = np.linalg.norm(res.x_global - x) / np.linalg.norm(x)
        assert err < 1e-4, err

    def test_sharded_matches_single_device(self):
        """Elasticity under the mesh: 6-column RBM coarse (k = 6 ns), the
        3-dofs/node gather tables and the band factors sharded over 'sd' —
        counts EQUAL the single-device solve (deterministic reductions)."""
        import jax

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 (virtual) devices")
        from examples.feti_large import build_sparse_elasticity
        from permon_tpu.parallel import make_mesh

        prob = build_sparse_elasticity((6, 6, 8), (2, 2, 2))
        base = dict(gluing="nonred", nullspace="rbm", dirichlet_by_B=True,
                    deterministic=True, coarse="sparse")
        tol = Tolerances(rtol=1e-6)
        ref = feti_solve_sparse(prob, FetiOptions(**base), tol=tol)
        res = feti_solve_sparse(
            prob, FetiOptions(**base, mesh=make_mesh(8)), tol=tol
        )
        assert int(res.result.iterations) == int(ref.result.iterations)
        np.testing.assert_allclose(res.x_global, ref.x_global, atol=1e-7)

    def test_contact_matches_assembled_box_qp(self):
        """Elastic CONTACT (the north-star problem class): far-face plane
        obstacle u_x <= gap through the large path, both the projected
        SMALXE and the adaptive SMALBE (project=False) variants, against
        the assembled box-QP solved by plain MPRGP."""
        import permon_tpu as pt
        from examples.feti_large import (
            assembled_elasticity_system,
            build_obstacle_elasticity,
        )
        from permon_tpu.qpc.box import BoxConstraint

        cells, grid = (8, 8, 8), (2, 2, 1)
        prob, BI, cI, gap = build_obstacle_elasticity(cells, grid)
        K, b = assembled_elasticity_system(cells)
        Mx = cells[0] + 1
        n = len(b)
        ids = np.arange(n)
        face = (ids % 3 == 0) & ((ids // 3) % Mx == Mx - 1)
        ub = np.full(n, np.inf)
        ub[face] = gap
        qp = pt.QP(
            A=pt.make_operator(K), b=jnp.asarray(b),
            box=BoxConstraint.create(n, ub=jnp.asarray(ub)),
        )
        xr = np.asarray(pt.solve(qp, tol=Tolerances(rtol=1e-9, max_it=5000)).x)
        # a genuine active set forms (the obstacle actually binds)
        assert (xr[face] > gap - 1e-8).sum() > 0
        for project in (True, False):
            r = feti_solve_sparse(
                prob,
                FetiOptions(gluing="nonred", nullspace="rbm", project=project),
                BI=BI, cI=cI, tol=Tolerances(rtol=1e-7),
            )
            err = np.linalg.norm(r.x_global - xr) / np.linalg.norm(xr)
            assert err < 1e-5, (project, err)
            assert (r.x_global[face] <= gap + 1e-4).all()
