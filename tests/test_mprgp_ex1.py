"""Parity test of MPRGP on tutorial ex1 (1-D obstacle problem).

Reference oracle (src/tutorials/output/ex1_1.out):
  CONVERGED_RTOL, 181 iterations, 200 Hessian multiplications,
  156 CG / 18 expansion / 7 proportioning steps,
  KKT: ||A x - b - lambda_lb|| = 0, ||min(x-lb,0)|| = 0,
       ||min(lambda_lb,0)||/||b|| ~ 6e-6, |lambda_lb'(lb-x)|/||b|| ~ 2e-5.

The iteration count depends (weakly) on the power-method lambda_max estimate;
the deterministic all-ones start vector reproduces the reference trajectory.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

import permon_tpu as pt
from examples.ex1 import build
from permon_tpu.core.convergence import ConvergedReason


@pytest.fixture(scope="module")
def ex1_solution():
    import scipy.sparse as sp

    A, b, lb = build(100)
    qp = pt.QP.create(sp.csr_matrix(A), b, lb=lb)
    res = pt.solve(qp)
    return qp, res


class TestEx1Parity:
    def test_converged_rtol(self, ex1_solution):
        _, res = ex1_solution
        assert int(res.reason) == ConvergedReason.CONVERGED_RTOL

    def test_iteration_counts(self, ex1_solution):
        _, res = ex1_solution
        assert int(res.iterations) == 181
        assert int(res.nmv) == 200
        assert int(res.ncg) == 156
        assert int(res.nexp) == 18
        assert int(res.nprop) == 7

    def test_kkt(self, ex1_solution):
        qp, res = ex1_solution
        x = np.asarray(res.x)
        lb = np.asarray(qp.box.lb)
        b = np.asarray(qp.b)
        normb = np.linalg.norm(b)
        # feasibility is exact (projection)
        assert np.all(x >= lb - 1e-14)
        # stationarity: A x - b - llb == 0 by construction of llb
        g = np.asarray(res.g)
        llb = g
        # multiplier sign ~ 0 at the reference's level (6.17e-06 * ||b||)
        assert np.linalg.norm(np.minimum(llb, 0)) / normb < 1e-4
        # complementarity at the reference's level (2.24e-05 * ||b||)
        gap = np.where(lb <= -np.inf, -1.0, lb - x)
        assert abs(np.dot(llb, gap)) / normb < 1e-4

    def test_matches_dense_reference_solution(self, ex1_solution):
        """Cross-validate against a scipy active-set solve of the same QP."""
        qp, res = ex1_solution
        from scipy.optimize import minimize

        A, b, lb = build(100)
        x0 = np.maximum(np.zeros(100), lb)
        sol = minimize(
            lambda x: 0.5 * x @ A @ x - b @ x,
            x0,
            jac=lambda x: A @ x - b,
            bounds=[(l, None) for l in lb],
            method="L-BFGS-B",
            options={"maxiter": 5000, "ftol": 1e-16, "gtol": 1e-10},
        )
        np.testing.assert_allclose(np.asarray(res.x), sol.x, atol=2e-5)


class TestEx1Variants:
    """The ex1 TEST block's expansion variants (nsize-2 runs in the reference).

    Oracles: ex1_opt.out, ex1_optapprox.out, ex1_bb.out, ex1_projcg.out —
    the bb variant's counts are committed (200 its / 215 mults)."""

    @pytest.mark.parametrize(
        "exp_type,len_type",
        [("gf", "opt"), ("g", "optapprox"), ("gfgr", "bb"), ("projcg", "fixed")],
    )
    def test_variants_converge(self, exp_type, len_type):
        import scipy.sparse as sp

        A, b, lb = build(100)
        qp = pt.QP.create(sp.csr_matrix(A), b, lb=lb)
        res = pt.solve(qp, expansion_type=exp_type, explength_type=len_type)
        assert int(res.reason) == ConvergedReason.CONVERGED_RTOL
        x = np.asarray(res.x)
        assert np.all(x >= np.asarray(qp.box.lb) - 1e-12)

    def test_bb_counts(self):
        import scipy.sparse as sp

        A, b, lb = build(100)
        qp = pt.QP.create(sp.csr_matrix(A), b, lb=lb)
        res = pt.solve(qp, expansion_type="gfgr", explength_type="bb")
        # reference: 200 its, 215 mults (ex1_bb.out)
        assert int(res.iterations) == 200
        assert int(res.nmv) == 215


class TestEx2Parity:
    """Obstacle on a sub-IS (reference: src/tutorials/ex2.c; oracle
    ex2_1_infinite-{false,true}.out: 197 its, 209 mults, 179/11/7 steps)."""

    def test_counts_and_kkt(self):
        from examples.ex2 import main

        qp, res = main(100, view=False)
        assert int(res.reason) == 2  # CONVERGED_RTOL
        assert int(res.iterations) == 197
        assert int(res.nmv) == 209
        assert int(res.ncg) == 179
        assert int(res.nexp) == 11
        assert int(res.nprop) == 7


class TestEx1VariantCounts:
    """Exact oracles for the expansion-variant testset (nsize 2 shares the
    serial trajectory): ex1_{opt,optapprox,bb,projcg}.out."""

    import pytest as _pytest

    @_pytest.mark.parametrize(
        "kw,ref",
        [
            (dict(expansion_type="gf", explength_type="opt"), (184, 217, 161, 16, 7)),
            (dict(expansion_type="g", explength_type="optapprox"), (161, 189, 134, 27, 0)),
            (dict(expansion_type="gfgr", explength_type="bb"), (200, 215, 174, 14, 12)),
            (dict(expansion_type="projcg"), (160, 175, 134, 14, 12)),
        ],
        ids=["opt", "optapprox", "bb", "projcg"],
    )
    def test_exact_counts(self, kw, ref):
        from examples.ex1 import main

        qp, res = main(100, view=False, **kw)
        got = (int(res.iterations), int(res.nmv), int(res.ncg), int(res.nexp), int(res.nprop))
        assert got == ref
