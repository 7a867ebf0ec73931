"""TAO-adapter parity tests vs the reference's TAO oracles.

The reference treats TAO as an external black box (QPSTAO,
src/qps/impls/tao/qpstao.c); its committed oracles therefore check (a) the
converged objective value and KKT residual levels (ex1_gpcg.out) and (b) the
TAO-vs-QP solution difference against the tolerance
``10 * max(rtol*||b||, atol)`` with rtol = gttol = 1e-6, atol = gatol = 1e-8
(jbearing2.c:556, jbearing2_1/2/3.out).  The internal TAO iteration counts
are PETSc-version-dependent and not part of the parity surface here.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

import permon_tpu as pt
from permon_tpu.core.convergence import ConvergedReason, Tolerances
from permon_tpu.qpc.box import BoxConstraint
from permon_tpu.solvers.tao import blmvm, gpcg, tao_solve


def _ex1_qp(n=100):
    from examples.ex1 import build

    A, b, lb = build(n)
    op = pt.Ell.from_scipy(sp.csr_matrix(A))
    return pt.QP(A=op, b=jnp.asarray(b), box=BoxConstraint.create(len(b), lb=jnp.asarray(lb)))


class TestEx1GPCG:
    """Oracle src/tutorials/output/ex1_gpcg.out: CONVERGED_RTOL,
    Objective value=-0.291767, KKT lines r=0.00e+00 / ||min(x-lb,0)||=0 /
    ||min(lambda_lb,0)|| ~ 3e-10 / |lambda'(lb-x)| ~ 2e-10."""

    def test_objective_and_kkt(self):
        qp = _ex1_qp()
        tol = Tolerances(rtol=1e-6, atol=1e-8)  # oracle-level KKT digits
        res = gpcg(qp, tol=tol)
        assert res.reason == ConvergedReason.CONVERGED_RTOL
        # objective printed to 6 digits in the oracle
        np.testing.assert_allclose(res.objective, -0.291767, atol=5e-7)
        x = np.asarray(res.x)
        lb = np.asarray(qp.box.lb)
        b = np.asarray(qp.b)
        g = np.asarray(qp.A.mv(jnp.asarray(x))) - b
        nb = np.linalg.norm(b)
        # reference multiplier reconstruction sets lambda_lb = Ax - b, so
        # r = ||Ax - b - lambda_lb|| = 0 exactly (ex1_gpcg.out line 1) and the
        # KKT quality lives in ||min(lambda_lb,0)|| and the complementarity
        assert np.linalg.norm(np.minimum(x - lb, 0.0)) == 0.0
        assert np.linalg.norm(np.minimum(g, 0.0)) / nb < 10 * tol.rtol
        assert abs(np.maximum(g, 0.0) @ (lb - x)) / nb < 10 * tol.rtol

    def test_dispatch(self):
        qp = _ex1_qp(40)
        res = tao_solve(qp, "gpcg")
        assert res.reason == ConvergedReason.CONVERGED_RTOL


class TestJBearingTAO:
    """Oracles jbearing2_1/2/3.out: the blmvm solution agrees with the QP
    solution within 10*max(1e-6*||b||, 1e-8) on grids 8x12 / 10x16 / 30x30
    (the nsize-2/3 runs share the same serial math)."""

    @pytest.mark.parametrize("nx,ny", [(8, 12), (10, 16), (30, 30)])
    def test_cross_check(self, nx, ny):
        from examples.jbearing2 import build

        A, rhs, lb, ub = build(nx=nx, ny=ny)
        qp = pt.QP.create(A, rhs, lb=lb, ub=ub)
        tol = Tolerances(rtol=1e-6, atol=1e-8)
        res_qp = pt.solve(qp, tol=tol)
        res_tao = blmvm(qp, tol=tol)
        diff_tol = 10.0 * max(tol.rtol * np.linalg.norm(rhs), tol.atol)
        diff = np.linalg.norm(np.asarray(res_qp.x) - res_tao.x)
        assert diff <= diff_tol, (diff, diff_tol)
        assert res_tao.reason == ConvergedReason.CONVERGED_RTOL
