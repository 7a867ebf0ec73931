"""Journal bearing (MINPACK-2 DPJB) parity test.

Oracle (src/tutorials/output/jbearing2_4.out): 23 its, 24 Hessian mults,
21 CG / 0 expansion / 2 proportioning, alpha = 2.0061100039e-01; the
reference cross-validates against TAO (||x_TAO - x_QP|| = 1.8e-7 <= 7.9e-6);
here we cross-validate against scipy L-BFGS-B at the same tolerance level.
"""

import numpy as np

import permon_tpu as pt
from permon_tpu.core.convergence import ConvergedReason, Tolerances
from permon_tpu.core.eig import max_eigenvalue
from examples.jbearing2 import build


class TestJBearing:
    def test_counts(self):
        from examples.jbearing2 import main

        qp, res = main(view=False)
        assert int(res.reason) == ConvergedReason.CONVERGED_RTOL
        assert int(res.iterations) == 23
        assert int(res.nmv) == 24
        assert int(res.ncg) == 21
        assert int(res.nexp) == 0
        assert int(res.nprop) == 2

    def test_alpha_matches(self):
        qp, _, _, _ = (None, None, None, None)
        A, rhs, lb, ub = build()
        op = pt.aslinearoperator(A)
        alpha = 2.0 / float(max_eigenvalue(op))
        # reference monitor prints alpha=2.0061100039e-01
        np.testing.assert_allclose(alpha, 2.0061100039e-01, rtol=1e-9)

    def test_cross_validate(self):
        from scipy.optimize import minimize

        A, rhs, lb, ub = build()
        qp = pt.QP.create(A, rhs, lb=lb, ub=ub)
        res = pt.solve(qp, tol=Tolerances(rtol=1e-6, atol=1e-8))
        Ad = A.toarray()
        sol = minimize(
            lambda x: 0.5 * x @ Ad @ x - rhs @ x,
            np.zeros(len(rhs)),
            jac=lambda x: Ad @ x - rhs,
            bounds=list(zip(lb, ub)),
            method="L-BFGS-B",
            options={"maxiter": 10000, "ftol": 1e-18, "gtol": 1e-12},
        )
        # reference tolerance: 1e2*sqrt(eps) ~ 1.5e-6
        assert np.linalg.norm(np.asarray(res.x) - sol.x) < 7.9e-6


class TestJBearingVariants:
    """The nsize-2/3 grids share the serial oracle files (jbearing2_5/6)."""

    import pytest as _pytest

    @_pytest.mark.parametrize(
        "nx,ny,its,nmv,ncg,nprop",
        [(10, 16, 34, 35, 31, 3), (30, 30, 119, 120, 111, 8)],
    )
    def test_counts(self, nx, ny, its, nmv, ncg, nprop):
        from examples.jbearing2 import main

        qp, res = main(nx=nx, ny=ny, view=False)
        assert int(res.reason) == ConvergedReason.CONVERGED_RTOL
        assert (int(res.iterations), int(res.nmv)) == (its, nmv)
        assert (int(res.ncg), int(res.nexp), int(res.nprop)) == (ncg, 0, nprop)
