"""SMALXE (augmented Lagrangian) tests: equality + box constrained QPs,
cross-validated against scipy's trust-constr solver."""

import numpy as np
import pytest

import permon_tpu as pt
from permon_tpu.solvers.smalxe import SMALXEOptions, smalxe
from permon_tpu.core.convergence import ConvergedReason, Tolerances


def _problem(n=30, seed=0, with_box=True):
    rng = np.random.default_rng(seed)
    L = np.zeros((n, n))
    L[np.arange(n), np.arange(n)] = 2.0
    L[np.arange(n - 1), np.arange(1, n)] = -1.0
    L[np.arange(1, n), np.arange(n - 1)] = -1.0
    A = L + 0.5 * np.eye(n)
    b = rng.normal(size=n)
    # two equality constraints with zero rhs
    BE = np.zeros((2, n))
    BE[0, :] = 1.0
    BE[1, : n // 2] = 1.0
    BE[1, n // 2 :] = -1.0
    lb = np.full(n, -0.3) if with_box else None
    return A, b, BE, lb


def _scipy_solution(A, b, BE, lb):
    from scipy.optimize import LinearConstraint, minimize

    n = A.shape[0]
    cons = [LinearConstraint(BE, 0.0, 0.0)]
    bounds = None if lb is None else [(l, None) for l in lb]
    x0 = np.zeros(n) if lb is None else np.maximum(np.zeros(n), lb)
    sol = minimize(
        lambda x: 0.5 * x @ A @ x - b @ x,
        x0,
        jac=lambda x: A @ x - b,
        constraints=cons,
        bounds=bounds,
        method="SLSQP",
        options={"maxiter": 2000, "ftol": 1e-14},
    )
    assert sol.success
    return sol.x


class TestSmalxe:
    @pytest.mark.parametrize("with_box", [True, False])
    def test_equality_qp(self, with_box):
        A, b, BE, lb = _problem(with_box=with_box)
        qp = pt.QP.create(A, b, BE=BE, lb=lb)
        res = smalxe(qp, tol=Tolerances(rtol=1e-7))
        assert int(res.reason) > 0, f"reason={int(res.reason)}"
        # equality feasibility at the outer tolerance level
        assert float(res.normBu) / np.linalg.norm(b) < 1e-6
        xref = _scipy_solution(A, b, BE, lb)
        np.testing.assert_allclose(np.asarray(res.x), xref, atol=5e-5)

    def test_driver_dispatch(self):
        A, b, BE, lb = _problem()
        qp = pt.QP.create(A, b, BE=BE, lb=lb)
        res = pt.solve(qp, tol=Tolerances(rtol=1e-6))
        assert int(res.reason) > 0

    def test_multiplier_recovery(self):
        """KKT: A x - b + BE' mu - lambda_lb ~ 0 with Bt_lambda = BE' mu."""
        A, b, BE, lb = _problem()
        qp = pt.QP.create(A, b, BE=BE, lb=lb)
        res = smalxe(qp, tol=Tolerances(rtol=1e-8))
        x = np.asarray(res.x)
        r = A @ x - b + np.asarray(res.Bt_lambda)
        llb = np.maximum(r, 0) if False else r  # lb-only: llb = r
        # residual of stationarity after removing the box multiplier
        act = np.abs(x - np.asarray(qp.box.lb)) < 1e-8
        # on the free set llb should vanish
        assert np.linalg.norm(r[~act]) / np.linalg.norm(b) < 1e-5
        # on the active set the multiplier must be nonnegative-ish
        assert r[act].min() > -1e-5 if act.any() else True

    def test_rho_update_late_fires(self):
        """With a loose eta the gtol path drives state->3 and rho updates."""
        A, b, BE, lb = _problem()
        qp = pt.QP.create(A, b, BE=BE, lb=lb)
        res = smalxe(
            qp,
            opts=SMALXEOptions(rho=1.0, rho_update_late=4.0),
            tol=Tolerances(rtol=1e-6),
        )
        assert int(res.reason) > 0
