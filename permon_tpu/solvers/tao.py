"""External/auxiliary bound-constrained solvers — the QPSTAO analog.

The reference's QPSTAO (src/qps/impls/tao/qpstao.c) adapts PETSc TAO
bound-constrained solvers (default TAOGPCG, alternatively BLMVM) to the QPS
interface: objective/gradient callbacks from the QP, box bounds expanded to
full +-inf vectors, and a custom convergence test mapping ||gP|| to QPS
reasons (qpstao.c:134-220).  Here:

- ``gpcg``  — a native implementation of More--Toraldo GPCG (gradient
  projection + conjugate gradients on the free set), the algorithm behind
  TAOGPCG, with the same outer convergence test as the rest of the library;
- ``blmvm`` — an adapter to scipy.optimize L-BFGS-B (the projected
  limited-memory BFGS family BLMVM belongs to), run host-side exactly like
  the reference treats TAO as an external black box.

Both return a result with the common (x, reason, iterations, rnorm) surface
so ``solve(qp, qps_type="tao")`` is a drop-in QPS type.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..core.convergence import ConvergedReason, Tolerances
from ..qp.qp import QP


@dataclasses.dataclass
class TAOResult:
    x: np.ndarray
    reason: int
    iterations: int
    rnorm: float
    nmv: int = 0
    ksp_its: int = 0  # inner CG iterations (gpcg)
    pg_its: int = 0  # gradient-projection steps (gpcg)
    objective: float = 0.0


def _proj_grad_norm(x, g, lb, ub):
    """Norm of the projected gradient (TAO's convergence quantity)."""
    gp = np.where((x <= lb) & (g > 0), 0.0, g)
    gp = np.where((x >= ub) & (gp < 0), 0.0, gp)
    return float(np.linalg.norm(gp))


def tao_solve(qp: QP, tao_type: str = "gpcg", tol: Tolerances = Tolerances(), **kw):
    if tao_type == "gpcg":
        return gpcg(qp, tol=tol, **kw)
    if tao_type == "blmvm":
        return blmvm(qp, tol=tol, **kw)
    raise ValueError(f"unknown tao type {tao_type!r}")


def gpcg(qp: QP, tol: Tolerances = Tolerances(), pg_tol: float = 0.1,
         max_pg_steps: int = 8) -> TAOResult:
    """More--Toraldo GPCG for min 1/2 x'Ax - b'x s.t. lb <= x <= ub.

    Outer iteration = a sweep of projected-gradient (Cauchy) steps followed
    by CG restricted to the free set; the active set freezes when the PG
    steps stop changing it enough (reduction factor ``pg_tol``, TAO's
    -tao_gpcg_... default 0.1).  Convergence on ||gP|| <= max(rtol*||b||,
    atol), the same test QPS installs into TAO (qpstao.c:171-200)."""
    A = qp.A
    b = np.asarray(qp.b)
    n = b.shape[0]
    lb = np.asarray(qp.box.lb) if qp.box is not None else np.full(n, -np.inf)
    ub = np.asarray(qp.box.ub) if qp.box is not None else np.full(n, np.inf)
    x = np.clip(np.asarray(qp.initial_vector()), lb, ub)

    mv = lambda v: np.asarray(A.mv(jnp.asarray(v)))
    nmv = ksp_its = pg_its = 0
    g = mv(x) - b
    nmv += 1
    ttol = max(tol.rtol * np.linalg.norm(b), tol.atol)
    reason = int(ConvergedReason.ITERATING)
    it = 0
    while it < tol.max_it:
        rnorm = _proj_grad_norm(x, g, lb, ub)
        if rnorm <= ttol:
            reason = int(ConvergedReason.CONVERGED_RTOL)
            break
        # --- gradient projection sweep -----------------------------------
        binding0 = (x <= lb) | (x >= ub)
        for _ in range(max_pg_steps):
            d = -np.where(((x <= lb) & (g > 0)) | ((x >= ub) & (g < 0)), 0.0, g)
            if not d.any():
                break
            Ad = mv(d)
            nmv += 1
            dAd = d @ Ad
            alpha = (-(g @ d) / dAd) if dAd > 0 else 1.0
            x_new = np.clip(x + alpha * d, lb, ub)
            g = mv(x_new) - b
            nmv += 1
            x = x_new
            pg_its += 1
            binding = (x <= lb) | (x >= ub)
            # stop sweeping once the active set settles (More-Toraldo rule)
            if np.array_equal(binding, binding0):
                break
            binding0 = binding
        # --- CG on the free set ------------------------------------------
        free = ~((x <= lb) | (x >= ub))
        if free.any():
            r = -np.where(free, g, 0.0)
            p = r.copy()
            rr = r @ r
            cg_target = max(pg_tol * np.sqrt(rr), ttol)
            while np.sqrt(rr) > cg_target and ksp_its < tol.max_it:
                Ap = np.where(free, mv(np.where(free, p, 0.0)), 0.0)
                nmv += 1
                pAp = p @ Ap
                if pAp <= 0:
                    break
                a = rr / pAp
                # cut the step at the first bound hit (feasible CG)
                with np.errstate(divide="ignore", invalid="ignore"):
                    step_lb = np.where(p < 0, (lb - x) / p, np.inf)
                    step_ub = np.where(p > 0, (ub - x) / p, np.inf)
                amax = float(np.min(np.minimum(step_lb, step_ub)[free], initial=np.inf))
                hit = a > amax
                a = min(a, amax)
                x = np.clip(x + a * np.where(free, p, 0.0), lb, ub)
                ksp_its += 1
                if hit:
                    g = mv(x) - b
                    nmv += 1
                    break
                r = r - a * Ap
                rr_new = r @ r
                p = r + (rr_new / rr) * p
                rr = rr_new
            g = mv(x) - b
            nmv += 1
        it += 1
    else:
        reason = int(ConvergedReason.DIVERGED_MAX_IT)
    obj = 0.5 * x @ (mv(x)) - b @ x
    return TAOResult(
        x=x, reason=reason, iterations=it,
        rnorm=_proj_grad_norm(x, g, lb, ub), nmv=nmv, ksp_its=ksp_its,
        pg_its=pg_its, objective=float(obj),
    )


def blmvm(qp: QP, tol: Tolerances = Tolerances(), maxiter: Optional[int] = None) -> TAOResult:
    """Projected quasi-Newton via scipy L-BFGS-B — the BLMVM-family adapter
    (the reference's -qps_tao_type blmvm path, qpstao.c)."""
    from scipy.optimize import minimize

    A = qp.A
    b = np.asarray(qp.b)
    n = b.shape[0]
    lb = np.asarray(qp.box.lb) if qp.box is not None else np.full(n, -np.inf)
    ub = np.asarray(qp.box.ub) if qp.box is not None else np.full(n, np.inf)
    nmv = [0]

    def fg(x):
        Ax = np.asarray(A.mv(jnp.asarray(x)))
        nmv[0] += 1
        return 0.5 * x @ Ax - b @ x, Ax - b

    ttol = max(tol.rtol * np.linalg.norm(b), tol.atol)
    # scipy's gtol bounds the INF-norm of the projected gradient; the QPS
    # convergence surface is the 2-norm, so scale by 1/sqrt(n) to guarantee
    # ||gP||_2 <= ttol at exit (matches the reference's TAO custom test,
    # qpstao.c:171-200, which installs the 2-norm criterion into TAO)
    res = minimize(
        fg, np.clip(np.asarray(qp.initial_vector()), lb, ub), jac=True,
        method="L-BFGS-B", bounds=list(zip(lb, ub)),
        options={"maxiter": maxiter or tol.max_it, "gtol": ttol / np.sqrt(n), "ftol": 0.0},
    )
    g = fg(res.x)[1]
    rnorm = _proj_grad_norm(res.x, g, lb, ub)
    reason = int(
        ConvergedReason.CONVERGED_RTOL if rnorm <= ttol * 10 else ConvergedReason.DIVERGED_MAX_IT
    )
    return TAOResult(
        x=res.x, reason=reason, iterations=int(res.nit), rnorm=rnorm,
        nmv=nmv[0], objective=float(res.fun),
    )
