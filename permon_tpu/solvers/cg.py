"""Conjugate gradients for unconstrained QPs (the QPSKSP analog) and
projected preconditioned CG (PCPG) for equality-constrained QPs.

Reference: src/qps/impls/ksp/qpsksp.c (wraps KSPCG) and
src/qps/impls/pcpg/pcpg.c (FETI-1 style projected CG: w = P r, z = M w,
y = P z, standard CG recurrence on projected quantities).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..core.convergence import Tolerances, converged_default
from ..core import detred
from ..qp.qp import QP


@struct.dataclass
class CGResult:
    x: jax.Array
    reason: jax.Array
    iterations: jax.Array
    rnorm: jax.Array
    nmv: jax.Array
    #: fixed-size per-iteration ||Pr|| buffer (NaN past the last iteration)
    #: when the solver was called with ``history > 0`` — the QPS residual
    #: history arrays (qpsimpl.h:62-70)
    rnorm_history: Optional[jax.Array] = None


def cg(
    qp: QP,
    tol: Tolerances = Tolerances(),
    precond: Optional[Callable] = None,
    project: Optional[Callable] = None,
    monitor: bool = False,
    history: int = 0,
) -> CGResult:
    """(Projected, preconditioned) CG on 1/2 x'Ax - b'x.

    With ``project`` = P (orthogonal projector onto ker BE) this is PCPG
    (reference: pcpg.c:51-134): every search direction and residual stays in
    the projected subspace; convergence is tested on ||P r|| (w).
    ``history`` > 0 records that many per-iteration residual norms in a
    fixed-size device buffer surfaced as ``result.rnorm_history``.
    """
    from ..core.precision import dot_bundler, reducers

    A, b = qp.A, qp.b
    vdot, vnorm = reducers(qp.dots_dtype)  # f64-promoted dots under 'mixed'
    vdots = dot_bundler(qp.dots_dtype)
    # fuse (w'y, w'w) into one batched tree when the bundle actually batches
    # (promoted or deterministic reductions — bit-identical per row); the
    # plain-f64 path keeps its original separate reductions untouched
    fuse = qp.dots_dtype is not None or detred.enabled()
    x0 = qp.initial_vector()

    norm_rhs = vnorm(b)
    ttol = jnp.maximum(tol.rtol * norm_rhs, tol.atol)
    P = project if project is not None else (lambda v: v)
    M = precond if precond is not None else (lambda v: v)
    nh = int(history)

    def body(carry):
        x, r, w, z, p, wz, rn2, it, reason, nmv, hist = carry
        rnorm = jnp.sqrt(rn2.real) if fuse else vnorm(w)
        if nh:
            hist = hist.at[jnp.minimum(it, nh - 1)].set(rnorm)
        if monitor:
            jax.debug.print("{it:>3} CG ||Pr||={r:.10e}", it=it, r=rnorm)
        reason = converged_default(
            it, rnorm, ttol=ttol, atol=tol.atol, divtol=tol.divtol,
            norm_rhs_div=norm_rhs, max_it=tol.max_it,
        )

        def step(_):
            Ap = A.mv(p)
            pAp = vdot(p, Ap)
            a = wz / pAp
            # breakdown handling a la PETSc KSPSolve_CG: a nonpositive or
            # non-finite curvature means the (projected) residual has hit
            # numerical zero (e.g. the coarse space spans the whole dual
            # space so P = 0) — keep the current iterate and stop with
            # CONVERGED_ATOL rather than polluting x with NaN
            broke = jnp.logical_not(jnp.isfinite(a)) | (pAp <= 0.0)
            a = jnp.where(broke, 0.0, a).astype(x.dtype)
            x2 = x + a * p
            r2 = r - a * Ap
            w2 = P(r2)
            z2 = M(w2)
            y2 = P(z2) if precond is not None else z2
            if fuse:
                wz2, rn2_2 = vdots([(w2, y2), (w2, w2)])
            else:
                wz2, rn2_2 = vdot(w2, y2), rn2
            beta = jnp.where(broke, 0.0, wz2 / wz).astype(x.dtype)
            p2 = y2 + beta * p
            reason2 = jnp.where(broke, jnp.int32(3), reason)
            return (x2, r2, w2, z2, p2, wz2, rn2_2, it + 1, reason2,
                    nmv + 1, hist)

        return jax.lax.cond(
            reason == 0, step,
            lambda _: (x, r, w, z, p, wz, rn2, it, reason, nmv, hist), None,
        )

    r0 = b - A.mv(x0)
    w0 = P(r0)
    z0 = M(w0)
    y0 = P(z0) if precond is not None else z0
    rdtype = jnp.dtype(qp.dots_dtype) if qp.dots_dtype else b.dtype
    hist0 = jnp.full((max(nh, 1),), jnp.nan, dtype=rdtype)
    if fuse:
        wz0, rn20 = vdots([(w0, y0), (w0, w0)])
    else:
        wz0, rn20 = vdot(w0, y0), jnp.zeros((), rdtype)
    carry0 = (x0, r0, w0, z0, y0, wz0, rn20, jnp.int32(0),
              jnp.int32(0), jnp.int32(1), hist0)
    out = jax.lax.while_loop(lambda c: c[8] == 0, body, carry0)
    x, _, w, _, _, _, _, it, reason, nmv, hist = out
    return CGResult(x=x, reason=reason, iterations=it, rnorm=vnorm(w),
                    nmv=nmv, rnorm_history=hist if nh else None)


def pcpg(
    qp: QP,
    tol: Tolerances = Tolerances(),
    precond: Optional[Callable] = None,
    monitor: bool = False,
) -> CGResult:
    """PCPG — projected preconditioned CG for an equality-constrained QP
    (the QPSPCPG solver type, reference: src/qps/impls/pcpg/pcpg.c).

    A nonzero cE is homogenized away first exactly as QPSSolve_PCPG does
    (pcpg.c:32-41 calls QPTHomogenizeEq); the projector onto ker BE comes
    from the QP's projector factory.  The preconditioner is applied inside
    the projection sandwich y = P M P r (pcpg.c:51-134)."""
    assert qp.BE is not None, "PCPG requires linear equality constraints"
    from ..qp.transforms import Solution, ensure_pf, homogenize_eq

    qp = ensure_pf(qp)
    post = None
    if qp.cE is not None:
        qp, post = homogenize_eq(qp)
        qp = ensure_pf(qp)
    res = cg(qp, tol=tol, precond=precond, project=qp.pf.apply_p, monitor=monitor)
    if post is not None:
        res = res.replace(x=post(Solution(x=res.x)).x)
    return res
