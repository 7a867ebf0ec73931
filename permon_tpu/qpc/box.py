"""Separable box constraints lb <= x <= ub — the QPCBOX analog.

Pure elementwise functions (VPU-friendly, fully fusable by XLA) replacing the
reference's QPC object (reference: src/qpc/impls/box/qpcbox.c).

Absent bounds are represented as +-inf-filled arrays instead of NULL vectors:
all formulas below then degenerate to the unbounded case automatically, and a
box constraint restricted to an index subset (the reference's QPC sub-IS,
src/qpc/interface/qpc.c QPCGetSubvector) is simply +-inf outside the subset.
This keeps every shape static under jit.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

_MACHEPS = float(np.finfo(np.float64).eps)
#: active-set tolerance, reference default 10*PETSC_MACHINE_EPSILON
#: (src/qpc/interface/qpc.c:28)
DEFAULT_ASTOL = 10 * _MACHEPS


def _full(bound, n, fill, dtype=None):
    if bound is None:
        return jnp.full(n, fill, dtype=dtype or jnp.result_type(float))
    b = jnp.asarray(bound)
    if dtype is not None and b.dtype != dtype:
        b = b.astype(dtype)
    elif not jnp.issubdtype(b.dtype, jnp.floating):
        b = b.astype(jnp.result_type(float))
    return b


@struct.dataclass
class BoxConstraint:
    """lb <= x <= ub with active-set tolerance ``astol``."""

    lb: jax.Array
    ub: jax.Array
    astol: float = struct.field(pytree_node=False, default=DEFAULT_ASTOL)
    #: which bounds were actually given — controls multiplier recovery/KKT text
    has_lb: bool = struct.field(pytree_node=False, default=True)
    has_ub: bool = struct.field(pytree_node=False, default=True)

    @classmethod
    def create(
        cls, n: int, lb=None, ub=None, astol: float = DEFAULT_ASTOL, dtype=None
    ) -> "BoxConstraint":
        """``dtype`` pins the bound dtype (f32 solves on TPU without native
        f64); by default it is inferred from the given bounds so that an
        absent bound's +-inf fill matches (no silent f64 promotion)."""
        if dtype is None:
            for bound in (lb, ub):
                if bound is not None and hasattr(bound, "dtype") and jnp.issubdtype(
                    jnp.asarray(bound).dtype, jnp.floating
                ):
                    dtype = jnp.asarray(bound).dtype
                    break
        return cls(
            lb=_full(lb, n, -jnp.inf, dtype),
            ub=_full(ub, n, jnp.inf, dtype),
            astol=astol,
            has_lb=lb is not None,
            has_ub=ub is not None,
        )

    # --- the five QPC operations used by MPRGP -------------------------------

    def project(self, x: jax.Array) -> jax.Array:
        """x -> min(max(x, lb), ub)  (reference: QPCProject_Box, qpcbox.c:289)."""
        return jnp.clip(x, self.lb, self.ub)

    def grads(self, x: jax.Array, g: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Split g into free and chopped parts (reference: QPCGrads_Box, qpcbox.c:21).

        Active lower bound (|x-lb| <= astol): gf=0, gc=min(g,0);
        active upper bound:                    gf=0, gc=max(g,0);
        free: gf=g, gc=0.  Lower bound takes precedence, as in the reference.
        """
        act_lb = jnp.abs(x - self.lb) <= self.astol
        act_ub = jnp.logical_and(jnp.logical_not(act_lb), jnp.abs(x - self.ub) <= self.astol)
        free = jnp.logical_not(jnp.logical_or(act_lb, act_ub))
        zero = jnp.zeros_like(g)
        gf = jnp.where(free, g, zero)
        gc = jnp.where(act_lb, jnp.minimum(g, 0.0), jnp.where(act_ub, jnp.maximum(g, 0.0), zero))
        return gf, gc

    def grad_reduced(self, x: jax.Array, gf: jax.Array, alpha) -> jax.Array:
        """Reduced free gradient (reference: QPCGradReduced_Box, qpcbox.c:67):
        gr = min(gf, (x-lb)/alpha) where gf>0, max(gf, (x-ub)/alpha) where gf<0,
        0 elsewhere."""
        return jnp.where(
            gf > 0.0,
            jnp.minimum(gf, (x - self.lb) / alpha),
            jnp.where(gf < 0.0, jnp.maximum(gf, (x - self.ub) / alpha), 0.0),
        )

    def feas(self, x: jax.Array, d: jax.Array) -> jax.Array:
        """Max feasible step: largest a with lb <= x - a*d <= ub
        (reference: QPCFeas_Box, qpcbox.c:103; the global min is the
        MPI_Allreduce(MIN) in qpc.c:503-527 — here a plain reduction that XLA
        lowers to a psum-tree when sharded)."""
        inf = jnp.inf
        a_lb = jnp.where(jnp.logical_and(d > 0.0, self.lb > -inf), (x - self.lb) / d, inf)
        a_ub = jnp.where(jnp.logical_and(d < 0.0, self.ub < inf), (x - self.ub) / d, inf)
        return jnp.min(jnp.minimum(a_lb, a_ub))

    def chop_bounds(self, tol: float) -> "BoxConstraint":
        """Zero out bound entries with |bound| < tol (reference: VecFilter use
        in QPSSetup_MPGP for -qps_mpgp_bound_chop_tol)."""
        if tol <= 0:
            return self
        lb = jnp.where(jnp.abs(self.lb) < tol, 0.0, self.lb)
        ub = jnp.where(jnp.abs(self.ub) < tol, 0.0, self.ub)
        return self.replace(lb=lb, ub=ub)

    # --- multipliers & KKT ----------------------------------------------------

    def multipliers_from_lagrangian(self, r: jax.Array):
        """Recover (lambda_lb, lambda_ub) from r = A x - b (+ B'lambda)
        (reference: QPComputeMissingBoxMultipliers, qp.c:829-889):
        llb = r, lub = -r; when both bounds exist, clip both at 0."""
        llb = r if self.has_lb else None
        lub = -r if self.has_ub else None
        if self.has_lb and self.has_ub:
            llb = jnp.maximum(llb, 0.0)
            lub = jnp.maximum(lub, 0.0)
        return llb, lub

    def kkt_terms(self, x, llb, lub):
        """Return a list of (label, value) KKT residuals matching
        QPCViewKKT_Box (qpcbox.c:332-427)."""
        out = []
        if self.has_lb:
            out.append(("||min(x-lb,0)||     ", jnp.linalg.norm(jnp.minimum(x - self.lb, 0.0))))
            out.append(("||min(lambda_lb,0)||", jnp.linalg.norm(jnp.minimum(llb, 0.0))))
            # complementarity; entries with lb = -inf are replaced by -1 so a
            # nonzero multiplier there is flagged (qpcbox.c:365-377)
            gap = jnp.where(self.lb <= -jnp.inf, -1.0, self.lb - x)
            out.append(("|lambda_lb'*(lb-x)| ", jnp.abs(jnp.vdot(llb, gap))))
        if self.has_ub:
            out.append(("||max(x-ub,0)||     ", jnp.linalg.norm(jnp.maximum(x - self.ub, 0.0))))
            out.append(("||min(lambda_ub,0)||", jnp.linalg.norm(jnp.minimum(lub, 0.0))))
            gap = jnp.where(self.ub >= jnp.inf, 1.0, x - self.ub)
            out.append(("|lambda_ub'*(x-ub)| ", jnp.abs(jnp.vdot(lub, gap))))
        return out
