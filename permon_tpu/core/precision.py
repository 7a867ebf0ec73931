"""Mixed-precision policy (SURVEY 7 item 7).

The reference computes everything in MPI double precision.  On TPU the
profitable policy is different: the MXU's native throughput is
bf16/f32 and HBM traffic halves with f32 storage, while Krylov
recurrences and convergence tests want f64.  The policy implemented
here keeps the expensive part — operator STORAGE and matvecs — in f32
(or bf16), and the cheap-but-sensitive part — dot products, recurrence
scalars, iterates — in f64:

- ``cast_floats(op, dtype)`` re-stores any operator pytree's float
  leaves in the given dtype (index arrays untouched);
- :class:`MixedPrecision` wraps a low-precision operator behind an f64
  interface: ``mv`` casts the input down, runs the stored-precision
  matvec, and casts the result back up, so every solver dot product and
  vector recurrence stays f64;
- ``with_precision(op, policy)`` is the user knob: ``'f64'`` (default,
  exact reference parity), ``'mixed'`` (f32 matvec + f64 reductions —
  iteration-count parity validated in tests/test_precision.py),
  ``'f32'`` (everything f32 — fastest, for throughput-bound production
  runs that tolerate ~1e-6 relative accuracy).

``QP.with_precision`` applies the policy to the Hessian only (the hot
operator); ``FetiOptions(precision=...)`` applies it to the dual
operator F = B K+ B' after dualization, keeping the coarse projector in
f64 so the dual iterates stay in the constraint null space to f64
accuracy.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from .linop import LinearOperator

POLICIES = ("f64", "mixed", "f32", "bf16_mixed")


def cast_floats(tree, dtype):
    """Re-store every float leaf of a pytree in ``dtype`` (ints/bools kept)."""
    def c(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(c, tree)


def _storage_dtype(tree):
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf.dtype
    return jnp.result_type(float)


@struct.dataclass
class MixedPrecision(LinearOperator):
    """f64 interface over a low-precision operator: x -> up(A_lo(down(x))).

    The wrapped matvec runs at storage precision (f32/bf16 MXU + halved
    HBM traffic); callers see f64 so Krylov dots and recurrences keep
    full accuracy.  The residual the solver converges on is the exact
    residual of the PERTURBED operator — iteration-count parity with
    f64 on the shipped examples is asserted in tests/test_precision.py.
    """

    inner: Any

    @property
    def shape(self):
        return self.inner.shape

    def _down(self, x):
        return x.astype(_storage_dtype(self.inner))

    def mv(self, x):
        return self.inner.mv(self._down(x)).astype(jnp.result_type(float))

    def rmv(self, x):
        return self.inner.rmv(self._down(x)).astype(jnp.result_type(float))

    def diagonal(self):
        return self.inner.diagonal().astype(jnp.result_type(float))


def with_precision(op, policy: str):
    """Apply a precision policy to an OPERATOR (f64-interface wrappers).
    For whole-QP policies — f32 state with f64 reductions — use
    :func:`qp_with_precision` / ``QP.with_precision``."""
    if policy == "f64":
        return op
    if policy == "f32":
        return cast_floats(op, jnp.float32)
    if policy == "mixed":
        return MixedPrecision(inner=cast_floats(op, jnp.float32))
    if policy == "bf16_mixed":
        return MixedPrecision(inner=cast_floats(op, jnp.bfloat16))
    raise ValueError(f"unknown precision policy {policy!r}; one of {POLICIES}")


def qp_with_precision(qp, policy: str):
    """Whole-QP precision policy (the round-3 'mixed' redesign).

    The round-2 policy wrapped only the operator matvec behind an f64
    interface, leaving every iterate, axpy and gradient split in f64 — it
    bought ~1% (BENCH_r02: mixed 364.8 ms vs f64 368.6 ms vs f32 17.6 ms).
    What actually dominates the TPU loop is the f64 VECTOR work, so:

    - 'f32'   — everything f32: operator storage, rhs, bounds, iterates,
      dots (fastest; ~1e-6 relative accuracy);
    - 'mixed' — f32 storage AND f32 iterates/axpys, but every dot product /
      norm a solver takes is PROMOTED to f64 (``dots_dtype``), so the
      recurrence scalars and convergence tests keep f64-grade accuracy.
      Iteration-count parity with f64 on the shipped oracles is asserted in
      tests/test_precision.py;
    - 'bf16_mixed' — like 'mixed' with bf16 operator storage (halved HBM
      traffic again) and f32 vectors.

    The projector factory (coarse problem) is NOT cast: its internal math
    stays f64 and its applications cast back to the iterate dtype
    (Projector.apply_* are dtype-preserving), mirroring the reference's
    always-f64 coarse solve."""
    if policy == "f64":
        return qp
    if policy not in POLICIES:
        raise ValueError(f"unknown precision policy {policy!r}; one of {POLICIES}")
    vec_dtype = jnp.float32
    store_dtype = jnp.bfloat16 if policy == "bf16_mixed" else jnp.float32
    A = cast_floats(qp.A, store_dtype)
    if store_dtype != vec_dtype:
        A = CastTo(inner=A, dtype=str(jnp.dtype(vec_dtype)))
    out = qp.replace(
        A=A,
        b=qp.b.astype(vec_dtype),
        x0=qp.x0.astype(vec_dtype) if qp.x0 is not None else None,
        box=cast_floats(qp.box, vec_dtype),
        BE=cast_floats(qp.BE, vec_dtype),
        cE=qp.cE.astype(vec_dtype) if qp.cE is not None else None,
        BI=cast_floats(qp.BI, vec_dtype),
        cI=qp.cI.astype(vec_dtype) if qp.cI is not None else None,
    )
    if policy in ("mixed", "bf16_mixed"):
        out = out.replace(dots_dtype="float64")
    return out


@struct.dataclass
class CastTo(LinearOperator):
    """Fixed-output-dtype wrapper: y = A(x) cast to ``dtype`` (used to give
    a bf16-storage operator an f32 vector interface)."""

    inner: Any
    dtype: str = struct.field(pytree_node=False, default="float32")

    @property
    def shape(self):
        return self.inner.shape

    def mv(self, x):
        return self.inner.mv(x).astype(jnp.dtype(self.dtype))

    def rmv(self, x):
        return self.inner.rmv(x).astype(jnp.dtype(self.dtype))

    def diagonal(self):
        return self.inner.diagonal().astype(jnp.dtype(self.dtype))


def reducers(dots_dtype):
    """(vdot, norm) honoring an optional promotion dtype for reductions.

    Promoted reductions ALWAYS run as the fixed binary tree of elementwise
    adds (core/detred.det_dot): on TPU, f64 is float-float emulated and XLA
    lowers an f64 ``reduce`` SEQUENTIALLY (the FF compensation is order-
    dependent), measured 138 us for a 10k dot where the parallel
    elementwise tree takes 1.9 us — 72x.  The tree is also deterministic by
    construction, so 'mixed' solves are bit-stable across device counts for
    free."""
    from . import detred

    if dots_dtype is None:
        return detred.vdot, detred.norm
    dd = jnp.dtype(dots_dtype)

    def vdot(x, y):
        return detred.det_dot(x.astype(dd), y.astype(dd))

    def norm(x):
        return detred.det_norm(x.astype(dd))

    return vdot, norm


def dot_bundler(dots_dtype):
    """``vdots(pairs) -> tuple of dots`` for fusing same-point reductions.

    Under a promotion dtype the bundle runs as ONE batched fixed tree
    (detred.det_dots) — bit-identical per pair to separate promoted dots,
    but k dots cost one kernel chain instead of k (the promoted-dot kernel
    count is what separates 'mixed' from 'f32' loop time on TPU).  Without
    promotion it falls back to separate :func:`reducers` dots so the f64
    oracle numerics are untouched."""
    from . import detred

    if dots_dtype is None:
        def vdots(pairs):
            if detred.enabled():
                return detred.det_dots(pairs)
            return tuple(jnp.vdot(x, y) for x, y in pairs)

        return vdots
    dd = jnp.dtype(dots_dtype)

    def vdots(pairs):
        return detred.det_dots([(x.astype(dd), y.astype(dd)) for x, y in pairs])

    return vdots
