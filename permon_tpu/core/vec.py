"""Vector/index-set helpers — the vec layer (reference: src/vec/interface/
permonvecutils.c, include/permonvec.h).

The reference marks lazily-computed vectors (multipliers lambda, B'lambda)
as "not computed" by writing a NaN sentinel into the first entry
(VecInvalidate/VecIsInvalidated, permonvec.h:11-13); jit-friendly versions
of that and the other helpers live here.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def invalidate(v: jax.Array) -> jax.Array:
    """Mark v's contents "not computed" (VecInvalidate): first entry = NaN."""
    return v.at[0].set(jnp.nan)


def is_invalidated(v: jax.Array) -> jax.Array:
    """True if v carries the NaN sentinel (VecIsInvalidated)."""
    return jnp.isnan(v[0])


def has_valid_values(v: jax.Array) -> jax.Array:
    """True if no entry is NaN/Inf (VecHasValidValues)."""
    return jnp.all(jnp.isfinite(v))


def is_add(indices, offset: int):
    """Shift all index-set entries by a constant (ISAdd, permonvecutils.c:
    8-24) — local<->global renumbering."""
    return np.asarray(indices) + int(offset)


def merge(vecs: Sequence[jax.Array]) -> jax.Array:
    """Concatenate per-part local vectors into one (VecMergeAndDestroy,
    permonvecutils.c:28-68 — the MPI gather becomes a concat; under pjit the
    result is the unsharded view of a sharded array)."""
    return jnp.concatenate(list(vecs))


def scale_skip_inf(v: jax.Array, alpha) -> jax.Array:
    """Scale skipping +-inf entries (VecScaleSkipInf, used on box bounds by
    the objective-scaling transforms, qptransform.c:1748)."""
    return jnp.where(jnp.isinf(v), v, v * alpha)


def vec_from_is(indices, n: int, dtype=jnp.float64) -> jax.Array:
    """Indicator/selection vector from an index set (VecCreateFromIS)."""
    out = jnp.zeros(n, dtype=dtype)
    return out.at[jnp.asarray(indices)].set(1.0)


def is_from_vec(v, tol: float = 0.5):
    """Index set of entries ~1 (ISCreateFromVec)."""
    return np.flatnonzero(np.asarray(v) > tol)


def print_info(v: jax.Array, name: str = "vec") -> str:
    """Shape/sharding/stats summary (VecPrintInfo)."""
    stats = (
        f"min={float(jnp.min(v)):.3e} max={float(jnp.max(v)):.3e} "
        f"norm={float(jnp.linalg.norm(v)):.3e}"
    )
    sh = getattr(v, "sharding", None)
    return f"{name}: shape={tuple(v.shape)} dtype={v.dtype} {stats} sharding={sh}"
