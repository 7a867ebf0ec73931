"""Deterministic reductions — run-to-run reproducible dot products and
Gram matrices regardless of device count or thread partitioning.

XLA chooses reduction tilings per backend configuration: the same f64
dot product can sum in a different order under a different device count
(observed: the GG' Gram build shifts the 66-iteration elasticity CG by
2 iterations between a 1-device and an 8-virtual-device CPU config).
The reference has the same property across MPI rank counts and accepts
it; for regression oracles we want better: an opt-in mode where every
reduction the solvers own is a FIXED BINARY TREE of elementwise adds.
Elementwise adds have no reduction dimension for XLA to retile, so the
summation order is pinned by construction — identical bits on any
device count, thread count, or sharding.

Enable with :func:`set_deterministic` (trace-time flag: toggle before
building/jitting solvers).  Costs one extra O(n) memory pass per
reduction — negligible next to the operator applies.
"""

from __future__ import annotations

import jax.numpy as jnp

_DETERMINISTIC = False


def set_deterministic(on: bool = True) -> None:
    """Toggle deterministic reductions globally (read at trace time).

    Prefer the PER-SOLVE switches — ``FetiOptions(deterministic=True)`` or
    ``make_solver(..., deterministic=True)`` — which scope the flag to one
    solve's trace via :func:`deterministic_mode`; the global toggle is kept
    for interactive use and cannot retroactively retrace already-jitted
    solvers (see make_solver's caveat)."""
    global _DETERMINISTIC
    _DETERMINISTIC = bool(on)


class deterministic_mode:
    """Context manager scoping the deterministic-reduction flag to a block
    (trace-time: wrap the code that BUILDS/TRACES the computation).
    ``deterministic_mode(None)`` is a no-op (inherit the current mode)."""

    def __init__(self, on):
        self.on = on

    def __enter__(self):
        global _DETERMINISTIC
        self._old = _DETERMINISTIC
        if self.on is not None:
            _DETERMINISTIC = bool(self.on)
        return self

    def __exit__(self, *exc):
        global _DETERMINISTIC
        _DETERMINISTIC = self._old
        return False


def enabled() -> bool:
    return _DETERMINISTIC


def det_sum(x, axis: int = -1):
    """Sum along ``axis`` as a fixed binary tree of elementwise adds."""
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    while n > 1:
        half = n // 2
        lo = x[..., :half] + x[..., half : 2 * half]
        x = jnp.concatenate([lo, x[..., 2 * half :]], axis=-1) if n % 2 else lo
        n = x.shape[-1]
    return x[..., 0]


def det_dot(x, y):
    """<x, y> with a pinned summation order."""
    return det_sum((jnp.conj(x) * y).reshape(-1))


def det_dots(pairs):
    """Tuple of <x_i, y_i> for a list of (x, y) pairs, computed as ONE
    batched fixed tree: the products are stacked (k, n) and reduced along n
    together, so a k-dot bundle costs the same number of sequential stages
    as one dot.  Each row's summation order is IDENTICAL to ``det_dot`` of
    that pair alone — results are bit-for-bit equal to separate calls
    (asserted in tests/test_detred.py), fusing is purely a kernel-count
    optimization for the promoted-dot hot loops (core/precision.reducers).
    All pairs must share one flattened length and dtype."""
    prods = jnp.stack([(jnp.conj(x) * y).reshape(-1) for x, y in pairs])
    out = det_sum(prods, axis=-1)
    return tuple(out[i] for i in range(len(pairs)))


def det_norm(x):
    return jnp.sqrt(det_dot(x, x).real)


def vdot(x, y):
    """jnp.vdot normally; the fixed-tree dot in deterministic mode."""
    return det_dot(x, y) if _DETERMINISTIC else jnp.vdot(x, y)


def norm(x):
    return det_norm(x) if _DETERMINISTIC else jnp.linalg.norm(x)


def det_gram(G):
    """G G' (k, n) -> (k, k) with a pinned reduction order over n.

    Memory: one (k, k, chunk) elementwise intermediate per chunk; chunks
    are accumulated left-to-right (fixed order), the within-chunk sum is
    the fixed tree."""
    k, n = G.shape
    chunk = max(min(n, (1 << 22) // max(k * k, 1)), 1)  # ~32 MB f64 tiles
    out = jnp.zeros((k, k), G.dtype)
    for c0 in range(0, n, chunk):
        Gc = G[:, c0 : c0 + chunk]
        out = out + det_sum(Gc[:, None, :] * Gc[None, :, :], axis=-1)
    return out


def gram(G):
    return det_gram(G) if _DETERMINISTIC else G @ G.T
