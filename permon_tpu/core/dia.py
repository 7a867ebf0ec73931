"""DIA (diagonal) sparse operator + Pallas TPU kernel.

For stencil-structured matrices (FD/FEM on structured grids — the shape of
every PERMON tutorial operator) the diagonal format is the speed-of-light
representation on TPU: y = sum_d vals_d * shift(x, off_d) is pure VPU work
with unit-stride HBM streams and no gathers.  Gather-based formats (ELL) pay
~7 ns per gathered element on the TPU scalar unit, so a banded matrix in DIA
is ~3 orders of magnitude faster per nonzero (measured honestly with
device-chained fori_loop timing, marginal between step counts: 7-point 3-D
Laplacian, 1.86M nnz, f32 on one v5e chip — DIA/XLA and DIA/Pallas both
~120-140 GnnZ/s = ~640 GB/s effective = ~78% of HBM peak; ELL ~0.14 GnnZ/s).
Use :func:`permon_tpu.core.matutils.make_operator` to pick the format.

Layout: ``data[d, i] = A[i, i + offsets[d]]`` (row-aligned, zero-padded at the
ends).  mv then is ``y[i] = sum_d data[d, i] * x[i + offsets[d]]``.

Two code paths:
- XLA (default): dynamic-slice windows of a zero-padded x, fused
  multiply-adds — essentially HBM-roofline (traffic is ~(ndiag+2)*n*4 bytes
  per apply);
- Pallas (``use_pallas=True``, f32): sublane-dense kernel — x is viewed as a
  (n/128, 128) tile-aligned 2-D array kept whole in VMEM, each diagonal
  offset decomposes as q*128 + r and is applied as two static sublane rolls
  + a static lane roll + lane select, so every VPU op runs on full (8,128)
  tiles.  Matches/slightly beats the XLA lowering and is kept as the
  explicitly-scheduled reference kernel.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .linop import LinearOperator


@struct.dataclass
class Dia(LinearOperator):
    data: jax.Array  # (ndiag, n) row-aligned diagonal values
    offsets: Tuple[int, ...] = struct.field(pytree_node=False)
    shape: Tuple[int, int] = struct.field(pytree_node=False)
    use_pallas: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def from_scipy(cls, a, use_pallas: bool = False) -> "Dia":
        import scipy.sparse as sp

        d = sp.dia_matrix(a.tocsr().todia())
        n = a.shape[0]
        offsets = [int(o) for o in d.offsets]
        # scipy dia data[d, j] = A[j - off, j] (column-aligned); re-align to
        # rows: row_data[d, i] = A[i, i + off] = data[d, i + off]
        data = np.zeros((len(offsets), n), dtype=np.float64)
        for k, off in enumerate(offsets):
            lo, hi = max(0, -off), min(n, n - off)
            data[k, lo:hi] = d.data[k, lo + off : hi + off]
        return cls(
            data=jnp.asarray(data), offsets=tuple(offsets), shape=(n, n),
            use_pallas=use_pallas,
        )

    @property
    def nnz(self) -> int:
        return int(self.data.size)

    def mv(self, x):
        if self.use_pallas:
            return _dia_mv_pallas(self.data, x, self.offsets)
        return _dia_mv_xla(self.data, x, self.offsets)

    def rmv(self, x):
        # A' has diagonals at -off with row-aligned values shifted by off
        n = self.n
        maxoff = max(max(abs(o) for o in self.offsets), 1)
        y = jnp.zeros_like(x)
        for k, off in enumerate(self.offsets):
            contrib = self.data[k] * x
            y = y + jnp.pad(contrib, (maxoff, maxoff))[maxoff - off : maxoff - off + n]
        return y

    def diagonal(self):
        if 0 in self.offsets:
            return self.data[self.offsets.index(0)]
        return jnp.zeros(self.n, self.data.dtype)

    def todense(self):
        n = self.n
        out = jnp.zeros((n, n), self.data.dtype)
        for k, off in enumerate(self.offsets):
            idx = jnp.arange(max(0, -off), min(n, n - off))
            out = out.at[idx, idx + off].set(self.data[k, idx])
        return out


@struct.dataclass
class BlockDia(LinearOperator):
    """Batched per-subdomain DIA operator over the decomposed space — the
    stencil form of MATBLOCKDIAG at scale (the K of the large TFETI path).
    All subdomains share one offset set (the union); absent diagonals hold
    zeros.  mv is ndiag shifted fused multiply-adds over an (ns, nlp) view —
    pure VPU streams, no gathers, ~(ndiag+2)*n*dtype bytes of HBM traffic —
    the role PETSc MPIAIJ MatMult plays in the reference hot loops
    (src/qps/impls/mpgp/mpgp.c:500) for structured blocks.

    Layout: ``data[s, d, i] = K_s[i, i + offsets[d]]`` (row-aligned)."""

    data: jax.Array  # (ns, ndiag, nlp)
    offsets: Tuple[int, ...] = struct.field(pytree_node=False)
    shape: Tuple[int, int] = struct.field(pytree_node=False)

    @classmethod
    def from_scipy_blocks(cls, blocks, nlp: int = None, dtype=None) -> "BlockDia":
        """Build from a list of scipy sparse (nl, nl) blocks, zero-padding
        each to nlp rows (padding dofs get a unit diagonal)."""
        import scipy.sparse as sp

        ns = len(blocks)
        nl = blocks[0].shape[0]
        nlp = nl if nlp is None else int(nlp)
        dias = [sp.dia_matrix(b.tocsr().todia()) for b in blocks]
        offsets = sorted({int(o) for d in dias for o in d.offsets})
        oidx = {o: k for k, o in enumerate(offsets)}
        data = np.zeros((ns, len(offsets), nlp),
                        dtype=np.dtype(dtype) if dtype is not None else np.float64)
        for s, d in enumerate(dias):
            n = d.shape[0]
            for j, off in enumerate(int(o) for o in d.offsets):
                k = oidx[off]
                lo, hi = max(0, -off), min(n, n - off)
                # scipy dia is column-aligned: data[j, c] = A[c - off, c]
                data[s, k, lo:hi] = d.data[j, lo + off : hi + off]
        if 0 in oidx:  # unit diagonal on padding rows
            data[:, oidx[0], nl:] = 1.0
        return cls(data=jnp.asarray(data), offsets=tuple(offsets),
                   shape=(ns * nlp, ns * nlp))

    @property
    def ns(self) -> int:
        return int(self.data.shape[0])

    @property
    def nlp(self) -> int:
        return int(self.data.shape[2])

    def mv(self, x):
        ns, ndiag, nlp = self.data.shape
        xb = x.reshape(ns, nlp).astype(self.data.dtype)
        maxoff = max(max(abs(o) for o in self.offsets), 1)
        xp = jnp.pad(xb, ((0, 0), (maxoff, maxoff)))
        y = jnp.zeros_like(xb)
        for k, off in enumerate(self.offsets):
            y = y + self.data[:, k, :] * jax.lax.dynamic_slice(
                xp, (0, maxoff + off), (ns, nlp)
            )
        return y.reshape(-1).astype(x.dtype)

    rmv = mv  # symmetric stiffness blocks

    def diagonal(self):
        if 0 in self.offsets:
            return self.data[:, self.offsets.index(0), :].reshape(-1)
        return jnp.zeros(self.n, self.data.dtype)


def _dia_mv_xla(data, x, offsets):
    n = x.shape[0]
    maxoff = max(max(abs(o) for o in offsets), 1)
    xp = jnp.pad(x, (maxoff, maxoff))
    y = jnp.zeros_like(x)
    for k, off in enumerate(offsets):
        y = y + data[k] * jax.lax.dynamic_slice(xp, (maxoff + off,), (n,))
    return y


@partial(jax.jit, static_argnames=("offsets", "tr", "interpret"))
def _dia_mv_pallas(data, x, offsets, tr: int = 512, interpret: bool = False):
    """Sublane-dense DIA kernel.

    x is reshaped to (n/128, 128) so that 1024 consecutive elements fill one
    (8,128) VMEM tile, and kept whole in VMEM (a primal vector is ~1 MB).
    Each offset off = q*128 + r is applied with static shifts only:
    rows roll by q (sublanes), lanes roll by r with the carry row selected by
    a lane-index mask — no gathers, no dynamic rotates.  The diagonal data is
    streamed from HBM in (ndiag, tr, 128) blocks.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = x.shape[0]
    ndiag = data.shape[0]
    if x.dtype != jnp.float32:
        # the kernel accumulates in f32 (the documented f32-only throughput
        # contract); silently downcasting f64 inputs would return f32-accuracy
        # results in a library that enables x64 at import
        raise TypeError(
            f"Dia(use_pallas=True) is f32-only, got {x.dtype}; use the XLA "
            "path (use_pallas=False) for f64 parity solves"
        )
    if n % 128:  # pad up to a lane multiple (host-side setup cost only)
        npad = ((n + 127) // 128) * 128
        x = jnp.zeros(npad, x.dtype).at[:n].set(x)
        data = jnp.zeros((ndiag, npad), data.dtype).at[:, :n].set(data)
        return _dia_mv_pallas(data, x, offsets, tr=tr, interpret=interpret)[:n]
    R = n // 128
    tr = min(tr, ((R + 7) // 8) * 8)
    # pad rows so every offset window stays in-bounds; PADR multiple of 8
    qmax = max(abs(o) // 128 + 1 for o in offsets)
    PADR = ((qmax + 8 + 7) // 8) * 8
    Rp = ((R + tr - 1) // tr) * tr
    grid = Rp // tr
    x2d = jnp.zeros((Rp + 2 * PADR, 128), x.dtype).at[PADR : PADR + R, :].set(
        x.reshape(R, 128)
    )
    d3 = (
        jnp.zeros((ndiag, Rp, 128), data.dtype).at[:, :R, :].set(
            data.reshape(ndiag, R, 128)
        )
        if Rp != R
        else data.reshape(ndiag, R, 128)
    )
    W_ROWS = tr + 2 * PADR

    def kernel(d_ref, x_ref, y_ref):
        i = pl.program_id(0)
        # window rows [i*tr, i*tr + tr + 2*PADR) of x2d — start multiple of 8
        W = x_ref[pl.ds(i * tr, W_ROWS), :]
        acc = jnp.zeros((tr, 128), jnp.float32)
        for k, off in enumerate(offsets):
            q, r = off // 128, off % 128  # python floor-div: r in [0, 128)
            B = pltpu.roll(W, shift=(W_ROWS - (PADR + q)) % W_ROWS, axis=0)[:tr, :]
            if r == 0:
                sh = B
            else:
                C = pltpu.roll(W, shift=(W_ROWS - (PADR + q + 1)) % W_ROWS, axis=0)[:tr, :]
                Br = pltpu.roll(B, shift=128 - r, axis=1)
                Cr = pltpu.roll(C, shift=128 - r, axis=1)
                lane = jax.lax.broadcasted_iota(jnp.int32, (tr, 128), 1)
                sh = jnp.where(lane < 128 - r, Br, Cr)
            acc = acc + (d_ref[k, :, :] * sh).astype(jnp.float32)
        y_ref[:, :] = acc.astype(y_ref.dtype)

    # Mosaic index maps must trace as i32 — under the library's global x64
    # they come out i64 and lowering fails; scope x64 off around the call
    with jax.enable_x64(False):
        y = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((ndiag, tr, 128), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tr, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Rp, 128), x.dtype),
            interpret=interpret,
        )(d3, x2d)
    return y.reshape(-1)[:n]
