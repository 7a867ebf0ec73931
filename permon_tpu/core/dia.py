"""DIA (diagonal) sparse operator — the structured-stencil SpMV.

For stencil-structured matrices (FD/FEM on structured grids — the shape of
every PERMON tutorial operator) the diagonal format is the speed-of-light
representation on TPU: y = sum_d vals_d * shift(x, off_d) is pure VPU work
with unit-stride HBM streams and no gathers.  Gather-based formats (ELL) pay
~7 ns per gathered element on the TPU scalar unit, so a banded matrix in DIA
is ~3 orders of magnitude faster per nonzero (measured honestly with
device-chained fori_loop timing, marginal between step counts: 7-point 3-D
Laplacian, 1.86M nnz, f32 on one v5e chip — 162 GnnZ/s = HBM roofline;
ELL ~0.14 GnnZ/s).
Use :func:`permon_tpu.core.matutils.make_operator` to pick the format.

Layout: ``data[d, i] = A[i, i + offsets[d]]`` (row-aligned, zero-padded at the
ends).  mv then is ``y[i] = sum_d data[d, i] * x[i + offsets[d]]``.

The apply is the XLA lowering: dynamic-slice windows of a zero-padded x,
fused multiply-adds — measured at HBM roofline on a v5e (162 GnnZ/s on the
7-point Laplacian = ~100% of the (ndiag+2)*n*4-bytes traffic bound).  A
hand-scheduled Pallas kernel existed through round 2 (sublane-dense rolls,
x whole in VMEM) but could only ADD overhead to a traffic-bound op — it
measured 12% slower than this lowering and was removed per the round-2
review (decision recorded in PARITY.md; the gather-scheduled SELL kernel in
core/sell.py remains the Pallas path where explicit scheduling actually
wins).
"""

from __future__ import annotations

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

    @classmethod
    def from_scipy(cls, a) -> "Dia":
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
        )

    @property
    def nnz(self) -> int:
        return int(self.data.size)

    def mv(self, x):
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


@struct.dataclass
class RegularizedBlockDia(LinearOperator):
    """Kreg = K + per-block rho * R_I (R_I'R_I)^{-1} R_I' as the ORIGINAL
    stencil plus an explicit rank-k fixing-dof correction.

    The correction has at most k_fix^2 entries per block (1 for constant
    nullspaces, 36 for rigid-body modes), but folding it into the DIA
    stencil scatters those entries over ~k_fix^2 NEW diagonal offsets —
    measured 7 -> 43 diagonals (0.9 GB of mostly-zero planes) at the
    2.2M-dof capture.  Keeping it separate makes the refinement operator
    cost  base stencil + an (ns, kf) gather / tiny batched GEMM /
    scatter-add,  and the factor path injects the same correction into one
    diagonal block per subdomain inside the fused expand-and-factor scan
    (core/band.factor_from_dia_sm)."""

    base: BlockDia
    #: (ns, kf) int32 LOCAL fixing-dof ids within the block's band window,
    #: relative to block row ``bi`` (i.e. global local-dof = bi*NB + idx);
    #: padded with 0 where a block has fewer fixing dofs (q zero there)
    idx: jax.Array
    #: (ns, kf, kf) correction rho * Q per block (all-zero for fixed blocks)
    q: jax.Array
    #: (ns,) int32 band-block index holding each block's fixing window
    bi: jax.Array
    NB: int = struct.field(pytree_node=False)

    @property
    def shape(self):
        return self.base.shape

    @property
    def data(self):  # source stencil for the factor expansion
        return self.base.data

    @property
    def offsets(self):
        return self.base.offsets

    def _corr(self, x):
        ns, _, nlp = self.base.data.shape
        xb = x.reshape(ns, nlp)
        gidx = self.bi[:, None] * self.NB + self.idx  # (ns, kf) local dofs
        g = jnp.take_along_axis(xb, gidx, axis=1).astype(self.q.dtype)
        with jax.default_matmul_precision("highest"):
            h = jnp.einsum("sij,sj->si", self.q, g)
        out = jnp.zeros_like(xb).at[
            jnp.arange(ns)[:, None], gidx
        ].add(h.astype(xb.dtype))
        return out.reshape(-1)

    def mv(self, x):
        return self.base.mv(x) + self._corr(x).astype(x.dtype)

    rmv = mv  # symmetric

    def diagonal(self):
        d = self.base.diagonal()
        ns, _, nlp = self.base.data.shape
        gidx = self.bi[:, None] * self.NB + self.idx
        kf = self.idx.shape[1]
        qd = self.q[:, jnp.arange(kf), jnp.arange(kf)]
        return d.reshape(ns, nlp).at[
            jnp.arange(ns)[:, None], gidx
        ].add(qd.astype(d.dtype)).reshape(-1)
