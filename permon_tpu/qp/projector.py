"""Projector factory — the QPPF analog (coarse problem).

Holds the equality-constraint operator G and provides the projector
applications used throughout the dual pipeline (reference:
src/qppf/interface/qppf.c):

    Q      = G' (G G')^{-1} G      (projector onto im G')
    P      = I - Q                 (projector onto ker G)
    halfQ  : x  -> (G G')^{-1} G x
    halfQ' : v  -> G' (G G')^{-1} v
    CP     : v  -> (G G')^{-1} v   (the coarse-problem solve)

G has few rows (defect of A, or number of equality constraints), so GG' is a
small dense SPD matrix factorized once by Cholesky at setup — the analog of
the redundantly factorized coarse problem (qppf.c:282-333); under a device
mesh the factor is replicated so CP is an all-local triangular solve preceded
by the G matvec reduction.

When G has orthonormal rows GG' = I and the CP solve short-circuits entirely
(reference: qppf.c:392-396, 478-484).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..core.linop import LinearOperator


def dense_rows(op: LinearOperator, dtype=None) -> jax.Array:
    """Materialize a wide operator (few rows) as a dense (m, n) array by
    applying op' to the m unit vectors — the by-columns fallback idiom of the
    reference (MatTransposeMatMultByColumns, permonmatutils.c).

    Dense operators short-circuit (building an (m, m) identity for a
    100k-row dual G would be O(m^2) memory for nothing)."""
    from ..core.linop import Dense

    if isinstance(op, Dense):
        return op.a if dtype is None else op.a.astype(dtype)
    m = op.shape[0]
    dtype = dtype or jnp.result_type(float)
    eye = jnp.eye(m, dtype=dtype)
    cols_of_gt = jax.vmap(op.rmv, in_axes=0)(eye)  # (m, n): row i = G[i, :]
    return cols_of_gt


#: row count past which a sparse-structured G gets a sparse (band) GG'
#: factorization instead of the dense one — the reference always factors
#: GG' sparse through MUMPS (qppf.c:213-333); here small coarse problems
#: stay dense (better MXU shapes), wide gluing-sized ones go to the
#: RCM-ordered block-tridiagonal Cholesky (core/band.py)
SPARSE_GGT_THRESHOLD = 2048

#: coarse dimension from which the dense-Gram coarse solve assembles the
#: explicit (GG')^{-1} automatically (apply = one fixed-tree GEMV) instead
#: of triangular cho_solve — which lowers sequentially for f64 on TPU.
#: Parity-scale problems (k <= 162 across all captures/oracles) keep the
#: triangular path their counts were pinned with.
EXPLICIT_INV_MIN_K = 256


@struct.dataclass
class Projector:
    G: Any  # LinearOperator (m, n)
    ggt_chol: Optional[jax.Array]  # None when rows are orthonormal
    orthonormal_rows: bool = struct.field(pytree_node=False, default=False)
    #: dense-assembled (GG')^{-1} (the -qppf_explicit path, qppf.c:282-333);
    #: trades a triangular solve for one matmul per CP — better MXU shape
    #: when the coarse dimension is large
    ggt_inv: Optional[jax.Array] = None
    #: sparse-path coarse factorization: band Cholesky of P GG' P' + the RCM
    #: permutation (None on the dense path)
    ggt_band: Any = None
    cp_perm: Optional[jax.Array] = None
    #: redundancy-group distributed coarse factor (parallel/coarse.py) — the
    #: -qppf_redundancy analog; takes precedence over the local factors
    cp_dist: Any = None

    @classmethod
    def create(
        cls,
        G: LinearOperator,
        orthonormal_rows: Optional[bool] = None,
        explicit_inv: bool = False,
        sparse: Optional[bool] = None,
        gram=None,
    ) -> "Projector":
        """``gram`` (optional) supplies a precomputed GG' — a scipy sparse or
        dense (m, m) host matrix — so G is never densified (the sparse
        MatTransposeMatMult + sparse GG' factorization path of the reference,
        qptransform.c:1089-1100 + qppf.c:213-278).  :func:`dualize` uses it
        to keep the dual coarse side O(nnz)."""
        if orthonormal_rows is None and gram is None:
            # random-trial detection short-circuits the CP entirely
            # (MatHasOrthonormalRows use in qppf.c:392-396)
            from ..core.matutils import has_orthonormal_rows

            orthonormal_rows = has_orthonormal_rows(G)
        if orthonormal_rows:
            return cls(G=G, ggt_chol=None, orthonormal_rows=True)
        if sparse is None:
            sparse = G.shape[0] > SPARSE_GGT_THRESHOLD
        if gram is not None:
            import scipy.sparse as _sp

            if sparse and _sp.issparse(gram):
                from ..core.band import band_chol_single

                band, perm = band_chol_single(gram.tocsr())
                return cls(G=G, ggt_chol=None, ggt_band=band,
                           cp_perm=jnp.asarray(perm))
            ggt = jnp.asarray(
                gram.toarray() if _sp.issparse(gram) else gram,
                dtype=jnp.result_type(float),
            )
            chol = jnp.linalg.cholesky(ggt)
            inv = None
            if explicit_inv or ggt.shape[0] >= EXPLICIT_INV_MIN_K:
                # large coarse dimension: the f64 triangular cho_solve
                # lowers SEQUENTIALLY on TPU (measured 37 ms per coarse
                # solve at k=540) — assemble (GG')^-1 once and apply it as
                # a fixed-tree GEMV (the -qppf_explicit path,
                # qppf.c:282-333)
                eye = jnp.eye(ggt.shape[0], dtype=ggt.dtype)
                inv = jax.scipy.linalg.cho_solve((chol, True), eye)
            return cls(G=G, ggt_chol=chol, orthonormal_rows=False, ggt_inv=inv)
        if sparse:
            from ..core.band import band_chol_single
            from .sparse_rows import to_scipy

            Gs = to_scipy(G)
            if Gs is not None:
                S = (Gs @ Gs.T).tocsr()
                band, perm = band_chol_single(S)
                return cls(G=G, ggt_chol=None, ggt_band=band,
                           cp_perm=jnp.asarray(perm))
        Gd = dense_rows(G)
        from ..core.detred import gram as _gram

        ggt = _gram(Gd)  # fixed-tree reduction in deterministic mode
        chol = jnp.linalg.cholesky(ggt)
        inv = None
        if explicit_inv:
            eye = jnp.eye(ggt.shape[0], dtype=ggt.dtype)
            inv = jax.scipy.linalg.cho_solve((chol, True), eye)
        return cls(G=G, ggt_chol=chol, orthonormal_rows=False, ggt_inv=inv)

    def apply_cp(self, v):
        """Coarse-problem solve (GG')^{-1} v (QPPFApplyCP, qppf.c:610-645).

        Dtype-preserving: the internal factor math runs at the FACTOR's
        precision (f64 by default — the reference's always-f64 coarse
        solve), but the result is cast back to the input dtype so mixed-
        precision iterates stay f32 through projector applications."""
        if self.orthonormal_rows:
            return v
        if self.cp_dist is not None:
            return self.cp_dist.mv(v)
        if self.ggt_band is not None:
            m = self.G.shape[0]
            vp = v[self.cp_perm]
            pad = self.ggt_band.shape[0] - m
            y = self.ggt_band.mv(jnp.concatenate([vp, jnp.zeros(pad, v.dtype)]))
            return jnp.zeros_like(v).at[self.cp_perm].set(y[:m])
        if self.ggt_inv is not None:
            if self.ggt_inv.shape[0] >= EXPLICIT_INV_MIN_K:
                # f64 dot contracts sequentially on TPU (float-float order
                # dependence) — the fixed tree is bandwidth-bound and
                # deterministic (core/detred; same fix as DenseTree)
                from ..core.detred import det_sum

                return det_sum(
                    self.ggt_inv * v[None, :].astype(self.ggt_inv.dtype),
                    axis=-1,
                ).astype(v.dtype)
            return (self.ggt_inv @ v).astype(v.dtype)
        return jax.scipy.linalg.cho_solve((self.ggt_chol, True), v).astype(v.dtype)

    def apply_half_q(self, x):
        return self.apply_cp(self.G.mv(x)).astype(x.dtype)

    def apply_half_q_t(self, v):
        return self.G.rmv(self.apply_cp(v)).astype(v.dtype)

    def apply_q(self, x):
        return self.G.rmv(self.apply_cp(self.G.mv(x))).astype(x.dtype)

    def apply_p(self, x):
        return x - self.apply_q(x)

    def apply_gtg(self, x):
        return self.G.rmv(self.G.mv(x))


@struct.dataclass
class ProjOp(LinearOperator):
    """P = I - G'(GG')^{-1}G as a LinearOperator (QPPFCreateP, qppf.c:650)."""

    pf: Projector

    @property
    def shape(self):
        n = self.pf.G.shape[1]
        return (n, n)

    def mv(self, x):
        return self.pf.apply_p(x)

    rmv = mv  # orthogonal projector is symmetric


@struct.dataclass
class QOp(LinearOperator):
    """Q = G'(GG')^{-1}G (QPPFCreateQ, qppf.c:650-718)."""

    pf: Projector

    @property
    def shape(self):
        n = self.pf.G.shape[1]
        return (n, n)

    def mv(self, x):
        return self.pf.apply_q(x)

    rmv = mv


@struct.dataclass
class HalfQOp(LinearOperator):
    """(GG')^{-1}G: mv = halfQ, rmv = halfQ' (QPPFCreateHalfQ)."""

    pf: Projector

    @property
    def shape(self):
        return self.pf.G.shape

    def mv(self, x):
        return self.pf.apply_half_q(x)

    def rmv(self, v):
        return self.pf.apply_half_q_t(v)


@struct.dataclass
class GtGOp(LinearOperator):
    """G'G (QPPFCreateGtG)."""

    pf: Projector

    @property
    def shape(self):
        n = self.pf.G.shape[1]
        return (n, n)

    def mv(self, x):
        return self.pf.apply_gtg(x)

    rmv = mv


class CachedProjector:
    """Eager-mode wrapper adding the QPPF last-result cache (qppf.c:454-503:
    ApplyQ keeps the last (v, Qv) pair and returns it when the same vector is
    applied again, which happens between consecutive transform stages).

    Inside jit this is unnecessary — XLA CSE already dedups identical
    subexpressions within one trace — so the cache lives outside the
    compiled region, exactly like the reference's object-level cache sits
    outside the Mat kernels."""

    def __init__(self, pf: Projector):
        self.pf = pf
        self._last: Optional[Tuple[Any, Any]] = None
        self.cp_applications = 0  # QPPFGetNumberOfCPApplications analog
        self.hits = 0

    def apply_q(self, x):
        if self._last is not None and self._last[0] is x:
            self.hits += 1
            return self._last[1]
        out = self.pf.apply_q(x)
        self.cp_applications += 1
        self._last = (x, out)
        return out

    def apply_p(self, x):
        return x - self.apply_q(x)

    def apply_half_q(self, x):
        self.cp_applications += 1
        return self.pf.apply_half_q(x)

    def apply_half_q_t(self, v):
        self.cp_applications += 1
        return self.pf.apply_half_q_t(v)
