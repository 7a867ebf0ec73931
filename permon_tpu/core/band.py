"""Scale-capable K+ — batched blocked band Cholesky (the large-subdomain
MATINV path).

The reference factorizes large sparse subdomain stiffness matrices with
MUMPS/PaStiX per rank (reference: src/mat/impls/inv/matinv.c:481-540) and
detects nullspaces from null pivots (matinv.c:55-195).  permon_tpu's dense
:class:`~permon_tpu.core.factor.BlockDiagCholInv` is O(nl^3) work and
O(nl^2) memory per subdomain — impossible past a few thousand dofs.  This
module is the TPU-native scalable replacement:

1. Each subdomain is RCM-reordered at setup (host, scipy) so its stiffness
   has bandwidth bw; the reordering is fused into the PROBLEM (l2g and the
   constraint operators are built on the permuted numbering) so no runtime
   permutation exists.
2. A matrix of bandwidth bw < NB (NB = the padded block size, a multiple of
   128) is block tridiagonal with (NB, NB) blocks.  Factorization is the
   block-tridiagonal Cholesky recurrence

       F_i = A_{i,i-1} D_{i-1}^{-T},   D_i = chol(A_ii - F_i F_i'),

   run as one ``lax.scan`` over the ~n/NB block rows with every step a
   batched (over subdomains) dense MXU op — the TPU analog of a supernodal
   sparse factorization with one supernode per block row.  Storage is
   2 * NB * n per subdomain; factor cost ~3 * NB^2 * n flops.
3. Applies are two scans (forward/backward substitution) of batched GEMVs
   against the stored D^{-1} and F blocks — no triangular solves in the hot
   path.
4. Floating subdomains are handled by FIXING-DOF regularization
   (MatRegularize with pivot rows, reference:
   src/mat/interface/permonmatregularize.c:117-287): Kreg = K + rho *
   R_I (R_I' R_I)^{-1} R_I' with the fixing dofs I chosen among the
   LAST-ordered nodes, so the added block lives inside the final diagonal
   block and the band is preserved.  Kreg^{-1} is then an EXACT generalized
   inverse of K (K Kreg^{-1} K = K, verified to machine precision in
   tests/test_band.py), which is all the dual pipeline needs.

Mixed precision: factor in f32 with ``refine`` steps of iterative refinement
against the f64 block-tridiagonal operator recovers direct-solver accuracy
at half the memory — the classic mixed-precision direct solve (SURVEY §7).
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .linop import LinearOperator


# ---------------------------------------------------------------------------
# host-side setup
# ---------------------------------------------------------------------------


def rcm_order(a) -> np.ndarray:
    """Bandwidth-reducing (reverse Cuthill-McKee) ordering of a sparse
    symmetric matrix — the fill-reducing-ordering role MUMPS' analysis phase
    plays in the reference."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    return np.asarray(reverse_cuthill_mckee(sp.csr_matrix(a), symmetric_mode=True))


def bandwidth(a) -> int:
    coo = a.tocoo()
    if coo.nnz == 0:
        return 0
    return int(np.abs(coo.row.astype(np.int64) - coo.col).max())


def csr_to_block_tridiag(a, NB: int) -> Tuple[np.ndarray, np.ndarray]:
    """(nl, nl) sparse with bandwidth < NB -> block-tridiagonal numpy blocks
    Ad (nb, NB, NB), Asub (nb, NB, NB) with Asub[0] = 0.  Padding rows get a
    unit diagonal."""
    import scipy.sparse as sp

    a = sp.coo_matrix(a)
    nl = a.shape[0]
    nb = max((nl + NB - 1) // NB, 1)
    bw = bandwidth(a)
    if bw >= NB:
        raise ValueError(f"bandwidth {bw} >= block size {NB}; raise NB or reorder")
    Ad = np.zeros((nb, NB, NB))
    Asub = np.zeros((nb, NB, NB))
    bi, ri = np.divmod(a.row.astype(np.int64), NB)
    bj, rj = np.divmod(a.col.astype(np.int64), NB)
    diag = bi == bj
    np.add.at(Ad, (bi[diag], ri[diag], rj[diag]), a.data[diag])
    sub = bi == bj + 1
    np.add.at(Asub, (bi[sub], ri[sub], rj[sub]), a.data[sub])
    # (the bi == bj - 1 entries are the transposes of the sub entries for a
    # symmetric matrix and are not stored)
    for i in range(nl, nb * NB):
        Ad[i // NB, i % NB, i % NB] = 1.0
    return Ad, Asub


def fixing_dofs(R_block: np.ndarray, lo: int = 0, hi: Optional[int] = None) -> np.ndarray:
    """Choose k = R.shape[1] fixing dofs with a well-conditioned restriction
    R_I (greedy column-pivoted QR on R'), restricted to rows [lo, hi) —
    keeping the regularization block inside one band block
    (permonmatregularize.c picks pivot rows of R the same way)."""
    from scipy.linalg import qr

    k = R_block.shape[1]
    if k == 0:
        return np.zeros(0, dtype=np.int64)
    hi = R_block.shape[0] if hi is None else hi
    Rw = R_block[lo:hi]
    _, _, piv = qr(Rw.T, pivoting=True)
    return np.sort(piv[:k] + lo)


def _fixing_window(R_block: np.ndarray, NB: int, nl: int) -> Tuple[int, int]:
    """The [lo, hi) row window the fixing dofs are picked from: inside ONE
    diagonal band block near the end of the ordering, restricted to rows
    where R is actually supported.  Subdomains smaller than the padded local
    size have trailing all-zero R rows (padding); a window inside them would
    make R_I'R_I singular (observed on non-divisible decompositions where a
    29^3 block pads to a 30^3 neighbor's size)."""
    k = R_block.shape[1]
    rnz = np.flatnonzero(np.abs(R_block[:nl]).sum(axis=1) != 0.0)
    if len(rnz) == 0:
        raise ValueError("nullspace basis has no nonzero rows")
    n_real = int(rnz[-1]) + 1
    last = (n_real - 1) // NB
    in_last = int(np.count_nonzero(rnz >= last * NB))  # supported rows only
    if in_last >= max(4 * k, 16) or last == 0:
        return last * NB, n_real
    return (last - 1) * NB, last * NB


def regularize_block_tridiag(
    Ad: np.ndarray, Asub: np.ndarray, R_block: np.ndarray, rho: float,
    NB: int, nl: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Add rho * R_I (R_I'R_I)^{-1} R_I' at fixing dofs I (on copies).

    The fixing dofs are picked inside ONE diagonal block near the end of the
    (bandwidth-reducing) ordering: the last block when it holds enough real
    dofs for a well-conditioned R_I, otherwise the one before it — so the
    added dense k x k coupling never widens the band."""
    k = R_block.shape[1]
    if k == 0:
        return Ad, Asub
    nl = R_block.shape[0] if nl is None else nl
    lo, hi = _fixing_window(R_block, NB, nl)
    I = fixing_dofs(R_block, lo=lo, hi=hi)
    RI = R_block[I]
    Q = RI @ np.linalg.solve(RI.T @ RI, RI.T)
    Ad = Ad.copy()
    bi = I // NB
    assert (bi == bi[0]).all()
    Ad[bi[0]][np.ix_(I % NB, I % NB)] += rho * Q
    return Ad, Asub


def regularize_csr(Ksp, R_block: np.ndarray, rho: float, NB: int,
                   nl: Optional[int] = None):
    """Sparse-matrix form of :func:`regularize_block_tridiag`: returns
    Kreg = K + rho * R_I (R_I'R_I)^{-1} R_I' as scipy CSR, with the fixing
    dofs I picked inside one trailing diagonal band block (so the band is
    preserved).  Used when the same regularized blocks feed both the band
    factorization and a cheap stencil (DIA) operator for refinement."""
    import scipy.sparse as sp

    k = R_block.shape[1]
    if k == 0:
        return sp.csr_matrix(Ksp)
    nl = R_block.shape[0] if nl is None else nl
    lo, hi = _fixing_window(R_block, NB, nl)
    I = fixing_dofs(R_block, lo=lo, hi=hi)
    RI = R_block[I]
    Q = RI @ np.linalg.solve(RI.T @ RI, RI.T)
    upd = sp.coo_matrix(
        (rho * Q.reshape(-1),
         (np.repeat(I, len(I)), np.tile(I, len(I)))),
        shape=Ksp.shape,
    )
    return (sp.csr_matrix(Ksp) + upd.tocsr()).tocsr()


def gershgorin_max_eig_csr(Ksp) -> float:
    """max_i sum_j |K_ij| from sparse storage — equal to
    :func:`gershgorin_max_eig` of the same matrix's block-tridiagonal form."""
    import scipy.sparse as sp

    K = sp.csr_matrix(Ksp)
    return float(np.abs(K).sum(axis=1).max())


def gershgorin_max_eig(Ad: np.ndarray, Asub: np.ndarray) -> float:
    """Cheap upper bound on lambda_max for the regularization rho (the
    reference uses the power-method lambda_max, permonmatregularize.c:199;
    any O(||K||) value keeps Kreg well-conditioned)."""
    nb, NB, _ = Ad.shape
    rowsum = np.abs(Ad).sum(axis=2)
    rowsum[1:] += np.abs(Asub[1:]).sum(axis=2)
    colsum_from_sub = np.abs(Asub[1:]).sum(axis=1)  # A_{i,i-1}' contributions
    rowsum[:-1] += colsum_from_sub
    return float(rowsum.max())


# ---------------------------------------------------------------------------
# device-side operators
# ---------------------------------------------------------------------------


@struct.dataclass
class BlockTridiag(LinearOperator):
    """Batched per-subdomain block-tridiagonal SPD operator — the K of the
    large path (the MATBLOCKDIAG analog at scale).  Only the diagonal and
    subdiagonal blocks are stored (symmetry)."""

    Ad: jax.Array  # (ns, nb, NB, NB)
    Asub: jax.Array  # (ns, nb, NB, NB), [:, 0] = 0
    shape: Tuple[int, int] = struct.field(pytree_node=False)

    @classmethod
    def from_blocks(cls, Ad, Asub) -> "BlockTridiag":
        ns, nb, NB, _ = Ad.shape
        n = int(ns * nb * NB)
        return cls(Ad=jnp.asarray(Ad), Asub=jnp.asarray(Asub), shape=(n, n))

    def mv(self, x):
        ns, nb, NB, _ = self.Ad.shape
        # compute in the operator's storage dtype: promoting the O(NB^2)
        # block arrays to a wider input dtype would materialize multi-GB
        # temporaries (f64 on TPU is float-float emulated: 2x buffers,
        # 4x matmul partials)
        xb = x.reshape(ns, nb, NB).astype(self.Ad.dtype)
        # full-f32 matmul precision: the TPU default (bf16 passes) loses
        # ~5 decimal digits, which poisons residuals and refinements
        with jax.default_matmul_precision("highest"):
            y = jnp.einsum("snij,snj->sni", self.Ad, xb)
            # A_{i,i-1} x_{i-1}
            x_prev = jnp.concatenate(
                [jnp.zeros_like(xb[:, :1]), xb[:, :-1]], axis=1
            )
            y = y + jnp.einsum("snij,snj->sni", self.Asub, x_prev)
            # A_{i,i+1} x_{i+1} = Asub_{i+1}' x_{i+1}
            up = jnp.einsum("snji,snj->sni", self.Asub, xb)  # to block i-1
            y = y + jnp.concatenate(
                [up[:, 1:], jnp.zeros_like(up[:, :1])], axis=1
            )
        return y.reshape(-1).astype(x.dtype)

    rmv = mv  # symmetric

    def diagonal(self):
        return jnp.diagonal(self.Ad, axis1=2, axis2=3).reshape(-1)


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("offsets", "NB", "dtype"))
def expand_block_tridiag_dia(data, offsets, NB: int, dtype=None):
    """DEVICE-side expansion of per-subdomain DIA stencil data to the
    scan-major block-tridiagonal factor input — the reference factorizes
    from distributed sparse data in place (matinv.c:410-431); the round-4
    path instead expanded (nb, ns, NB, NB) dense blocks ON HOST and
    shipped ~3.5 GB through the ~11 MB/s tunnel (~320 s of the 1M-dof
    first solve).  The (ns, ndiag, nlp) row-aligned diagonals are ~50x
    smaller and already uploaded for the refinement operator; each
    diagonal contributes  vals[..., :, None] * eye(NB, k=off)  to the
    in-block part and  * eye(NB, k=off+NB)  (off < 0) to the
    sub-diagonal block — XLA fuses the per-diagonal masked broadcasts
    into one pass, no scatter.  Entries with off > 0 crossing the block
    edge belong to the (unstored) super-diagonal block of the symmetric
    layout; entries with off < 0 at rows r < -off of block 0 read the
    stencil's zero padding, so no masking is needed anywhere.

    Returns (Ad_sm, Asub_sm) of shape (nb, ns, NB, NB); bit-identical to
    the host `csr_to_block_tridiag` + `.astype(dtype)` route (same cast,
    same values), so factor outputs and iteration counts cannot move."""
    ns, ndiag, nlp = data.shape
    nb = nlp // NB
    dt = jnp.dtype(dtype) if dtype is not None else data.dtype
    D = data.astype(dt).reshape(ns, ndiag, nb, NB).transpose(2, 0, 1, 3)
    # D: (nb, ns, ndiag, NB)
    Ad = jnp.zeros((nb, ns, NB, NB), dt)
    Asub = jnp.zeros((nb, ns, NB, NB), dt)
    for d, off in enumerate(offsets):
        v = D[:, :, d, :]  # (nb, ns, NB)
        if -NB < off < NB:
            Ad = Ad + v[..., None] * jnp.eye(NB, k=int(off), dtype=dt)
        if -NB < off < 0:
            Asub = Asub + v[..., None] * jnp.eye(NB, k=int(off) + NB,
                                                 dtype=dt)
    return Ad, Asub


def _factor_step(eye, Dinv_prev, Aii, Ai):
    """One block row of the block-tridiagonal Cholesky: F_i = A_{i,i-1}
    D_{i-1}^{-T}, S = A_ii - F F', D_i = chol(S), Dinv_i explicit."""
    # full-f32 matmul precision: the Schur-complement recurrence
    # compounds over the block rows, and the TPU's default bf16 passes
    # lose positive-definiteness (NaN Cholesky) within a few blocks
    with jax.default_matmul_precision("highest"):
        F = jnp.einsum("sij,skj->sik", Ai, Dinv_prev)  # A_{i,i-1} D^{-T}
        S = Aii - jnp.einsum("sik,sjk->sij", F, F)
        D = jnp.linalg.cholesky(S)
        Dinv = jax.lax.linalg.triangular_solve(
            D, eye, left_side=True, lower=True
        )
    return Dinv, F


@jax.jit
def factor_block_tridiag_sm(Ad_sm, Asub_sm):
    """Block-tridiagonal Cholesky on SCAN-MAJOR (nb, ns, NB, NB) blocks:
    returns scan-major (Dinv, F) with D_i the lower Cholesky factors of the
    block pivots and F_i = A_{i,i-1} D_{i-1}^{-T}; Dinv_i = D_i^{-1} stored
    explicitly so applies are pure GEMVs.  Scan-major in and out means no
    device-side transpose ever materializes a second copy of the multi-GB
    factor arrays."""
    nb, ns, NB, _ = Ad_sm.shape
    eye = jnp.broadcast_to(jnp.eye(NB, dtype=Ad_sm.dtype), (ns, NB, NB))

    def step(Dinv_prev, blocks):
        Aii, Ai = blocks  # (ns, NB, NB)
        Dinv, F = _factor_step(eye, Dinv_prev, Aii, Ai)
        return Dinv, (Dinv, F)

    Dinv0 = jnp.zeros((ns, NB, NB), Ad_sm.dtype)
    _, (Dinv, F) = jax.lax.scan(step, Dinv0, (Ad_sm, Asub_sm))
    return Dinv, F


@_partial(jax.jit, static_argnames=("offsets", "NB", "dtype"))
def factor_from_dia_sm(data, offsets, NB: int, dtype=None,
                       upd_bi=None, upd_idx=None, upd_q=None):
    """Fused expand-and-factor: the per-block-row expansion of
    :func:`expand_block_tridiag_dia` runs INSIDE the factorization scan, so
    the (nb, ns, NB, NB) Ad/Asub arrays never materialize — device peak is
    the FACTORS plus one block row, half of expand-then-factor (the margin
    that decides how many dofs fit one chip; the 2.8M-dof capture OOMed on
    the two-array peak).  Bit-identical to expand + factor: the per-row
    expansion performs the same masked eye products on the same cast
    values.

    ``upd_bi`` (ns,) / ``upd_idx`` (ns, kf) / ``upd_q`` (ns, kf, kf) inject
    the rank-k fixing-dof regularization (core/dia.RegularizedBlockDia)
    into each subdomain's diagonal block ``upd_bi[s]`` as the scan passes
    it — the correction never exists as stencil planes (folding the
    ~kf^2 scattered offsets into DIA cost 7 -> 43 mostly-zero diagonals,
    0.9 GB at the 2.2M capture)."""
    ns, ndiag, nlp = data.shape
    nb = nlp // NB
    dt = jnp.dtype(dtype) if dtype is not None else data.dtype
    D = data.astype(dt).reshape(ns, ndiag, nb, NB).transpose(2, 0, 1, 3)
    # D: (nb, ns, ndiag, NB) — the scan consumes one block row per step
    eye = jnp.broadcast_to(jnp.eye(NB, dtype=dt), (ns, NB, NB))

    def expand_row(Dd):  # (ns, ndiag, NB) -> (Ad_i, Asub_i)
        Ad = jnp.zeros((ns, NB, NB), dt)
        Asub = jnp.zeros((ns, NB, NB), dt)
        for d, off in enumerate(offsets):
            v = Dd[:, d, :]
            if -NB < off < NB:
                Ad = Ad + v[..., None] * jnp.eye(NB, k=int(off), dtype=dt)
            if -NB < off < 0:
                Asub = Asub + v[..., None] * jnp.eye(NB, k=int(off) + NB,
                                                     dtype=dt)
        return Ad, Asub

    def step(Dinv_prev, xs):
        i, Dd = xs
        Aii, Ai = expand_row(Dd)
        if upd_q is not None:
            kf = upd_idx.shape[1]
            mask = (upd_bi == i).astype(dt)  # this step holds the window
            qv = upd_q.astype(dt) * mask[:, None, None]
            sidx = jnp.arange(ns)[:, None, None]
            ridx = upd_idx[:, :, None] * jnp.ones((1, 1, kf), jnp.int32)
            cidx = upd_idx[:, None, :] * jnp.ones((1, kf, 1), jnp.int32)
            Aii = Aii.at[sidx, ridx, cidx].add(qv)
        Dinv, F = _factor_step(eye, Dinv_prev, Aii, Ai)
        return Dinv, (Dinv, F)

    Dinv0 = jnp.zeros((ns, NB, NB), dt)
    _, (Dinv, F) = jax.lax.scan(step, Dinv0, (jnp.arange(nb, dtype=jnp.int32), D))
    return Dinv, F


def factor_block_tridiag(Ad, Asub):
    """Batch-major (ns, nb, NB, NB) wrapper around
    :func:`factor_block_tridiag_sm`; returns batch-major factors."""
    Dinv, F = factor_block_tridiag_sm(
        jnp.asarray(Ad).transpose(1, 0, 2, 3),
        jnp.asarray(Asub).transpose(1, 0, 2, 3),
    )
    return Dinv.transpose(1, 0, 2, 3), F.transpose(1, 0, 2, 3)


@struct.dataclass
class BandCholInv(LinearOperator):
    """y = Kreg^{-1} x via the stored block-tridiagonal Cholesky factors —
    the scalable MAT_INV_BLOCKDIAG (matinv.c:481-590).  With ``refine`` > 0
    and ``op`` set, each apply runs that many iterative-refinement steps
    against ``op`` (kept in its own precision), recovering direct accuracy
    from an f32 factorization.

    Factors are stored SCAN-MAJOR — (nb, ns, NB, NB), block index leading —
    so the substitution scans consume them as xs without materializing
    transposed copies (a per-apply transpose of the multi-GB factor arrays
    is what OOMs a 16 GB chip).  The backward substitution carries
    z_i = F_i' x_i between steps instead of storing a shifted copy of F —
    halving the stored factor footprint vs round 2."""

    Dinv: jax.Array  # (nb, ns, NB, NB), scan-major
    F: jax.Array  # (nb, ns, NB, NB), scan-major; F[0] = 0
    shape: Tuple[int, int] = struct.field(pytree_node=False)
    op: Any = None  # operator for iterative refinement (any LinearOperator)
    refine: int = struct.field(pytree_node=False, default=0)

    @classmethod
    def from_block_tridiag(
        cls, Ad, Asub, dtype=None, refine: int = 0, keep_operator: bool = False,
        op_dtype=None, op=None, scan_major: bool = False,
    ) -> "BandCholInv":
        """``scan_major=True`` means Ad/Asub are already (nb, ns, NB, NB);
        numpy batch-major inputs are re-staged on HOST so no device transpose
        doubles peak memory.  ``op`` supplies an external refinement operator
        (e.g. a cheap stencil SpMV) instead of keeping the dense
        block-tridiagonal blocks alive."""
        ext_op = op
        if scan_major:
            Ad_sm, Asub_sm = Ad, Asub
            nb, ns, NB, _ = np.shape(Ad)
        else:
            ns, nb, NB, _ = np.shape(Ad)
            if isinstance(Ad, np.ndarray):
                Ad_sm = np.ascontiguousarray(np.moveaxis(Ad, 0, 1))
                Asub_sm = np.ascontiguousarray(np.moveaxis(Asub, 0, 1))
            else:
                Ad_sm = jnp.moveaxis(jnp.asarray(Ad), 0, 1)
                Asub_sm = jnp.moveaxis(jnp.asarray(Asub), 0, 1)
        in_dtype = jnp.asarray(Ad_sm[:1, :1]).dtype
        fdtype = dtype or in_dtype
        n = int(ns * nb * NB)
        if ext_op is None and (keep_operator or refine):
            # refinement residuals must be computed at (at least) the INPUT
            # precision, else an f32 factor can never refine past f32
            odt = op_dtype or in_dtype
            ext_op = BlockTridiag.from_blocks(
                jnp.moveaxis(jnp.asarray(Ad_sm), 0, 1).astype(odt),
                jnp.moveaxis(jnp.asarray(Asub_sm), 0, 1).astype(odt),
            )
        if isinstance(Ad_sm, np.ndarray):
            Ad_sm = Ad_sm.astype(fdtype)  # host cast: device never sees f64
            Asub_sm = Asub_sm.astype(fdtype)
        Dinv, F = factor_block_tridiag_sm(
            jnp.asarray(Ad_sm).astype(fdtype), jnp.asarray(Asub_sm).astype(fdtype)
        )
        return cls(Dinv=Dinv, F=F, shape=(n, n), op=ext_op, refine=refine)

    @classmethod
    def from_blockdia(cls, op, NB: int, dtype=None, refine: int = 0):
        """Factorize directly from a (regularized) :class:`~permon_tpu.
        core.dia.BlockDia` stencil: the block-tridiagonal factor input is
        expanded ON DEVICE (:func:`expand_block_tridiag_dia`) from the
        ~50x-smaller diagonal data instead of being built on host and
        uploaded — the large-path analog of the reference's
        factorize-from-distributed-sparse-data setup (matinv.c:410-431).
        ``op`` doubles as the refinement operator when ``refine`` > 0; a
        :class:`~permon_tpu.core.dia.RegularizedBlockDia` contributes its
        rank-k fixing correction inside the scan (never as stencil
        planes)."""
        from .dia import RegularizedBlockDia

        n = int(op.shape[0])
        if isinstance(op, RegularizedBlockDia):
            Dinv, F = factor_from_dia_sm(
                op.base.data, op.base.offsets, NB, dtype=dtype,
                upd_bi=op.bi, upd_idx=op.idx, upd_q=op.q,
            )
        else:
            Dinv, F = factor_from_dia_sm(op.data, op.offsets, NB,
                                         dtype=dtype)
        return cls(Dinv=Dinv, F=F, shape=(n, n),
                   op=op if refine else None, refine=refine)

    def _fwd(self, xb):
        """y = L^{-1} x on scan-major (nb, ns, NB) blocks (forward
        substitution with the block-bidiagonal L: L_ii = D_i,
        L_{i,i-1} = F_i)."""
        nb, ns, NB, _ = self.Dinv.shape

        def fwd(y_prev, blocks):
            b_i, Dinv_i, F_i = blocks
            with jax.default_matmul_precision("highest"):
                y = jnp.einsum(
                    "sij,sj->si", Dinv_i,
                    b_i - jnp.einsum("sij,sj->si", F_i, y_prev),
                )
            return y, y

        _, Y = jax.lax.scan(
            fwd, jnp.zeros((ns, NB), self.Dinv.dtype), (xb, self.Dinv, self.F)
        )
        return Y

    def _bwd(self, Y):
        """x = L^{-T} y on scan-major blocks (backward substitution:
        x_i = D_i^{-T} (y_i - F_{i+1}' x_{i+1})).  The cross-block term
        z_i = F_i' x_i is computed at step i and CARRIED to step i-1, so
        the scan consumes F itself — no shifted copy of the factor array."""
        nb, ns, NB, _ = self.Dinv.shape

        def bwd(z_next, blocks):  # z_next = F_{i+1}' x_{i+1}
            y_i, Dinv_i, F_i = blocks
            with jax.default_matmul_precision("highest"):
                xi = jnp.einsum("sji,sj->si", Dinv_i, y_i - z_next)
                z_i = jnp.einsum("sij,si->sj", F_i, xi)
            return z_i, xi

        _, X = jax.lax.scan(
            bwd, jnp.zeros((ns, NB), self.Dinv.dtype),
            (Y, self.Dinv, self.F), reverse=True,
        )
        return X

    def _to_blocks(self, x):
        nb, ns, NB, _ = self.Dinv.shape
        return x.reshape(ns, nb, NB).astype(self.Dinv.dtype).transpose(1, 0, 2)

    @staticmethod
    def _from_blocks(Xb):
        return Xb.transpose(1, 0, 2).reshape(-1)

    def half_solve_lower(self, x):
        """L^{-1} x — one forward scan (used by the implicit sparse-Cholesky
        orthonormalization, permonmatorth.c:35-143's forward-solve shell)."""
        return self._from_blocks(self._fwd(self._to_blocks(x))).astype(x.dtype)

    def half_solve_upper(self, x):
        """L^{-T} x — one backward scan."""
        return self._from_blocks(self._bwd(self._to_blocks(x))).astype(x.dtype)

    def _solve(self, x):
        return self._from_blocks(self._bwd(self._fwd(self._to_blocks(x))))

    def mv(self, x):
        y = self._solve(x).astype(x.dtype)
        if self.refine and self.op is not None:
            for _ in range(self.refine):
                r = x - self.op.mv(y)
                y = y + self._solve(r).astype(x.dtype)
        return y

    rmv = mv  # symmetric


def band_chol_single(S, dtype=None, NB: Optional[int] = None,
                     reorder: bool = True):
    """Band Cholesky of ONE sparse SPD matrix (RCM-reordered, padded to a
    block-tridiagonal ns=1 batch) — the sparse coarse-problem factorization
    (the MUMPS GG' factor of qppf.c:282-333, but as batched MXU blocks).

    Returns ``(inv, perm)``: ``inv`` solves the PERMUTED system (padded to a
    multiple of NB; callers pad/slice), ``perm`` the RCM ordering used
    (identity when ``reorder=False``)."""
    import scipy.sparse as sp

    S = sp.csr_matrix(S)
    m = S.shape[0]
    perm = rcm_order(S) if reorder else np.arange(m)
    Sp = S[perm][:, perm]
    bw = bandwidth(Sp)
    if NB is None:
        NB = max(((bw + 1 + 127) // 128) * 128, 128)
    Ad, Asub = csr_to_block_tridiag(Sp, NB)
    inv = BandCholInv.from_block_tridiag(Ad[None], Asub[None], dtype=dtype)
    return inv, perm


def make_band_kplus(
    K_blocks: List, R_bases: Optional[List[np.ndarray]] = None,
    NB: Optional[int] = None, dtype=None, refine: int = 0,
    keep_operator: bool = False,
):
    """Factorized generalized inverse for a list of per-subdomain SPARSE
    stiffness blocks (scipy matrices, equal size) — the scalable
    make_blockdiag_kplus.  ``R_bases[s]`` is subdomain s's nullspace basis
    (fixing-dof regularization is applied per singular block); blocks are
    assumed pre-ordered for bandwidth (apply :func:`rcm_order` to the
    PROBLEM before assembly — a runtime permutation would add a gather to
    every apply).

    Returns (BandCholInv, NB)."""
    import scipy.sparse as sp

    ns = len(K_blocks)
    nl = K_blocks[0].shape[0]
    bw = max(bandwidth(sp.csr_matrix(K)) for K in K_blocks)
    if NB is None:
        NB = max(((bw + 1 + 127) // 128) * 128, 128)
    Ads, Asubs = [], []
    for s in range(ns):
        Ad, Asub = csr_to_block_tridiag(K_blocks[s], NB)
        if R_bases is not None and R_bases[s].shape[1] > 0:
            rho = gershgorin_max_eig(Ad, Asub)
            Ad, Asub = regularize_block_tridiag(
                Ad, Asub, R_bases[s][: K_blocks[s].shape[0]], rho, NB, nl=nl
            )
        Ads.append(Ad)
        Asubs.append(Asub)
    Ad = np.stack(Ads)
    Asub = np.stack(Asubs)
    inv = BandCholInv.from_block_tridiag(
        Ad, Asub, dtype=dtype, refine=refine, keep_operator=keep_operator
    )
    return inv, NB
