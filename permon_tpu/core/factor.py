"""Factorized inverse operators — the MATINV analog.

The reference wraps a KSP with a direct-solver cascade (MUMPS/PaStiX/SuperLU
Cholesky/LU, reference: src/mat/impls/inv/matinv.c:481-540) so that
MatMult(Kplus, x) solves K y = x.  On TPU the equivalent is a setup-time
Cholesky factorization (dense per-subdomain/condensed blocks via
``jax.lax.linalg.cholesky`` — MXU-batched) and triangular solves at apply
time; f64 keeps the applications direct-solver-accurate, which the
iteration-count parity oracles require.

Singular operators (floating TFETI subdomains) are regularized before
factorization following MatRegularize (reference:
src/mat/interface/permonmatregularize.c:117-287): K_reg = K + rho*Q with
Q an orthogonal projector onto a complement of ker K built from the
nullspace basis R, rho = ||K|| (max eigenvalue); the factorized inverse of
K_reg then acts as a generalized inverse of K.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from .eig import max_eigenvalue
from .linop import LinearOperator, aslinearoperator


@struct.dataclass
class CholInv(LinearOperator):
    """y = K^{-1} x via a stored dense Cholesky factor (lower)."""

    chol: jax.Array  # (n, n) lower-triangular factor
    shape: Tuple[int, int] = struct.field(pytree_node=False)

    @classmethod
    def from_dense(cls, a: jax.Array) -> "CholInv":
        c = jnp.linalg.cholesky(a)
        return cls(chol=c, shape=(int(a.shape[0]), int(a.shape[1])))

    def mv(self, x):
        return jax.scipy.linalg.cho_solve((self.chol, True), x)

    rmv = mv  # symmetric


@struct.dataclass
class BlockDiagCholInv(LinearOperator):
    """Batched per-block Cholesky inverse — the MAT_INV_BLOCKDIAG analog.

    All blocks share one (padded) size so the factorization and solves are a
    single batched MXU-friendly call; this replaces the reference's per-rank
    PCBJACOBI sub-KSP factorizations (matinv.c:551-575).

    Two apply modes:
    - triangular solves against the stored Cholesky factors (default; the
      most accurate, used by the f64 parity paths), and
    - ``explicit=True``: the blocks are inverted once at setup and applies
      become one batched GEMV — the MatInvExplicitly analog (matinv.c:
      594-629).  On TPU the batched triangular solve is latency-bound
      (~200x slower than the GEMV at bs=125 measured on v5e), so this is
      the production/throughput mode."""

    chols: jax.Array  # (nb, bs, bs)
    shape: Tuple[int, int] = struct.field(pytree_node=False)
    invs: Optional[jax.Array] = None  # (nb, bs, bs) explicit inverses

    @classmethod
    def from_blocks(cls, blocks: jax.Array, explicit: bool = False) -> "BlockDiagCholInv":
        nb, bs, _ = blocks.shape
        chols = jnp.linalg.cholesky(blocks)
        invs = None
        if explicit:
            eye = jnp.broadcast_to(jnp.eye(bs, dtype=blocks.dtype), blocks.shape)
            invs = jax.vmap(lambda c, e: jax.scipy.linalg.cho_solve((c, True), e))(
                chols, eye
            )
        return cls(chols=chols, shape=(int(nb * bs), int(nb * bs)), invs=invs)

    def explicitly(self) -> "BlockDiagCholInv":
        """Return a copy with the explicit-inverse apply mode enabled."""
        if self.invs is not None:
            return self
        nb, bs, _ = self.chols.shape
        eye = jnp.broadcast_to(jnp.eye(bs, dtype=self.chols.dtype), self.chols.shape)
        invs = jax.vmap(lambda c, e: jax.scipy.linalg.cho_solve((c, True), e))(
            self.chols, eye
        )
        return self.replace(invs=invs)

    def mv(self, x):
        nb, bs, _ = self.chols.shape
        xb = x.reshape(nb, bs)
        if self.invs is not None:
            with jax.default_matmul_precision("highest"):  # bf16 default
                return jnp.einsum("sij,sj->si", self.invs, xb).reshape(-1)
        yb = jax.vmap(lambda c, v: jax.scipy.linalg.cho_solve((c, True), v))(self.chols, xb)
        return yb.reshape(-1)

    rmv = mv


@struct.dataclass
class RaggedBlockDiagCholInv(LinearOperator):
    """Bucketed batched Cholesky inverse for HETEROGENEOUS block sizes.

    The uniform :class:`BlockDiagCholInv` pads every block to nl_max and
    pays O(nl_max^3) factor + O(nl_max^2) solve work per block; on a
    decomposition with mixed subdomain sizes that padding tax is real
    (the reference never pays it — each rank factors its own size,
    matinv.c:551-575).  Here blocks are grouped at setup into size
    buckets (true size rounded up to ``round_to``); each bucket is one
    batched factorization/solve at ITS size.  The operator keeps the
    flat (ns*nl_max) vector interface — padding dofs carry unit
    diagonals, so they pass through identically to the uniform path.
    """

    #: per bucket: (idx (nb_i,), chols (nb_i, bs_i, bs_i), invs or None)
    buckets: Tuple[Any, ...]
    ns: int = struct.field(pytree_node=False)
    nl: int = struct.field(pytree_node=False)  # padded (interface) block size

    @property
    def shape(self):
        return (self.ns * self.nl, self.ns * self.nl)

    @classmethod
    def from_blocks(cls, blocks: jax.Array, sizes, round_to: int = 32,
                    explicit: bool = False) -> "RaggedBlockDiagCholInv":
        """``blocks`` (ns, nl, nl) unit-diagonal padded; ``sizes`` (ns,)
        true block sizes (padding must be a trailing suffix)."""
        import numpy as np

        ns, nl, _ = blocks.shape
        sizes = np.asarray(sizes)
        bucket_of = np.minimum((sizes + round_to - 1) // round_to * round_to, nl)
        buckets = []
        for bs in sorted(set(int(b) for b in bucket_of)):
            idx = np.flatnonzero(bucket_of == bs)
            sub = blocks[jnp.asarray(idx)][:, :bs, :bs]
            chols = jnp.linalg.cholesky(sub)
            invs = None
            if explicit:
                eye = jnp.broadcast_to(jnp.eye(bs, dtype=blocks.dtype), sub.shape)
                invs = jax.vmap(
                    lambda c, e: jax.scipy.linalg.cho_solve((c, True), e)
                )(chols, eye)
            buckets.append((jnp.asarray(idx), chols, invs))
        return cls(buckets=tuple(buckets), ns=int(ns), nl=int(nl))

    def mv(self, x):
        xb = x.reshape(self.ns, self.nl)
        out = xb  # padding dofs: unit diagonal -> identity pass-through
        for idx, chols, invs in self.buckets:
            bs = chols.shape[1]
            xi = xb[idx, :bs]
            if invs is not None:
                with jax.default_matmul_precision("highest"):  # bf16 default
                    yi = jnp.einsum("sij,sj->si", invs, xi)
            else:
                yi = jax.vmap(
                    lambda c, v: jax.scipy.linalg.cho_solve((c, True), v)
                )(chols, xi)
            out = out.at[idx, :bs].set(yi)
        return out.reshape(-1)

    rmv = mv

    def explicitly(self) -> "BlockDiagCholInv":
        """Densify to the uniform explicit-inverse form (ns, nl, nl) for
        consumers that want one batched GEMV (the leaf throughput path)."""
        eye = jnp.eye(self.nl, dtype=self.buckets[0][1].dtype)
        invs = jnp.broadcast_to(eye, (self.ns, self.nl, self.nl))
        chols = jnp.broadcast_to(eye, (self.ns, self.nl, self.nl))
        for idx, ch, iv in self.buckets:
            bs = ch.shape[1]
            if iv is None:
                e = jnp.broadcast_to(jnp.eye(bs, dtype=ch.dtype), ch.shape)
                iv = jax.vmap(lambda c, z: jax.scipy.linalg.cho_solve((c, True), z))(ch, e)
            invs = invs.at[idx, :bs, :bs].set(iv)
            chols = chols.at[idx, :bs, :bs].set(ch)
        return BlockDiagCholInv(
            chols=chols, shape=(self.ns * self.nl, self.ns * self.nl), invs=invs
        )


@struct.dataclass
class IterativeInv(LinearOperator):
    """K+ as a nested CG solve — the MATINV fallback for matrix-free
    operators where no factorization is available (the reference's
    KSPCG+PCNONE cascade tail, matinv.c:535-540; tolerances via
    MatInvSetTolerances).  ``mv`` runs a jitted CG to ``rtol``/``max_it`` —
    usable anywhere a factorized inverse is (e.g. as the ``kplus`` of
    ``dualize``), at the cost of a matvec per inner iteration."""

    a: Any  # the (SPD) operator to invert
    rtol: float = struct.field(pytree_node=False, default=1e-10)
    max_it: int = struct.field(pytree_node=False, default=1000)

    @property
    def shape(self):
        return self.a.shape

    def mv(self, x):
        from ..qp.qp import QP
        from ..solvers.cg import cg

        from .convergence import Tolerances

        res = cg(QP(A=self.a, b=x), tol=Tolerances(rtol=self.rtol, max_it=self.max_it))
        return res.x

    rmv = mv


def nullspace_projector_dense(R: jax.Array) -> jax.Array:
    """Q = R (R'R)^{-1} R' — orthogonal projector onto span(R)."""
    RtR = R.T @ R
    return R @ jnp.linalg.solve(RtR, R.T)


def regularize_dense(K: jax.Array, R: jax.Array, rho: Optional[jax.Array] = None) -> jax.Array:
    """K_reg = K + rho * Q (MatRegularize semantics; rho defaults to ||K||,
    the max eigenvalue, permonmatregularize.c:199-230)."""
    if rho is None:
        from .linop import Dense

        rho = max_eigenvalue(Dense.create(K))
    return K + rho * nullspace_projector_dense(R)


def make_inv(A, R=None, regularize: bool = True) -> CholInv:
    """Factorized (pseudo)inverse K+ of a (possibly singular) SPD operator.

    With a nullspace basis R the operator is regularized first so the Cholesky
    factorization exists; the result is a generalized inverse of K
    (K K+ K = K on range(K)), which is all the dual methods need
    (reference: QPTDualize's Kplus construction, qptransform.c:978-1087)."""
    A = aslinearoperator(A)
    Ad = A.todense()
    if R is not None:
        Rd = R.todense() if isinstance(R, LinearOperator) else jnp.asarray(R)
        if Rd.shape[1] > 0 and regularize:
            Ad = regularize_dense(Ad, Rd)
    return CholInv.from_dense(Ad)


def detect_nullspace_dense(A: jax.Array, tol: float = 1e-8):
    """Nullspace basis by eigendecomposition — the TPU stand-in for MUMPS
    null-pivot detection (matinv.c:55-195).  Returns (R, defect).

    Intended for setup time on condensed/dense blocks; analytic rigid-body
    modes (permon_tpu.feti.rigid_body_modes) are the preferred path, exactly
    as the reference examples do (feti/ex71.c:331-339)."""
    w, v = jnp.linalg.eigh(A)
    scale = jnp.max(jnp.abs(w))
    mask = jnp.abs(w) <= tol * scale
    defect = int(jnp.sum(mask))
    return v[:, :defect], defect
