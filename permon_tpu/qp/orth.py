"""Row/column orthonormalization — the MatOrthColumns/MatOrthRows analog.

Produces (Q, T) with Q = T B having orthonormal rows, where T is the change
of basis applied to constraint right-hand sides and (transposed) to recovered
multipliers (reference: src/mat/interface/permonmatorth.c; used by
QPTOrthonormalizeEq, qptransform.c:566-660).

Methods:
- "gs": iterated classical Gram-Schmidt with re-orthogonalization until the
  norm stabilizes (permonmatorth.c:207-250),
- "cholesky": BB' = LL', Q = L^{-1} B (the row variant of the Cholesky QR in
  permonmatorth.c:35-143),
- "implicit"/"inexact": no-op transforms that only mark orthonormality /
  reuse downstream (permonmatorth.c:145-174).

Everything here is setup-time dense math on the small constraint dimension.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..core.linop import LinearOperator


def orth_rows_gs(B: jax.Array, rtol: float = 1e-10, max_reorth: int = 4) -> Tuple[jax.Array, jax.Array]:
    """Iterated classical Gram-Schmidt on rows. Returns (Q, T) with Q = T B."""
    B = jnp.asarray(B)
    m, n = B.shape
    dtype = B.dtype
    Q = jnp.zeros((m, n), dtype)
    T = jnp.zeros((m, m), dtype)

    def row_step(i, carry):
        Q, T = carry
        b = B[i]
        t = jnp.zeros(m, dtype).at[i].set(1.0)

        def reorth(_, bt):
            b, t = bt
            coeffs = Q @ b  # projections onto previous rows (rows >= i are 0)
            return b - Q.T @ coeffs, t - T.T @ coeffs

        b, t = jax.lax.fori_loop(0, max_reorth, reorth, (b, t))
        nrm = jnp.linalg.norm(b)
        Q = Q.at[i].set(b / nrm)
        T = T.at[i].set(t / nrm)
        return Q, T

    Q, T = jax.lax.fori_loop(0, m, row_step, (Q, T))
    return Q, T


def orth_rows_gs_lingen(B: jax.Array, alpha: float = 0.5, max_reorth: int = 8) -> Tuple[jax.Array, jax.Array]:
    """Lingen's iterated-GS variant (permonmatorth.c:252-290): re-orthogonalize
    a row while its norm dropped by more than the factor ``alpha`` in the last
    sweep (the selective-reorthogonalization criterion), instead of a fixed
    sweep count."""
    B = jnp.asarray(B)
    m, n = B.shape
    dtype = B.dtype
    Q = jnp.zeros((m, n), dtype)
    T = jnp.zeros((m, m), dtype)

    def row_step(i, carry):
        Q, T = carry
        b = B[i]
        t = jnp.zeros(m, dtype).at[i].set(1.0)

        def cond(state):
            b, t, prev, it = state
            return jnp.logical_and(it < max_reorth, jnp.linalg.norm(b) < alpha * prev)

        def sweep(state):
            b, t, _, it = state
            prev = jnp.linalg.norm(b)
            coeffs = Q @ b
            return b - Q.T @ coeffs, t - T.T @ coeffs, prev, it + 1

        # always one sweep, then re-orthogonalize on norm collapse
        b, t, prev, _ = sweep((b, t, jnp.linalg.norm(b), 0))
        b, t, _, _ = jax.lax.while_loop(cond, sweep, (b, t, prev, jnp.int32(1)))
        nrm = jnp.linalg.norm(b)
        return Q.at[i].set(b / nrm), T.at[i].set(t / nrm)

    Q, T = jax.lax.fori_loop(0, m, row_step, (Q, T))
    return Q, T


def orth_rows_cholesky(B: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """BB' = LL'; Q = L^{-1} B has orthonormal rows; T = L^{-1}."""
    L = jnp.linalg.cholesky(B @ B.T)
    T = jax.scipy.linalg.solve_triangular(L, jnp.eye(B.shape[0], dtype=B.dtype), lower=True)
    return T @ B, T


def orth_rows(B: jax.Array, method: str = "gs"):
    if method == "gs":
        return orth_rows_gs(B)
    if method == "gs_lingen":
        return orth_rows_gs_lingen(B)
    if method == "cholesky":
        return orth_rows_cholesky(B)
    if method in ("implicit", "inexact"):
        return B, jnp.eye(B.shape[0], dtype=B.dtype)
    raise ValueError(f"unknown orthonormalization method {method!r}")


@struct.dataclass
class BandOrthT(LinearOperator):
    """Implicit T = L^{-1} P from the band Cholesky P BB' P' = LL' — the
    row analog of the reference's implicit Cholesky orthonormalization
    shell Q = A U^{-1} (MatOrthColumns CHOLESKY with implicit form,
    permonmatorth.c:35-143): T B has orthonormal rows without ever
    materializing B densely, and applies are one half-substitution scan."""

    band: Any  # BandCholInv of the permuted BB' (ns=1 batch, padded)
    perm: jax.Array  # RCM ordering p: (Pv)_i = v[p_i]
    m_rows: int = struct.field(pytree_node=False)

    @property
    def shape(self):
        return (self.m_rows, self.m_rows)

    def _pad(self, v):
        pad = self.band.shape[0] - self.m_rows
        return jnp.concatenate([v, jnp.zeros(pad, v.dtype)])

    def mv(self, x):
        """T x = L^{-1} (P x)."""
        return self.band.half_solve_lower(self._pad(x[self.perm]))[: self.m_rows]

    def rmv(self, y):
        """T' y = P' L^{-T} y."""
        u = self.band.half_solve_upper(self._pad(y))[: self.m_rows]
        return jnp.zeros_like(y).at[self.perm].set(u)


def orth_rows_implicit_band(BE) -> Tuple[Any, BandOrthT]:
    """Sparse implicit orthonormalization of a wide sparse constraint
    operator: factor BB' (sparse product, RCM + block-tridiagonal Cholesky)
    and return (Q, T) with Q = Product((T, BE)) lazily orthonormal — the
    AIJ-native MatOrthRows path (permonmatorth.c on sparse storage), no
    (m, n) densification.  Returns None when BE has no sparse structure."""
    from ..core.band import band_chol_single
    from ..core.linop import Product
    from .sparse_rows import to_scipy

    Bs = to_scipy(BE)
    if Bs is None:
        return None
    S = (Bs @ Bs.T).tocsr()
    band, perm = band_chol_single(S)
    T = BandOrthT(band=band, perm=jnp.asarray(perm), m_rows=int(S.shape[0]))
    return Product((T, BE)), T


def orth_columns(A: jax.Array, method: str = "gs"):
    """Column variant: A = Q S with Q'Q = I; returns (Q, T) with Q = A T'."""
    Q, T = orth_rows(A.T, method)
    return Q.T, T
