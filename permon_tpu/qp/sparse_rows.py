"""Sparse row operations on constraint operators — no (m, n) densification.

The reference keeps every constraint-side transform sparse: QPTScale,
QPTSplitBE, MatRemoveGluingOfDirichletDofs and MatOrthRows all operate on
AIJ/extension storage (reference: src/qp/interface/qptransform.c:1437-1902,
src/mat/utils/permonmatfetiutils.c, src/mat/interface/permonmatorth.c), and
the QPPF factors GG' as a sparse matrix through MUMPS (qppf.c:213-333).
Round-1 permon_tpu densified the constraint operator in all of these —
O(m*n) memory on a gluing BE with 1e5+ rows.  This module restores the
sparse paths:

- :func:`to_coo` extracts host-side COO structure from the library's sparse
  operator types (SubdomainExtension, Ell, VStack of those) without
  materializing dense rows;
- :func:`scale_rows` / :func:`permute_rows` / :func:`restrict_rows` are
  same-type row transformations (an extension operator stays an extension
  operator — only its index/value arrays change);
- :func:`row_nnz` / :func:`row_sqnorm` give the per-row reductions the
  scaling transforms need, via bincount on the COO triplets.

Dense operators return ``None`` from :func:`to_coo`; callers fall back to
the dense path (correct and cheap for the small dual-side constraint
matrices).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.extension import SubdomainExtension
from ..core.linop import Dense, Ell, VStack


def to_coo(op) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, Tuple[int, int]]]:
    """Host-side (rows, cols, vals, shape) of a sparse row operator, or None
    when the operator has no sparse row structure (Dense, matrix-free)."""
    if isinstance(op, SubdomainExtension):
        rows = np.asarray(op.rows).reshape(-1)
        sub = np.repeat(np.arange(op.ns), op.rows.shape[1])
        cols = sub * op.nl + np.asarray(op.cols).reshape(-1)
        vals = np.asarray(op.vals).reshape(-1)
        keep = rows < op.m_dual  # drop padding slots
        return rows[keep], cols[keep], vals[keep], (op.m_dual, op.ns * op.nl)
    if isinstance(op, Ell):
        m, n = op.shape
        vals = np.asarray(op.vals)
        cols = np.asarray(op.cols)
        rows = np.broadcast_to(np.arange(m)[:, None], cols.shape)
        keep = vals != 0
        return rows[keep], cols[keep], vals[keep], (m, n)
    if isinstance(op, VStack):
        parts = [to_coo(b) for b in op.ops]
        if any(p is None for p in parts):
            return None
        off = 0
        rows, cols, vals = [], [], []
        n = parts[0][3][1]
        for r, c, v, (mb, nb) in parts:
            assert nb == n
            rows.append(r + off)
            cols.append(c)
            vals.append(v)
            off += mb
        return (np.concatenate(rows), np.concatenate(cols),
                np.concatenate(vals), (off, n))
    return None


def to_scipy(op):
    """scipy CSR of a sparse row operator, or None."""
    coo = to_coo(op)
    if coo is None:
        return None
    import scipy.sparse as sp

    rows, cols, vals, shape = coo
    return sp.csr_matrix(sp.coo_matrix((vals, (rows, cols)), shape=shape))


def row_nnz(op) -> Optional[np.ndarray]:
    coo = to_coo(op)
    if coo is None:
        return None
    rows, cols, vals, (m, n) = coo
    return np.bincount(rows[vals != 0], minlength=m)


def row_sqnorm(op) -> Optional[np.ndarray]:
    coo = to_coo(op)
    if coo is None:
        return None
    rows, cols, vals, (m, n) = coo
    return np.bincount(rows, weights=vals * vals, minlength=m)


def scale_rows(op, d):
    """diag(d) @ op, preserving the operator type (MatDiagonalScale on the
    sparse storage, the way QPTScale operates on AIJ)."""
    if isinstance(op, SubdomainExtension):
        d_pad = jnp.concatenate([jnp.asarray(d, op.vals.dtype),
                                 jnp.zeros(1, op.vals.dtype)])
        # derived apply layouts (dense blocks, gather tables) bake vals in —
        # drop and rebuild them so the scaled operator stays consistent
        scaled = op.replace(vals=op.vals * d_pad[op.rows], blk=None,
                            gB_cols=None, gB_vals=None,
                            gBt_rows=None, gBt_vals=None)
        if op.blk is not None:
            scaled = scaled.with_dense_blocks()
        if op.gB_cols is not None:
            scaled = scaled.with_gather_apply()
        return scaled
    if isinstance(op, Ell):
        return op.replace(vals=op.vals * jnp.asarray(d, op.vals.dtype)[:, None])
    if isinstance(op, Dense):
        return Dense.create(jnp.asarray(d, op.a.dtype)[:, None] * op.a)
    raise TypeError(f"scale_rows: unsupported operator {type(op).__name__}")


def permute_rows(op, perm):
    """Row permutation: (P op) with row i of the result = row perm[i] of op."""
    perm = np.asarray(perm)
    if isinstance(op, SubdomainExtension):
        m = op.m_dual
        lookup = np.full(m + 1, m, dtype=np.int32)
        lookup[perm] = np.arange(len(perm), dtype=np.int32)
        new_rows = jnp.asarray(lookup)[op.rows]
        out = op.replace(rows=new_rows, blk=None)
        return out.with_dense_blocks() if op.blk is not None else out
    if isinstance(op, Ell):
        p = jnp.asarray(perm)
        return op.replace(cols=op.cols[p], vals=op.vals[p])
    if isinstance(op, Dense):
        return Dense.create(op.a[jnp.asarray(perm)])
    raise TypeError(f"permute_rows: unsupported operator {type(op).__name__}")


def restrict_rows(op, keep):
    """Keep only the listed rows (sorted), renumbering them 0..len(keep)-1
    (the MatExtension row-restriction of MatRemoveGluingOfDirichletDofs,
    permonmatfetiutils.c:1-167)."""
    keep = np.asarray(keep)
    if isinstance(op, SubdomainExtension):
        m_new = len(keep)
        lookup = np.full(op.m_dual + 1, m_new, dtype=np.int32)
        lookup[keep] = np.arange(m_new, dtype=np.int32)
        new_rows = jnp.asarray(lookup)[op.rows]
        # dropped entries point at the padding slot; zero their values so
        # todense/with_dense_blocks stay consistent
        new_vals = jnp.where(new_rows < m_new, op.vals, 0.0)
        out = op.replace(rows=new_rows, vals=new_vals, m_dual=m_new, blk=None)
        return out.with_dense_blocks() if op.blk is not None else out
    if isinstance(op, Ell):
        k = jnp.asarray(keep)
        return op.replace(cols=op.cols[k], vals=op.vals[k],
                          shape=(len(keep), op.shape[1]))
    if isinstance(op, Dense):
        return Dense.create(op.a[jnp.asarray(keep)])
    raise TypeError(f"restrict_rows: unsupported operator {type(op).__name__}")
