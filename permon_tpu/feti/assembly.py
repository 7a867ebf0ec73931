"""TFETI assembly — gluing + Dirichlet constraint construction (host-side).

The reference builds the gluing matrix Bg with a sequence of PetscSF
(star-forest) communication rounds because no rank sees the whole
local-to-global map (reference: QPFetiGetBgtSF, src/qp/impls/feti/
qpfeti.c:405-925).  Here setup runs on host numpy with the full l2g in hand —
the SF choreography collapses to a multiplicity scan — and the result is
uploaded once as static sparse operators.  This matches the TPU execution
model: graph construction is host/setup-time, the iteration hot path touches
only device-resident arrays.

Semantics mirrored from the reference:
- gluing types (qpfeti.c:527-565, 786-821):
  * nonred: for a dof shared by d subdomains (ordered by rank), d-1 rows
    pairing the first copy with each other copy, +1 on the lower rank,
    -1 on the higher;
  * full:   all d(d-1)/2 pairs, same sign convention;
  * orth:   d-1 orthonormal rows; row k has 1/k on copies 0..k-1 and -1 on
    copy k, normalized by sqrt(1/k + 1);
- multiplicity scaling 1/sqrt(d) for nonred/full (the -SCALE_ON default,
  qpfeti.c:757-760);
- Dirichlet enforcement either as appended identity constraint rows Bd with
  rhs taken from the initial vector (enforce_by_B, the -EXTENSION_ON default,
  qpfeti.c:153-312) or by symmetric elimination in the Hessian
  (MatZeroRowsColumns with alpha = max|diag|, zeroing the matching nullspace
  rows — classical FETI);
- per-subdomain nullspaces: constant modes (Poisson) or rigid body modes from
  coordinates (elasticity), the analytic path the reference examples use
  (feti/ex71.c:331-339, MatNullSpaceCreateRigidBody), with a dense
  eigen-detection fallback.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

GLUING_TYPES = ("nonred", "full", "orth")


@dataclasses.dataclass
class FetiProblem:
    """Host-side description of a decomposed problem.

    ``K_blocks[s]`` is subdomain s's local stiffness (equal padded size),
    ``b_loc[s]`` its local load vector, ``l2g[s, i]`` the global id of its
    i-th local dof.  ``dirichlet`` lists global dof ids (undecomposed
    numbering, FETI_GLOBAL_UNDECOMPOSED); values default to zero.
    """

    K_blocks: np.ndarray  # (ns, nl, nl)
    b_loc: np.ndarray  # (ns, nl)
    l2g: np.ndarray  # (ns, nl) int; -1 marks padding dofs (unequal subdomains)
    dirichlet: np.ndarray  # (nd,) ids in `dirichlet_numtype` numbering
    dirichlet_values: Optional[np.ndarray] = None
    #: numbering of `dirichlet` (QPFetiSetDirichlet numtype, permonqpfeti.h:
    #: 5-23): 'global_undecomposed' — ids in the assembled/global space
    #: (default); 'global_decomposed' — ids into the concatenated decomposed
    #: space (s*nl + i); 'local' — (s, i) pairs, shape (nd, 2)
    dirichlet_numtype: str = "global_undecomposed"
    coords: Optional[np.ndarray] = None  # (ns, nl/dim, dim) for rigid body modes
    #: per-subdomain floating flag (block of K singular); None = auto-detect.
    #: The reference gets this from MUMPS null-pivot counts (matinv.c:55-195).
    floating: Optional[np.ndarray] = None

    def dirichlet_global(self) -> np.ndarray:
        """The Dirichlet set renumbered to global-undecomposed ids
        (QPFetiAssembleDirichlet's renumbering step, qpfeti.c:153-200)."""
        return dirichlet_global_ids(self.l2g, self.dirichlet, self.dirichlet_numtype)

    def floating_mask(self, tol: float = 1e-10) -> np.ndarray:
        if self.floating is not None:
            return np.asarray(self.floating, dtype=bool)
        # one batched LAPACK call over all blocks (no O(ns) python loop)
        w = np.linalg.eigvalsh(np.asarray(self.K_blocks))
        return w[:, 0] <= tol * np.maximum(np.abs(w[:, -1]), 1.0)

    @property
    def ns(self) -> int:
        return self.K_blocks.shape[0]

    @property
    def nl(self) -> int:
        return self.K_blocks.shape[1]

    @property
    def n_decomposed(self) -> int:
        return self.ns * self.nl

    @property
    def n_global(self) -> int:
        return int(self.l2g.max()) + 1


def dirichlet_global_ids(l2g: np.ndarray, dirichlet, numtype: str) -> np.ndarray:
    """Renumber a Dirichlet set to global-undecomposed ids (the
    QPFetiSetDirichlet numtype handling, qpfeti.c:153-200); shared by the
    dense and sparse problem containers."""
    d = np.asarray(dirichlet)
    if len(d) == 0:
        return d.astype(np.int64).reshape(-1)
    if numtype == "global_undecomposed":
        return d.astype(np.int64)
    if numtype == "global_decomposed":
        return l2g.reshape(-1)[d.astype(np.int64)]
    if numtype == "local":
        d = d.reshape(-1, 2)
        return l2g[d[:, 0], d[:, 1]]
    raise ValueError(f"unknown dirichlet numtype {numtype!r}")


def _dof_copies(l2g: np.ndarray):
    """Map global dof -> list of (subdomain, local index), rank-ordered.
    Padding entries (l2g == -1) are skipped."""
    copies = {}
    ns, nl = l2g.shape
    for s in range(ns):
        for i in range(nl):
            g = int(l2g[s, i])
            if g < 0:
                continue
            copies.setdefault(g, []).append((s, i))
    return copies


def build_gluing(
    l2g: np.ndarray,
    gluing: str = "nonred",
    scale: bool = True,
    exclude: Optional[Sequence[int]] = None,
):
    """Return COO (rows, cols, vals, n_rows) of Bg over the decomposed space.

    ``exclude`` drops interface dofs (e.g. Dirichlet dofs when
    QPTRemoveGluingOfDirichletDofs semantics are wanted)."""
    assert gluing in GLUING_TYPES, gluing
    from ..utils.native import build_gluing_native

    if exclude is not None:
        exclude = np.asarray(sorted(int(g) for g in exclude), dtype=np.int64)
    native = build_gluing_native(l2g, gluing, scale, exclude)
    if native is not None:
        return native
    ns, nl = l2g.shape
    excl = set(int(g) for g in (exclude or ()))
    rows: List[int] = []
    cols: List[int] = []
    vals: List[float] = []
    r = 0
    for g, copies in sorted(_dof_copies(l2g).items()):
        d = len(copies)
        if d < 2 or g in excl:
            continue
        idx = [s * nl + i for (s, i) in copies]
        mscale = 1.0 / np.sqrt(d) if (scale and gluing in ("nonred", "full")) else 1.0
        if gluing == "nonred":
            for j in range(1, d):
                rows += [r, r]
                cols += [idx[0], idx[j]]
                vals += [mscale, -mscale]
                r += 1
        elif gluing == "full":
            for a in range(d):
                for bidx in range(a + 1, d):
                    rows += [r, r]
                    cols += [idx[a], idx[bidx]]
                    vals += [mscale, -mscale]
                    r += 1
        else:  # orth: row k = (1/k,...,1/k,-1)/sqrt(1/k+1) on copies 0..k
            for k in range(1, d):
                nrm = 1.0 / np.sqrt(1.0 / k + 1.0)
                for a in range(k):
                    rows.append(r)
                    cols.append(idx[a])
                    vals.append(nrm / k)
                rows.append(r)
                cols.append(idx[k])
                vals.append(-nrm)
                r += 1
    return np.array(rows), np.array(cols), np.array(vals, dtype=np.float64), r


def build_dirichlet_rows(prob: FetiProblem):
    """Identity rows on every decomposed copy of each Dirichlet dof (the
    enforce_by_B path, qpfeti.c:153-312).  Returns (rows, cols, vals, n_rows,
    c) with c the prescribed values.  Fully vectorized (no python loop over
    ns*nl): copies are found by one argsort over the flattened l2g."""
    dg = prob.dirichlet_global()
    dvals = (
        np.asarray(prob.dirichlet_values, dtype=np.float64)
        if prob.dirichlet_values is not None
        else np.zeros(len(prob.dirichlet))
    )
    flat = prob.l2g.reshape(-1)
    # per Dirichlet dof d (in dg order): all flat positions with l2g == dg[d],
    # rank-ordered (flat index order == (s, i) lexicographic == rank order)
    pos_d, pos_flat = np.nonzero(dg[:, None] == flat[None, :]) if len(dg) * len(flat) < (1 << 24) else _dirichlet_copies_sorted(dg, flat)
    r = len(pos_flat)
    rows = np.arange(r)
    return rows, pos_flat.astype(np.int64), np.ones(r), r, dvals[pos_d]


def _dirichlet_copies_sorted(dg: np.ndarray, flat: np.ndarray):
    """(dirichlet index, flat position) pairs via sorted search — O(n log n)
    instead of the O(nd * n) broadcast, for large decompositions."""
    order = np.argsort(flat, kind="stable")
    sf = flat[order]
    lo = np.searchsorted(sf, dg, side="left")
    hi = np.searchsorted(sf, dg, side="right")
    counts = hi - lo
    pos_d = np.repeat(np.arange(len(dg)), counts)
    take = np.concatenate([np.arange(a, b) for a, b in zip(lo, hi)]) if len(dg) else np.zeros(0, np.int64)
    return pos_d, order[take]


def eliminate_dirichlet_in_blocks(prob: FetiProblem):
    """Symmetric elimination in the Hessian (the dir_in_hess path): zero the
    Dirichlet rows/columns of the owning blocks and put alpha = max|diag| on
    the diagonal; the rhs picks up -K[:,j]*value contributions first.
    Returns modified (K_blocks, b_loc) and the per-subdomain Dirichlet masks."""
    K = prob.K_blocks.copy()
    b = prob.b_loc.copy()
    # copies restricted to the Dirichlet dofs (vectorized — the full
    # _dof_copies dict is O(ns*nl) python-loop host time at scale)
    dglob = prob.dirichlet_global()
    ss, ii = np.nonzero(np.isin(prob.l2g, dglob))
    copies: dict = {}
    for s, i in zip(ss, ii):
        copies.setdefault(int(prob.l2g[s, i]), []).append((int(s), int(i)))
    dvals = (
        prob.dirichlet_values
        if prob.dirichlet_values is not None
        else np.zeros(len(prob.dirichlet))
    )
    masks = np.zeros((prob.ns, prob.nl), dtype=bool)
    alpha = max(abs(prob.K_blocks.diagonal(axis1=1, axis2=2)).max(), 1.0)
    for g, val in zip(prob.dirichlet_global(), dvals):
        for (s, i) in copies[int(g)]:
            b[s] -= K[s][:, i] * val
            K[s][i, :] = 0.0
            K[s][:, i] = 0.0
            K[s][i, i] = alpha
            b[s][i] = alpha * val
            masks[s, i] = True
    return K, b, masks


def numeric_nullspace_blocks(
    K_blocks: np.ndarray, l2g: np.ndarray, tol: float = 1e-8
) -> List[np.ndarray]:
    """Per-block numeric nullspace bases by eigendecomposition — the direct
    analog of MUMPS null-pivot detection + ICNTL(25) basis computation
    (reference: matinv.c:55-195), run per MATBLOCKDIAG block.

    Returns a list of (nl, k_s) orthonormal bases (k_s may be 0).  Padding
    dofs (l2g < 0) carry unit diagonals and never enter a nullspace."""
    out = []
    for s in range(K_blocks.shape[0]):
        w, v = np.linalg.eigh(K_blocks[s])
        scale = max(abs(w[-1]), abs(w[0]), 1.0)
        k = int(np.sum(np.abs(w) <= tol * scale))
        out.append(v[:, :k] if k else np.zeros((K_blocks.shape[1], 0)))
    return out


def nullspace_columns_from_blocks(bases: List[np.ndarray]):
    """Stack per-block bases into global COO columns of the block-diagonal R
    (MatCreateBlockDiag(R_loc), matinv.c:180-187)."""
    rows, cols, vals = [], [], []
    col = 0
    nl = bases[0].shape[0] if bases else 0
    for s, B in enumerate(bases):
        for j in range(B.shape[1]):
            nz = np.flatnonzero(np.abs(B[:, j]) > 0)
            rows.extend((s * nl + nz).tolist())
            cols.extend([col] * len(nz))
            vals.extend(B[nz, j].tolist())
            col += 1
    return np.array(rows), np.array(cols), np.array(vals, dtype=np.float64), col


def constant_nullspace_columns(prob: FetiProblem, fixed_mask: Optional[np.ndarray] = None):
    """One normalized constant column per floating subdomain (Poisson).

    ``fixed_mask[s]`` True marks subdomains whose block is nonsingular (e.g.
    Dirichlet eliminated in the Hessian) — they contribute no column, exactly
    like the reference zeroing R rows for TFETI vs FETI (qpfeti.c:281-301)."""
    rows, cols, vals = [], [], []
    col = 0
    for s in range(prob.ns):
        if fixed_mask is not None and fixed_mask[s]:
            continue
        real = np.flatnonzero(prob.l2g[s] >= 0)
        for i in real:
            rows.append(s * prob.nl + int(i))
            cols.append(col)
            vals.append(1.0 / np.sqrt(len(real)))
        col += 1
    return np.array(rows), np.array(cols), np.array(vals, dtype=np.float64), col


def decompose_rhs_by_multiplicity(b_loc: np.ndarray, l2g: np.ndarray) -> np.ndarray:
    """Assemble the global rhs (summing copies) and re-split it with
    D = 1/multiplicity on interface dofs — the MATIS -> BlockDiag rhs
    decomposition (QPTMatISToBlockDiag, qptransform.c:2097-2115).

    Any splitting with the same copy-sum yields the same constrained
    minimizer, but the dual trajectory (and hence iteration-count parity with
    the reference) depends on this particular one."""
    ng = int(l2g.max()) + 1
    flat = l2g.reshape(-1)
    real = flat >= 0
    ids = flat[real]
    b_glob = np.bincount(ids, weights=b_loc.reshape(-1)[real], minlength=ng)
    mult = np.bincount(ids, minlength=ng)
    out = np.zeros_like(b_loc).reshape(-1)
    out[real] = b_glob[ids] / mult[ids]
    return out.reshape(b_loc.shape)


def rigid_body_modes(coords: np.ndarray) -> np.ndarray:
    """Orthonormalized rigid body modes of one subdomain from nodal
    coordinates (nn, dim) — 3 modes in 2-D, 6 in 3-D (the analog of
    MatNullSpaceCreateRigidBody used in feti/ex71.c:331-339)."""
    nn, dim = coords.shape
    n = nn * dim
    if dim == 2:
        modes = np.zeros((n, 3))
        modes[0::2, 0] = 1.0
        modes[1::2, 1] = 1.0
        modes[0::2, 2] = -coords[:, 1]
        modes[1::2, 2] = coords[:, 0]
    elif dim == 3:
        modes = np.zeros((n, 6))
        for d in range(3):
            modes[d::3, d] = 1.0
        # rotations about z, x, y
        modes[0::3, 3] = -coords[:, 1]
        modes[1::3, 3] = coords[:, 0]
        modes[1::3, 4] = -coords[:, 2]
        modes[2::3, 4] = coords[:, 1]
        modes[0::3, 5] = coords[:, 2]
        modes[2::3, 5] = -coords[:, 0]
    else:
        raise ValueError(f"unsupported dim {dim}")
    q, _ = np.linalg.qr(modes)
    return q
