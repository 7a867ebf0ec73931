"""Large-scale TFETI — sparse per-subdomain blocks + band Cholesky K+.

The tutorial-scale path (:mod:`permon_tpu.feti.solve`) stores each subdomain
stiffness as a dense (nl, nl) block: O(nl^2) memory and O(nl^3) factor work
per subdomain, impossible past a few thousand dofs.  This module is the
scalable counterpart for the reference's production regime — per-rank MUMPS
Cholesky on sparse subdomain stiffness (reference:
src/mat/impls/inv/matinv.c:481-590) at 10^5-10^7 total dofs:

- :class:`SparseFetiProblem` holds per-subdomain SCIPY sparse blocks;
- the decomposed operator A is a :class:`~permon_tpu.core.dia.BlockDia`
  stencil (the band factor input is expanded from it INSIDE the
  factorization scan — bandwidth-bounded sparsity made MXU-dense);
- K+ is a :class:`~permon_tpu.core.band.BandCholInv`: one lax.scan blocked
  band Cholesky over all subdomains, fixing-dof regularization for floating
  blocks (an exact generalized inverse, see core/band.py), optional f32
  factorization with f64/f32 iterative refinement;
- everything downstream (dualize -> homogenize -> project -> CG) is the
  SAME transform chain as the tutorial path — the projected pipeline is
  invariant to the K+ choice (PARITY.md), so iteration counts match the
  dense path where both run.

The local dof numbering should be bandwidth-friendly (structured boxes
already are; use :func:`reorder_rcm` for unstructured decompositions —
the permutation is fused into the problem so no runtime gather exists).
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.band import (
    BandCholInv,
    bandwidth,
    rcm_order,
)
from flax import struct

from ..core.convergence import Tolerances
from ..core.extension import SubdomainExtension
from ..core.linop import Ell, LinearOperator
from ..qp.qp import QP
from ..qp.transforms import (
    Solution,
    compose,
    dualize,
    enforce_eq_by_projector,
    homogenize_eq,
)
from ..solvers.cg import cg
from .assembly import build_gluing, constant_nullspace_columns, rigid_body_modes
from .solve import FetiOptions, FetiResult


@dataclasses.dataclass
class SparseFetiProblem:
    """Decomposed problem with SPARSE per-subdomain stiffness blocks.

    Mirrors :class:`~permon_tpu.feti.assembly.FetiProblem` minus the dense
    K_blocks array; ``floating`` is required (at this scale the nullspace is
    analytic — constant modes or rigid body modes — exactly as the reference
    examples do, feti/ex71.c:331-339; there is no O(nl^3) eigendecomposition
    fallback)."""

    K_blocks: List[Any]  # ns scipy sparse (nl, nl) matrices
    b_loc: np.ndarray  # (ns, nl)
    l2g: np.ndarray  # (ns, nl) int64, -1 = padding
    floating: np.ndarray  # (ns,) bool
    dirichlet: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, dtype=np.int64)
    )
    dirichlet_values: Optional[np.ndarray] = None
    dirichlet_numtype: str = "global_undecomposed"
    #: (ns, nn, dim) nodal coordinates for rigid body modes (elasticity).
    #: Dof layout must be node-major interleaved: dof i of node n is
    #: n*dim + c; padding nodes (all dofs with l2g = -1) are ignored.
    coords: Optional[np.ndarray] = None

    def dirichlet_global(self) -> np.ndarray:
        from .assembly import dirichlet_global_ids

        return dirichlet_global_ids(self.l2g, self.dirichlet, self.dirichlet_numtype)

    @property
    def ns(self) -> int:
        return len(self.K_blocks)

    @property
    def nl(self) -> int:
        return int(self.l2g.shape[1])

    @property
    def n_decomposed(self) -> int:
        return self.ns * self.nl

    @property
    def n_global(self) -> int:
        return int(self.l2g.max()) + 1


def reorder_rcm(prob: SparseFetiProblem) -> SparseFetiProblem:
    """Bandwidth-reducing reorder of every subdomain's LOCAL numbering,
    fused into the problem (K blocks, b_loc, l2g, coords all permuted) so
    downstream operators are built on the permuted numbering and applies
    need no runtime gather.  Identical patterns share one RCM call."""
    import scipy.sparse as sp

    cache: dict = {}
    K_new, b_new = [], prob.b_loc.copy()
    l2g_new = prob.l2g.copy()
    coords_new = prob.coords.copy() if prob.coords is not None else None
    for s, K in enumerate(prob.K_blocks):
        K = sp.csr_matrix(K)
        key = (K.shape, K.nnz, K.indptr.tobytes(), K.indices.tobytes())
        p = cache.get(key)
        if p is None:
            p = cache[key] = rcm_order(K)
        K_new.append(K[p][:, p].tocsr())
        b_new[s] = prob.b_loc[s][p]
        l2g_new[s] = prob.l2g[s][p]
        if coords_new is not None:
            if prob.coords.shape[1] != prob.nl:
                raise NotImplementedError(
                    "reorder_rcm with node-blocked dofs (dof-per-node > 1) "
                    "needs a node-level permutation; reorder before blocking"
                )
            coords_new[s] = prob.coords[s][p]
    return dataclasses.replace(
        prob, K_blocks=K_new, b_loc=b_new, l2g=l2g_new, coords=coords_new
    )


@dataclasses.dataclass
class DirichletElim:
    """Rhs-side record of the Dirichlet-in-Hessian elimination: repeated
    solves with NEW right-hand sides (FetiSolverSparse.solve(b_loc=...))
    must re-apply the same affine rhs transform — lift by -K_orig[:, i] *
    value, then alpha * value on the Dirichlet rows — or the boundary
    conditions are silently violated.  Also carries the ELIMINATED blocks
    so primal defect-correction passes compute their residual against the
    operator that was actually solved (the original singular K would
    inject O(r/alpha) errors at the Dirichlet dofs every pass)."""

    K_elim: List[Any]  # ns csr blocks AFTER elimination
    touched: np.ndarray  # (ns,) bool
    alpha: float
    lift: dict  # s -> (nl,) precomputed K_orig_s @ vvec_s
    fix_idx: dict  # s -> local Dirichlet indices
    fix_val: dict  # s -> alpha * values at those indices

    def apply_b(self, b_loc: np.ndarray) -> np.ndarray:
        b = np.array(b_loc, dtype=np.float64, copy=True)
        for s, idx in self.fix_idx.items():
            b[s] -= self.lift[s]
            b[s, idx] = self.fix_val[s]
        return b

    def eliminated_prob(self, prob: "SparseFetiProblem") -> "SparseFetiProblem":
        """The problem as actually solved: eliminated blocks + transformed
        rhs, Dirichlet set cleared (it lives in the operator now)."""
        return dataclasses.replace(
            prob, K_blocks=self.K_elim, b_loc=self.apply_b(prob.b_loc),
            dirichlet=np.zeros(0, dtype=np.int64), dirichlet_values=None,
        )


def eliminate_dirichlet_in_sparse_blocks(prob: SparseFetiProblem, K_blocks):
    """Sparse-blocks Dirichlet-in-Hessian: for every copy (s, i) of a
    Dirichlet dof, lift the rhs by -K_s[:, i] * value, zero row/column i
    symmetrically, and put alpha = max|diag| (with alpha * value on the
    rhs) on the diagonal — MatZeroRowsColumnsIS semantics
    (qpfeti.c:280-306).  Returns (K_blocks', b_loc', touched, elim) with
    ``touched[s]`` true when block s holds a Dirichlet copy (those blocks
    are non-singular afterwards and are grounded out of the nullspace,
    the classical-FETI R-row zeroing) and ``elim`` a :class:`DirichletElim`
    record replaying the rhs transform on new right-hand sides."""
    import scipy.sparse as sp

    b = prob.b_loc.copy()
    dglob = prob.dirichlet_global()
    dvals = (
        prob.dirichlet_values
        if prob.dirichlet_values is not None
        else np.zeros(len(dglob))
    )
    val_of = dict(zip(dglob.tolist(), np.asarray(dvals).tolist()))
    alpha = max(max(abs(K.diagonal()).max() for K in K_blocks), 1.0)
    touched = np.zeros(prob.ns, dtype=bool)
    K_out = []
    lift, fix_idx, fix_val = {}, {}, {}
    for s, K in enumerate(K_blocks):
        here = np.isin(prob.l2g[s], dglob)
        idx = np.flatnonzero(here)
        if not len(idx):
            K_out.append(K)
            continue
        touched[s] = True
        vvec = np.zeros(prob.nl)
        vvec[idx] = [val_of[int(g)] for g in prob.l2g[s, idx]]
        lift[s] = K @ vvec
        b[s] -= lift[s]
        keep = (~here).astype(K.dtype)
        D = sp.diags(keep)
        K2 = (D @ K @ D).tolil()
        K2[idx, idx] = alpha
        K_out.append(K2.tocsr())
        fix_idx[s] = idx
        fix_val[s] = alpha * vvec[idx]
        b[s, idx] = fix_val[s]
    elim = DirichletElim(K_elim=K_out, touched=touched, alpha=float(alpha),
                         lift=lift, fix_idx=fix_idx, fix_val=fix_val)
    return K_out, b, touched, elim


def assemble_qp_sparse(prob: SparseFetiProblem, opts: FetiOptions = FetiOptions(),
                       NB: Optional[int] = None, kplus_dtype=None,
                       kplus_refine: int = 0, op_dtype=None,
                       BI=None, cI=None, abstract_factors: bool = False):
    """Build the decomposed QP (A = BlockDia stencil, BE = gluing [+ Dirichlet
    rows], R analytic) and the band K+.  Local sizes are padded to a
    multiple of the band block size NB (padding dofs get unit diagonals and
    l2g = -1, invisible to gluing and nullspace).

    ``BI``/``cI`` attach contact inequalities B_I u <= c_I given as a
    :class:`~permon_tpu.core.extension.SubdomainExtension` over the
    UNPADDED (ns, nl) decomposed space (same interface as the dense
    ``feti_solve``); the operator is re-padded to nlp here.

    ``abstract_factors=True`` builds everything EXCEPT the numeric band
    factors: the K+ Dinv/F arrays (and b) become ``jax.ShapeDtypeStruct``
    avatars of the exact production shapes/dtypes.  The result cannot be
    solved — it exists for AOT ``jit(...).lower().compile()`` audits
    (per-device memory, collective census) at shapes too big to
    factorize on this host (scripts/memaudit.py: the 10M-dof north star).

    Returns (qp, kplus, NB, elim) — ``elim`` is the
    :class:`DirichletElim` rhs-transform record when dirichlet_by_B=False
    eliminated Dirichlet dofs into the Hessian, else None."""
    import scipy.sparse as sp

    if opts.throughput:
        raise NotImplementedError(
            "throughput=True (the dense leaf/explicit-inverse iteration, "
            "feti/leaf.py) has no large-path analog: the band K+ keeps its "
            "factors implicit and B/B' already apply as vectorized gather "
            "tables/kernels here — drop the flag, or use feti_solve for "
            "the dense leaf path"
        )
    if not opts.project and BI is None:
        raise NotImplementedError(
            "the large path runs the projected dual pipeline for LINEAR "
            "solves; project=False (SMALXE on the unprojected dual) is a "
            "tutorial-scale option there — use feti_solve.  For CONTACT "
            "(BI given) project=False selects the production SMALBE: the "
            "augmented-Lagrangian outer loop enforces G lam = e itself "
            "(smalxe.c:892-997)"
        )
    if opts.orth_G is not None:
        raise NotImplementedError(
            "orth_G on the large path: the sparse coarse build factors GG' "
            "directly (band Cholesky), which subsumes the orthonormalization "
            "shortcut — use feti_solve for the orth_G parity variants"
        )
    ns, nl = prob.ns, prob.nl
    K_blocks = [sp.csr_matrix(K) for K in prob.K_blocks]
    floating = np.asarray(prob.floating, dtype=bool).copy()
    elim = None
    if not opts.dirichlet_by_B and len(prob.dirichlet):
        # Dirichlet-in-Hessian (classical FETI): symmetric zero-rows-columns
        # with alpha = max|diag| on the diagonal, rhs lifted by -K[:,i]*val,
        # and the touched blocks grounded (their R rows zeroed — here: the
        # block simply has no nullspace columns).  Reference:
        # qpfeti.c:153-312 (MatZeroRowsColumnsIS + R row zeroing).
        K_blocks, b_elim, touched, elim = eliminate_dirichlet_in_sparse_blocks(
            prob, K_blocks
        )
        prob = dataclasses.replace(
            prob, b_loc=b_elim,
            dirichlet=np.zeros(0, dtype=np.int64), dirichlet_values=None,
        )
        floating = floating & ~touched
    bw = max(bandwidth(K) for K in K_blocks)
    if NB is None:
        NB = max(((bw + 1 + 127) // 128) * 128, 128)
    elif bw >= NB:
        raise ValueError(f"bandwidth {bw} >= NB {NB}")
    nb = max((nl + NB - 1) // NB, 1)
    nlp = nb * NB

    # pad the problem to nlp local dofs
    l2g = np.full((ns, nlp), -1, dtype=np.int64)
    l2g[:, :nl] = prob.l2g
    b_loc = np.zeros((ns, nlp))
    b_loc[:, :nl] = prob.b_loc
    probp = dataclasses.replace(prob, l2g=l2g, b_loc=b_loc)

    blocks_coo = []
    cE_parts = []
    row_off = 0
    if opts.dirichlet_by_B and len(prob.dirichlet):
        from .assembly import build_dirichlet_rows

        dr, dc, dv, nd, cvals = build_dirichlet_rows(probp)
        blocks_coo.append((dr + row_off, dc, dv))
        cE_parts.append(cvals)
        row_off += nd
    gr, gc, gv, ng = build_gluing(l2g, opts.gluing, opts.scale)
    blocks_coo.append((gr + row_off, gc, gv))
    cE_parts.append(np.zeros(ng))
    row_off += ng
    rows = np.concatenate([t[0] for t in blocks_coo])
    cols = np.concatenate([t[1] for t in blocks_coo])
    vals = np.concatenate([t[2] for t in blocks_coo])
    # gather-table applies: at this scale the scatter-adds in B/B' cost
    # ~25 ms each on TPU while the per-row fan-in is a small constant —
    # both directions become vectorized gathers (core/extension.py)
    BE = SubdomainExtension.from_coo(
        rows, cols, vals, m=row_off, ns=ns, nl=nlp
    ).with_gather_apply()
    BE = _maybe_sell_gather(BE, opts)
    cE = jnp.asarray(np.concatenate(cE_parts))

    fixed_mask = ~floating
    if opts.nullspace == "rbm":
        assert prob.coords is not None, "rbm nullspace needs prob.coords"
        from .assembly import nullspace_columns_from_blocks

        bases = []
        dim = int(prob.coords.shape[2])
        for s in range(ns):
            if fixed_mask[s]:
                bases.append(np.zeros((nlp, 0)))
                continue
            # ragged decompositions: build the modes from the REAL nodes
            # only (dof layout is node-major interleaved, dof = node*dim+c).
            # Padding rows of coords are meaningless — including them puts
            # nonzero R entries on padding dofs (unit-diagonal in K), which
            # breaks K R = 0 and lets the fixing-dof window select padding
            # dofs whose grounding cannot regularize the block.
            real_dof = prob.l2g[s] >= 0
            node_real = real_dof.reshape(-1, dim).any(axis=1)
            modes = rigid_body_modes(prob.coords[s][node_real])
            pad = np.zeros((nlp, modes.shape[1]))
            didx = (dim * np.flatnonzero(node_real)[:, None]
                    + np.arange(dim)).ravel()
            pad[didx] = modes
            bases.append(pad)
        rr, rc, rv, k = nullspace_columns_from_blocks(bases)
    else:
        bases = None
        rr, rc, rv, k = constant_nullspace_columns(probp, fixed_mask)
    R = Ell.from_scipy(sp.coo_matrix((rv, (rr, rc)), shape=(ns * nlp, k))) if k else None

    # band K+ with fixing-dof regularization per floating block.  The
    # regularization happens on the SPARSE blocks so the same Kreg feeds
    # (a) the scan-major block-tridiagonal factorization (no device-side
    # transpose of the multi-GB factor arrays) and (b) a BlockDia stencil
    # operator used as qp.A and as the refinement operator — O(ndiag*n)
    # memory instead of keeping the dense (NB, NB) blocks alive.
    from ..core.band import gershgorin_max_eig_csr
    from ..core.dia import BlockDia

    fdt = np.dtype(kplus_dtype) if kplus_dtype is not None else np.float64
    # the regularization Kreg = K + rho R_I (R_I'R_I)^{-1} R_I' stays an
    # EXPLICIT rank-k correction (core/dia.RegularizedBlockDia): folding it
    # into the DIA stencil scatters ~kf^2 entries per block over dozens of
    # new diagonal offsets (7 -> 43 observed, 0.9 GB of near-empty planes
    # at 2.2M dofs).  The factor scan injects the correction into each
    # block's fixing window in place (core/band.factor_from_dia_sm); the
    # QP's Hessian — and therefore the lumped dual preconditioner
    # M = B K B' (pc/dual.py) — keeps the ORIGINAL singular K: the
    # rho-sized fixing-dof term would dominate M at the fixing dofs and
    # wreck the preconditioned iteration
    from ..core.band import _fixing_window, fixing_dofs
    from ..core.dia import RegularizedBlockDia

    A = BlockDia.from_scipy_blocks(K_blocks, nlp=nlp, dtype=op_dtype)
    reg = []  # (s, bi, local idx, rho*Q)
    for s in range(ns):
        if fixed_mask[s]:
            continue
        if bases is not None:
            Rb = bases[s][:nl]
        else:
            real = np.flatnonzero(prob.l2g[s] >= 0)
            Rb = np.zeros((nl, 1))
            Rb[real, 0] = 1.0 / np.sqrt(len(real))
        rho = gershgorin_max_eig_csr(K_blocks[s])
        lo, hi = _fixing_window(Rb, NB, nl)
        I = fixing_dofs(Rb, lo=lo, hi=hi)
        RI = Rb[I]
        Q = rho * (RI @ np.linalg.solve(RI.T @ RI, RI.T))
        bwin = int(I[0] // NB)
        assert (I // NB == bwin).all()
        reg.append((s, bwin, I - bwin * NB, Q))
    kfmax = max((len(r[2]) for r in reg), default=1)
    idx_arr = np.zeros((ns, kfmax), dtype=np.int32)
    q_arr = np.zeros((ns, kfmax, kfmax))
    bi_arr = np.zeros(ns, dtype=np.int32)
    for s, bwin, I_loc, Q in reg:
        bi_arr[s] = bwin
        idx_arr[s, : len(I_loc)] = I_loc
        q_arr[s, : len(I_loc), : len(I_loc)] = Q
    Areg = RegularizedBlockDia(
        base=A, idx=jnp.asarray(idx_arr), q=jnp.asarray(q_arr),
        bi=jnp.asarray(bi_arr), NB=NB,
    )
    if abstract_factors:
        # shapes only: the Dinv/F factor arrays at exact production
        # shape/dtype, no numeric factorization (see docstring)
        kplus = BandCholInv(
            Dinv=jax.ShapeDtypeStruct((nb, ns, NB, NB), jnp.dtype(fdt)),
            F=jax.ShapeDtypeStruct((nb, ns, NB, NB), jnp.dtype(fdt)),
            shape=(ns * nlp, ns * nlp),
            op=Areg if kplus_refine else None, refine=kplus_refine,
        )
    else:
        # factor input expanded ON DEVICE from the ~50x-smaller stencil
        # diagonals (already uploaded as the refinement operator) — the
        # host (nb, ns, NB, NB) build + ~3.5 GB tunnel upload was ~320 s
        # of the 1M-dof first solve (core/band.expand_block_tridiag_dia;
        # bit-identical inputs, so factors and counts cannot move)
        kplus = BandCholInv.from_blockdia(
            Areg, NB, dtype=kplus_dtype, refine=kplus_refine,
        )
    b = jnp.asarray(b_loc.reshape(-1))
    # an all-zero cE carries no information: drop it so the pipeline skips
    # homogenize_eq (one A apply + coarse solve) entirely
    cE_arr = np.concatenate(cE_parts)
    qp = QP(A=A, b=b, BE=BE, cE=cE if cE_arr.any() else None, R=R)
    if BI is not None:
        BIp = _maybe_sell_gather(
            BI.replace(nl=nlp).with_gather_apply(), opts
        )
        qp = qp.replace(
            BI=BIp, cI=None if cI is None else jnp.asarray(cI)
        )
    return qp, kplus, NB, elim


#: table-slot count past which the SELL gather kernel pays for its setup
#: (below it the XLA gather is already sub-ms and the scheduling cost is
#: pure overhead; at the 1M-dof north star the primal-major table alone is
#: ~2.25M slots and the kernel removes ~40 ms per F apply)
SELL_GATHER_MIN_SLOTS = 1 << 19


def _maybe_sell_gather(B, opts: FetiOptions):
    """Attach SELL pure-gather plans to an extension operator per
    ``opts.gather_kernel`` (None = auto: single chip + big tables)."""
    if opts.gather_kernel is False or opts.mesh is not None:
        return B
    slots = int(np.prod(B.gBt_rows.shape)) + int(np.prod(B.gB_cols.shape))
    if opts.gather_kernel or slots >= SELL_GATHER_MIN_SLOTS:
        return B.with_sell_gather()
    return B


def _solve_prepared(qp, kplus, opts: FetiOptions, tol: Tolerances,
                    kplus_post=None, pf=None):
    """One dual solve of an assembled large-path QP: dualize (band K+) ->
    [homogenize] -> project -> CG, folded back to the decomposed solution.

    ``kplus_post`` (optional) is a MORE ACCURATE generalized inverse (e.g.
    the same f32 band factors with iterative refinement against an f64
    stencil operator) used only for the post-solve chain — the alpha
    recovery and u = K+(b - B'lam) — where f32 noise is amplified by
    ||K+|| into exactly the rigid-mode offsets that dominate the primal
    error.  The dual CG keeps the cheap unrefined applies (it is
    self-correcting to its tolerance); the accurate applies are paid a
    handful of times, not per iteration."""
    steps = []  # (child, post) pairs of the ACCURATE chain
    dual, post_d = dualize(qp, kplus=kplus, coarse=opts.coarse, pf=pf)
    if kplus_post is not None:
        dual_a, post_d = dualize(qp, kplus=kplus_post, coarse=opts.coarse,
                                 pf=dual.pf)
    else:
        dual_a = dual
    steps.append((dual_a, post_d))
    cur, cur_a = dual, dual_a
    if cur.cE is not None:
        cur, _ = homogenize_eq(cur)
        cur_a, post_h = homogenize_eq(cur_a)
        steps.append((cur_a, post_h))

    if not opts.project:
        # SMALBE proper (contact; assemble_qp_sparse rejects the linear
        # case): no coarse projector at all — the semi-monotonic augmented
        # Lagrangian enforces G lam = 0 itself while MPRGP handles the box,
        # Dostal's production contact algorithm and the reference's
        # -project 0 pipeline (smalxe.c:892-997).  Unlike the projected
        # variant, ||G lam|| is driven by the OUTER loop, so the M1/rho/eta
        # adaptation actually iterates at scale.
        from ..solvers.smalxe import smalxe

        sm = opts.smalxe
        res = jax.jit(lambda q: smalxe(q, opts=sm, tol=tol))(cur)
        sol = compose(steps)(
            Solution(x=res.x, Bt_lambda=getattr(res, "Bt_lambda", None))
        )
        return sol, res, dual

    pc_op = None
    if opts.pc_dual == "lumped" and qp.box is None and qp.BI is None:
        # contact solves take the SMALXE/MPRGP branch below, which runs
        # unpreconditioned (consistent with the dense path and the
        # reference's MPGP); building the lumped operator would be a
        # silent no-op — skip it and say so
        from ..pc.dual import PCDual

        pc_op = PCDual.create(qp.BE, qp.A, "lumped")
    elif opts.pc_dual == "lumped":
        from ..sys import tracing

        tracing.info("pc_dual='lumped' ignored for contact: the MPRGP inner "
                     "solver runs unpreconditioned (qps/impls/mpgp)")

    # the dual CG runs as ONE jitted executable with the QP (and its
    # multi-GB K+ factor arrays) passed as ARGUMENTS: a closed-over device
    # array is lowered as a CONSTANT baked into the executable — at the
    # 1M-dof scale that ships ~7 GB through every while_loop compile (and
    # the tunnel), observed as 400-2200 s "factorization" times.
    if cur.BE is None:
        if pc_op is None:
            res = jax.jit(lambda q: cg(q, tol=tol))(cur)
        else:
            res = jax.jit(lambda q, pc: cg(q, tol=tol, precond=pc.mv))(
                cur, pc_op
            )
    else:
        pf_holder = cur
        cur, _ = enforce_eq_by_projector(cur)
        _, post_p = enforce_eq_by_projector(cur_a)
        steps.append((cur, post_p))
        if cur.box is not None:
            # contact at scale: box constraints survive into the projected
            # dual — SMALXE (SMALBE) outer loop with MPRGP inner, the
            # reference's -project 1 contact pipeline (smalxe.c:892-997).
            # The augmented term rho G'G actively controls im(P) drift, so
            # the per-iteration reprojection of the CG path is not needed.
            from ..solvers.smalxe import smalxe

            sm = opts.smalxe
            res = jax.jit(lambda q: smalxe(q, opts=sm, tol=tol))(cur)
            sol = compose(steps)(
                Solution(x=res.x, Bt_lambda=getattr(res, "Bt_lambda", None))
            )
            return sol, res, dual
        # FULL reprojection — w = P r EVERY iteration, the reference's PCPG
        # recurrence (pcpg.c:51-134).  With low-precision K+ applies the
        # recursive residual slowly leaks out of im(P) (observed on-chip:
        # f32 factors + the TPU's float-float f64 stall at ~4e-3 relative
        # and then blow up); the per-iteration coarse solve (kc x kc
        # triangular, microseconds) removes the leak unconditionally.
        if pc_op is None:
            res = jax.jit(
                lambda q, pf: cg(q, tol=tol, project=pf.apply_p)
            )(cur, pf_holder.pf)
        else:
            # the preconditioner rides inside the same jitted executable,
            # passed as a pytree ARGUMENT like the QP (see above: a
            # closed-over operator would bake its arrays into the
            # executable as constants)
            res = jax.jit(
                lambda q, pf, pc: cg(q, tol=tol, precond=pc.mv,
                                     project=pf.apply_p)
            )(cur, pf_holder.pf, pc_op)
    sol = compose(steps)(Solution(x=res.x))
    return sol, res, dual


def feti_solve_sparse(
    prob: SparseFetiProblem,
    opts: FetiOptions = FetiOptions(),
    tol: Tolerances = Tolerances(),
    NB: Optional[int] = None,
    kplus_dtype=None,
    kplus_refine: int = 0,
    op_dtype=None,
    primal_refine: int = 0,
    BI=None,
    cI=None,
) -> FetiResult:
    """TFETI solve on sparse subdomain blocks: dualize (band K+) ->
    homogenize -> project -> CG, then fold back and assemble the global
    solution — the KSPFETI facade of the large path.

    ``primal_refine`` > 0 runs that many f64 DEFECT-CORRECTION passes over
    the whole FETI solve: the residual of the assembled system is computed
    on host in f64 from the original sparse blocks, re-decomposed, and
    solved with the SAME factorizations (band K+, coarse GG') for a
    correction.  An f32 dual solve limits the primal accuracy to roughly
    ||K+|| * f32eps (~1e-3 relative on a 3-D Poisson box); each correction
    pass multiplies the error by that same factor, so f32 factors + 1-2
    passes deliver f64-grade solutions at half the factor memory — the
    classical mixed-precision direct-solve recipe at the level of the full
    TFETI pipeline (SURVEY section 7 item 7)."""
    import scipy.sparse as sp

    from ..core.detred import deterministic_mode

    if BI is not None and primal_refine:
        raise ValueError(
            "primal_refine assumes a LINEAR solve; with contact "
            "inequalities the defect correction is invalid — use f64 "
            "factors or kplus_refine instead"
        )
    _enable_cache()
    with deterministic_mode(opts.deterministic):
        return _feti_solve_sparse_body(
            prob, opts, tol, NB, kplus_dtype, kplus_refine, op_dtype,
            primal_refine, BI, cI,
        )


def _enable_cache():
    """Persistent compilation cache for the large-path executables (the
    whole point of the cache — see permon_tpu.enable_compilation_cache)."""
    from .. import enable_compilation_cache

    enable_compilation_cache()


def _feti_solve_sparse_body(
    prob, opts, tol, NB, kplus_dtype, kplus_refine, op_dtype, primal_refine,
    BI=None, cI=None,
) -> FetiResult:
    qp, kplus, NB, elim = assemble_qp_sparse(
        prob, opts, NB=NB, kplus_dtype=kplus_dtype, kplus_refine=kplus_refine,
        op_dtype=op_dtype, BI=BI, cI=cI,
    )
    if elim is not None:
        # defect-correction passes must see the ELIMINATED system (the one
        # the factors solve), or each pass injects O(r/alpha) errors at the
        # Dirichlet dofs (advisor r4)
        prob = elim.eliminated_prob(prob)
    # low-precision factors: the hot dual CG runs UNREFINED applies, the
    # refined K+ (same factor arrays, zero extra memory) is reserved for
    # the post-solve chain where its accuracy actually shows up
    kplus_post = None
    if kplus.refine and kplus.op is not None:
        kplus_post = kplus
        kplus = kplus.replace(refine=0)
    if opts.mesh is not None:
        from ..parallel.dist import shard_qp_sparse

        qp, kplus, kplus_post = shard_qp_sparse(
            qp, kplus, opts.mesh, kplus_post=kplus_post
        )
    # honor the mesh/redundancy coarse layout on the function path too
    pf = build_sparse_pf(qp, opts) if (
        opts.mesh is not None and opts.qppf_redundancy
    ) else None
    return _run_prepared_sparse(
        prob, opts, tol, qp, kplus, kplus_post, primal_refine, pf=pf
    )


def _primal_defect_rhs(prob, K_csr, x_global, nlp):
    """f64 host residual of the assembled system in decomposed, D-split,
    padded form: r_loc[s] = b_loc[s] - K_s (x_global at s's dofs); the
    copy-sum equals b_global - A_global x_global for a conforming
    decomposition, and the multiplicity re-split removes the O(B'lam)
    interface components that cancel only in the copy-sum."""
    from .assembly import decompose_rhs_by_multiplicity

    pad = np.asarray(prob.l2g < 0)
    u_lift = np.where(pad, 0.0, x_global[np.maximum(prob.l2g, 0)])
    r_loc = prob.b_loc - np.stack(
        [K_csr[s] @ u_lift[s] for s in range(prob.ns)]
    )
    r_loc[pad] = 0.0
    r_loc = decompose_rhs_by_multiplicity(r_loc, prob.l2g)
    r_pad = np.zeros((prob.ns, nlp))
    r_pad[:, : prob.nl] = r_loc
    return r_pad.reshape(-1), u_lift


def _run_prepared_sparse(
    prob, opts, tol, qp, kplus, kplus_post, primal_refine, pf=None
) -> FetiResult:
    """One (or 1 + primal_refine) dual solves of an already-assembled and
    factorized large-path problem; ``pf`` reuses a coarse GG' factorization
    from an earlier solve (the QPReusedCP path at scale)."""
    import scipy.sparse as sp

    sol, res, dual = _solve_prepared(qp, kplus, opts, tol,
                                     kplus_post=kplus_post, pf=pf)

    from .solve import assemble_global_mean

    nlp = qp.BE.nl
    u = np.asarray(sol.x).reshape(prob.ns, nlp)
    x_global = assemble_global_mean(u[:, : prob.nl], prob.l2g, prob.n_global)

    if primal_refine:
        K_csr = [sp.csr_matrix(K) for K in prob.K_blocks]
    for _ in range(primal_refine):
        r_flat, u_lift = _primal_defect_rhs(prob, K_csr, x_global, nlp)
        qp_r = qp.replace(b=jnp.asarray(r_flat))
        if qp.cE is not None:
            # the correction must close the remaining constraint gap too:
            # BE dx = cE - BE u  (u = consistent lift, so gluing rows of
            # BE u vanish and only Dirichlet rows contribute)
            u_pad = np.zeros((prob.ns, nlp))
            u_pad[:, : prob.nl] = u_lift
            cE_r = qp.cE - qp.BE.mv(jnp.asarray(u_pad.reshape(-1)))
            qp_r = qp_r.replace(cE=cE_r)
        sol_r, res, dual = _solve_prepared(qp_r, kplus, opts, tol,
                                           kplus_post=kplus_post,
                                           pf=dual.pf)
        du = np.asarray(sol_r.x).reshape(prob.ns, nlp)
        x_global = x_global + assemble_global_mean(
            du[:, : prob.nl], prob.l2g, prob.n_global
        )

    return FetiResult(
        x_global=x_global, u_decomposed=sol.x, solution=sol, result=res,
        qp=qp, dual_qp=dual,
    )


@struct.dataclass
class BlockCoarse(LinearOperator):
    """Coarse operator G = R'B' exploiting the BLOCK-DIAGONAL structure of
    the nullspace R (<= kf columns per subdomain, kf = 6 for 3-D rigid
    body modes): G v = per-block fixed-tree contractions of R_s against
    the primal image B'v, G'w = B(R w) — no (k, m) array is ever formed.

    Exists for the LARGE-k coarse regime (k*m past the dense-G cutoff,
    qp/transforms.DENSE_G_ELEMENTS): the dense G of the 1.18M-dof
    elasticity capture is ~1.1 GB and XLA's layout copies of it inside the
    SMALXE while-loop overflowed HBM by 3 GB, while the generic lazy
    G = R'(B' .) routes through an Ell scatter measured at ~400 ms per
    apply.  This operator costs one extra B/B' pair per projector
    application plus O(ns*nlp*kf) flops on the MXU, with ~70 MB of temps.
    Reference: the implicit coarse-problem action of qppf.c:610-645 with
    MATEXTENSION G (extension.c:476-540)."""

    Rb: jax.Array  # (ns, nlp, kf) f64 block nullspace columns, zero-padded
    cols: jax.Array  # (ns, kf) int32 global coarse column ids, pad -> k
    B: Any  # extension operator (m, ns*nlp)
    k: int = struct.field(pytree_node=False)

    @property
    def shape(self):
        return (self.k, self.B.shape[0])

    def mv(self, v):
        from ..core.detred import det_sum

        ns, nlp, kf = self.Rb.shape
        w = self.B.rmv(v).reshape(ns, nlp).astype(self.Rb.dtype)
        # fixed-tree contraction over the local dofs (f64 dot lowers
        # sequentially on TPU; the tree is bandwidth-bound + deterministic)
        s = det_sum(self.Rb * w[:, :, None], axis=1)  # (ns, kf)
        out = jnp.zeros(self.k + 1, s.dtype).at[self.cols.reshape(-1)].add(
            s.reshape(-1)
        )
        return out[: self.k].astype(v.dtype)

    def rmv(self, w):
        ns, nlp, kf = self.Rb.shape
        wb = jnp.concatenate(
            [w.astype(self.Rb.dtype), jnp.zeros(1, self.Rb.dtype)]
        )[self.cols]  # (ns, kf)
        y = (self.Rb * wb[:, None, :]).sum(-1)  # kf <= 6 adds: exact order
        return self.B.mv(y.reshape(-1)).astype(w.dtype)


def _block_shape(B):
    """(ns, nl) of an extension operator, looking through VStack wrappers
    (contact stacks [B_gluing; B_obstacle] over the same primal space)."""
    if hasattr(B, "ns") and hasattr(B, "nl"):
        return B.ns, B.nl
    if hasattr(B, "ops") and B.ops:
        return _block_shape(B.ops[0])
    return None


def block_coarse_from_R(R, B):
    """Host build of :class:`BlockCoarse` from the block-diagonal Ell R:
    each coarse column's support lies inside one subdomain's row block.
    Returns None when R or B lack the required structure."""
    import scipy.sparse as sp

    from ..qp.sparse_rows import to_scipy

    shp = _block_shape(B)
    if shp is None:
        return None
    ns, nlp = shp
    if ns * nlp != B.shape[1]:
        return None
    R_sp = to_scipy(R)
    if R_sp is None:
        return None
    k = R_sp.shape[1]
    Rc = sp.csc_matrix(R_sp)
    owner = np.full(k, -1, dtype=np.int64)
    for j in range(k):
        rows = Rc.indices[Rc.indptr[j]:Rc.indptr[j + 1]]
        if len(rows) == 0:
            return None
        s = int(rows[0]) // nlp
        if int(rows[-1]) // nlp != s:
            return None  # not block-diagonal: fall back
        owner[j] = s
    kf = max(int(np.bincount(owner, minlength=ns).max()), 1)
    Rb = np.zeros((ns, nlp, kf))
    cols = np.full((ns, kf), k, dtype=np.int32)
    slot = np.zeros(ns, dtype=np.int64)
    for j in range(k):
        s = owner[j]
        t = slot[s]
        cols[s, t] = j
        Rb[s, :, t] = R_sp[s * nlp:(s + 1) * nlp, j].toarray().ravel()
        slot[s] += 1
    return BlockCoarse(Rb=jnp.asarray(Rb), cols=jnp.asarray(cols), B=B, k=k)


def build_sparse_pf(qp, opts: FetiOptions):
    """Coarse projector for the sparse-coarse regime (host sparse G = R'B'
    + sparse Gram, qp/transforms._sparse_coarse), honoring the mesh layout:
    replicated coarse by default, redundancy-group distributed factor with
    ``opts.qppf_redundancy`` (parallel/coarse.py; -qppf_redundancy,
    qppf.c:182-333).  Returns None outside the sparse-coarse regime (small
    problems keep the dense device Gram the parity oracles were pinned
    with)."""
    from ..qp.projector import Projector
    from ..qp.transforms import SPARSE_COARSE_THRESHOLD, _sparse_coarse

    if qp.R is None or qp.R.shape[1] == 0 or opts.coarse == "dense":
        return None
    from ..core.linop import VStack as _VStack

    B = qp.BE if qp.BI is None else _VStack((qp.BE, qp.BI))
    k = qp.R.shape[1]
    big = k * (qp.R.shape[0] + B.shape[0]) > SPARSE_COARSE_THRESHOLD
    if not (big or opts.coarse == "sparse"):
        return None
    sc = _sparse_coarse(qp.R, B)
    if sc is None:
        return None
    G, gram = sc
    mesh = opts.mesh
    if mesh is not None and opts.qppf_redundancy:
        from ..parallel.coarse import RedundantCoarse
        from ..parallel.dist import replicate_projector

        cp = RedundantCoarse.create(gram, mesh, axis=mesh.axis_names[-1])
        return replicate_projector(
            Projector(G=G, ggt_chol=None, orthonormal_rows=False,
                      cp_dist=cp),
            mesh,
        )
    if mesh is not None:
        from ..parallel.dist import replicate_projector

        return replicate_projector(Projector.create(G, gram=gram), mesh)
    return Projector.create(G, gram=gram)


def make_fast_solve_fn(opts: FetiOptions, tol: Tolerances, nref: int, ng: int):
    """The one-dispatch warm-solve function (jit it): dual solve + post
    chain + global reassembly + ``nref`` f64 primal defect-correction
    passes, everything passed as ARGUMENTS (never baked as constants).
    Factored out of :class:`FetiSolverSparse` so AOT audits can lower the
    exact production executable at arbitrary shapes (scripts/memaudit.py).

    The factors enter ONCE: ``kplus_lean`` carries the Dinv/F arrays with
    the refinement operator stripped to the small rank-k correction
    ``corr`` (base=None); the cheap unrefined K+ and the accurate
    refined K+ are derived INSIDE the trace against qp.A.  Passing the
    split pair as separate jit parameters declared the multi-GB factor
    buffers (and the stencil, via both qp.A and op.base) twice — the
    runtime's capacity check summed 18.05 GB of declared arguments
    against ~10 GB of distinct buffers and refused the 2.2M-dof
    executable."""

    def run(qp, kplus_lean, corr, pf, b, l2g_c, real, counts_g):
        # l2g_c: (ns*nlp,) int32 global dof per copy, padding -> ng
        # real: (ns*nlp,) bool; counts_g: (ng,) f64 multiplicities
        if corr is not None and kplus_lean.refine:
            kplus_post = kplus_lean.replace(op=corr.replace(base=qp.A))
            kplus = kplus_lean.replace(refine=0, op=None)
        else:
            kplus, kplus_post = kplus_lean, None

        def solve_chain(bb):
            sol, res, _ = _solve_prepared(
                qp.replace(b=bb), kplus, opts, tol,
                kplus_post=kplus_post, pf=pf,
            )
            return sol.x, res

        def assemble(xd):
            xg = jnp.zeros(ng + 1, xd.dtype).at[l2g_c].add(
                jnp.where(real, xd, 0.0)
            )
            return xg[:ng] / counts_g

        x_dec, res = solve_chain(b)
        xg = assemble(x_dec)
        for _ in range(nref):
            u_lift = jnp.where(
                real,
                jnp.concatenate([xg, jnp.zeros(1, xg.dtype)])[l2g_c],
                0.0,
            )
            r = jnp.where(real, b - qp.A.mv(u_lift), 0.0)
            # sum the copies (= assembled residual) and re-split
            # with D = 1/multiplicity (decompose_rhs_by_multiplicity)
            rg = jnp.zeros(ng + 1, r.dtype).at[l2g_c].add(r)
            r_dec = jnp.where(
                real,
                rg[l2g_c]
                / jnp.concatenate([counts_g, jnp.ones(1)])[l2g_c],
                0.0,
            )
            dx, res = solve_chain(r_dec)
            xg = xg + assemble(dx)
        # return the full result pytree (CGResult for linear solves,
        # SMALXEResult for contact) so outer/inner counters survive
        return (xg, x_dec, res)

    return run


class FetiSolverSparse:
    """Reusable large-path TFETI solver — the QPTFetiPrepareReuseCP analog
    at scale (qptransform.c:1213-1251): assembly, the band K+ factorization
    and the coarse GG' factorization happen ONCE; repeated solves with new
    right-hand sides (time stepping, contact outer loops) reuse every
    factor and every cached executable.

    >>> solver = FetiSolverSparse(prob, opts, kplus_dtype=jnp.float32,
    ...                           kplus_refine=2, primal_refine=1)
    >>> r1 = solver.solve()             # factorizes once
    >>> r2 = solver.solve(b_loc=new_b)  # marginal cost: the dual CG only
    """

    def __init__(self, prob: SparseFetiProblem,
                 opts: FetiOptions = FetiOptions(), NB: Optional[int] = None,
                 kplus_dtype=None, kplus_refine: int = 0, op_dtype=None,
                 primal_refine: int = 0, BI=None, cI=None):
        if BI is not None and primal_refine:
            raise ValueError(
                "primal_refine assumes a LINEAR solve; with contact "
                "inequalities use f64 factors or kplus_refine instead"
            )
        _enable_cache()
        self.opts = opts
        self.primal_refine = primal_refine
        self.qp, kplus, self.NB, self._elim = assemble_qp_sparse(
            prob, opts, NB=NB, kplus_dtype=kplus_dtype,
            kplus_refine=kplus_refine, op_dtype=op_dtype, BI=BI, cI=cI,
        )
        # keep the problem AS SOLVED: with Dirichlet-in-Hessian the stored
        # blocks/rhs are the eliminated ones, so defect-correction residuals
        # and re-solve rhs handling stay consistent with the factors
        self.prob = prob if self._elim is None else self._elim.eliminated_prob(prob)
        self.kplus_post = None
        if kplus.refine and kplus.op is not None:
            self.kplus_post = kplus
            kplus = kplus.replace(refine=0)
        if opts.mesh is not None:
            from ..parallel.dist import shard_qp_sparse

            self.qp, kplus, self.kplus_post = shard_qp_sparse(
                self.qp, kplus, opts.mesh, kplus_post=self.kplus_post
            )
        self.kplus = kplus
        self._pf = None
        self._fast_cache: dict = {}
        self._K_csr = None

    def _ensure_pf(self):
        """Build the coarse projector DIRECTLY (host sparse G = R'B' + Gram,
        qp/transforms._sparse_coarse) so even the FIRST solve rides the
        one-dispatch fast executable.  The eager transform chain that
        otherwise builds pf costs hundreds of seconds of per-op dispatch +
        compile over the axon tunnel at the 1M-dof scale (measured 243 s for
        the dualize step alone).  Gated to the sparse-coarse regime so the
        small-problem parity paths keep their original (dense device Gram)
        first-solve numbers."""
        if self._pf is None:
            self._pf = build_sparse_pf(self.qp, self.opts)

    def solve(self, b_loc=None, tol: Tolerances = Tolerances()) -> FetiResult:
        from ..core.detred import deterministic_mode
        from ..sys import tracing

        prob, qp = self.prob, self.qp
        self._ensure_pf()
        if b_loc is not None:
            b_loc = np.asarray(b_loc)
            if self._elim is not None:
                # re-apply the Dirichlet-in-Hessian rhs transform (lift +
                # alpha*value rows) — a raw rhs against the eliminated
                # factors silently violates the boundary conditions
                b_loc = self._elim.apply_b(b_loc)
            prob = dataclasses.replace(prob, b_loc=b_loc)
            nlp = qp.BE.nl
            b_pad = np.zeros((prob.ns, nlp))
            b_pad[:, : prob.nl] = prob.b_loc
            b_new = jnp.asarray(b_pad.reshape(-1))
            if self.opts.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                b_new = jax.device_put(
                    b_new,
                    NamedSharding(self.opts.mesh,
                                  P(tuple(self.opts.mesh.axis_names))),
                )
            qp = qp.replace(b=b_new)
        use_fast = (
            self._pf is not None
            and qp.cE is None
            and self.opts.pc_dual in ("none", "lumped")
            and not tracing.debug_enabled
        )
        with deterministic_mode(self.opts.deterministic):
            if use_fast:
                return self._solve_fast(prob, qp, tol)
            res = _run_prepared_sparse(
                prob, self.opts, tol, qp, self.kplus, self.kplus_post,
                self.primal_refine, pf=self._pf,
            )
        if self._pf is None and res.dual_qp is not None:
            self._pf = res.dual_qp.pf
        return res

    # -- repeated-solve fast path -----------------------------------------
    def _fast_fn(self, tol: Tolerances):
        """One jitted executable for the ENTIRE warm solve: dual solve +
        post chain + global reassembly + every f64 primal defect-correction
        pass (dualize with the reused pf skips all host work).  The eager
        transform chain costs one dispatch round-trip per op — over the
        axon tunnel that dominates a 1M-dof re-solve — and the previous
        host-side refine loop added four ~9 MB tunnel transfers plus host
        scipy SpMVs per solve; this is one dispatch and one ~8 MB fetch.
        The defect pass reuses qp.A (the ORIGINAL singular K stencil, not
        the regularized one — see assemble_qp_sparse) for the on-device
        residual.  Only the solution and CG counters cross the jit
        boundary, never the factor arrays."""
        key = (tol.rtol, tol.atol, tol.divtol, tol.max_it)
        fn = self._fast_cache.get(key)
        if fn is None:
            fn = jax.jit(make_fast_solve_fn(
                self.opts, tol, self.primal_refine, self.prob.n_global
            ))
            self._fast_cache[key] = fn
        return fn

    def _reassembly_tables(self, prob, nlp):
        """Device-side reassembly index tables (cached): clamped global ids
        per padded copy (padding -> n_global), the real-dof mask, and the
        global multiplicity counts."""
        if getattr(self, "_l2g_c", None) is None:
            ng = prob.n_global
            l2g_pad = np.full((prob.ns, nlp), -1, dtype=np.int64)
            l2g_pad[:, : prob.nl] = prob.l2g
            flat = l2g_pad.reshape(-1)
            real = flat >= 0
            counts = np.bincount(flat[real], minlength=ng).astype(np.float64)
            self._l2g_c = jnp.asarray(
                np.where(real, flat, ng).astype(np.int32)
            )
            self._real_mask = jnp.asarray(real)
            self._counts_g = jnp.asarray(np.maximum(counts, 1.0))
            if self.opts.mesh is not None:
                # primal-shaped tables shard with the subdomains; the global
                # counts replicate (the reassembly scatter-add psums)
                from jax.sharding import NamedSharding, PartitionSpec as P

                mesh = self.opts.mesh
                axes = tuple(mesh.axis_names)
                put = lambda x, *s: jax.device_put(
                    x, NamedSharding(mesh, P(*s))
                )
                self._l2g_c = put(self._l2g_c, axes)
                self._real_mask = put(self._real_mask, axes)
                self._counts_g = put(self._counts_g)
        return self._l2g_c, self._real_mask, self._counts_g

    def fast_args(self, qp=None):
        """(kplus_lean, corr) for :func:`make_fast_solve_fn`: the factor
        arrays once, the refinement operator reduced to its rank-k
        correction with the stencil base stripped (rebuilt from qp.A
        inside the trace) — no multi-GB buffer is declared twice."""
        from ..core.dia import RegularizedBlockDia

        kfull = self.kplus_post if self.kplus_post is not None else self.kplus
        corr = None
        if kfull.op is not None:
            assert isinstance(kfull.op, RegularizedBlockDia), type(kfull.op)
            corr = kfull.op.replace(base=None)
        return kfull.replace(op=None), corr

    def _solve_fast(self, prob, qp, tol: Tolerances) -> FetiResult:
        nlp = qp.BE.nl
        fn = self._fast_fn(tol)
        l2g_c, real, counts_g = self._reassembly_tables(prob, nlp)
        kplus_lean, corr = self.fast_args()
        x_global, x_dec, res = fn(
            qp, kplus_lean, corr, self._pf, qp.b,
            l2g_c, real, counts_g,
        )
        return FetiResult(
            x_global=np.asarray(x_global), u_decomposed=x_dec,
            solution=Solution(x=x_dec), result=res, qp=qp, dual_qp=None,
        )
