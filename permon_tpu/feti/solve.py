"""TFETI solve facade — the KSPFETI analog.

Chains: decomposed QP (block-diagonal K, gluing+Dirichlet equality
constraints, per-subdomain nullspace R)
  -> dualize (K+ = batched per-block regularized Cholesky, G = R'B')
  -> homogenize_eq
  -> enforce_eq_by_projector (projected CG; the default -feti pipeline,
     QPTFetiPrepare, qptransform.c:1200-1210)  OR
  -> SMALXE on (F, G) when project=False (the -project 0 variant)
then folds post-solves back to the decomposed primal solution and assembles
the global solution by averaging dof copies (QPTMatISToBlockDiag post-solve,
qptransform.c:1905-1981).

The dual preconditioner (reference: PCDUAL, src/pc/impls/dual/pcdual.c):
'none' or 'lumped' = B K B' applied as y = B(K(B'x)), wrapped in the
projector exactly as PCCreate_QPTEnforceEqByProjector does.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..core.blockdiag import BlockColumns, BlockDiagDense
from ..core.convergence import Tolerances
from ..core.extension import SubdomainExtension
from ..core.factor import BlockDiagCholInv
from ..core.linop import Ell
from ..qp.qp import QP
from ..qp.transforms import (
    Solution,
    compose,
    dualize,
    enforce_eq_by_projector,
    homogenize_eq,
    orthonormalize_eq,
)
from ..solvers.cg import cg
from ..solvers.smalxe import SMALXEOptions, smalxe
from .assembly import (
    FetiProblem,
    build_dirichlet_rows,
    build_gluing,
    constant_nullspace_columns,
    eliminate_dirichlet_in_blocks,
)


@dataclasses.dataclass
class FetiOptions:
    gluing: str = "full"  # QPFetiSetUp default (qpfeti.c:322)
    scale: bool = True  # 1/sqrt(multiplicity) scaling (-SCALE_ON default)
    dirichlet_by_B: bool = True  # enforce Dirichlet by constraint rows (TFETI)
    project: bool = True  # projector pipeline vs SMALXE (-project)
    pc_dual: str = "none"  # 'none' | 'lumped'
    #: None | 'gs' | 'gs_lingen' | 'cholesky' | 'implicit' | 'inexact'
    #: (-dual_qp_E_orth_type; 'gslingen' in the reference's MatOrthTypes[])
    orth_G: Optional[str] = None
    #: nullspace source: 'constant' (analytic constant modes, Poisson),
    #: 'numeric' (per-block eigendecomposition, the MUMPS null-pivot analog),
    #: 'rbm' (rigid body modes from prob.coords, elasticity)
    nullspace: str = "constant"
    #: production/throughput mode: explicit per-block K+ inverses (batched
    #: GEMV instead of triangular solves) and dense condensed extension
    #: blocks (batched einsum instead of per-nnz gathers) — ~6x faster dual
    #: applies on TPU at the cost of a denser setup; the f64 parity tests
    #: keep the triangular-solve path (default)
    throughput: bool = False
    #: precision policy (core/precision.py): 'f64' (default, exact parity);
    #: 'mixed' — on the row-space path f32 OPERATOR storage behind f64
    #: vectors (exact iteration parity), on the throughput/leaf path the
    #: whole-QP policy: f32 leaf STATE with promoted fixed-tree f64 dots
    #: (fast; counts shift by a few, pinned in tests/test_precision.py);
    #: 'f32'.  The coarse projector stays f64 in every policy so dual
    #: iterates remain in the constraint null space to full accuracy.
    precision: str = "f64"
    #: bucket heterogeneous subdomain sizes in the K+ factorization
    #: (core/factor.py:RaggedBlockDiagCholInv) instead of padding to nl_max
    ragged_kplus: bool = False
    #: a jax.sharding.Mesh: with throughput=True, the leaf-space dual
    #: iteration runs the ppermute-overlapped boundary exchange over it
    #: (parallel/overlap.py — the PetscSF Begin/End comm/compute overlap)
    mesh: Optional[Any] = None
    #: dual coarse-side build (qp.transforms.dualize): 'auto' switches to the
    #: sparse G = R'B' + host sparse GG' construction past
    #: SPARSE_COARSE_THRESHOLD dense elements; 'dense'/'sparse' force a path
    coarse: str = "auto"
    #: regularization rho_s source (make_blockdiag_kplus): 'auto' keeps the
    #: exact batched eigvalsh at parity scale and switches to the vectorized
    #: Gershgorin bound for ns >= 128 projected solves (where the pipeline
    #: is K+-invariant); 'exact'/'gershgorin' force a choice
    rho_mode: str = "auto"

    #: pin every solver reduction (dots, norms, the GG' Gram) to a fixed
    #: binary tree — bit-identical iteration counts on any device count
    #: (core/detred.py).  None inherits the process-global mode; True/False
    #: scope the flag to THIS solve's trace (the per-solve switch the
    #: global set_deterministic cannot provide)
    deterministic: Optional[bool] = None
    #: with a two-axis ('host', 'sd') mesh: run the dual coarse solve on
    #: redundancy groups — the GG' Cholesky factor sharded over the
    #: within-group axis, one distributed copy per host group
    #: (parallel/coarse.py; -dual_qppf_redundancy, qppf.c:182-183).
    #: Results match the replicated factor to roundoff.
    qppf_redundancy: bool = False
    #: large path, single chip: run the B/B' gather tables through the
    #: SELL-scheduled in-register gather kernel (core/sell.gather_plan) —
    #: bit-identical results, ~serialized-gather -> HBM-stream speed.
    #: None = auto (on when the tables are big enough to matter and no
    #: mesh is set; the sharded path keeps plain tables), True/False force.
    gather_kernel: Optional[bool] = None

    def resolved_rho_mode(self, ns: int) -> str:
        if self.rho_mode != "auto":
            return self.rho_mode
        return "gershgorin" if (self.project and ns >= 128) else "exact"
    smalxe: SMALXEOptions = dataclasses.field(default_factory=SMALXEOptions)


@dataclasses.dataclass
class FetiResult:
    x_global: np.ndarray
    u_decomposed: Any
    solution: Solution
    result: Any  # inner solver result (CGResult / SMALXEResult / MPRGPResult)
    qp: QP  # the decomposed primal QP
    dual_qp: QP


def assemble_qp(prob: FetiProblem, opts: FetiOptions = FetiOptions()):
    """Build the decomposed-space QP: A = diag(K_s), BE = [Bd; Bg], R."""
    ns, nl, N = prob.ns, prob.nl, prob.n_decomposed
    K_blocks = prob.K_blocks
    b_loc = prob.b_loc

    blocks_coo = []
    cE_parts = []
    row_off = 0
    if opts.dirichlet_by_B and len(prob.dirichlet):
        dr, dc, dv, nd, cvals = build_dirichlet_rows(prob)
        blocks_coo.append((dr + row_off, dc, dv))
        cE_parts.append(cvals)
        row_off += nd
    elif len(prob.dirichlet):
        K_blocks, b_loc, masks = eliminate_dirichlet_in_blocks(prob)

    gr, gc, gv, ng = build_gluing(prob.l2g, opts.gluing, opts.scale)
    blocks_coo.append((gr + row_off, gc, gv))
    cE_parts.append(np.zeros(ng))
    row_off += ng

    rows = np.concatenate([t[0] for t in blocks_coo])
    cols = np.concatenate([t[1] for t in blocks_coo])
    vals = np.concatenate([t[2] for t in blocks_coo])
    # batched per-subdomain extension form: rmv is communication-free and mv
    # needs a single psum when the subdomain axis is sharded over devices
    BE = SubdomainExtension.from_coo(rows, cols, vals, m=row_off, ns=ns, nl=nl)
    if opts.throughput:
        BE = BE.with_dense_blocks()
    cE = jnp.asarray(np.concatenate(cE_parts))

    # floating subdomains = singular blocks of the FINAL K (the reference
    # learns this from MUMPS null-pivot counts per block, matinv.c:55-195)
    floating = dataclasses.replace(prob, K_blocks=K_blocks).floating_mask()
    fixed_mask = ~floating

    # nullspace: per-block bases R_s -> block-diagonal R (matinv.c:55-195)
    from .assembly import (
        numeric_nullspace_blocks,
        nullspace_columns_from_blocks,
        rigid_body_modes,
    )

    null_bases = None
    if opts.nullspace == "numeric":
        null_bases = numeric_nullspace_blocks(K_blocks, prob.l2g)
        rr, rc, rv, k = nullspace_columns_from_blocks(null_bases)
    elif opts.nullspace == "rbm":
        assert prob.coords is not None, "rbm nullspace needs prob.coords"
        null_bases = []
        for s in range(ns):
            if fixed_mask[s]:
                null_bases.append(np.zeros((nl, 0)))
                continue
            modes = rigid_body_modes(prob.coords[s])
            pad = np.zeros((nl, modes.shape[1]))
            pad[: modes.shape[0], :] = modes
            null_bases.append(pad)
        rr, rc, rv, k = nullspace_columns_from_blocks(null_bases)
    else:
        rr, rc, rv, k = constant_nullspace_columns(prob, fixed_mask)
    R = Ell.from_scipy(sp.coo_matrix((rv, (rr, rc)), shape=(N, k))) if k else None

    A = BlockDiagDense(blocks=jnp.asarray(K_blocks))
    b = jnp.asarray(b_loc.reshape(-1))
    qp = QP(A=A, b=b, BE=BE, cE=cE, R=R)
    return qp, K_blocks, fixed_mask, null_bases


def assemble_global_mean(u: np.ndarray, l2g: np.ndarray, n_global: int) -> np.ndarray:
    """Average the decomposed solution's dof copies into the global vector
    (the MATIS reassembly of QPTMatISToBlockDiag's post-solve,
    qptransform.c:1905-1981) — one flat bincount, no per-subdomain loop."""
    flat = l2g.reshape(-1)
    real = flat >= 0
    ids = flat[real]
    x_global = np.bincount(ids, weights=u.reshape(-1)[real], minlength=n_global)
    counts = np.bincount(ids, minlength=n_global)
    return x_global / np.maximum(counts, 1)


def ragged_sizes(l2g: np.ndarray) -> Optional[np.ndarray]:
    """True per-subdomain sizes when padding (-1 entries) is a trailing
    suffix of every row; None when sizes are uniform or padding is
    interleaved (the uniform batched path handles those)."""
    real = np.asarray(l2g) >= 0
    sizes = real.sum(axis=1)
    if sizes.min() == sizes.max():
        return None
    # the padding must be a suffix for the bucket slicing to be valid
    for s in range(l2g.shape[0]):
        if not np.all(real[s, : sizes[s]]) or np.any(real[s, sizes[s]:]):
            return None
    return sizes


def make_blockdiag_kplus(
    K_blocks: np.ndarray, fixed_mask, prob: FetiProblem, null_bases=None,
    explicit: bool = False, sizes=None, rho_mode: str = "exact",
):
    """Batched per-block regularized Cholesky K+ (the MAT_INV_BLOCKDIAG path
    with MatRegularize, matinv.c:435-590 + permonmatregularize.c).

    rho_s = lambda_max(K_s), Q_s = R_s R_s' from the block's nullspace basis
    (default: the normalized constant mode over real dofs — Poisson).
    ``rho_mode``: 'exact' = batched eigvalsh over the blocks that actually
    get regularized (the committed parity oracles were pinned with it);
    'gershgorin' = vectorized O(ns*nl^2) row-sum bound (matches the large
    path, core/band.py; the projected dual pipeline is invariant to the K+
    regularization so either choice gives the same iteration counts there).

    ``sizes`` (opt-in; e.g. ``ragged_sizes(prob.l2g)`` or
    ``FetiOptions(ragged_kplus=True)``) routes to the bucketed
    :class:`~permon_tpu.core.factor.RaggedBlockDiagCholInv`, which factors
    each size bucket at its true size instead of paying the nl_max padding
    tax (the reference factors per-rank sizes, never padded ones,
    matinv.c:551-575).  Opt-in because the bucketed factorization rounds
    differently from the padded one — f64-parity paths keep the uniform
    batched factor."""
    Kreg = K_blocks.copy()
    if null_bases is not None:
        reg_mask = np.array([b.shape[1] > 0 for b in null_bases])
    elif fixed_mask is not None:
        reg_mask = ~np.asarray(fixed_mask, dtype=bool)
    else:
        reg_mask = np.ones(prob.ns, dtype=bool)
    reg_idx = np.flatnonzero(reg_mask)
    rho_all = np.zeros(prob.ns)
    if len(reg_idx):
        if rho_mode == "gershgorin":
            Kb = np.asarray(K_blocks)[reg_idx]
            rho_all[reg_idx] = np.abs(Kb).sum(axis=2).max(axis=1)
        else:
            # one batched LAPACK call restricted to the regularized blocks
            # (the reference's MatGetMaxEigenvalue per block,
            # permonmatregularize.c)
            rho_all[reg_idx] = np.linalg.eigvalsh(
                np.asarray(K_blocks)[reg_idx]
            )[:, -1]
    for s in reg_idx:
        if null_bases is not None:
            Q = null_bases[s]
        else:
            real = np.flatnonzero(prob.l2g[s] >= 0)
            Q = np.zeros((prob.nl, 1))
            Q[real, 0] = 1.0 / np.sqrt(len(real))
        Kreg[s] = Kreg[s] + float(rho_all[s]) * (Q @ Q.T)
    if sizes is not None:
        from ..core.factor import RaggedBlockDiagCholInv

        return RaggedBlockDiagCholInv.from_blocks(
            jnp.asarray(Kreg), sizes, explicit=explicit
        )
    return BlockDiagCholInv.from_blocks(jnp.asarray(Kreg), explicit=explicit)


class FetiSolver:
    """Reusable TFETI solver — the QPTFetiPrepareReuseCP analog
    (qptransform.c:1213-1251): the assembled constraint operators, the
    batched K+ factorization, and the coarse-problem factorization are
    built once and reused across repeated solves with changing right-hand
    sides (time stepping, contact outer iterations).

    >>> solver = FetiSolver(prob, opts)
    >>> r1 = solver.solve()                      # factorizes once
    >>> r2 = solver.solve(b_loc=new_loads)       # reuses K+, projector
    """

    def __init__(
        self, prob: FetiProblem, opts: FetiOptions = FetiOptions(),
        BI=None, cI=None,
    ):
        self.prob = prob
        self.opts = opts
        self.qp, self._K_blocks, self._fixed_mask, self._null_bases = assemble_qp(prob, opts)
        if BI is not None:
            self.qp = self.qp.replace(
                BI=BI, cI=None if cI is None else jnp.asarray(cI)
            )
        self.kplus = make_blockdiag_kplus(
            self._K_blocks, self._fixed_mask, prob, self._null_bases,
            explicit=opts.throughput,
            sizes=ragged_sizes(prob.l2g) if opts.ragged_kplus else None,
            rho_mode=opts.resolved_rho_mode(prob.ns),
        )

    def solve(self, b_loc=None, tol: Tolerances = Tolerances()) -> "FetiResult":
        prob = self.prob
        if b_loc is not None:
            prob = dataclasses.replace(prob, b_loc=np.asarray(b_loc))
        qp = self.qp
        if b_loc is not None:
            qp = qp.replace(b=jnp.asarray(np.asarray(b_loc).reshape(-1)))
        return _feti_solve_impl(prob, self.opts, tol, qp, self.kplus)

    def save(self, path: str) -> None:
        """Checkpoint the factorized state (utils.checkpoint)."""
        from ..utils.checkpoint import save

        save(path, {"kplus": self.kplus, "qp": self.qp})


def feti_solve(
    prob: FetiProblem,
    opts: FetiOptions = FetiOptions(),
    tol: Tolerances = Tolerances(),
    BI=None,
    cI=None,
) -> FetiResult:
    """``BI``/``cI``: optional decomposed-space inequality constraints
    (BI u <= cI — e.g. a contact obstacle); dualize turns them into the
    dual box lb=0 and the pipeline becomes SMALBE (SMALXE around MPRGP)."""
    qp, K_blocks, fixed_mask, null_bases = assemble_qp(prob, opts)
    if BI is not None:
        qp = qp.replace(BI=BI, cI=None if cI is None else jnp.asarray(cI))
    kplus = make_blockdiag_kplus(
        K_blocks, fixed_mask, prob, null_bases, explicit=opts.throughput,
        sizes=ragged_sizes(prob.l2g) if opts.ragged_kplus else None,
        rho_mode=opts.resolved_rho_mode(prob.ns),
    )
    return _feti_solve_impl(prob, opts, tol, qp, kplus)


def _feti_solve_impl(
    prob: FetiProblem,
    opts: FetiOptions,
    tol: Tolerances,
    qp: QP,
    kplus,
) -> FetiResult:
    from ..core.detred import deterministic_mode

    with deterministic_mode(opts.deterministic):
        return _feti_solve_body(prob, opts, tol, qp, kplus)


def _feti_solve_body(
    prob: FetiProblem,
    opts: FetiOptions,
    tol: Tolerances,
    qp: QP,
    kplus,
) -> FetiResult:

    steps = []
    dual, post_d = dualize(qp, kplus=kplus, coarse=opts.coarse)
    if (
        opts.qppf_redundancy
        and dual.BE is not None
        and opts.mesh is not None
        and len(opts.mesh.axis_names) == 2
    ):
        # redundancy-group coarse solve (-dual_qppf_redundancy): replace the
        # replicated GG' factor by the group-distributed one; every
        # projector/post-solve application goes through it
        from ..parallel.coarse import redundant_projector
        from ..qp.projector import dense_rows

        Gd = np.asarray(dense_rows(dual.BE))
        dual = dual.replace(
            pf=redundant_projector(dual.BE, Gd @ Gd.T, opts.mesh)
        )
    steps.append((dual, post_d))
    cur = dual
    if opts.precision == "mixed":
        # dual-pipeline 'mixed' = f32 OPERATOR STORAGE behind an f64 vector
        # interface: the projected oracles (e.g. feti ex1's 1-iteration
        # convergence to ~1e-16) need f64 dual vectors, while the hot cost —
        # streaming the K+ factors — halves.  The f32-state QP-level policy
        # (qp_with_precision) is for box-QP solvers where vector work
        # dominates.
        from ..core.precision import with_precision as _op_precision

        cur = cur.replace(A=_op_precision(cur.A, "mixed"))
    elif opts.precision != "f64":
        cur = cur.with_precision(opts.precision)

    if opts.orth_G and cur.BE is not None:
        cur, post_o = orthonormalize_eq(cur, opts.orth_G)
        steps.append((cur, post_o))

    if cur.cE is not None:
        cur, post_h = homogenize_eq(cur)
        steps.append((cur, post_h))

    # dual preconditioner (PCDUAL, permon_tpu.pc.dual): lumped = B K B'
    precond = None
    if opts.pc_dual == "lumped":
        from ..pc.dual import PCDual

        A_blocks = BlockDiagDense(blocks=jnp.asarray(prob.K_blocks))
        precond = PCDual.create(qp.BE, A_blocks, "lumped").mv

    # scaled-leaf dual space (feti/leafqp.py): the fast leaf apply opened to
    # EVERY solver — contact SMALXE, lumped-PC projected CG, plain CG — via
    # the sqrt(multiplicity) isometry.  The row-space chain above still
    # provides the post-solves; only the Krylov/active-set iteration moves
    # to leaf space.
    use_leaf = (
        opts.throughput
        and opts.orth_G is None
        and isinstance(qp.BE, SubdomainExtension)
        and (qp.BI is None or isinstance(qp.BI, SubdomainExtension))
        and hasattr(kplus, "explicitly")
    )
    leaf = sls = None
    if use_leaf:
        import dataclasses as _dc

        from ..core.eig import max_eigenvalue
        from ..core.linop import Penalized as _Pen
        from .leafqp import leaf_dual_qp, lumped_pc_leaf

        # the dual operates on the STACKED constraint operator [BE; BI]
        # (gluing+Dirichlet equalities over contact inequalities) — one
        # extension operator, so the whole contact dual lives in leaf space
        B_full = (
            qp.BE if qp.BI is None
            else SubdomainExtension.vstack((qp.BE, qp.BI))
        )
        leaf, sls = leaf_dual_qp(dual, B_full, kplus, mesh=opts.mesh)
        if leaf.cE is not None:
            leaf, _ = homogenize_eq(leaf)
        leaf_f64 = leaf
        if opts.precision != "f64":
            # throughput + precision compose (round 4): the leaf ITERATION
            # runs the whole-QP policy — f32 leaf state (iterates, axpys,
            # gradient splits) with, under 'mixed', every solver dot/norm
            # promoted to the f64 fixed tree (dots_dtype; qp_with_precision).
            # The coarse projector, the SPECTRAL ESTIMATES (see
            # leaf_smalxe_opts) and the row-space post chain stay f64.
            # Counts are pinned exact-or-one-off in tests/test_precision.py.
            leaf = leaf.with_precision(opts.precision)
        pc_leaf = None
        if opts.pc_dual == "lumped":
            pc_op = lumped_pc_leaf(B_full, prob.K_blocks, sls)
            if opts.precision != "f64":
                from ..core.precision import cast_floats as _cast

                pc_op = _cast(pc_op, jnp.float32)
            pc_leaf = pc_op.mv

        def leaf_smalxe_opts(lq):
            """SMALXE options with the spectral estimates precomputed on the
            leaf QP ACTUALLY being solved (projected or not), from the
            CONSISTENT all-ones start — so the power-method trajectory (and
            hence M1/rho/alpha, and hence iteration counts) matches the
            row-space solve.  The estimates ALWAYS run on the f64 operators
            (``leaf_f64``): M1/rho/alpha derive from them, and an f32 power
            method would shift the whole augmented-Lagrangian schedule —
            measured 41/84 vs f64's 34/91 outer/inner on the contact
            example, vs exact-or-one-off with f64 estimates."""
            if lq.BE is None:
                return opts.smalxe
            v0 = sls.lift(jnp.ones(dual.b.shape[0], dtype=leaf_f64.b.dtype))
            sm = opts.smalxe
            if sm.maxeig is None and (
                (not sm.M1_direct) or (not sm.rho_direct) or sm.inject_maxeig
            ):
                me = max_eigenvalue(leaf_f64.A, v0=v0, tol=sm.maxeig_tol,
                                    maxits=sm.maxeig_iter)
                sm = _dc.replace(sm, maxeig=me)
            if sm.maxeig_inner is None and not sm.inject_maxeig:
                rho0 = (jnp.asarray(sm.rho, v0.dtype) if sm.rho_direct
                        else sm.rho * jnp.asarray(sm.maxeig, v0.dtype))
                mi = max_eigenvalue(
                    _Pen(a=leaf_f64.A, b=leaf_f64.BE, rho=rho0), v0=v0,
                    tol=sm.maxeig_tol, maxits=sm.maxeig_iter,
                )
                sm = _dc.replace(sm, maxeig_inner=mi)
            return sm

    def _row_solution(res):
        bt = getattr(res, "Bt_lambda", None)
        if sls is not None:
            return Solution(
                x=sls.restrict(res.x),
                Bt_lambda=sls.restrict(bt) if bt is not None else None,
            )
        return Solution(x=res.x, Bt_lambda=bt)

    if cur.BE is None:
        # no floating subdomains -> no coarse space: plain (preconditioned) CG
        if use_leaf:
            res = cg(leaf, tol=tol, precond=pc_leaf)
        else:
            res = cg(cur, tol=tol, precond=precond)
        sol = compose(steps)(_row_solution(res))
    elif opts.project:
        pf_holder = cur  # QP whose pf defines the projector
        cur, post_p = enforce_eq_by_projector(cur)
        steps.append((cur, post_p))
        if use_leaf:
            leaf_pf = leaf.pf
            same = leaf_f64 is leaf
            leaf, _ = enforce_eq_by_projector(leaf)
            # keep the f64 estimate twin in step with the projection
            leaf_f64 = leaf if same else enforce_eq_by_projector(leaf_f64)[0]
        if cur.box is None and cur.BE is None:
            if use_leaf:
                # leaf-space projected (optionally lumped-preconditioned) CG
                project = leaf_pf.apply_p if pc_leaf is not None else None
                res = cg(leaf, tol=tol, precond=pc_leaf, project=project)
            else:
                # eq-only: projected CG (the reference picks KSP/PCPG here)
                project = pf_holder.pf.apply_p if precond is not None else None
                res = cg(cur, tol=tol, precond=precond, project=project)
        else:
            # box constraints survive (contact): SMALXE on the projected QP
            if use_leaf:
                res = smalxe(leaf, opts=leaf_smalxe_opts(leaf), tol=tol)
            else:
                res = smalxe(cur, opts=opts.smalxe, tol=tol)
        sol = compose(steps)(_row_solution(res))
    else:
        if use_leaf:
            res = smalxe(leaf, opts=leaf_smalxe_opts(leaf), tol=tol)
        else:
            res = smalxe(cur, opts=opts.smalxe, tol=tol)
        sol = compose(steps)(_row_solution(res))

    # assemble the global solution by averaging dof copies (padding skipped)
    u = np.asarray(sol.x).reshape(prob.ns, prob.nl)
    x_global = assemble_global_mean(u, prob.l2g, prob.n_global)

    return FetiResult(
        x_global=x_global, u_decomposed=sol.x, solution=sol, result=res,
        qp=qp, dual_qp=dual,
    )


def prepare_contact_children(prob, opts, BI, cI, kplus=None):
    """Build the QP the contact pipeline hands to SMALXE — the projected
    dual child with surviving box constraints — in row space, and (when
    ``opts.throughput``) its scaled-leaf twin with row-matched spectral
    estimates.  Returns ``(qp_solve, smalxe_opts, sls)`` with ``sls`` None
    on the row path; ``smalxe(qp_solve, opts=smalxe_opts)`` then reproduces
    the iteration _feti_solve_impl runs (asserted in tests/test_leafqp.py).
    Intended for benchmarking / advanced embedding: the construction is
    host-side, the returned QP is a pure pytree that can be device_put and
    solved as ONE jitted executable."""
    import dataclasses as _dc

    qp, K_blocks, fixed_mask, null_bases = assemble_qp(prob, opts)
    qp = qp.replace(BI=BI, cI=None if cI is None else jnp.asarray(cI))
    if kplus is None:
        kplus = make_blockdiag_kplus(
            K_blocks, fixed_mask, prob, null_bases, explicit=opts.throughput,
            rho_mode=opts.resolved_rho_mode(prob.ns),
        )
    dual, _ = dualize(qp, kplus=kplus, coarse=opts.coarse)
    cur = dual
    if cur.cE is not None:
        cur, _ = homogenize_eq(cur)
    cur, _ = enforce_eq_by_projector(cur)
    if not opts.throughput:
        return cur, opts.smalxe, None

    from ..core.eig import max_eigenvalue
    from ..core.linop import Penalized as _Pen
    from .leafqp import leaf_dual_qp

    B_full = qp.BE if qp.BI is None else SubdomainExtension.vstack(
        (qp.BE, qp.BI)
    )
    leaf, sls = leaf_dual_qp(dual, B_full, kplus)
    if leaf.cE is not None:
        leaf, _ = homogenize_eq(leaf)
    leaf, _ = enforce_eq_by_projector(leaf)
    sm = opts.smalxe
    if leaf.BE is not None:
        v0 = sls.lift(jnp.ones(dual.b.shape[0], dtype=leaf.b.dtype))
        if sm.maxeig is None and (
            (not sm.M1_direct) or (not sm.rho_direct) or sm.inject_maxeig
        ):
            sm = _dc.replace(sm, maxeig=max_eigenvalue(
                leaf.A, v0=v0, tol=sm.maxeig_tol, maxits=sm.maxeig_iter))
        if sm.maxeig_inner is None and not sm.inject_maxeig:
            rho0 = (jnp.asarray(sm.rho, leaf.b.dtype) if sm.rho_direct
                    else sm.rho * jnp.asarray(sm.maxeig, leaf.b.dtype))
            sm = _dc.replace(sm, maxeig_inner=max_eigenvalue(
                _Pen(a=leaf.A, b=leaf.BE, rho=rho0), v0=v0,
                tol=sm.maxeig_tol, maxits=sm.maxeig_iter))
    if opts.precision != "f64":
        # f32 leaf state (+ promoted f64 dots under 'mixed'); the spectral
        # estimates above were computed on the f64 operators first — see
        # _feti_solve_body's leaf_smalxe_opts for why that matters
        leaf = leaf.with_precision(opts.precision)
    return leaf, sm, sls
