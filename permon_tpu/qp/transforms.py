"""QP transforms — the functional reimplementation of PERMON's QPT chain.

Each transform maps a QP to ``(child_qp, post_solve)`` where ``post_solve``
takes the child's :class:`Solution` and produces the parent's.  The
reference's mutable parent<->child chain with postSolve callbacks
(src/qp/interface/qpchain.c, qptransform.c:15-43) becomes plain function
composition: apply transforms left to right, then fold the post-solves back
right to left (:func:`compose`).

Implemented transforms and their reference counterparts:
- :func:`dualize`             — QPTDualize        (qptransform.c:909-1197)
- :func:`homogenize_eq`       — QPTHomogenizeEq   (qptransform.c:437-527)
- :func:`enforce_eq_by_projector` — QPTEnforceEqByProjector (qptransform.c:215-316)
- :func:`enforce_eq_by_penalty`   — QPTEnforceEqByPenalty   (qptransform.c:329-410)
- :func:`orthonormalize_eq`   — QPTOrthonormalizeEq (qptransform.c:566-660)
- :func:`scale_objective_by_scalar` — QPTScaleObjectiveByScalar (qptransform.c:1704-1771)
- :func:`normalize_objective` — QPTNormalizeObjective (qptransform.c:1574-1592)
- :func:`normalize_hessian`   — QPTNormalizeHessian   (qptransform.c:1611-1625)
- :func:`freeze_ineq`         — QPTFreezeIneq     (qptransform.c:1810-1826)
- :func:`scale`               — QPTScale          (qptransform.c:1437-1553)
- :func:`all_in_one`          — QPTAllInOne       (qptransform.c:2151-2205)
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core.factor import make_inv
from ..sys import tracing
from ..core.linop import (
    Dense, Penalized, Product, Scaled, Transpose, VStack, aslinearoperator,
)
from ..qpc.box import BoxConstraint
from .projector import ProjOp, Projector, dense_rows
from .qp import QP


@struct.dataclass
class Solution:
    """Solution data flowing backwards through post-solves (the analog of the
    x / lambda_E / lambda_I / Bt_lambda members of the reference QP)."""

    x: jax.Array
    lambda_E: Optional[jax.Array] = None
    lambda_I: Optional[jax.Array] = None
    Bt_lambda: Optional[jax.Array] = None  # B'lambda in the QP's primal space
    g: Optional[jax.Array] = None  # A x - b if the solver produced it


PostSolve = Callable[[Solution], Solution]


def compose(steps: Sequence[Tuple[QP, PostSolve]]) -> PostSolve:
    """Fold child-to-parent post-solves in reverse chain order
    (QPChainPostSolve, qpchain.c:200-282)."""

    def post(sol: Solution) -> Solution:
        for _, ps in reversed(list(steps)):
            sol = ps(sol)
        return sol

    return post


def ensure_pf(qp: QP, orthonormal_rows: bool = False) -> QP:
    """Attach the projector factory over BE if absent (QPSetEqInner creates
    the QPPF as a side effect in the reference, qp.c)."""
    if qp.BE is None or qp.pf is not None:
        return qp
    return qp.replace(pf=Projector.create(qp.BE, orthonormal_rows=orthonormal_rows))


# --------------------------------------------------------------------------
# dualize
# --------------------------------------------------------------------------


#: element count of the dense R/G build past which `dualize(coarse='auto')`
#: switches to the sparse coarse-side construction (k*(N+m) f64 elements;
#: 2^25 elements = 268 MB — parity-scale problems stay well below and keep
#: the bit-identical dense device Gram the oracles were pinned with)
SPARSE_COARSE_THRESHOLD = 1 << 25


#: element count up to which the sparse coarse build ships G to the device
#: as an explicit dense (k, m) array.  The lazy G = R'B' operator routes
#: every projector application through two PRIMAL-sized scatter/gather
#: chains (measured 134 ms per P apply at the 1M-dof north star, vs ~0.1 ms
#: for the dense GEMV at k=63, m=94563 — a 47 MB array).  Past the cutoff
#: the BLOCK coarse operator takes over when R is block-diagonal
#: (feti/large.BlockCoarse) — a 1 GB dense G at the 1.18M-dof elasticity
#: coarse (540 x 253000) both saturated the tunnel upload and OOMed the
#: SMALXE while-loop through XLA layout copies, while the block form needs
#: no (k, m) array at all.
DENSE_G_ELEMENTS = 1 << 26


def _sparse_coarse(R, B):
    """Host-side sparse coarse build: G = R'B' plus the sparse Gram GG'
    (scipy), without materializing dense R or the dense (N, k) products —
    the analog of the reference's sparse MatTransposeMatMult G = R'B'
    (qptransform.c:1089-1100, extension.c:544-620) and sparse GG'
    factorization (qppf.c:213-278).  G itself is shipped to the device
    densely below :data:`DENSE_G_ELEMENTS` (k is small — nullspace columns —
    so (k, m) is tiny even when N is millions) and stays a lazy operator
    above it.  Returns None when either operator lacks sparse structure."""
    from .sparse_rows import to_scipy

    R_sp = to_scipy(R)  # (N, k)
    B_sp = to_scipy(B)
    if R_sp is None or B_sp is None:
        return None
    G_sp = (R_sp.T @ B_sp.T).tocsr()  # (k, m) sparse
    ggt = (G_sp @ G_sp.T).tocsr()
    k, m = G_sp.shape
    if k * m <= DENSE_G_ELEMENTS:
        # DenseTree, not Dense: on TPU the f64 GEMV pair of a projector
        # application lowers sequentially (measured 12.4 ms at (63, 94563)
        # per P apply — ~15% of a north-star CG iteration); the fixed-tree
        # reduction is bandwidth-bound and deterministic (core/linop.py)
        from ..core.linop import DenseTree

        G_op = DenseTree.create(jnp.asarray(G_sp.toarray()))
    else:
        # above the dense cutoff: exploit the block-diagonal structure of R
        # when present (feti/large.BlockCoarse — per-subdomain fixed-tree
        # contractions, no (k, m) array); the generic lazy product is the
        # last resort (its Ell R' scatter measured ~400 ms per apply at the
        # 1.18M-dof elasticity coarse)
        from ..feti.large import block_coarse_from_R

        G_op = block_coarse_from_R(R, B)
        if G_op is None:
            G_op = Product((Transpose(R), Transpose(B)))  # mv = R'(B' lam)
    return G_op, ggt


def dualize(
    qp: QP, regularize: bool = True, kplus=None, kplus_mode: str = "plain",
    pf=None, coarse: str = "auto",
) -> Tuple[QP, PostSolve]:
    """Build the dual QP  min 1/2 l'Fl - d'l  s.t. G l = e, l_I >= 0 with
    F = B K+ B', d = B K+ b - c, G = R'B', e = R'b  (QPTDualize,
    qptransform.c:909-1197).

    ``kplus`` lets callers supply a structured factorized inverse (e.g. a
    BlockDiagCholInv for TFETI); the default is a dense Cholesky of the
    (regularized) Hessian — the MAT_INV_MONOLITHIC path.

    ``kplus_mode`` mirrors -qpt_dualize_Kplus_left / _mp (qptransform.c:
    1019-1087): 'left' composes K+ <- P_R K+ (left generalized inverse,
    output projected onto im K = ker R'), 'mp' the symmetric P_R K+ P_R
    (Moore-Penrose when K+ is any generalized inverse); 'plain' keeps K+.

    ``pf`` supplies an already-factorized coarse projector for the dual G
    (the QPReusedCP path, feti_prepare_reuse_cp): when given, the fresh
    GG' factorization is skipped entirely.
    """
    assert qp.BE is not None or qp.BI is not None, "dualize needs linear constraints"
    assert kplus_mode in ("plain", "left", "mp"), kplus_mode
    A, b = qp.A, qp.b

    ops, cs, mE = [], [], 0
    if qp.BE is not None:
        ops.append(qp.BE)
        mE = qp.BE.shape[0]
        cs.append(qp.cE if qp.cE is not None else jnp.zeros(mE, dtype=b.dtype))
    if qp.BI is not None:
        mI = qp.BI.shape[0]
        ops.append(qp.BI)
        cs.append(qp.cI if qp.cI is not None else jnp.zeros(mI, dtype=b.dtype))
    B = ops[0] if len(ops) == 1 else VStack(tuple(ops))
    c = jnp.concatenate(cs)
    m = B.shape[0]

    Kplus = kplus if kplus is not None else make_inv(A, qp.R, regularize=regularize)
    if kplus_mode != "plain" and qp.R is not None and qp.R.shape[1] > 0:
        # P_R = I - R(R'R)^{-1}R' via a projector factory over R'
        # (the Kplus_ QPPF of qptransform.c:1035-1046)
        P_R = ProjOp(pf=Projector.create(Transpose(qp.R)))
        factors = (P_R, Kplus, P_R) if kplus_mode == "mp" else (P_R, Kplus)
        Kplus = Product(factors)
        if tracing.debug_enabled:
            # runtime generalized-inverse self-checks — the reference's
            # PermonDebugEnabled block (qptransform.c:1060-1081): K K+ K == K
            # (left inverse); K+ K K+ == K+ additionally for Moore-Penrose
            from ..core.matutils import mult_equal

            assert mult_equal(Product((A, Kplus, A)), A), \
                "Kplus is not a left generalized inverse (K Kplus K != K)"
            if kplus_mode == "mp":
                assert mult_equal(Product((Kplus, A, Kplus)), Kplus), \
                    "Kplus is not Moore-Penrose (Kplus K Kplus != Kplus)"
    F = Product((B, Kplus, Transpose(B)))

    d = B.mv(Kplus.mv(b)) - c

    G = None
    e = None
    gram = None
    if pf is not None and qp.R is not None and qp.R.shape[1] > 0:
        # reused coarse projector: its G IS the dual equality operator —
        # skip the (host-side) G/GG' construction entirely, so a repeated
        # dualize with pf is pure traced ops (jittable end to end)
        G = pf.G
        e = qp.R.rmv(b)
    elif qp.R is not None and qp.R.shape[1] > 0:
        k_null = qp.R.shape[1]
        want_sparse = coarse == "sparse" or (
            coarse == "auto"
            and k_null * (qp.R.shape[0] + m) > SPARSE_COARSE_THRESHOLD
        )
        sp_coarse = _sparse_coarse(qp.R, B) if want_sparse else None
        if sp_coarse is not None:
            # sparse coarse side: lazy G = R'B', host-built sparse GG' —
            # peak memory O(nnz), never a dense (N, k) R or (k, m) G
            G, gram = sp_coarse
        else:
            Rd = qp.R.todense()
            # G row i = B r_i  (G = R'B', qptransform.c:1089-1100)
            Gd = jax.vmap(B.mv, in_axes=1)(Rd)
            G = Dense.create(Gd)
        e = qp.R.rmv(b)

    box = None
    if qp.BI is not None:
        # lb = -inf on the E block, 0 on the I block (qptransform.c:1136-1162)
        lb = jnp.concatenate(
            [jnp.full(mE, -jnp.inf, dtype=b.dtype), jnp.zeros(m - mE, dtype=b.dtype)]
        )
        box = BoxConstraint.create(m, lb=lb)

    child = QP(
        A=F, b=d, x0=jnp.zeros(m, dtype=b.dtype), box=box,
        BE=G, cE=e, BI=None, cI=None, R=None,
    )
    if pf is not None:
        child = child.replace(pf=pf)
    elif gram is not None:
        child = child.replace(pf=Projector.create(G, gram=gram))
    else:
        child = ensure_pf(child)

    def post(sol: Solution) -> Solution:
        lam = sol.x
        u = Kplus.mv(b - B.rmv(lam))
        if G is not None:
            # alpha = (GG')^{-1} G (G'mu); G'mu accumulated in child Bt_lambda
            # (QPTDualizePostSolve_Private, qptransform.c:782-833)
            bt = sol.Bt_lambda
            if bt is None:
                bt = G.rmv(sol.lambda_E) if sol.lambda_E is not None else jnp.zeros(m, b.dtype)
            alpha = child.pf.apply_half_q(bt)
            u = u - qp.R.mv(alpha)
        lam_E = lam[:mE] if qp.BE is not None else None
        lam_I = lam[mE:] if qp.BI is not None else None
        return Solution(
            x=u, lambda_E=lam_E, lambda_I=lam_I, Bt_lambda=B.rmv(lam)
        )

    return child, post


# --------------------------------------------------------------------------
# homogenize_eq
# --------------------------------------------------------------------------


def homogenize_eq(qp: QP) -> Tuple[QP, PostSolve]:
    """Shift out a nonzero equality rhs: xt = BE'(BE BE')^{-1} cE; the child
    has cE = 0, b = b - A xt, shifted cI and box (QPTHomogenizeEq)."""
    if qp.cE is None:
        return qp, lambda s: s
    qp = ensure_pf(qp)
    xt = qp.pf.apply_half_q_t(qp.cE)
    b_bar = qp.b - qp.A.mv(xt)
    cI = qp.cI - qp.BI.mv(xt) if qp.cI is not None and qp.BI is not None else qp.cI
    box = qp.box
    if box is not None:
        box = box.replace(lb=box.lb - xt, ub=box.ub - xt)
    child = qp.replace(b=b_bar, cE=None, cI=cI, box=box, x0=None)

    def post(sol: Solution) -> Solution:
        return sol.replace(x=sol.x + xt, g=None)

    return child, post


# --------------------------------------------------------------------------
# enforce_eq_by_projector
# --------------------------------------------------------------------------


def enforce_eq_by_projector(qp: QP) -> Tuple[QP, PostSolve]:
    """Replace A by P A (eq-only) or P A P and b by P b with P the orthogonal
    projector onto ker BE (QPTEnforceEqByProjector).  Requires homogenized
    equality constraints (apply homogenize_eq first)."""
    if qp.BE is None:
        return qp.replace(cE=None), lambda s: s
    assert qp.cE is None, "apply homogenize_eq before enforce_eq_by_projector"
    qp = ensure_pf(qp)
    P = ProjOp(pf=qp.pf)
    if tracing.debug_enabled:
        # projector self-checks in debug mode: P idempotent, BE P == 0
        from ..core.matutils import mult_equal

        assert mult_equal(Product((P, P)), P), "P is not idempotent"
        assert mult_equal(
            Product((qp.BE, P)), Scaled(inner=qp.BE, scale=0.0)
        ), "BE P != 0 (P does not project onto ker BE)"
    eqonly = qp.BI is None and qp.box is None
    if eqonly:
        newA = Product((P, qp.A))
        child = qp.replace(A=newA, b=P.mv(qp.b), BE=None, cE=None, pf=None)
    else:
        newA = Product((P, qp.A, P))
        child = qp.replace(A=newA, b=P.mv(qp.b))

    def post(sol: Solution) -> Solution:
        # lambda_E fixup: Bt_lambda += Q (b - A x), lambda_E += halfQ(b - A x)
        # (QPTEnforceEqByProjectorPostSolve_Private, qptransform.c:57-95)
        r = qp.b - qp.A.mv(sol.x)
        lam_E = qp.pf.apply_half_q(r)
        bt = qp.pf.apply_q(r)
        if sol.lambda_E is not None:
            lam_E = lam_E + sol.lambda_E
        if sol.Bt_lambda is not None:
            bt = bt + sol.Bt_lambda
        return sol.replace(lambda_E=lam_E, Bt_lambda=bt)

    return child, post


# --------------------------------------------------------------------------
# enforce_eq_by_penalty
# --------------------------------------------------------------------------


def enforce_eq_by_penalty(qp: QP, rho) -> Tuple[QP, PostSolve]:
    """A_child = A + rho BE'BE (lazy), b_child = b + rho BE'cE
    (QPTEnforceEqByPenalty, qptransform.c:329-410)."""
    assert qp.BE is not None
    pen = Penalized(a=qp.A, b=qp.BE, rho=jnp.asarray(rho, qp.b.dtype))
    b = qp.b
    if qp.cE is not None:
        b = b + rho * qp.BE.rmv(qp.cE)
    child = qp.replace(A=pen, b=b, BE=None, cE=None)
    return child, lambda s: s


# --------------------------------------------------------------------------
# orthonormalize_eq
# --------------------------------------------------------------------------


def orthonormalize_eq(qp: QP, method: str = "gs") -> Tuple[QP, PostSolve]:
    """(TBE, T) = orth_rows(BE); child BE = T BE (orthonormal rows), cE = T cE.
    Post-solve maps lambda_E back via T' (QPTOrthonormalizeEq)."""
    from .orth import orth_rows

    if qp.BE is None:
        return qp, lambda s: s
    if method == "inexact":
        # INEXACT returns BE unchanged (permonmatorth.c); the exact projector
        # stays available for Knoll-style initial guesses
        return qp.replace(pf=Projector.create(qp.BE)), lambda s: s
    if method in ("implicit", "cholesky") and qp.BE.shape[0] > 2048:
        # wide sparse BE: implicit sparse-Cholesky orthonormalization — no
        # (m, n) densification (the AIJ MatOrthRows path)
        from .orth import orth_rows_implicit_band

        qt = orth_rows_implicit_band(qp.BE)
        if qt is not None:
            Qop, Top = qt
            cE = Top.mv(qp.cE) if qp.cE is not None else None
            child = qp.replace(
                BE=Qop, cE=cE,
                pf=Projector.create(Qop, orthonormal_rows=True))

            def post_band(sol: Solution) -> Solution:
                lam = sol.lambda_E
                if lam is not None:
                    lam = Top.rmv(lam)
                return sol.replace(lambda_E=lam)

            return child, post_band
    Bd = dense_rows(qp.BE)
    # "implicit" keeps Q = T BE unassembled in the reference; with the small
    # dense constraint dimension here the Cholesky form is the same algebra
    if method == "implicit":
        method = "cholesky"
    Q, T = orth_rows(Bd, method)
    cE = T @ qp.cE if qp.cE is not None else None
    BEn = Dense.create(Q)
    child = qp.replace(BE=BEn, cE=cE, pf=Projector.create(BEn, orthonormal_rows=True))

    def post(sol: Solution) -> Solution:
        lam = sol.lambda_E
        if lam is not None:
            lam = T.T @ lam
        return sol.replace(lambda_E=lam)

    return child, post


# --------------------------------------------------------------------------
# objective scaling / normalization
# --------------------------------------------------------------------------


def scale_objective_by_scalar(qp: QP, scale_A, scale_b) -> Tuple[QP, PostSolve]:
    """A *= scale_A, b *= scale_b; the child solution is scaled by
    scale_A/scale_b, box bounds by scale_b/scale_A skipping +-inf entries
    (VecScaleSkipInf), and all multipliers map back via 1/scale_b
    (QPTScaleObjectiveByScalar, qptransform.c:1704-1771)."""
    from ..core.linop import Scaled

    sA = jnp.asarray(scale_A, qp.b.dtype)
    sb = jnp.asarray(scale_b, qp.b.dtype)
    box = qp.box
    if box is not None:
        s = sb / sA
        # VecScaleSkipInf: infinite entries stay infinite
        lb = jnp.where(jnp.isinf(box.lb), box.lb, box.lb * s)
        ub = jnp.where(jnp.isinf(box.ub), box.ub, box.ub * s)
        box = box.replace(lb=lb, ub=ub)
    child = qp.replace(A=Scaled(inner=qp.A, scale=sA), b=qp.b * sb, box=box, x0=None)

    def post(sol: Solution) -> Solution:
        out = sol.replace(x=sol.x * (sA / sb))
        if sol.lambda_E is not None:
            out = out.replace(lambda_E=sol.lambda_E / sb)
        if sol.lambda_I is not None:
            out = out.replace(lambda_I=sol.lambda_I / sb)
        if sol.Bt_lambda is not None:
            out = out.replace(Bt_lambda=sol.Bt_lambda / sb)
        return out

    return child, post


def normalize_objective(qp: QP) -> Tuple[QP, PostSolve]:
    """scale_A = 1/||A|| (power method), scale_b = 1/||b|| (or 1/||A|| when
    ||b|| = 0) (QPTNormalizeObjective, qptransform.c:1574-1592)."""
    from ..core.eig import max_eigenvalue

    norm_A = max_eigenvalue(qp.A)
    norm_b = jnp.linalg.norm(qp.b)
    norm_b = jnp.where(norm_b == 0, norm_A, norm_b)
    return scale_objective_by_scalar(qp, 1.0 / norm_A, 1.0 / norm_b)


def normalize_hessian(qp: QP) -> Tuple[QP, PostSolve]:
    """scale_A = scale_b = 1/||A|| (QPTNormalizeHessian, qptransform.c:1611)."""
    from ..core.eig import max_eigenvalue

    norm_A = max_eigenvalue(qp.A)
    return scale_objective_by_scalar(qp, 1.0 / norm_A, 1.0 / norm_A)


# --------------------------------------------------------------------------
# freeze_ineq / scale
# --------------------------------------------------------------------------


def freeze_ineq(qp: QP) -> Tuple[QP, PostSolve]:
    """Move BI, cI into the equality block (active-set freeze): child BE =
    [BE; BI], cE = [cE; cI] (QPTFreezeIneq, qptransform.c:1810-1826).  The
    post-solve splits lambda_E back into the parent's lambda_E/lambda_I."""
    assert qp.BI is not None, "freeze_ineq needs inequality constraints"
    mI = qp.BI.shape[0]
    cI = qp.cI if qp.cI is not None else jnp.zeros(mI, qp.b.dtype)
    if qp.BE is None:
        child = qp.replace(BE=qp.BI, cE=cI, BI=None, cI=None, pf=None)

        def post(sol: Solution) -> Solution:
            return sol.replace(lambda_I=sol.lambda_E, lambda_E=None)

    else:
        mE = qp.BE.shape[0]
        cE = qp.cE if qp.cE is not None else jnp.zeros(mE, qp.b.dtype)
        child = qp.replace(
            BE=VStack((qp.BE, qp.BI)), cE=jnp.concatenate([cE, cI]),
            BI=None, cI=None, pf=None,
        )

        def post(sol: Solution) -> Solution:
            lam = sol.lambda_E
            if lam is None:
                return sol
            return sol.replace(lambda_E=lam[:mE], lambda_I=lam[mE:])

    return child, post


def eq_multiplicity_scaling(qp: QP) -> jax.Array:
    """Per-row scaling d with d_i = 1/sqrt(multiplicity) for gluing-type BE
    rows — the ddm variant of constraint scaling (QPGetEqMultiplicityScaling,
    qp.c:1632+).  Multiplicity of row i = its number of nonzeros (a gluing
    row pairs copies of one dof).  Sparse operators are scanned via their
    COO structure; only dense/matrix-free BE falls back to densification."""
    from .sparse_rows import row_nnz

    nnz = row_nnz(qp.BE)
    if nnz is not None:
        dt = jnp.result_type(float)
        return jnp.asarray(1.0 / np.sqrt(np.maximum(nnz, 1)), dtype=dt)
    Bd = dense_rows(qp.BE)
    nnz = jnp.sum(jnp.abs(Bd) > 0, axis=1)
    return 1.0 / jnp.sqrt(jnp.maximum(nnz, 1).astype(Bd.dtype))


def scale(qp: QP, scale_O: Optional[str] = None, scale_E: Optional[str] = None) -> Tuple[QP, PostSolve]:
    """Row scaling of the objective / equality constraints (QPTScale,
    qptransform.c:1437-1553).  scale_O: None|'rows_norm_2'; scale_E:
    None|'rows_norm_2'|'ddm_multiplicity'.  Defaults are no-ops, matching
    the reference's QP_SCALE_NONE defaults."""
    child = qp
    dE = None
    if scale_O == "rows_norm_2":
        Ad = qp.A.todense()
        d = 1.0 / jnp.linalg.norm(Ad, axis=1)
        child = child.replace(A=Dense.create(d[:, None] * Ad), b=d * qp.b)
    elif scale_O is not None:
        raise ValueError(f"unsupported scale_O {scale_O!r}")
    if scale_E is not None and qp.BE is not None:
        from .sparse_rows import row_sqnorm, scale_rows

        if scale_E == "rows_norm_2":
            sq = row_sqnorm(qp.BE)
            if sq is not None:
                dE = jnp.asarray(1.0 / np.sqrt(sq), dtype=qp.b.dtype)
            else:
                dE = 1.0 / jnp.linalg.norm(dense_rows(qp.BE), axis=1)
        elif scale_E == "ddm_multiplicity":
            dE = eq_multiplicity_scaling(qp)
        else:
            raise ValueError(f"unsupported scale_E {scale_E!r}")
        cE = dE * qp.cE if qp.cE is not None else None
        # same-type sparse row scaling (QPTScale operates on the AIJ/extension
        # storage in the reference); only matrix-free BE densifies
        try:
            BEs = scale_rows(qp.BE, dE)
        except TypeError:
            BEs = Dense.create(dE[:, None] * dense_rows(qp.BE))
        child = child.replace(BE=BEs, cE=cE, pf=None)

    dE_cap = dE

    def post(sol: Solution) -> Solution:
        if dE_cap is not None and sol.lambda_E is not None:
            return sol.replace(lambda_E=dE_cap * sol.lambda_E)
        return sol

    return child, post


def all_in_one(
    qp: QP,
    dual: bool = True,
    project: bool = True,
    penalty: float = 0.0,
    regularize: bool = True,
    normalize: Optional[str] = None,
    freeze: bool = False,
    orth_eq: Optional[str] = None,
    kplus=None,
) -> Tuple[QP, PostSolve]:
    """The option-driven transform pipeline (QPTAllInOne, qptransform.c:
    2151-2205): [normalize] -> Scale -> [OrthonormalizeEq] -> [FreezeIneq]
    -> [Dualize -> Scale -> OrthonormalizeEq] -> [EnforceEqByProjector] ->
    [EnforceEqByPenalty].  Returns the last child and the composed
    post-solve.  The `-feti` shorthand is dual=True, project=True with a
    block-diagonal kplus (QPTFromOptions, qptransform.c:2208-2237)."""
    steps: List[Tuple[QP, PostSolve]] = []

    def apply(fn, *a, **k):
        nonlocal qp
        qp, ps = fn(qp, *a, **k)
        steps.append((qp, ps))

    if normalize == "objective":
        apply(normalize_objective)
    elif normalize == "hessian":
        apply(normalize_hessian)
    if orth_eq and qp.BE is not None:
        apply(orthonormalize_eq, orth_eq)
    if freeze and qp.BI is not None:
        apply(freeze_ineq)
    if dual:
        apply(dualize, regularize=regularize, kplus=kplus)
        if orth_eq and qp.BE is not None:
            apply(orthonormalize_eq, orth_eq)
    if project and qp.BE is not None:
        if qp.cE is not None:
            apply(homogenize_eq)
        apply(enforce_eq_by_projector)
    if penalty:
        assert qp.BE is not None
        apply(enforce_eq_by_penalty, penalty)
    return qp, compose(steps)


def feti_prepare(qp: QP, kplus=None, regularize: bool = True) -> Tuple[QP, PostSolve]:
    """Dualize -> HomogenizeEq -> EnforceEqByProjector — the canonical TFETI
    pipeline (QPTFetiPrepare, qptransform.c:1200-1210)."""
    return all_in_one(qp, dual=True, project=True, regularize=regularize, kplus=kplus)


#: key -> (pf, keyed_leaves).  The keyed array leaves are held STRONGLY in
#: the entry so CPython cannot recycle their id()s while the entry lives
#: (an id()-only key could silently match a *different* later G); the size
#: bound keeps long-running sessions from accumulating stale factorizations.
_REUSE_CP_CACHE: dict = {}
_REUSE_CP_CACHE_MAX = 16


def feti_prepare_reuse_cp(qp: QP, kplus=None, regularize: bool = True,
                          _cache=_REUSE_CP_CACHE) -> Tuple[QP, PostSolve]:
    """QPTFetiPrepareReuseCP (qptransform.c:1213-1251): like feti_prepare but
    the coarse-problem factorization (the dual QP's projector) is cached on
    the equality operator and reused across repeated solves with changing
    right-hand sides (time stepping, contact outer loops).  The cache key is
    the identity of the dual constraint operator's arrays, matching the
    reference's static QPReusedCP keyed on the G matrix."""
    # key on the PRIMAL constraint + nullspace arrays: they are the objects
    # that persist across qp.replace(b=...) in the time-stepping use case
    # (the reference reuses its static QPReusedCP exactly when the caller's
    # G — determined by BE and R — is unchanged)
    leaves = jax.tree_util.tree_leaves((qp.BE, qp.BI, qp.R))
    key = tuple(id(leaf) for leaf in leaves)
    entry = _cache.get(key)
    pf = entry[0] if entry is not None else None
    # thread the cached pf into dualize so the GG' refactorization is
    # actually skipped (not recomputed and discarded)
    dual, post_d = dualize(qp, regularize=regularize, kplus=kplus, pf=pf)
    if pf is None and dual.BE is not None:
        _cache[key] = (dual.pf, leaves)
        while len(_cache) > _REUSE_CP_CACHE_MAX:
            _cache.pop(next(iter(_cache)))
    steps = [(dual, post_d)]
    cur = dual
    if cur.cE is not None:
        cur, post_h = homogenize_eq(cur)
        steps.append((cur, post_h))
    if cur.BE is not None:
        pf_holder = cur
        cur, post_p = enforce_eq_by_projector(cur)
        # carry the (cached) coarse-problem factorization on the child, the
        # way the reference's child QP keeps its QPPF for later reuse
        cur = cur.replace(pf=pf_holder.pf)
        steps.append((cur, post_p))
    return cur, compose(steps)


def feti_prepare_reuse_cp_reset() -> None:
    """Drop all cached coarse-problem factorizations
    (QPTFetiPrepareReuseCPReset, qptransform.c:1254-1260)."""
    _REUSE_CP_CACHE.clear()


def split_be(qp: QP) -> Tuple[QP, PostSolve]:
    """Split BE rows into gluing (>=2 nonzeros) and Dirichlet (1 nonzero)
    blocks, child BE = [Bg; Bd] (QPTSplitBE, qptransform.c:1829-1902).
    Row reordering only — the post-solve permutes lambda_E back."""
    assert qp.BE is not None
    from .sparse_rows import permute_rows, row_nnz

    nnz_h = row_nnz(qp.BE)
    if nnz_h is None:
        nnz_h = np.asarray(jnp.sum(jnp.abs(dense_rows(qp.BE)) > 0, axis=1))
    glue_idx = np.flatnonzero(nnz_h >= 2)
    dir_idx = np.flatnonzero(nnz_h == 1)
    perm = np.concatenate([glue_idx, dir_idx])
    try:
        Bnew = permute_rows(qp.BE, perm)
    except TypeError:
        Bnew = Dense.create(dense_rows(qp.BE)[jnp.asarray(perm)])
    cE = qp.cE[jnp.asarray(perm)] if qp.cE is not None else None
    child = qp.replace(BE=Bnew, cE=cE, pf=None)
    inv_perm = np.argsort(perm)

    def post(sol: Solution) -> Solution:
        if sol.lambda_E is None:
            return sol
        return sol.replace(lambda_E=sol.lambda_E[jnp.asarray(inv_perm)])

    return child, post


def remove_gluing_of_dirichlet_dofs(qp: QP, dirichlet_dofs) -> Tuple[QP, PostSolve]:
    """Drop BE rows that act on Dirichlet-fixed dofs
    (QPTRemoveGluingOfDirichletDofs, qptransform.c:1327-1388 +
    MatRemoveGluingOfDirichletDofs, permonmatfetiutils.c:1-167).  The
    post-solve zero-pads lambda_E back to the parent's row count."""
    assert qp.BE is not None
    from .sparse_rows import restrict_rows, to_coo

    coo = to_coo(qp.BE)
    if coo is not None:
        rows, cols, vals, (m_parent, n) = coo
        mask = np.zeros(n, dtype=bool)
        mask[np.asarray(dirichlet_dofs, dtype=np.int64)] = True
        touched = np.zeros(m_parent, dtype=bool)
        touched[rows[mask[cols] & (vals != 0)]] = True
        keep = np.flatnonzero(~touched)
        Bnew = restrict_rows(qp.BE, keep)
    else:
        Bd_full = np.asarray(dense_rows(qp.BE))
        m_parent = Bd_full.shape[0]
        mask = np.zeros(Bd_full.shape[1], dtype=bool)
        mask[np.asarray(dirichlet_dofs, dtype=np.int64)] = True
        keep = np.flatnonzero(~(np.abs(Bd_full[:, mask]) > 0).any(axis=1))
        Bnew = Dense.create(jnp.asarray(Bd_full[keep]))
    cE = qp.cE[jnp.asarray(keep)] if qp.cE is not None else None
    child = qp.replace(BE=Bnew, cE=cE, pf=None)

    def post(sol: Solution) -> Solution:
        if sol.lambda_E is None:
            return sol
        lam = jnp.zeros(m_parent, sol.lambda_E.dtype).at[jnp.asarray(keep)].set(sol.lambda_E)
        return sol.replace(lambda_E=lam)

    return child, post
