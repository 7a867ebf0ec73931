"""MPRGP — Modified Proportioning with (Reduced) Gradient Projections.

The bound-constrained QP solver; TPU-native reimplementation of QPSMPGP
(reference: src/qps/impls/mpgp/mpgp.c; algorithm: Kruzik, Horak, Cermak,
Pospisil, Pecha, "Active set expansion strategies in MPRGP algorithm",
Advances in Engineering Software 149 (2020)).

Design: the whole solve is ONE ``lax.while_loop`` under jit. The three-way
step branching (CG / expansion / proportioning) is traced with nested
``lax.cond`` so exactly one branch's matvecs execute per iteration — each
iteration costs 1 matvec (CG, proportioning) or 2 (expansion), plus a handful
of fused dot products, matching the reference's Hessian-multiplication counts
(e.g. 200 mults for 181 iterations on tutorial ex1).

Semantics intentionally mirrored for iteration-count parity:
- convergence tested at the top of each iteration on ||gP|| (mpgp.c:514-534),
- proportionality test gc'gc <= gamma^2 * gf'gf (mpgp.c:538),
- expansion makes the maximal feasible half-step, re-splits gradients,
  computes the step length, steps along the expansion direction, and only
  projects when required (projection is skipped for the default std+fixed
  combination exactly as in QPSSetup_MPGP, mpgp.c:384-388),
- step length types fixed/opt/optapprox/bb (mpgp.c:226-287) and expansion
  direction types std/projcg/gf/g/gfgr/ggr (mpgp.c:3),
- optional fallback / fallback2 objective-increase rollback (mpgp.c:561-616),
- alpha = alpha_user / lambda_max with lambda_max from the deterministic
  all-ones power method unless supplied (mpgp.c:404-414).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..core.convergence import ConvergedReason, Tolerances, converged_default
from ..core.eig import max_eigenvalue
from ..qp.qp import QP

# step-type codes for the monitor (reference prints chars c/e/p/f)
_STEP_NONE, _STEP_CG, _STEP_EXP, _STEP_PROP, _STEP_FALL = 0, 1, 2, 3, 4
STEP_CHARS = {_STEP_NONE: " ", _STEP_CG: "c", _STEP_EXP: "e", _STEP_PROP: "p", _STEP_FALL: "f"}

EXPANSION_TYPES = ("std", "projcg", "gf", "g", "gfgr", "ggr")
EXPANSION_LENGTH_TYPES = ("fixed", "opt", "optapprox", "bb")


@dataclasses.dataclass(frozen=True)
class MPRGPOptions:
    """Static solver configuration (defaults per QPSCreate_MPGP, mpgp.c:826-846)."""

    gamma: float = 1.0
    alpha_user: Optional[float] = None  # None -> 2.0 (as a multiple of 1/maxeig)
    alpha_direct: bool = False  # True: alpha_user IS the step length
    maxeig: Optional[float] = None  # None -> power method
    maxeig_tol: float = 1e-4
    maxeig_iter: int = 50
    bchop_tol: float = 0.0
    expansion_type: str = "std"
    explength_type: str = "fixed"
    resetalpha: bool = False
    fallback: bool = False
    fallback2: bool = False
    monitor: bool = False
    monitor_cost: bool = False  # QPSMonitorCostFunction analog

    def __post_init__(self):
        assert self.expansion_type in EXPANSION_TYPES, self.expansion_type
        assert self.explength_type in EXPANSION_LENGTH_TYPES, self.explength_type


@struct.dataclass
class _State:
    x: jax.Array
    g: jax.Array  # g = A x - b
    p: jax.Array
    gf: jax.Array
    gc: jax.Array
    gr: jax.Array
    alpha: jax.Array
    rnorm: jax.Array
    it: jax.Array
    reason: jax.Array
    step: jax.Array  # last step-type code
    nmv: jax.Array
    ncg: jax.Array
    nexp: jax.Array
    nprop: jax.Array
    nfinc: jax.Array
    nfall: jax.Array
    hist: jax.Array  # fixed-size ||gP|| history (unused 1-slot when off)
    aux: Any  # convergence-test state (SMALXE hooks in here)


@struct.dataclass
class MPRGPResult:
    x: jax.Array
    reason: jax.Array
    iterations: jax.Array
    rnorm: jax.Array
    nmv: jax.Array
    ncg: jax.Array
    nexp: jax.Array
    nprop: jax.Array
    nfinc: jax.Array
    nfall: jax.Array
    g: jax.Array  # final gradient A x - b (multiplier recovery reuses it)
    alpha: jax.Array = None  # final step length (persists across SMALXE inner solves)
    #: per-iteration ||gP|| buffer when called with ``history > 0``
    #: (QPS residual history, qpsimpl.h:62-70)
    rnorm_history: Optional[jax.Array] = None
    aux: Any = None


def _grads_all(box, x, g, alpha):
    gf, gc = box.grads(x, g)
    gr = box.grad_reduced(x, gf, alpha)
    return gf, gc, gr


def mprgp(
    qp: QP,
    opts: MPRGPOptions = MPRGPOptions(),
    tol: Tolerances = Tolerances(),
    conv_test: Optional[Callable] = None,
    conv_aux: Any = (),
    maxeig: Optional[jax.Array] = None,
    alpha0: Optional[jax.Array] = None,
    history: int = 0,
) -> MPRGPResult:
    """Solve min 1/2 x'Ax - b'x s.t. lb <= x <= ub.

    ``conv_test(aux, it, rnorm, x, g) -> (reason_int32, aux)`` may replace the
    default test — SMALXE injects its coupled inner/outer test this way
    (reference: QPSConverged_Inner_SMALXE, smalxe.c:609-692).
    ``history`` > 0 records that many per-iteration ||gP|| values in a
    fixed-size device buffer surfaced as ``result.rnorm_history``.
    """
    from ..core import detred
    from ..core.precision import dot_bundler, reducers

    A, b = qp.A, qp.b
    vdot, vnorm = reducers(qp.dots_dtype)  # f64-promoted dots under 'mixed'
    vdots = dot_bundler(qp.dots_dtype)  # fused same-point dot bundles
    # fuse the body's three reductions only when the bundle actually batches
    # (promoted or deterministic trees, bit-identical per row); the plain-f64
    # path keeps jnp.linalg.norm so oracle numerics are untouched
    fuse_body = qp.dots_dtype is not None or detred.enabled()
    if qp.box is None:
        # unbounded box: the algorithm degenerates to plain CG (no chopped
        # gradient, infinite feasible steps) — used by SMALXE for
        # equality-only QPs where the reference picks the KSP inner solver
        from ..qpc.box import BoxConstraint

        box = BoxConstraint.create(qp.n)
    else:
        box = qp.box.chop_bounds(opts.bchop_tol)
    dtype = b.dtype
    gamma2 = opts.gamma**2

    # --- alpha initialization (QPSSetup_MPGP, mpgp.c:404-414) ---------------
    alpha_user = 2.0 if opts.alpha_user is None else opts.alpha_user
    if opts.alpha_direct:
        alpha_init = jnp.asarray(alpha_user, dtype)
        maxeig_val = jnp.asarray(0.0, dtype) if maxeig is None else maxeig
    else:
        if maxeig is None:
            maxeig = (
                jnp.asarray(opts.maxeig, dtype)
                if opts.maxeig is not None
                else max_eigenvalue(A, v0=jnp.ones(A.shape[1], dtype),
                                    tol=opts.maxeig_tol,
                                    maxits=opts.maxeig_iter)
            )
        maxeig_val = jnp.asarray(maxeig, dtype)
        alpha_init = jnp.asarray(alpha_user / maxeig_val, dtype)
    if alpha0 is not None:
        alpha_init = jnp.asarray(alpha0, dtype)  # warm-started alpha (SMALXE)

    if conv_test is None:
        norm_rhs = vnorm(b)
        ttol = jnp.maximum(tol.rtol * norm_rhs, tol.atol)

        def conv_test(aux, it, rnorm, x, g):
            return (
                converged_default(
                    it,
                    rnorm,
                    ttol=ttol,
                    atol=tol.atol,
                    divtol=tol.divtol,
                    norm_rhs_div=norm_rhs,
                    max_it=tol.max_it,
                ),
                aux,
            )

    # --- expansion direction / length-vector selectors (mpgp.c:384-414) -----
    et = opts.expansion_type
    # expdir: which split drives the expansion step; explv: which drives the length
    _sel = {"std": ("gr", "gr"), "gf": ("gf", "gf"), "g": ("g", "g"),
            "gfgr": ("gf", "gr"), "ggr": ("g", "gr"), "projcg": ("gf", "gf")}
    expdir_key, explv_key = _sel[et]
    expproject = not (et == "std" and opts.explength_type == "fixed")

    def pick(key, g, gf, gr):
        return {"g": g, "gf": gf, "gr": gr}[key]

    def explength(alpha, x, g, gf, gr, dold, xold, nmv):
        """New alpha per MPGPExpansionLength (mpgp.c:226-287). Called after the
        half feasible step with the re-split gradients."""
        d = pick(explv_key, g, gf, gr)
        lt = opts.explength_type
        if lt == "fixed":
            return alpha, nmv
        if lt == "opt":
            ad = A.mv(d)
            dots0, dots1 = vdots([(d, g), (d, ad)])
            bad = dots1 == 0.0
            new = jnp.where(bad & opts.resetalpha, alpha / maxeig_val, alpha_user * dots0 / dots1)
            return new.astype(alpha.dtype), nmv + 1
        if lt == "optapprox":
            if explv_key == "g":
                return jnp.asarray(alpha_user / maxeig_val, alpha.dtype), nmv
            dots0, dots1 = vdots([(d, g), (d, d)])
            return (alpha_user * dots0 / dots1 / maxeig_val).astype(alpha.dtype), nmv
        # bb: differences across the half-step within this expansion
        v0 = d - dold
        v1 = x - xold
        dots0, dots1 = vdots([(v0, v0), (v0, v1)])
        bad = dots1 == 0.0
        new = jnp.where(bad & opts.resetalpha, alpha / maxeig_val, alpha_user * dots0 / dots1)
        return new.astype(alpha.dtype), nmv

    def expansion_std(st, Ap, afeas, project_after):
        """Half feasible step + re-split + length + expansion-direction step
        (MPGPExpansion_Std, mpgp.c:296-326)."""
        xold, gold = st.x, st.g
        dold = pick(explv_key, st.g, st.gf, st.gr)
        x1 = st.x - afeas * st.p
        g1 = st.g - afeas * Ap
        gf1, gc1, gr1 = _grads_all(box, x1, g1, st.alpha)
        alpha_new, nmv = explength(st.alpha, x1, g1, gf1, gr1, dold, xold, st.nmv)
        d = pick(expdir_key, g1, gf1, gr1)
        x2 = x1 - alpha_new * d
        if project_after:
            x2 = box.project(x2)
        return st.replace(x=x2, alpha=alpha_new, nmv=nmv), xold, gold

    def expansion_projcg(st, Ap, afeas, acg):
        """Unconstrained CG step projected back (MPGPExpansion_ProjCG,
        mpgp.c:334-356); projection happens via expproject=True."""
        x2 = box.project(st.x - acg * st.p)
        return st.replace(x=x2), st.x, st.g

    # ------------------------------------------------------------------ body

    def monitor(st):
        if opts.monitor:
            jax.debug.print(
                "{it:>3} MPGP [{s}] ||gp||={r:.10e},\t||gf||={gf:.10e},\t||gc||={gc:.10e},\talpha={a:.10e}",
                it=st.it,
                s=st.step,
                r=st.rnorm,
                gf=vnorm(st.gf),
                gc=vnorm(st.gc),
                a=st.alpha,
            )
        if opts.monitor_cost:
            # f(x) = 1/2 x'Ax - b'x = 1/2 x'(g - b) with g = Ax - b
            # (QPSMonitorCostFunction, qps.c cost-function monitor)
            jax.debug.print(
                "{it:>3} MPGP f(x)={f:.10e}",
                it=st.it,
                f=0.5 * vdot(st.x, st.g - b),
            )

    def take_cg(st, Ap, pAp, acg):
        acg = acg.astype(st.x.dtype)
        x = st.x - acg * st.p
        g = st.g - acg * Ap
        gf, gc, gr = _grads_all(box, x, g, st.alpha)
        bcg = (vdot(Ap, gf) / pAp).astype(st.x.dtype)
        p = gf - bcg * st.p
        return st.replace(
            x=x, g=g, p=p, gf=gf, gc=gc, gr=gr, ncg=st.ncg + 1, step=jnp.int32(_STEP_CG)
        )

    def take_expansion(st, Ap, pAp, acg, afeas):
        if et == "projcg":
            st2, xold, gold = expansion_projcg(st, Ap, afeas, acg)
        else:
            st2, xold, gold = expansion_std(st, Ap, afeas, expproject)
        g2 = A.mv(st2.x) - b
        st2 = st2.replace(g=g2, nmv=st2.nmv + 1, step=jnp.int32(_STEP_EXP))

        if opts.fallback or opts.fallback2:
            fold = 0.5 * vdot(xold, gold - b)
            f = 0.5 * vdot(st2.x, st2.g - b)

            def handle_increase(s):
                s = s.replace(nfinc=s.nfinc + 1)
                if opts.fallback2:
                    gf2, gc2 = box.grads(s.x, s.g)
                    prop2 = vdot(gc2, gc2) <= gamma2 * vdot(gf2, gf2)
                    do_fall = jnp.logical_not(prop2)
                else:
                    do_fall = jnp.asarray(True)

                def fall(s):
                    # roll back and redo a std-style expansion from the saved
                    # point, then always project (mpgp.c:598-609)
                    s3 = s.replace(x=xold, g=gold)
                    gfo, gco, gro = _grads_all(box, xold, gold, s3.alpha)
                    s3 = s3.replace(gf=gfo, gc=gco, gr=gro)
                    s3, _, _ = expansion_std(s3, Ap, afeas, project_after=False)
                    x3 = box.project(s3.x)
                    g3 = A.mv(x3) - b
                    return s3.replace(
                        x=x3, g=g3, nmv=s3.nmv + 1, nfall=s3.nfall + 1, step=jnp.int32(_STEP_FALL)
                    )

                return jax.lax.cond(do_fall, fall, lambda s: s, s)

            st2 = jax.lax.cond(f > fold, handle_increase, lambda s: s, st2)

        gf, gc, gr = _grads_all(box, st2.x, st2.g, st2.alpha)
        return st2.replace(gf=gf, gc=gc, gr=gr, p=gf, nexp=st2.nexp + 1)

    def proportional_branch(st):
        Ap = A.mv(st.p)
        pAp, gTp = vdots([(st.p, Ap), (st.g, st.p)])
        acg = gTp / pAp
        afeas = box.feas(st.x, st.p)
        st = st.replace(nmv=st.nmv + 1)
        return jax.lax.cond(
            acg <= afeas,
            lambda s: take_cg(s, Ap, pAp, acg),
            lambda s: take_expansion(s, Ap, pAp, acg, afeas),
            st,
        )

    def proportioning_branch(st):
        p = st.gc
        Ap = A.mv(p)
        pAp, gTp = vdots([(p, Ap), (st.g, p)])
        acg = (gTp / pAp).astype(st.x.dtype)
        x = st.x - acg * p
        g = st.g - acg * Ap
        gf, gc, gr = _grads_all(box, x, g, st.alpha)
        return st.replace(
            x=x, g=g, p=gf, gf=gf, gc=gc, gr=gr,
            nmv=st.nmv + 1, nprop=st.nprop + 1, step=jnp.int32(_STEP_PROP),
        )

    nh = int(history)

    def body(st):
        gP = st.gf + st.gc
        if fuse_body:
            # one batched tree for the three same-point reductions (||gP||^2,
            # gc'gc, gf'gf) — each row's summation order identical to the
            # separate calls, so counts/oracles cannot shift
            gPgP, gcTgc, gfTgf = vdots(
                [(gP, gP), (st.gc, st.gc), (st.gf, st.gf)]
            )
            rnorm = jnp.sqrt(gPgP.real)
        else:
            rnorm = vnorm(gP)
            gcTgc = vdot(st.gc, st.gc)
            gfTgf = vdot(st.gf, st.gf)
        st = st.replace(rnorm=rnorm)
        if nh:
            st = st.replace(hist=st.hist.at[jnp.minimum(st.it, nh - 1)].set(rnorm))
        monitor(st)
        reason, aux = conv_test(st.aux, st.it, rnorm, st.x, st.g)
        st = st.replace(reason=reason, aux=aux)

        def advance(st):
            st = jax.lax.cond(
                gcTgc <= gamma2 * gfTgf, proportional_branch, proportioning_branch, st
            )
            return st.replace(it=st.it + 1)

        return jax.lax.cond(st.reason == 0, advance, lambda s: s, st)

    # --------------------------------------------------------------- drive

    rdtype = jnp.dtype(qp.dots_dtype) if qp.dots_dtype else dtype
    x0 = box.project(qp.initial_vector())
    g0 = A.mv(x0) - b
    gf0, gc0, gr0 = _grads_all(box, x0, g0, alpha_init)
    st0 = _State(
        x=x0, g=g0, p=gf0, gf=gf0, gc=gc0, gr=gr0,
        alpha=jnp.asarray(alpha_init, dtype),
        rnorm=jnp.asarray(jnp.inf, rdtype),
        it=jnp.int32(0), reason=jnp.int32(0), step=jnp.int32(_STEP_NONE),
        nmv=jnp.int32(1), ncg=jnp.int32(0), nexp=jnp.int32(0),
        nprop=jnp.int32(0), nfinc=jnp.int32(0), nfall=jnp.int32(0),
        hist=jnp.full((max(nh, 1),), jnp.nan, dtype=rdtype),
        aux=conv_aux,
    )
    st = jax.lax.while_loop(lambda s: s.reason == 0, body, st0)
    return MPRGPResult(
        # the returned iterate is feasible BY CONSTRUCTION in the reference
        # (every MPGP step lands in the box); our CG/proportioning axpys can
        # leak ~1e-20 past an active bound in fp, so project at return —
        # a <=1-ulp change that restores ||min(x-lb,0)|| = 0 exactly (the
        # committed ex3 KKT digits print 0.00e+00 there)
        x=qp.box.project(st.x) if qp.box is not None else st.x,
        reason=st.reason, iterations=st.it, rnorm=st.rnorm,
        nmv=st.nmv, ncg=st.ncg, nexp=st.nexp, nprop=st.nprop,
        nfinc=st.nfinc, nfall=st.nfall, g=st.g, alpha=st.alpha,
        rnorm_history=st.hist if nh else None, aux=st.aux,
    )
