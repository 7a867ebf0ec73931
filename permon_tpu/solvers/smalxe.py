"""SMALXE — SeMi-monotonic Augmented Lagrangian with adaptive M1/rho/eta.

The equality-constraint outer loop around an inner bound-constrained MPRGP
solve; TPU-native reimplementation of QPSSMALXE (reference:
src/qps/impls/smalxe/smalxe.c).

Structure: the outer loop is a ``lax.while_loop`` whose body performs one full
inner MPRGP solve (itself a nested while_loop) on the penalized QP

    min 1/2 u'(A + rho B'B)u - (b - Btmu)'u   s.t. lb <= u <= ub

followed by the semi-monotonic update of M1 / rho.  The entire solver jits
into one XLA computation; rho, M1 and the multiplier Btmu are traced loop
carries so updates never trigger recompilation.

Faithfully mirrored semantics (these determine iteration-count parity):
- inner convergence test evaluated every inner iteration
  (QPSConverged_Inner_SMALXE, smalxe.c:612-692): recompute ||Bu||, set outer
  rnorm = max(E, G) with E = ||Bu||/rtol_E, set inner atol =
  min(M1*||Bu||, eta), check outer convergence from inside, inner-iteration
  budget = outer max_it minus accumulated, gtol-based state 1 -> 3 transition,
- update rule (QPSSMALXEUpdate_SMALXE, smalxe.c:438-488): M1 /= M1_update only
  when L - (L_old + rho/2 ||Bu||^2) < threshold AND the inner solver stopped
  on the M1 criterion (ATOL); rho *= rho_update (state 1) or rho_update_late
  (state 3, Lagrangian condition waived) only when G <= E; MPRGP's maxeig /
  alpha are rescaled on rho updates (QPSMPGPUpdateMaxEigenvalue),
- multiplier update Btmu += rho_used * B'Bu before each inner solve and once
  after the loop (QPSSMALXEUpdateLambda_SMALXE + loop structure,
  smalxe.c:957-997),

Intentionally NOT ported: the lagged ||Bu|| update
(-qps_smalxe_norm_update_lag*, smalxe.c:288-370) exists to amortize an MPI
Allreduce per inner iteration; on TPU the norm is a fused on-chip reduction
inside the jitted loop (no host round-trip), so the exact update is free and
the lag would only degrade the convergence control.
- defaults M1 = 1e2*||A||, eta = 1e-1*||b||, rho = 1.1*||A||, M1_update 2,
  rho_update 1, rho_update_late 2, rtol_E 1 (smalxe.c:1159-1186).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..core.convergence import ConvergedReason, Tolerances, converged_default
from ..core.eig import max_eigenvalue
from ..core.linop import Penalized
from ..qp.qp import QP
from .mprgp import MPRGPOptions, mprgp


@dataclasses.dataclass(frozen=True)
class SMALXEOptions:
    M1: float = 1e2
    M1_direct: bool = False
    M1_update: float = 2.0
    eta: float = 1e-1
    eta_direct: bool = False
    rho: float = 1.1
    rho_direct: bool = False
    rho_update: float = 1.0
    rho_update_late: float = 2.0
    rtol_E: float = 1.0
    update_threshold: float = 0.0
    maxeig: Optional[float] = None
    maxeig_tol: float = 1e-4
    maxeig_iter: int = 50
    inject_maxeig: bool = False  # set True when BE has orthonormal rows
    #: explicit inner (penalized-operator) maxeig estimate, bypassing the
    #: power method — used by representation-changing callers (the scaled
    #: leaf space) to keep the estimate, and hence iteration counts,
    #: identical to the row-space solve
    maxeig_inner: Optional[Any] = None
    inner_iter_min: int = 1
    inner_no_gtol_stop: int = 0
    knoll: bool = False
    inner: MPRGPOptions = MPRGPOptions()
    inner_max_it: int = 10000
    monitor: bool = False
    #: per-outer-iteration Lagrangian/update report (the reference's
    #: -qps_smalxe_monitor_outer block, smalxe.c:453-461)
    monitor_outer: bool = False


@struct.dataclass
class _InnerAux:
    """Traced context of the coupled inner/outer convergence test."""

    # constants for one inner solve
    M1: jax.Array
    eta: jax.Array
    gtol: jax.Array
    ttol_outer: jax.Array
    atol_outer: jax.Array
    divtol: jax.Array
    norm_rhs_div: jax.Array
    outer_it: jax.Array
    outer_max_it: jax.Array
    budget: jax.Array  # inner_max_it - inner_iter_accu
    rtol_E: jax.Array
    inner_iter_min: jax.Array
    inner_no_gtol_stop: jax.Array
    # evolving
    state: jax.Array  # 1 or 3
    normBu: jax.Array
    enorm: jax.Array
    MNormBu: jax.Array
    outer_rnorm: jax.Array
    outer_reason: jax.Array
    m1_hit: jax.Array
    eta_hit: jax.Array


@struct.dataclass
class SMALXEResult:
    x: jax.Array
    reason: jax.Array
    iterations: jax.Array  # outer iterations
    inner_iterations: jax.Array
    rnorm: jax.Array  # outer max(G, E)
    normBu: jax.Array
    Bt_lambda: jax.Array  # B' mu (eq.-constraint multiplier premultiplied by B')
    rho: jax.Array
    M1: jax.Array
    M1_updates: jax.Array
    rho_updates: jax.Array
    M1_hits: jax.Array
    eta_hits: jax.Array
    # accumulated inner MPRGP statistics
    nmv: jax.Array
    ncg: jax.Array
    nexp: jax.Array
    nprop: jax.Array
    inner_reason: jax.Array
    #: per-OUTER-iteration max(G, E) buffer when called with ``history > 0``
    rnorm_history: Optional[jax.Array] = None


def _make_inner_test(B, cE, monitor, norm_fn=jnp.linalg.norm):
    """The SMALXE inner convergence test (smalxe.c:612-692)."""

    def test(aux: _InnerAux, i, gnorm, u, g):
        Bu = B.mv(u)
        if cE is not None:
            Bu = Bu - cE
        normBu = norm_fn(Bu)
        enorm = normBu / aux.rtol_E
        outer_rnorm = jnp.maximum(enorm, gnorm)
        MNormBu = aux.M1 * normBu
        inner_atol = jnp.minimum(MNormBu, aux.eta)
        aux = aux.replace(normBu=normBu, enorm=enorm, MNormBu=MNormBu, outer_rnorm=outer_rnorm)
        if monitor:
            jax.debug.print(
                "  {i:>4}  G={g:.8e}  E={e:.8e}  atol_inner={a:.8e}",
                i=i, g=gnorm, e=enorm, a=inner_atol,
            )

        # outer convergence checked from inside the inner loop
        outer_reason = converged_default(
            aux.outer_it, outer_rnorm,
            ttol=aux.ttol_outer, atol=aux.atol_outer,
            divtol=aux.divtol, norm_rhs_div=aux.norm_rhs_div, max_it=aux.outer_max_it,
        )

        over_budget = i > aux.budget
        nan = jnp.isnan(gnorm) | jnp.isinf(gnorm)
        atol_stop = gnorm < inner_atol
        m1_crit = MNormBu < aux.eta

        # gtol-based stop / state 1 -> 3 transition.  The block is skipped
        # entirely while state==3 holds and the iteration floor / no-stop flag
        # applies (smalxe.c:673); gtol only counts when G <= E (smalxe.c:675-677)
        early_stop = over_budget | nan | (outer_reason != 0) | atol_stop
        state3_wait = (aux.state == 3) & (
            (i < aux.inner_iter_min) | (aux.inner_no_gtol_stop > 0)
        )
        gtol_hit = (
            jnp.logical_not(early_stop)
            & jnp.logical_not(state3_wait)
            & (gnorm <= aux.gtol)
            & (gnorm <= enorm)
        )
        gtol_stop = gtol_hit & (aux.inner_no_gtol_stop < 2)
        new_state = jnp.where(gtol_hit, 3, aux.state).astype(jnp.int32)

        reason = jnp.where(
            over_budget,
            ConvergedReason.DIVERGED_ITS,
            jnp.where(
                nan,
                ConvergedReason.DIVERGED_NANORINF,
                jnp.where(
                    outer_reason > 0,
                    ConvergedReason.CONVERGED_HAPPY_BREAKDOWN,  # KSPReason=7
                    jnp.where(
                        outer_reason < 0,
                        ConvergedReason.DIVERGED_BREAKDOWN,  # -5
                        jnp.where(
                            atol_stop,
                            ConvergedReason.CONVERGED_ATOL,
                            jnp.where(gtol_stop, ConvergedReason.CONVERGED_RTOL, 0),
                        ),
                    ),
                ),
            ),
        ).astype(jnp.int32)

        outer_reason_final = jnp.where(
            over_budget | nan,
            jnp.int32(-5),  # KSP_DIVERGED_BREAKDOWN propagated to outer
            outer_reason,
        )
        aux = aux.replace(
            state=new_state,
            outer_reason=outer_reason_final,
            m1_hit=(reason == ConvergedReason.CONVERGED_ATOL) & m1_crit,
            eta_hit=(reason == ConvergedReason.CONVERGED_ATOL) & jnp.logical_not(m1_crit),
        )
        return reason, aux

    return test


def smalxe(
    qp: QP,
    opts: SMALXEOptions = SMALXEOptions(),
    tol: Tolerances = Tolerances(),
    projector_apply_P=None,
    history: int = 0,
) -> SMALXEResult:
    """Solve min 1/2 x'Ax - b'x s.t. BE x = 0 (+ box constraints).

    A nonzero cE must be homogenized away first (the reference auto-applies
    QPTHomogenizeEq in QPSSetUp_SMALXE, smalxe.c:771-779; the transform lives
    in permon_tpu.qp.transforms and the driver applies it).
    ``projector_apply_P`` enables the Knoll initial guess u0 = P b.
    """
    assert qp.BE is not None, "SMALXE requires equality constraints"
    from ..core.precision import reducers

    A, B, b = qp.A, qp.BE, qp.b
    vdot, vnorm = reducers(qp.dots_dtype)  # f64-promoted dots under 'mixed'
    dtype = b.dtype
    rdtype = jnp.dtype(qp.dots_dtype) if qp.dots_dtype else dtype

    # --- parameter initialization (QPSSetUp_SMALXE, smalxe.c:800-830) -------
    normb = vnorm(b)
    eta = jnp.asarray(opts.eta, dtype) if opts.eta_direct else opts.eta * normb
    need_maxeig = (not opts.M1_direct) or (not opts.rho_direct) or opts.inject_maxeig
    if opts.maxeig is not None:
        maxeig_A = jnp.asarray(opts.maxeig, dtype)
    elif need_maxeig:
        maxeig_A = max_eigenvalue(
            A, v0=jnp.ones(A.shape[1], dtype), tol=opts.maxeig_tol,
            maxits=opts.maxeig_iter,
        )
    else:
        maxeig_A = jnp.asarray(0.0, dtype)
    M1_init = jnp.asarray(opts.M1, dtype) if opts.M1_direct else opts.M1 * maxeig_A
    rho_init = jnp.asarray(opts.rho, dtype) if opts.rho_direct else opts.rho * maxeig_A

    gtol = tol.rtol * normb
    ttol_outer = jnp.maximum(tol.rtol * normb, tol.atol)

    # inner MPRGP maxeig handling (smalxe.c:869-874): injected estimate
    # max(rho, maxeig_A) when G is orthonormal, else power method on the
    # penalized operator (computed once; rescaled on rho updates)
    pen0 = Penalized(a=A, b=B, rho=rho_init)
    if opts.maxeig_inner is not None:
        maxeig_inner0 = jnp.asarray(opts.maxeig_inner, dtype)
    elif opts.inject_maxeig:
        maxeig_inner0 = jnp.maximum(rho_init, maxeig_A)
    else:
        maxeig_inner0 = max_eigenvalue(
            pen0, v0=jnp.ones(A.shape[1], dtype), tol=opts.maxeig_tol,
            maxits=opts.maxeig_iter,
        )
    alpha_user = 2.0 if opts.inner.alpha_user is None else opts.inner.alpha_user
    alpha0 = (
        jnp.asarray(alpha_user, dtype)
        if opts.inner.alpha_direct
        else alpha_user / maxeig_inner0
    )

    inner_test = _make_inner_test(B, None, opts.monitor, norm_fn=vnorm)

    u0 = qp.initial_vector()
    if opts.knoll and projector_apply_P is not None:
        u0 = projector_apply_P(b)

    def btbu(u):
        return B.rmv(B.mv(u))

    def lagrangian(u, b_inner, rho):
        pen = Penalized(a=A, b=B, rho=rho)
        return 0.5 * vdot(u, pen.mv(u)) - vdot(b_inner, u)

    # outer carry
    carry0 = dict(
        u=u0,
        Btmu=jnp.zeros_like(b),
        rho=rho_init,
        rho_lambda=rho_init,  # rho used in the last inner solve (for Btmu update)
        M1=M1_init,
        state=jnp.int32(1),
        Lag_old=lagrangian(u0, b, rho_init),
        alpha=alpha0,
        maxeig_inner=maxeig_inner0,
        it=jnp.int32(0),
        reason=jnp.int32(0),
        accu=jnp.int32(0),
        rnorm=jnp.asarray(jnp.inf, rdtype),
        normBu=vnorm(B.mv(u0)),
        m1_updates=jnp.int32(0),
        rho_updates=jnp.int32(0),
        m1_hits=jnp.int32(0),
        eta_hits=jnp.int32(0),
        nmv=jnp.int32(0),
        ncg=jnp.int32(0),
        nexp=jnp.int32(0),
        nprop=jnp.int32(0),
        inner_reason=jnp.int32(0),
        hist=jnp.full((max(int(history), 1),), jnp.nan, dtype=rdtype),
    )
    nh = int(history)

    def body(c):
        # multiplier update with the rho of the previous inner solve
        # (QPSSMALXEUpdateLambda_SMALXE)
        Btmu = c["Btmu"] + c["rho_lambda"] * btbu(c["u"])
        b_inner = b - Btmu

        aux0 = _InnerAux(
            M1=c["M1"], eta=eta, gtol=jnp.asarray(gtol, dtype),
            ttol_outer=ttol_outer, atol_outer=jnp.asarray(tol.atol, dtype),
            divtol=jnp.asarray(tol.divtol, dtype),
            norm_rhs_div=vnorm(b_inner),
            outer_it=c["it"], outer_max_it=jnp.int32(tol.max_it),
            budget=jnp.int32(opts.inner_max_it) - c["accu"],
            rtol_E=jnp.asarray(opts.rtol_E, dtype),
            inner_iter_min=jnp.int32(opts.inner_iter_min),
            inner_no_gtol_stop=jnp.int32(opts.inner_no_gtol_stop),
            state=c["state"], normBu=c["normBu"],
            enorm=jnp.asarray(jnp.inf, rdtype), MNormBu=jnp.asarray(jnp.inf, rdtype),
            outer_rnorm=jnp.asarray(jnp.inf, rdtype), outer_reason=jnp.int32(0),
            m1_hit=jnp.asarray(False), eta_hit=jnp.asarray(False),
        )

        qp_inner = qp.replace(
            A=Penalized(a=A, b=B, rho=c["rho"]),
            b=b_inner,
            x0=c["u"],
            BE=None,
            cE=None,
        )
        res = mprgp(
            qp_inner,
            opts=opts.inner,
            conv_test=inner_test,
            conv_aux=aux0,
            maxeig=c["maxeig_inner"],
            alpha0=c["alpha"],
        )
        aux = res.aux
        u, it = res.x, c["it"] + 1

        # Lagrangian-based M1 / rho adaptation (QPSSMALXEUpdate_SMALXE)
        Lag = lagrangian(u, b_inner, c["rho"])
        t = 0.5 * c["rho"] * aux.normBu**2
        lag_flag = (Lag - (c["Lag_old"] + t)) < opts.update_threshold
        if opts.monitor_outer:
            import jax as _jax

            _jax.debug.print(
                "END   outer {it:>3}:  L={L:+.10e}  L-L_old={d1:+.3e}  "
                "L-(L_old+1/2*rho*||Bu||^2)={d2:+.3e} (flag={f})  "
                "1/2*rho*||Bu||^2={t:.3e}\n"
                "          max(G,E)={rn:.8e} ttol_outer={tt:.8e}  |  "
                "G={g:.8e} min(M1||Bu||,eta)={ia:.8e}  |  gtol={gt:.8e}",
                it=it, L=Lag, d1=Lag - c["Lag_old"],
                d2=Lag - (c["Lag_old"] + t), f=lag_flag, t=t,
                rn=aux.outer_rnorm, tt=aux.ttol_outer, g=res.rnorm,
                ia=jnp.minimum(aux.MNormBu, eta), gt=aux.gtol,
            )
        m1_do = lag_flag & (opts.M1_update != 1.0) & (res.reason == ConvergedReason.CONVERGED_ATOL)
        M1 = jnp.where(m1_do, c["M1"] / opts.M1_update, c["M1"])

        # the state may have transitioned during this inner solve; the rho
        # update reads the CURRENT state (QPSSMALXEUpdateRho_SMALXE)
        G = res.rnorm
        rho_upd = jnp.where(aux.state == 3, opts.rho_update_late, opts.rho_update)
        rho_flag = jnp.where(aux.state == 3, True, lag_flag)
        rho_do = (G <= aux.enorm) & rho_flag & (rho_upd != 1.0)
        rho = jnp.where(rho_do, c["rho"] * rho_upd, c["rho"])
        # propagate to the inner MPRGP spectral data (QPSMPGPUpdateMaxEigenvalue)
        upd = jnp.where(rho_do, rho_upd, 1.0)
        maxeig_inner = c["maxeig_inner"] * upd
        alpha = res.alpha if opts.inner.alpha_direct else (res.alpha / upd).astype(dtype)

        outer_reason = jnp.where(
            (aux.outer_reason == 0) & (it >= tol.max_it),
            jnp.int32(ConvergedReason.DIVERGED_ITS),
            aux.outer_reason,
        )

        hist = c["hist"]
        if nh:
            hist = hist.at[jnp.minimum(it - 1, nh - 1)].set(aux.outer_rnorm)
        return dict(
            u=u, Btmu=Btmu, rho=rho, rho_lambda=c["rho"], M1=M1,
            state=aux.state, Lag_old=Lag, alpha=alpha, maxeig_inner=maxeig_inner,
            it=it, reason=outer_reason, accu=c["accu"] + res.iterations,
            rnorm=aux.outer_rnorm, normBu=aux.normBu, hist=hist,
            m1_updates=c["m1_updates"] + m1_do.astype(jnp.int32),
            rho_updates=c["rho_updates"] + rho_do.astype(jnp.int32),
            m1_hits=c["m1_hits"] + aux.m1_hit.astype(jnp.int32),
            eta_hits=c["eta_hits"] + aux.eta_hit.astype(jnp.int32),
            nmv=c["nmv"] + res.nmv, ncg=c["ncg"] + res.ncg,
            nexp=c["nexp"] + res.nexp, nprop=c["nprop"] + res.nprop,
            inner_reason=res.reason,
        )

    c = jax.lax.while_loop(lambda c: c["reason"] == 0, body, carry0)
    # final multiplier update of the aborted iteration (smalxe.c:958-961)
    Bt_lambda = c["Btmu"] + c["rho_lambda"] * btbu(c["u"])

    return SMALXEResult(
        x=c["u"], reason=c["reason"], iterations=c["it"], inner_iterations=c["accu"],
        rnorm=c["rnorm"], normBu=c["normBu"], Bt_lambda=Bt_lambda,
        rho=c["rho"], M1=c["M1"],
        M1_updates=c["m1_updates"], rho_updates=c["rho_updates"],
        M1_hits=c["m1_hits"], eta_hits=c["eta_hits"],
        nmv=c["nmv"], ncg=c["ncg"], nexp=c["nexp"], nprop=c["nprop"],
        inner_reason=c["inner_reason"],
        rnorm_history=c["hist"] if nh else None,
    )
