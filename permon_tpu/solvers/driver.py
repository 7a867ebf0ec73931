"""Solve driver — default solver selection and the public ``solve`` entry.

Mirrors QPSSetDefaultType (reference: src/qps/interface/qps.c:422-455):

- inequality constraints present  -> unsupported here directly (dualize first,
  exactly like the reference which errors with "use QPDualize"),
- equality constraints present    -> SMALXE,
- box constraints only            -> MPRGP,
- unconstrained                   -> CG (the KSP analog).
"""

from __future__ import annotations

from typing import Any, Optional

from ..core.convergence import Tolerances
from ..qp.qp import QP
from .cg import cg
from .mprgp import MPRGPOptions, mprgp


def default_solver_type(qp: QP) -> str:
    if qp.BI is not None:
        raise ValueError(
            "QP with linear inequality constraints cannot be solved directly; "
            "apply dualize() first (reference: QPSSetDefaultType, qps.c:436-438)"
        )
    if qp.BE is not None:
        return "smalxe"
    if qp.box is not None:
        return "mprgp"
    return "cg"


def make_solver(qps_type: Optional[str] = None, tol: Tolerances = Tolerances(),
                deterministic: Optional[bool] = None, **kwargs):
    """Build a jit-compiled solver callable ``f(qp) -> result`` with the
    solver type and options closed over.

    This is the production entry: the ENTIRE solve (eigenvalue estimate,
    while_loop, convergence logic) compiles to one XLA executable, so a call
    is a single device dispatch — on a TPU v5e the fully-jitted MPRGP runs
    ~1.3 ms/iter in f64 and ~microseconds/iter in f32, vs ~8-15 ms/iter when
    the setup runs eagerly op-by-op.  Reuse the returned callable across
    solves with the same shapes to amortize compilation.

    ``deterministic`` (True/False) scopes the fixed-binary-tree reduction
    mode (core/detred.py) to THIS solver's trace — the per-solve switch that
    sidesteps the trace-time-global caveat below; None inherits the global
    mode.

    Caveat: OTHER trace-time flags (notably a later
    ``core.detred.set_deterministic`` toggle) are baked in when the returned
    callable first compiles; toggling them later does NOT retrace an
    already-cached executable.  Set such global configuration BEFORE the
    first call, or build a fresh solver after toggling."""
    import jax

    from ..core.detred import deterministic_mode

    assert qps_type != "tao", "the TAO adapter runs host-side and cannot be jitted"

    def run(qp):
        with deterministic_mode(deterministic):
            return solve(qp, qps_type=qps_type, tol=tol, **kwargs)

    return jax.jit(run)


def solve(qp: QP, qps_type: Optional[str] = None, tol: Tolerances = Tolerances(), **kwargs):
    """Solve the QP with the selected (or default) solver; returns the solver result."""
    qps_type = qps_type or default_solver_type(qp)
    if qps_type in ("mprgp", "mpgp"):
        opts = kwargs.pop("opts", None) or MPRGPOptions(**kwargs)
        return mprgp(qp, opts=opts, tol=tol)
    if qps_type in ("cg", "ksp"):
        return cg(qp, tol=tol, **kwargs)
    if qps_type == "pcpg":
        from .cg import pcpg

        return pcpg(qp, tol=tol, **kwargs)
    if qps_type == "tao":
        from .tao import tao_solve

        return tao_solve(qp, tol=tol, **kwargs)
    if qps_type == "smalxe":
        from ..qp.transforms import Solution, homogenize_eq
        from .smalxe import SMALXEOptions, smalxe

        opts = kwargs.pop("opts", SMALXEOptions(**kwargs))
        # nonzero cE is homogenized away automatically, as in QPSSetUp_SMALXE
        # (smalxe.c:771-779); the shift is applied back to the returned x
        if qp.cE is not None:
            child, post = homogenize_eq(qp)
            res = smalxe(child, opts=opts, tol=tol)
            sol = post(Solution(x=res.x, Bt_lambda=res.Bt_lambda))
            return res.replace(x=sol.x)
        return smalxe(qp, opts=opts, tol=tol)
    raise ValueError(f"unknown solver type {qps_type!r}")
