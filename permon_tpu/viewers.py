"""Text viewers reproducing the reference's diagnostic output formats.

The reference test suite's oracle is filtered stdout: convergence reason,
iteration/step counts, and KKT residual lines (reference: gmakefile.test,
tutorial TEST blocks filter `grep -e CONVERGED -e number -e "r ="`).  These
functions generate the same lines so parity can be diffed directly.

Formats mirrored from QPSViewConvergence (qps.c:987-996),
QPSViewConvergence_MPGP (mpgp.c:750-770), QPViewKKT (qp.c:245-370) and
QPCViewKKT_Box (qpcbox.c:332-427).
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp

from .core.convergence import REASON_NAMES
from .qp.qp import QP


def _fmt(x) -> str:
    return f"{float(x):.2e}"


def view_convergence(result, solver: str = "mpgp", tol=None) -> str:
    """'last QPSSolve ...' + per-solver step counters."""
    reason = int(result.reason)
    name = REASON_NAMES.get(reason, str(reason))
    status = "CONVERGED" if reason > 0 else "DIVERGED"
    lines = [
        f"last QPSSolve {status} due to {name}, KSPReason={reason}, "
        f"required {int(result.iterations)} iterations"
    ]
    if hasattr(result, "nmv"):
        lines.append(f"number of Hessian multiplications {int(result.nmv)}")
    if hasattr(result, "ncg"):
        lines += [
            f"number of CG steps {int(result.ncg)}",
            f"number of expansion steps {int(result.nexp)}",
            f"number of proportioning steps {int(result.nprop)}",
        ]
    if hasattr(result, "inner_iterations"):
        lines.append(f"number of inner iterations {int(result.inner_iterations)}")
    return "\n".join(lines)


def view_convergence_smalxe(result) -> str:
    """QPSViewConvergence_SMALXE (smalxe.c:1000-1019): outer/inner iteration
    accounting plus the M1/eta hit counters of the adaptive update rule."""
    lines = [view_convergence(result)]
    lines += [
        f"SMALXE: inner iterations {int(result.inner_iterations)}, "
        f"M1 hits {int(result.M1_hits)}, eta hits {int(result.eta_hits)}",
        f"SMALXE: M1 updates {int(result.M1_updates)}, rho updates "
        f"{int(result.rho_updates)}, final M1 {float(result.M1):.3e}, "
        f"rho {float(result.rho):.3e}",
    ]
    return "\n".join(lines)


def view_kkt(qp: QP, x, g=None, lambda_E=None, lambda_I=None) -> str:
    """KKT residual report for a solved QP.

    ``g`` is the final gradient A x - b (+ B'lambda if the solver worked on the
    Lagrangian); box multipliers are recovered from it as in
    QPComputeMissingBoxMultipliers (qp.c:829-889).
    """
    lines: List[str] = []
    b = qp.b
    normb = jnp.linalg.norm(b)
    if g is None:
        g = qp.A.mv(x) - b

    r = g
    kkt_name = "A*x - b"
    llb = lub = None
    if qp.box is not None:
        llb, lub = qp.box.multipliers_from_lagrangian(r)
        if qp.box.has_lb:
            r = r - llb
            kkt_name += " - lambda_lb"
        if qp.box.has_ub:
            r = r + lub
            kkt_name += " + lambda_ub"
    if lambda_E is not None and qp.BE is not None:
        r = r + qp.BE.rmv(lambda_E)
        kkt_name += " + BE'*lambda_E"
    if lambda_I is not None and qp.BI is not None:
        r = r + qp.BI.rmv(lambda_I)
        kkt_name += " + BI'*lambda_I"

    norm = jnp.linalg.norm(r)
    lines.append(f"r = ||{kkt_name}|| = {_fmt(norm)}    rO/||b|| = {_fmt(norm / normb)}")

    if qp.BE is not None:
        rE = qp.BE.mv(x)
        label = "||BE*x||            "
        if qp.cE is not None:
            rE = rE - qp.cE
            label = "||BE*x-cE||         "
        nE = jnp.linalg.norm(rE)
        lines.append(f"r = {label} = {_fmt(nE)}    r/||b|| = {_fmt(nE / normb)}")

    if qp.BI is not None:
        rI = qp.BI.mv(x)
        if qp.cI is not None:
            rI = rI - qp.cI
        nI = jnp.linalg.norm(jnp.maximum(rI, 0.0))
        lines.append(f"r = ||max(BI*x-cI,0)||   = {_fmt(nI)}    r/||b|| = {_fmt(nI / normb)}")
        if lambda_I is not None:
            nL = jnp.linalg.norm(jnp.minimum(lambda_I, 0.0))
            lines.append(f"r = ||min(lambda_I,0)||  = {_fmt(nL)}    r/||b|| = {_fmt(nL / normb)}")
            comp = jnp.abs(jnp.vdot(lambda_I, rI))
            lines.append(f"r = |lambda_I'*(BI*x-cI)|= {_fmt(comp)}    r/||b|| = {_fmt(comp / normb)}")

    if qp.box is not None:
        for label, val in qp.box.kkt_terms(x, llb, lub):
            lines.append(f"r = {label} = {_fmt(val)}    r/||b|| = {_fmt(val / normb)}")
    return "\n".join(lines)


def _op_info(name: str, op) -> str:
    """One MatPrintInfo-style line: name, type, shape, dtype."""
    import jax

    if op is None:
        return f"{name:<8} = None"
    if hasattr(op, "shape") and not hasattr(op, "mv"):  # vector / array
        return (
            f"{name:<8} Vec  shape={tuple(op.shape)} dtype={op.dtype}"
        )
    import jax.numpy as _jnp

    leaves = [l for l in jax.tree_util.tree_leaves(op) if hasattr(l, "dtype")]
    floats = [l for l in leaves if _jnp.issubdtype(l.dtype, _jnp.floating)]
    dt = (floats or leaves)[0].dtype if leaves else "?"
    return (
        f"{name:<8} {type(op).__name__:<22} shape={tuple(op.shape)} dtype={dt}"
    )


def view_qp(qp: QP, title: str = "QP") -> str:
    """Pipeline-stage object info — the -permon_object_info analog
    (MatPrintInfo/VecPrintInfo dump in QPTDualizeView_Private,
    reference: qptransform.c:694-779): one line per operator/vector of the
    QP with type, shape and dtype, so a transform chain can be audited
    stage by stage."""
    lines = [f"*** {title}:"]
    lines.append(_op_info("A", qp.A))
    lines.append(_op_info("b", qp.b))
    for nm in ("BE", "cE", "BI", "cI", "R"):
        v = getattr(qp, nm)
        if v is not None:
            lines.append(_op_info(nm, v))
    if qp.box is not None:
        lines.append(_op_info("lb", qp.box.lb))
        lines.append(_op_info("ub", qp.box.ub))
    if qp.pf is not None:
        lines.append(_op_info("pf.G", qp.pf.G))
    lines.append("***")
    return "\n".join(lines)


def view_chain(steps, title: str = "QP chain") -> str:
    """Object info for a whole transform chain: ``steps`` is the
    [(child_qp, post_solve), ...] list the transforms build (the
    QPChainView analog, qpchain.c)."""
    out = [f"=== {title} ({len(steps)} stages)"]
    for i, (child, _post) in enumerate(steps):
        out.append(view_qp(child, title=f"stage {i}"))
    return "\n".join(out)
