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


def view_convergence(result, solver: str = "mpgp", tol=None,
                     indent: int = 1) -> str:
    """'last QPSSolve ...' + per-solver step counters, with the reference's
    ASCII-viewer indentation (two spaces per level) so the output diffs
    LITERALLY against the committed expected-output files
    (src/tutorials/output/*.out)."""
    pad = "  " * indent
    reason = int(result.reason)
    name = REASON_NAMES.get(reason, str(reason))
    status = "CONVERGED" if reason > 0 else "DIVERGED"
    lines = [
        f"{pad}last QPSSolve {status} due to {name}, KSPReason={reason}, "
        f"required {int(result.iterations)} iterations"
    ]
    pad2 = "  " * (indent + 1)
    if hasattr(result, "nmv"):
        lines.append(f"{pad2}number of Hessian multiplications {int(result.nmv)}")
    if hasattr(result, "ncg"):
        lines += [
            f"{pad2}number of CG steps {int(result.ncg)}",
            f"{pad2}number of expansion steps {int(result.nexp)}",
            f"{pad2}number of proportioning steps {int(result.nprop)}",
        ]
    return "\n".join(lines)


def view_convergence_smalxe(result, indent: int = 1) -> str:
    """QPSViewConvergence_SMALXE (smalxe.c:1000-1019): outer line, inner
    iteration total, M1/eta hit + update counters, then the INNER solver's
    convergence view one level deeper — the exact nesting of the reference's
    ASCII viewer (cf. output/ex3_nullspace.out)."""
    pad2 = "  " * (indent + 1)
    lines = [view_convergence(result, indent=indent)]
    lines += [
        f"{pad2}Total number of inner iterations {int(result.inner_iterations)}",
        f"{pad2}#hits    of M1, eta: {int(result.M1_hits):3d}, {int(result.eta_hits):3d}",
        f"{pad2}#updates of M1, rho: {int(result.M1_updates):3d}, {int(result.rho_updates):3d}",
    ]
    # inner solver view (QPSViewConvergence(smalxe->inner)) one level deeper
    inner_reason = int(result.inner_reason)
    name = REASON_NAMES.get(inner_reason, str(inner_reason))
    status = "CONVERGED" if inner_reason > 0 else "DIVERGED"
    pad3 = "  " * (indent + 2)
    pad4 = "  " * (indent + 3)
    lines += [
        f"{pad3}last QPSSolve {status} due to {name}, KSPReason={inner_reason}, "
        f"required {int(result.inner_iterations)} iterations",
        f"{pad4}number of Hessian multiplications {int(result.nmv)}",
        f"{pad4}number of CG steps {int(result.ncg)}",
        f"{pad4}number of expansion steps {int(result.nexp)}",
        f"{pad4}number of proportioning steps {int(result.nprop)}",
    ]
    return "\n".join(lines)


def view_history(result, solver: str = "QPS") -> str:
    """Per-iteration residual-norm lines from a recorded history buffer
    (the default QPS monitor format, qps.c monitors + residual-history
    arrays qpsimpl.h:62-70).  Solvers record the history when called with
    ``history > 0``."""
    hist = getattr(result, "rnorm_history", None)
    if hist is None:
        return f"(no residual history recorded for this {solver} result)"
    import numpy as np

    h = np.asarray(hist)
    n = min(int(result.iterations) + 1, len(h))
    return "\n".join(
        f"{i:3d} {solver} ||r||={h[i]:.12e}" for i in range(n)
        if not np.isnan(h[i])
    )


def view_kkt(qp: QP, x, g=None, lambda_E=None, lambda_I=None,
             merged_label: bool = False) -> str:
    """KKT residual report for a solved QP.

    ``g`` is the final gradient A x - b (+ B'lambda if the solver worked on the
    Lagrangian); box multipliers are recovered from it as in
    QPComputeMissingBoxMultipliers (qp.c:829-889).  ``merged_label`` prints
    the constraint term as `` + B'*lambda`` — the reference's label when the
    MERGED multiplier is valid (a dualize postSolve populated qp->lambda,
    qp.c:723-727), which is how the committed ex3 output reads.
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
    had_constraint = False
    if lambda_E is not None and qp.BE is not None:
        r = r + qp.BE.rmv(lambda_E)
        had_constraint = True
        if not merged_label:
            kkt_name += " + BE'*lambda_E"
    if lambda_I is not None and qp.BI is not None:
        r = r + qp.BI.rmv(lambda_I)
        had_constraint = True
        if not merged_label:
            kkt_name += " + BI'*lambda_I"
    if merged_label and had_constraint:
        kkt_name += " + B'*lambda"

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
