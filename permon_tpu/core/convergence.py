"""Convergence testing — reasons, tolerances, and the default test.

Reproduces the logic of QPSConvergedDefault (reference:
src/qps/interface/qps.c:675-714) with the same reason codes as PETSc's
KSPConvergedReason so output parity checks ("KSPReason=2") line up.
Defaults rtol 1e-5, atol 1e-50, divtol 1e4, max_it 10000 (qps.c:73-76).
"""

from __future__ import annotations

import enum
from typing import Optional

import jax.numpy as jnp
from flax import struct


class ConvergedReason(enum.IntEnum):
    ITERATING = 0
    CONVERGED_RTOL = 2
    CONVERGED_ATOL = 3
    CONVERGED_ITS = 4
    #: inner solver stopped because the OUTER test passed (SMALXE inner;
    #: prints as KSPReason=7 in the reference .out files)
    CONVERGED_HAPPY_BREAKDOWN = 7
    DIVERGED_NULL = -2
    DIVERGED_ITS = -3
    DIVERGED_DTOL = -4
    DIVERGED_BREAKDOWN = -5
    DIVERGED_NANORINF = -9

    @property
    def converged(self) -> bool:
        return self.value > 0

    def describe(self) -> str:
        return self.name.replace("CONVERGED_ITS", "CONVERGED_MAXIT")


REASON_NAMES = {r.value: r.name for r in ConvergedReason}


@struct.dataclass
class Tolerances:
    rtol: float = struct.field(pytree_node=False, default=1e-5)
    atol: float = struct.field(pytree_node=False, default=1e-50)
    divtol: float = struct.field(pytree_node=False, default=1e4)
    max_it: int = struct.field(pytree_node=False, default=10000)


def converged_default(it, rnorm, *, ttol, atol, divtol, norm_rhs_div, max_it):
    """Return the reason code as an int32 traced scalar.

    Test order mirrors the reference exactly (qps.c:693-713):
    max-iterations first, then NaN/Inf, then ttol = max(rtol*||b||, atol)
    (with ATOL taking precedence if rnorm < atol), then divergence on
    rnorm >= divtol * ||b_div||.
    """
    nan = jnp.isnan(rnorm) | jnp.isinf(rnorm)
    conv = rnorm <= ttol
    conv_atol = rnorm < atol
    div = rnorm >= divtol * norm_rhs_div
    reason = jnp.where(
        it > max_it,
        ConvergedReason.DIVERGED_ITS,
        jnp.where(
            nan,
            ConvergedReason.DIVERGED_NANORINF,
            jnp.where(
                conv,
                jnp.where(conv_atol, ConvergedReason.CONVERGED_ATOL, ConvergedReason.CONVERGED_RTOL),
                jnp.where(div, ConvergedReason.DIVERGED_DTOL, ConvergedReason.ITERATING),
            ),
        ),
    )
    return reason.astype(jnp.int32)


def make_history_test(b, tol: Tolerances, size: int):
    """Build a (conv_test, aux0) pair recording the residual-norm history in a
    fixed-size device buffer — the QPS residual-history arrays
    (qpsimpl.h:62-70) done jit-compatibly.  Pass to solvers accepting the
    ``conv_test``/``conv_aux`` hook (mprgp); read back with
    :func:`history_from_aux`."""
    norm_rhs = jnp.linalg.norm(b)
    ttol = jnp.maximum(tol.rtol * norm_rhs, tol.atol)

    def conv_test(aux, it, rnorm, x, g):
        hist = aux
        hist = hist.at[jnp.minimum(it, size - 1)].set(rnorm)
        reason = converged_default(
            it, rnorm, ttol=ttol, atol=tol.atol, divtol=tol.divtol,
            norm_rhs_div=norm_rhs, max_it=tol.max_it,
        )
        return reason, hist

    aux0 = jnp.full((size,), jnp.nan, dtype=jnp.result_type(float))
    return conv_test, aux0


def history_from_aux(aux, iterations):
    """Trim the recorded history to the iterations actually performed."""
    import numpy as np

    h = np.asarray(aux)
    n = int(iterations) + 1
    return h[: min(n, len(h))]
