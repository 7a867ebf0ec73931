"""Largest-eigenvalue estimation by the power method.

Mirrors the semantics of MatGetMaxEigenvalue (reference:
src/mat/interface/permonmatutils.c:442-530): deterministic all-ones start
vector, Rayleigh-quotient estimate lambda = (v, Av)/(v, v), relative-change
stopping test, iterate update v <- Av / ||v||, and a pseudo-random restart of
Av when the iterate hits the nullspace (lambda < machine eps).

Runs as a single jitted ``lax.while_loop`` — one matvec and one fused pair of
dot products per iteration.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def max_eigenvalue(A, v0=None, tol: float = 1e-4, maxits: int = 50):
    """Estimate the largest eigenvalue of symmetric positive semidefinite A.

    Defaults (tol 1e-4, 50 iterations) follow the reference
    (permonmatutils.c:474-475). Returns a scalar jax array.
    """
    n = A.shape[1]
    if v0 is None:
        dtype = jnp.result_type(float)
        v0 = jnp.ones(n, dtype=dtype)
    else:
        dtype = jnp.asarray(v0).dtype  # run at the iterate's precision

    def cond(carry):
        i, v, lam, done = carry
        return jnp.logical_and(i <= maxits, jnp.logical_not(done))

    def body(carry):
        i, v, lam0, _ = carry
        av = A.mv(v)
        vav = jnp.vdot(v, av)
        vv = jnp.vdot(v, v)
        lam = vav / vv
        # nullspace hit: restart direction pseudo-randomly (reference
        # permonmatutils.c:494-505 uses a PETSc rand48 vector; any full-rank
        # perturbation restores progress, exact values are irrelevant)
        hit = lam < jnp.finfo(dtype).eps
        av = jax.lax.cond(
            hit,
            lambda: jax.random.uniform(jax.random.fold_in(jax.random.PRNGKey(0), i), (n,), dtype),
            lambda: av,
        )
        err = jnp.abs(lam - lam0)
        relerr = err / jnp.abs(lam)
        done = relerr < tol
        v_next = av / jnp.sqrt(vv)
        return i + 1, v_next, lam, done

    _, _, lam, _ = jax.lax.while_loop(cond, body, (1, v0, jnp.zeros((), dtype), False))
    return lam
