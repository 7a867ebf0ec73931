"""The QP problem object.

Immutable pytree mirroring the data of the reference QP struct
(reference: include/permon/private/qpimpl.h:6-57, src/qp/interface/qp.c):

    min 1/2 x'Ax - b'x
    s.t. BE x = cE,  BI x <= cI,  lb <= x <= ub

plus the nullspace basis R of A (for singular TFETI stiffness operators).
Transforms (dualize, homogenize, ...) are ordinary functions producing a new
QP and a post_solve callback instead of the reference's mutable parent/child
chain (src/qp/interface/qpchain.c).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..core.linop import LinearOperator, aslinearoperator
from ..qpc.box import BoxConstraint


@struct.dataclass
class QP:
    A: Any  # LinearOperator — the Hessian
    b: jax.Array  # rhs (objective is 1/2 x'Ax - b'x)
    x0: Optional[jax.Array] = None  # initial guess
    box: Optional[BoxConstraint] = None
    BE: Any = None  # equality constraint operator
    cE: Optional[jax.Array] = None
    BI: Any = None  # inequality constraint operator (BI x <= cI)
    cI: Optional[jax.Array] = None
    R: Any = None  # operator whose columns span ker(A)
    pf: Any = None  # Projector factory over BE (the QPPF analog, lazily set)
    #: reduction-promotion dtype for solver dots/norms (mixed precision:
    #: f32 state + f64 reductions; see core/precision.qp_with_precision)
    dots_dtype: Optional[str] = struct.field(pytree_node=False, default=None)

    @classmethod
    def create(cls, A, b, x0=None, lb=None, ub=None, BE=None, cE=None, BI=None, cI=None, R=None) -> "QP":
        A = aslinearoperator(A)
        b = jnp.asarray(b, dtype=jnp.result_type(float))
        box = None
        if lb is not None or ub is not None:
            box = BoxConstraint.create(A.shape[1], lb, ub)
        if BE is not None:
            BE = aslinearoperator(BE)
        if BI is not None:
            BI = aslinearoperator(BI)
        if R is not None:
            R = aslinearoperator(R)
        return cls(A=A, b=b, x0=x0, box=box, BE=BE, cE=cE, BI=BI, cI=cI, R=R)

    @property
    def n(self) -> int:
        return self.A.shape[1]

    def with_precision(self, policy: str) -> "QP":
        """Apply a whole-QP precision policy: 'f32' casts operator storage,
        rhs, bounds and constraints to f32 (iterates follow); 'mixed' is f32
        state with every solver dot/norm promoted to f64; 'bf16_mixed' adds
        bf16 operator storage behind an f32 vector interface.  See
        :func:`permon_tpu.core.precision.qp_with_precision`."""
        from ..core.precision import qp_with_precision

        return qp_with_precision(self, policy)

    def initial_vector(self) -> jax.Array:
        if self.x0 is not None:
            return jnp.asarray(self.x0, dtype=self.b.dtype)
        return jnp.zeros_like(self.b)

    # --- objective / gradient (reference: qp.c:913-993) ----------------------

    def objective(self, x) -> jax.Array:
        return 0.5 * jnp.vdot(x, self.A.mv(x)) - jnp.vdot(self.b, x)

    def gradient(self, x) -> jax.Array:
        return self.A.mv(x) - self.b

    def objective_from_gradient(self, x, g) -> jax.Array:
        """f = 1/2 x.(g - b) given g = Ax - b (reference: qp.c:981-994)."""
        return 0.5 * jnp.vdot(x, g - self.b)

    def lagrangian_gradient(self, x, lambda_E=None, lambda_I=None,
                            llb=None, lub=None) -> jax.Array:
        """r = Ax - b + BE'lE + BI'lI - llb + lub
        (QPComputeLagrangianGradient, qp.c)."""
        r = self.gradient(x)
        if lambda_E is not None and self.BE is not None:
            r = r + self.BE.rmv(lambda_E)
        if lambda_I is not None and self.BI is not None:
            r = r + self.BI.rmv(lambda_I)
        if llb is not None:
            r = r - llb
        if lub is not None:
            r = r + lub
        return r

    def compute_missing_eq_multiplier(self, x) -> jax.Array:
        """Least-squares lE = (BE BE')^{-1} BE (b - Ax), the minimizer of
        ||Ax - b + BE'lE|| (QPComputeMissingEqMultiplier, qp.c — the
        reference applies its QPPF HalfQ to -g the same way)."""
        assert self.BE is not None
        from .projector import Projector

        pf = self.pf if self.pf is not None else Projector.create(self.BE)
        return pf.apply_half_q(-self.gradient(x))

    def compute_missing_box_multipliers(self, x, g=None):
        """(llb, lub) from the Lagrangian gradient r = Ax - b at the active
        bounds (QPComputeMissingBoxMultipliers, qp.c + qpcbox.c:150-172)."""
        assert self.box is not None
        r = g if g is not None else self.gradient(x)
        return self.box.multipliers_from_lagrangian(r)

    def compare_eq_multiplier_with_least_square(self, x, lambda_E) -> jax.Array:
        """||lE - lE_LS|| (QPCompareEqMultiplierWithLeastSquare, qp.c)."""
        return jnp.linalg.norm(lambda_E - self.compute_missing_eq_multiplier(x))
