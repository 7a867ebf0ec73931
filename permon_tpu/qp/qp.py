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
