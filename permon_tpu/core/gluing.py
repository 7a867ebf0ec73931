"""Star-forest gluing operator — the MATGLUING analog.

The reference's MATGLUING stores B' directly as a PetscSF (roots = lambda
entries, leaves = signed local dof contributions): MatMult = SFBcast +
scaled scatter, MatMultTranspose = pointwise multiply + SFReduce(SUM)
(reference: src/mat/impls/gluing/gluing.c:47-159, opt-in by -MATGLUING_ON).

On TPU the star forest is two static index arrays and the reduce is a
``jax.ops.segment_sum`` — a single fused scatter-add kernel, with the
cross-device reduction lowered to one psum when the leaf axis is sharded.
Compared with :class:`permon_tpu.core.extension.SubdomainExtension` (the
MATEXTENSION analog, batched per-subdomain), this flat-leaf layout suits
irregular decompositions where per-subdomain padding would be wasteful.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .linop import LinearOperator


@struct.dataclass
class Gluing(LinearOperator):
    """B as leaves: entry t contributes ``vals[t] * u[dofs[t]]`` to dual
    entry ``lams[t]`` (and transposely for B')."""

    lams: jax.Array  # (nnz,) int32 dual (root) indices
    dofs: jax.Array  # (nnz,) int32 decomposed-primal (leaf) indices
    vals: jax.Array  # (nnz,)
    m_dual: int = struct.field(pytree_node=False)
    n_primal: int = struct.field(pytree_node=False)

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.m_dual, self.n_primal)

    @classmethod
    def from_coo(cls, rows, cols, vals, m: int, n: int) -> "Gluing":
        return cls(
            lams=jnp.asarray(np.asarray(rows), dtype=jnp.int32),
            dofs=jnp.asarray(np.asarray(cols), dtype=jnp.int32),
            vals=jnp.asarray(np.asarray(vals)),
            m_dual=int(m), n_primal=int(n),
        )

    def mv(self, u):
        """B u — leaf gather, multiply, root reduce (SFReduce(SUM))."""
        contrib = self.vals * u[self.dofs]
        return jax.ops.segment_sum(contrib, self.lams, num_segments=self.m_dual)

    def rmv(self, lam):
        """B' lambda — root bcast, multiply, leaf scatter-add (SFBcast +
        scaled scatter, gluing.c:47-81)."""
        contrib = self.vals * lam[self.lams]
        return jax.ops.segment_sum(contrib, self.dofs, num_segments=self.n_primal)

    def todense(self):
        out = jnp.zeros((self.m_dual, self.n_primal), dtype=self.vals.dtype)
        return out.at[self.lams, self.dofs].add(self.vals)
