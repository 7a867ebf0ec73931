"""Block-diagonal operators — the MATBLOCKDIAG analog.

One dense block per subdomain, stored batched (ns, nl, nl) so the matvec is a
single batched MXU contraction with zero cross-block communication — exactly
the property the reference exploits for the TFETI stiffness K = diag(K_1..K_s)
(reference: src/mat/impls/blockdiag/matblockdiag.c:190-233).  Under a device
mesh the batch axis is sharded over subdomains (shard_map with no collectives).

Rectangular blocks (``BlockColumns``) cover the per-subdomain nullspace bases
R = diag(R_1..R_s) of floating subdomains.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from .linop import LinearOperator


@struct.dataclass
class BlockDiagDense(LinearOperator):
    """y = diag(K_1..K_s) x with equal-size dense blocks (ns, nl, nl)."""

    blocks: jax.Array

    @property
    def shape(self):
        ns, nl, _ = self.blocks.shape
        return (ns * nl, ns * nl)

    def mv(self, x):
        ns, nl, _ = self.blocks.shape
        xb = x.reshape(ns, nl)
        return jnp.einsum("sij,sj->si", self.blocks, xb).reshape(-1)

    def rmv(self, x):
        ns, nl, _ = self.blocks.shape
        xb = x.reshape(ns, nl)
        return jnp.einsum("sji,sj->si", self.blocks, xb).reshape(-1)

    def diagonal(self):
        return jnp.diagonal(self.blocks, axis1=1, axis2=2).reshape(-1)

    def todense(self):
        ns, nl, _ = self.blocks.shape
        out = jnp.zeros((ns * nl, ns * nl), self.blocks.dtype)
        for s in range(ns):
            out = out.at[s * nl : (s + 1) * nl, s * nl : (s + 1) * nl].set(self.blocks[s])
        return out


@struct.dataclass
class BlockColumns(LinearOperator):
    """R = diag(R_1..R_s) with rectangular blocks (ns, nl, k) — per-subdomain
    nullspace bases (constant modes, rigid body modes).  Subdomains without a
    nullspace contribution simply carry zero columns; callers must drop the
    corresponding coarse dofs (see feti.assembly which builds only the live
    columns)."""

    blocks: jax.Array  # (ns, nl, k)

    @property
    def shape(self):
        ns, nl, k = self.blocks.shape
        return (ns * nl, ns * k)

    def mv(self, a):
        ns, nl, k = self.blocks.shape
        ab = a.reshape(ns, k)
        return jnp.einsum("sik,sk->si", self.blocks, ab).reshape(-1)

    def rmv(self, x):
        ns, nl, k = self.blocks.shape
        xb = x.reshape(ns, nl)
        return jnp.einsum("sik,si->sk", self.blocks, xb).reshape(-1)

    def todense(self):
        ns, nl, k = self.blocks.shape
        out = jnp.zeros((ns * nl, ns * k), self.blocks.dtype)
        for s in range(ns):
            out = out.at[s * nl : (s + 1) * nl, s * k : (s + 1) * k].set(self.blocks[s])
        return out
