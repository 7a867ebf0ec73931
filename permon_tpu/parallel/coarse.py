"""Redundancy-group coarse solve — the `-qppf_redundancy` analog.

The reference redistributes the coarse problem (GG') onto N subcommunicator
groups: each group holds ONE full copy, stored and factored DISTRIBUTED
across the group's ranks (reference: src/qppf/interface/qppf.c:182-183
creating the redundant inverse, src/mat/impls/inv/matinv.c:551-575 setting
up the subcommunicator PETSc redundant matrix).  Full replication
(redundancy = nranks) stops scaling when the coarse factor — kc^2 doubles,
kc = #subdomains x #rigid-modes — no longer fits one rank; redundancy
groups shard the factor while keeping every group self-sufficient (no
cross-group traffic in the hot path).

TPU translation on the two-level ('host', 'sd') mesh (parallel/overlap.py):

- one host group == one redundancy group: the (kc, kc) Cholesky factor L of
  GG' is sharded by BLOCK ROWS over the within-group 'sd' axis (each chip
  stores kc/nsd rows, kc^2/nsd memory) and replicated over 'host';
- the coarse solve (GG')^{-1} v runs as a blocked distributed forward +
  backward substitution inside ``shard_map``: at step j the owner of block
  row j solves its (kb, kb) diagonal block and the result is broadcast with
  one masked ``psum`` over 'sd' (ICI within the host group — never DCN),
  2*nsd psums of kb-vectors per solve;
- results are bit-comparable to the replicated `cho_solve` up to the
  blocked substitution's reordering of the same f64 sums (asserted against
  full replication in tests/test_coarse.py and in the dryrun).

Plug into the projector with ``Projector.replace(cp_dist=...)`` or build
one via :func:`redundant_projector`.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .overlap import shard_map_compat


@struct.dataclass
class RedundantCoarse:
    """Distributed coarse factor: ``mv(v) = (GG')^{-1} v`` with the
    Cholesky factor sharded over one mesh axis (module docstring)."""

    L: jax.Array  # (kcp, kcp) lower Cholesky, rows sharded over `axis`
    kc: int = struct.field(pytree_node=False)
    kb: int = struct.field(pytree_node=False)   # rows per chip
    nsd: int = struct.field(pytree_node=False)  # chips per group
    mesh: Mesh = struct.field(pytree_node=False)
    axis: str = struct.field(pytree_node=False)

    @classmethod
    def create(cls, gram, mesh: Mesh, axis: str = "sd") -> "RedundantCoarse":
        """``gram``: the (kc, kc) SPD coarse matrix GG' (host numpy / scipy
        sparse / jax array).  Factored once on host (the role MUMPS'
        factorization of the subcommunicator redundant matrix plays,
        matinv.c:551-575), padded to nsd block rows, then placed sharded."""
        import scipy.sparse as sp

        S = np.asarray(gram.toarray() if sp.issparse(gram) else gram,
                       dtype=np.float64)
        kc = S.shape[0]
        nsd = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]
        kb = max((kc + nsd - 1) // nsd, 1)
        kcp = nsd * kb
        Sp = np.eye(kcp)
        Sp[:kc, :kc] = S
        L = np.linalg.cholesky(Sp)
        L_sh = jax.device_put(
            jnp.asarray(L), NamedSharding(mesh, P(axis, None))
        )
        return cls(L=L_sh, kc=kc, kb=kb, nsd=nsd, mesh=mesh, axis=axis)

    def mv(self, v):
        """(GG')^{-1} v — replicated in, replicated out.  The substitution
        sweeps are a static unroll over the nsd block rows; each step is one
        batched triangular solve on the owning chip plus one masked psum
        over the group axis."""
        kc, kb, nsd, ax = self.kc, self.kb, self.nsd, self.axis

        @functools.partial(
            shard_map_compat, mesh=self.mesh,
            in_specs=(P(ax, None), P()), out_specs=P(),
            check_rep=False,
        )
        def solve(L_loc, y):
            my = lax.axis_index(ax)
            dt = L_loc.dtype
            yp = jnp.zeros(nsd * kb, dt).at[:kc].set(y.astype(dt))
            # forward: z = L^{-1} y.  Owner j can form its rhs locally —
            # L_loc holds its whole block row, z is replicated-so-far.
            z = jnp.zeros(nsd * kb, dt)
            for j in range(nsd):
                sl = slice(j * kb, (j + 1) * kb)
                rhs = yp[sl] - L_loc @ z
                Ljj = lax.dynamic_slice(L_loc, (0, j * kb), (kb, kb))
                zj = jax.scipy.linalg.solve_triangular(Ljj, rhs, lower=True)
                zj = jnp.where(my == j, zj, jnp.zeros_like(zj))
                z = z.at[sl].add(lax.psum(zj, ax))
            # backward: x = L^{-T} z.  Owner j's cross-block term
            # (L^T x)_i for i < j is L_loc[:, i-block]' x_j — accumulated
            # into a replicated carry with the same masked psum.
            x = jnp.zeros(nsd * kb, dt)
            acc = jnp.zeros(nsd * kb, dt)
            for j in reversed(range(nsd)):
                sl = slice(j * kb, (j + 1) * kb)
                Ljj = lax.dynamic_slice(L_loc, (0, j * kb), (kb, kb))
                rhs = z[sl] - acc[sl]
                xj = jax.scipy.linalg.solve_triangular(
                    Ljj.T, rhs, lower=False
                )
                xj = jnp.where(my == j, xj, jnp.zeros_like(xj))
                cj = jnp.where(my == j, L_loc.T @ xj, jnp.zeros(nsd * kb, dt))
                both = lax.psum(jnp.concatenate([xj, cj]), ax)
                x = x.at[sl].add(both[:kb])
                acc = acc + both[kb:]
            return x[:kc]

        return solve(self.L, v).astype(v.dtype)


def redundant_projector(G, gram, mesh: Mesh, axis: str = "sd"):
    """A :class:`~permon_tpu.qp.projector.Projector` whose coarse solve runs
    on redundancy groups: one distributed factor copy per host group
    (QPPFSetRedundancy + QPPFSetUp, qppf.c:182-333)."""
    from ..qp.projector import Projector

    cp = RedundantCoarse.create(gram, mesh, axis=axis)
    return Projector(G=G, ggt_chol=None, orthonormal_rows=False, cp_dist=cp)
