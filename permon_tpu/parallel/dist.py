"""Device-mesh distribution of TFETI problems.

The parallel layout mirrors the reference's MPI data decomposition
(SURVEY 2.10) mapped onto a ``jax.sharding.Mesh``:

- subdomain axis 'sd': K blocks, their Cholesky factors, primal vectors and
  the per-subdomain extension triplets are sharded — all local operations
  (batched factor solves, box projections, element-wise splits) run with no
  communication, like MATBLOCKDIAG's zero-comm MatMult
  (matblockdiag.c:190-233);
- dual (link) vectors are replicated: the iterates of the dual solvers are
  small, and each F = B K+ B' application needs exactly one psum over the
  ICI (B's scatter-add reduction) — the analog of the reference's VecScatter
  pair per MATEXTENSION mult;
- the coarse problem (GG' Cholesky) is replicated on every device, so
  projector applications cost one G matvec reduction + an all-local
  triangular solve — the analog of -qppf_redundancy replication
  (qppf.c:282-333, matinv.c:564-572).

Use :func:`shard_qp` after :func:`permon_tpu.feti.assemble_qp`; the transform
chain and solvers are sharding-agnostic (pytrees of jax arrays), so the same
code runs single-chip or on any mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.blockdiag import BlockDiagDense
from ..core.extension import SubdomainExtension
from ..core.factor import BlockDiagCholInv
from ..qp.qp import QP


def make_mesh(n_devices: Optional[int] = None, axis: str = "sd") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=(axis,))


def _put(x, mesh, spec):
    return jax.device_put(x, NamedSharding(mesh, spec))


def shard_extension(B: SubdomainExtension, mesh: Mesh, axis: str = "sd") -> SubdomainExtension:
    return B.replace(
        rows=_put(B.rows, mesh, P(axis, None)),
        cols=_put(B.cols, mesh, P(axis, None)),
        vals=_put(B.vals, mesh, P(axis, None)),
    )


def shard_qp(qp: QP, kplus: BlockDiagCholInv, mesh: Mesh, axis: str = "sd"):
    """Place a TFETI decomposed QP on the mesh: subdomain-sharded K/b/B,
    replicated coarse data.  Returns (qp_sharded, kplus_sharded)."""
    assert isinstance(qp.A, BlockDiagDense), "shard_qp expects a block-diagonal Hessian"
    assert isinstance(qp.BE, SubdomainExtension), "shard_qp expects an extension BE"
    ns = qp.A.blocks.shape[0]
    ndev = mesh.devices.size
    assert ns % ndev == 0, f"ns={ns} not divisible by {ndev} devices"

    A = qp.A.replace(blocks=_put(qp.A.blocks, mesh, P(axis, None, None)))
    BE = shard_extension(qp.BE, mesh, axis)
    b = _put(qp.b, mesh, P(axis))  # flat (ns*nl,): contiguous whole subdomains
    cE = _put(qp.cE, mesh, P()) if qp.cE is not None else None
    R = qp.R
    if R is not None:
        # nullspace basis rows live in the primal space
        R = R.replace(
            cols=_put(R.cols, mesh, P(axis, None)),
            vals=_put(R.vals, mesh, P(axis, None)),
        )
    qp_sh = qp.replace(A=A, BE=BE, b=b, cE=cE, R=R)
    kplus_sh = kplus.replace(chols=_put(kplus.chols, mesh, P(axis, None, None)))
    return qp_sh, kplus_sh


def feti_dual_apply_shard_map(B: SubdomainExtension, kplus: BlockDiagCholInv,
                              mesh: Mesh, axis: str = "sd"):
    """Explicit shard_map version of the dual operator F = B K+ B'.

    The automatic path lets GSPMD infer the collective from shardings; this
    variant writes the communication contract down explicitly, exactly as
    SURVEY 2.10 maps the reference's VecScatter pair:

    - per-device: gather lambda (replicated) into the local subdomain
      blocks (B' block-row apply, zero communication),
    - per-device: batched Cholesky solves on the local K blocks,
    - per-device: local scatter-add into a dual-sized partial vector,
    - one ``lax.psum`` over the subdomain axis — the single ICI collective
      per F application.

    Returns ``apply(lam) -> F @ lam`` (a jittable closure).  Useful both as
    documentation of the comm pattern and as the fallback when GSPMD's
    choice of collective placement is suboptimal.
    """
    import functools

    import jax.numpy as jnp

    from .overlap import shard_map_compat

    m = B.m_dual

    @functools.partial(
        shard_map_compat,
        mesh=mesh,
        in_specs=(
            P(axis, None),  # rows
            P(axis, None),  # cols
            P(axis, None),  # vals
            P(axis, None, None),  # chols
            P(),  # lam (replicated)
        ),
        out_specs=P(),
        check_rep=False,
    )
    def apply_sharded(rows, cols, vals, chols, lam):
        # B' lam restricted to this device's subdomains
        lam_pad = jnp.concatenate([lam, jnp.zeros(1, lam.dtype)])
        gathered = vals * lam_pad[rows]
        nb, bs, _ = chols.shape
        u = jnp.zeros((nb, bs), dtype=gathered.dtype)
        u = jax.vmap(lambda o, c, g: o.at[c].add(g))(u, cols, gathered)
        # local K+ solves (batched triangular solves, MXU-friendly)
        y = jax.vmap(lambda c, v: jax.scipy.linalg.cho_solve((c, True), v))(chols, u)
        # local scatter-add into the dual space + the one psum
        contrib = vals * jnp.take_along_axis(y, cols, axis=1)
        out = jnp.zeros(m + 1, dtype=contrib.dtype)
        out = out.at[rows.reshape(-1)].add(contrib.reshape(-1))
        return jax.lax.psum(out[:m], axis)

    def apply(lam):
        return apply_sharded(B.rows, B.cols, B.vals, kplus.chols, lam)

    return apply
