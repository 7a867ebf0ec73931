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
    if isinstance(x, jax.ShapeDtypeStruct):
        # abstract avatar (AOT memory/communication audits at shapes too
        # big to materialize — scripts/memaudit.py): carry the sharding on
        # the ShapeDtypeStruct so jit(...).lower() sees the real layout
        return jax.ShapeDtypeStruct(
            x.shape, x.dtype, sharding=NamedSharding(mesh, spec)
        )
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
    BI = (
        shard_extension(qp.BI, mesh, axis)
        if isinstance(qp.BI, SubdomainExtension)
        else qp.BI
    )
    b = _put(qp.b, mesh, P(axis))  # flat (ns*nl,): contiguous whole subdomains
    cE = _put(qp.cE, mesh, P()) if qp.cE is not None else None
    cI = _put(qp.cI, mesh, P()) if qp.cI is not None else None
    R = qp.R
    if R is not None:
        # nullspace basis rows live in the primal space
        R = R.replace(
            cols=_put(R.cols, mesh, P(axis, None)),
            vals=_put(R.vals, mesh, P(axis, None)),
        )
    qp_sh = qp.replace(A=A, BE=BE, BI=BI, b=b, cE=cE, cI=cI, R=R)
    kplus_sh = kplus.replace(chols=_put(kplus.chols, mesh, P(axis, None, None)))
    return qp_sh, kplus_sh


def shard_extension_sparse(B: SubdomainExtension, mesh: Mesh) -> SubdomainExtension:
    """Mesh placement of a large-path extension operator.  The per-subdomain
    triplet and the PRIMAL-major gather table (B' lambda: local gathers from
    the replicated dual) shard over the subdomain axis; the DUAL-major gather
    table is dropped — its rows gather from arbitrary primal dofs, which
    under a sharded primal would force an all-gather of the multi-MB primal
    vector per F application.  ``mv`` therefore takes the triplet path:
    per-device scatter-add + the one psum (the reference's VecScatter-add,
    extension.c:476-540)."""
    axes = tuple(mesh.axis_names)
    put = lambda x, *spec: _put(x, mesh, P(*spec))
    B = B.replace(
        rows=put(B.rows, axes, None),
        cols=put(B.cols, axes, None),
        vals=put(B.vals, axes, None),
        gB_cols=None, gB_vals=None,
        # the SELL gather plans index the FULL unsharded slot spaces —
        # single-chip layout only
        sB=None, sBt=None,
    )
    if B.gBt_rows is not None:
        # plane-major (w, N): the primal axis is dim 1
        B = B.replace(
            gBt_rows=put(B.gBt_rows, None, axes),
            gBt_vals=put(B.gBt_vals, None, axes),
        )
    if B.gBt_ov_cols is not None:
        # the few-hundred-entry overflow COO is replicated; its scatter-add
        # into the sharded primal is partitioned by GSPMD
        B = B.replace(
            gBt_ov_cols=put(B.gBt_ov_cols),
            gBt_ov_rows=put(B.gBt_ov_rows),
            gBt_ov_vals=put(B.gBt_ov_vals),
        )
    return B


def shard_qp_sparse(qp: QP, kplus, mesh: Mesh, kplus_post=None):
    """Place a LARGE-PATH TFETI QP (BlockDia stencil Hessian, band K+,
    gather-table extension constraints — feti/large.py) on a device mesh:

    - the (ns, ndiag, nlp) stencil data, the scan-major (nb, ns, NB, NB)
      band Cholesky factors, the flat primal vectors and the extension
      triplets shard over the subdomain axis (per-rank MUMPS factors +
      zero-comm local solves, matinv.c:481-590);
    - dual vectors, the coarse G and its GG' factor stay replicated (the
      maximal -qppf_redundancy placement; redundancy GROUPS plug in via
      ``redundant_projector`` on a two-level mesh);
    - each dual operator application F = B K+ B' costs ONE psum over the
      mesh (B's scatter-add reduction).

    Works for 1-axis and 2-axis ('host', 'sd') meshes — subdomains shard
    over the flattened device order.  Returns
    ``(qp_sharded, kplus_sharded, kplus_post_sharded)``."""
    from ..core.band import BandCholInv
    from ..core.dia import BlockDia, RegularizedBlockDia

    axes = tuple(mesh.axis_names)
    put = lambda x, *spec: _put(x, mesh, P(*spec))
    assert isinstance(qp.A, BlockDia), "shard_qp_sparse expects a BlockDia Hessian"
    ns = qp.A.ns
    ndev = mesh.devices.size
    assert ns % ndev == 0, f"ns={ns} not divisible by {ndev} devices"

    def shard_blockdia(op):
        return op.replace(data=put(op.data, axes, None, None))

    def shard_band(kp):
        if kp is None:
            return None
        assert isinstance(kp, BandCholInv)
        out = kp.replace(
            Dinv=put(kp.Dinv, None, axes, None, None),
            F=put(kp.F, None, axes, None, None),
        )
        if isinstance(kp.op, RegularizedBlockDia):
            out = out.replace(op=kp.op.replace(
                base=shard_blockdia(kp.op.base),
                idx=put(kp.op.idx, axes, None),
                q=put(kp.op.q, axes, None, None),
                bi=put(kp.op.bi, axes),
            ))
        elif kp.op is not None and isinstance(kp.op, BlockDia):
            out = out.replace(op=shard_blockdia(kp.op))
        return out

    A = shard_blockdia(qp.A)
    BE = shard_extension_sparse(qp.BE, mesh)
    BI = shard_extension_sparse(qp.BI, mesh) if qp.BI is not None else None
    b = put(qp.b, axes)  # flat (ns*nlp,): contiguous whole subdomains
    cE = put(qp.cE) if qp.cE is not None else None
    cI = put(qp.cI) if qp.cI is not None else None
    R = qp.R
    if R is not None:
        # Ell rows live in the primal space: (ns*nlp, k)
        R = R.replace(cols=put(R.cols, axes, None), vals=put(R.vals, axes, None))
    qp_sh = qp.replace(A=A, BE=BE, BI=BI, b=b, cE=cE, cI=cI, R=R)
    return qp_sh, shard_band(kplus), shard_band(kplus_post)


def replicate_projector(pf, mesh: Mesh):
    """Replicate a projector's (small) coarse-side arrays on every device of
    the mesh — G is a (k, m) dual-space operator and the GG' factor is
    (k, k); both ride along replicated like the reference's maximally
    redundant coarse copies (qppf.c:282-333)."""
    rep = lambda t: jax.tree_util.tree_map(
        lambda x: _put(x, mesh, P()) if isinstance(x, jax.Array) else x, t
    )
    if pf.cp_dist is not None:
        # the redundancy-group factor is deliberately SHARDED — replicate
        # everything around it, leave its placement alone
        cp = pf.cp_dist
        return rep(pf.replace(cp_dist=None)).replace(cp_dist=cp)
    return rep(pf)


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
