"""Communication/compute overlap for the sharded leaf-space dual apply,
and the two-level (host, chip) mesh layout.

The reference overlaps the lambda exchange with local work implicitly
through MPI progress inside PetscSF (SFBcast/SFReduce are split into
Begin/End pairs precisely so local compute can run between them —
reference: src/mat/impls/gluing/gluing.c:47-159 uses
PetscSFBcastBegin/End and PetscSFReduceBegin/End).  On TPU the analog is
to make the boundary exchange and the interior compute INDEPENDENT ops
in the XLA graph so the latency-hiding scheduler can run the ICI
transfer concurrently with the batched MXU solves:

1. the leaves of the redundant dual representation (feti/leaf.py) are
   split at plan time into LOCAL partner edges (both leaves on the same
   shard: a static in-shard gather, zero communication) and REMOTE edges
   grouped by shard offset;
2. each F application solves the *boundary* subdomains first (those
   owning a leaf involved in a remote edge), packs their contributions
   into per-offset send buffers and launches one ``lax.ppermute`` per
   neighbor offset — the TPU analog of the reference's neighbor
   VecScatter / SF round;
3. while those permutes are in flight, the *interior* subdomain solves
   (the bulk of the FLOPs — batched GEMV on the MXU) and the local
   partner combine execute, having no data dependence on the permutes;
4. the received buffers are scatter-added last.

Everything is static: the plan is built once on the host from the
(ns, k) leaf layout; the jitted apply contains only fixed-shape gathers,
einsums and ppermutes.  The result is bit-reorderings of the same sums
the flat combine performs, so it matches the un-overlapped apply to
roundoff (asserted in tests/test_overlap.py).

Two-level mesh: :func:`make_mesh2` builds a ('host', 'sd') mesh; the
subdomain data shards over the flattened device order, ppermutes address
the combined ('host', 'sd') axis, and the hierarchical row-space apply
(:func:`feti_dual_apply_hier`) reduces first over 'sd' (ICI within a
host group) and then over 'host' (DCN) — the reduction topology SURVEY
2.10 prescribes.  The coarse GG' factor stays replicated on every
device, i.e. the maximal ``-qppf_redundancy`` setting
(reference: src/qppf/interface/qppf.c:182-183, matinv.c:564-572).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..feti.leaf import LeafDualOperator, LeafDualSpace


def make_mesh2(shape: Tuple[int, int], axis_names=("host", "sd")) -> Mesh:
    """A two-level device mesh: first axis = host groups (DCN), second =
    chips within a group (ICI).  On a real multi-host slice pass devices
    ordered host-major; single-host testing just reshapes."""
    n = shape[0] * shape[1]
    devs = np.array(jax.devices()[:n]).reshape(shape)
    return Mesh(devs, axis_names=axis_names)


def _mesh_axes(mesh: Mesh):
    """All mesh axis names as the tuple collectives address (flattened
    device order = subdomain order)."""
    ax = tuple(mesh.axis_names)
    return ax if len(ax) > 1 else ax[0]


@struct.dataclass
class LeafOverlapPlan:
    """Static exchange plan for one (leaf layout, device count) pair.

    All index tables carry a leading device axis and are sharded over the
    mesh so every shard reads only its own row inside ``shard_map``.
    Pads: local-partner and recv tables point at a trailing zero slot.
    """

    perm: jax.Array            # (ndev, ns_loc) boundary-first subdomain order
    partners_local: jax.Array  # (ndev, degm1, nloc) in-shard partner gathers
    send_idx: Tuple[jax.Array, ...]    # per offset: (ndev, n_send) into (nb*k)+pad
    recv_partner: Tuple[jax.Array, ...]  # per offset: (ndev, deg_o, nloc) into recv+pad
    offsets: Tuple[int, ...] = struct.field(pytree_node=False)
    ndev: int = struct.field(pytree_node=False)
    ns_loc: int = struct.field(pytree_node=False)
    nb: int = struct.field(pytree_node=False)  # boundary batch size

    @classmethod
    def build(cls, space: LeafDualSpace, ndev: int) -> "LeafOverlapPlan":
        rows = np.asarray(space.rows)
        ns, k = rows.shape
        assert ns % ndev == 0, f"ns={ns} not divisible by ndev={ndev}"
        ns_loc = ns // ndev
        nloc = ns_loc * k
        partners = np.asarray(space.partners)  # (degm1, ns*k), pad = ns*k
        degm1, nleaf = partners.shape

        flat = np.arange(nleaf)
        fdev = (flat // k) // ns_loc
        floc = flat - fdev * nloc

        partners_local = np.full((ndev, max(degm1, 1), nloc), nloc, np.int32)
        # remote edges: receiver leaf i needs sender leaf j on another shard
        remote = {}  # offset -> list of (recv_dev, floc_i, send_dev, floc_j)
        for d in range(degm1):
            js = partners[d]
            real = js < nleaf
            ii = flat[real]
            jj = js[real]
            same = fdev[ii] == fdev[jj]
            for i, j in zip(ii[same], jj[same]):
                partners_local[fdev[i], d, floc[i]] = floc[j]
            for i, j in zip(ii[~same], jj[~same]):
                o = int((fdev[i] - fdev[j]) % ndev)
                remote.setdefault(o, []).append(
                    (int(fdev[i]), int(floc[i]), int(fdev[j]), int(floc[j]))
                )

        # boundary subdomains per device: own a leaf that sends or receives
        boundary = [set() for _ in range(ndev)]
        for edges in remote.values():
            for rd, li, sd_, lj in edges:
                boundary[rd].add(li // k)
                boundary[sd_].add(lj // k)
        nb = max((len(b) for b in boundary), default=0)
        perm = np.zeros((ndev, ns_loc), np.int32)
        inv_perm = np.zeros((ndev, ns_loc), np.int32)
        for dv in range(ndev):
            bs = sorted(boundary[dv])
            order = bs + [s for s in range(ns_loc) if s not in boundary[dv]]
            perm[dv] = order
            inv_perm[dv, order] = np.arange(ns_loc)

        offsets = sorted(remote.keys())
        send_idx, recv_partner = [], []
        for o in offsets:
            # sender side: per device, ordered list of local leaves to ship
            send_lists = [[] for _ in range(ndev)]
            for rd, li, sd_, lj in remote[o]:
                if lj not in send_lists[sd_]:
                    send_lists[sd_].append(lj)
            n_send = max(len(s) for s in send_lists)
            sidx = np.full((ndev, n_send), nb * k, np.int32)  # pad -> zero slot
            pos = [dict() for _ in range(ndev)]
            for dv in range(ndev):
                for p_, lj in enumerate(send_lists[dv]):
                    pos[dv][lj] = p_
                    # position of leaf lj in the boundary-batch flat layout
                    s_loc, t = lj // k, lj % k
                    pb = inv_perm[dv, s_loc]
                    assert pb < nb, "sender subdomain must be in the boundary batch"
                    sidx[dv, p_] = pb * k + t
            # receiver side: per local leaf, slots in the recv buffer to add
            recv_lists = [[] for _ in range(ndev * nloc)]
            for rd, li, sd_, lj in remote[o]:
                recv_lists[rd * nloc + li].append(pos[sd_][lj])
            deg_o = max((len(r) for r in recv_lists), default=1)
            rp = np.full((ndev, max(deg_o, 1), nloc), n_send, np.int32)
            for rd in range(ndev):
                for li in range(nloc):
                    for d, p_ in enumerate(recv_lists[rd * nloc + li]):
                        rp[rd, d, li] = p_
            send_idx.append(jnp.asarray(sidx))
            recv_partner.append(jnp.asarray(rp))

        return cls(
            perm=jnp.asarray(perm),
            partners_local=jnp.asarray(partners_local),
            send_idx=tuple(send_idx),
            recv_partner=tuple(recv_partner),
            offsets=tuple(offsets),
            ndev=ndev,
            ns_loc=ns_loc,
            nb=nb,
        )


def leaf_apply_overlapped(op: LeafDualOperator, plan: LeafOverlapPlan,
                          mesh: Mesh):
    """Jittable ``apply(Lam) -> F Lam`` in leaf space with the boundary
    exchange overlapped with the interior solves (module docstring)."""
    ax = _mesh_axes(mesh)
    spec_sd = P(ax, None)
    nb, ns_loc = plan.nb, plan.ns_loc
    k = op.blk.shape[1]
    noff = len(plan.offsets)
    ndev = plan.ndev
    perm_pairs = [
        [(s, (s + o) % ndev) for s in range(ndev)] for o in plan.offsets
    ]

    @functools.partial(
        shard_map_compat,
        mesh=mesh,
        in_specs=(
            P(ax, None, None),  # blk
            P(ax, None, None),  # invs
            spec_sd,            # Lam
            spec_sd,            # perm
            P(ax, None, None),  # partners_local
        )
        + tuple(spec_sd for _ in range(noff))           # send_idx
        + tuple(P(ax, None, None) for _ in range(noff)),  # recv_partner
        out_specs=spec_sd,
        check_rep=False,
    )
    def apply_sharded(blk, invs, Lam, perm, ploc, *bufs):
        perm = perm[0]
        ploc = ploc[0]
        sends = [b[0] for b in bufs[:noff]]
        recvs_t = [b[0] for b in bufs[noff:]]
        with jax.default_matmul_precision("highest"):  # bf16 default kills f32 state
            u = jnp.einsum("stl,st->sl", blk, Lam)
        idxb, idxi = perm[:nb], perm[nb:]
        # boundary subdomains: solve + condense first, ship immediately
        with jax.default_matmul_precision("highest"):
            wb = jnp.einsum("sij,sj->si", invs[idxb], u[idxb])
            cb = jnp.einsum("stl,sl->st", blk[idxb], wb)
        cbp = jnp.concatenate([cb.reshape(-1), jnp.zeros(1, cb.dtype)])
        recvs = [
            lax.ppermute(cbp[sidx], ax, perm=pp)
            for sidx, pp in zip(sends, perm_pairs)
        ]
        # interior solves + local combine: no data dependence on the
        # permutes above — XLA overlaps them with the ICI transfer
        with jax.default_matmul_precision("highest"):
            wi = jnp.einsum("sij,sj->si", invs[idxi], u[idxi])
            ci = jnp.einsum("stl,sl->st", blk[idxi], wi)
        contrib = jnp.zeros_like(Lam).at[idxb].set(cb).at[idxi].set(ci)
        cpad = jnp.concatenate([contrib.reshape(-1), jnp.zeros(1, contrib.dtype)])
        out = contrib
        for d in range(ploc.shape[0]):
            out = out + cpad[ploc[d]].reshape(ns_loc, k)
        for buf, rp in zip(recvs, recvs_t):
            bpad = jnp.concatenate([buf, jnp.zeros(1, buf.dtype)])
            for d in range(rp.shape[0]):
                out = out + bpad[rp[d]].reshape(ns_loc, k)
        return out

    def apply(Lam):
        return apply_sharded(
            op.blk, op.invs, Lam, plan.perm, plan.partners_local,
            *plan.send_idx, *plan.recv_partner,
        )

    return apply


def shard_map_compat(f=None, **kw):
    """shard_map across jax versions (experimental vs top-level)."""
    import inspect

    try:
        from jax import shard_map as sm
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map as sm
    params = inspect.signature(sm).parameters
    if "check_rep" in kw and "check_rep" not in params:
        kw["check_vma"] = kw.pop("check_rep")  # jax >= 0.8 rename
    if f is None:
        return functools.partial(sm, **kw)
    return sm(f, **kw)


@struct.dataclass
class OverlappedLeafOperator:
    """Drop-in for :class:`LeafDualOperator` inside :func:`leaf_cg`:
    ``apply`` runs the overlapped exchange, ``space`` provides the
    weighted dots (GSPMD reduces them over the mesh).  The shard_map-wrapped
    closure is built lazily once per operator instance and reused, so eager
    or repeatedly-jitted callers don't re-trace a fresh function object per
    application."""

    op: LeafDualOperator
    plan: LeafOverlapPlan
    mesh: Mesh = struct.field(pytree_node=False)

    @property
    def space(self) -> LeafDualSpace:
        return self.op.space

    def apply(self, Lam):
        fn = object.__getattribute__(self, "__dict__").get("_apply_fn")
        if fn is None:
            fn = leaf_apply_overlapped(self.op, self.plan, self.mesh)
            object.__setattr__(self, "_apply_fn", fn)
        return fn(Lam)


def feti_dual_apply_hier(B, kplus, mesh: Mesh):
    """Row-space F = B K+ B' over a two-level mesh with an explicit
    hierarchical reduction: psum over the chip axis first (ICI within a
    host group), then over the host axis (DCN).  XLA would pick the same
    topology for a fused psum; writing it down pins it and documents the
    contract SURVEY 2.10 takes from the reference's two-level MPI
    communicators."""
    axes = tuple(mesh.axis_names)
    assert len(axes) == 2, "feti_dual_apply_hier expects a 2-axis mesh"
    host_ax, chip_ax = axes
    m = B.m_dual

    @functools.partial(
        shard_map_compat,
        mesh=mesh,
        in_specs=(
            P(axes, None), P(axes, None), P(axes, None),
            P(axes, None, None), P(),
        ),
        out_specs=P(),
        check_rep=False,
    )
    def apply_sharded(rows, cols, vals, chols, lam):
        lam_pad = jnp.concatenate([lam, jnp.zeros(1, lam.dtype)])
        gathered = vals * lam_pad[rows]
        nbk, bs, _ = chols.shape
        u = jnp.zeros((nbk, bs), dtype=gathered.dtype)
        u = jax.vmap(lambda o, c, g: o.at[c].add(g))(u, cols, gathered)
        y = jax.vmap(lambda c, v: jax.scipy.linalg.cho_solve((c, True), v))(chols, u)
        contrib = vals * jnp.take_along_axis(y, cols, axis=1)
        out = jnp.zeros(m + 1, dtype=contrib.dtype)
        out = out.at[rows.reshape(-1)].add(contrib.reshape(-1))
        part = lax.psum(out[:m], chip_ax)   # ICI within the host group
        return lax.psum(part, host_ax)      # DCN across host groups

    def apply(lam):
        return apply_sharded(B.rows, B.cols, B.vals, kplus.chols, lam)

    return apply


def shard_qp2(qp, kplus, mesh: Mesh):
    """Two-level variant of :func:`permon_tpu.parallel.dist.shard_qp`:
    subdomains shard over the flattened ('host', 'sd') device order,
    coarse data replicated on every device (maximal qppf_redundancy)."""
    from ..core.blockdiag import BlockDiagDense
    from ..core.extension import SubdomainExtension

    axes = tuple(mesh.axis_names)
    put = lambda x, *spec: jax.device_put(x, NamedSharding(mesh, P(*spec)))
    assert isinstance(qp.A, BlockDiagDense)
    assert isinstance(qp.BE, SubdomainExtension)
    ns = qp.A.blocks.shape[0]
    ndev = mesh.devices.size
    assert ns % ndev == 0, f"ns={ns} not divisible by {ndev} devices"

    A = qp.A.replace(blocks=put(qp.A.blocks, axes, None, None))

    def shard_ext(B):
        return B.replace(
            rows=put(B.rows, axes, None),
            cols=put(B.cols, axes, None),
            vals=put(B.vals, axes, None),
        )

    BE = shard_ext(qp.BE)
    BI = (
        shard_ext(qp.BI) if isinstance(qp.BI, SubdomainExtension) else qp.BI
    )
    b = put(qp.b, axes)
    cE = put(qp.cE) if qp.cE is not None else None
    cI = put(qp.cI) if qp.cI is not None else None
    R = qp.R
    if R is not None:
        R = R.replace(cols=put(R.cols, axes, None), vals=put(R.vals, axes, None))
    qp_sh = qp.replace(A=A, BE=BE, BI=BI, b=b, cE=cE, cI=cI, R=R)
    kplus_sh = kplus.replace(chols=put(kplus.chols, axes, None, None))
    return qp_sh, kplus_sh
