"""Subdomain extension operator — the TPU-native MATEXTENSION.

The reference stores the gluing operator B (and its transpose) as a small
condensed block per rank plus VecScatters: MatMult = gather -> local mult ->
scatter-add (reference: src/mat/impls/extension/extension.c:476-540).

Here the same structure is a batched triplet (rows, cols, vals) of shape
(ns, k): subdomain s contributes ``vals[s, t] * u[s, cols[s, t]]`` to dual
entry ``rows[s, t]``.  Under a device mesh with the subdomain axis sharded:

- ``rmv`` (B'lambda, dual -> primal) is embarrassingly parallel: each device
  gathers from the replicated dual vector into its own subdomain slice — no
  communication;
- ``mv`` (B u, primal -> dual) is a per-device scatter-add into the dual
  vector followed by one cross-device reduction — XLA lowers the replicated
  output to a single psum over the ICI, the only collective in each dual
  operator application (F = B K+ B'), mirroring the reference's
  scatter/gather VecScatter pair.

Padded slots use rows = m (one extra dummy dual entry) and vals = 0.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .linop import LinearOperator


@struct.dataclass
class SubdomainExtension(LinearOperator):
    rows: jax.Array  # (ns, k) int32 — dual (link) indices, m = padding
    cols: jax.Array  # (ns, k) int32 — local dof indices within the subdomain
    vals: jax.Array  # (ns, k)
    m_dual: int = struct.field(pytree_node=False)  # dual dimension
    ns: int = struct.field(pytree_node=False)
    nl: int = struct.field(pytree_node=False)
    #: optional dense per-subdomain condensed blocks (ns, k, nl) — the
    #: MatExtensionCreateLocalMat analog (extension.c).  When set, the local
    #: multiply runs as one batched MXU einsum and the irregular index work
    #: shrinks to a single gather (rmv) / scatter-add (mv) at the dual
    #: interface, halving the serialized-gather cost of an F application.
    blk: jax.Array = None
    #: optional GATHER tables (see :meth:`with_gather_apply`): PLANE-major
    #: forms of B and B' so both apply directions are vectorized gathers —
    #: TPU scatter-adds serialize and cost ~25 ms per direction at the
    #: 1M-dof north star, while B's fan-in per row (and per primal dof) is
    #: a small constant, so a (width, rows) gather covers it exactly.
    #: Plane-major (slot index LEADING) matters on TPU: a (rows, 2) array
    #: tiles as T(8,128) with the minor dim padded 2 -> 128 — a silent 64x
    #: memory tax (measured 1.25 GB for a 20 MB table at 2.2M dofs, the
    #: allocation that OOMed the >=2M capture); (2, rows) slot planes are
    #: effectively 1-D and pad nothing.
    gB_cols: jax.Array = None  # (gmax, m) int32 decomposed-col ids, pad = N
    gB_vals: jax.Array = None  # (gmax, m)
    gBt_rows: jax.Array = None  # (w, N) int32 dual-row ids, pad = m
    gBt_vals: jax.Array = None  # (w, N)
    #: overflow COO for primal dofs whose dual fan-in exceeds the base table
    #: width w (see :meth:`with_gather_apply`): subdomain-corner/edge OWNER
    #: copies under nonredundant gluing touch up to deg-1 = 7 rows, but they
    #: are a few hundred dofs — padding the WHOLE (N, dmax) table to their
    #: fan-in made rmv gather 7x more elements than needed (98.5% padding
    #: measured at the 59^3 contact problem; the table gather was 75% of the
    #: F-apply cost at the 1M-dof north star)
    gBt_ov_cols: jax.Array = None  # (nov,) int32 decomposed dof ids
    gBt_ov_rows: jax.Array = None  # (nov,) int32 dual-row ids
    gBt_ov_vals: jax.Array = None  # (nov,)
    #: optional SELL-scheduled pure-gather plans over the two tables (see
    #: :meth:`with_sell_gather`): XLA lowers the table gathers to a
    #: serialized scalar-unit loop (~7 ns/element — at the 1M-dof north
    #: star the width-2 primal table alone gathers ~2.25M elements, ~44 of
    #: the 62.9 ms F apply), while the SELL kernel moves the same values
    #: with in-register tpu.dynamic_gather at HBM-stream speed
    #: (core/sell.py).  The plans only MOVE values (V = 1); the value
    #: multiply + slot reduction stays outside in the vector dtype, so
    #: results are bit-identical to the plain table path.
    sB: object = None  # SEll plan over gB_cols (mv direction)
    sBt: object = None  # SEll plan over gBt_rows (rmv direction)

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.m_dual, self.ns * self.nl)

    @classmethod
    def from_coo(cls, rows, cols, vals, m: int, ns: int, nl: int) -> "SubdomainExtension":
        """Build from global COO over the decomposed space (cols in
        [0, ns*nl), each entry belongs to subdomain cols // nl)."""
        rows = np.asarray(rows)
        cols = np.asarray(cols)
        vals = np.asarray(vals, dtype=np.float64)
        from ..utils.native import pack_extension_native

        packed = pack_extension_native(rows, cols, vals, m, ns, nl)
        if packed is not None:
            r, c, v = packed
        else:
            sub = cols // nl
            loc = cols % nl
            counts = np.bincount(sub, minlength=ns)
            k = max(int(counts.max()) if len(counts) else 0, 1)
            r = np.full((ns, k), m, dtype=np.int32)
            c = np.zeros((ns, k), dtype=np.int32)
            v = np.zeros((ns, k), dtype=np.float64)
            fill = np.zeros(ns, dtype=np.int64)
            for t in range(len(rows)):
                s = int(sub[t])
                j = fill[s]
                r[s, j] = rows[t]
                c[s, j] = loc[t]
                v[s, j] = vals[t]
                fill[s] += 1
        return cls(
            rows=jnp.asarray(r), cols=jnp.asarray(c), vals=jnp.asarray(v),
            m_dual=int(m), ns=int(ns), nl=int(nl),
        )

    @classmethod
    def vstack(cls, ops) -> "SubdomainExtension":
        """Stack extensions over the dual axis: B = [B1; B2; ...] as ONE
        extension operator (same ns/nl; slots concatenate along k).  This is
        how the TFETI constraint operator keeps its extension structure when
        gluing equalities and contact inequalities combine — the reference
        reaches the same shape through MatCreateNestPermon + the fused
        extension product (extension.c:544-620)."""
        ns, nl = ops[0].ns, ops[0].nl
        assert all(o.ns == ns and o.nl == nl for o in ops)
        m_total = int(sum(o.m_dual for o in ops))
        rows_p, cols_p, vals_p = [], [], []
        off = 0
        for o in ops:
            r = np.asarray(o.rows, dtype=np.int64)
            # real leaves shift by the running offset; pad slots (row ==
            # o.m_dual) must point at the COMBINED pad row m_total
            rows_p.append(np.where(r == o.m_dual, m_total, r + off).astype(np.int32))
            cols_p.append(np.asarray(o.cols))
            vals_p.append(np.asarray(o.vals))
            off += o.m_dual
        return cls(
            rows=jnp.asarray(np.concatenate(rows_p, axis=1)),
            cols=jnp.asarray(np.concatenate(cols_p, axis=1)),
            vals=jnp.asarray(np.concatenate(vals_p, axis=1)),
            m_dual=m_total, ns=ns, nl=nl,
        )

    def with_dense_blocks(self) -> "SubdomainExtension":
        """Materialize the condensed per-subdomain blocks for the batched
        MXU apply path (throughput mode; ~k*nl*8 bytes per subdomain)."""
        if self.blk is not None:
            return self
        ns, k = self.vals.shape
        blk = jnp.zeros((ns, k, self.nl), dtype=self.vals.dtype)
        s_idx = jnp.arange(ns)[:, None] * jnp.ones((1, k), jnp.int32)
        t_idx = jnp.ones((ns, 1), jnp.int32) * jnp.arange(k)[None, :]
        blk = blk.at[s_idx, t_idx, self.cols].add(self.vals)
        return self.replace(blk=blk)

    def with_gather_apply(self, base_width: int = 2) -> "SubdomainExtension":
        """Attach row-major gather tables for BOTH apply directions (host
        setup, O(nnz)): ``mv`` becomes  out[r] = sum_j gB_vals[r, j] *
        u[gB_cols[r, j]]  and ``rmv`` the same shape over primal dofs — no
        scatter in the hot shape.  The primal-major table is CAPPED at
        ``base_width`` slots per dof (2 covers everything but the owner
        copies of subdomain-edge/corner dofs under nonredundant gluing);
        the tail goes into a tiny overflow COO applied with one bounded
        scatter-add — padding the whole (N, dmax) table to the worst-case
        fan-in of 7 made the rmv gather 75% of the F-apply cost at the
        1M-dof north star.  This is the single-chip hot-path layout; the
        sharded path shards both the tables and the overflow."""
        if self.gB_cols is not None:
            return self

        rows = np.asarray(self.rows).reshape(-1)
        vals = np.asarray(self.vals).reshape(-1)
        sub = np.repeat(np.arange(self.ns), self.cols.shape[1])
        gcols = sub * self.nl + np.asarray(self.cols).reshape(-1)
        real = (rows < self.m_dual) & (vals != 0.0)
        rows, gcols, vals = rows[real], gcols[real], vals[real]
        N = self.ns * self.nl

        def pack(keys, payload, pv, nrows, pad_key, cap=None):
            order = np.argsort(keys, kind="stable")
            k_s, p_s, v_s = keys[order], payload[order], pv[order]
            counts = np.bincount(k_s, minlength=nrows)
            w = max(int(counts.max()) if len(counts) else 0, 1)
            slot = np.arange(len(k_s)) - np.concatenate(
                [[0], np.cumsum(counts)[:-1]]
            )[k_s]
            ov = None
            if cap is not None and w > cap:
                over = slot >= cap
                ov = (k_s[over], p_s[over], v_s[over])
                k_s, p_s, v_s = k_s[~over], p_s[~over], v_s[~over]
                slot = slot[~over]
                w = cap
            idx = np.full((nrows, w), pad_key, dtype=np.int32)
            val = np.zeros((nrows, w), dtype=vals.dtype)
            idx[k_s, slot] = p_s
            val[k_s, slot] = v_s
            return idx, val, ov

        gB_cols, gB_vals, _ = pack(rows, gcols.astype(np.int32), vals,
                                   self.m_dual, N)
        gBt_rows, gBt_vals, ov = pack(gcols, rows.astype(np.int32), vals,
                                      N, self.m_dual, cap=int(base_width))
        # plane-major (slot leading) — see the field comment: a minor dim
        # of 2 would pad 64x under the TPU's T(8,128) tiling
        out = self.replace(
            gB_cols=jnp.asarray(np.ascontiguousarray(gB_cols.T)),
            gB_vals=jnp.asarray(np.ascontiguousarray(gB_vals.T)),
            gBt_rows=jnp.asarray(np.ascontiguousarray(gBt_rows.T)),
            gBt_vals=jnp.asarray(np.ascontiguousarray(gBt_vals.T)),
        )
        if ov is not None:
            out = out.replace(
                gBt_ov_cols=jnp.asarray(ov[0].astype(np.int32)),
                gBt_ov_rows=jnp.asarray(ov[1].astype(np.int32)),
                gBt_ov_vals=jnp.asarray(ov[2]),
            )
        return out

    def with_sell_gather(self) -> "SubdomainExtension":
        """Attach SELL pure-gather plans for both table directions (host
        setup; requires :meth:`with_gather_apply` first).  Single-chip
        hot-path layout only — the sharded path keeps the plain tables
        (parallel/dist.shard_extension_sparse drops the plans: they index
        the full unsharded slot spaces)."""
        if self.sB is not None or self.gB_cols is None:
            return self
        from .sell import gather_plan

        sB = gather_plan(np.asarray(self.gB_cols), self.ns * self.nl)
        sBt = gather_plan(np.asarray(self.gBt_rows), self.m_dual)
        return self.replace(sB=sB, sBt=sBt)

    def mv(self, u):
        """B u: per-subdomain gather + scatter-add, then the cross-subdomain
        sum (the single psum when sharded)."""
        if self.sB is not None:
            G = self.sB(u).reshape(self.gB_cols.shape)
            return jnp.sum(self.gB_vals * G, axis=0)
        if self.gB_cols is not None:
            up = jnp.concatenate([u, jnp.zeros(1, u.dtype)])
            return jnp.sum(self.gB_vals * up[self.gB_cols], axis=0)
        ub = u.reshape(self.ns, self.nl)
        if self.blk is not None:
            with jax.default_matmul_precision("highest"):  # bf16 default
                contrib = jnp.einsum("stl,sl->st", self.blk, ub)
        else:
            contrib = self.vals * jnp.take_along_axis(ub, self.cols, axis=1)
        out = jnp.zeros(self.m_dual + 1, dtype=contrib.dtype)
        out = out.at[self.rows.reshape(-1)].add(contrib.reshape(-1))
        return out[: self.m_dual]

    def rmv(self, lam):
        """B' lambda: communication-free gather from the (replicated) dual."""
        if self.sBt is not None:
            G = self.sBt(lam).reshape(self.gBt_rows.shape)
            out = jnp.sum(self.gBt_vals * G, axis=0)
            if self.gBt_ov_cols is not None:
                lp = jnp.concatenate([lam, jnp.zeros(1, lam.dtype)])
                out = out.at[self.gBt_ov_cols].add(
                    self.gBt_ov_vals * lp[self.gBt_ov_rows]
                )
            return out
        if self.gBt_rows is not None:
            lp = jnp.concatenate([lam, jnp.zeros(1, lam.dtype)])
            out = jnp.sum(self.gBt_vals * lp[self.gBt_rows], axis=0)
            if self.gBt_ov_cols is not None:
                out = out.at[self.gBt_ov_cols].add(
                    self.gBt_ov_vals * lp[self.gBt_ov_rows]
                )
            return out
        lam_pad = jnp.concatenate([lam, jnp.zeros(1, lam.dtype)])
        if self.blk is not None:
            gathered = lam_pad[self.rows]
            with jax.default_matmul_precision("highest"):  # bf16 default
                return jnp.einsum("stl,st->sl", self.blk, gathered).reshape(-1)
        gathered = self.vals * lam_pad[self.rows]
        out = jnp.zeros((self.ns, self.nl), dtype=gathered.dtype)
        out = jax.vmap(lambda o, c, g: o.at[c].add(g))(out, self.cols, gathered)
        return out.reshape(-1)

    def todense(self):
        out = jnp.zeros((self.m_dual + 1, self.ns * self.nl), dtype=self.vals.dtype)
        gcols = (jnp.arange(self.ns)[:, None] * self.nl + self.cols).reshape(-1)
        out = out.at[self.rows.reshape(-1), gcols].add(self.vals.reshape(-1))
        return out[: self.m_dual]
