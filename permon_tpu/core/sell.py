"""SELL — gather-scheduled sparse operator for ARBITRARY sparsity on TPU.

The role filled in the reference by PETSc MPIAIJ MatMult at the bottom of
every hot loop (reference: MatMult uses in QPSSolve_MPGP,
src/qps/impls/mpgp/mpgp.c:500, and MatMult_Extension,
src/mat/impls/extension/extension.c:476-540): a sparse matvec that is fast
for any nonzero pattern, not just banded stencils (those go to
:class:`~permon_tpu.core.dia.Dia`).

TPU has no fast global gather — XLA lowers ``x[cols]`` to a serialized
scalar-unit loop (~7 ns/element, measured ~0.14 GnnZ/s) — but Mosaic exposes
the VPU's *in-register* shuffles: ``jnp.take_along_axis`` on two equal-shape
(8, 128) tiles lowers to one ``tpu.dynamic_gather`` along sublanes (axis 0,
index < 8) or lanes (axis 1, index < 128).  SELL restructures the matvec so
that ALL indexing is done with these two instructions:

- y is processed in tiles of 1024 rows, viewed as an (8, 128) register
  block: row r of the tile sits at (r // 128, r % 128);
- x is viewed as (R, 128); an aligned 8-row slice of it — a 1024-element
  *window* — is the addressable unit;
- the nonzeros of each row tile are scheduled at setup time into *rounds*.
  One round reads one window and processes <= 1024 nonzeros with

      P = take_along_axis(window, S, axis=0)   # sublane select
      G = take_along_axis(P,      C, axis=1)   # lane select
      acc += V * G

  where for a nonzero of row (i, j) targeting window element (s, c) the
  scheduler sets C[i, j] = c and S[i, c] = s, so G[i, j] = window[s, c].
  Constraints per round (resolved by the greedy scheduler with extra
  rounds): one nonzero per output slot (i, j), and a single consistent
  S[i, c] per (sublane, lane) pair.

The Pallas kernel streams the per-round (S, C, V) blocks from HBM (12 bytes
per slot) while x stays whole in VMEM, and revisits each output tile for its
consecutive rounds — HBM traffic is ~12 B/slot, so throughput is
(slot efficiency) * (HBM roofline / 12 B) ~ tens of GnnZ/s for FEM-like
matrices, vs ~0.14 for the gather path.  The XLA path computes the identical
round algebra with plain gathers (correct everywhere, slow on TPU) and is
the f64 / CPU fallback.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .linop import LinearOperator

TILE = 1024  # rows per output tile = one (8, 128) register block
WIN = 1024  # window size = one (8, 128) slice of x


def _schedule(a, report: Optional[dict] = None):
    """Greedy round scheduler (host, setup time).

    Returns (wstart, tid, S, C, V) with shapes (nr,), (nr,), (nr, 8, 128) x2,
    (nr, 8, 128); rounds sorted by output tile so the kernel's revisit
    pattern is consecutive.  Every tile gets at least one round (so every
    output block is written)."""
    import scipy.sparse as sp

    a = a.tocsr()
    m, n = a.shape
    ntiles = max((m + TILE - 1) // TILE, 1)
    indptr, indices, data = a.indptr, a.indices, a.data

    from ..utils.native import sell_schedule_native

    packed = sell_schedule_native(indptr, indices, data, m, ntiles)
    if packed is not None:
        wstart, tid, S, C, V = packed
    else:
        # python reference scheduler
        rounds: list = []  # (t, w, S(8,128), C, V, used(8,128))
        per_tw: dict = {}
        tiles_seen = set()
        for g in range(m):
            t, rloc = divmod(g, TILE)
            i, j = divmod(rloc, 128)
            tiles_seen.add(t)
            for p in range(indptr[g], indptr[g + 1]):
                col = int(indices[p])
                w, srem = divmod(col, WIN)
                s, c = divmod(srem, 128)
                placed = False
                for rid in per_tw.get((t, w), ()):
                    S_, C_, V_, used = rounds[rid][2:]
                    if used[i, j]:
                        continue
                    if S_[i, c] == -1 or S_[i, c] == s:
                        S_[i, c] = s
                        C_[i, j] = c
                        V_[i, j] = data[p]
                        used[i, j] = True
                        placed = True
                        break
                if not placed:
                    S_ = np.full((8, 128), -1, np.int32)
                    C_ = np.zeros((8, 128), np.int32)
                    V_ = np.zeros((8, 128), np.float64)
                    used = np.zeros((8, 128), bool)
                    S_[i, c] = s
                    C_[i, j] = c
                    V_[i, j] = data[p]
                    used[i, j] = True
                    rounds.append((t, w, S_, C_, V_, used))
                    per_tw.setdefault((t, w), []).append(len(rounds) - 1)
        for t in range(ntiles):
            if t not in tiles_seen or not any(
                key[0] == t for key in per_tw
            ):
                rounds.append(
                    (t, 0, np.zeros((8, 128), np.int32), np.zeros((8, 128), np.int32),
                     np.zeros((8, 128), np.float64), None)
                )
        rounds.sort(key=lambda r: r[0])
        nr = len(rounds)
        wstart = np.array([r[1] * 8 for r in rounds], np.int32)
        tid = np.array([r[0] for r in rounds], np.int32)
        S = np.stack([np.maximum(r[2], 0) for r in rounds])
        C = np.stack([r[3] for r in rounds])
        V = np.stack([r[4] for r in rounds])
    # pad the round count to a multiple of the kernel's rounds-per-step
    nr = len(tid)
    npad = (-nr) % RB
    if npad:
        wstart = np.concatenate([wstart, np.zeros(npad, np.int32)])
        tid = np.concatenate([tid, np.zeros(npad, np.int32)])
        S = np.concatenate([S, np.zeros((npad, 8, 128), S.dtype)])
        C = np.concatenate([C, np.zeros((npad, 8, 128), C.dtype)])
        V = np.concatenate([V, np.zeros((npad, 8, 128), V.dtype)])
    if report is not None:
        report["rounds"] = int(nr)
        report["slots"] = int(nr) * TILE
        report["efficiency"] = a.nnz / max(int(nr) * TILE, 1)
    return wstart, tid, S, C, V


@struct.dataclass
class SEll(LinearOperator):
    """Gather-scheduled sparse operator (see module docstring).

    ``rmv`` needs a transpose plan: build with ``with_transpose=True`` (any
    rectangular operator used as B) or ``symmetric=True`` (QP Hessians)."""

    wstart: jax.Array  # (nr,) i32 — x-window start row (multiple of 8)
    tid: jax.Array  # (nr,) i32 — output tile of each round (nondecreasing)
    S: jax.Array  # (nr, 8, 128) i32 — sublane-select table, lane-indexed
    C: jax.Array  # (nr, 8, 128) i32 — lane select, slot-indexed
    V: jax.Array  # (nr, 8, 128) — values, slot-indexed
    shape: Tuple[int, int] = struct.field(pytree_node=False)
    x_rows: int = struct.field(pytree_node=False)  # padded rows of x2d
    ntiles: int = struct.field(pytree_node=False)
    use_pallas: bool = struct.field(pytree_node=False, default=True)
    t_plan: Optional["SEll"] = None  # transpose plan for rmv
    symmetric: bool = struct.field(pytree_node=False, default=False)
    nnz: int = struct.field(pytree_node=False, default=0)

    @classmethod
    def from_scipy(
        cls,
        a,
        use_pallas: bool = True,
        with_transpose: bool = False,
        symmetric: bool = False,
        report: Optional[dict] = None,
    ) -> "SEll":
        import scipy.sparse as sp

        a = a.tocsr()
        m, n = a.shape
        wstart, tid, S, C, V = _schedule(a, report=report)
        ntiles = max((m + TILE - 1) // TILE, 1)
        x_rows = int(max(wstart.max() + 8 if len(wstart) else 8, (n + 127) // 128))
        t_plan = None
        if with_transpose and not symmetric:
            t_plan = cls.from_scipy(a.T.tocsr(), use_pallas=use_pallas)
        return cls(
            wstart=jnp.asarray(wstart), tid=jnp.asarray(tid),
            S=jnp.asarray(S), C=jnp.asarray(C),
            V=jnp.asarray(V.astype(a.dtype)),
            shape=(int(m), int(n)), x_rows=x_rows, ntiles=ntiles,
            use_pallas=use_pallas, t_plan=t_plan, symmetric=symmetric,
            nnz=int(a.nnz),
        )

    def _x2d(self, x):
        xp = jnp.zeros(self.x_rows * 128, x.dtype).at[: self.n].set(x)
        return xp.reshape(self.x_rows, 128)

    def mv(self, x):
        if self.use_pallas and x.dtype == jnp.float32:
            y = _sell_mv_pallas(
                self.wstart, self.tid, self.S, self.C, self.V.astype(x.dtype),
                self._x2d(x), self.ntiles,
            )
        else:
            y = _sell_mv_xla(
                self.wstart, self.tid, self.S, self.C, self.V.astype(x.dtype),
                self._x2d(x), self.ntiles,
            )
        return y[: self.m]

    def rmv(self, x):
        if self.symmetric:
            return self.mv(x)
        if self.t_plan is None:
            raise NotImplementedError(
                "SEll.rmv needs with_transpose=True or symmetric=True"
            )
        return self.t_plan.mv(x)

    def todense(self):
        # reconstruct from the round algebra applied to identity columns
        eye = jnp.eye(self.n, dtype=self.V.dtype)
        return jax.vmap(self.mv, in_axes=1, out_axes=1)(eye)


def _sell_mv_xla(wstart, tid, S, C, V, x2d, ntiles):
    """Round algebra with plain XLA gathers — the everywhere-correct path."""
    windows = jax.vmap(
        lambda ws: jax.lax.dynamic_slice(x2d, (ws, jnp.zeros((), ws.dtype)), (8, 128))
    )(wstart)
    P = jnp.take_along_axis(windows, S, axis=1)
    G = jnp.take_along_axis(P, C, axis=2)
    contrib = (V * G).reshape(V.shape[0], -1)
    y = jax.ops.segment_sum(contrib, tid, num_segments=ntiles)
    return y.reshape(-1)


#: rounds per grid step — amortizes the per-step pipeline overhead (~200 ns,
#: which dominated a one-round-per-step kernel at ~6 vreg-ops of real work
#: per round); the scheduler pads the global round count to a multiple
RB = 32


@partial(jax.jit, static_argnames=("ntiles", "interpret"))
def _sell_mv_pallas(wstart, tid, S, C, V, x2d, ntiles, interpret: bool = False):
    """RB rounds per grid step; x2d and the whole output live in VMEM (the
    output is written at a dynamic row offset per round, so rounds need no
    tile ordering); (S, C, V) blocks stream from HBM double-buffered."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nr = S.shape[0]
    assert nr % RB == 0, "scheduler must pad rounds to a multiple of RB"

    def kernel(ws_ref, tid_ref, S_ref, C_ref, V_ref, x_ref, o_ref):
        r = pl.program_id(0)

        @pl.when(r == 0)
        def _():
            o_ref[:, :] = jnp.zeros_like(o_ref)

        for q in range(RB):
            k = r * RB + q
            win = x_ref[pl.ds(pl.multiple_of(ws_ref[k], 8), 8), :]
            P = jnp.take_along_axis(win, S_ref[q], axis=0)
            G = jnp.take_along_axis(P, C_ref[q], axis=1)
            t8 = pl.multiple_of(tid_ref[k] * 8, 8)
            o_ref[pl.ds(t8, 8), :] = o_ref[pl.ds(t8, 8), :] + V_ref[q] * G

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nr // RB,),
        in_specs=[
            pl.BlockSpec((RB, 8, 128), lambda r, ws, tid: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, 8, 128), lambda r, ws, tid: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, 8, 128), lambda r, ws, tid: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    with jax.enable_x64(False):
        y = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((ntiles * 8, 128), x2d.dtype),
            interpret=interpret,
        )(wstart, tid, S, C, V, x2d)
    return y.reshape(-1)
