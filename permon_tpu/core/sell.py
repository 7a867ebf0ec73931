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
that ALL indexing is done with these instructions:

- y is processed in tiles of 1024 rows, viewed as an (8, 128) register
  block: row r of the tile sits at (r // 128, r % 128);
- x is viewed as (R, 128); an aligned ``win``-element slice of it — a
  (win/128, 128) *window* — is the addressable unit (win a power-of-two
  multiple of 1024, chosen per matrix at setup);
- the nonzeros of each row tile are scheduled at setup time into *rounds*.
  One round reads one window and processes <= 1024 nonzeros: for a nonzero
  of row (i, j) targeting window element (s, c) the scheduler sets
  S[i, c] = s and C[i, j] = c, and the kernel computes

      P = select-tree of take_along_axis over the window's (8,128) blocks
      G = take_along_axis(P, C, axis=1)     # lane select
      acc += V * G.

  Constraints per round (resolved by the greedy scheduler with extra
  rounds): one nonzero per output slot (i, j), and a single consistent
  S[i, c] per (sublane, lane) pair.

Slot efficiency (nnz / (rounds * 1024)) is what sets the throughput: the
kernel streams 6 bytes per slot from HBM — S and C packed into ONE int16
(code = s * 128 + c) plus an f32 value — so the HBM-bound rate is
eff * BW / 6 B.  Wider windows raise eff directly (fewer (tile, window)
pairs for the same nonzeros) at the cost of (win/1024) sublane-gathers per
round; ``win='auto'`` schedules the candidates and picks the best
predicted rate.  The native scheduler follows the greedy pass with a
DRAIN-COMPACTION sweep (native/permon_host.cpp sell_compact): entries of
thin rounds migrate into fuller compatible rounds and drained rounds die —
on the RCM 3-D Laplacian this lifts eff 0.622 -> 0.715 at win = 2048
(54.3 GnnZ/s on one v5e) against an exact slot/consistency-aware lower
bound of 0.840 (= the window-cover bound; the S-consistency constraint is
binding nowhere on that matrix — scripts/sell_bound.py computes both).
The python fallback scheduler keeps the plain greedy (correctness
identical, efficiency lower).  The XLA path computes the identical round
algebra with plain gathers (correct everywhere, slow on TPU) and is the
f64 / CPU fallback.
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
WIN_CANDIDATES = (1024, 2048, 4096)


def _schedule(a, win: int = 1024, report: Optional[dict] = None):
    """Greedy round scheduler (host, setup time).

    Returns (wstart, tid, S, C, V) with shapes (nr,), (nr,), (nr, 8, 128) x2,
    (nr, 8, 128); rounds sorted by output tile so the kernel's revisit
    pattern is consecutive.  Every tile gets at least one round (so every
    output block is written).  ``win`` = window element count."""
    import scipy.sparse as sp

    a = a.tocsr()
    m, n = a.shape
    ntiles = max((m + TILE - 1) // TILE, 1)
    wr = win // 128
    indptr, indices, data = a.indptr, a.indices, a.data

    from ..utils.native import sell_schedule_native

    packed = sell_schedule_native(indptr, indices, data, m, ntiles, win=win)
    if packed is not None:
        wstart, tid, S, C, V = packed
    else:
        # python reference scheduler.  Nonzeros are visited DIAGONAL-major
        # within each tile (sorted by col - row): one offset's entries in a
        # row group have distinct lanes and one consistent sublane, so they
        # pack into a round without S conflicts (same order as the native
        # scheduler).
        rounds: list = []  # (t, w, S(8,128), C, V, used(8,128))
        per_tw: dict = {}
        tiles_seen = set()
        row_of = np.repeat(np.arange(m), np.diff(indptr))
        for t in range((m + TILE - 1) // TILE):
            tiles_seen.add(t)
            p_lo, p_hi = indptr[t * TILE], indptr[min((t + 1) * TILE, m)]
            ps = np.arange(p_lo, p_hi)
            ps = ps[np.argsort(indices[ps] - row_of[ps], kind="stable")]
            # 1024-aligned (not win-aligned) greedy interval cover of this
            # tile's column blocks — same placement as the native scheduler
            wstarts = []
            cov_end = -1
            for b in np.unique(indices[p_lo:p_hi] >> 10):
                if b > cov_end:
                    wstarts.append(int(b))
                    cov_end = int(b) + (win >> 10) - 1
            wstarts = np.asarray(wstarts, dtype=np.int64)
            for p in ps:
                g = int(row_of[p])
                i, j = divmod(g - t * TILE, 128)
                col = int(indices[p])
                w = int(wstarts[np.searchsorted(wstarts, col >> 10, side="right") - 1])
                s, c = divmod(col - (w << 10), 128)
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
        # r[1] is the window's start BLOCK id (1024 elements = 8 x2d rows)
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
        report["win"] = int(win)
    return wstart, tid, S, C, V


def _predicted_rate(nnz: int, nr: int, win: int) -> float:
    """Relative throughput model for the auto window choice: per-round cost
    is the max of the 6 KB HBM stream and the VPU gather tree (2 vreg ops
    per (8,128) window block + ~6 fixed ops), in arbitrary units."""
    vpu = 2 * (win // 1024) + 6
    hbm = 8.0  # 6 KB/round at the measured ~580 GB/s in the same units
    return nnz / (nr * max(vpu, hbm))


@struct.dataclass
class SEll(LinearOperator):
    """Gather-scheduled sparse operator (see module docstring).

    ``rmv`` needs a transpose plan: build with ``with_transpose=True`` (any
    rectangular operator used as B) or ``symmetric=True`` (QP Hessians)."""

    wstart: jax.Array  # (nr,) i32 — x-window start row (multiple of 8)
    tid: jax.Array  # (nr,) i32 — output tile of each round (nondecreasing)
    SC: jax.Array  # (nr*8, 128) i16 — packed s*128 + c, slot/lane-indexed
    V: jax.Array  # (nr, 8, 128) — values, slot-indexed
    shape: Tuple[int, int] = struct.field(pytree_node=False)
    x_rows: int = struct.field(pytree_node=False)  # padded rows of x2d
    ntiles: int = struct.field(pytree_node=False)
    win: int = struct.field(pytree_node=False, default=1024)
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
        win="auto",
        report: Optional[dict] = None,
    ) -> "SEll":
        """``win``: window element count (multiple of 1024) or 'auto' — try
        WIN_CANDIDATES and keep the best predicted rate (wider windows pack
        more nonzeros per round but cost more in-register selects)."""
        import scipy.sparse as sp

        a = a.tocsr()
        m, n = a.shape
        if win == "auto":
            best = None
            for cand in WIN_CANDIDATES:
                rep_c: dict = {}
                sched = _schedule(a, win=cand, report=rep_c)
                rate = _predicted_rate(a.nnz, max(rep_c["rounds"], 1), cand)
                if best is None or rate > best[0]:
                    best = (rate, cand, sched, rep_c)
            _, win, (wstart, tid, S, C, V), rep_c = best
            if report is not None:
                report.update(rep_c)
        else:
            win = int(win)
            wstart, tid, S, C, V = _schedule(a, win=win, report=report)
        nr = len(tid)
        SC = (S.astype(np.int32) * 128 + C.astype(np.int32)).astype(np.int16)
        ntiles = max((m + TILE - 1) // TILE, 1)
        wr = win // 128
        x_rows = int(max(wstart.max() + wr if len(wstart) else wr,
                         (n + 127) // 128))
        t_plan = None
        if with_transpose and not symmetric:
            t_plan = cls.from_scipy(a.T.tocsr(), use_pallas=use_pallas, win="auto")
        return cls(
            wstart=jnp.asarray(wstart), tid=jnp.asarray(tid),
            SC=jnp.asarray(SC.reshape(nr * 8, 128)),
            V=jnp.asarray(V.astype(a.dtype)),
            shape=(int(m), int(n)), x_rows=x_rows, ntiles=ntiles,
            win=int(win), use_pallas=use_pallas, t_plan=t_plan,
            symmetric=symmetric, nnz=int(a.nnz),
        )

    def _x2d(self, x):
        xp = jnp.zeros(self.x_rows * 128, x.dtype).at[: self.n].set(x)
        return xp.reshape(self.x_rows, 128)

    def mv(self, x):
        if self.use_pallas and x.dtype == jnp.float32:
            y = _sell_mv_pallas(
                self.wstart, self.tid, self.SC, self.V.astype(x.dtype),
                self._x2d(x), self.ntiles, self.win // 128,
            )
        else:
            y = _sell_mv_xla(
                self.wstart, self.tid, self.SC, self.V.astype(x.dtype),
                self._x2d(x), self.ntiles, self.win // 128,
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


#: valid-slot flag bit in the packed gather-plan codes (bits 0-11 hold
#: s*128 + c for win <= 4096; int16 stays positive)
GATHER_VALID_BIT = 14


@struct.dataclass
class SEllGather:
    """SELL-scheduled PURE GATHER: ``plan(x)[t] == x[idx_flat[t]]`` (0.0 at
    pad slots, idx >= n_src) for a fixed index table, at in-register
    ``tpu.dynamic_gather`` speed instead of XLA's serialized scalar-unit
    gather (~7 ns/element).

    Unlike :class:`SEll` the kernel performs NO arithmetic — each round
    masked-SELECTS gathered values into the output, and the values moved
    are the raw 32-bit words of the source vector (one int32 channel for
    f32, the two words of each f64 gathered with the same plan and
    re-concatenated by bitcast).  The result is therefore bit-identical to
    ``x[idx]`` for EVERY pattern — full f64 mantissas, subnormals, signed
    zeros — so swapping the kernel in cannot shift a solver trajectory.
    The non-pallas fallback is the plain table gather itself (exact on any
    backend; serialized on TPU)."""

    wstart: jax.Array  # (nr,) i32 — x-window start row (multiple of 8)
    tid: jax.Array  # (nr,) i32 — output tile of each round
    SC: jax.Array  # (nr*8, 128) i16 — s*128 + c | valid << GATHER_VALID_BIT
    idx: jax.Array  # (nslots,) i32 — original table (pad = n_src), fallback
    nslots: int = struct.field(pytree_node=False)
    n_src: int = struct.field(pytree_node=False)
    ntiles: int = struct.field(pytree_node=False)
    win: int = struct.field(pytree_node=False, default=1024)
    use_pallas: bool = struct.field(pytree_node=False, default=True)
    #: run the kernel through the pallas interpreter (CPU tests of the
    #: exact production path — bitcast channels + masked-select rounds)
    interpret: bool = struct.field(pytree_node=False, default=False)

    def _gather32(self, x32):
        """One 32-bit channel: (n_src,) int32 -> (nslots,) int32."""
        xp = jnp.zeros(
            ((self.n_src + 127) // 128 + (self.win // 128)) * 128, x32.dtype
        ).at[: self.n_src].set(x32)
        y = _sell_gather_pallas(
            self.wstart, self.tid, self.SC, xp.reshape(-1, 128),
            self.ntiles, self.win // 128, interpret=self.interpret,
        )
        return y[: self.nslots]

    def __call__(self, x):
        if not self.use_pallas:
            # exact by definition on any backend/dtype
            return jnp.concatenate([x, jnp.zeros(1, x.dtype)])[self.idx]
        if x.dtype == jnp.float64:
            if jax.default_backend() == "tpu" and not self.interpret:
                # the TPU has NO 64-bit storage: XLA's X64 rewrite keeps
                # every f64 as a canonical (hi, lo) f32 float-float pair
                # (and its bitcast-convert to 2xi32 is unimplemented).
                # Extracting the pair arithmetically IS the device
                # representation — hi = f32(x) and lo = f32(x - hi) are
                # exact on canonical pairs, and the two-sum recombination
                # reproduces the identical pair, so this path is bitwise
                # on TPU (asserted on chip; the CPU branch below is
                # bitwise for true-IEEE f64 via word moves).
                hi = x.astype(jnp.float32)
                lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
                gh = self._gather32(jax.lax.bitcast_convert_type(hi, jnp.int32))
                gl = self._gather32(jax.lax.bitcast_convert_type(lo, jnp.int32))
                return (
                    jax.lax.bitcast_convert_type(gh, jnp.float32).astype(
                        jnp.float64
                    )
                    + jax.lax.bitcast_convert_type(gl, jnp.float32).astype(
                        jnp.float64
                    )
                )
            w = jax.lax.bitcast_convert_type(x, jnp.int32)  # (n, 2)
            g = jnp.stack(
                [self._gather32(w[:, 0]), self._gather32(w[:, 1])], axis=-1
            )
            return jax.lax.bitcast_convert_type(g, jnp.float64)
        if x.dtype == jnp.float32:
            g = self._gather32(jax.lax.bitcast_convert_type(x, jnp.int32))
            return jax.lax.bitcast_convert_type(g, jnp.float32)
        return self._gather32(x.astype(jnp.int32))


def gather_plan(idx_flat, n_src: int, use_pallas: Optional[bool] = None,
                win="auto", report: Optional[dict] = None) -> "SEllGather":
    """Schedule a :class:`SEllGather` for an index table: the permutation
    matrix P[t, idx[t]] = 1 is fed through the SELL round scheduler (native
    when available), then the rounds' (S, C) codes get the per-slot VALID
    bit (V != 0) and V is dropped — the kernel only moves values.
    ``use_pallas`` defaults to "is the default backend a TPU"."""
    import jax as _jax
    import scipy.sparse as sp

    if use_pallas is None:
        use_pallas = _jax.default_backend() == "tpu"
    idx_flat = np.asarray(idx_flat, dtype=np.int64).reshape(-1)
    nslots = len(idx_flat)
    t = np.flatnonzero(idx_flat < n_src)
    P = sp.csr_matrix(
        (np.ones(len(t), dtype=np.float64), (t, idx_flat[t])),
        shape=(nslots, int(n_src)),
    )
    if win == "auto":
        best = None
        for cand in WIN_CANDIDATES:
            rep_c: dict = {}
            sched = _schedule(P, win=cand, report=rep_c)
            rate = _predicted_rate(P.nnz, max(rep_c["rounds"], 1), cand)
            if best is None or rate > best[0]:
                best = (rate, cand, sched, rep_c)
        _, win, (wstart, tid, S, C, V), rep_c = best
        if report is not None:
            report.update(rep_c)
    else:
        win = int(win)
        wstart, tid, S, C, V = _schedule(P, win=win, report=report)
    code = S.astype(np.int32) * 128 + C.astype(np.int32)
    code |= (V != 0.0).astype(np.int32) << GATHER_VALID_BIT
    nr = len(tid)
    return SEllGather(
        wstart=jnp.asarray(wstart), tid=jnp.asarray(tid),
        SC=jnp.asarray(code.astype(np.int16).reshape(nr * 8, 128)),
        idx=jnp.asarray(np.minimum(idx_flat, n_src).astype(np.int32)),
        nslots=nslots, n_src=int(n_src),
        ntiles=max((nslots + TILE - 1) // TILE, 1),
        win=int(win), use_pallas=use_pallas,
    )


@partial(jax.jit, static_argnames=("ntiles", "wr", "interpret"))
def _sell_gather_pallas(wstart, tid, SC, x2d, ntiles, wr,
                        interpret: bool = False):
    """Masked-select variant of :func:`_sell_mv_pallas`: no value stream and
    no arithmetic — each round gathers its window and SELECTS the valid
    slots into the output tile, leaving other rounds' slots untouched.
    int32 data path (the caller moves raw words; see SEllGather)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nr = tid.shape[0]
    assert nr % RB == 0, "scheduler must pad rounds to a multiple of RB"
    nblk = wr // 8

    def kernel(ws_ref, tid_ref, sc_ref, x_ref, o_ref):
        r = pl.program_id(0)

        @pl.when(r == 0)
        def _():
            o_ref[:, :] = jnp.zeros_like(o_ref)

        for q in range(RB):
            k = r * RB + q
            W = x_ref[pl.ds(pl.multiple_of(ws_ref[k], 8), wr), :]
            code = sc_ref[pl.ds(q * 8, 8), :].astype(jnp.int32)
            valid = code >> GATHER_VALID_BIT
            S = (code >> 7) & 63
            C = code & 127
            Sb = S & 7
            blk_id = S >> 3
            P = jnp.take_along_axis(W[0:8], Sb, axis=0)
            for b in range(1, nblk):
                Pb = jnp.take_along_axis(W[8 * b : 8 * (b + 1)], Sb, axis=0)
                P = jnp.where(blk_id == b, Pb, P)
            G = jnp.take_along_axis(P, C, axis=1)
            t8 = pl.multiple_of(tid_ref[k] * 8, 8)
            o_ref[pl.ds(t8, 8), :] = jnp.where(
                valid == 1, G, o_ref[pl.ds(t8, 8), :]
            )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nr // RB,),
        in_specs=[
            pl.BlockSpec((RB * 8, 128), lambda r, ws, tid: (r, 0),
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
        )(wstart, tid, SC, x2d)
    return y.reshape(-1)


def _unpack_sc(SC, nr):
    """(nr*8, 128) i16 packed codes -> i32 (nr, 8, 128) S (sublane) and C
    (lane)."""
    code = SC.astype(jnp.int32).reshape(nr, 8, 128)
    return code >> 7, code & 127


def _sell_mv_xla(wstart, tid, SC, V, x2d, ntiles, wr):
    """Round algebra with plain XLA gathers — the everywhere-correct path."""
    nr = V.shape[0]
    S, C = _unpack_sc(SC, nr)
    windows = jax.vmap(
        lambda ws: jax.lax.dynamic_slice(x2d, (ws, jnp.zeros((), ws.dtype)), (wr, 128))
    )(wstart)
    P = jnp.take_along_axis(windows, S, axis=1)
    G = jnp.take_along_axis(P, C, axis=2)
    contrib = (V * G).reshape(V.shape[0], -1)
    y = jax.ops.segment_sum(contrib, tid, num_segments=ntiles)
    return y.reshape(-1)


#: rounds per grid step — amortizes the per-step pipeline overhead (~200 ns,
#: which dominated a one-round-per-step kernel at ~6 vreg-ops of real work
#: per round); the scheduler pads the global round count to a multiple
RB = 64


@partial(jax.jit, static_argnames=("ntiles", "wr", "interpret"))
def _sell_mv_pallas(wstart, tid, SC, V, x2d, ntiles, wr, interpret: bool = False):
    """RB rounds per grid step; x2d and the whole output live in VMEM (the
    output is written at a dynamic row offset per round, so rounds need no
    tile ordering); the packed (SC, V) blocks — 6 B/slot — stream from HBM
    double-buffered.  The window is (wr, 128); the sublane select runs as a
    select-tree of (8,128) dynamic_gathers over its wr/8 blocks."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nr = V.shape[0]
    assert nr % RB == 0, "scheduler must pad rounds to a multiple of RB"
    nblk = wr // 8

    def kernel(ws_ref, tid_ref, sc_ref, V_ref, x_ref, o_ref):
        r = pl.program_id(0)

        @pl.when(r == 0)
        def _():
            o_ref[:, :] = jnp.zeros_like(o_ref)

        for q in range(RB):
            k = r * RB + q
            W = x_ref[pl.ds(pl.multiple_of(ws_ref[k], 8), wr), :]
            code = sc_ref[pl.ds(q * 8, 8), :].astype(jnp.int32)
            S = code >> 7
            C = code & 127
            # select-tree: gather each (8,128) window block with the SAME
            # in-block index S & 7 (one AND, reused), pick by block id
            Sb = S & 7
            blk_id = S >> 3
            P = jnp.take_along_axis(W[0:8], Sb, axis=0)
            for b in range(1, nblk):
                Pb = jnp.take_along_axis(W[8 * b : 8 * (b + 1)], Sb, axis=0)
                P = jnp.where(blk_id == b, Pb, P)
            G = jnp.take_along_axis(P, C, axis=1)
            t8 = pl.multiple_of(tid_ref[k] * 8, 8)
            o_ref[pl.ds(t8, 8), :] = o_ref[pl.ds(t8, 8), :] + V_ref[q] * G

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nr // RB,),
        in_specs=[
            pl.BlockSpec((RB * 8, 128), lambda r, ws, tid: (r, 0),
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
        )(wstart, tid, SC, V, x2d)
    return y.reshape(-1)
