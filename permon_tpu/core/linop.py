"""Composable linear operators (pytrees) — the TPU-native analog of PERMON's Mat layer.

The reference implements matrix types as PETSc objects with an ops vtable
(reference: src/mat/impls/*, include/permon/private/permonmatimpl.h).  Here an
operator is an immutable ``flax.struct`` dataclass — a pytree that can be
passed through ``jit``/``grad``/``shard_map`` — with methods

- ``mv(x)``   : y = A @ x
- ``rmv(x)``  : y = A.T @ x

Implicit composition (never materialized) follows the reference's MatProd /
MatPenalized idiom (reference: src/mat/impls/composite/matprod.c,
src/qp/utils/matpenalized.c).

Sparse storage is ELL (padded fixed-width rows): ideal for the VPU because the
matvec is a dense gather + multiply + row-sum with static shapes, and the
padding cost is negligible for FD/FEM matrices with bounded row degree.  CSR
input is converted on host at setup time.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


class LinearOperator:
    """Mixin providing shared operator sugar; concrete ops are flax dataclasses."""

    #: (m, n) — static python ints
    shape: Tuple[int, int]

    def mv(self, x: jax.Array) -> jax.Array:
        raise NotImplementedError

    def rmv(self, x: jax.Array) -> jax.Array:
        raise NotImplementedError

    # A @ x sugar
    def __matmul__(self, x):
        if isinstance(x, LinearOperator):
            return Product((self, x))
        return self.mv(x)

    @property
    def T(self) -> "LinearOperator":
        return Transpose(self)

    @property
    def m(self) -> int:
        return self.shape[0]

    @property
    def n(self) -> int:
        return self.shape[1]

    def diagonal(self) -> jax.Array:
        raise NotImplementedError(f"{type(self).__name__} has no diagonal()")

    def todense(self) -> jax.Array:
        """Materialize as dense by applying to the identity (columns).

        Mirrors MatInvExplicitly / MatMatMultByColumns fallbacks in the
        reference (src/mat/impls/inv/matinv.c:594, permonmatutils.c)."""
        eye = jnp.eye(self.n, dtype=jnp.result_type(float))
        return jax.vmap(self.mv, in_axes=1, out_axes=1)(eye)


@struct.dataclass
class Dense(LinearOperator):
    """Dense operator — MXU-friendly; the default for small/condensed blocks."""

    a: jax.Array
    shape: Tuple[int, int] = struct.field(pytree_node=False)

    @classmethod
    def create(cls, a) -> "Dense":
        a = jnp.asarray(a)
        return cls(a=a, shape=(int(a.shape[0]), int(a.shape[1])))

    def mv(self, x):
        return self.a @ x

    def rmv(self, x):
        return self.a.T @ x

    def diagonal(self):
        return jnp.diagonal(self.a)

    def todense(self):
        return self.a


@struct.dataclass
class DenseTree(Dense):
    """Dense wide (k, m) operator whose matvecs reduce as FIXED BINARY
    TREES of elementwise adds instead of XLA dot ops.

    Exists for the f64 coarse operator G on TPU: f64 there is float-float
    emulated and XLA lowers an f64 ``dot``/``reduce`` SEQUENTIALLY along
    the contraction (the compensation is order-dependent) — measured
    12.4 ms for one (63, 94563) f64 GEMV pair on a v5e where the tree is
    bandwidth-bound at well under a millisecond.  The tree is also
    deterministic by construction (core/detred.py), so projector
    applications are bit-stable across device counts for free.  Subclasses
    :class:`Dense` so dense-aware call sites (dense_rows short-circuit,
    sparse_rows transforms) keep working."""

    #: element budget for one tree-reduction chunk: the elementwise product
    #: a * x materializes a (k, m) temp before the tree collapses it — at
    #: the 1.18M-dof elasticity coarse (540 x 253000, ~1.1 GB f64) several
    #: such temps live across MPRGP's cond branches and overflowed HBM by
    #: 1 GB.  Chunking along the NON-reduced axis is bitwise-identical
    #: (each output element's summation tree is untouched) and caps the
    #: temp at ~128 MB.
    CHUNK_ELEMS = 1 << 24

    def mv(self, x):
        from .detred import det_sum

        k, m = self.a.shape
        xa = x[None, :].astype(self.a.dtype)
        if k > 1 and k * m > self.CHUNK_ELEMS:
            rows = max(self.CHUNK_ELEMS // max(m, 1), 1)
            outs = [
                det_sum(self.a[i0:i0 + rows] * xa, axis=-1)
                for i0 in range(0, k, rows)
            ]
            return jnp.concatenate(outs).astype(x.dtype)
        return det_sum(self.a * xa, axis=-1).astype(x.dtype)

    def rmv(self, y):
        from .detred import det_sum

        k, m = self.a.shape
        ya = y[:, None].astype(self.a.dtype)
        if m > 1 and k * m > self.CHUNK_ELEMS:
            cols = max(self.CHUNK_ELEMS // max(k, 1), 1)
            outs = [
                det_sum(self.a[:, j0:j0 + cols] * ya, axis=0)
                for j0 in range(0, m, cols)
            ]
            return jnp.concatenate(outs).astype(y.dtype)
        return det_sum(self.a * ya, axis=0).astype(y.dtype)


@struct.dataclass
class Diagonal(LinearOperator):
    d: jax.Array
    shape: Tuple[int, int] = struct.field(pytree_node=False)

    @classmethod
    def create(cls, d) -> "Diagonal":
        d = jnp.asarray(d)
        return cls(d=d, shape=(int(d.shape[0]), int(d.shape[0])))

    def mv(self, x):
        return self.d * x

    rmv = mv

    def diagonal(self):
        return self.d

    def todense(self):
        return jnp.diag(self.d)


@struct.dataclass
class Identity(LinearOperator):
    shape: Tuple[int, int] = struct.field(pytree_node=False)

    @classmethod
    def create(cls, n: int) -> "Identity":
        return cls(shape=(n, n))

    def mv(self, x):
        return x

    rmv = mv

    def diagonal(self):
        return jnp.ones(self.n, dtype=jnp.result_type(float))


@struct.dataclass
class Ell(LinearOperator):
    """Row-wise padded sparse operator (ELLPACK).

    ``cols[i, k]`` / ``vals[i, k]`` hold the k-th nonzero of row i; padded
    slots have ``vals == 0`` and ``cols`` pointing at column 0 so a gather is
    always in-bounds.  The TPU-idiomatic replacement for distributed AIJ
    matvecs in the reference hot loops (e.g. MatMult in QPSSolve_MPGP,
    reference: src/qps/impls/mpgp/mpgp.c:500).
    """

    cols: jax.Array  # (m, k) int32
    vals: jax.Array  # (m, k) float
    shape: Tuple[int, int] = struct.field(pytree_node=False)

    @classmethod
    def from_scipy(cls, a) -> "Ell":
        """Build from any scipy.sparse matrix (host-side, setup only).

        Uses the native C++ converter (native/permon_host.cpp) when available,
        falling back to a python loop for small matrices."""
        a = a.tocsr()
        m, n = a.shape
        from ..utils.native import csr_to_ell_native

        packed = csr_to_ell_native(a) if m > 0 else None
        if packed is not None:
            cols, vals = packed
            vals = vals.astype(a.dtype, copy=False)
        else:
            row_nnz = np.diff(a.indptr)
            k = max(int(row_nnz.max()) if m else 0, 1)
            cols = np.zeros((m, k), dtype=np.int32)
            vals = np.zeros((m, k), dtype=a.dtype)
            for i in range(m):
                lo, hi = a.indptr[i], a.indptr[i + 1]
                cols[i, : hi - lo] = a.indices[lo:hi]
                vals[i, : hi - lo] = a.data[lo:hi]
        return cls(cols=jnp.asarray(cols), vals=jnp.asarray(vals), shape=(int(m), int(n)))

    @classmethod
    def from_coo(cls, rows, cols, vals, shape) -> "Ell":
        import scipy.sparse as sp

        return cls.from_scipy(sp.coo_matrix((vals, (rows, cols)), shape=shape))

    @property
    def nnz(self) -> int:
        return int(self.vals.size)

    def mv(self, x):
        return jnp.sum(self.vals * x[self.cols], axis=1)

    def rmv(self, x):
        contrib = self.vals * x[:, None]
        return jnp.zeros(self.n, dtype=contrib.dtype).at[self.cols].add(contrib)

    def diagonal(self):
        row_ids = jnp.arange(self.m)[:, None]
        return jnp.sum(jnp.where(self.cols == row_ids, self.vals, 0.0), axis=1)

    def todense(self):
        out = jnp.zeros(self.shape, dtype=self.vals.dtype)
        rows = jnp.broadcast_to(jnp.arange(self.m)[:, None], self.cols.shape)
        return out.at[rows, self.cols].add(self.vals)


@struct.dataclass
class Transpose(LinearOperator):
    inner: Any

    @property
    def shape(self):
        m, n = self.inner.shape
        return (n, m)

    def mv(self, x):
        return self.inner.rmv(x)

    def rmv(self, x):
        return self.inner.mv(x)

    @property
    def T(self):
        return self.inner

    def todense(self):
        return self.inner.todense().T


@struct.dataclass
class Scaled(LinearOperator):
    inner: Any
    scale: jax.Array  # scalar (pytree leaf so it can change without recompiling)

    @property
    def shape(self):
        return self.inner.shape

    def mv(self, x):
        return self.scale * self.inner.mv(x)

    def rmv(self, x):
        return self.scale * self.inner.rmv(x)

    def diagonal(self):
        return self.scale * self.inner.diagonal()


@struct.dataclass
class Sum(LinearOperator):
    """y = sum_i ops[i] @ x — additive composite (reference: MATCOMPOSITE additive)."""

    ops: Tuple[Any, ...]

    @property
    def shape(self):
        return self.ops[0].shape

    def mv(self, x):
        y = self.ops[0].mv(x)
        for op in self.ops[1:]:
            y = y + op.mv(x)
        return y

    def rmv(self, x):
        y = self.ops[0].rmv(x)
        for op in self.ops[1:]:
            y = y + op.rmv(x)
        return y

    def diagonal(self):
        d = self.ops[0].diagonal()
        for op in self.ops[1:]:
            d = d + op.diagonal()
        return d


@struct.dataclass
class Product(LinearOperator):
    """y = ops[0] @ ops[1] @ ... @ x — lazy multiplicative composite.

    The FETI dual operator F = B K+ B^T is exactly this 3-factor product
    (reference: MatCreateProd, src/mat/impls/composite/matprod.c:43 and
    src/qp/interface/qptransform.c:1102)."""

    ops: Tuple[Any, ...]

    @property
    def shape(self):
        return (self.ops[0].shape[0], self.ops[-1].shape[1])

    def mv(self, x):
        for op in reversed(self.ops):
            x = op.mv(x)
        return x

    def rmv(self, x):
        for op in self.ops:
            x = op.rmv(x)
        return x


@struct.dataclass
class VStack(LinearOperator):
    """Vertically stacked operator [B0; B1; ...] — the analog of the 2x1
    MATNESTPERMON the reference builds when merging BE and BI into one
    constraint matrix B (reference: QPSetUpInnerObjects, qp.c:492-598)."""

    ops: Tuple[Any, ...]

    @property
    def shape(self):
        return (sum(op.shape[0] for op in self.ops), self.ops[0].shape[1])

    @property
    def row_offsets(self):
        offs, o = [], 0
        for op in self.ops:
            offs.append((o, o + op.shape[0]))
            o += op.shape[0]
        return offs

    def mv(self, x):
        return jnp.concatenate([op.mv(x) for op in self.ops])

    def rmv(self, y):
        out = None
        for op, (lo, hi) in zip(self.ops, self.row_offsets):
            contrib = op.rmv(y[lo:hi])
            out = contrib if out is None else out + contrib
        return out

    def todense(self):
        return jnp.concatenate([op.todense() for op in self.ops], axis=0)


@struct.dataclass
class Penalized(LinearOperator):
    """y = A @ x + rho * B^T (B x) — the augmented-Lagrangian Hessian.

    ``rho`` is a traced scalar: SMALXE updates it between outer iterations
    without triggering recompilation (reference: MatPenalizedUpdatePenalty,
    src/qp/utils/matpenalized.c:4-120)."""

    a: Any
    b: Any  # the constraint operator B (m_dual x n)
    rho: jax.Array

    @property
    def shape(self):
        return self.a.shape

    def mv(self, x):
        return self.a.mv(x) + self.rho * self.b.rmv(self.b.mv(x))

    rmv = mv  # symmetric by construction (A symmetric in QP context)

    def mv_parts(self, x):
        """Return (A x, B x) so callers can reuse B x (SMALXE's ||Bu|| update
        reuses the penalized term, reference: smalxe.c:246-285)."""
        bx = self.b.mv(x)
        return self.a.mv(x) + self.rho * self.b.rmv(bx), bx


def aslinearoperator(a) -> LinearOperator:
    if isinstance(a, LinearOperator):
        return a
    if isinstance(a, (jnp.ndarray, np.ndarray)):
        return Dense.create(a)
    try:
        import scipy.sparse as sp

        if sp.issparse(a):
            # banded -> DIA (HBM-roofline shifted streams), else ELL
            from .matutils import make_operator

            return make_operator(a)
    except ImportError:
        pass
    raise TypeError(f"cannot interpret {type(a)} as LinearOperator")


@struct.dataclass
class OneRow(LinearOperator):
    """1 x n operator from a vector: mv = [v'x], rmv = y[0]*v — the MATONEROW
    analog used for single scalar constraints (reference:
    src/mat/impls/onerow/onerow.c:5-50)."""

    v: jax.Array

    @property
    def shape(self):
        return (1, int(self.v.shape[0]))

    def mv(self, x):
        return jnp.vdot(self.v, x)[None]

    def rmv(self, y):
        return y[0] * self.v

    def todense(self):
        return self.v[None, :]


@struct.dataclass
class Timer(LinearOperator):
    """Instrumentation wrapper — the MATTIMER analog (reference:
    src/mat/impls/timer/mattimer.c).  Each operation runs inside a
    jax.named_scope (visible in XLA/profiler traces) and bumps a host-side
    counter dict shared with :mod:`permon_tpu.sys.tracing`.

    Wrapping is free under jit: the scopes only annotate the HLO, and the
    counters count TRACES (per-compilation op counts), which together with
    iteration counts gives the per-operator apply totals the reference logs
    via PetscLogEvent."""

    inner: Any
    name: str = struct.field(pytree_node=False, default="op")

    @property
    def shape(self):
        return self.inner.shape

    def _count(self, op: str):
        from ..sys.tracing import count_op

        count_op(self.name, op)

    def mv(self, x):
        self._count("mv")
        with jax.named_scope(f"{self.name}.mv"):
            return self.inner.mv(x)

    def rmv(self, x):
        self._count("rmv")
        with jax.named_scope(f"{self.name}.rmv"):
            return self.inner.rmv(x)

    def diagonal(self):
        return self.inner.diagonal()

    def todense(self):
        return self.inner.todense()
