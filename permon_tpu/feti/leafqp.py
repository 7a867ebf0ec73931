"""Scaled-leaf dual space — the fast (leaf-space) dual iteration opened to
EVERY solver: contact (SMALXE/MPRGP with box constraints), lumped-PC
projected CG, plain projected CG.

Round 2's leaf path (:mod:`permon_tpu.feti.leaf`) ran a dedicated CG with
multiplicity-WEIGHTED dots, so it was gated to the unconstrained,
unpreconditioned case.  The round-3 trick is an ISOMETRY instead of a
weighted space: represent a dual (row-space) vector x by the flat leaf
array

    xt[l] = sqrt(w_l) * x[row(l)],    w_l = 1/deg(row(l))  (0 at pads)

Then the EUCLIDEAN dot of two scaled-leaf vectors equals the row-space dot
exactly (sum_l w_l x_r y_r = sum_r x_r y_r), componentwise operations act on
deg identical copies per row (so box projections/gradient splits/feasible
steps make the same decisions as in row space), and every operator conjugated
with the scaling S = diag(sqrt(w)),

    A_leaf = S (leaf apply) S+,

is symmetric in the plain Euclidean sense.  Consequence: the STANDARD
solvers (cg/mprgp/smalxe), the standard Projector, the standard
BoxConstraint and the standard dual preconditioner machinery all run
verbatim on scaled-leaf vectors, with the same recurrence coefficients as
row space — while each F application costs two batched einsums, one batched
GEMV and a static partner combine (the 13x-faster leaf apply of
feti/leaf.py), with zero per-nnz row-space gathers.

This is the TPU conclusion of the reference's PetscSF/MATGLUING leaf
storage (src/mat/impls/gluing/gluing.c) — instead of bouncing between root
(row) and leaf representations per apply, the whole Krylov/active-set
iteration lives in leaf space.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core.linop import LinearOperator
from ..qp.projector import Projector, dense_rows
from ..qp.qp import QP
from ..qpc.box import BoxConstraint
from .leaf import LeafDualOperator, LeafDualSpace


@struct.dataclass
class ScaledLeafSpace:
    """The isometry between the m-dim dual row space and flat scaled-leaf
    vectors (module docstring)."""

    space: LeafDualSpace
    s: jax.Array   # (ns, k) sqrt(weights); 0 at pad slots
    si: jax.Array  # (ns, k) 1/s at real slots, 0 at pads

    @classmethod
    def create(cls, space: LeafDualSpace) -> "ScaledLeafSpace":
        w = space.weights
        s = jnp.sqrt(w)
        si = jnp.where(w > 0, 1.0 / jnp.maximum(s, 1e-300), 0.0)
        return cls(space=space, s=s, si=si)

    @property
    def nleaf(self) -> int:
        return int(self.s.size)

    def lift(self, x) -> jax.Array:
        """Row-space (m,) -> flat scaled-leaf (nleaf,)."""
        return (self.space.lift(x) * self.s.astype(x.dtype)).reshape(-1)

    def restrict(self, xt) -> jax.Array:
        """Flat scaled-leaf -> row-space (m,) (exact on consistent input)."""
        X = xt.reshape(self.s.shape) * self.si.astype(xt.dtype)
        return self.space.restrict(X)

    def lift_bound(self, bound, fill) -> jax.Array:
        """Lift a bound vector: pad slots get ``fill`` (+-inf) so they stay
        inactive; +-inf entries stay +-inf (s > 0 at real slots)."""
        pad = self.space.weights <= 0
        lifted = self.space.lift(bound) * self.s.astype(bound.dtype)
        return jnp.where(pad, jnp.asarray(fill, bound.dtype), lifted).reshape(-1)


@struct.dataclass
class ScaledLeafOperator(LinearOperator):
    """S (leaf apply) S+ as a standard LinearOperator on flat scaled-leaf
    vectors.  ``op`` is anything with ``.apply((ns, k)) -> (ns, k)`` that
    maps consistent arrays to consistent arrays (LeafDualOperator,
    OverlappedLeafOperator, or a lumped-PC LeafDualOperator)."""

    op: Any
    sp: ScaledLeafSpace

    @property
    def shape(self):
        n = self.sp.nleaf
        return (n, n)

    def mv(self, xt):
        X = xt.reshape(self.sp.s.shape) * self.sp.si.astype(xt.dtype)
        Y = self.op.apply(X)
        return (Y * self.sp.s.astype(xt.dtype)).reshape(-1)

    rmv = mv  # Euclidean-symmetric by the isometry


@struct.dataclass
class LeafG(LinearOperator):
    """The dual equality operator G on scaled-leaf vectors: mv produces the
    coarse (kc,) vector exactly equal to G x_row; rmv lifts G'y back."""

    Gl: jax.Array  # (kc, ns, k) rows of G lifted to consistent leaf arrays
    sp: ScaledLeafSpace

    @property
    def shape(self):
        return (int(self.Gl.shape[0]), self.sp.nleaf)

    def mv(self, xt):
        X = xt.reshape(self.sp.s.shape)
        with jax.default_matmul_precision("highest"):
            return jnp.einsum(
                "cst,st->c", self.Gl * self.sp.s.astype(xt.dtype), X
            )

    def rmv(self, y):
        with jax.default_matmul_precision("highest"):
            Z = jnp.einsum("cst,c->st", self.Gl, y)
        return (Z * self.sp.s.astype(y.dtype)).reshape(-1)


def leaf_dual_qp(
    dual: QP,
    BE_primal,
    kplus,
    mesh=None,
) -> Tuple[QP, ScaledLeafSpace]:
    """Translate a row-space dual QP (as produced by :func:`dualize` on a
    TFETI problem) into its scaled-leaf equivalent.

    Returns ``(qp_leaf, sls)``; map solutions back with ``sls.restrict``.
    The coarse projector reuses the row-space GG' Cholesky (G_leaf G_leaf' =
    G G' exactly).  ``mesh`` routes the F apply through the
    ppermute-overlapped boundary exchange (parallel/overlap.py)."""
    B = BE_primal.with_dense_blocks()
    op_leaf = LeafDualOperator.create(B, kplus)
    sls = ScaledLeafSpace.create(op_leaf.space)
    if mesh is not None:
        from ..parallel.overlap import LeafOverlapPlan, OverlappedLeafOperator

        plan = LeafOverlapPlan.build(op_leaf.space, mesh.devices.size)
        op_leaf = OverlappedLeafOperator(op=op_leaf, plan=plan, mesh=mesh)

    A = ScaledLeafOperator(op=op_leaf, sp=sls)
    b = sls.lift(dual.b)
    x0 = sls.lift(dual.x0) if dual.x0 is not None else None

    BE = None
    pf = None
    if dual.BE is not None:
        Gd = dense_rows(dual.BE)
        Gl = jax.vmap(sls.space.lift)(Gd)
        BE = LeafG(Gl=Gl, sp=sls)
        ggt_chol = dual.pf.ggt_chol if dual.pf is not None else None
        if ggt_chol is None and dual.pf is not None and dual.pf.orthonormal_rows:
            pf = Projector(G=BE, ggt_chol=None, orthonormal_rows=True)
        else:
            if ggt_chol is None:
                from ..core.detred import gram

                ggt_chol = jnp.linalg.cholesky(gram(Gd))
            pf = Projector(G=BE, ggt_chol=ggt_chol, orthonormal_rows=False)

    box = None
    if dual.box is not None:
        lb = sls.lift_bound(dual.box.lb, -jnp.inf)
        ub = sls.lift_bound(dual.box.ub, jnp.inf)
        box = BoxConstraint(
            lb=lb, ub=ub, astol=dual.box.astol,
            has_lb=dual.box.has_lb, has_ub=dual.box.has_ub,
        )

    qp_leaf = QP(
        A=A, b=b, x0=x0, box=box, BE=BE, cE=dual.cE, BI=None, cI=None,
        R=None, pf=pf, dots_dtype=dual.dots_dtype,
    )
    return qp_leaf, sls


def lumped_pc_leaf(BE_primal, K_blocks, sls: ScaledLeafSpace):
    """Lumped dual preconditioner B K B' on scaled-leaf vectors (PCDUAL
    lumped, src/pc/impls/dual/pcdual.c:63-78): the same three-einsum leaf
    apply with the stiffness blocks in place of the K+ inverses."""
    B = BE_primal.with_dense_blocks()
    op = LeafDualOperator(
        blk=B.blk, invs=jnp.asarray(K_blocks), space=sls.space
    )
    return ScaledLeafOperator(op=op, sp=sls)
