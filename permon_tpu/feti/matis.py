"""MATIS -> block-diagonal transform (QPTMatISToBlockDiag analog).

The reference takes a QP whose Hessian is a PETSc MATIS — an *unassembled*
finite-element operator: per-rank local blocks A_s plus a local-to-global map,
with MatMult = scatter/local-mult/gather-add — and derives the decomposed QP
on MATBLOCKDIAG that the FETI pipeline consumes (reference:
QPTMatISToBlockDiag, src/qp/interface/qptransform.c:2006-2148):

- interface/interior index sets from the l2g mapping (the PCIS-style scan,
  qptransform.c:2050-2100) stored into the FETI ctx (:2120-2127);
- D-scaled right-hand-side decomposition: each dof copy receives
  b_global/multiplicity so the copy-sum reassembles b (qptransform.c:
  2097-2115);
- a postSolve that reassembles the global solution from the decomposed one
  and optionally checks ||Ax - b|| on the *parent* (unassembled) operator
  (QPTMatISToBlockDiagPostSolve_Private, qptransform.c:1905-1981, the
  -qpt_matis_to_diag_norm option).

Here the MATIS analog is :class:`MatIS` (per-subdomain blocks + l2g as one
batched gather -> einsum -> segment-add, all MXU/VPU friendly), and the
transform is an ordinary ``qp -> (child, post_solve, ctx)`` function; ``ctx``
carries l2g/i2g exactly like the reference's FETI ctx so
:func:`feti_problem_from_matis` / :func:`permon_tpu.feti.solve.feti_solve`
can continue the KSPFETI pipeline (gluing assembly, Dirichlet, dualize).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core.blockdiag import BlockDiagDense
from ..core.linop import LinearOperator
from ..qp.qp import QP


@struct.dataclass
class MatIS(LinearOperator):
    """Unassembled FE operator: y = sum_s P_s' A_s P_s x with P_s the l2g
    restriction of subdomain s (the MATIS MatMult semantics the reference
    requires of KSPFETI's Amat, src/ksp/impls/feti/feti.c:98-123).

    ``l2g`` entries of -1 mark padding dofs (ragged subdomains); padded rows/
    columns of ``blocks`` must carry only diagonal entries so they never
    contribute to the assembled action.
    """

    blocks: jax.Array  # (ns, nl, nl)
    l2g: jax.Array  # (ns, nl) int32/int64, -1 = padding
    n_global: int = struct.field(pytree_node=False)

    @classmethod
    def create(cls, blocks, l2g, n_global: Optional[int] = None) -> "MatIS":
        l2g = jnp.asarray(l2g)
        if n_global is None:
            n_global = int(np.asarray(l2g).max()) + 1
        return cls(blocks=jnp.asarray(blocks), l2g=l2g, n_global=n_global)

    @property
    def shape(self):
        return (self.n_global, self.n_global)

    def _restrict(self, x):
        pad = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
        idx = jnp.where(self.l2g >= 0, self.l2g, x.shape[0])
        return pad[idx]  # (ns, nl), padding dofs read 0

    def _assemble(self, y_loc, dtype):
        idx = jnp.where(self.l2g >= 0, self.l2g, self.n_global)
        out = jnp.zeros(self.n_global + 1, dtype=dtype)
        out = out.at[idx.reshape(-1)].add(y_loc.reshape(-1))
        return out[: self.n_global]

    def mv(self, x):
        x_loc = self._restrict(x)
        y_loc = jnp.einsum("sij,sj->si", self.blocks, x_loc,
                           precision=jax.lax.Precision.HIGHEST)
        # padding dofs carry unit diagonals in factorizable blocks; their
        # contribution reads/writes only the dump slot, so nothing leaks
        return self._assemble(y_loc, x.dtype)

    def rmv(self, x):
        x_loc = self._restrict(x)
        y_loc = jnp.einsum("sji,sj->si", self.blocks, x_loc,
                           precision=jax.lax.Precision.HIGHEST)
        return self._assemble(y_loc, x.dtype)

    def todense(self):
        eye = jnp.eye(self.n_global, dtype=self.blocks.dtype)
        return jax.vmap(self.mv, in_axes=1, out_axes=1)(eye)


@dataclasses.dataclass
class MatISCtx:
    """The FETI-ctx analog composed on the child QP by the reference
    (qptransform.c:2120-2127): the l2g map plus the interface/interior
    index sets derived from it."""

    l2g: np.ndarray  # (ns, nl)
    multiplicity: np.ndarray  # (n_global,)
    i2g: np.ndarray  # global ids of interface dofs (multiplicity >= 2), sorted
    interior: np.ndarray  # global ids of interior dofs (multiplicity == 1)
    #: per-subdomain boolean masks of local interface dofs
    interface_masks: np.ndarray  # (ns, nl) bool


def _multiplicity(l2g: np.ndarray, n_global: int) -> np.ndarray:
    mult = np.zeros(n_global)
    real = l2g >= 0
    np.add.at(mult, l2g[real], 1.0)
    return mult


def matis_ctx(l2g, n_global: Optional[int] = None) -> MatISCtx:
    """Interface/interior scan from the l2g mapping (the PCIS-style loop of
    qptransform.c:2050-2100: a dof is interface iff more than one subdomain
    holds a copy)."""
    l2g = np.asarray(l2g)
    if n_global is None:
        n_global = int(l2g.max()) + 1
    mult = _multiplicity(l2g, n_global)
    i2g = np.flatnonzero(mult >= 2)
    interior = np.flatnonzero(mult == 1)
    masks = (l2g >= 0) & (mult[np.clip(l2g, 0, n_global - 1)] >= 2)
    return MatISCtx(l2g=l2g, multiplicity=mult, i2g=i2g, interior=interior,
                    interface_masks=masks)


def decompose_vec(v_global, l2g, mult=None, scale: bool = True) -> np.ndarray:
    """Split a global vector onto dof copies.  ``scale=True`` is the D-scaled
    rhs decomposition (each copy gets v/multiplicity, copy-sum reassembles v,
    qptransform.c:2097-2115); ``scale=False`` plain copies (the initial-vector
    scatter)."""
    v_global = np.asarray(v_global)
    l2g = np.asarray(l2g)
    if mult is None:
        mult = _multiplicity(l2g, v_global.shape[0])
    out = np.zeros(l2g.shape, dtype=v_global.dtype)
    real = l2g >= 0
    vals = v_global[l2g[real]]
    if scale:
        vals = vals / mult[l2g[real]]
    out[real] = vals
    return out


def assemble_vec(u_decomposed, l2g, n_global: int, average: bool = True) -> np.ndarray:
    """Reassemble a global vector from dof copies — averaging (solution
    reassembly; all copies agree up to solver tolerance) or summing (rhs)."""
    u = np.asarray(u_decomposed).reshape(np.asarray(l2g).shape)
    l2g = np.asarray(l2g)
    out = np.zeros(n_global, dtype=u.dtype)
    counts = np.zeros(n_global)
    real = l2g >= 0
    np.add.at(out, l2g[real], u[real])
    np.add.at(counts, l2g[real], 1.0)
    if average:
        out /= np.maximum(counts, 1.0)
    return out


def matis_to_blockdiag(qp: QP, check_residual: bool = False,
                       residual_rtol: float = 1e-5):
    """QPTMatISToBlockDiag (qptransform.c:2006-2148): qp.A must be a
    :class:`MatIS`; returns ``(child, post_solve, ctx)`` with the child QP on
    the decomposed space (BlockDiagDense Hessian, D-scaled rhs, scattered
    initial vector) and ``ctx`` the l2g/i2g FETI context.

    ``check_residual`` enables the post-solve ||Ax - b||/||b|| verification on
    the parent operator (the -qpt_matis_to_diag_norm option,
    qptransform.c:1958-1976); a violation raises, matching the reference's
    PetscCheck semantics.
    """
    assert isinstance(qp.A, MatIS), "matis_to_blockdiag needs a MatIS Hessian"
    assert qp.BE is None and qp.BI is None, (
        "apply matis_to_blockdiag at the top of the chain (the reference "
        "requires the KSPFETI Amat before constraints are added)")
    A_is: MatIS = qp.A
    l2g = np.asarray(A_is.l2g)
    ctx = matis_ctx(l2g, A_is.n_global)

    b_global = np.asarray(qp.b)
    b_loc = decompose_vec(b_global, l2g, ctx.multiplicity, scale=True)
    x0 = None
    if qp.x0 is not None:
        x0 = jnp.asarray(
            decompose_vec(np.asarray(qp.x0), l2g, ctx.multiplicity, scale=False)
            .reshape(-1))

    child = qp.replace(
        A=BlockDiagDense(blocks=A_is.blocks),
        b=jnp.asarray(b_loc.reshape(-1)),
        x0=x0,
    )

    from ..qp.transforms import Solution

    def post(sol: Solution) -> Solution:
        x_global = assemble_vec(sol.x, l2g, A_is.n_global, average=True)
        if check_residual:
            r = np.asarray(A_is.mv(jnp.asarray(x_global))) - b_global
            rnorm = float(np.linalg.norm(r))
            bnorm = float(np.linalg.norm(b_global))
            if rnorm > residual_rtol * max(bnorm, 1.0):
                raise RuntimeError(
                    f"MatIS reassembly check failed: ||Ax-b|| = {rnorm:.3e} "
                    f"> {residual_rtol:g} * ||b|| = {residual_rtol * bnorm:.3e}")
        return sol.replace(x=jnp.asarray(x_global),
                           lambda_E=None, lambda_I=None, Bt_lambda=None, g=None)

    return child, post, ctx


def feti_problem_from_matis(A_is: MatIS, b_global, dirichlet=None,
                            dirichlet_values=None,
                            dirichlet_numtype: str = "global_undecomposed",
                            coords=None):
    """Continue the KSPFETI setup from a MATIS operator: run
    :func:`matis_to_blockdiag` and package the decomposed data as a
    :class:`~permon_tpu.feti.assembly.FetiProblem` ready for
    :func:`~permon_tpu.feti.solve.feti_solve` (which appends the Dirichlet +
    gluing equality constraints, the QPFetiSetUp step, qpfeti.c:316-357).

    Returns ``(prob, post_solve, ctx)`` — fold the FetiResult's decomposed
    solution through ``post_solve`` for the ||Ax-b||-checked global
    reassembly, or use ``FetiResult.x_global`` directly (same averaging).
    """
    from .assembly import FetiProblem

    qp = QP(A=A_is, b=jnp.asarray(np.asarray(b_global)))
    child, post, ctx = matis_to_blockdiag(qp, check_residual=True)
    ns, nl = np.asarray(A_is.l2g).shape
    prob = FetiProblem(
        K_blocks=np.asarray(A_is.blocks),
        b_loc=np.asarray(child.b).reshape(ns, nl),
        l2g=np.asarray(A_is.l2g),
        dirichlet=(np.asarray(dirichlet, dtype=np.int64)
                   if dirichlet is not None else np.array([], dtype=np.int64)),
        dirichlet_values=dirichlet_values,
        dirichlet_numtype=dirichlet_numtype,
        coords=coords,
    )
    return prob, post, ctx
