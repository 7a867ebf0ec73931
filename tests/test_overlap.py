"""Two-level mesh + communication-overlap paths (parallel/overlap.py)
against the flat GSPMD results.

Reference contract: the overlapped exchange reorders the same additions
the flat leaf combine performs (PetscSF Begin/End split,
gluing.c:47-159), so results must agree to roundoff; the hierarchical
psum is the two-level reduction of SURVEY 2.10.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import permon_tpu as pt
from examples.feti_ex1 import build
from permon_tpu.core.linop import Product, Transpose
from permon_tpu.feti import FetiOptions
from permon_tpu.feti.leaf import LeafDualOperator, leaf_cg
from permon_tpu.feti.solve import assemble_qp, make_blockdiag_kplus
from permon_tpu.parallel import (
    LeafOverlapPlan, OverlappedLeafOperator, feti_dual_apply_hier,
    leaf_apply_overlapped, make_mesh, make_mesh2, shard_qp, shard_qp2,
)
from permon_tpu.core.convergence import Tolerances


def _setup(ns, ne=5):
    prob = build(ns=ns, ne=ne)
    qp, K_blocks, fixed_mask, null_bases = assemble_qp(prob, FetiOptions())
    kplus = make_blockdiag_kplus(K_blocks, fixed_mask, prob)
    return qp, kplus


@pytest.mark.parametrize("ns", [8, 16])
def test_overlapped_leaf_apply_matches_flat(ns):
    qp, kplus = _setup(ns)
    mesh = make_mesh(8)
    qp, kplus = shard_qp(qp, kplus, mesh)
    op = LeafDualOperator.create(qp.BE, kplus)
    plan = LeafOverlapPlan.build(op.space, 8)
    lam = jnp.asarray(np.random.default_rng(0).normal(size=qp.BE.m_dual))
    Lam = op.space.lift(lam)
    y_flat = jax.jit(op.apply)(Lam)
    y_ovl = jax.jit(leaf_apply_overlapped(op, plan, mesh))(Lam)
    np.testing.assert_allclose(
        np.asarray(y_ovl), np.asarray(y_flat), atol=1e-12, rtol=1e-12
    )


def test_overlapped_leaf_cg_matches_flat():
    qp, kplus = _setup(16)
    mesh = make_mesh(8)
    qp, kplus = shard_qp(qp, kplus, mesh)
    op = LeafDualOperator.create(qp.BE, kplus)
    plan = LeafOverlapPlan.build(op.space, 8)
    ovl = OverlappedLeafOperator(op=op, plan=plan, mesh=mesh)
    rhs = jnp.asarray(np.random.default_rng(1).normal(size=qp.BE.m_dual))
    B_leaf = op.space.lift(rhs)
    res_flat = jax.jit(lambda b: leaf_cg(op, b, tol=Tolerances(max_it=30)).x)(B_leaf)
    res_ovl = jax.jit(lambda b: leaf_cg(ovl, b, tol=Tolerances(max_it=30)).x)(B_leaf)
    np.testing.assert_allclose(
        np.asarray(res_ovl), np.asarray(res_flat), atol=1e-10, rtol=1e-10
    )


def test_feti_solve_with_overlap_mesh():
    """FetiOptions(throughput=True, mesh=...) routes the leaf-space dual
    iteration through the overlapped exchange; the solution matches the
    flat (no-mesh) throughput run."""
    from permon_tpu.feti.solve import feti_solve

    prob = build(ns=8, ne=5)
    r_flat = feti_solve(prob, FetiOptions(throughput=True))
    r_ovl = feti_solve(prob, FetiOptions(throughput=True, mesh=make_mesh(8)))
    assert int(r_ovl.result.reason) > 0
    assert int(r_ovl.result.iterations) == int(r_flat.result.iterations)
    np.testing.assert_allclose(r_ovl.x_global, r_flat.x_global, atol=1e-10)


def test_two_level_mesh_hier_apply():
    qp, kplus = _setup(8)
    mesh = make_mesh2((2, 4))
    qp2, kplus2 = shard_qp2(qp, kplus, mesh)
    lam = jnp.asarray(np.random.default_rng(2).normal(size=qp.BE.m_dual))
    F = Product((qp2.BE, kplus2, Transpose(qp2.BE)))
    y_auto = jax.jit(F.mv)(lam)
    y_hier = jax.jit(feti_dual_apply_hier(qp2.BE, kplus2, mesh))(lam)
    np.testing.assert_allclose(
        np.asarray(y_hier), np.asarray(y_auto), atol=1e-12, rtol=1e-12
    )


def test_two_level_mesh_overlapped_leaf():
    qp, kplus = _setup(16)
    mesh = make_mesh2((2, 4))
    qp, kplus = shard_qp2(qp, kplus, mesh)
    op = LeafDualOperator.create(qp.BE, kplus)
    plan = LeafOverlapPlan.build(op.space, 8)
    lam = jnp.asarray(np.random.default_rng(3).normal(size=qp.BE.m_dual))
    Lam = op.space.lift(lam)
    y_flat = jax.jit(op.apply)(Lam)
    y_ovl = jax.jit(leaf_apply_overlapped(op, plan, mesh))(Lam)
    np.testing.assert_allclose(
        np.asarray(y_ovl), np.asarray(y_flat), atol=1e-12, rtol=1e-12
    )
