"""Leaf-space dual iteration (permon_tpu/feti/leaf.py): representation
identities, F-apply equivalence with the row-space operator, and a full
leaf-space projected CG matching the row-space TFETI solve."""

import jax
import jax.numpy as jnp
import numpy as np

import permon_tpu as pt
from permon_tpu.core.convergence import Tolerances
from permon_tpu.core.linop import Product, Transpose
from permon_tpu.feti import FetiOptions
from permon_tpu.feti.leaf import LeafDualOperator, LeafDualSpace, leaf_cg
from permon_tpu.feti.solve import assemble_qp, feti_solve, make_blockdiag_kplus


def _setup(ns=4, ne=7, gluing="nonred"):
    from examples.feti_ex1 import build

    prob = build(ns, ne)
    qp, Kb, fixed, nb = assemble_qp(prob, FetiOptions(gluing=gluing))
    kplus = make_blockdiag_kplus(Kb, fixed, prob, nb)
    return prob, qp, kplus


class TestLeafSpace:
    def test_lift_restrict_roundtrip_and_dot(self):
        prob, qp, kplus = _setup()
        sp_ = LeafDualSpace.build(qp.BE.with_dense_blocks())
        m = qp.BE.m_dual
        lam = jnp.asarray(np.random.default_rng(0).standard_normal(m))
        Lam = sp_.lift(lam)
        np.testing.assert_allclose(np.asarray(sp_.restrict(Lam)), np.asarray(lam), atol=1e-14)
        mu = jnp.asarray(np.random.default_rng(1).standard_normal(m))
        np.testing.assert_allclose(
            float(sp_.dot(Lam, sp_.lift(mu))), float(jnp.vdot(lam, mu)), atol=1e-12
        )

    def test_combine_equals_root_sum(self):
        prob, qp, kplus = _setup(gluing="full")  # degree-3 rows exist? at least 2
        B = qp.BE.with_dense_blocks()
        sp_ = LeafDualSpace.build(B)
        rng = np.random.default_rng(2)
        contrib = jnp.asarray(rng.standard_normal(B.vals.shape))
        out = sp_.combine(contrib)
        # reference: scatter to rows then broadcast back
        flat = np.zeros(B.m_dual + 1)
        rows = np.asarray(B.rows)
        w = np.asarray(sp_.weights)
        c = np.asarray(contrib) * (w > 0)  # pad slots contribute nothing
        np.add.at(flat, rows.reshape(-1), c.reshape(-1))
        expect = flat[rows]
        mask = w > 0
        np.testing.assert_allclose(np.asarray(out)[mask], expect[mask], atol=1e-12)

    def test_leaf_apply_matches_row_apply(self):
        prob, qp, kplus = _setup()
        op = LeafDualOperator.create(qp.BE, kplus)
        F = Product((qp.BE, kplus, Transpose(qp.BE)))
        m = qp.BE.m_dual
        lam = jnp.asarray(np.random.default_rng(3).standard_normal(m))
        out_leaf = op.space.restrict(op.apply(op.space.lift(lam)))
        out_row = F.mv(lam)
        np.testing.assert_allclose(np.asarray(out_leaf), np.asarray(out_row), atol=1e-10)


class TestLeafCG:
    def test_projected_leaf_cg_matches_feti_solve(self):
        prob, qp, kplus = _setup()
        res_ref = feti_solve(prob, FetiOptions(gluing="nonred"))

        from permon_tpu.qp.transforms import dualize, homogenize_eq

        dual, post_d = dualize(qp, kplus=kplus)
        cur, post_h = homogenize_eq(dual)
        op = LeafDualOperator.create(qp.BE, kplus)
        sp_ = op.space
        # coarse projector lifted to leaf space: P = I - G'(GG')^{-1}G with
        # G rows stored as consistent leaf arrays and contracted by the
        # weighted dot
        from permon_tpu.qp.projector import dense_rows

        Gd = dense_rows(dual.BE)  # (kc, m)
        Gl = jax.vmap(sp_.lift)(jnp.asarray(Gd))  # (kc, ns, k)
        GGt = jnp.asarray(Gd) @ jnp.asarray(Gd).T
        chol = jnp.linalg.cholesky(GGt)

        def P(Lam):
            y = jnp.einsum("cst,st->c", Gl * sp_.weights, Lam)
            z = jax.scipy.linalg.cho_solve((chol, True), y)
            return Lam - jnp.einsum("cst,c->st", Gl, z)

        B_leaf = P(sp_.lift(cur.b))
        res_leaf = leaf_cg(op, B_leaf, tol=Tolerances(), project=P)
        lam = sp_.restrict(res_leaf.x)
        # fold back through the full post-solve chain (the projector post
        # supplies Bt_lambda, from which dualize recovers the rigid-body
        # amplitudes alpha)
        from permon_tpu.qp.transforms import (
            Solution, compose, enforce_eq_by_projector)

        proj, post_p = enforce_eq_by_projector(cur)
        sol = compose([(dual, post_d), (cur, post_h), (proj, post_p)])(
            Solution(x=lam)
        )
        u = np.asarray(sol.x).reshape(prob.ns, prob.nl)
        xg = np.zeros(prob.n_global)
        cnt = np.zeros(prob.n_global)
        for s in range(prob.ns):
            np.add.at(xg, prob.l2g[s], u[s])
            np.add.at(cnt, prob.l2g[s], 1.0)
        xg /= cnt
        np.testing.assert_allclose(xg, res_ref.x_global, atol=1e-8)
