"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Checks that the sharded TFETI pipeline produces bit-comparable results to the
single-device run and that the layouts are as designed (subdomain-sharded
primal, replicated dual).
"""

import jax
import numpy as np
import pytest

from permon_tpu.core.convergence import Tolerances
from permon_tpu.feti import FetiOptions, feti_solve
from permon_tpu.feti.solve import assemble_qp, make_blockdiag_kplus
from permon_tpu.parallel import make_mesh, shard_qp
from permon_tpu.qp.transforms import (
    Solution,
    compose,
    dualize,
    enforce_eq_by_projector,
    homogenize_eq,
)
from permon_tpu.solvers.cg import cg


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return jax.devices()[:8]


class TestShardedTfeti:
    def test_matches_single_device(self, eight_devices):
        from examples.feti_ex1 import build

        prob = build(ns=8, ne=5)
        opts = FetiOptions()
        # single-device reference
        res_ref = feti_solve(prob, opts=opts)

        # sharded run of the same pipeline
        qp, Kb, fixed, _nb = assemble_qp(prob, opts)
        kplus = make_blockdiag_kplus(Kb, fixed, prob)
        mesh = make_mesh(8)
        qp_sh, kplus_sh = shard_qp(qp, kplus, mesh)
        steps = []
        dual, post_d = dualize(qp_sh, kplus=kplus_sh)
        steps.append((dual, post_d))
        cur, post_h = homogenize_eq(dual)
        steps.append((cur, post_h))
        cur, post_p = enforce_eq_by_projector(cur)
        steps.append((cur, post_p))
        res = jax.jit(lambda q: cg(q, tol=Tolerances()))(cur)
        sol = compose(steps)(Solution(x=res.x))
        np.testing.assert_allclose(
            np.asarray(sol.x), np.asarray(res_ref.u_decomposed), atol=1e-12
        )
        assert int(res.iterations) == int(res_ref.result.iterations)

    def test_sharding_layout(self, eight_devices):
        from examples.feti_ex1 import build

        prob = build(ns=8, ne=3)
        qp, Kb, fixed, _nb = assemble_qp(prob, FetiOptions())
        kplus = make_blockdiag_kplus(Kb, fixed, prob)
        mesh = make_mesh(8)
        qp_sh, kplus_sh = shard_qp(qp, kplus, mesh)
        # K blocks sharded over 8 devices along the subdomain axis
        assert len(qp_sh.A.blocks.sharding.device_set) == 8
        # B' lambda must produce a subdomain-sharded primal vector
        lam = np.ones(qp_sh.BE.shape[0])
        out = qp_sh.BE.rmv(jax.numpy.asarray(lam))
        assert out.shape == (prob.n_decomposed,)
        # B u reduces to a replicated dual vector
        u = jax.numpy.ones(prob.n_decomposed)
        bu = qp_sh.BE.mv(u)
        np.testing.assert_allclose(np.asarray(bu), np.asarray(qp.BE.mv(u)), atol=1e-14)


class TestShardMapDualApply:
    def test_matches_automatic_path(self):
        """Explicit shard_map F apply == GSPMD-sharded composed-operator apply."""
        import jax
        import jax.numpy as jnp

        from examples.feti_ex1 import build
        from permon_tpu.core.linop import Product, Transpose
        from permon_tpu.feti import FetiOptions
        from permon_tpu.feti.solve import assemble_qp, make_blockdiag_kplus
        from permon_tpu.parallel import make_mesh, shard_qp
        from permon_tpu.parallel.dist import feti_dual_apply_shard_map

        ndev = len(jax.devices())
        prob = build(ns=ndev, ne=4)
        qp, Kb, fixed, nb = assemble_qp(prob, FetiOptions())
        kplus = make_blockdiag_kplus(Kb, fixed, prob)
        mesh = make_mesh(ndev)
        qp_sh, kplus_sh = shard_qp(qp, kplus, mesh)

        F_auto = Product((qp_sh.BE, kplus_sh, Transpose(qp_sh.BE)))
        apply_sm = feti_dual_apply_shard_map(qp_sh.BE, kplus_sh, mesh)

        lam = jnp.asarray(np.random.default_rng(0).standard_normal(qp.BE.shape[0]))
        y_auto = np.asarray(jax.jit(F_auto.mv)(lam))
        y_sm = np.asarray(jax.jit(apply_sm)(lam))
        np.testing.assert_allclose(y_sm, y_auto, atol=1e-10)


class TestLeafSpaceSharded:
    """Leaf-space dual apply and CG under GSPMD sharding of the (ns, k)
    leaf arrays over the subdomain axis."""

    def test_sharded_leaf_apply_matches_single(self):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from examples.feti_ex1 import build
        from permon_tpu.feti import FetiOptions
        from permon_tpu.feti.leaf import LeafDualOperator
        from permon_tpu.feti.solve import assemble_qp, make_blockdiag_kplus
        from permon_tpu.parallel import make_mesh

        mesh = make_mesh(8)
        prob = build(8, 5)
        qp, Kb, fixed, nb = assemble_qp(prob, FetiOptions(gluing="nonred"))
        kplus = make_blockdiag_kplus(Kb, fixed, prob, nb)
        op = LeafDualOperator.create(qp.BE, kplus)

        Lam = jnp.asarray(np.random.default_rng(0).standard_normal(
            op.space.rows.shape))
        ref = np.asarray(op.apply(Lam))

        sd = lambda *spec: NamedSharding(mesh, P(*spec))
        op_sh = op.replace(
            blk=jax.device_put(op.blk, sd("sd", None, None)),
            invs=jax.device_put(op.invs, sd("sd", None, None)),
            space=op.space.replace(
                rows=jax.device_put(op.space.rows, sd("sd", None)),
                weights=jax.device_put(op.space.weights, sd("sd", None)),
                partners=jax.device_put(op.space.partners, sd()),
            ),
        )
        Lam_sh = jax.device_put(Lam, sd("sd", None))
        out = np.asarray(jax.jit(op_sh.apply)(Lam_sh))
        np.testing.assert_allclose(out, ref, atol=1e-12)

    def test_sharded_leaf_cg_matches_feti_solve(self):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from examples.feti_ex1 import build
        from permon_tpu.feti import FetiOptions, feti_solve
        from permon_tpu.parallel import make_mesh

        mesh = make_mesh(8)
        prob = build(8, 5)
        res_ref = feti_solve(prob, FetiOptions(gluing="nonred"))
        res_thr = feti_solve(prob, FetiOptions(gluing="nonred", throughput=True))
        np.testing.assert_allclose(res_thr.x_global, res_ref.x_global, atol=1e-9)


class TestShardedSmalbe:
    """Multi-device SMALBE (box-constrained SMALXE around MPRGP): the dense
    contact problem under the flat 8-device mesh and the (2, 4) two-level
    ('host', 'sd') mesh — exactly where sharding bugs would hide (box
    projections + psum dots + projector inside one augmented-Lagrangian
    loop).  Deterministic mode pins the reductions, so the sharded outer
    AND inner iteration counts must EQUAL the single-device run."""

    def _run_sharded(self, prob, BI, cI, opts, tol, shard_fn, mesh):
        import jax.numpy as jnp

        from permon_tpu.core.detred import deterministic_mode
        from permon_tpu.solvers.smalxe import smalxe

        qp, Kb, fixed, nb = assemble_qp(prob, opts)
        qp = qp.replace(BI=BI, cI=jnp.asarray(cI))
        kplus = make_blockdiag_kplus(Kb, fixed, prob, nb)
        qp_sh, kplus_sh = shard_fn(qp, kplus, mesh)
        with deterministic_mode(True):
            steps = []
            dual, post_d = dualize(qp_sh, kplus=kplus_sh)
            steps.append((dual, post_d))
            cur = dual
            if cur.cE is not None:
                cur, post_h = homogenize_eq(cur)
                steps.append((cur, post_h))
            cur, post_p = enforce_eq_by_projector(cur)
            steps.append((cur, post_p))
            res = smalxe(cur, opts=opts.smalxe, tol=tol)
            sol = compose(steps)(
                Solution(x=res.x, Bt_lambda=getattr(res, "Bt_lambda", None))
            )
        return res, sol

    @pytest.fixture(scope="class")
    def contact(self, eight_devices):
        from examples.feti_contact import build

        prob, BI, cI, lb = build(ns=8, ne=12)
        opts = FetiOptions(gluing="nonred", deterministic=True)
        tol = Tolerances(rtol=1e-6)
        ref = feti_solve(prob, opts, BI=BI, cI=cI, tol=tol)
        return prob, BI, cI, opts, tol, ref

    def test_flat_mesh_matches_single_device(self, contact):
        prob, BI, cI, opts, tol, ref = contact
        res, sol = self._run_sharded(
            prob, BI, cI, opts, tol, shard_qp, make_mesh(8)
        )
        assert int(res.iterations) == int(ref.result.iterations)
        assert int(res.inner_iterations) == int(ref.result.inner_iterations)
        np.testing.assert_allclose(
            np.asarray(sol.x), np.asarray(ref.u_decomposed), atol=1e-10
        )

    def test_two_level_mesh_matches_single_device(self, contact):
        from permon_tpu.parallel import make_mesh2, shard_qp2

        prob, BI, cI, opts, tol, ref = contact
        res, sol = self._run_sharded(
            prob, BI, cI, opts, tol, shard_qp2, make_mesh2((2, 4))
        )
        assert int(res.iterations) == int(ref.result.iterations)
        assert int(res.inner_iterations) == int(ref.result.inner_iterations)
        np.testing.assert_allclose(
            np.asarray(sol.x), np.asarray(ref.u_decomposed), atol=1e-10
        )
