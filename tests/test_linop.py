"""Unit tests of core linear operators against dense numpy references."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

import permon_tpu as pt


def _rand_sparse(m, n, density=0.3, seed=0):
    rng = np.random.default_rng(seed)
    a = sp.random(m, n, density=density, random_state=rng, format="csr")
    return a


class TestEll:
    def test_mv_rmv(self):
        a = _rand_sparse(17, 23)
        op = pt.Ell.from_scipy(a)
        x = np.random.default_rng(1).normal(size=23)
        y = np.random.default_rng(2).normal(size=17)
        np.testing.assert_allclose(op.mv(x), a @ x, rtol=1e-12)
        np.testing.assert_allclose(op.rmv(y), a.T @ y, rtol=1e-12)

    def test_diagonal_todense(self):
        a = _rand_sparse(12, 12)
        op = pt.Ell.from_scipy(a)
        np.testing.assert_allclose(op.diagonal(), a.diagonal(), rtol=1e-12)
        np.testing.assert_allclose(op.todense(), a.toarray(), rtol=1e-12)


class TestComposites:
    def test_product_penalized(self):
        rng = np.random.default_rng(3)
        a = rng.normal(size=(8, 8))
        a = a @ a.T + 8 * np.eye(8)
        bmat = rng.normal(size=(3, 8))
        A = pt.Dense.create(a)
        B = pt.Dense.create(bmat)
        x = rng.normal(size=8)
        pen = pt.Penalized(a=A, b=B, rho=np.float64(2.5))
        np.testing.assert_allclose(pen.mv(x), a @ x + 2.5 * bmat.T @ (bmat @ x), rtol=1e-12)
        prod = pt.Product((B, A))
        np.testing.assert_allclose(prod.mv(x), bmat @ (a @ x), rtol=1e-12)
        np.testing.assert_allclose(prod.rmv(np.ones(3)), a.T @ (bmat.T @ np.ones(3)), rtol=1e-12)

    def test_transpose_sum_scaled(self):
        rng = np.random.default_rng(4)
        a = rng.normal(size=(5, 7))
        A = pt.Dense.create(a)
        x5 = rng.normal(size=5)
        np.testing.assert_allclose(A.T.mv(x5), a.T @ x5, rtol=1e-12)
        S = pt.Sum((A, pt.Scaled(inner=A, scale=np.float64(3.0))))
        np.testing.assert_allclose(S.mv(np.ones(7)), 4 * (a @ np.ones(7)), rtol=1e-12)


class TestPowerMethod:
    def test_matches_numpy(self):
        rng = np.random.default_rng(5)
        a = rng.normal(size=(30, 30))
        a = a @ a.T
        lam = pt.max_eigenvalue(pt.Dense.create(a), tol=1e-10, maxits=5000)
        np.testing.assert_allclose(float(lam), np.linalg.eigvalsh(a)[-1], rtol=1e-6)


class TestGluingOp:
    """MATGLUING analog (segment-sum star forest) vs the extension operator
    and the dense gluing matrix."""

    def test_matches_extension_and_dense(self):
        import numpy as np
        import jax.numpy as jnp
        import scipy.sparse as sp

        from examples.feti_ex1 import build
        from permon_tpu.core.gluing import Gluing
        from permon_tpu.feti.assembly import build_gluing

        prob = build(4, 5)
        gr, gc, gv, m = build_gluing(prob.l2g, "full", True)
        N = prob.ns * prob.nl
        op = Gluing.from_coo(gr, gc, gv, m, N)
        dense = sp.coo_matrix((gv, (gr, gc)), shape=(m, N)).toarray()
        u = jnp.asarray(np.random.default_rng(0).standard_normal(N))
        lam = jnp.asarray(np.random.default_rng(1).standard_normal(m))
        np.testing.assert_allclose(np.asarray(op.mv(u)), dense @ np.asarray(u), atol=1e-12)
        np.testing.assert_allclose(np.asarray(op.rmv(lam)), dense.T @ np.asarray(lam), atol=1e-12)
        np.testing.assert_allclose(np.asarray(op.todense()), dense, atol=1e-12)


class TestThroughputModes:
    """Explicit-inverse K+ and dense-block extension applies must match the
    default triangular-solve / triplet paths (the production throughput modes
    used by the FETI dual operator, see bench.py)."""

    def test_blockdiag_explicit_inverse(self):
        from permon_tpu.core.factor import BlockDiagCholInv

        rng = np.random.RandomState(5)
        blocks = rng.rand(3, 7, 7)
        blocks = blocks @ blocks.transpose(0, 2, 1) + 7 * np.eye(7)
        op = BlockDiagCholInv.from_blocks(jnp.asarray(blocks))
        x = jnp.asarray(rng.rand(21))
        y_tri = np.asarray(op.mv(x))
        y_exp = np.asarray(op.explicitly().mv(x))
        np.testing.assert_allclose(y_exp, y_tri, rtol=1e-10)

    def test_extension_dense_blocks(self):
        from permon_tpu.core.extension import SubdomainExtension

        rng = np.random.RandomState(6)
        ns, nl, m, nnz = 4, 9, 11, 20
        rows = rng.randint(0, m, nnz)
        cols = rng.randint(0, ns * nl, nnz)
        vals = rng.randn(nnz)
        B = SubdomainExtension.from_coo(rows, cols, vals, m=m, ns=ns, nl=nl)
        Bd = B.with_dense_blocks()
        u = jnp.asarray(rng.rand(ns * nl))
        lam = jnp.asarray(rng.rand(m))
        np.testing.assert_allclose(np.asarray(Bd.mv(u)), np.asarray(B.mv(u)), atol=1e-12)
        np.testing.assert_allclose(np.asarray(Bd.rmv(lam)), np.asarray(B.rmv(lam)), atol=1e-12)

    def test_extension_gather_apply(self):
        """Gather-table applies (no-scatter single-chip hot path, round 3)
        must match the triplet scatter path in BOTH directions, including
        repeated (row, col) entries and zero-padded slots."""
        from permon_tpu.core.extension import SubdomainExtension

        rng = np.random.RandomState(7)
        ns, nl, m, nnz = 3, 8, 10, 30
        rows = rng.randint(0, m, nnz)
        cols = rng.randint(0, ns * nl, nnz)
        vals = rng.randn(nnz)
        B = SubdomainExtension.from_coo(rows, cols, vals, m=m, ns=ns, nl=nl)
        Bg = B.with_gather_apply()
        u = jnp.asarray(rng.rand(ns * nl))
        lam = jnp.asarray(rng.rand(m))
        np.testing.assert_allclose(np.asarray(Bg.mv(u)), np.asarray(B.mv(u)),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(Bg.rmv(lam)),
                                   np.asarray(B.rmv(lam)), atol=1e-12)


class TestIterativeInv:
    """MATINV's CG fallback for matrix-free operators (matinv.c:535-540)."""

    def test_matches_direct_inverse(self):
        from permon_tpu.core.factor import CholInv, IterativeInv

        rng = np.random.RandomState(8)
        M = rng.rand(12, 12)
        A = M @ M.T + 12 * np.eye(12)
        op = pt.Dense.create(jnp.asarray(A))
        x = jnp.asarray(rng.rand(12))
        y_it = np.asarray(IterativeInv(a=op, rtol=1e-12).mv(x))
        y_dir = np.asarray(CholInv.from_dense(jnp.asarray(A)).mv(x))
        np.testing.assert_allclose(y_it, y_dir, atol=1e-9)

    def test_usable_as_kplus_in_dualize(self):
        from permon_tpu.core.factor import IterativeInv
        from permon_tpu.qp.transforms import Solution, feti_prepare

        rng = np.random.default_rng(13)
        n = 14
        M = rng.standard_normal((n, n))
        A = M @ M.T + n * np.eye(n)
        b = rng.standard_normal(n)
        BE = rng.standard_normal((2, n))
        qp = pt.QP.create(A, b, BE=BE, cE=np.zeros(2))
        kplus = IterativeInv(a=pt.Dense.create(jnp.asarray(A)), rtol=1e-12)
        child, post = feti_prepare(qp, kplus=kplus)
        sol = post(Solution(x=pt.solve(child).x))
        kkt = np.block([[A, BE.T], [BE, np.zeros((2, 2))]])
        xs = np.linalg.solve(kkt, np.concatenate([b, np.zeros(2)]))
        np.testing.assert_allclose(np.asarray(sol.x), xs[:n], atol=1e-5)
