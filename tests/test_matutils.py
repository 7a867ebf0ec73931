"""Tests for the mat-layer utilities, projector shells, orthonormalization
variants, checkpoint/restore, and the reusable FETI solver.

Reference counterparts: permonmatutils.c (probes, explicit inverse,
by-columns products, row redistribution), permonmatorth.c (GS_LINGEN,
orthonormality detection), permonmatcomplete.c, qppf.c (shell factories,
explicit GGt inverse, result cache), qptransform.c:1213-1251 (ReuseCP).
"""

import numpy as np
import pytest

import jax.numpy as jnp

import permon_tpu as pt
from permon_tpu.core import matutils as mu


def rand_spd(n, seed=0):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((n, n))
    return M @ M.T + n * np.eye(n)


class TestProbes:
    def test_is_identity_and_zero(self):
        assert mu.is_identity(np.eye(7))
        assert not mu.is_identity(2 * np.eye(7))
        assert mu.is_zero(np.zeros((5, 5)))
        assert not mu.is_zero(np.eye(5) * 1e-3)

    def test_mult_equal(self):
        A = rand_spd(6)
        assert mu.mult_equal_tol(A, A.copy())
        assert not mu.mult_equal_tol(A, A + 0.01)

    def test_orthonormal_rows_detection(self):
        q, _ = np.linalg.qr(np.random.default_rng(1).standard_normal((8, 3)))
        assert mu.has_orthonormal_rows(q.T.copy())
        assert mu.has_orthonormal_columns(q.copy())
        assert not mu.has_orthonormal_rows(2 * q.T)

    def test_check_null_space(self):
        # K with known nullspace: graph Laplacian, constant vector
        n = 8
        K = 2 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1)
        K[0, 0] = K[-1, -1] = 1.0
        R = np.ones((n, 1)) / np.sqrt(n)
        assert mu.check_null_space(K, R) < 1e-12
        with pytest.raises(AssertionError):
            mu.check_null_space(np.eye(n), R)


class TestProductsAndInverse:
    def test_inv_explicitly(self):
        A = rand_spd(10)
        from permon_tpu.core.factor import CholInv

        Kplus = CholInv.from_dense(jnp.asarray(A))
        inv = np.asarray(mu.inv_explicitly(Kplus))
        np.testing.assert_allclose(inv, np.linalg.inv(A), atol=1e-8)

    def test_by_columns_products(self):
        rng = np.random.default_rng(2)
        A = rng.standard_normal((6, 4))
        B = rng.standard_normal((4, 3))
        out = np.asarray(mu.mat_mult_by_columns(A, B))
        np.testing.assert_allclose(out, A @ B, atol=1e-12)
        C = rng.standard_normal((4, 6))
        out2 = np.asarray(mu.transpose_mat_mult_by_columns(A.T.copy(), C))
        np.testing.assert_allclose(out2, A @ C, atol=1e-12)

    def test_complete_from_upper_triangular(self):
        U = np.triu(rand_spd(5))
        full = np.asarray(mu.complete_from_upper_triangular(U))
        np.testing.assert_allclose(full, full.T)
        np.testing.assert_allclose(np.triu(full), U)

    def test_row_normalization_and_filter(self):
        import scipy.sparse as sp

        A = np.array([[3.0, 4.0], [0.0, 2.0]])
        d = np.asarray(mu.get_row_normalization(A))
        np.testing.assert_allclose(d, [1 / 5, 1 / 2])
        s = sp.csr_matrix(np.array([[1e-20, 1.0], [0.0, 2.0]]))
        f = mu.filter_zeros(s, tol=1e-12)
        assert f.nnz == 2

    def test_redistribute_rows(self):
        counts = [5, 5, 5, 5, 1, 1, 1, 1]
        parts = mu.redistribute_rows(counts, 2)
        assert parts[0][0] == 0 and parts[-1][1] == 8
        loads = [sum(counts[a:b]) for a, b in parts]
        assert max(loads) <= 14  # balanced better than naive half-split (20/4)


class TestOrthVariants:
    @pytest.mark.parametrize("method", ["gs", "gs_lingen", "cholesky"])
    def test_orth_rows(self, method):
        from permon_tpu.qp.orth import orth_rows

        B = np.random.default_rng(3).standard_normal((4, 12))
        Q, T = orth_rows(jnp.asarray(B), method)
        np.testing.assert_allclose(np.asarray(Q @ Q.T), np.eye(4), atol=1e-10)
        np.testing.assert_allclose(np.asarray(T @ B), np.asarray(Q), atol=1e-10)


class TestProjectorShells:
    def test_shell_ops_and_explicit_inv(self):
        from permon_tpu.qp.projector import GtGOp, HalfQOp, Projector, QOp

        G = np.random.default_rng(4).standard_normal((3, 10))
        for explicit in (False, True):
            pf = Projector.create(pt.Dense.create(jnp.asarray(G)), explicit_inv=explicit)
            x = jnp.asarray(np.random.default_rng(5).standard_normal(10))
            Q = G.T @ np.linalg.solve(G @ G.T, G)
            np.testing.assert_allclose(np.asarray(QOp(pf=pf).mv(x)), Q @ np.asarray(x), atol=1e-10)
            np.testing.assert_allclose(
                np.asarray(GtGOp(pf=pf).mv(x)), G.T @ (G @ np.asarray(x)), atol=1e-10
            )
            hq = HalfQOp(pf=pf)
            np.testing.assert_allclose(
                np.asarray(hq.mv(x)), np.linalg.solve(G @ G.T, G @ np.asarray(x)), atol=1e-10
            )

    def test_orthonormal_detection_shortcircuit(self):
        from permon_tpu.qp.projector import Projector

        q, _ = np.linalg.qr(np.random.default_rng(6).standard_normal((10, 3)))
        pf = Projector.create(pt.Dense.create(jnp.asarray(q.T.copy())))
        assert pf.orthonormal_rows and pf.ggt_chol is None

    def test_cached_projector(self):
        from permon_tpu.qp.projector import CachedProjector, Projector

        G = np.random.default_rng(7).standard_normal((2, 8))
        pf = CachedProjector(Projector.create(pt.Dense.create(jnp.asarray(G))))
        x = jnp.ones(8)
        y1 = pf.apply_q(x)
        y2 = pf.apply_q(x)
        assert y1 is y2 and pf.hits == 1 and pf.cp_applications == 1


class TestCheckpoint:
    def test_save_load_pytree(self, tmp_path):
        from permon_tpu.core.factor import CholInv
        from permon_tpu.utils import checkpoint

        A = rand_spd(6)
        tree = {"kplus": CholInv.from_dense(jnp.asarray(A)), "meta": jnp.arange(3)}
        p = str(tmp_path / "state.npz")
        checkpoint.save(p, tree)
        back = checkpoint.load(p)
        np.testing.assert_allclose(np.asarray(back["kplus"].chol), np.asarray(tree["kplus"].chol))
        assert isinstance(back["kplus"], CholInv)
        x = jnp.ones(6)
        np.testing.assert_allclose(np.asarray(back["kplus"].mv(x)), np.asarray(tree["kplus"].mv(x)))


class TestFetiSolverReuse:
    def test_reuse_across_rhs(self):
        from examples.feti_ex71 import build
        from permon_tpu.feti import FetiOptions
        from permon_tpu.feti.solve import FetiSolver

        prob = build((3, 3, 3), (1, 2, 1))
        solver = FetiSolver(prob, FetiOptions(gluing="nonred"))
        r1 = solver.solve()
        assert int(r1.result.reason) > 0
        # new load: scaled rhs — solution scales linearly
        r2 = solver.solve(b_loc=2.0 * prob.b_loc)
        np.testing.assert_allclose(r2.x_global, 2.0 * r1.x_global, atol=1e-6)
