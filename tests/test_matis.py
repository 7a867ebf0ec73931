"""QPTMatISToBlockDiag analog (permon_tpu/feti/matis.py) — the general
MATIS -> block-diagonal transform (reference: qptransform.c:2006-2148)."""

import numpy as np
import jax.numpy as jnp
import pytest

import permon_tpu  # noqa: F401  (x64 + cpu config via conftest)
from permon_tpu.feti.matis import (
    MatIS,
    assemble_vec,
    decompose_vec,
    feti_problem_from_matis,
    matis_ctx,
    matis_to_blockdiag,
)
from permon_tpu.qp.qp import QP


def _two_subdomain_laplacian(ne=4):
    """1-D Laplacian on 2*ne elements split into two subdomains sharing one
    interface node; Dirichlet at the global left end (in-Hessian)."""
    n_nodes = 2 * ne + 1
    nl = ne + 1
    l2g = np.stack([np.arange(nl), np.arange(ne, n_nodes)])
    Kel = np.array([[1.0, -1.0], [-1.0, 1.0]])
    K = np.zeros((2, nl, nl))
    for s in range(2):
        for e in range(ne):
            K[s][np.ix_([e, e + 1], [e, e + 1])] += Kel
    # Dirichlet at global 0 (only subdomain 0 holds it)
    K[0][0, :] = 0.0
    K[0][:, 0] = 0.0
    K[0][0, 0] = 1.0
    return K, l2g, n_nodes


class TestMatISOperator:
    def test_mv_matches_assembled(self):
        K, l2g, ng = _two_subdomain_laplacian()
        A = MatIS.create(K, l2g, ng)
        Ad = np.zeros((ng, ng))
        for s in range(2):
            Ad[np.ix_(l2g[s], l2g[s])] += K[s]
        x = np.linspace(0.0, 1.0, ng)
        assert np.allclose(np.asarray(A.mv(jnp.asarray(x))), Ad @ x)
        assert np.allclose(np.asarray(A.rmv(jnp.asarray(x))), Ad.T @ x)
        assert np.allclose(np.asarray(A.todense()), Ad)

    def test_padding_dofs_do_not_leak(self):
        K, l2g, ng = _two_subdomain_laplacian()
        # pad subdomain arrays by one dof with a unit diagonal
        nl = l2g.shape[1]
        Kp = np.zeros((2, nl + 1, nl + 1))
        Kp[:, :nl, :nl] = K
        Kp[:, nl, nl] = 1.0
        l2gp = np.concatenate([l2g, -np.ones((2, 1), dtype=np.int64)], axis=1)
        A = MatIS.create(K, l2g, ng)
        Ap = MatIS.create(Kp, l2gp, ng)
        x = np.sin(np.arange(ng, dtype=float))
        assert np.allclose(np.asarray(Ap.mv(jnp.asarray(x))),
                           np.asarray(A.mv(jnp.asarray(x))))


class TestMatISCtx:
    def test_interface_interior_split(self):
        K, l2g, ng = _two_subdomain_laplacian(ne=3)
        ctx = matis_ctx(l2g, ng)
        assert ctx.i2g.tolist() == [3]  # the shared node
        assert set(ctx.interior.tolist()) == set(range(ng)) - {3}
        assert ctx.interface_masks[0].tolist() == [False, False, False, True]
        assert ctx.interface_masks[1].tolist() == [True, False, False, False]
        assert ctx.multiplicity[3] == 2.0

    def test_decompose_assemble_roundtrip(self):
        K, l2g, ng = _two_subdomain_laplacian()
        ctx = matis_ctx(l2g, ng)
        v = np.arange(1.0, ng + 1)
        # D-scaled split: copy-sum reassembles v exactly
        v_loc = decompose_vec(v, l2g, ctx.multiplicity, scale=True)
        assert np.allclose(assemble_vec(v_loc, l2g, ng, average=False), v)
        # plain scatter: every copy agrees, averaging reassembles v
        v_cp = decompose_vec(v, l2g, ctx.multiplicity, scale=False)
        assert np.allclose(assemble_vec(v_cp, l2g, ng, average=True), v)


class TestMatISToBlockDiag:
    def test_decomposed_solve_matches_global(self):
        """Solve the decomposed QP through the TFETI pipeline and compare the
        reassembled solution to the directly assembled solve."""
        from permon_tpu.feti import FetiOptions, feti_solve

        K, l2g, ng = _two_subdomain_laplacian()
        A = MatIS.create(K, l2g, ng)
        b = np.ones(ng)
        b[0] = 0.0  # Dirichlet rhs
        prob, post, ctx = feti_problem_from_matis(A, b)
        res = feti_solve(prob, FetiOptions(gluing="nonred"))
        # the facade's averaging and the transform's post-solve agree
        from permon_tpu.qp.transforms import Solution

        sol = post(Solution(x=jnp.asarray(res.u_decomposed)))
        assert np.allclose(np.asarray(sol.x), res.x_global, atol=1e-12)
        # direct solve of the assembled system
        Ad = np.asarray(A.todense())
        x_ref = np.linalg.solve(Ad, b)
        assert np.allclose(res.x_global, x_ref, atol=1e-8)

    def test_residual_check_raises_on_bad_solution(self):
        K, l2g, ng = _two_subdomain_laplacian()
        A = MatIS.create(K, l2g, ng)
        qp = QP(A=A, b=jnp.asarray(np.ones(ng)))
        child, post, ctx = matis_to_blockdiag(qp, check_residual=True)
        from permon_tpu.qp.transforms import Solution

        with pytest.raises(RuntimeError, match="reassembly check"):
            post(Solution(x=jnp.zeros(child.b.shape[0])))

    def test_rhs_is_d_scaled(self):
        K, l2g, ng = _two_subdomain_laplacian()
        A = MatIS.create(K, l2g, ng)
        qp = QP(A=A, b=jnp.asarray(np.ones(ng)))
        child, post, ctx = matis_to_blockdiag(qp)
        b_loc = np.asarray(child.b).reshape(l2g.shape)
        # interface copy gets 1/2, interior copies 1
        iface = int(ctx.i2g[0])
        for s in range(2):
            i = int(np.flatnonzero(l2g[s] == iface)[0])
            assert b_loc[s][i] == pytest.approx(0.5)
        assert np.allclose(assemble_vec(b_loc, l2g, ng, average=False),
                           np.ones(ng))

    def test_x0_is_plain_scatter(self):
        K, l2g, ng = _two_subdomain_laplacian()
        A = MatIS.create(K, l2g, ng)
        x0 = np.arange(ng, dtype=float)
        qp = QP(A=A, b=jnp.asarray(np.ones(ng)), x0=jnp.asarray(x0))
        child, post, ctx = matis_to_blockdiag(qp)
        x0_loc = np.asarray(child.x0).reshape(l2g.shape)
        for s in range(2):
            real = l2g[s] >= 0
            assert np.allclose(x0_loc[s][real], x0[l2g[s][real]])
