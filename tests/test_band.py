"""Blocked band Cholesky K+ (core/band.py): block-tridiagonal conversion,
factorization accuracy vs dense, fixing-dof regularization as an EXACT
generalized inverse, and mixed-precision iterative refinement."""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from permon_tpu.core.band import (
    BandCholInv,
    BlockTridiag,
    bandwidth,
    csr_to_block_tridiag,
    gershgorin_max_eig,
    make_band_kplus,
    rcm_order,
    regularize_block_tridiag,
)


def _lap2(nx, free=False):
    """2-D Laplacian; free=True drops the implicit Dirichlet boundary
    (free-free/floating: singular with constant nullspace)."""
    n1 = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(nx, nx), format="lil")
    if free:
        n1[0, 0] = 1.0
        n1[-1, -1] = 1.0
    n1 = n1.tocsr()
    i1 = sp.identity(nx, format="csr")
    return (sp.kron(n1, i1) + sp.kron(i1, n1)).tocsr()


class TestBlockTridiag:
    def test_mv_matches_scipy(self):
        a = _lap2(13)  # n=169, bandwidth 13 < NB=128
        Ad, Asub = csr_to_block_tridiag(a, 128)
        op = BlockTridiag.from_blocks(Ad[None], Asub[None])
        x = np.random.RandomState(0).rand(op.shape[1])
        y = np.asarray(op.mv(jnp.asarray(x)))
        np.testing.assert_allclose(y[:169], a @ x[:169], atol=1e-12)
        # padding dofs carry a unit diagonal
        np.testing.assert_allclose(y[169:], x[169:], atol=1e-12)

    def test_bandwidth_and_rcm(self):
        a = _lap2(20)
        perm = np.random.RandomState(1).permutation(400)
        ap = a[perm][:, perm].tocsr()
        p = rcm_order(ap)
        assert bandwidth(ap[p][:, p]) <= 2 * bandwidth(a)


class TestBandCholInv:
    def test_solve_matches_dense(self):
        a = _lap2(13)
        Ad, Asub = csr_to_block_tridiag(a, 128)
        inv = BandCholInv.from_block_tridiag(Ad[None], Asub[None])
        b = np.random.RandomState(2).rand(inv.shape[1])
        x = np.asarray(inv.mv(jnp.asarray(b)))
        ref = np.linalg.solve(a.toarray(), b[:169])
        np.testing.assert_allclose(x[:169], ref, atol=1e-9)

    def test_batched_multi_block(self):
        # nl spanning several NB blocks, two subdomains with different data
        a1 = _lap2(20)  # n=400, 4 blocks at NB=128
        a2 = (_lap2(20) * 2.0).tocsr()
        Ad1, As1 = csr_to_block_tridiag(a1, 128)
        Ad2, As2 = csr_to_block_tridiag(a2, 128)
        inv = BandCholInv.from_block_tridiag(
            np.stack([Ad1, Ad2]), np.stack([As1, As2])
        )
        b = np.random.RandomState(3).rand(inv.shape[1])
        x = np.asarray(inv.mv(jnp.asarray(b)))
        npad = Ad1.shape[0] * 128
        np.testing.assert_allclose(
            x[:400], np.linalg.solve(a1.toarray(), b[:400]), atol=1e-9
        )
        np.testing.assert_allclose(
            x[npad : npad + 400],
            np.linalg.solve(a2.toarray(), b[npad : npad + 400]), atol=1e-9,
        )

    def test_fixing_dof_regularization_is_generalized_inverse(self):
        # floating (free-free) block: Kreg^{-1} must satisfy K X K = K
        a = _lap2(13, free=True)
        n = a.shape[0]
        R = np.ones((n, 1)) / np.sqrt(n)
        Ad, Asub = csr_to_block_tridiag(a, 128)
        rho = gershgorin_max_eig(Ad, Asub)
        Adr, Asubr = regularize_block_tridiag(Ad, Asub, R, rho, 128, nl=n)
        inv = BandCholInv.from_block_tridiag(Adr[None], Asubr[None])
        Kd = a.toarray()
        X = np.zeros((n, n))
        eye = np.eye(inv.shape[1])
        for j in range(n):
            X[:, j] = np.asarray(inv.mv(jnp.asarray(eye[:, j])))[:n]
        err = np.linalg.norm(Kd @ X @ Kd - Kd) / np.linalg.norm(Kd)
        assert err < 1e-10, err

    def test_f32_factor_with_refinement_reaches_f64_accuracy(self):
        a = _lap2(13)
        Ad, Asub = csr_to_block_tridiag(a, 128)
        b = np.zeros(Ad.shape[0] * 128)
        b[:169] = np.random.RandomState(4).rand(169)
        ref = np.linalg.solve(a.toarray(), b[:169])
        inv32 = BandCholInv.from_block_tridiag(
            Ad[None], Asub[None], dtype=jnp.float32
        )
        x32 = np.asarray(inv32.mv(jnp.asarray(b)))[:169]
        err32 = np.linalg.norm(x32 - ref) / np.linalg.norm(ref)
        invr = BandCholInv.from_block_tridiag(
            Ad[None], Asub[None], dtype=jnp.float32, refine=3
        )
        xr = np.asarray(invr.mv(jnp.asarray(b)))[:169]
        errr = np.linalg.norm(xr - ref) / np.linalg.norm(ref)
        assert err32 > 1e-7  # plain f32 is not direct-accurate
        assert errr < 1e-12, (err32, errr)


class TestMakeBandKplus:
    def test_mixed_floating_and_fixed_blocks(self):
        a_fix = _lap2(13)
        a_float = _lap2(13, free=True)
        n = a_fix.shape[0]
        R0 = np.zeros((n, 0))
        R1 = np.ones((n, 1)) / np.sqrt(n)
        inv, NB = make_band_kplus([a_fix, a_float], R_bases=[R0, R1])
        assert NB == 128
        b = np.random.RandomState(5).rand(inv.shape[1])
        x = np.asarray(inv.mv(jnp.asarray(b)))
        np.testing.assert_allclose(
            x[:n], np.linalg.solve(a_fix.toarray(), b[:n]), atol=1e-9
        )
        # floating block: for a COMPATIBLE rhs (range(K) = mean-zero, which
        # is what the dual pipeline feeds K+ — R'(f - B'lam) = 0 is enforced
        # via G lam = e) the generalized inverse solves the singular system
        npad = inv.Dinv.shape[0] * NB  # Dinv is scan-major (nb, ns, NB, NB)
        Kd = a_float.toarray()
        br = np.zeros(inv.shape[1])
        br[npad : npad + n] = b[npad : npad + n] - b[npad : npad + n].mean()
        xf = np.asarray(inv.mv(jnp.asarray(br)))[npad : npad + n]
        r = Kd @ xf - br[npad : npad + n]
        assert np.linalg.norm(r) < 1e-9 * max(np.linalg.norm(b), 1)


class TestDeviceExpansion:
    """Device-side factor-input expansion (core/band.expand_block_tridiag_dia):
    bit-identical to the host csr_to_block_tridiag route, so the large path
    can factorize from the uploaded stencil diagonals without the multi-GB
    block-tridiag tunnel upload (matinv.c:410-431 analog)."""

    @staticmethod
    def _random_band_blocks(seed=0, ns=3, nl=100, bw=9):
        import scipy.sparse as sp

        rng = np.random.RandomState(seed)
        blocks = []
        for s in range(ns):
            diags, offs = [], []
            for off in range(-bw, bw + 1):
                if off and rng.rand() < 0.4:
                    continue  # ragged per-block diagonal sets
                offs.append(off)
                diags.append(rng.randn(nl - abs(off)))
            A = sp.diags(diags, offs, shape=(nl, nl), format="csr")
            A = (A + A.T) / 2 + sp.identity(nl) * (2 * bw)
            blocks.append(A.tocsr())
        return blocks

    @pytest.mark.parametrize("dtype", [np.float64, np.float32])
    def test_bitwise_vs_host_expansion(self, dtype):
        from permon_tpu.core.band import (
            BandCholInv,
            csr_to_block_tridiag,
            expand_block_tridiag_dia,
        )
        from permon_tpu.core.dia import BlockDia

        NB, nl, ns = 128, 100, 3
        nlp = NB  # one block, padded
        blocks = self._random_band_blocks(ns=ns, nl=nl)
        op = BlockDia.from_scipy_blocks(blocks, nlp=nlp)
        Ad_d, Asub_d = expand_block_tridiag_dia(op.data, op.offsets, NB,
                                                dtype=dtype)
        Ads, Asubs = [], []
        for s in range(ns):
            import scipy.sparse as sp

            Kp = sp.lil_matrix((nlp, nlp))
            Kp[:nl, :nl] = blocks[s]
            for i in range(nl, nlp):
                Kp[i, i] = 1.0
            Ad, Asub = csr_to_block_tridiag(Kp.tocsr(), NB)
            Ads.append(Ad.astype(dtype))
            Asubs.append(Asub.astype(dtype))
        np.testing.assert_array_equal(
            np.asarray(Ad_d), np.stack(Ads, axis=1))
        np.testing.assert_array_equal(
            np.asarray(Asub_d), np.stack(Asubs, axis=1))

    def test_multiblock_factor_identical(self):
        """Two band blocks per subdomain (nb=2): the full from_blockdia
        factorization equals the host-route factorization bitwise."""
        from permon_tpu.core.band import BandCholInv, csr_to_block_tridiag
        from permon_tpu.core.dia import BlockDia

        NB = 128
        blocks = self._random_band_blocks(seed=3, ns=2, nl=220, bw=30)
        nlp = 2 * NB
        op = BlockDia.from_scipy_blocks(blocks, nlp=nlp)
        kp_dev = BandCholInv.from_blockdia(op, NB, dtype=jnp.float32,
                                           refine=1)
        import scipy.sparse as sp

        Ads, Asubs = [], []
        for b in blocks:
            Kp = sp.lil_matrix((nlp, nlp))
            Kp[:220, :220] = b
            for i in range(220, nlp):
                Kp[i, i] = 1.0
            Ad, Asub = csr_to_block_tridiag(Kp.tocsr(), NB)
            Ads.append(Ad.astype(np.float32))
            Asubs.append(Asub.astype(np.float32))
        kp_host = BandCholInv.from_block_tridiag(
            np.stack(Ads, axis=1), np.stack(Asubs, axis=1),
            dtype=jnp.float32, scan_major=True,
        )
        np.testing.assert_array_equal(np.asarray(kp_dev.Dinv),
                                      np.asarray(kp_host.Dinv))
        np.testing.assert_array_equal(np.asarray(kp_dev.F),
                                      np.asarray(kp_host.F))
        # and the refinement operator is the stencil itself
        assert kp_dev.op is op
