"""De-densified constraint-side transforms (qp/sparse_rows.py): same-type
sparse row ops + sparse GG' coarse factorization + implicit band
orthonormalization.  The acceptance test is the 1e5-row BE going through
scale -> split -> project with no (m, n) dense intermediate (a dense
materialization would be ~320 GB and could not pass)."""

import numpy as np
import jax.numpy as jnp
import pytest

import permon_tpu  # noqa: F401
from permon_tpu.core.extension import SubdomainExtension
from permon_tpu.core.linop import Dense, Ell, Product
from permon_tpu.feti.assembly import build_gluing
from permon_tpu.qp.qp import QP
from permon_tpu.qp.sparse_rows import (
    permute_rows,
    restrict_rows,
    row_nnz,
    row_sqnorm,
    scale_rows,
    to_coo,
    to_scipy,
)


def _chain_l2g(ns, nl):
    """1-D chain of ns subdomains with nl dofs each, sharing one node with
    the next subdomain (the feti ex1 decomposition pattern)."""
    l2g = np.zeros((ns, nl), dtype=np.int64)
    for s in range(ns):
        l2g[s] = np.arange(s * (nl - 1), s * (nl - 1) + nl)
    return l2g


def _extension_be(ns=6, nl=4, dirichlet=True):
    l2g = _chain_l2g(ns, nl)
    gr, gc, gv, m = build_gluing(l2g, "nonred")
    rows = [gr]
    cols = [gc]
    vals = [gv]
    if dirichlet:
        rows.append(np.array([m]))
        cols.append(np.array([0]))
        vals.append(np.array([1.0]))
        m += 1
    return SubdomainExtension.from_coo(
        np.concatenate(rows), np.concatenate(cols), np.concatenate(vals),
        m=m, ns=ns, nl=nl), l2g


class TestRowOps:
    def test_to_coo_roundtrip(self):
        BE, _ = _extension_be()
        Bd = np.asarray(BE.todense())
        Bs = to_scipy(BE)
        assert np.allclose(Bs.toarray(), Bd)
        ell = Ell.from_scipy(to_scipy(BE))
        assert np.allclose(to_scipy(ell).toarray(), Bd)

    def test_row_reductions(self):
        BE, _ = _extension_be()
        Bd = np.asarray(BE.todense())
        assert np.array_equal(row_nnz(BE), (np.abs(Bd) > 0).sum(1))
        assert np.allclose(row_sqnorm(BE), (Bd**2).sum(1))

    @pytest.mark.parametrize("kind", ["ext", "ell", "dense"])
    def test_scale_permute_restrict_match_dense(self, kind):
        BE, _ = _extension_be()
        Bd = np.asarray(BE.todense())
        m = Bd.shape[0]
        if kind == "ell":
            BE = Ell.from_scipy(to_scipy(BE))
        elif kind == "dense":
            BE = Dense.create(jnp.asarray(Bd))
        rng = np.random.default_rng(0)
        d = rng.uniform(0.5, 2.0, m)
        assert np.allclose(np.asarray(scale_rows(BE, d).todense()),
                           d[:, None] * Bd)
        perm = rng.permutation(m)
        assert np.allclose(np.asarray(permute_rows(BE, perm).todense()),
                           Bd[perm])
        keep = np.sort(rng.choice(m, size=m // 2, replace=False))
        assert np.allclose(np.asarray(restrict_rows(BE, keep).todense()),
                           Bd[keep])

    def test_scale_rows_keeps_dense_blocks(self):
        BE, _ = _extension_be()
        BE = BE.with_dense_blocks()
        d = np.linspace(1.0, 2.0, BE.m_dual)
        out = scale_rows(BE, d)
        assert out.blk is not None
        x = np.random.default_rng(1).normal(size=BE.shape[1])
        assert np.allclose(np.asarray(out.mv(jnp.asarray(x))),
                           d * np.asarray(BE.mv(jnp.asarray(x))))


class TestTransformsSparse:
    """scale / split_be / remove_gluing keep the extension type and match the
    dense-transform results."""

    def test_scale_matches_dense_path(self):
        from permon_tpu.qp.transforms import scale

        BE, _ = _extension_be()
        Bd = np.asarray(BE.todense())
        qp_s = QP(A=Dense.create(jnp.eye(BE.shape[1])),
                  b=jnp.zeros(BE.shape[1]), BE=BE,
                  cE=jnp.arange(1.0, BE.m_dual + 1))
        qp_d = qp_s.replace(BE=Dense.create(jnp.asarray(Bd)))
        for mode in ("rows_norm_2", "ddm_multiplicity"):
            ch_s, _ = scale(qp_s, scale_E=mode)
            ch_d, _ = scale(qp_d, scale_E=mode)
            assert isinstance(ch_s.BE, SubdomainExtension)
            assert np.allclose(np.asarray(ch_s.BE.todense()),
                               np.asarray(ch_d.BE.todense()))
            assert np.allclose(np.asarray(ch_s.cE), np.asarray(ch_d.cE))

    def test_split_be_matches_dense_path(self):
        from permon_tpu.qp.transforms import split_be

        BE, _ = _extension_be()
        Bd = np.asarray(BE.todense())
        qp_s = QP(A=Dense.create(jnp.eye(BE.shape[1])),
                  b=jnp.zeros(BE.shape[1]), BE=BE,
                  cE=jnp.arange(1.0, BE.m_dual + 1))
        qp_d = qp_s.replace(BE=Dense.create(jnp.asarray(Bd)))
        ch_s, post_s = split_be(qp_s)
        ch_d, post_d = split_be(qp_d)
        assert isinstance(ch_s.BE, SubdomainExtension)
        assert np.allclose(np.asarray(ch_s.BE.todense()),
                           np.asarray(ch_d.BE.todense()))
        # last row is the Dirichlet (1-nnz) row after the split
        nnz = (np.abs(np.asarray(ch_s.BE.todense())) > 0).sum(1)
        assert nnz[-1] == 1 and (nnz[:-1] >= 2).all()
        # lambda permutes back identically
        from permon_tpu.qp.transforms import Solution

        lam = jnp.arange(1.0, BE.m_dual + 1)
        assert np.allclose(
            np.asarray(post_s(Solution(x=qp_s.b, lambda_E=lam)).lambda_E),
            np.asarray(post_d(Solution(x=qp_s.b, lambda_E=lam)).lambda_E))

    def test_remove_gluing_matches_dense_path(self):
        from permon_tpu.qp.transforms import remove_gluing_of_dirichlet_dofs

        BE, l2g = _extension_be()
        Bd = np.asarray(BE.todense())
        qp_s = QP(A=Dense.create(jnp.eye(BE.shape[1])),
                  b=jnp.zeros(BE.shape[1]), BE=BE)
        qp_d = qp_s.replace(BE=Dense.create(jnp.asarray(Bd)))
        # dirichlet on the first shared node's decomposed copies
        nl = l2g.shape[1]
        shared = nl - 1  # local id in subdomain 0; copy 0 in subdomain 1
        dd = [shared, nl]
        ch_s, _ = remove_gluing_of_dirichlet_dofs(qp_s, dd)
        ch_d, _ = remove_gluing_of_dirichlet_dofs(qp_d, dd)
        assert isinstance(ch_s.BE, SubdomainExtension)
        assert np.allclose(np.asarray(ch_s.BE.todense()),
                           np.asarray(ch_d.BE.todense()))
        assert ch_s.BE.shape[0] < BE.shape[0]


class TestSparseProjector:
    def test_band_projector_matches_dense(self):
        from permon_tpu.qp.projector import Projector

        BE, _ = _extension_be(ns=40, nl=5)
        pf_d = Projector.create(BE, orthonormal_rows=False, sparse=False)
        pf_s = Projector.create(BE, orthonormal_rows=False, sparse=True)
        assert pf_s.ggt_band is not None
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=BE.shape[1]))
        assert np.allclose(np.asarray(pf_s.apply_p(x)),
                           np.asarray(pf_d.apply_p(x)), atol=1e-10)
        v = jnp.asarray(rng.normal(size=BE.shape[0]))
        assert np.allclose(np.asarray(pf_s.apply_cp(v)),
                           np.asarray(pf_d.apply_cp(v)), atol=1e-10)


class TestImplicitBandOrth:
    def test_orthonormalize_large_sparse(self):
        from permon_tpu.qp.transforms import Solution, orthonormalize_eq

        ns, nl = 3000, 4
        BE, _ = _extension_be(ns=ns, nl=nl, dirichlet=False)
        assert BE.shape[0] > 2048
        qp = QP(A=Dense.create(jnp.eye(2)),  # A unused by the transform
                b=jnp.zeros(BE.shape[1]), BE=BE,
                cE=jnp.ones(BE.shape[0]))
        child, post = orthonormalize_eq(qp, "implicit")
        assert isinstance(child.BE, Product)
        assert child.pf.orthonormal_rows
        rng = np.random.default_rng(3)
        # Q Q' y = y (orthonormal rows), checked by random vectors
        y = jnp.asarray(rng.normal(size=BE.shape[0]))
        yy = child.BE.mv(child.BE.rmv(y))
        assert np.allclose(np.asarray(yy), np.asarray(y), atol=1e-9)
        # post maps lambda via T': B' (T' lam) == Q' lam
        lam = jnp.asarray(rng.normal(size=BE.shape[0]))
        lam_parent = post(Solution(x=qp.b, lambda_E=lam)).lambda_E
        assert np.allclose(np.asarray(BE.rmv(lam_parent)),
                           np.asarray(child.BE.rmv(lam)), atol=1e-9)

    def test_small_dense_path_untouched(self):
        from permon_tpu.qp.transforms import orthonormalize_eq

        BE, _ = _extension_be()
        qp = QP(A=Dense.create(jnp.eye(2)), b=jnp.zeros(BE.shape[1]), BE=BE)
        child, _ = orthonormalize_eq(qp, "cholesky")
        assert isinstance(child.BE, Dense)  # small m keeps the dense algebra


class TestHundredThousandRows:
    def test_scale_split_project_1e5_rows(self):
        """The VERDICT acceptance: a 1e5-row BE through scale -> split ->
        project with no (m, n) dense intermediate."""
        from permon_tpu.qp.projector import Projector
        from permon_tpu.qp.transforms import scale, split_be

        ns, nl = 100_001, 4
        l2g = _chain_l2g(ns, nl)
        gr, gc, gv, m = build_gluing(l2g, "nonred")
        # one Dirichlet row so the split is nontrivial
        rows = np.concatenate([gr, [m]])
        cols = np.concatenate([gc, [0]])
        vals = np.concatenate([gv, [1.0]])
        m += 1
        BE = SubdomainExtension.from_coo(rows, cols, vals, m=m, ns=ns, nl=nl)
        assert m > 100_000
        qp = QP(A=Dense.create(jnp.eye(2)), b=jnp.zeros(BE.shape[1]), BE=BE,
                cE=jnp.zeros(m))
        qp1, _ = scale(qp, scale_E="ddm_multiplicity")
        assert isinstance(qp1.BE, SubdomainExtension)
        qp2, _ = split_be(qp1)
        assert isinstance(qp2.BE, SubdomainExtension)
        pf = Projector.create(qp2.BE, orthonormal_rows=False)
        assert pf.ggt_band is not None  # sparse coarse factorization chosen
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(size=BE.shape[1]))
        px = pf.apply_p(x)
        # P annihilates the constraint: ||G P x|| ~ 0, and P is idempotent
        gpx = np.asarray(qp2.BE.mv(px))
        assert np.linalg.norm(gpx) < 1e-8 * np.linalg.norm(np.asarray(x))
        ppx = pf.apply_p(px)
        assert np.allclose(np.asarray(ppx), np.asarray(px), atol=1e-9)
