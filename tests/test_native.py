"""Equivalence tests of the native C++ host-assembly library against the
pure-numpy reference implementations."""

import numpy as np
import pytest
import scipy.sparse as sp

from permon_tpu.utils import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (g++ missing?)")
    return lib


def _python_gluing(l2g, gluing, scale):
    """The numpy path, bypassing the native shortcut."""
    from permon_tpu.feti import assembly

    ns, nl = l2g.shape
    excl = set()
    rows, cols, vals = [], [], []
    r = 0
    for g, copies in sorted(assembly._dof_copies(l2g).items()):
        d = len(copies)
        if d < 2:
            continue
        idx = [s * nl + i for (s, i) in copies]
        ms = 1.0 / np.sqrt(d) if (scale and gluing in ("nonred", "full")) else 1.0
        if gluing == "nonred":
            for j in range(1, d):
                rows += [r, r]; cols += [idx[0], idx[j]]; vals += [ms, -ms]; r += 1
        elif gluing == "full":
            for a in range(d):
                for b in range(a + 1, d):
                    rows += [r, r]; cols += [idx[a], idx[b]]; vals += [ms, -ms]; r += 1
        else:
            for k in range(1, d):
                nrm = 1.0 / np.sqrt(1.0 / k + 1.0)
                for a in range(k):
                    rows.append(r); cols.append(idx[a]); vals.append(nrm / k)
                rows.append(r); cols.append(idx[k]); vals.append(-nrm)
                r += 1
    return np.array(rows), np.array(cols), np.array(vals), r


class TestNative:
    @pytest.mark.parametrize("gluing", ["nonred", "full", "orth"])
    @pytest.mark.parametrize("scale", [True, False])
    def test_gluing_matches_python(self, lib, gluing, scale):
        rng = np.random.default_rng(0)
        ns, nl = 6, 20
        # random overlapping l2g with some padding
        l2g = rng.integers(0, 60, size=(ns, nl))
        # dedupe within subdomains (a dof appears at most once per subdomain)
        for s in range(ns):
            seen = set()
            for i in range(nl):
                while int(l2g[s, i]) in seen:
                    l2g[s, i] = rng.integers(0, 200)
                seen.add(int(l2g[s, i]))
        l2g[0, -2:] = -1  # padding
        nat = native.build_gluing_native(l2g, gluing, scale)
        ref = _python_gluing(l2g, gluing, scale)
        m = max(nat[3], ref[3])
        N = ns * nl
        Bn = sp.coo_matrix((nat[2], (nat[0], nat[1])), shape=(m, N)).toarray()
        Bp = sp.coo_matrix((ref[2], (ref[0], ref[1])), shape=(m, N)).toarray()
        assert nat[3] == ref[3]
        np.testing.assert_allclose(Bn, Bp, atol=1e-15)

    def test_csr_to_ell(self, lib):
        a = sp.random(40, 30, density=0.2, random_state=np.random.default_rng(1), format="csr")
        cols, vals = native.csr_to_ell_native(a)
        dense = np.zeros((40, 30))
        rows = np.repeat(np.arange(40), cols.shape[1])
        np.add.at(dense, (rows, cols.reshape(-1)), vals.reshape(-1))
        np.testing.assert_allclose(dense, a.toarray(), atol=1e-15)

    def test_pack_extension(self, lib):
        rng = np.random.default_rng(2)
        ns, nl, m = 4, 10, 12
        nnz = 30
        rows = rng.integers(0, m, size=nnz)
        cols = rng.integers(0, ns * nl, size=nnz)
        vals = rng.normal(size=nnz)
        r, c, v = native.pack_extension_native(rows, cols, vals, m, ns, nl)
        dense = np.zeros((m + 1, ns * nl))
        for s in range(ns):
            for j in range(r.shape[1]):
                dense[r[s, j], s * nl + c[s, j]] += v[s, j]
        ref = sp.coo_matrix((vals, (rows, cols)), shape=(m, ns * nl)).toarray()
        np.testing.assert_allclose(dense[:m], ref, atol=1e-15)


class TestLeafPartnersNative:
    def test_matches_python_fallback(self):
        import jax.numpy as jnp
        import numpy as np

        from examples.feti_ex1 import build
        from permon_tpu.feti import FetiOptions
        from permon_tpu.feti.leaf import LeafDualSpace
        from permon_tpu.feti.solve import assemble_qp
        from permon_tpu.utils import native as nat

        prob = build(4, 7)
        qp, *_ = assemble_qp(prob, FetiOptions(gluing="full"))
        B = qp.BE
        packed = nat.leaf_partners_native(np.asarray(B.rows), np.asarray(B.vals), B.m_dual)
        if packed is None:
            import pytest

            pytest.skip("native library unavailable")
        partners_n, weights_n = packed
        # python fallback (force by monkeypatching)
        orig = nat.leaf_partners_native
        try:
            nat.leaf_partners_native = lambda *a, **k: None
            sp_py = LeafDualSpace.build(B)
        finally:
            nat.leaf_partners_native = orig
        np.testing.assert_allclose(weights_n, np.asarray(sp_py.weights), atol=1e-15)
        # partner SETS per leaf must match (order within a row may differ)
        pn = np.sort(partners_n, axis=0)
        pp = np.sort(np.asarray(sp_py.partners), axis=0)
        np.testing.assert_array_equal(pn, pp)
