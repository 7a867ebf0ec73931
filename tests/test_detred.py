"""Deterministic reductions (core/detred.py): fixed-binary-tree dots/Gram
and the per-solve scoping switches (`FetiOptions(deterministic=...)`,
`make_solver(deterministic=...)`) that replace the trace-time global."""

import jax.numpy as jnp
import numpy as np

import permon_tpu as pt
from permon_tpu.core import detred


class TestFixedTree:
    def test_det_sum_matches_sum(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((5, 37)))
        np.testing.assert_allclose(
            np.asarray(detred.det_sum(x)), np.asarray(x).sum(axis=-1), rtol=1e-13
        )

    def test_det_dots_bitwise_equals_det_dot(self):
        """The fused bundle must be BIT-identical per pair to separate
        det_dot calls (same per-row summation order) — this is what lets
        the solvers fuse their promoted dots without shifting any pinned
        iteration-count oracle."""
        rng = np.random.default_rng(5)
        x, y, z = (jnp.asarray(rng.standard_normal(1037)) for _ in range(3))
        fused = detred.det_dots([(x, y), (y, z), (z, z)])
        sep = (detred.det_dot(x, y), detred.det_dot(y, z), detred.det_dot(z, z))
        for f, s in zip(fused, sep):
            assert float(f) == float(s)

    def test_det_gram_matches_gram(self):
        rng = np.random.default_rng(4)
        G = jnp.asarray(rng.standard_normal((6, 301)))
        np.testing.assert_allclose(
            np.asarray(detred.det_gram(G)), np.asarray(G) @ np.asarray(G).T,
            rtol=1e-12, atol=1e-12,
        )


class TestScoping:
    def test_context_restores(self):
        assert not detred.enabled()
        with detred.deterministic_mode(True):
            assert detred.enabled()
            with detred.deterministic_mode(None):  # inherit
                assert detred.enabled()
            with detred.deterministic_mode(False):
                assert not detred.enabled()
            assert detred.enabled()
        assert not detred.enabled()

    def test_make_solver_per_solve_flag(self):
        """Two solvers built from the SAME module state but different
        per-solve flags trace different reductions; both converge to the
        same solution and the global flag is untouched."""
        from examples.ex1 import build

        A, b, lb = build(120)
        import scipy.sparse as sp

        qp = pt.QP.create(sp.csr_matrix(A), b, lb=lb)
        s_def = pt.make_solver(tol=pt.Tolerances(rtol=1e-8))
        s_det = pt.make_solver(tol=pt.Tolerances(rtol=1e-8), deterministic=True)
        r_def = s_def(qp)
        r_det = s_det(qp)
        assert not detred.enabled()
        np.testing.assert_allclose(
            np.asarray(r_det.x), np.asarray(r_def.x), atol=1e-7
        )
        # deterministic mode is bit-stable across repeat solves
        r_det2 = s_det(qp)
        assert int(r_det2.iterations) == int(r_det.iterations)

    def test_feti_options_per_solve_flag(self):
        """FetiOptions(deterministic=True) pins the solve without flipping
        the process-global mode."""
        from examples.feti_ex71 import build
        from permon_tpu.feti import FetiOptions, feti_solve

        prob = build((4, 4, 4), (1, 1, 2))
        r = feti_solve(prob, FetiOptions(deterministic=True))
        assert not detred.enabled()
        assert int(r.result.reason) > 0
