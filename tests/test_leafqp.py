"""Scaled-leaf dual space (feti/leafqp.py): the fast leaf-space dual
iteration opened to contact (SMALXE/MPRGP), lumped-PC projected CG, and the
-project 0 pipeline — with ITERATION COUNTS IDENTICAL to the row-space
solve (the sqrt(multiplicity) isometry preserves every dot product, box
decision and power-method trajectory; module docstring of leafqp.py).

Reference semantics being mirrored: the SMALBE/MPRGP dual pipeline
(src/qps/impls/smalxe/smalxe.c:892-997) and PCDUAL lumped
(src/pc/impls/dual/pcdual.c:63-78), run over the MATGLUING leaf storage
(src/mat/impls/gluing/gluing.c).
"""

import numpy as np
import pytest

from permon_tpu.core.convergence import Tolerances
from permon_tpu.core.extension import SubdomainExtension
from permon_tpu.feti import FetiOptions
from permon_tpu.feti.solve import feti_solve


def _counts(res):
    out = {"its": int(res.iterations), "rnorm": float(res.rnorm)}
    for f in ("iterations_inner", "iterations_outer", "nmv"):
        if hasattr(res, f):
            out[f] = int(getattr(res, f))
    return out


class TestVStack:
    def test_matches_dense_stack(self):
        rng = np.random.default_rng(0)
        ns, nl = 3, 5
        def rand_ext(m, nnz):
            rows = rng.integers(0, m, nnz)
            cols = rng.integers(0, ns * nl, nnz)
            vals = rng.standard_normal(nnz)
            return SubdomainExtension.from_coo(rows, cols, vals, m=m, ns=ns, nl=nl)
        B1, B2 = rand_ext(4, 9), rand_ext(6, 11)
        B = SubdomainExtension.vstack((B1, B2))
        D = np.vstack([np.asarray(B1.todense()), np.asarray(B2.todense())])
        np.testing.assert_allclose(np.asarray(B.todense()), D)
        x = rng.standard_normal(ns * nl)
        np.testing.assert_allclose(np.asarray(B.mv(x)), D @ x)
        lam = rng.standard_normal(10)
        np.testing.assert_allclose(np.asarray(B.rmv(lam)), D.T @ lam)


class TestLeafContactParity:
    """TFETI contact (SMALBE): leaf-space SMALXE/MPRGP must reproduce the
    row-space iteration counts exactly."""

    def test_projected_contact(self):
        from examples.feti_contact import build

        prob, BI, cI, lb = build(4, 25)
        r_row = feti_solve(prob, FetiOptions(gluing="nonred"), BI=BI, cI=cI)
        r_leaf = feti_solve(
            prob, FetiOptions(gluing="nonred", throughput=True), BI=BI, cI=cI
        )
        assert _counts(r_leaf.result)["its"] == _counts(r_row.result)["its"]
        np.testing.assert_allclose(r_leaf.x_global, r_row.x_global, atol=1e-10)
        # the obstacle is respected (up to the default solve tolerance)
        assert (r_leaf.x_global - lb).min() > -5e-5

    def test_project0_contact(self):
        from examples.feti_contact import build

        prob, BI, cI, lb = build(4, 25)
        r_row = feti_solve(
            prob, FetiOptions(gluing="nonred", project=False), BI=BI, cI=cI
        )
        r_leaf = feti_solve(
            prob,
            FetiOptions(gluing="nonred", project=False, throughput=True),
            BI=BI, cI=cI,
        )
        assert _counts(r_leaf.result)["its"] == _counts(r_row.result)["its"]
        np.testing.assert_allclose(r_leaf.x_global, r_row.x_global, atol=1e-10)


class TestLeafLumpedParity:
    def test_poisson_lumped_cg(self):
        """Projected CG with the lumped dual PC through the leaf path:
        identical iteration count to the row-space preconditioned solve."""
        from examples.feti_ex71 import build

        prob = build((5, 5, 5), (1, 2, 3))
        tol = Tolerances(rtol=1e-10)
        r_row = feti_solve(prob, FetiOptions(pc_dual="lumped"), tol=tol)
        r_leaf = feti_solve(
            prob, FetiOptions(pc_dual="lumped", throughput=True), tol=tol
        )
        assert int(r_leaf.result.iterations) == int(r_row.result.iterations)
        np.testing.assert_allclose(r_leaf.x_global, r_row.x_global, atol=1e-8)
