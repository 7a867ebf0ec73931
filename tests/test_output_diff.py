"""Literal expected-output diffs — the reference's own oracle mechanism.

The reference test harness diffs filtered stdout against committed
expected-output files (gmakefile.test:92-97 + petscdiff; filter:
`grep -e CONVERGED -e number -e "r ="`).  These tests generate the same
report through the library's viewers and diff it VERBATIM (including
indentation) against the committed `.out` files under
/root/reference/src/tutorials/output/.
"""

import os

import numpy as np
import pytest

REF_OUT = "/root/reference/src/tutorials/output"


def _filtered(text: str):
    """The reference testset filter: grep -e CONVERGED -e number -e 'r ='."""
    return [
        l for l in text.splitlines()
        if "CONVERGED" in l or "number" in l or "r =" in l
    ]


def _generate_ex1(n=100):
    import scipy.sparse as sp

    from examples.ex1 import build
    from permon_tpu import QP, solve
    from permon_tpu.viewers import view_convergence, view_kkt

    A, b, lb = build(n)
    qp = QP.create(sp.csr_matrix(A), b, lb=lb)
    res = solve(qp)
    return view_convergence(res) + "\n" + view_kkt(qp, res.x, g=res.g)


@pytest.mark.skipif(not os.path.isdir(REF_OUT), reason="reference not present")
class TestLiteralOutputDiff:
    def test_ex1_matches_committed_out_file_verbatim(self):
        with open(os.path.join(REF_OUT, "ex1_1.out")) as f:
            expected = [l.rstrip("\n") for l in f if l.strip()]
        got = _filtered(_generate_ex1())
        assert got == expected, "\n".join(
            ["--- generated:"] + got + ["--- expected:"] + expected
        )


class TestResidualHistory:
    def test_cg_history(self):
        import jax.numpy as jnp

        from permon_tpu import QP
        from permon_tpu.core.convergence import Tolerances
        from permon_tpu.solvers.cg import cg

        rng = np.random.default_rng(0)
        M = rng.normal(size=(40, 40))
        A = M @ M.T + 40 * np.eye(40)
        qp = QP.create(A, rng.normal(size=40))
        res = cg(qp, tol=Tolerances(rtol=1e-10), history=128)
        h = np.asarray(res.rnorm_history)
        its = int(res.iterations)
        assert np.isfinite(h[: its + 1]).all()
        assert np.isnan(h[its + 1 :]).all()
        # monotone-ish decrease start to end; final recorded value ~ rnorm
        assert h[its] == pytest.approx(float(res.rnorm), rel=1e-12)
        assert h[0] > h[its]

    def test_mprgp_history_and_viewer(self):
        import scipy.sparse as sp

        from examples.ex1 import build
        from permon_tpu import QP
        from permon_tpu.solvers.mprgp import mprgp
        from permon_tpu.viewers import view_history

        A, b, lb = build(50)
        qp = QP.create(sp.csr_matrix(A), b, lb=lb)
        res = mprgp(qp, history=512)
        h = np.asarray(res.rnorm_history)
        its = int(res.iterations)
        assert np.isfinite(h[: its + 1]).all()
        txt = view_history(res, solver="MPGP")
        assert txt.count("\n") == its  # one line per recorded iteration
        assert "||r||=" in txt

    def test_smalxe_outer_history(self):
        import jax.numpy as jnp

        from permon_tpu import QP
        from permon_tpu.core.convergence import Tolerances
        from permon_tpu.solvers.smalxe import SMALXEOptions, smalxe

        rng = np.random.default_rng(1)
        M = rng.normal(size=(30, 30))
        A = M @ M.T + 30 * np.eye(30)
        BE = rng.normal(size=(3, 30))
        qp = QP.create(A, rng.normal(size=30), BE=BE)
        res = smalxe(qp, opts=SMALXEOptions(), tol=Tolerances(rtol=1e-8),
                     history=64)
        h = np.asarray(res.rnorm_history)
        its = int(res.iterations)
        assert its >= 1
        assert np.isfinite(h[:its]).all()
        assert h[its - 1] == pytest.approx(float(res.rnorm), rel=1e-12)


@pytest.mark.skipif(not os.path.isdir(REF_OUT), reason="reference not present")
class TestLiteralOutputDiffRound4:
    """Round 4: the verbatim oracle extended to ex2, ex3 and the ex1
    expansion/steplength variants."""

    def _generate(self, mainfn, **kw):
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            mainfn(view=True, **kw)
        return _filtered(buf.getvalue())

    def _expected(self, name):
        with open(os.path.join(REF_OUT, name)) as f:
            return [l.rstrip("\n") for l in f if l.strip()]

    def test_ex2_matches_committed_out_verbatim(self):
        """The committed infinite-true variant (full-length lb with -inf
        entries — exactly our representation).  The infinite-false file
        differs only in last-digit KKT noise of the reference's own sub-IS
        code path."""
        from examples.ex2 import main

        got = self._generate(main)
        assert got == self._expected("ex2_1_infinite-true.out"), got

    @pytest.mark.parametrize(
        "kw,fname",
        [
            (dict(expansion_type="gf", explength_type="opt"), "ex1_opt.out"),
            (dict(expansion_type="g", explength_type="optapprox"),
             "ex1_optapprox.out"),
            (dict(expansion_type="projcg"), "ex1_projcg.out"),
            (dict(expansion_type="gfgr", explength_type="bb"), "ex1_bb.out"),
        ],
    )
    def test_ex1_variants_match_committed_out_verbatim(self, kw, fname):
        from examples.ex1 import main
        from permon_tpu.solvers.mprgp import MPRGPOptions

        got = self._generate(main, opts=MPRGPOptions(**kw))
        assert got == self._expected(fname), (fname, got)

    def test_ex3_matches_committed_out(self):
        """Verbatim on every line except the parent stationarity residual
        ||A*x - b + B'*lambda||: both sides are at machine epsilon (1.93e-15
        reference MUMPS vs 3.62e-15 band-Cholesky K+) and the exact digits
        are factorization-rounding, not algorithmic."""
        import re

        from examples.ex3 import main

        got = self._generate(main)
        exp = self._expected("ex3_1.out")
        assert len(got) == len(exp)
        for g, e in zip(got, exp):
            if "B'*lambda" in e:
                # same label, value at machine noise
                ge = re.match(r"r = \|\|(.+)\|\| = (\S+)    rO/\|\|b\|\| = (\S+)", g)
                ee = re.match(r"r = \|\|(.+)\|\| = (\S+)    rO/\|\|b\|\| = (\S+)", e)
                assert ge and ee and ge.group(1) == ee.group(1), (g, e)
                assert float(ge.group(3)) < 1e-12, g
            else:
                assert g == e, (g, e)
