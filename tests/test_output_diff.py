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
