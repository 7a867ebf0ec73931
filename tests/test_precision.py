"""Mixed-precision policy (core/precision.py): f32 matvec + f64
reductions must keep iteration-count parity with the full-f64 runs on
the shipped examples (SURVEY 7 item 7; oracles as in test_mprgp_ex1 /
test_feti)."""

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

import permon_tpu as pt
from permon_tpu.core.convergence import Tolerances
from permon_tpu.core.precision import MixedPrecision, cast_floats, with_precision


def _ex1_qp(n=100):
    from examples.ex1 import build

    A, b, lb = build(n)
    return pt.QP.create(sp.csr_matrix(A), b, lb=lb)


def test_mixed_wrapper_accuracy():
    rng = np.random.default_rng(0)
    M = rng.normal(size=(64, 64))
    M = M @ M.T + 64 * np.eye(64)
    op = pt.aslinearoperator(jnp.asarray(M))
    x = jnp.asarray(rng.normal(size=64))
    y64 = op.mv(x)
    mixed = with_precision(op, "mixed")
    ym = mixed.mv(x)
    assert ym.dtype == jnp.float64
    # f32 matvec: ~1e-7 relative accuracy, not f64-exact
    rel = float(jnp.linalg.norm(ym - y64) / jnp.linalg.norm(y64))
    assert 0 < rel < 1e-5


def test_ex1_mprgp_iteration_parity_mixed():
    """ex1 n=100 converges in 181 MPRGP iterations in f64 (reference
    oracle ex1_1.out).  The round-3 'mixed' policy keeps the STATE in f32
    (that's where the 21x speedup lives) with all reductions promoted to
    f64 — the f32 active-set decisions can shift the trajectory by a single
    iteration (observed: 180), so the pin is exact-or-one-off with the same
    converged reason and solution."""
    qp = _ex1_qp(100)
    res64 = pt.mprgp(qp, tol=Tolerances(max_it=10000))
    resmx = pt.mprgp(qp.with_precision("mixed"), tol=Tolerances(max_it=10000))
    assert int(res64.iterations) == 181
    assert resmx.x.dtype == jnp.float32  # state really is f32
    assert abs(int(resmx.iterations) - 181) <= 1
    assert int(resmx.reason) == int(res64.reason)
    np.testing.assert_allclose(
        np.asarray(resmx.x), np.asarray(res64.x), atol=1e-5
    )


def test_ex1_mprgp_mixed_dots_are_f64():
    """The recorded residual history of a mixed solve must be f64 (the
    promoted reductions), while the iterate is f32."""
    qp = _ex1_qp(100).with_precision("mixed")
    res = pt.mprgp(qp, tol=Tolerances(max_it=10000), history=256)
    assert res.rnorm_history.dtype == jnp.float64
    assert res.x.dtype == jnp.float32


def test_feti_ex1_projected_parity_mixed():
    """The projected TFETI pipeline (feti ex1, 4 subdomains) keeps its
    f64 iteration count under FetiOptions(precision='mixed')."""
    from examples.feti_ex1 import build
    from permon_tpu.feti import FetiOptions
    from permon_tpu.feti.solve import feti_solve

    prob = build(ns=4, ne=5)
    r64 = feti_solve(prob, FetiOptions(), tol=Tolerances())
    rmx = feti_solve(prob, FetiOptions(precision="mixed"), tol=Tolerances())
    assert int(rmx.result.iterations) == int(r64.result.iterations)
    np.testing.assert_allclose(rmx.x_global, r64.x_global, atol=1e-5)


def test_cast_floats_keeps_indices():
    op = pt.Ell.from_scipy(sp.random(32, 32, density=0.1, format="csr"))
    lo = cast_floats(op, jnp.float32)
    assert lo.vals.dtype == jnp.float32
    assert lo.cols.dtype == op.cols.dtype  # index arrays untouched


class TestLeafPrecision:
    """Round 4: throughput (scaled-leaf) + precision compose.  The leaf
    ITERATION runs the whole-QP f32-state policy (promoted fixed-tree f64
    dots under 'mixed'); the coarse projector, the spectral estimates and
    the row-space post chain stay f64.  Counts are PINNED (deterministic
    dots) but not equal to f64 — the f32 active-set/CG decisions shift the
    trajectory by a few iterations on the FETI duals; the contract is
    same-reason convergence + solution agreement at the policy's accuracy
    (PARITY.md)."""

    def test_contact_leaf_mixed(self):
        from examples.feti_contact import build
        from permon_tpu.feti import FetiOptions, feti_solve

        prob, BI, cI, lb = build(ns=4, ne=25)
        tol = Tolerances(rtol=1e-6)
        r64 = feti_solve(
            prob, FetiOptions(gluing="nonred", throughput=True),
            BI=BI, cI=cI, tol=tol,
        )
        rmx = feti_solve(
            prob,
            FetiOptions(gluing="nonred", throughput=True, precision="mixed"),
            BI=BI, cI=cI, tol=tol,
        )
        assert int(r64.result.reason) == 2
        assert int(rmx.result.reason) == 2
        # f64 leaf: exact parity with the row-space pipeline (34/91 outer/
        # inner on this example); mixed leaf pinned within a narrow band
        it64, in64 = (int(r64.result.iterations),
                      int(r64.result.inner_iterations))
        itmx, inmx = (int(rmx.result.iterations),
                      int(rmx.result.inner_iterations))
        assert (it64, in64) == (34, 91), (it64, in64)
        assert abs(itmx - 38) <= 2 and abs(inmx - 89) <= 4, (itmx, inmx)
        np.testing.assert_allclose(rmx.x_global, r64.x_global, atol=1e-4)
        assert (rmx.x_global >= lb - 5e-4).all()

    def test_contact_leaf_mixed_state_is_f32_with_f64_dots(self):
        from examples.feti_contact import build
        from permon_tpu.feti import FetiOptions
        from permon_tpu.feti.solve import prepare_contact_children

        prob, BI, cI, _lb = build(ns=4, ne=25)
        leaf, sm, sls = prepare_contact_children(
            prob,
            FetiOptions(gluing="nonred", throughput=True, precision="mixed"),
            BI, cI,
        )
        assert sls is not None  # the leaf path is actually taken
        assert leaf.b.dtype == jnp.float32  # f32 state
        assert jnp.dtype(leaf.dots_dtype) == jnp.float64  # promoted dots
        # spectral estimates were computed on the f64 operators
        assert jnp.asarray(sm.maxeig).dtype == jnp.float64

    def test_linear_leaf_mixed(self):
        from examples.feti_ex71 import build as build71
        from permon_tpu.feti import FetiOptions, feti_solve

        prob = build71(cells=(8, 8, 8), grid=(2, 2, 2))
        tol = Tolerances(rtol=1e-6)
        r64 = feti_solve(
            prob, FetiOptions(gluing="nonred", throughput=True), tol=tol
        )
        rmx = feti_solve(
            prob,
            FetiOptions(gluing="nonred", throughput=True, precision="mixed"),
            tol=tol,
        )
        assert int(rmx.result.reason) == 2
        assert abs(int(rmx.result.iterations) - int(r64.result.iterations)) <= 4
        np.testing.assert_allclose(rmx.x_global, r64.x_global, atol=5e-4)
