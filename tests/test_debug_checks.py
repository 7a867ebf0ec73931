"""Opt-in runtime self-checks (the reference's PermonDebugEnabled blocks,
qptransform.c:1060-1081) and the FETI option-key mapping."""

import numpy as np
import pytest

import permon_tpu as pt
from permon_tpu.sys import tracing
from permon_tpu.sys.options import Options, feti_options_from_options


@pytest.fixture
def debug_mode():
    old = tracing.debug_enabled
    tracing.set_from_options(debug=True)
    yield
    tracing.set_from_options(debug=old)


def test_dualize_gi_checks_run_clean(debug_mode):
    """With -permon_debug on, dualize verifies K K+ K == K (and the MP
    identity for kplus_mode='mp') on random probes; a correct pipeline
    passes silently."""
    from examples.feti_ex1 import build
    from permon_tpu.feti.solve import FetiOptions, assemble_qp, make_blockdiag_kplus
    from permon_tpu.qp.transforms import dualize

    prob = build(3, 5)
    qp, K, fm, nb = assemble_qp(prob, FetiOptions())
    kplus = make_blockdiag_kplus(K, fm, prob, nb)
    for mode in ("left", "mp"):
        dualize(qp, kplus=kplus, kplus_mode=mode)  # asserts internally


def test_dualize_gi_checks_catch_wrong_inverse(debug_mode):
    """A deliberately wrong K+ (scaled 2x) must trip the left-GI check."""
    import jax.numpy as jnp

    from examples.feti_ex1 import build
    from permon_tpu.core.blockdiag import BlockDiagDense
    from permon_tpu.feti.solve import FetiOptions, assemble_qp, make_blockdiag_kplus
    from permon_tpu.qp.transforms import dualize

    prob = build(3, 5)
    qp, K, fm, nb = assemble_qp(prob, FetiOptions())
    kplus = make_blockdiag_kplus(K, fm, prob, nb).explicitly()
    bad = BlockDiagDense(blocks=2.0 * jnp.asarray(kplus.invs))
    with pytest.raises(AssertionError, match="left generalized inverse"):
        dualize(qp, kplus=bad, kplus_mode="left")


def test_projector_checks_run_clean(debug_mode):
    from examples.feti_ex1 import build
    from permon_tpu.feti.solve import FetiOptions, feti_solve

    res = feti_solve(build(3, 5), FetiOptions())
    assert int(res.result.reason) > 0


def test_feti_options_mapping():
    opts = Options(**{
        "feti_gluing_type": "orth",
        "dual_pc_dual_type": "lumped",
        "dual_qp_E_orth_type": "gslingen",
        "project": 0,
        "feti_precision": "mixed",
    })
    fo = feti_options_from_options(opts)
    assert fo.gluing == "orth"
    assert fo.pc_dual == "lumped"
    assert fo.orth_G == "gs_lingen"  # reference string 'gslingen' aliased
    assert fo.project is False
    assert fo.precision == "mixed"


def test_gs_lingen_end_to_end():
    """-dual_qp_E_orth_type gslingen on the SMALXE variant: same
    converged solution as the gs run (the two GS variants differ only in
    the reorthogonalization criterion)."""
    from examples.feti_ex1 import build
    from permon_tpu.feti.solve import FetiOptions, feti_solve
    from permon_tpu.solvers.smalxe import SMALXEOptions

    prob = build(4, 7)
    kw = dict(project=False, smalxe=SMALXEOptions(rho=1e1, inject_maxeig=True))
    r_gs = feti_solve(prob, FetiOptions(orth_G="gs", **kw))
    r_lg = feti_solve(prob, FetiOptions(orth_G="gs_lingen", **kw))
    assert int(r_lg.result.reason) > 0
    np.testing.assert_allclose(r_lg.x_global, r_gs.x_global, atol=1e-6)
