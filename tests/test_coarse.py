"""Redundancy-group coarse solve (parallel/coarse.py) — the
-qppf_redundancy analog: the coarse Cholesky factor sharded over the
within-group 'sd' axis of the two-level mesh, one full copy per host group
(reference: src/qppf/interface/qppf.c:182-183, matinv.c:551-575).
Results must match the fully-replicated cho_solve."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from permon_tpu.parallel import RedundantCoarse, make_mesh2, redundant_projector


def _spd(k, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((k, k))
    return A @ A.T + k * np.eye(k)


@pytest.mark.parametrize("kc", [3, 8, 13])
def test_matches_replicated_cho_solve(kc):
    S = _spd(kc)
    mesh = make_mesh2((2, 4))
    cp = RedundantCoarse.create(S, mesh, axis="sd")
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.standard_normal(kc))
    got = np.asarray(cp.mv(v))
    ref = np.linalg.solve(S, np.asarray(v))
    np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-10)


def test_factor_is_sharded_within_group():
    """Each chip stores kc/nsd block rows of the factor — the memory claim
    of redundancy groups (one distributed copy per host group)."""
    kc = 16
    mesh = make_mesh2((2, 4))
    cp = RedundantCoarse.create(_spd(kc), mesh, axis="sd")
    shard_shapes = {s.data.shape for s in cp.L.addressable_shards}
    assert shard_shapes == {(kc // 4, kc)}  # rows / nsd per chip


def test_projector_with_redundant_coarse():
    """A Projector running its coarse solve on redundancy groups gives the
    same P as the replicated-factor Projector (exercised end to end by a
    projected CG on a small TFETI dual)."""
    from permon_tpu.core.linop import Dense
    from permon_tpu.qp.projector import Projector

    rng = np.random.default_rng(2)
    kc, m = 5, 40
    Gd = rng.standard_normal((kc, m))
    G = Dense.create(jnp.asarray(Gd))
    gram = Gd @ Gd.T
    pf_rep = Projector.create(G, orthonormal_rows=False, gram=gram)
    mesh = make_mesh2((2, 4))
    pf_red = redundant_projector(G, gram, mesh)
    x = jnp.asarray(rng.standard_normal(m))
    np.testing.assert_allclose(
        np.asarray(pf_red.apply_p(x)), np.asarray(pf_rep.apply_p(x)),
        rtol=1e-12, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(pf_red.apply_q(x)), np.asarray(pf_rep.apply_q(x)),
        rtol=1e-12, atol=1e-12,
    )


def test_under_jit():
    kc = 8
    S = _spd(kc, seed=5)
    mesh = make_mesh2((2, 4))
    cp = RedundantCoarse.create(S, mesh)
    v = jnp.asarray(np.random.default_rng(3).standard_normal(kc))
    got = np.asarray(jax.jit(cp.mv)(v))
    np.testing.assert_allclose(got, np.linalg.solve(S, np.asarray(v)),
                               rtol=1e-10, atol=1e-10)


def test_feti_solve_with_redundancy_option():
    """End-to-end: FetiOptions(qppf_redundancy=True, mesh=(2,4)) runs the
    dual coarse solve on redundancy groups and reproduces the default
    (replicated-factor) iteration count and solution — the
    -dual_qppf_redundancy 2 variant of feti/ex1 (ex1.c TEST block)."""
    from examples.feti_ex1 import build
    from permon_tpu.feti import FetiOptions
    from permon_tpu.feti.solve import feti_solve

    prob = build(ns=8, ne=6)
    r_ref = feti_solve(prob, FetiOptions())
    mesh = make_mesh2((2, 4))
    r_red = feti_solve(prob, FetiOptions(qppf_redundancy=True, mesh=mesh))
    assert int(r_red.result.iterations) == int(r_ref.result.iterations)
    np.testing.assert_allclose(r_red.x_global, r_ref.x_global, atol=1e-10)


def test_options_key_maps_redundancy():
    from permon_tpu.sys.options import Options, feti_options_from_options

    fo = feti_options_from_options(
        Options.from_args(["-dual_qppf_redundancy", "2"], rc=False)
    )
    assert fo.qppf_redundancy
