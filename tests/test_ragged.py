"""Ragged (bucketed) per-subdomain factorization
(core/factor.py:RaggedBlockDiagCholInv): heterogeneous subdomain sizes
factor at their true bucket size instead of the nl_max padding, matching
the uniform padded path bit-for-bit on the flat interface."""

import jax.numpy as jnp
import numpy as np

from permon_tpu.core.factor import BlockDiagCholInv, RaggedBlockDiagCholInv
from permon_tpu.feti.assembly import FetiProblem, decompose_rhs_by_multiplicity
from permon_tpu.feti.solve import FetiOptions, feti_solve, ragged_sizes


def _padded_spd_blocks(sizes, nl, seed=0):
    rng = np.random.default_rng(seed)
    ns = len(sizes)
    blocks = np.stack([np.eye(nl)] * ns)
    for s, sz in enumerate(sizes):
        M = rng.normal(size=(sz, sz))
        blocks[s, :sz, :sz] = M @ M.T + sz * np.eye(sz)
    return blocks


def test_ragged_matches_uniform():
    sizes = [5, 12, 12, 7]
    nl = 12
    blocks = jnp.asarray(_padded_spd_blocks(sizes, nl))
    uni = BlockDiagCholInv.from_blocks(blocks)
    rag = RaggedBlockDiagCholInv.from_blocks(blocks, sizes, round_to=4)
    assert len(rag.buckets) == 2  # sizes round to buckets {8, 12}
    x = jnp.asarray(np.random.default_rng(1).normal(size=nl * len(sizes)))
    np.testing.assert_allclose(
        np.asarray(rag.mv(x)), np.asarray(uni.mv(x)), atol=1e-12, rtol=1e-12
    )
    # explicit GEMV mode and the densified explicitly() form agree too
    rag_e = RaggedBlockDiagCholInv.from_blocks(blocks, sizes, round_to=4, explicit=True)
    np.testing.assert_allclose(
        np.asarray(rag_e.mv(x)), np.asarray(uni.mv(x)), atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(rag.explicitly().mv(x)), np.asarray(uni.mv(x)), atol=1e-10
    )


def _heterogeneous_1d(nes=(4, 9, 6)):
    """1-D Poisson TFETI with per-subdomain element counts (feti ex1
    conventions, examples/feti_ex1.py, but ragged sizes)."""
    ns = len(nes)
    nl = max(nes) + 1
    ndofs = sum(nes) + 1
    h = 1.0 / sum(nes)
    K = np.stack([np.eye(nl)] * ns)
    b = np.zeros((ns, nl))
    l2g = np.full((ns, nl), -1, dtype=np.int64)
    off = 0
    for s, ne in enumerate(nes):
        K[s, : ne + 1, : ne + 1] = 0.0
        for i in range(ne):
            K[s, i : i + 2, i : i + 2] += np.array([[1.0, -1.0], [-1.0, 1.0]])
            load = np.sin((off + i + 0.5) * h * np.pi) * 0.5 * h * h
            b[s, i] += load
            b[s, i + 1] += load
        # padding rows keep the unit diagonal
        for i in range(ne + 1, nl):
            K[s, i, i] = 1.0
        l2g[s, : ne + 1] = off + np.arange(ne + 1)
        off += ne
    dirichlet = np.array([0, ndofs - 1])
    b = decompose_rhs_by_multiplicity(b, l2g)
    return FetiProblem(K_blocks=K, b_loc=b, l2g=l2g, dirichlet=dirichlet)


def test_ragged_sizes_detection():
    prob = _heterogeneous_1d()
    sizes = ragged_sizes(prob.l2g)
    assert sizes is not None and list(sizes) == [5, 10, 7]
    from examples.feti_ex1 import build

    assert ragged_sizes(build(4, 7).l2g) is None  # uniform -> batched path


def test_heterogeneous_tfeti_solve():
    """End-to-end TFETI on ragged subdomains: the auto-selected bucketed
    K+ must reproduce the direct solve of the assembled global problem."""
    prob = _heterogeneous_1d()
    res = feti_solve(prob, FetiOptions(ragged_kplus=True))
    assert int(res.result.reason) > 0
    from permon_tpu.core.factor import RaggedBlockDiagCholInv
    from permon_tpu.feti.solve import FetiSolver

    assert isinstance(
        FetiSolver(prob, FetiOptions(ragged_kplus=True)).kplus,
        RaggedBlockDiagCholInv,
    )
    # assemble the global system and solve directly
    n = prob.n_global
    A = np.zeros((n, n))
    rhs = np.zeros(n)
    for s in range(prob.ns):
        real = np.flatnonzero(prob.l2g[s] >= 0)
        g = prob.l2g[s][real]
        A[np.ix_(g, g)] += prob.K_blocks[s][np.ix_(real, real)]
        rhs[g] += prob.b_loc[s][real]
    keep = np.setdiff1d(np.arange(n), prob.dirichlet)
    x = np.zeros(n)
    x[keep] = np.linalg.solve(A[np.ix_(keep, keep)], rhs[keep])
    np.testing.assert_allclose(res.x_global, x, atol=1e-8)
