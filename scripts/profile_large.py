"""Per-component on-chip timing of the 1M-DOF north-star configuration.

Breaks the warm re-solve (scripts/northstar.py: resolve_warm_s) into its
pieces — band K+ apply, dual operator F = B K+ B', coarse projector P,
promoted dots, the one-dispatch fast executable, and host<->device tunnel
transfers — so optimization effort goes where the milliseconds are.
Every timed executable takes its operators as ARGUMENTS (a closed-over
device array is baked into the executable as a constant; see
feti/large.py).  Marginal chained timing throughout (the axon tunnel
memoizes identical executions and returns early from block_until_ready).

Usage: python scripts/profile_large.py [ncells] [grid]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SALT = [0]


def marginal(fn, args0, lo=3, hi=13, reps=2, scale=None):
    """Marginal per-step seconds of fn chained on-device.

    ``fn(carry, *rest) -> carry`` with carry a vector; rest is passed
    through.  ``scale`` perturbs the carry per measurement so no execution
    repeats (tunnel memoization)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(steps, carry, *rest):
        def body(i, c):
            y = fn(c, *rest)
            return y / (jnp.linalg.norm(y) + 1e-30)

        return jax.lax.fori_loop(0, steps, body, carry)

    carry0, rest = args0[0], args0[1:]

    def timed(steps):
        best = float("inf")
        for _ in range(reps):
            SALT[0] += 1
            c = carry0 * (1.0 + 1e-6 * SALT[0])
            t0 = time.perf_counter()
            _ = float(jnp.sum(chain(steps, c, *rest)))
            best = min(best, time.perf_counter() - t0)
        return best

    _ = float(jnp.sum(chain(2, carry0, *rest)))  # compile + warm
    return max((timed(hi) - timed(lo)) / (hi - lo), 1e-12)


def main(ncells=100, g=4):
    import jax
    import jax.numpy as jnp

    from examples.feti_large import build_sparse
    from permon_tpu.core.convergence import Tolerances
    from permon_tpu.feti.large import FetiSolverSparse
    from permon_tpu.feti.solve import FetiOptions
    from permon_tpu.qp.transforms import dualize

    out = {"ncells": ncells, "grid": g}
    t0 = time.time()
    prob = build_sparse((ncells,) * 3, (g,) * 3)
    out["dofs"] = int(prob.n_global)
    print(f"assembled {out['dofs']} dofs host ({time.time()-t0:.1f} s)",
          flush=True)

    t0 = time.time()
    solver = FetiSolverSparse(
        prob, FetiOptions(gluing="nonred"),
        kplus_dtype=jnp.float32, kplus_refine=2, primal_refine=1,
    )
    qp, kplus = solver.qp, solver.kplus
    out["factor_s"] = round(time.time() - t0, 1)
    print(f"factorized ({out['factor_s']} s incl. compile)", flush=True)

    t0 = time.time()
    dual, _ = dualize(qp, kplus=kplus, coarse=solver.opts.coarse)
    solver._pf = dual.pf
    out["dualize_s"] = round(time.time() - t0, 1)
    m = int(dual.A.shape[0])
    out["m_dual"] = m
    print(f"dualize {out['dualize_s']} s, m = {m}", flush=True)

    n = int(qp.A.shape[0])
    x0 = jnp.ones(n, jnp.float64)
    lam0 = jnp.ones(m, jnp.float64)

    # 1. band K+ apply (unrefined, the hot CG apply)
    per = marginal(lambda x, kp: kp.mv(x), (x0, kplus))
    out["kplus_apply_ms"] = round(per * 1e3, 2)
    print(f"kplus apply {per*1e3:.1f} ms", flush=True)

    # 2. refined K+ apply (the post-chain accurate apply)
    if solver.kplus_post is not None:
        per = marginal(lambda x, kp: kp.mv(x), (x0, solver.kplus_post),
                       lo=2, hi=6)
        out["kplus_refined_apply_ms"] = round(per * 1e3, 2)
        print(f"kplus refined apply {per*1e3:.1f} ms", flush=True)

    # 3. primal stencil operator (BlockDia A)
    per = marginal(lambda x, A: A.mv(x), (x0, qp.A))
    out["A_apply_ms"] = round(per * 1e3, 2)
    print(f"A apply {per*1e3:.1f} ms", flush=True)

    # 4. dual operator F = B K+ B'
    per = marginal(lambda v, d: d.A.mv(v), (lam0, dual), lo=3, hi=9)
    out["F_apply_ms"] = round(per * 1e3, 2)
    print(f"F apply {per*1e3:.1f} ms", flush=True)

    # 5. coarse projector P = I - G'(GG')^-1 G
    per = marginal(lambda v, pf: pf.apply_p(v), (lam0, dual.pf))
    out["P_apply_ms"] = round(per * 1e3, 3)
    print(f"P apply {per*1e3:.2f} ms", flush=True)

    # 6. one f64 dual dot (the CG reduction cost)
    per = marginal(lambda v, w: v * jnp.vdot(v, w), (lam0, lam0 * 0.5),
                   lo=5, hi=25)
    out["dual_dot_ms"] = round(per * 1e3, 3)
    print(f"f64 dual dot (+axpy) {per*1e3:.3f} ms", flush=True)

    # free the eager dualize products before compiling the fast executable:
    # at the 1M-dof scale the extra dual operator + section temporaries
    # pushed HBM 5 MB past capacity (observed OOM in the round-4 run)
    import gc

    del dual
    gc.collect()

    # 7. the one-dispatch fast executable (dual CG + post chain), warm
    tol = Tolerances(rtol=1e-5)
    fn = solver._fast_fn(tol)
    l2g_c, real, counts_g = solver._reassembly_tables(prob, qp.BE.nl)
    kplus_lean, corr = solver.fast_args()
    t0 = time.time()
    xg, x_dec, res = fn(qp, kplus_lean, corr, solver._pf,
                        qp.b, l2g_c, real, counts_g)
    _ = float(jnp.sum(xg))
    out["fast_fn_first_s"] = round(time.time() - t0, 1)
    print(f"fast fn first (compile) {out['fast_fn_first_s']} s", flush=True)

    ts = []
    its = None
    for k in range(3):
        SALT[0] += 1
        b = qp.b * (1.0 + 1e-6 * SALT[0])
        t0 = time.time()
        xg, x_dec, res = fn(qp, kplus_lean, corr, solver._pf,
                            b, l2g_c, real, counts_g)
        _ = float(jnp.sum(xg))
        ts.append(time.time() - t0)
        its = int(res.iterations)
    out["fast_fn_warm_s"] = round(min(ts), 2)
    out["fast_fn_its"] = its
    print(f"fast fn warm {min(ts):.2f} s ({its} its -> "
          f"{min(ts)/max(its,1)*1e3:.0f} ms/it incl. post)", flush=True)

    # 8. tunnel transfer cost: upload a primal f64 vector, fetch one back
    big = np.random.default_rng(0).normal(size=n)
    t0 = time.time()
    d = jax.device_put(big)
    d.block_until_ready()
    out["upload_9mb_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    _ = np.asarray(d)
    out["fetch_9mb_s"] = round(time.time() - t0, 2)
    print(f"tunnel: upload {out['upload_9mb_s']} s, fetch "
          f"{out['fetch_9mb_s']} s ({n*8/1e6:.0f} MB)", flush=True)

    # 9. end-to-end warm solve through the public API (incl. host work)
    t0 = time.time()
    res = solver.solve(b_loc=prob.b_loc * 1.003, tol=tol)
    out["solve_warm_s"] = round(time.time() - t0, 1)
    out["solve_warm_its"] = int(res.result.iterations)
    print(f"solver.solve warm {out['solve_warm_s']} s", flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "profile_large.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    nc = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    g = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    main(nc, g)
