"""Communication audit of the sharded large path — the multi-chip contract,
verified on compiled HLO.

Real multi-chip hardware is not available in this environment, so the
scaling story is pinned the honest way: compile the sharded executables on
virtual N-device meshes and COUNT THE COLLECTIVES XLA actually inserted.
The design contract (parallel/dist.py, SURVEY 2.10) is:

- B' lambda, K+ apply, box/gradient splits: zero communication (subdomain-
  local, like MATBLOCKDIAG's MatMult, matblockdiag.c:190-233);
- B u (and the global reassembly scatter-add): ONE psum of a dual-sized
  (m,) vector over the mesh — the analog of the reference's VecScatter-add
  (extension.c:476-540);
- coarse projector and CG dots: replicated compute on replicated dual
  vectors, zero communication (the maximal -qppf_redundancy placement).

So each dual CG iteration must cost exactly one m-vector all-reduce; at the
1M-dof north star (m = 94,563 f64) that is 756 KB per iteration against a
~20 ms K+ apply — ICI transfer time at ~45 GB/s is ~17 us, <0.1% of the
iteration, which is what makes the >=80% weak-scaling target structurally
reachable.  Writes scripts/comm_audit.json.

Usage: python scripts/comm_audit.py  (CPU, virtual devices)
"""

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import permon_tpu  # noqa: F401  (x64)
from examples.feti_large import build_sparse
from permon_tpu.core.convergence import Tolerances
from permon_tpu.core.linop import Product, Transpose
from permon_tpu.feti.large import FetiSolverSparse, assemble_qp_sparse
from permon_tpu.feti.solve import FetiOptions
from permon_tpu.parallel import make_mesh, shard_qp_sparse

COLLECTIVES = ("all-reduce", "all-gather", "all-to-all",
               "collective-permute", "reduce-scatter")


def census(hlo: str):
    out = {}
    for op in COLLECTIVES:
        # op definitions look like:  %all-reduce.3 = f64[...] all-reduce(
        n = len(re.findall(r"\s" + re.escape(op) + r"[\.\d]*\(", hlo))
        if n:
            out[op] = n
    return out


def main():
    prob = build_sparse((16,) * 3, (2,) * 3)
    report = {"dofs": int(prob.n_global), "ns": int(prob.ns), "meshes": {}}
    for ndev in (2, 4, 8):
        mesh = make_mesh(ndev)
        opts = FetiOptions(gluing="nonred", coarse="sparse", mesh=mesh,
                           deterministic=True)
        qp, kplus, NB, _ = assemble_qp_sparse(prob, opts)
        qp, kplus, _ = shard_qp_sparse(qp, kplus, mesh)
        lam = jnp.ones(qp.BE.m_dual)

        # one dual operator application F = B K+ B'
        fn = jax.jit(lambda B, kp, v: B.mv(kp.mv(B.rmv(v))))
        hlo_f = fn.lower(qp.BE, kplus, lam).compile().as_text()
        f_census = census(hlo_f)

        # the one-dispatch warm executable (dual solve + post + reassembly)
        solver = FetiSolverSparse(prob, opts)
        solver._ensure_pf()
        tolr = Tolerances(rtol=1e-6)
        run = solver._fast_fn(tolr)
        l2g_c, real, counts_g = solver._reassembly_tables(prob, qp.BE.nl)
        kplus_lean, corr = solver.fast_args()
        hlo_s = run.lower(
            solver.qp, kplus_lean, corr, solver._pf,
            solver.qp.b, l2g_c, real, counts_g,
        ).compile().as_text()
        s_census = census(hlo_s)

        # sanity: one psum per F application; the while_loop reuses ONE
        # all-reduce instruction for every iteration, so the full solve
        # carries only a handful (F apply + d build + reassembly + e = R'b)
        assert f_census.get("all-reduce", 0) <= 2, f_census
        assert not any(k for k in f_census if k != "all-reduce"), f_census

        report["meshes"][str(ndev)] = {
            "F_apply": f_census,
            "warm_executable": s_census,
            "m_dual": int(qp.BE.m_dual),
            "psum_bytes_per_iteration": int(qp.BE.m_dual) * 8,
        }
        print(f"ndev={ndev}: F apply {f_census}, warm executable {s_census}, "
              f"psum payload {int(qp.BE.m_dual) * 8} B/iteration", flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "comm_audit.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
