"""AOT memory + communication audit of the 10M-DOF north-star layout.

BASELINE.json's north star is a 10M-dof 3-D TFETI problem on a multi-chip
mesh.  Real multi-chip hardware is not reachable from this environment, so
this script produces the closest obtainable evidence that the layout WORKS
(VERDICT r4 missing #1 / weak #4):

1. assembles the REAL index-side problem at 215^3 cells (10.03M dofs,
   512 subdomains) on the host — l2g, gluing tables, nullspace, sparse
   coarse — while the numeric band factors stay ``ShapeDtypeStruct``
   avatars of the exact production shapes
   (``assemble_qp_sparse(abstract_factors=True)``);
2. shards everything over a virtual 8-device mesh exactly as production
   (``shard_qp_sparse`` — avatar-aware since round 5) and AOT-compiles the
   one-dispatch warm-solve executable (``make_fast_solve_fn``);
3. records ``compiled.memory_analysis()`` — PER-DEVICE argument/temp/
   output bytes — an analytic component breakdown, and a collective census
   of the compiled HLO at the REAL 10M shape (the round-4 comm audit ran
   at 4,913 dofs; collective COUNT is shape-independent, this pins it);
4. states the verdict: what per-device HBM the layout needs and hence the
   smallest v5e (16 GB) mesh that fits.

Usage: python scripts/memaudit.py [ncells] [grid_per_axis] [ndev]
Writes scripts/memaudit.json.
"""

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np

COLLECTIVES = (
    "all-reduce", "all-gather", "reduce-scatter", "all-to-all",
    "collective-permute",
)


def census(hlo: str):
    out = {}
    for op in COLLECTIVES:
        n = len(re.findall(r"\s" + re.escape(op) + r"[\.\d]*\(", hlo))
        if n:
            out[op] = n
    return out


def main(ncells=215, g=8, ndev=8):
    import time

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from examples.feti_large import build_sparse
    from permon_tpu.core.convergence import Tolerances
    from permon_tpu.feti.large import (
        assemble_qp_sparse,
        build_sparse_pf,
        make_fast_solve_fn,
    )
    from permon_tpu.feti.solve import FetiOptions
    from permon_tpu.parallel import make_mesh
    from permon_tpu.parallel.dist import shard_qp_sparse

    out = {"ncells": ncells, "grid": g, "ndev": ndev}
    t0 = time.time()
    prob = build_sparse((ncells,) * 3, (g,) * 3)
    out["dofs"] = int(prob.n_global)
    out["ns"] = int(prob.ns)
    print(f"host index assembly: {prob.n_global} dofs, {prob.ns} subdomains "
          f"({time.time()-t0:.0f} s)", flush=True)

    mesh = make_mesh(ndev)
    opts = FetiOptions(gluing="nonred", coarse="sparse", mesh=mesh,
                      deterministic=True)
    t0 = time.time()
    qp, kplus, NB, _ = assemble_qp_sparse(
        prob, opts, kplus_dtype=jnp.float32, kplus_refine=2,
        abstract_factors=True,
    )
    qp, kplus_full, _ = shard_qp_sparse(qp, kplus, mesh)
    # factors declared ONCE (see make_fast_solve_fn): lean + correction
    corr = kplus_full.op.replace(base=None)
    kplus_lean = kplus_full.replace(op=None)
    pf = build_sparse_pf(qp, opts)
    nb = kplus_full.Dinv.shape[0]
    nlp = qp.BE.nl
    m = qp.BE.m_dual
    out.update(NB=int(NB), nb=int(nb), nlp=int(nlp), m_dual=int(m),
               k_coarse=int(qp.R.shape[1]))
    print(f"assembled (abstract factors): NB={NB} nb={nb} nlp={nlp} "
          f"m_dual={m} k={qp.R.shape[1]} ({time.time()-t0:.0f} s)",
          flush=True)

    # reassembly tables (FetiSolverSparse._reassembly_tables inline)
    from jax.sharding import NamedSharding, PartitionSpec as P

    ng = prob.n_global
    l2g_pad = np.full((prob.ns, nlp), -1, dtype=np.int64)
    l2g_pad[:, : prob.nl] = prob.l2g
    flat = l2g_pad.reshape(-1)
    realm = flat >= 0
    counts = np.maximum(
        np.bincount(flat[realm], minlength=ng).astype(np.float64), 1.0
    )
    put = lambda x, *s: jax.device_put(x, NamedSharding(mesh, P(*s)))
    axes = tuple(mesh.axis_names)
    l2g_c = put(np.where(realm, flat, ng).astype(np.int32), axes)
    real_mask = put(realm, axes)
    counts_g = put(counts)

    run = make_fast_solve_fn(opts, Tolerances(rtol=1e-5), 1, ng)
    t0 = time.time()
    lowered = jax.jit(run).lower(
        qp, kplus_lean, corr, pf, qp.b, l2g_c, real_mask, counts_g
    )
    print(f"lowered ({time.time()-t0:.0f} s)", flush=True)
    t0 = time.time()
    compiled = lowered.compile()
    out["compile_s"] = round(time.time() - t0, 1)
    print(f"compiled ({out['compile_s']} s)", flush=True)

    ma = compiled.memory_analysis()
    gib = lambda x: round(x / 2**30, 3)
    out["per_device"] = {
        "argument_GiB": gib(ma.argument_size_in_bytes),
        "temp_GiB": gib(ma.temp_size_in_bytes),
        "output_GiB": gib(ma.output_size_in_bytes),
        "total_GiB": gib(ma.argument_size_in_bytes + ma.temp_size_in_bytes
                         + ma.output_size_in_bytes),
    }
    print("per-device:", out["per_device"], flush=True)

    # analytic component breakdown (bytes per device)
    ns = prob.ns
    comp = {
        "band_factors_f32": 2 * nb * ns * NB * NB * 4 // ndev,
        # the regularization is a rank-k correction sharing the ORIGINAL
        # stencil (core/dia.RegularizedBlockDia) — no second stencil copy
        "reg_correction_f64": int(np.prod(corr.q.shape)) * 8 // ndev,
        "stencil_K_f64": int(np.prod(qp.A.data.shape)) * 8 // ndev,
        "extension_tables": sum(
            int(np.prod(t.shape)) * t.dtype.itemsize
            for t in (qp.BE.rows, qp.BE.cols, qp.BE.vals, qp.BE.gBt_rows,
                      qp.BE.gBt_vals)
            if t is not None
        ) // ndev,
        "primal_vec_f64": ns * nlp * 8 // ndev,
        "dual_vec_f64_each": m * 8,  # replicated
        "reassembly_counts_f64": ng * 8,  # replicated
    }
    out["components_MiB_per_device"] = {
        k: round(v / 2**20, 1) for k, v in comp.items()
    }
    print("components (MiB/device):", out["components_MiB_per_device"],
          flush=True)

    hlo = compiled.as_text()
    out["collectives"] = census(hlo)
    out["hlo_bytes"] = len(hlo)
    print("collectives:", out["collectives"], flush=True)

    need = ma.argument_size_in_bytes + ma.temp_size_in_bytes
    hbm = 16 * 2**30
    out["fits_8x_v5e_16GiB"] = bool(need <= 0.9 * hbm)
    out["min_v5e_devices_est"] = int(np.ceil(
        (need * ndev) / (0.9 * hbm)
    ))
    print(f"verdict: per-device {gib(need)} GiB -> "
          f"{'FITS' if out['fits_8x_v5e_16GiB'] else 'does NOT fit'} "
          f"8x v5e; est. min v5e chips {out['min_v5e_devices_est']}",
          flush=True)

    # one file, keyed per decomposition, so coarse/fine-grid audits coexist
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "memaudit.json")
    combined = {}
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        combined = prev if all(k.startswith("grid_") for k in prev) else {}
    combined[f"grid_{g}x{g}x{g}"] = out
    with open(path, "w") as f:
        json.dump(combined, f, indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    nc = int(sys.argv[1]) if len(sys.argv) > 1 else 215
    g = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    nd = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    main(nc, g, nd)
