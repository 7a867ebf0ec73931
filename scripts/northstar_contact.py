"""On-chip capture of CONTACT at scale through the large path.

The 3-D Poisson box with a far-face ceiling (examples/feti_large.py
build_obstacle) solved by the sparse-blocks SMALBE pipeline (band K+,
projected box-constrained dual, SMALXE/MPRGP as one executable).  Writes
scripts/northstar_contact.json; bench.py reports it when present.

Usage: python scripts/northstar_contact.py [ncells] [grid]
(default 59^3 = 216,000 dofs, 8 subdomains — sized so the whole capture
stays within a few minutes of chip time.)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(ncells=59, g=2):
    import jax.numpy as jnp

    from examples.feti_large import build_obstacle
    from permon_tpu.core.convergence import Tolerances
    from permon_tpu.feti.large import FetiSolverSparse
    from permon_tpu.feti.solve import FetiOptions

    out = {"ncells": ncells, "grid": g}
    t0 = time.time()
    prob, BI, cI, cap = build_obstacle((ncells,) * 3, (g,) * 3)
    out["dofs"] = int(prob.n_global)
    out["ns"] = int(prob.ns)
    out["m_contact"] = int(BI.shape[0])
    print(f"assembled {out['dofs']} dofs, {prob.ns} subdomains, "
          f"{out['m_contact']} contact rows ({time.time()-t0:.1f} s host)",
          flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "northstar_contact.json")
    t0 = time.time()
    # coarse='sparse' triggers the direct host pf build, so even the first
    # solve runs as the one-dispatch fast executable
    solver = FetiSolverSparse(
        prob, FetiOptions(gluing="nonred", deterministic=True,
                          coarse="sparse"),
        kplus_dtype=jnp.float32, kplus_refine=2, BI=BI, cI=cI,
    )
    r1 = solver.solve(tol=Tolerances(rtol=1e-5))
    t1 = time.time()
    out["first_solve_s"] = round(t1 - t0, 1)
    out["its"] = int(r1.result.iterations)
    out["inner_its"] = int(r1.result.inner_iterations)
    out["nmv"] = int(r1.result.nmv)
    out["reason"] = int(r1.result.reason)
    print(f"contact solve: {out['its']} SMALXE outer / "
          f"{out['inner_its']} MPRGP inner its, {out['nmv']} Hessian mults, "
          f"reason {out['reason']} ({out['first_solve_s']} s incl. factor "
          "+ compiles)", flush=True)
    x1 = np.asarray(r1.x_global)
    out["active_nodes"] = int((x1 >= cap - 1e-4).sum())
    del r1

    ts = []
    for k in range(2):
        t0 = time.time()
        rk = solver.solve(b_loc=prob.b_loc * (1.0 + 1e-3 * (k + 1)),
                          tol=Tolerances(rtol=1e-5))
        ts.append(round(time.time() - t0, 2))
        out["its_resolve"] = int(rk.result.iterations)
        del rk
    out["resolve_s"], out["resolve_warm_s"] = ts
    print(f"re-solves (reused factors): {ts[0]} s (incl. compile), "
          f"warm {ts[1]} s", flush=True)
    x_proj = np.asarray(solver.solve(tol=Tolerances(rtol=1e-5)).x_global)
    del solver

    with open(path, "w") as f:
        json.dump(out, f, indent=1)

    # SMALBE proper (project=False): the augmented-Lagrangian outer loop
    # enforces G lam = 0 itself, so the semi-monotonic M1/rho adaptation
    # actually ITERATES at scale — the projected variant above converges in
    # one outer by construction (its iterates stay in ker G).  CPU CI twin:
    # tests/test_large.py::TestSparseContact::
    # test_smalbe_unprojected_adaptive_twin.
    from permon_tpu.solvers.smalxe import SMALXEOptions

    t0 = time.time()
    solver_al = FetiSolverSparse(
        prob, FetiOptions(gluing="nonred", deterministic=True,
                          coarse="sparse", project=False,
                          smalxe=SMALXEOptions(rtol_E=0.1)),
        kplus_dtype=jnp.float32, kplus_refine=2, BI=BI, cI=cI,
    )
    r2 = solver_al.solve(tol=Tolerances(rtol=1e-5))
    t1 = time.time()
    res2 = r2.result
    out["smalbe"] = {
        "first_solve_s": round(t1 - t0, 1),
        "outer_its": int(res2.iterations),
        "inner_its": int(res2.inner_iterations),
        "nmv": int(res2.nmv),
        "reason": int(res2.reason),
        "M1_updates": int(res2.M1_updates),
        "rho_updates": int(res2.rho_updates),
        "max_dx_vs_projected": float(
            np.abs(np.asarray(r2.x_global) - x_proj).max()
        ),
    }
    print(f"SMALBE (project=0): {out['smalbe']['outer_its']} outer / "
          f"{out['smalbe']['inner_its']} inner its, "
          f"M1 updates {out['smalbe']['M1_updates']}, "
          f"rho updates {out['smalbe']['rho_updates']}, reason "
          f"{out['smalbe']['reason']}, max|dx| vs projected "
          f"{out['smalbe']['max_dx_vs_projected']:.2e} "
          f"({out['smalbe']['first_solve_s']} s)", flush=True)
    del r2
    t0 = time.time()
    r3 = solver_al.solve(b_loc=prob.b_loc * 1.001, tol=Tolerances(rtol=1e-5))
    out["smalbe"]["resolve_s"] = round(time.time() - t0, 2)
    out["smalbe"]["outer_its_resolve"] = int(r3.result.iterations)
    print(f"SMALBE re-solve (reused factors): {out['smalbe']['resolve_s']} s, "
          f"{out['smalbe']['outer_its_resolve']} outer its", flush=True)
    del r3

    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path, flush=True)
    return out


if __name__ == "__main__":
    nc = int(sys.argv[1]) if len(sys.argv) > 1 else 59
    g = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    main(nc, g)
