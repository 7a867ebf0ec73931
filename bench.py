"""Benchmark driver — prints ONE JSON line with the headline metric.

Headline: SpMV throughput in GnnZ/s on one chip (north star >= 5 GnnZ/s/chip,
see BASELINE.json), measured on a 3-D 7-point Laplacian in the library's DIA
format — the kernel at the bottom of every PERMON-style hot loop (MPRGP /
SMALXE / FETI dual applications are 1-2 SpMV + dots per iteration).

Timing methodology (the axon tunnel both memoizes identical executions and
returns from block_until_ready before remote compute finishes, so naive
python-loop timing is wrong in BOTH directions):
- the SpMV is chained on-device inside one jitted lax.fori_loop (data
  dependency step-to-step, nothing to memoize),
- completion is forced by fetching a scalar reduction of the result to host,
- the reported time is the MARGINAL cost between two step counts of the same
  executable, cancelling dispatch latency, compile time, and tunnel RTT.
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


_BENCH_SALT = [0]

#: incrementally-filled result; emitted by _emit() at the end OR from the
#: SIGTERM/SIGINT handler — if the driver kills a tunnel-degraded run, the
#: metrics collected so far still make it into BENCH_r{N}.json
RESULT = {
    "metric": "spmv_throughput",
    "value": None,
    "unit": "GnnZ/s/chip",
    "vs_baseline": None,
    "secondary": {},
}
_EMITTED = [False]


def _emit():
    if _EMITTED[0]:
        return
    _EMITTED[0] = True
    out = dict(RESULT)
    if out["value"] is None:
        out["value"] = 0.0
        out["vs_baseline"] = 0.0
        out["secondary"] = {**out["secondary"], "incomplete": True}
    print(json.dumps(out))
    sys.stdout.flush()


def _install_emit_on_kill():
    import signal

    def handler(signum, frame):
        RESULT["secondary"]["killed_by_signal"] = int(signum)
        _emit()
        raise SystemExit(1)

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, handler)
        except (ValueError, OSError):
            pass


def _marginal_mv_time(mv, x0, lo=1000, hi=3000, reps=3):
    """Marginal per-apply seconds of mv chained on-device (see module doc).

    Each timed execution gets a unique input (tunnel executions are memoized
    by content); min-of-reps at each step count rejects tunnel contention
    noise before taking the marginal."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(x, steps):
        return jax.lax.fori_loop(0, steps, lambda i, v: mv(v) + 1e-30, x)

    def timed(steps):
        best = float("inf")
        for _ in range(reps):
            _BENCH_SALT[0] += 1
            x = x0 * (1.0 + 1e-6 * _BENCH_SALT[0])
            t0 = time.perf_counter()
            _ = float(jnp.sum(chain(x, steps)))
            best = min(best, time.perf_counter() - t0)
        return best

    _ = float(jnp.sum(chain(x0, 5)))  # compile + warm
    return max((timed(hi) - timed(lo)) / (hi - lo), 1e-12)


def main():
    import jax
    import jax.numpy as jnp

    import permon_tpu as pt
    from permon_tpu.core.dia import Dia

    _install_emit_on_kill()
    sec = RESULT["secondary"]

    dev = jax.devices()[0]
    nx = 64  # 262144 dofs, ~1.8M nnz
    a = build_laplacian_3d(nx)
    n = a.shape[0]
    nnz = a.nnz

    # throughput benchmark runs in f32 (bandwidth-bound; parity solves use
    # f64); the operator is scaled by 1/12 (= 1/lambda_max) so the chained
    # iterates stay bounded
    d64 = Dia.from_scipy(a)
    dia = d64.replace(data=(d64.data / 12.0).astype(jnp.float32))
    x0 = jnp.ones(n, dtype=jnp.float32)

    per = _marginal_mv_time(dia.mv, x0)
    gnnzs_dia = nnz / per / 1e9

    print(
        f"secondary: dia/xla {gnnzs_dia:.1f} GnnZ/s "
        f"({per * 1e6:.1f} us/mv, device={dev.device_kind})",
        file=sys.stderr,
    )
    # the XLA DIA lowering measures at HBM roofline; the former Pallas DIA
    # kernel was removed round 3 (12% slower than the lowering it replaced —
    # decision in PARITY.md)
    gnnzs = gnnzs_dia
    baseline = 5.0  # GnnZ/s/chip north-star from BASELINE.json
    RESULT["value"] = round(gnnzs, 3)
    RESULT["vs_baseline"] = round(gnnzs / baseline, 3)
    sec["dia_xla_gnnzs"] = round(gnnzs_dia, 3)

    # unstructured SpMV: the same Laplacian RCM-reordered — row-varying
    # column offsets defeat the DIA format (ndiag explodes), exactly the
    # shape of a real unstructured-mesh FEM matrix; SELL (core/sell.py) is
    # the gather-scheduled Pallas kernel make_operator picks for it
    from scipy.sparse.csgraph import reverse_cuthill_mckee
    from permon_tpu.core.sell import SEll

    perm = reverse_cuthill_mckee(a, symmetric_mode=True)
    ar = (a[perm][:, perm] / 12.0).tocsr()
    rep = {}
    sell = SEll.from_scipy(ar, symmetric=True, report=rep)
    sell = sell.replace(V=sell.V.astype(jnp.float32))
    per_s = _marginal_mv_time(sell.mv, x0, lo=300, hi=900)
    gnnzs_sell = nnz / per_s / 1e9
    print(
        f"secondary: sell/unstructured {gnnzs_sell:.1f} GnnZ/s "
        f"({per_s * 1e6:.1f} us/mv, slot efficiency {rep['efficiency']:.2f}, "
        f"win {rep['win']})",
        file=sys.stderr,
    )
    sec["sell_unstructured_gnnzs"] = round(gnnzs_sell, 3)
    sec["sell_slot_efficiency"] = round(rep["efficiency"], 3)
    sec["sell_win"] = rep["win"]

    # secondary: fully-jitted MPRGP solve on the ex1 obstacle problem
    # (fixed 500-iteration budget, whole solve = one XLA executable); the
    # tridiagonal Hessian uses the DIA production format via make_operator
    sys.path.insert(0, "/root/repo")
    from examples.ex1 import build
    from permon_tpu.qpc.box import BoxConstraint
    import scipy.sparse as sp

    A1, b1, lb1 = build(10000)
    mprgp_metrics = {}
    for dt_name, dt in (
        ("f64", jnp.float64),
        ("mixed", None),  # f32 SpMV + f64 dots (core/precision.py)
        ("f32", jnp.float32),
    ):
        op64 = pt.make_operator(sp.csr_matrix(A1))
        if dt_name == "mixed":
            qp = pt.QP(
                A=op64, b=jnp.asarray(b1, jnp.float64),
                box=BoxConstraint.create(len(b1), lb=jnp.asarray(lb1, jnp.float64)),
            ).with_precision("mixed")
        else:
            op1 = op64.replace(data=op64.data.astype(dt))
            qp = pt.QP(
                A=op1, b=jnp.asarray(b1, dt),
                box=BoxConstraint.create(len(b1), lb=jnp.asarray(lb1, dt)),
            )
        solver = pt.make_solver(tol=pt.Tolerances(max_it=500))
        res = solver(qp)  # warm-up/compile
        _ = float(jnp.sum(res.x))

        def run(nrep):
            # unique starting rhs per run: no execution is ever repeated, so
            # the tunnel's content-addressed memoization cannot short-circuit
            _BENCH_SALT[0] += 1
            cur = qp.replace(b=qp.b * (1.0 + 1e-9 * _BENCH_SALT[0]))
            t0 = time.perf_counter()
            for _ in range(nrep):
                res = solver(cur)
                cur = cur.replace(b=cur.b + 1e-14 * res.x)  # data-chained
            _ = float(jnp.sum(cur.b))
            return time.perf_counter() - t0

        t_lo = min(run(2), run(2))
        t_hi = min(run(10), run(10))
        per_solve = max((t_hi - t_lo) / 8, 1e-12)
        mprgp_metrics[f"mprgp_500it_{dt_name}_ms"] = round(per_solve * 1e3, 3)
        sec[f"mprgp_500it_{dt_name}_ms"] = round(per_solve * 1e3, 3)
        print(
            f"secondary: mprgp_ex1_n10000 {dt_name} "
            f"{per_solve * 1e3:.1f} ms / 500 its (fully jitted, chained, marginal)",
            file=sys.stderr,
        )

    # TFETI dual-operator throughput + end-to-end projected dual solve — the
    # hot op / hot loop of every FETI iteration, on a 64-subdomain 3-D
    # Poisson decomposition (f32 throughput path: explicit per-block K+
    # inverses + dense condensed constraint blocks + leaf-space iteration,
    # feti/leaf.py).  Setup (gluing assembly, block factorizations, the
    # coarse projector) runs on the CPU backend — only the three timed
    # executables compile for the TPU, so this is fast enough to run
    # unconditionally.
    feti = sec
    try:
        from examples.feti_ex71 import build as build71
        from permon_tpu.core.convergence import Tolerances
        from permon_tpu.core.linop import Product, Transpose
        from permon_tpu.feti import FetiOptions
        from permon_tpu.feti.leaf import LeafDualOperator, LeafProjector, leaf_cg
        from permon_tpu.feti.solve import assemble_qp, make_blockdiag_kplus
        from permon_tpu.qp.transforms import dualize, ensure_pf, homogenize_eq

        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            prob = build71(cells=(15, 15, 15), grid=(4, 4, 4))
            qp71, Kb, fixed, nbases = assemble_qp(prob, FetiOptions(gluing="nonred"))
            kplus = make_blockdiag_kplus(Kb, fixed, prob, nbases)
            # f32: the throughput-relevant path (v5e has no native f64);
            # explicit per-block inverses (batched GEMV instead of triangular
            # solves: ~200x) + dense condensed blocks (batched einsum instead
            # of per-nnz gathers)
            kplus = kplus.replace(chols=kplus.chols.astype(jnp.float32)).explicitly()
            BE32 = qp71.BE.replace(
                vals=qp71.BE.vals.astype(jnp.float32)
            ).with_dense_blocks()
            dual, _ = dualize(qp71.replace(BE=BE32), kplus=kplus)
            dual = ensure_pf(dual)
            cur, _ = homogenize_eq(dual)
            op_leaf = LeafDualOperator.create(BE32, kplus)
            Pl = LeafProjector.create(
                op_leaf.space, dual.BE, ggt_chol=dual.pf.ggt_chol
            )
            Pl = Pl.replace(  # f32 throughput path (everything else is f32)
                Gl=Pl.Gl.astype(jnp.float32), chol=Pl.chol.astype(jnp.float32),
                weights=Pl.weights.astype(jnp.float32),
            )
            Bl = Pl(op_leaf.space.lift(cur.b.astype(jnp.float32)))

        F = Product((BE32, kplus, Transpose(BE32)))
        # commit everything the timed executables touch to the TPU
        F, op_leaf, Pl, Bl = jax.device_put((F, op_leaf, Pl, Bl), dev)
        lam0 = jax.device_put(jnp.ones(qp71.BE.shape[0], jnp.float32), dev)
        Lam0 = jax.device_put(jnp.ones(BE32.vals.shape, jnp.float32), dev)

        per_f = _marginal_mv_time(
            lambda v: F.mv(v) / jnp.linalg.norm(F.mv(v)), lam0, lo=50, hi=150
        )
        feti["feti_dual_apply_ms"] = round(per_f * 1e3, 4)
        print(
            f"secondary: feti_dual_apply ns={prob.ns} nl={prob.nl} "
            f"({prob.ns * prob.nl} dofs, m={qp71.BE.shape[0]}) "
            f"{per_f * 1e3:.3f} ms/apply",
            file=sys.stderr,
        )

        # leaf-space dual apply: the whole F application with a single
        # static partner gather as index work
        per_l = _marginal_mv_time(
            lambda v: (lambda w: w / (jnp.linalg.norm(w) + 1e-30))(op_leaf.apply(v)),
            Lam0, lo=100, hi=300,
        )
        feti["feti_dual_apply_leaf_ms"] = round(per_l * 1e3, 4)
        print(
            f"secondary: feti_dual_apply_leaf {per_l * 1e3:.3f} ms/apply "
            f"({per_f / per_l:.1f}x vs row-space)",
            file=sys.stderr,
        )

        # end-to-end projected dual solve in leaf space (fixed 25-iteration
        # budget; the whole CG is one executable), data-chained + marginal
        @jax.jit
        def solve_leaf(Bl):
            return leaf_cg(op_leaf, Bl, tol=Tolerances(rtol=0.0, max_it=25),
                           project=Pl).x

        def run_solves(nrep):
            _BENCH_SALT[0] += 1
            cur_b = Bl * (1.0 + 1e-6 * _BENCH_SALT[0])
            t0 = time.perf_counter()
            for _ in range(nrep):
                cur_b = cur_b + 1e-12 * solve_leaf(cur_b)  # data-chained
            _ = float(jnp.sum(cur_b))
            return time.perf_counter() - t0

        _ = float(jnp.sum(solve_leaf(Bl)))  # compile + warm
        t_lo = min(run_solves(2), run_solves(2))
        t_hi = min(run_solves(10), run_solves(10))
        per_solve = max((t_hi - t_lo) / 8, 1e-12)
        feti["feti_leaf_solve_25it_ms"] = round(per_solve * 1e3, 3)
        print(
            f"secondary: feti_leaf_solve 25 its in {per_solve * 1e3:.2f} ms "
            f"(chained, marginal)",
            file=sys.stderr,
        )
    except Exception as e:  # keep the headline metric robust
        feti["feti_error"] = f"{type(e).__name__}: {e}"
        print(f"secondary: feti bench skipped ({type(e).__name__}: {e})", file=sys.stderr)

    # TFETI contact (SMALBE) — row-space vs scaled-leaf dual iteration
    # (feti/leafqp.py): identical iteration counts, the leaf path replaces
    # per-nnz gathers with batched einsums.  Setup (assembly, dualize,
    # projector, spectral estimates) runs on CPU; the whole SMALXE solve is
    # ONE jitted TPU executable, data-chained + marginal.
    try:
        from examples.feti_contact import build as build_contact
        from permon_tpu.feti import FetiOptions
        from permon_tpu.feti.solve import prepare_contact_children
        from permon_tpu.solvers.smalxe import smalxe

        cpu = jax.devices("cpu")[0]
        prob_c, BI_c, cI_c, _lb = build_contact(ns=16, ne=64)
        for thr, prec, key in (
            (False, "f64", "contact_row_ms"),
            (True, "f64", "contact_leaf_ms"),
            # round 4: throughput + precision compose — f32 leaf STATE with
            # promoted fixed-tree f64 dots (counts shift by a few; pinned in
            # tests/test_precision.py)
            (True, "mixed", "contact_leaf_mixed_ms"),
        ):
            with jax.default_device(cpu):
                qp_c, sm_c, _sls = prepare_contact_children(
                    prob_c,
                    FetiOptions(gluing="nonred", throughput=thr,
                                precision=prec),
                    BI_c, cI_c,
                )
            qp_c = jax.device_put(qp_c, dev)

            @jax.jit
            def solve_c(b):
                r = smalxe(qp_c.replace(b=b), opts=sm_c)
                return r.x, r.iterations

            x_w, its = solve_c(qp_c.b)  # compile + warm
            its = int(its)

            def run_c(nrep):
                _BENCH_SALT[0] += 1
                cur_b = qp_c.b * (1.0 + 1e-9 * _BENCH_SALT[0])
                t0 = time.perf_counter()
                for _ in range(nrep):
                    x_, _ = solve_c(cur_b)
                    cur_b = cur_b + 1e-14 * x_  # data-chained
                _ = float(jnp.sum(cur_b))
                return time.perf_counter() - t0

            t_lo = min(run_c(1), run_c(1))
            t_hi = min(run_c(3), run_c(3))
            feti[key] = round(max((t_hi - t_lo) / 2, 1e-12) * 1e3, 2)
            feti[key.replace("_ms", "_its")] = its
            print(
                f"secondary: {key} {feti[key]:.1f} ms ({its} MPRGP its, "
                "one executable, chained, marginal)",
                file=sys.stderr,
            )
    except Exception as e:
        feti["contact_error"] = f"{type(e).__name__}: {e}"
        print(f"secondary: contact bench skipped ({type(e).__name__}: {e})",
              file=sys.stderr)

    # the 1M-dof TFETI north star (101^3, 64 subdomains of 26^3 on ONE
    # chip: f32 band factors + refinement + one f64 primal defect
    # correction).  PERMON_BENCH_LARGE=1 reruns it live (7-40 min depending
    # on tunnel weather); by default the committed on-chip capture from
    # scripts/northstar.py (same chip, this round) is reported, so the
    # headline bench stays within its budget.
    import os as _os

    ns_path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                            "scripts", "northstar.json")
    if _os.environ.get("PERMON_BENCH_LARGE", "0") == "1" or not _os.path.exists(ns_path):
        try:
            import subprocess as _sp

            _sp.run(
                [sys.executable, "-u",
                 _os.path.join("scripts", "northstar.py"), "100", "4"],
                check=True, timeout=3000,
                cwd=_os.path.dirname(_os.path.abspath(__file__)),
            )
        except Exception as e:
            print(f"secondary: live feti_large run failed ({type(e).__name__}: {e})",
                  file=sys.stderr)
    try:
        with open(ns_path) as f:
            ns = json.load(f)
        feti["feti_large_dofs"] = ns["dofs"]
        feti["feti_large_its"] = ns["its"]
        feti["feti_large_first_solve_s"] = ns["total_solve_s"]
        if "resolve_s" in ns:
            feti["feti_large_resolve_s"] = ns["resolve_s"]
        if "resolve_warm_s" in ns:
            # the production (time-stepping) number: reused factors AND a
            # warm fast-path executable — resolve_s still pays that compile
            feti["feti_large_resolve_warm_s"] = ns["resolve_warm_s"]
        if "assembled_residual" in ns:
            feti["feti_large_residual"] = ns["assembled_residual"]
        print(f"secondary: feti_large {ns['dofs']} dofs {ns['its']} its "
              f"first {ns['total_solve_s']} s resolve {ns.get('resolve_s')} s "
              f"resid {ns.get('assembled_residual')}", file=sys.stderr)
    except Exception as e:
        feti["feti_large_error"] = f"{type(e).__name__}: {e}"
        print(f"secondary: feti_large skipped ({type(e).__name__}: {e})",
              file=sys.stderr)

    # the single-chip HBM-limit capture (>= 2M dofs, flat decomposition —
    # scripts/northstar.py 129 9,9,2)
    try:
        p2 = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                           "scripts", "northstar_129_9x9x2.json")
        if _os.path.exists(p2):
            with open(p2) as f:
                n2 = json.load(f)
            feti["feti_2m_dofs"] = n2["dofs"]
            feti["feti_2m_its"] = n2["its"]
            feti["feti_2m_first_solve_s"] = n2["total_solve_s"]
            feti["feti_2m_resolve_warm_s"] = n2.get("resolve_warm_s")
            feti["feti_2m_residual"] = n2.get("assembled_residual")
            print(f"secondary: feti_2m {n2['dofs']} dofs {n2['its']} its "
                  f"first {n2['total_solve_s']} s warm "
                  f"{n2.get('resolve_warm_s')} s resid "
                  f"{n2.get('assembled_residual')}", file=sys.stderr)
    except Exception as e:
        print(f"secondary: feti_2m skipped ({type(e).__name__}: {e})",
              file=sys.stderr)

    # contact at scale through the large path (committed on-chip capture,
    # scripts/northstar_contact.py)
    try:
        nc_path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                                "scripts", "northstar_contact.json")
        if _os.path.exists(nc_path):
            with open(nc_path) as f:
                nc = json.load(f)
            feti["feti_contact_large_dofs"] = nc["dofs"]
            feti["feti_contact_large_its"] = nc["its"]
            feti["feti_contact_large_nmv"] = nc.get("nmv")
            feti["feti_contact_large_resolve_warm_s"] = nc["resolve_warm_s"]
            feti["feti_contact_large_active"] = nc.get("active_nodes")
            print(f"secondary: feti_contact_large {nc['dofs']} dofs "
                  f"{nc['its']} its warm {nc['resolve_warm_s']} s",
                  file=sys.stderr)
            if "smalbe" in nc:
                sm = nc["smalbe"]
                feti["feti_contact_smalbe_outer_its"] = sm["outer_its"]
                feti["feti_contact_smalbe_inner_its"] = sm["inner_its"]
                feti["feti_contact_smalbe_M1_updates"] = sm["M1_updates"]
                feti["feti_contact_smalbe_rho_updates"] = sm["rho_updates"]
                feti["feti_contact_smalbe_resolve_s"] = sm.get("resolve_s")
                print(f"secondary: feti_contact_smalbe (project=0) "
                      f"{sm['outer_its']} outer / {sm['inner_its']} inner "
                      f"its, {sm['M1_updates']} M1 + {sm['rho_updates']} "
                      f"rho updates", file=sys.stderr)
        else:
            feti["feti_contact_large_error"] = "capture missing"
            print("secondary: feti_contact_large CAPTURE MISSING — run "
                  "scripts/northstar_contact.py on the chip and commit "
                  "scripts/northstar_contact.json", file=sys.stderr)
    except Exception as e:
        print(f"secondary: feti_contact_large skipped "
              f"({type(e).__name__}: {e})", file=sys.stderr)

    # 3-D ELASTICITY at scale (the north-star problem class: TFETI
    # elasticity + plane obstacle, scripts/northstar_elasticity.py)
    try:
        ne_path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                                "scripts", "northstar_elasticity.json")
        if _os.path.exists(ne_path):
            with open(ne_path) as f:
                nel = json.load(f)
            lin = nel.get("linear", {})
            feti["feti_elast_dofs"] = nel["dofs"]
            feti["feti_elast_its"] = lin.get("its")
            feti["feti_elast_first_solve_s"] = lin.get("first_solve_s")
            feti["feti_elast_resolve_warm_s"] = lin.get("resolve_warm_s")
            feti["feti_elast_residual"] = lin.get("assembled_residual_free")
            print(f"secondary: feti_elasticity {nel['dofs']} dofs "
                  f"{lin.get('its')} its first {lin.get('first_solve_s')} s "
                  f"warm {lin.get('resolve_warm_s')} s resid "
                  f"{lin.get('assembled_residual_free')}", file=sys.stderr)
            if "contact" in nel:
                ct = nel["contact"]
                feti["feti_elast_contact_inner_its"] = ct["inner_its"]
                feti["feti_elast_contact_active"] = ct["active_nodes"]
                feti["feti_elast_contact_resolve_warm_s"] = ct.get(
                    "resolve_warm_s")
                print(f"secondary: feti_elast_contact {ct['inner_its']} "
                      f"MPRGP its, {ct['active_nodes']} active, warm "
                      f"{ct.get('resolve_warm_s')} s", file=sys.stderr)
            if "smalbe" in nel:
                sm = nel["smalbe"]
                feti["feti_elast_smalbe_outer_its"] = sm["outer_its"]
                feti["feti_elast_smalbe_M1_updates"] = sm["M1_updates"]
                print(f"secondary: feti_elast_smalbe {sm['outer_its']} outer "
                      f"/ {sm['inner_its']} inner its, {sm['M1_updates']} M1 "
                      f"updates", file=sys.stderr)
    except Exception as e:
        print(f"secondary: feti_elasticity skipped "
              f"({type(e).__name__}: {e})", file=sys.stderr)

    _emit()


if __name__ == "__main__":
    main()
