"""FETI tutorial ex1 — 1-D Poisson by TFETI (reference: src/tutorials/feti/ex1.c).

-u'' = sin(pi x) on [0,1], homogeneous Dirichlet, ns subdomains with ne
elements each; element stiffness [[1,-1],[-1,1]], load sin((g+1/2)h pi)h^2/2
per element end.  Dirichlet enforced by constraint rows (TFETI) by default.

Reference parity target (feti/output/ex1_1.out, nsize 4, -ne 7):
CONVERGED_RTOL in 1 iteration (projected dual CG);
the SMALXE variant (-project 0 -qps_smalxe_rho 1e1 -dual_qp_E_orth_type gs):
16 iterations (ex1_smalxe_orth_dual_qp_E_orth_type-gs.out).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(ns: int = 4, ne: int = 7):
    from permon_tpu.feti import FetiProblem
    from permon_tpu.feti.assembly import decompose_rhs_by_multiplicity

    nl = ne + 1
    ndofs = ns * ne + 1
    h = 1.0 / (ns * ne)
    K = np.zeros((ns, nl, nl))
    b = np.zeros((ns, nl))
    l2g = np.zeros((ns, nl), dtype=np.int64)
    for s in range(ns):
        for i in range(ne):
            K[s, i : i + 2, i : i + 2] += np.array([[1.0, -1.0], [-1.0, 1.0]])
            load = np.sin((s * ne + i + 0.5) * h * 3.14159) * 0.5 * h * h
            b[s, i] += load
            b[s, i + 1] += load
        l2g[s] = s * ne + np.arange(nl)
    dirichlet = np.array([0, ndofs - 1])
    # the reference assembles the global rhs (MATIS) and re-splits it by
    # 1/multiplicity (QPTMatISToBlockDiag); match that decomposition
    b = decompose_rhs_by_multiplicity(b, l2g)
    return FetiProblem(K_blocks=K, b_loc=b, l2g=l2g, dirichlet=dirichlet)


def main(ns=4, ne=7, project=True, view=True, **kw):
    from permon_tpu.core.convergence import Tolerances
    from permon_tpu.feti import FetiOptions, feti_solve
    from permon_tpu.solvers.smalxe import SMALXEOptions
    from permon_tpu.viewers import view_convergence, view_kkt

    prob = build(ns, ne)
    opts = FetiOptions(project=project, **kw)
    res = feti_solve(prob, opts=opts)
    if view:
        print(view_convergence(res.result))
        print(view_kkt(res.qp, res.u_decomposed, lambda_E=res.solution.lambda_E))
        from permon_tpu.core.convergence import REASON_NAMES

        print(
            f"PERMON FETI {REASON_NAMES[int(res.result.reason)]} in "
            f"{int(res.result.iterations)} iteration"
        )  # the reference example's closing line (feti/ex1.c:99)
    return prob, res


if __name__ == "__main__":
    main()
