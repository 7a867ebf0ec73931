"""TFETI contact (semicoercive obstacle) problem — the crown-jewel pipeline.

The 1-D obstacle problem of tutorial ex1 (-u'' = -30, u(0)=u(1)=0,
u >= sin(4 pi x - pi/6)/2 - 2), solved by TOTAL-FETI domain decomposition
with the obstacle as linear INEQUALITY constraints (-u <= -lb), exercising
the full contact machinery the reference is built for (PERMON README:3-12;
the pipeline of QPTAllInOne, qptransform.c:2151-2205):

    decomposed QP (singular K blocks, gluing + Dirichlet equalities,
                   obstacle inequalities)
      -> dualize           (dual box lb=0 on the inequality rows,
                            coarse space G = R'B')
      -> homogenize_eq
      -> enforce_eq_by_projector  (P F P, box kept)
      -> SMALXE outer loop with MPRGP inner (SMALBE — the contact solver)

Oracle: the decomposed solution re-assembled over dof copies must match the
serial MPRGP solution of tutorial ex1 on the same grid (which itself matches
the reference's committed expected output digit-for-digit, see
tests/test_mprgp_ex1.py).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(ns: int = 4, ne: int = 25):
    """Decomposed obstacle problem: FetiProblem + (BI, cI) in the decomposed
    space (one inequality row per interior global node, on its owning copy)."""
    from permon_tpu.core.extension import SubdomainExtension
    from permon_tpu.feti import FetiProblem
    from permon_tpu.feti.assembly import decompose_rhs_by_multiplicity

    nl = ne + 1
    n = ns * ne + 1
    h = 1.0 / (n - 1)
    K = np.zeros((ns, nl, nl))
    b = np.zeros((ns, nl))
    l2g = np.zeros((ns, nl), dtype=np.int64)
    for s in range(ns):
        for i in range(ne):
            K[s, i : i + 2, i : i + 2] += np.array([[1.0, -1.0], [-1.0, 1.0]])
            # element load: -15 h^2 to each end, assembling to the serial
            # ex1 rhs b_i = -30 h^2 at interior nodes (ex1.c: -15 h^2 * 2)
            b[s, i] += -15.0 * h * h
            b[s, i + 1] += -15.0 * h * h
        l2g[s] = s * ne + np.arange(nl)
    b[0, 0] = 0.0
    b[-1, -1] = 0.0  # Dirichlet nodes carry no load in ex1
    b = decompose_rhs_by_multiplicity(b, l2g)
    dirichlet = np.array([0, n - 1])
    prob = FetiProblem(K_blocks=K, b_loc=b, l2g=l2g, dirichlet=dirichlet)

    # obstacle on interior nodes: -u_g <= -lb_g on the first owning copy
    lb = np.sin(4 * np.pi * np.arange(n) * h - np.pi / 6.0) / 2 - 2
    rows, cols, vals, cI = [], [], [], []
    owner_seen = np.zeros(n, dtype=bool)  # first owning copy gets the row
    mI = 0
    for s in range(ns):
        for i in range(nl):
            g = l2g[s, i]
            if g in (0, n - 1) or owner_seen[g]:
                continue
            owner_seen[g] = True
            rows.append(mI)
            cols.append(s * nl + i)
            vals.append(-1.0)
            cI.append(-lb[g])
            mI += 1
    BI = SubdomainExtension.from_coo(
        np.array(rows), np.array(cols), np.array(vals), m=mI, ns=ns, nl=nl
    )
    return prob, BI, np.array(cI), lb


def main(ns: int = 4, ne: int = 25, view: bool = True, throughput: bool = False):
    """``throughput=True`` runs the SAME SMALBE pipeline with the dual
    iteration in scaled-leaf space (feti/leafqp.py): the stacked [B_gluing;
    B_obstacle] extension operator, explicit per-block K+ inverses, and box
    projections acting on leaf copies — identical iteration counts, batched
    einsum applies instead of per-nnz gathers."""
    from permon_tpu.feti import FetiOptions
    from permon_tpu.feti.solve import feti_solve
    from permon_tpu.viewers import view_convergence_smalxe

    prob, BI, cI, lb = build(ns, ne)
    opts = FetiOptions(gluing="nonred", throughput=throughput)
    r = feti_solve(prob, opts, BI=BI, cI=cI)
    x_global, res, sol = r.x_global, r.result, r.solution

    if view:
        print(view_convergence_smalxe(res))
        gap = x_global - lb
        print(f"active contact nodes: {(gap < 1e-8).sum()} of {n_nodes(ns, ne)}")
    return x_global, res, sol


def n_nodes(ns: int, ne: int) -> int:
    return ns * ne + 1


if __name__ == "__main__":
    main()
