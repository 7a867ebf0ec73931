"""FETI tutorial ex71 — 3-D Poisson on a DMDA-style structured grid
(reference: src/tutorials/feti/ex71.c, adapted from PETSc KSP ex71).

Q1 hexahedral elements with the reference's hardcoded element stiffness,
uniform grid of cells[0] x cells[1] x cells[2] cells, b = 1 everywhere,
Dirichlet on the x=0 face enforced by symmetric zeroing with unit diagonal
(MatZeroRowsColumnsIS on the MATIS operator, ex71.c:283-327).

Subdomains = a DMDA-like (m, n, p) process grid; per-axis node counts are
M//m with the remainder going to the first ranks, cell c owned by the rank
owning node c; subdomain local dofs = nodes of owned cells (owned + one
upper ghost layer), padded to a common size with l2g = -1.

Reference parity targets (feti/output/ex71_1_feti_gluing_type-*.out,
nsize 6, -cells 7,8,9): CONVERGED_RTOL in 9 (full), 16 (nonred),
9 (orth) iterations.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the reference's hardcoded Q1 element stiffness (lexicographic node order)
POISS_3D_EMAT = np.array([
    [ 1/3,    0,     0,    -1/12,  0,    -1/12, -1/12, -1/12],
    [ 0,      1/3,  -1/12,  0,    -1/12,  0,    -1/12, -1/12],
    [ 0,     -1/12,  1/3,   0,    -1/12, -1/12,  0,    -1/12],
    [-1/12,   0,     0,     1/3,  -1/12, -1/12, -1/12,  0   ],
    [ 0,     -1/12, -1/12, -1/12,  1/3,   0,     0,    -1/12],
    [-1/12,   0,    -1/12, -1/12,  0,     1/3,  -1/12,  0   ],
    [-1/12,  -1/12,  0,    -1/12,  0,    -1/12,  1/3,   0   ],
    [-1/12,  -1/12, -1/12,  0,    -1/12,  0,     0,     1/3 ],
])


def _axis_split(M, m):
    """Node counts per rank along one axis (DMDA: remainder to first ranks)."""
    base = M // m
    return [base + (1 if i < M % m else 0) for i in range(m)]


def build(cells=(7, 8, 9), grid=(1, 2, 3), dirichlet_diag="assembled"):
    """Build the decomposed problem.

    dirichlet_diag: how MatZeroRowsColumns sets local diagonals on shared
    fixed dofs — 'assembled': each copy gets diag/multiplicity so the
    assembled diagonal is 1.0; 'copy': each copy gets 1.0.
    """
    from permon_tpu.feti import FetiProblem
    from permon_tpu.feti.assembly import decompose_rhs_by_multiplicity

    cx, cy, cz = cells
    m, n, p = grid
    Mx, My, Mz = cx + 1, cy + 1, cz + 1  # node counts
    lx, ly, lz = _axis_split(Mx, m), _axis_split(My, n), _axis_split(Mz, p)
    ox = np.concatenate([[0], np.cumsum(lx)])
    oy = np.concatenate([[0], np.cumsum(ly)])
    oz = np.concatenate([[0], np.cumsum(lz)])

    def gid(i, j, k):
        return (k * My + j) * Mx + i

    ns = m * n * p
    subs = []
    for kp in range(p):
        for jn in range(n):
            for im in range(m):
                # owned cells: cells whose lower corner node is owned
                cxs = range(ox[im], min(ox[im + 1], cx))
                cys = range(oy[jn], min(oy[jn + 1], cy))
                czs = range(oz[kp], min(oz[kp + 1], cz))
                nodes = {}
                cells_list = []
                for kk in czs:
                    for jj in cys:
                        for ii in cxs:
                            corner = []
                            for dz in (0, 1):
                                for dy in (0, 1):
                                    for dx in (0, 1):
                                        g = gid(ii + dx, jj + dy, kk + dz)
                                        if g not in nodes:
                                            nodes[g] = len(nodes)
                                        corner.append(nodes[g])
                            cells_list.append(corner)
                subs.append((nodes, cells_list))

    nl = max(len(nodes) for nodes, _ in subs)
    K = np.zeros((ns, nl, nl))
    b = np.zeros((ns, nl))
    l2g = np.full((ns, nl), -1, dtype=np.int64)
    for s, (nodes, cells_list) in enumerate(subs):
        for g, i in nodes.items():
            l2g[s, i] = g
        for corner in cells_list:
            idx = np.array(corner)
            K[s][np.ix_(idx, idx)] += POISS_3D_EMAT
        # padding: unit diagonal so the block stays factorizable
        for i in range(len(nodes), nl):
            K[s, i, i] = 1.0
        b[s, : len(nodes)] = 1.0  # global rhs = 1 at every node

    # multiplicity of each global dof (for the Dirichlet diagonal convention)
    mult = np.zeros(Mx * My * Mz)
    for s in range(ns):
        real = l2g[s] >= 0
        np.add.at(mult, l2g[s][real], 1.0)

    # Dirichlet x=0 face: zero rows/cols, unit assembled diagonal, rhs kept
    fixed_g = {gid(0, j, k) for j in range(My) for k in range(Mz)}
    for s in range(ns):
        for i in range(nl):
            g = l2g[s, i]
            if g >= 0 and int(g) in fixed_g:
                K[s][i, :] = 0.0
                K[s][:, i] = 0.0
                K[s][i, i] = (
                    1.0 / mult[g] if dirichlet_diag == "assembled" else 1.0
                )

    b = decompose_rhs_by_multiplicity(b, l2g)
    return FetiProblem(
        K_blocks=K, b_loc=b, l2g=l2g, dirichlet=np.array([], dtype=np.int64)
    )


def main(cells=(7, 8, 9), grid=(1, 2, 3), gluing="full", view=True, **kw):
    from permon_tpu.feti import FetiOptions, feti_solve
    from permon_tpu.viewers import view_convergence

    prob = build(cells, grid)
    res = feti_solve(prob, opts=FetiOptions(gluing=gluing, **kw))
    if view:
        print(view_convergence(res.result))
    return prob, res


if __name__ == "__main__":
    main()
