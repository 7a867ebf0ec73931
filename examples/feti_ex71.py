"""FETI tutorial ex71 — 3-D Poisson on a DMDA-style structured grid
(reference: src/tutorials/feti/ex71.c, adapted from PETSc KSP ex71).

Q1 hexahedral elements with the reference's hardcoded element stiffness,
uniform grid of cells[0] x cells[1] x cells[2] cells, b = 1 everywhere,
Dirichlet on the x=0 face enforced by symmetric zeroing with unit diagonal
(MatZeroRowsColumnsIS on the MATIS operator, ex71.c:283-327).

Subdomains = a DMDA (m, n, p) process grid; per-axis node counts are M//m
with the remainder going to the first ranks, and element c is owned by the
rank owning its UPPER corner node c+1 (the DMDAGetElements convention — each
subdomain's local space is its owned nodes plus one LOWER ghost layer).
Getting this ownership side right is what makes the dual systems match the
reference digit-for-digit; the lower-corner convention produces dual rhs
norms ~27% larger and full/orth counts of 14 instead of 9.

Reference parity targets (feti/output/ex71_1_feti_gluing_type-*.out,
nsize 6, -cells 7,8,9, DMDA grid (1,2,3)): CONVERGED_RTOL in 16 (nonred),
9 (full), 9 (orth) iterations with ||BE*x|| = 1.73e-04 / 1.41e-04.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def q1_elasticity_emat(dim: int, lam: float = 1.0, mu: float = 1.0) -> np.ndarray:
    """Q1 isotropic elasticity element stiffness on the unit cube, nodes in
    lexicographic order, dofs blocked per node, 2-point Gauss quadrature.

    With lam = mu = 1 this reproduces the reference's hardcoded
    elast_{1,2,3}D_emat tables (ex71.c:26-99) to machine precision."""
    import itertools

    gp = np.array([-1.0, 1.0]) / np.sqrt(3.0) * 0.5 + 0.5
    nodes = [tuple(reversed(t)) for t in itertools.product((0, 1), repeat=dim)]
    nn = len(nodes)
    nstr = {1: 1, 2: 3, 3: 6}[dim]
    D = np.zeros((nstr, nstr))
    if dim == 1:
        D[0, 0] = lam + 2 * mu
    else:
        D[:dim, :dim] = lam
        for d in range(dim):
            D[d, d] = lam + 2 * mu
        for d in range(dim, nstr):
            D[d, d] = mu
    K = np.zeros((nn * dim, nn * dim))
    for q in itertools.product(range(2), repeat=dim):
        x = np.array([gp[qi] for qi in q])
        dN = np.zeros((nn, dim))
        for a, nd in enumerate(nodes):
            for d in range(dim):
                prod = 1.0
                for e in range(dim):
                    val = x[e] if nd[e] == 1 else 1.0 - x[e]
                    der = 1.0 if nd[e] == 1 else -1.0
                    prod *= der if e == d else val
                dN[a, d] = prod
        B = np.zeros((nstr, nn * dim))
        for a in range(nn):
            if dim == 1:
                B[0, a] = dN[a, 0]
            elif dim == 2:
                B[0, a * 2] = dN[a, 0]
                B[1, a * 2 + 1] = dN[a, 1]
                B[2, a * 2] = dN[a, 1]
                B[2, a * 2 + 1] = dN[a, 0]
            else:
                B[0, a * 3] = dN[a, 0]
                B[1, a * 3 + 1] = dN[a, 1]
                B[2, a * 3 + 2] = dN[a, 2]
                B[3, a * 3] = dN[a, 1]
                B[3, a * 3 + 1] = dN[a, 0]
                B[4, a * 3 + 1] = dN[a, 2]
                B[4, a * 3 + 2] = dN[a, 1]
                B[5, a * 3] = dN[a, 2]
                B[5, a * 3 + 2] = dN[a, 0]
        K += (1.0 / 2**dim) * B.T @ D @ B
    return K


def q1_poisson_emat(dim: int) -> np.ndarray:
    """Q1 Poisson element stiffness on the unit cube (lexicographic node
    order, 2-point Gauss quadrature): K = sum_q w dN dN'.  For dim=3 this
    reproduces the reference's hardcoded poiss_3D_emat table (ex71.c) to
    machine precision; dim 1/2 generate the poiss_{1,2}D_emat analogs."""
    import itertools

    gp = np.array([-1.0, 1.0]) / np.sqrt(3.0) * 0.5 + 0.5
    nodes = [tuple(reversed(t)) for t in itertools.product((0, 1), repeat=dim)]
    nn = len(nodes)
    K = np.zeros((nn, nn))
    for q in itertools.product(range(2), repeat=dim):
        x = np.array([gp[qi] for qi in q])
        dN = np.zeros((nn, dim))
        for a, nd in enumerate(nodes):
            for d in range(dim):
                prod = 1.0
                for e in range(dim):
                    val = x[e] if nd[e] == 1 else 1.0 - x[e]
                    der = 1.0 if nd[e] == 1 else -1.0
                    prod *= der if e == d else val
                dN[a, d] = prod
        K += (1.0 / 2**dim) * dN @ dN.T
    return K


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


def build(cells=(7, 8, 9), grid=(1, 2, 3), dirichlet_diag="assembled", pde="poisson"):
    """Build the decomposed problem.

    dirichlet_diag: how MatZeroRowsColumns sets local diagonals on shared
    fixed dofs — 'assembled': each copy gets diag/multiplicity so the
    assembled diagonal is 1.0; 'copy': each copy gets 1.0; 'owner': the
    lowest-rank copy gets 1.0 and other copies get a zero row/column (their
    blocks turn singular with e_i null vectors — pair with
    FetiOptions(nullspace='numeric')).
    """
    from permon_tpu.feti.matis import MatIS, feti_problem_from_matis, matis_ctx

    # reference convention: cells[n] = 0 for n >= dim (ex71.c:149); accept
    # 1-/2-tuples and pad so 2-D and 1-D variants (-dim 1/2) work too
    cells = tuple(cells) + (0,) * (3 - len(cells))
    grid = tuple(grid) + (1,) * (3 - len(grid))
    dim = sum(1 for c in cells if c > 0)
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
                # owned cells: cells whose UPPER corner node is owned
                # (DMDAGetElements; first rank also takes cell 0, last rank
                # ends at the domain boundary)
                cxs = range(ox[im] - 1 if im > 0 else 0, ox[im + 1] - 1 if im < m - 1 else cx)
                cys = (range(oy[jn] - 1 if jn > 0 else 0, oy[jn + 1] - 1 if jn < n - 1 else cy)
                       if cy > 0 else range(1))
                czs = (range(oz[kp] - 1 if kp > 0 else 0, oz[kp + 1] - 1 if kp < p - 1 else cz)
                       if cz > 0 else range(1))
                dzr = (0, 1) if cz > 0 else (0,)
                dyr = (0, 1) if cy > 0 else (0,)
                nodes = {}
                cells_list = []
                for kk in czs:
                    for jj in cys:
                        for ii in cxs:
                            corner = []
                            for dz in dzr:
                                for dy in dyr:
                                    for dx in (0, 1):
                                        g = gid(ii + dx, jj + dy, kk + dz)
                                        if g not in nodes:
                                            nodes[g] = len(nodes)
                                        corner.append(nodes[g])
                            cells_list.append(corner)
                subs.append((nodes, cells_list))

    dof = dim if pde == "elasticity" else 1
    if pde == "elasticity":
        emat = q1_elasticity_emat(dim)
    else:
        emat = POISS_3D_EMAT if dim == 3 else q1_poisson_emat(dim)
    nn_max = max(len(nodes) for nodes, _ in subs)
    nl = nn_max * dof
    K = np.zeros((ns, nl, nl))
    l2g = np.full((ns, nl), -1, dtype=np.int64)
    coords = np.zeros((ns, nn_max, 3))
    for s, (nodes, cells_list) in enumerate(subs):
        for g, i in nodes.items():
            for c in range(dof):
                l2g[s, i * dof + c] = g * dof + c
            gi = g % Mx
            gj = (g // Mx) % My
            gk = g // (Mx * My)
            coords[s, i] = (gi, gj, gk)
        for corner in cells_list:
            idx = np.concatenate([[n * dof + c for c in range(dof)] for n in corner])
            K[s][np.ix_(idx, idx)] += emat
        # padding: unit diagonal so the block stays factorizable
        for i in range(len(nodes) * dof, nl):
            K[s, i, i] = 1.0

    # multiplicity of each global dof (for the Dirichlet diagonal convention)
    n_global = Mx * My * Mz * dof
    mult = matis_ctx(l2g, n_global).multiplicity

    # Dirichlet x=0 face: zero rows/cols, unit assembled diagonal, rhs kept
    fixed_nodes = {gid(0, j, k) for j in range(My) for k in range(Mz)}
    fixed_g = {n * dof + c for n in fixed_nodes for c in range(dof)}
    seen = set()
    for s in range(ns):
        for i in range(nl):
            g = l2g[s, i]
            if g >= 0 and int(g) in fixed_g:
                K[s][i, :] = 0.0
                K[s][:, i] = 0.0
                if dirichlet_diag == "assembled":
                    K[s][i, i] = 1.0 / mult[g]
                elif dirichlet_diag == "owner":
                    K[s][i, i] = 1.0 if int(g) not in seen else 0.0
                    seen.add(int(g))
                else:
                    K[s][i, i] = 1.0

    # unassembled MATIS operator + assembled rhs = 1 (VecSet(b, 1.0)); the
    # QPTMatISToBlockDiag analog performs the D-scaled rhs decomposition and
    # packages the decomposed FetiProblem (qptransform.c:2006-2148)
    A_is = MatIS.create(K, l2g, n_global)
    prob, _post, _ctx = feti_problem_from_matis(
        A_is, np.ones(n_global), coords=coords)
    return prob


def main(cells=(7, 8, 9), grid=(1, 2, 3), gluing="full", view=True, pde="poisson",
         rtol=None, **kw):
    from permon_tpu.core.convergence import Tolerances
    from permon_tpu.feti import FetiOptions, feti_solve
    from permon_tpu.viewers import view_convergence

    prob = build(cells, grid, pde=pde)
    tol = Tolerances(rtol=rtol) if rtol else Tolerances()
    res = feti_solve(prob, opts=FetiOptions(gluing=gluing, **kw), tol=tol)
    if view:
        print(view_convergence(res.result))
    return prob, res


def main_elasticity(pc_dual="none", view=True):
    """The nsize-7 elasticity test (ex71.c test 2): -pde_type Elasticity
    -dim 3 -qps_rtol 1e-6 -dual_pc_dual_type {none,lumped}; reference
    oracles 66 (none) / 26 (lumped) iterations."""
    return main(
        cells=(8, 6, 4), grid=(7, 1, 1), pde="elasticity", gluing="nonred",
        pc_dual=pc_dual, nullspace="numeric", rtol=1e-6, view=view,
    )


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "elasticity":
        main_elasticity(sys.argv[2] if len(sys.argv) > 2 else "none")
    else:
        main(gluing=sys.argv[1] if len(sys.argv) > 1 else "full")
