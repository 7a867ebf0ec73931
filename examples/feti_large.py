"""Large-scale TFETI — 3-D Poisson at 10^5-10^6+ dofs on one chip.

The sparse-blocks analog of feti_ex71 (same Q1 elements, same DMDA
upper-corner element ownership, same x=0 Dirichlet face and rhs = 1
convention — reference: src/tutorials/feti/ex71.c) built WITHOUT dense
per-subdomain matrices: each subdomain box is assembled as a Kronecker
product of 1-D Q1 stiffness/mass matrices (exact Q1 assembly, sparse),
Dirichlet eliminated symmetrically in the sparse blocks, and solved through
permon_tpu.feti.large (band Cholesky K+, projected dual CG).

The north-star configuration (BASELINE.md / VERDICT round 1 item 1):

    python examples/feti_large.py 100 4      # 101^3 = 1,030,301 dofs,
                                             # 64 subdomains of 26^3 = 17,576

factorizes and solves on one v5e chip (f32 factor + refinement by default).
Verification at any size: the global solution's residual against the
assembled 7-point system, printed as ||Ax-b||/||b||.
"""

import os
import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _axis_split(M, m):
    base = M // m
    return [base + (1 if i < M % m else 0) for i in range(m)]


def _free_tridiag(n, d, o):
    a = sp.diags([o, d, o], [-1, 0, 1], shape=(n, n), format="lil")
    a[0, 0] = d / 2
    a[n - 1, n - 1] = d / 2
    return a.tocsr()


def _m1d(n):
    """1-D Q1 mass on n nodes, unit elements, free-free."""
    return _free_tridiag(n, 2.0 / 3.0, 1.0 / 6.0)


def build_sparse(cells=(24, 24, 24), grid=(2, 2, 2)):
    """Sparse SparseFetiProblem for the 3-D Poisson ex71 configuration.

    Subdomain local boxes follow the DMDA upper-corner element-ownership
    convention (owned nodes + one LOWER ghost layer; see feti_ex71), so the
    local node box along x for rank im is [ox[im]-1 (or 0), ox[im+1]-1] and
    the local stiffness is the free-free Q1 assembly on that box:
    K = Kx (x) My (x) Mz + Mx (x) Ky (x) Mz + Mx (x) My (x) Kz.
    The x=0 Dirichlet face is eliminated symmetrically with the 'assembled'
    diagonal convention (each copy gets 1/multiplicity)."""
    from permon_tpu.feti.assembly import decompose_rhs_by_multiplicity
    from permon_tpu.feti.large import SparseFetiProblem

    cx, cy, cz = cells
    m, n, p = grid
    Mx, My, Mz = cx + 1, cy + 1, cz + 1
    ox = np.concatenate([[0], np.cumsum(_axis_split(Mx, m))])
    oy = np.concatenate([[0], np.cumsum(_axis_split(My, n))])
    oz = np.concatenate([[0], np.cumsum(_axis_split(Mz, p))])

    def node_range(o, r, last, M):
        lo = o[r] - 1 if r > 0 else 0
        hi = o[r + 1] - 1 if r < last - 1 else M - 1
        return lo, hi  # inclusive node ids

    ns = m * n * p
    K_blocks, b_loc_l, l2g_l, floating = [], [], [], []
    mult = np.zeros(Mx * My * Mz)
    boxes = []
    for kp in range(p):
        for jn in range(n):
            for im in range(m):
                x0, x1 = node_range(ox, im, m, Mx)
                y0, y1 = node_range(oy, jn, n, My)
                z0, z1 = node_range(oz, kp, p, Mz)
                boxes.append((x0, x1, y0, y1, z0, z1))
                gx = np.arange(x0, x1 + 1)
                gy = np.arange(y0, y1 + 1)
                gz = np.arange(z0, z1 + 1)
                gids = ((gz[:, None, None] * My + gy[None, :, None]) * Mx
                        + gx[None, None, :]).reshape(-1)
                np.add.at(mult, gids, 1.0)

    nl_list = []
    for (x0, x1, y0, y1, z0, z1) in boxes:
        nl_list.append((x1 - x0 + 1) * (y1 - y0 + 1) * (z1 - z0 + 1))
    nl = max(nl_list)

    l2g = np.full((ns, nl), -1, dtype=np.int64)
    b_loc = np.zeros((ns, nl))
    fixed_any = np.zeros(ns, dtype=bool)
    for s, (x0, x1, y0, y1, z0, z1) in enumerate(boxes):
        nx, ny, nz = x1 - x0 + 1, y1 - y0 + 1, z1 - z0 + 1
        nn = nx * ny * nz
        Kx, Mxm = _free_tridiag(nx, 2.0, -1.0), _m1d(nx)
        Ky, Mym = _free_tridiag(ny, 2.0, -1.0), _m1d(ny)
        Kz, Mzm = _free_tridiag(nz, 2.0, -1.0), _m1d(nz)
        # lexicographic (x fastest), matching gid = (k*My + j)*Mx + i
        K = (
            sp.kron(sp.kron(Mzm, Mym), Kx)
            + sp.kron(sp.kron(Mzm, Ky), Mxm)
            + sp.kron(sp.kron(Kz, Mym), Mxm)
        ).tocsr()
        gx = np.arange(x0, x1 + 1)
        gy = np.arange(y0, y1 + 1)
        gz = np.arange(z0, z1 + 1)
        gids = ((gz[:, None, None] * My + gy[None, :, None]) * Mx
                + gx[None, None, :]).reshape(-1)
        l2g[s, :nn] = gids
        b_loc[s, :nn] = 1.0 / mult[gids]
        # x=0 Dirichlet face: symmetric elimination, 'assembled' diagonal
        if x0 == 0:
            fixed_any[s] = True
            loc_fixed = np.flatnonzero(gids % Mx == 0)
            keep = np.ones(nn)
            keep[loc_fixed] = 0.0
            D = sp.diags(keep)
            K = (D @ K @ D).tolil()
            for i in loc_fixed:
                K[i, i] = 1.0 / mult[gids[i]]
            K = K.tocsr()
        if nn < nl:  # unit diagonal on padding
            K = sp.block_diag([K, sp.identity(nl - nn)], format="csr")
        K_blocks.append(K)

    b_loc = decompose_rhs_by_multiplicity(b_loc, l2g)
    return SparseFetiProblem(
        K_blocks=K_blocks, b_loc=b_loc, l2g=l2g, floating=~fixed_any,
    )


def build_sparse_elasticity(cells=(16, 16, 16), grid=(2, 2, 2),
                            lam: float = 1.0, mu: float = 1.0):
    """Sparse 3-D Q1 ELASTICITY analog of :func:`build_sparse` (the ex71
    ``-pde_type Elasticity`` configuration at scale — reference:
    src/tutorials/feti/ex71.c:26-99 element tables, feti/ex71.c:331-339
    rigid-body nullspace).

    Same DMDA upper-corner decomposition as the Poisson builder; 3 dofs per
    node, node-major interleaved (dof = 3*node + c) so the subdomain
    bandwidth stays 3*(nx*ny + nx + 1) + 2 — FLAT boxes (small x*y
    cross-section) keep the band block size NB small exactly as in the
    scalar case.  TFETI convention: ALL subdomains are floating (full
    6-mode rigid-body nullspace from nodal coords) and the x=0 clamped
    face is returned as ``dirichlet`` global dof ids for the large path to
    enforce — by B rows (``dirichlet_by_B=True``, TFETI) or by symmetric
    elimination in the Hessian.  The rhs is the assembled unit load on
    every dof (VecSet(b,1), D-scaled per copy)."""
    from examples.feti_ex71 import q1_elasticity_emat
    from permon_tpu.feti.assembly import decompose_rhs_by_multiplicity
    from permon_tpu.feti.large import SparseFetiProblem

    dof = 3
    emat = q1_elasticity_emat(3, lam=lam, mu=mu)  # (24, 24), x-fastest nodes
    cx, cy, cz = cells
    m, n, p = grid
    Mx, My, Mz = cx + 1, cy + 1, cz + 1
    ox = np.concatenate([[0], np.cumsum(_axis_split(Mx, m))])
    oy = np.concatenate([[0], np.cumsum(_axis_split(My, n))])
    oz = np.concatenate([[0], np.cumsum(_axis_split(Mz, p))])

    def node_range(o, r, last, M):
        lo = o[r] - 1 if r > 0 else 0
        hi = o[r + 1] - 1 if r < last - 1 else M - 1
        return lo, hi

    ns = m * n * p
    boxes = []
    mult = np.zeros(Mx * My * Mz)
    for kp in range(p):
        for jn in range(n):
            for im in range(m):
                x0, x1 = node_range(ox, im, m, Mx)
                y0, y1 = node_range(oy, jn, n, My)
                z0, z1 = node_range(oz, kp, p, Mz)
                boxes.append((x0, x1, y0, y1, z0, z1))
                gx = np.arange(x0, x1 + 1)
                gy = np.arange(y0, y1 + 1)
                gz = np.arange(z0, z1 + 1)
                gids = ((gz[:, None, None] * My + gy[None, :, None]) * Mx
                        + gx[None, None, :]).reshape(-1)
                np.add.at(mult, gids, 1.0)

    nn_max = max((x1 - x0 + 1) * (y1 - y0 + 1) * (z1 - z0 + 1)
                 for (x0, x1, y0, y1, z0, z1) in boxes)
    nl = nn_max * dof
    l2g = np.full((ns, nl), -1, dtype=np.int64)
    b_loc = np.zeros((ns, nl))
    coords = np.zeros((ns, nn_max, 3))
    K_blocks = []
    # element corner offsets in the emat's node order (x fastest)
    dxyz = np.array([(a & 1, (a >> 1) & 1, (a >> 2) & 1) for a in range(8)])
    for s, (x0, x1, y0, y1, z0, z1) in enumerate(boxes):
        nx, ny, nz = x1 - x0 + 1, y1 - y0 + 1, z1 - z0 + 1
        nn = nx * ny * nz
        gx = np.arange(x0, x1 + 1)
        gy = np.arange(y0, y1 + 1)
        gz = np.arange(z0, z1 + 1)
        gids = ((gz[:, None, None] * My + gy[None, :, None]) * Mx
                + gx[None, None, :]).reshape(-1)
        for c in range(dof):
            l2g[s, c:nn * dof:dof] = dof * gids + c
        coords[s, :nn, 0] = np.tile(gx, ny * nz)
        coords[s, :nn, 1] = np.tile(np.repeat(gy, nx), nz)
        coords[s, :nn, 2] = np.repeat(gz, nx * ny)
        # vectorized Q1 assembly: all (nx-1)(ny-1)(nz-1) elements at once
        ei, ej, ek = np.meshgrid(np.arange(nx - 1), np.arange(ny - 1),
                                 np.arange(nz - 1), indexing="ij")
        orig = ((ek.ravel() * ny + ej.ravel()) * nx + ei.ravel())  # (ne,)
        corner = (orig[:, None]
                  + (dxyz[:, 2] * ny + dxyz[:, 1]) * nx + dxyz[:, 0])  # (ne, 8)
        edofs = (dof * corner[:, :, None]
                 + np.arange(dof)[None, None, :]).reshape(-1, 24)  # (ne, 24)
        ne = edofs.shape[0]
        rows = np.repeat(edofs, 24, axis=1).ravel()
        cols = np.tile(edofs, (1, 24)).ravel()
        vals = np.tile(emat.ravel(), ne)
        K = sp.coo_matrix((vals, (rows, cols)),
                          shape=(nn * dof, nn * dof)).tocsr()
        if nn * dof < nl:  # unit diagonal on padding
            K = sp.block_diag([K, sp.identity(nl - nn * dof)], format="csr")
        K_blocks.append(K)
        # assembled rhs = 1 on every dof (VecSet(b,1)): each copy carries
        # 1/multiplicity so the copy-sum is 1 (node multiplicity == dof
        # multiplicity in the interleaved layout)
        b_loc[s, :nn * dof] = 1.0 / np.repeat(mult[gids], dof)

    b_loc = decompose_rhs_by_multiplicity(b_loc, l2g)
    # clamped x=0 face: all 3 components of every x=0 node, GLOBAL dof ids
    fixed_nodes = (np.arange(My * Mz) * Mx)  # i=0 plane: gid = (k*My+j)*Mx
    dirichlet = (dof * fixed_nodes[:, None] + np.arange(dof)).ravel()
    return SparseFetiProblem(
        K_blocks=K_blocks, b_loc=b_loc, l2g=l2g,
        floating=np.ones(ns, dtype=bool), dirichlet=dirichlet,
        dirichlet_numtype="global_undecomposed", coords=coords,
    )


def assembled_elasticity_system(cells, lam: float = 1.0, mu: float = 1.0):
    """Globally assembled elasticity system (verification oracle): the
    same Q1 assembly on the undecomposed grid, x=0 face eliminated
    symmetrically (rows/cols zeroed, unit diagonal, rhs value 0)."""
    from examples.feti_ex71 import q1_elasticity_emat

    dof = 3
    emat = q1_elasticity_emat(3, lam=lam, mu=mu)
    cx, cy, cz = cells
    Mx, My, Mz = cx + 1, cy + 1, cz + 1
    nn = Mx * My * Mz
    dxyz = np.array([(a & 1, (a >> 1) & 1, (a >> 2) & 1) for a in range(8)])
    ei, ej, ek = np.meshgrid(np.arange(cx), np.arange(cy), np.arange(cz),
                             indexing="ij")
    orig = ((ek.ravel() * My + ej.ravel()) * Mx + ei.ravel())
    corner = (orig[:, None] + (dxyz[:, 2] * My + dxyz[:, 1]) * Mx + dxyz[:, 0])
    edofs = (dof * corner[:, :, None] + np.arange(dof)[None, None, :]
             ).reshape(-1, 24)
    ne = edofs.shape[0]
    rows = np.repeat(edofs, 24, axis=1).ravel()
    cols = np.tile(edofs, (1, 24)).ravel()
    vals = np.tile(emat.ravel(), ne)
    K = sp.coo_matrix((vals, (rows, cols)), shape=(nn * dof, nn * dof)).tocsr()
    b = np.ones(nn * dof)
    fixed_nodes = np.arange(My * Mz) * Mx
    fixed = (dof * fixed_nodes[:, None] + np.arange(dof)).ravel()
    keep = np.ones(nn * dof)
    keep[fixed] = 0.0
    D = sp.diags(keep)
    K = (D @ K @ D).tolil()
    K[fixed, fixed] = 1.0
    b[fixed] = 0.0
    return K.tocsr(), b


def build_obstacle_elasticity(cells=(16, 16, 16), grid=(2, 2, 2), gap=None,
                              lam: float = 1.0, mu: float = 1.0):
    """Elastic CONTACT variant of :func:`build_sparse_elasticity` — the
    north-star problem class (BASELINE.json: 3-D TFETI contact): the body is
    clamped at x=0, loaded by the unit body force, and its far face x=Lx
    meets a rigid plane at distance ``gap``: u_x <= gap for every far-face
    node (one inequality row on the first owning copy of each node's
    x-dof).  Default gap = 30% of the free cantilever's x-stretch scale so
    a contact set actually forms.  Returns (prob, BI, cI, gap)."""
    from permon_tpu.core.extension import SubdomainExtension

    prob = build_sparse_elasticity(cells, grid, lam=lam, mu=mu)
    Mx = cells[0] + 1
    if gap is None:
        # the bar under unit axial body force stretches ~ L^2/(2(lam+2mu))
        gap = 0.3 * (Mx - 1) ** 2 / (2.0 * (lam + 2 * mu))
    ns, nl = prob.ns, prob.nl
    owner_seen = set()
    rows, cols, vals, cI = [], [], [], []
    mI = 0
    for s in range(ns):
        gl = prob.l2g[s]
        # far-face x-dofs: global dof = 3*gid, node i-index Mx-1
        cand = np.flatnonzero((gl >= 0) & (gl % 3 == 0)
                              & ((gl // 3) % Mx == Mx - 1))
        for i in cand:
            g = int(gl[i])
            if g in owner_seen:
                continue
            owner_seen.add(g)
            rows.append(mI)
            cols.append(s * nl + i)
            vals.append(1.0)  # +u_x <= gap
            cI.append(gap)
            mI += 1
    BI = SubdomainExtension.from_coo(
        np.array(rows), np.array(cols), np.array(vals), m=mI, ns=ns, nl=nl
    )
    return prob, BI, np.array(cI), gap


def build_obstacle(cells=(24, 24, 24), grid=(2, 2, 2), cap=None):
    """Contact variant of :func:`build_sparse`: a ceiling u <= cap on the
    far face (x = Lx) of the Poisson box — the membrane pressed against a
    plane, creating an active contact set where the unconstrained solution
    would exceed the cap.  One inequality row per far-face node on its
    first owning copy (same convention as examples/feti_contact.py).

    Returns (prob, BI, cI, cap)."""
    from permon_tpu.core.extension import SubdomainExtension

    prob = build_sparse(cells, grid)
    Mx = cells[0] + 1
    if cap is None:
        # the free solution of -u'' = 1, u(0) = 0 grows like x^2/2: cap at
        # a fraction of the far-face scale so contact actually activates
        cap = 0.3 * (Mx - 1) ** 2 / 2.0
    ns, nl = prob.ns, prob.nl
    owner_seen = set()
    rows, cols, vals, cI = [], [], [], []
    mI = 0
    for s in range(ns):
        for i in range(nl):
            g = prob.l2g[s, i]
            if g < 0 or g % Mx != Mx - 1 or g in owner_seen:
                continue
            owner_seen.add(int(g))
            rows.append(mI)
            cols.append(s * nl + i)
            vals.append(1.0)  # +u <= cap
            cI.append(cap)
            mI += 1
    BI = SubdomainExtension.from_coo(
        np.array(rows), np.array(cols), np.array(vals), m=mI, ns=ns, nl=nl
    )
    return prob, BI, np.array(cI), cap


def assembled_system(cells):
    """The assembled global 7-point system for verification."""
    cx, cy, cz = cells
    Mx, My, Mz = cx + 1, cy + 1, cz + 1
    Kx, Mxm = _free_tridiag(Mx, 2.0, -1.0), _m1d(Mx)
    Ky, Mym = _free_tridiag(My, 2.0, -1.0), _m1d(My)
    Kz, Mzm = _free_tridiag(Mz, 2.0, -1.0), _m1d(Mz)
    A = (
        sp.kron(sp.kron(Mzm, Mym), Kx)
        + sp.kron(sp.kron(Mzm, Ky), Mxm)
        + sp.kron(sp.kron(Kz, Mym), Mxm)
    ).tocsr()
    N = Mx * My * Mz
    b = np.ones(N)
    fixed = np.flatnonzero(np.arange(N) % Mx == 0)
    keep = np.ones(N)
    keep[fixed] = 0.0
    D = sp.diags(keep)
    A = (D @ A @ D).tolil()
    for i in fixed:
        A[i, i] = 1.0
    return A.tocsr(), b


def main(ncells: int = 24, g: int = 2, f32: bool = True, rtol: float = 1e-5,
         verify: bool = None, primal_refine: int = 1):
    import jax.numpy as jnp

    from permon_tpu.core.convergence import Tolerances
    from permon_tpu.feti.large import feti_solve_sparse
    from permon_tpu.feti.solve import FetiOptions

    cells = (ncells,) * 3
    t0 = time.time()
    prob = build_sparse(cells, (g,) * 3)
    N = prob.n_global
    t1 = time.time()
    print(f"assembled {N} dofs, {prob.ns} subdomains of <= {prob.nl} dofs "
          f"({t1 - t0:.1f} s host)")
    # f32 factors on device (v5e f64 is float-float emulated: 2x buffers,
    # 4x matmul partials — the 1M-dof factor would not fit in f64); the dual
    # CG runs cheap unrefined applies, the post-solve uses refined applies,
    # and one f64 primal defect-correction pass over the whole FETI solve
    # brings the assembled residual to f64 grade (~1e-10) at f32 memory
    kw = (
        dict(kplus_dtype=jnp.float32, kplus_refine=2,
             primal_refine=primal_refine)
        if f32 else {}
    )
    res = feti_solve_sparse(
        prob, FetiOptions(gluing="nonred"), tol=Tolerances(rtol=rtol), **kw
    )
    t2 = time.time()
    r = res.result
    print(f"dual CG: {int(r.iterations)} iterations, reason {int(r.reason)}, "
          f"rnorm {float(r.rnorm):.3e} ({t2 - t1:.1f} s incl. factorization)")
    if verify is None:
        verify = N <= 1.2e6
    if verify:
        A, b = assembled_system(cells)
        resid = np.linalg.norm(A @ res.x_global - b) / np.linalg.norm(b)
        print(f"||Ax-b||/||b|| = {resid:.3e} (assembled 7-point system)")
        return res, resid
    return res, None


def main_elasticity(ncells: int = 16, g: int = 2, rtol: float = 1e-5,
                    contact: bool = False):
    """3-D Q1 elasticity (optionally with the far-face plane obstacle)
    through the large path: rbm nullspace, in-Hessian clamped face."""
    import jax.numpy as jnp

    from permon_tpu.core.convergence import Tolerances
    from permon_tpu.feti.large import FetiSolverSparse
    from permon_tpu.feti.solve import FetiOptions

    cells, grid = (ncells,) * 3, (g,) * 3
    t0 = time.time()
    if contact:
        prob, BI, cI, gap = build_obstacle_elasticity(cells, grid)
    else:
        prob = build_sparse_elasticity(cells, grid)
        BI = cI = None
    N = prob.n_global
    print(f"assembled {N} elasticity dofs, {prob.ns} subdomains "
          f"({time.time() - t0:.1f} s host)")
    t1 = time.time()
    res = FetiSolverSparse(
        prob,
        FetiOptions(gluing="nonred", nullspace="rbm", dirichlet_by_B=False),
        kplus_dtype=jnp.float32, kplus_refine=2,
        primal_refine=0 if contact else 1, BI=BI, cI=cI,
    ).solve(tol=Tolerances(rtol=rtol))
    r = res.result
    print(f"{'SMALXE' if contact else 'dual CG'}: {int(r.iterations)} "
          f"iterations, reason {int(r.reason)} ({time.time() - t1:.1f} s "
          "incl. factorization)")
    if not contact and N <= 3e5:
        K, b = assembled_elasticity_system(cells)
        resid = np.linalg.norm(K @ res.x_global - b) / np.linalg.norm(b)
        print(f"||Kx-b||/||b|| = {resid:.3e} (assembled Q1 system)")
    return res


if __name__ == "__main__":
    args = sys.argv[1:]
    if args and args[0] == "elasticity":
        nc = int(args[1]) if len(args) > 1 else 16
        g = int(args[2]) if len(args) > 2 else 2
        main_elasticity(nc, g, contact="contact" in args)
    else:
        nc = int(args[0]) if args else 24
        g = int(args[1]) if len(args) > 1 else 2
        main(nc, g)
