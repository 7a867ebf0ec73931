"""Tutorial ex2 — obstacle on a sub-index-set (reference: src/tutorials/ex2.c).

Solves the FD discretization of -u'' = -15 on [0,1], u(0)=u(1)=0, with the
obstacle u(x) >= sin(4 pi x - pi/6)/2 - 2 imposed only on x in [0, 1/2].
Exercises the QPC sub-IS path: the reference restricts the box constraint to
an IS covering the first n/2 components (QPSetBox with is, qpc.c
QPCGetSubvector); here the same constraint is expressed with -inf bounds
outside the subset (the `-infinite` variant of the reference does exactly
this with PETSC_NINFINITY), which keeps all shapes static under jit — both
variants are algebraically identical and share one oracle.

Reference parity target (src/tutorials/output/ex2_1_infinite-{false,true}.out):
CONVERGED_RTOL, 197 iterations, 209 Hessian mults, 179 CG / 11 expansion /
7 proportioning steps.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fobst(i: int, n: int) -> float:
    h = 1.0 / (n - 1)
    return np.sin(4 * np.pi * i * h - np.pi / 6.0) / 2 - 2


def build(n: int = 10):
    """Assemble (A, b, lb) as ex2.c does: tridiagonal with Dirichlet identity
    rows, rhs -15*h^2*2 on interior nodes, obstacle on i < n/2 only (ex2.c:
    74-104); the untouched c entries (i = 0 here) are zero as in the
    reference's freshly created Vec."""
    h = 1.0 / (n - 1)
    A = np.zeros((n, n))
    b = np.zeros(n)
    lb = np.full(n, -np.inf)
    lb[0] = 0.0  # c[0] stays 0.0 in the reference (never set, inside the IS)
    A[0, 0] = 1.0
    A[n - 1, n - 1] = 1.0
    for i in range(1, n - 1):
        A[i, i] = 2.0
        if i != 1:
            A[i, i - 1] = -1.0
        if i != n - 2:
            A[i, i + 1] = -1.0
        b[i] = -15 * h * h * 2
        if i < n // 2:
            lb[i] = fobst(i, n)
    return A, b, lb


def main(n: int = 100, view: bool = True, **solver_kwargs):
    import scipy.sparse as sp

    from permon_tpu import QP, solve
    from permon_tpu.viewers import view_convergence, view_kkt

    A, b, lb = build(n)
    qp = QP.create(sp.csr_matrix(A), b, lb=lb)
    res = solve(qp, **solver_kwargs)
    if view:
        print(view_convergence(res))
        print(view_kkt(qp, res.x, g=res.g))
    return qp, res


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    main(n)
