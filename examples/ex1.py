"""Tutorial ex1 — 1-D obstacle problem (reference: src/tutorials/ex1.c).

Solves the FD discretization of -u'' = -15 on [0,1], u(0)=u(1)=0,
s.t. u(x) >= sin(4 pi x - pi/6)/2 - 2, as the box-constrained QP
min 1/2 x'Ax - b'x s.t. x >= lb.

Reference parity target (src/tutorials/output/ex1_1.out): CONVERGED_RTOL,
181 iterations, 200 Hessian mults, 156 CG / 18 expansion / 7 proportioning.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(n: int = 10):
    """Assemble (A, b, lb) exactly as the reference example does.

    Dirichlet rows are kept in the system as identity rows with zero rhs and
    the couplings of the adjacent rows to them dropped (ex1.c:70-100); the
    obstacle is only imposed on interior nodes — boundary nodes get lb=0,
    mirroring the untouched (zero) entries of c in the reference.
    """
    h = 1.0 / (n - 1)
    A = np.zeros((n, n))
    b = np.zeros(n)
    lb = np.zeros(n)
    A[0, 0] = 1.0
    A[n - 1, n - 1] = 1.0
    for i in range(1, n - 1):
        A[i, i] = 2.0
        if i != 1:
            A[i, i - 1] = -1.0
        if i != n - 2:
            A[i, i + 1] = -1.0
        b[i] = -15 * h * h * 2
        lb[i] = np.sin(4 * np.pi * i * h - np.pi / 6.0) / 2 - 2
    return A, b, lb


def main(n: int = 100, use_sparse: bool = True, view: bool = True, **solver_kwargs):
    import scipy.sparse as sp

    from permon_tpu import QP, solve
    from permon_tpu.viewers import view_convergence, view_kkt

    A, b, lb = build(n)
    op = sp.csr_matrix(A) if use_sparse else A
    qp = QP.create(op, b, lb=lb)
    res = solve(qp, **solver_kwargs)
    if view:
        print(view_convergence(res))
        print(view_kkt(qp, res.x, g=res.g))
    return qp, res


if __name__ == "__main__":
    import sys

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    main(n)
