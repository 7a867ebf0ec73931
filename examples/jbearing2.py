"""Journal bearing problem (MINPACK-2 DPJB) — bound-constrained QP
(reference: src/tutorials/jbearing2.c).

Pressure of a journal bearing over [0, 2pi] x [0, 2b]: minimize the quadratic
f(x) = 1/2 x'Ax + B'x  s.t.  0 <= x <= 1000, with the 5-point stencil Hessian
using trapezoidal-rule coefficients of p(xi) = (1 + ecc cos xi)^3.

Reference parity target (output/jbearing2_4.out, mx=8 my=12 gttol=1e-6):
CONVERGED_RTOL in 23 iterations, 24 Hessian mults, 21 CG / 0 expansion /
2 proportioning steps; alpha = 2.0061100039e-01.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(nx=8, ny=12, ecc=0.1, b=10.0):
    """Assemble (A, rhs, lb, ub) exactly as FormHessian/ComputeB do."""
    import scipy.sparse as sp

    pi = np.pi
    hx = 2 * pi / (nx + 1.0)
    hy = 2 * b / (ny + 1.0)
    hxhy = hx * hy
    hxhx = 1.0 / (hx * hx)
    hyhy = 1.0 / (hy * hy)

    def p(xi):
        t = 1.0 + ecc * np.cos(xi)
        return t * t * t

    n = nx * ny
    A = sp.lil_matrix((n, n))
    rhs = np.zeros(n)
    for i in range(nx):
        xi = (i + 1) * hx
        trule1 = hxhy * (p(xi) + p(xi + hx) + p(xi)) / 6.0
        trule2 = hxhy * (p(xi) + p(xi - hx) + p(xi)) / 6.0
        trule3 = hxhy * (p(xi) + p(xi + hx) + p(xi + hx)) / 6.0
        trule4 = hxhy * (p(xi) + p(xi - hx) + p(xi - hx)) / 6.0
        trule5, trule6 = trule1, trule2
        vdown = -(trule5 + trule2) * hyhy
        vleft = -hxhx * (trule2 + trule4)
        vright = -hxhx * (trule1 + trule3)
        vup = -hyhy * (trule1 + trule6)
        vmid = hxhx * (trule1 + trule2 + trule3 + trule4) + hyhy * (
            trule1 + trule2 + trule5 + trule6
        )
        for j in range(ny):
            row = j * nx + i
            if j > 0:
                A[row, row - nx] = vdown
            if i > 0:
                A[row, row - 1] = vleft
            A[row, row] = vmid
            if i + 1 < nx:
                A[row, row + 1] = vright
            if j + 1 < ny:
                A[row, row + nx] = vup
            # linear term B = -ecc*hx*hy*sin((i+1)hx); QP rhs = -B
            rhs[row] = ecc * hxhy * np.sin(xi)
    lb = np.zeros(n)
    ub = np.full(n, 1000.0)
    return A.tocsr(), rhs, lb, ub


def main(nx=8, ny=12, view=True, monitor=False, **kw):
    import permon_tpu as pt
    from permon_tpu.core.convergence import Tolerances
    from permon_tpu.viewers import view_convergence, view_kkt

    A, rhs, lb, ub = build(nx, ny)
    qp = pt.QP.create(A, rhs, lb=lb, ub=ub)
    # the reference maps TAO tolerances: rtol = gttol(1e-6), atol = gatol(1e-8)
    res = pt.solve(qp, tol=Tolerances(rtol=1e-6, atol=1e-8), monitor=monitor, **kw)
    if view:
        print(view_convergence(res))
        print(view_kkt(qp, res.x, g=res.g))
    return qp, res


if __name__ == "__main__":
    main(monitor=True)
