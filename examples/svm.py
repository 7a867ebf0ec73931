"""Soft-margin SVM training as a PERMON-style dual QP.

PERMON is the QP backend of PermonSVM (reference: README.md:3-12); the
C-SVM dual problem is exactly the equality+box QP shape this library's
SMALXE/MPRGP stack targets:

    min  1/2 a' Q a - 1'a     Q = (y y') .* (X X')   (linear kernel Gram)
    s.t. y'a = 0              (single equality row — OneRow operator)
         0 <= a <= C          (box)

The default-solver rule picks SMALXE (equality present, qps.c:422-455) with
MPRGP inner solves on the penalized subproblems — the same path PermonSVM
drives.  The Gram matmul is a dense MXU-friendly product: Q a is computed as
y .* (X (X'(y .* a))) without materializing Q (lazy Product of operators),
so training scales to tall-skinny data.

Run: python examples/svm.py [n_samples] [C]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_blobs(n=200, dim=2, seed=0, margin=1.0):
    rng = np.random.default_rng(seed)
    half = n // 2
    Xp = rng.standard_normal((half, dim)) + margin
    Xn = rng.standard_normal((n - half, dim)) - margin
    X = np.vstack([Xp, Xn])
    y = np.concatenate([np.ones(half), -np.ones(n - half)])
    perm = rng.permutation(n)
    return X[perm], y[perm]


def train(X, y, C=1.0, rtol=1e-6):
    """Solve the C-SVM dual; returns (w, b, alpha, result)."""
    import jax.numpy as jnp

    import permon_tpu as pt
    from permon_tpu.core.linop import Dense, Diagonal, OneRow, Product

    n, dim = X.shape
    Xj = jnp.asarray(X)
    yj = jnp.asarray(y)

    # Q = diag(y) X X' diag(y) as a lazy 4-factor product (never materialized)
    Dy = Diagonal.create(yj)
    Xop = Dense.create(Xj)
    from permon_tpu.core.linop import Transpose

    Q = Product((Dy, Xop, Transpose(Xop), Dy))

    qp = pt.QP(
        A=Q,
        b=jnp.ones(n),
        BE=OneRow(v=yj),
        cE=jnp.zeros(1),
        box=__import__("permon_tpu.qpc.box", fromlist=["BoxConstraint"]).BoxConstraint.create(
            n, lb=jnp.zeros(n), ub=jnp.full(n, C)
        ),
    )
    res = pt.solve(qp, tol=pt.Tolerances(rtol=rtol))
    alpha = np.asarray(res.x)

    w = (alpha * y) @ X
    # bias from on-margin support vectors (0 < a < C)
    sv = (alpha > 1e-6 * C) & (alpha < (1 - 1e-6) * C)
    if not sv.any():
        sv = alpha > 1e-6 * C
    b = float(np.mean(y[sv] - X[sv] @ w))
    return w, b, alpha, res


def main(n=200, C=1.0):
    X, y = make_blobs(n)
    w, b, alpha, res = train(X, y, C)
    pred = np.sign(X @ w + b)
    acc = float(np.mean(pred == y))
    nsv = int(np.sum(alpha > 1e-6 * C))
    print(
        f"svm: n={n} C={C} outer_its={int(res.iterations)} "
        f"inner_its={int(res.inner_iterations)} reason={int(res.reason)} "
        f"support_vectors={nsv} train_accuracy={acc:.3f}"
    )
    return acc


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    C = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    main(n, C)
