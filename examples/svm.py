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
    """Solve the C-SVM dual via permon_tpu.svm; returns (w, b, alpha, result)."""
    from permon_tpu.svm import SVC

    clf = SVC(C=C, rtol=rtol).fit(X, y)
    return clf.coef_, clf.intercept_, clf.alpha_, clf.result_


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
