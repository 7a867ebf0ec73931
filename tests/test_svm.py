"""SVM module (the PermonSVM analog): linear and kernel C-SVM trained by
SMALXE/MPRGP on the dual QP."""

import numpy as np

from permon_tpu.svm import SVC, svm_dual_qp


def _blobs(n=120, dim=2, seed=0, margin=1.5):
    rng = np.random.default_rng(seed)
    half = n // 2
    X = np.vstack([rng.standard_normal((half, dim)) + margin,
                   rng.standard_normal((n - half, dim)) - margin])
    y = np.concatenate([np.ones(half), -np.ones(n - half)])
    perm = rng.permutation(n)
    return X[perm], y[perm]


def _circles(n=120, seed=1):
    rng = np.random.default_rng(seed)
    half = n // 2
    t = rng.uniform(0, 2 * np.pi, n)
    r = np.concatenate([np.full(half, 1.0), np.full(n - half, 3.0)])
    X = np.c_[r * np.cos(t), r * np.sin(t)] + 0.1 * rng.standard_normal((n, 2))
    y = np.concatenate([np.ones(half), -np.ones(n - half)])
    return X, y


class TestLinearSVC:
    def test_separable_blobs(self):
        X, y = _blobs()
        clf = SVC(C=1.0).fit(X, y)
        assert clf.score(X, y) >= 0.97
        # dual KKT: y'a = 0, 0 <= a <= C
        a = clf.alpha_
        assert abs(a @ y) < 1e-4  # SMALXE enforces y..a=0 to the outer rtol
        assert a.min() >= -1e-10 and a.max() <= 1.0 + 1e-8
        # only points near the margin are support vectors
        assert len(clf.support_) < len(y) // 2

    def test_dual_qp_shape(self):
        X, y = _blobs(40)
        qp = svm_dual_qp(X, y, C=2.0)
        assert qp.BE.shape == (1, 40)
        assert float(qp.box.ub[0]) == 2.0


class TestKernelSVC:
    def test_rbf_circles(self):
        X, y = _circles()
        lin = SVC(C=1.0).fit(X, y)
        rbf = SVC(C=1.0, kernel="rbf", gamma=0.5).fit(X, y)
        assert rbf.score(X, y) >= 0.95
        assert rbf.score(X, y) > lin.score(X, y)  # not linearly separable

    def test_poly(self):
        X, y = _circles(80, seed=2)
        clf = SVC(C=1.0, kernel="poly", degree=2, gamma=1.0).fit(X, y)
        assert clf.score(X, y) >= 0.9
