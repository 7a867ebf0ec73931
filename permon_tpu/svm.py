"""Support-vector machine training on the QP stack — the PermonSVM analog.

PERMON is the QP backend of PermonSVM (reference: README.md:3-12); the
C-SVM dual problem is exactly the equality+box QP shape the SMALXE/MPRGP
stack targets:

    min  1/2 a' Q a - 1'a     Q = (y y') .* K(X, X)
    s.t. y'a = 0              (single equality row — OneRow operator)
         0 <= a <= C          (box)

The default-solver rule picks SMALXE (equality present, qps.c:422-455) with
MPRGP inner solves on the penalized subproblems — the same path PermonSVM
drives.  For the linear kernel the Gram product is applied lazily as
y .* (X (X'(y .* a))) (a 4-factor operator Product, never materialized), so
training is MXU-bound and scales to tall-skinny data; nonlinear kernels
materialize the (n, n) Gram matrix once at fit time (dense MXU matmuls).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax.numpy as jnp
import numpy as np

from .core.convergence import Tolerances
from .core.linop import Dense, Diagonal, OneRow, Product, Transpose
from .qp.qp import QP
from .qpc.box import BoxConstraint
from .solvers.driver import solve


def _kernel_matrix(kernel: str, X, Z, gamma: float, degree: int, coef0: float):
    G = X @ Z.T
    if kernel == "linear":
        return G
    if kernel == "rbf":
        x2 = jnp.sum(X * X, axis=1)[:, None]
        z2 = jnp.sum(Z * Z, axis=1)[None, :]
        return jnp.exp(-gamma * (x2 - 2.0 * G + z2))
    if kernel == "poly":
        return (gamma * G + coef0) ** degree
    raise ValueError(f"unknown kernel {kernel!r}")


def svm_dual_qp(X, y, C: float = 1.0, kernel: str = "linear",
                gamma: Optional[float] = None, degree: int = 3,
                coef0: float = 0.0) -> QP:
    """Assemble the C-SVM dual QP (lazy Gram operator for 'linear')."""
    Xj = jnp.asarray(X, jnp.result_type(float))
    yj = jnp.asarray(y, Xj.dtype)
    n, dim = Xj.shape
    gamma = 1.0 / dim if gamma is None else gamma
    Dy = Diagonal.create(yj)
    if kernel == "linear":
        Xop = Dense.create(Xj)
        Q = Product((Dy, Xop, Transpose(Xop), Dy))
    else:
        Km = _kernel_matrix(kernel, Xj, Xj, gamma, degree, coef0)
        Q = Product((Dy, Dense.create(Km), Dy))
    return QP(
        A=Q, b=jnp.ones(n, Xj.dtype), BE=OneRow(v=yj), cE=jnp.zeros(1, Xj.dtype),
        box=BoxConstraint.create(n, lb=jnp.zeros(n, Xj.dtype),
                                 ub=jnp.full(n, C, Xj.dtype)),
    )


@dataclasses.dataclass
class SVC:
    """C-SVM classifier trained by SMALXE/MPRGP on the dual QP.

    Parameters mirror the usual sklearn surface; `kernel` in
    {'linear', 'rbf', 'poly'}.  After `fit`: `alpha_`, `support_`,
    `intercept_`, `coef_` (linear only), `result_` (solver diagnostics)."""

    C: float = 1.0
    kernel: str = "linear"
    gamma: Optional[float] = None
    degree: int = 3
    coef0: float = 0.0
    rtol: float = 1e-6

    def fit(self, X, y) -> "SVC":
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        assert set(np.unique(y)) <= {-1.0, 1.0}, "labels must be +-1"
        qp = svm_dual_qp(X, y, self.C, self.kernel, self.gamma, self.degree,
                         self.coef0)
        res = solve(qp, tol=Tolerances(rtol=self.rtol))
        alpha = np.asarray(res.x)
        self.result_ = res
        self.alpha_ = alpha
        self.X_, self.y_ = X, y
        self.support_ = np.flatnonzero(alpha > 1e-6 * self.C)
        self._gamma = 1.0 / X.shape[1] if self.gamma is None else self.gamma
        if self.kernel == "linear":
            self.coef_ = (alpha * y) @ X
        # bias from on-margin support vectors (0 < a < C); decision f(sv) = y
        on_margin = (alpha > 1e-6 * self.C) & (alpha < (1 - 1e-6) * self.C)
        if not on_margin.any():
            on_margin = alpha > 1e-6 * self.C
        f_no_b = self._decision_no_bias(X[on_margin])
        self.intercept_ = float(np.mean(y[on_margin] - f_no_b))
        return self

    def _decision_no_bias(self, Z):
        Z = np.asarray(Z, dtype=np.float64)
        if self.kernel == "linear":
            return Z @ self.coef_
        Km = _kernel_matrix(self.kernel, jnp.asarray(Z), jnp.asarray(self.X_),
                            self._gamma, self.degree, self.coef0)
        return np.asarray(Km @ jnp.asarray(self.alpha_ * self.y_))

    def decision_function(self, Z):
        return self._decision_no_bias(Z) + self.intercept_

    def predict(self, Z):
        return np.sign(self.decision_function(Z))

    def score(self, Z, y) -> float:
        return float(np.mean(self.predict(Z) == np.asarray(y)))
