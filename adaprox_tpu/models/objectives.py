"""Smooth objectives used by the benchmark problems.

TPU-native re-implementations of the hand-written pullback structs in the
reference experiments:

  * LeastSquares      — experiments/lasso/runme.jl:16-27
  * LogisticLoss      — experiments/sparse_logreg/runme.jl:18-39
  * Quadratic         — experiments/dual_svm/runme.jl:19-28
  * Cubic             — experiments/cubic_sparse_logreg/runme.jl:20-32
  * WorstQuadratic    — experiments/nesterov_worst_case/runme.jl:14-40

Each stores its data as (possibly mesh-sharded) jnp arrays; the matvecs
inside value/grad are the hot ops and map straight onto the MXU. ``aux``
carries the forward residual so the gradient finishes with a single
transposed matvec, mirroring the reference's lazy pullbacks.
"""

from __future__ import annotations

import jax.numpy as jnp

from .._pytree import pytree_dataclass
from ..ops.oracles import SmoothOracle

__all__ = ["LeastSquares", "LogisticLoss", "Quadratic", "Cubic", "WorstQuadratic"]


@pytree_dataclass
class LeastSquares(SmoothOracle):
    """f(w) = 0.5 * ||A w - b||^2. aux = residual; grad = A' res."""

    a: jnp.ndarray
    b: jnp.ndarray

    def value_and_aux(self, w):
        res = self.a @ w - self.b
        return 0.5 * jnp.sum(res * res), res

    def grad_from_aux(self, w, res):
        del w
        # (res @ a) keeps a row-sharded `a` contraction-local (psum of partials)
        return res @ self.a


@pytree_dataclass
class LogisticLoss(SmoothOracle):
    """Mean logistic loss with the bias folded into the last coordinate of w
    (reference experiments/sparse_logreg/runme.jl:23-39):

        logits = X @ w[:-1] + w[-1]
        f(w) = -mean((y - 1) * logits - log(1 + exp(-logits)))

    aux = sigmoid(logits); grad = [X'(probs - y)/N, mean(probs - y)].
    """

    x: jnp.ndarray
    y: jnp.ndarray

    def value_and_aux(self, w):
        logits = self.x @ w[:-1] + w[-1]
        # log(1 + exp(-z)) = softplus(-z), computed stably
        softplus_neg = jnp.logaddexp(0.0, -logits)
        val = -jnp.mean((self.y - 1.0) * logits - softplus_neg)
        probs = 1.0 / (1.0 + jnp.exp(-logits))
        return val, probs

    def grad_from_aux(self, w, probs):
        n = self.y.shape[0]
        diff = probs - self.y
        gw = (diff @ self.x) / n
        gb = jnp.mean(diff)
        return jnp.concatenate([gw, gb[None]]).astype(w.dtype)


@pytree_dataclass
class Quadratic(SmoothOracle):
    """f(x) = 0.5 x'Qx + q'x. aux = Qx; grad = Qx + q."""

    q_mat: jnp.ndarray
    q_vec: jnp.ndarray

    def value_and_aux(self, x):
        qx = self.q_mat @ x
        return 0.5 * jnp.vdot(x, qx) + jnp.vdot(x, self.q_vec), qx

    def grad_from_aux(self, x, qx):
        del x
        return qx + self.q_vec


@pytree_dataclass
class Cubic(SmoothOracle):
    """Cubic-regularized quadratic model (cubic_sparse_logreg/runme.jl:26-32):

        grad = Qx + q + (c*||x||/2) x
        f(x) = (<x, grad> + <q, x>)/2 - c*||x||^3/12

    aux = grad (the reference's pullback returns the precomputed grad).
    """

    q_mat: jnp.ndarray
    q_vec: jnp.ndarray
    c: jnp.ndarray

    def value_and_aux(self, x):
        nx = jnp.sqrt(jnp.sum(x * x))
        grad = self.q_mat @ x + self.q_vec + (nx * self.c / 2) * x
        val = (jnp.vdot(x, grad) + jnp.vdot(self.q_vec, x)) / 2 - nx**3 * self.c / 12
        return val, grad

    def grad_from_aux(self, x, grad):
        del x
        return grad


@pytree_dataclass(meta=("k",))
class WorstQuadratic(SmoothOracle):
    """Nesterov's worst-case tridiagonal quadratic on the first k coordinates
    (nesterov_worst_case/runme.jl:14-40):

        f(x) = (L/4) * ( (x_1^2 + x_k^2 + sum_{i<k}(x_i - x_{i+1})^2)/2 - x_1 )

    Vectorized gradient: (L/4) * (T x - e_1) with T the tridiag(−1, 2, −1)
    stencil on x[:k], zero beyond.
    """

    k: int
    lip: jnp.ndarray

    def value_and_aux(self, x):
        xk = x[: self.k]
        s = xk[0] ** 2 + xk[-1] ** 2 + jnp.sum(jnp.diff(xk) ** 2)
        val = (self.lip / 4) * (s / 2 - xk[0])
        return val, None

    def grad_from_aux(self, x, aux):
        del aux
        xk = x[: self.k]
        left = jnp.concatenate([jnp.zeros((1,), xk.dtype), xk[:-1]])
        right = jnp.concatenate([xk[1:], jnp.zeros((1,), xk.dtype)])
        tx = 2 * xk - left - right
        e1 = jnp.zeros_like(xk).at[0].set(1.0)
        gk = (self.lip / 4) * (tx - e1)
        return jnp.concatenate([gk, jnp.zeros((x.shape[0] - self.k,), x.dtype)])
