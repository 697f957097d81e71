"""Beyond the reference grid: matrix and constrained problems on the same
solver engine, using the widened operator catalog.

    python examples/matrix_problems.py [--cpu]

Everything below is the SAME adaptive PG/PD machinery the reference
benchmarks use (src/AdaProx.jl:312-364 semantics) — only g/h change.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

p = argparse.ArgumentParser()
p.add_argument("--cpu", action="store_true")
args = p.parse_args()
if args.cpu:
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import adaprox_tpu as ap
from adaprox_tpu.ops.oracles import FromFunction

rng = np.random.default_rng(0)

# ---- 1. matrix completion: min 0.5||P(X) - P(M)||^2 + lam ||X||_*
# Observed entries of a rank-2 matrix; the nuclear norm recovers the rest.
p_, q_ = 24, 32
truth = rng.standard_normal((p_, 2)) @ rng.standard_normal((2, q_))
mask = rng.random((p_, q_)) < 0.5
obs = jnp.asarray(np.where(mask, truth, 0.0).reshape(-1))
mask_v = jnp.asarray(mask.reshape(-1).astype(truth.dtype))
f = FromFunction(fn=lambda x: 0.5 * jnp.sum(mask_v * (x - obs) ** 2))
g = ap.NuclearNorm(p=p_, q=q_, lam=0.3)
res = ap.adaptive_proxgrad(jnp.zeros(p_ * q_), f=f, g=g,
                           rule=ap.AdaPGMRule(gamma=1.0), tol=2e-4, maxit=5000)  # f32 floor
x_hat = np.asarray(res.x).reshape(p_, q_)
rel = np.linalg.norm(x_hat - truth) / np.linalg.norm(truth)
unseen = (~mask)
rel_unseen = (np.linalg.norm((x_hat - truth)[unseen])
              / np.linalg.norm(truth[unseen]))
print(f"matrix completion: {int(res.numit)} iters, rank "
      f"{int((np.linalg.svd(x_hat, compute_uv=False) > 1e-3).sum())}, "
      f"rel err {rel:.3f} (unseen entries {rel_unseen:.3f})")

# ---- 2. nearest correlation matrix: min 0.5||X - C||_F^2 s.t. X PSD,
# diag X = 1 — PSD cone via prox (IndPSD), unit diagonal via the dual of a
# diagonal-sampling operator (h = Ind{diag = 1}, A = diag extractor).
nn = 12
c_raw = rng.standard_normal((nn, nn)) * 0.3 + np.eye(nn)
c_sym = jnp.asarray(0.5 * (c_raw + c_raw.T).reshape(-1))
diag_rows = np.zeros((nn, nn * nn))
for i in range(nn):
    diag_rows[i, i * nn + i] = 1.0
fC = FromFunction(fn=lambda x: 0.5 * jnp.sum((x - c_sym) ** 2))
res = ap.adaptive_primal_dual(
    jnp.asarray(np.eye(nn).reshape(-1)), jnp.zeros(nn),
    f=fC, g=ap.IndPSD(p=nn),
    h=ap.Translate(inner=ap.IndZero(), b=-jnp.ones(nn)),
    A=ap.DenseOperator(a=jnp.asarray(diag_rows)),
    rule=ap.AdaPGMRule.make(t=1.0, norm_a=1.0), tol=2e-5, maxit=30_000)
x_corr = np.asarray(res.x).reshape(nn, nn)
print(f"nearest correlation: {int(res.numit)} iters, min eig "
      f"{np.linalg.eigvalsh(x_corr).min():.1e}, "
      f"max |diag-1| {np.abs(np.diag(x_corr) - 1).max():.1e}")

# ---- 3. simplex-constrained least squares (portfolio-style weights)
m3, n3 = 60, 20
a3 = jnp.asarray(rng.standard_normal((m3, n3)))
b3 = jnp.asarray(rng.standard_normal(m3))
from adaprox_tpu.models.objectives import LeastSquares

res = ap.adaptive_proxgrad(
    jnp.full(n3, 1.0 / n3), f=LeastSquares(a=a3, b=b3), g=ap.IndSimplex(r=1.0),
    rule=ap.AdaPGMRule(gamma=1e-2), tol=1e-5, maxit=10_000)
w = np.asarray(res.x)
print(f"simplex LS: {int(res.numit)} iters, sum w = {w.sum():.6f}, "
      f"min w = {w.min():.1e}, nnz = {(w > 1e-9).sum()}")

# ---- 4. robust (Huber) regression with an L-inf budget on the coefficients
m4, n4 = 80, 15
a4 = rng.standard_normal((m4, n4))
x_true = rng.standard_normal(n4)
y4 = a4 @ x_true + 0.05 * rng.standard_normal(m4)
y4[::10] += 5.0  # gross outliers
a4j, y4j = jnp.asarray(a4), jnp.asarray(y4)
fR = FromFunction(fn=lambda x: ap.Huber(delta=0.5)(a4j @ x - y4j))
res = ap.adaptive_proxgrad(
    jnp.zeros(n4), f=fR, g=ap.IndBall1(r=float(np.abs(x_true).sum())),
    rule=ap.AdaPGMRule(gamma=1e-2), tol=1e-5, maxit=10_000)
err = float(np.linalg.norm(np.asarray(res.x) - x_true))
ls = np.linalg.lstsq(a4, y4, rcond=None)[0]
print(f"huber regression: {int(res.numit)} iters, coef err {err:.3f} "
      f"(plain least squares under outliers: {np.linalg.norm(ls - x_true):.3f})")

# ---- 5. primal SVM: min (lam/2)||w||^2 + (1/m) sum hinge(b_i a_i' w)
# h = HingeLoss o A — the PRIMAL of the reference's dual-SVM box-QP
# (experiments/dual_svm/runme.jl:47-54); the dual prox of the hinge rides
# the Moreau identity, no conjugate derivation needed.
m5, d5 = 120, 10
a5 = rng.standard_normal((m5, d5))
b5 = np.sign(a5 @ rng.standard_normal(d5))
b5[b5 == 0] = 1.0
fS = FromFunction(fn=lambda w: 0.05 * jnp.sum(w * w))
A5 = ap.DenseOperator(a=jnp.asarray(a5))
res = ap.adaptive_primal_dual(
    jnp.zeros(d5), jnp.zeros(m5), f=fS, g=ap.Zero(),
    h=ap.HingeLoss(b=jnp.asarray(b5), lam=1.0 / m5), A=A5,
    rule=ap.AdaPGMRule.make(t=1.0, norm_a=float(ap.opnorm2(A5))),
    tol=1e-4, maxit=20_000)  # f32 floor
w5 = np.asarray(res.x)
margin = b5 * (a5 @ w5)
obj5 = 0.05 * (w5 @ w5) + np.maximum(0, 1 - margin).mean()
print(f"primal SVM (hinge): {int(res.numit)} iters, obj {obj5:.4f} "
      f"(w=0 gives 1.0), {(margin > 0).mean():.0%} correctly classified")

# ---- 6. barrier-regularized simplex weights: min 0.5||x - c||^2
# - mu sum log x_i  s.t. sum x = 1 — LogBarrier keeps weights strictly
# interior, the hyperplane constraint goes through the dual.
n6 = 16
c6 = jnp.asarray(np.abs(rng.standard_normal(n6)))
f6 = FromFunction(fn=lambda x: 0.5 * jnp.sum((x - c6) ** 2))
res = ap.adaptive_primal_dual(
    jnp.full(n6, 1.0 / n6), jnp.zeros(1),
    f=f6, g=ap.LogBarrier(mu=1e-2),
    h=ap.Translate(inner=ap.IndZero(), b=-jnp.ones(1)),
    A=ap.DenseOperator(a=jnp.ones((1, n6))),
    rule=ap.AdaPGMRule.make(t=1.0, norm_a=float(np.sqrt(n6))),
    tol=2e-5, maxit=20_000)  # f32 floor
x6 = np.asarray(res.x)
print(f"barrier weights: {int(res.numit)} iters, sum {x6.sum():.6f}, "
      f"min weight {x6.min():.1e} (strictly positive by the barrier)")
