"""Trajectory-exact parity: a pure-NumPy mirror of the reference loops.

These mirrors transcribe the reference's iteration order and call sites
(src/AdaProx.jl) in plain NumPy f64 — no JAX — and the compiled engine must
reproduce their per-iteration gamma/x trajectories to float reassociation
tolerance. This is the strongest check that the TPU engine implements the
same algorithm, not merely "an algorithm that also converges".
"""

import jax.numpy as jnp
import numpy as np
import pytest

import adaprox_tpu as ap
from adaprox_tpu.models.objectives import LeastSquares, Quadratic


# --- numpy reference mirrors ------------------------------------------------


def np_adapgm_rule(state, x1, g1, x0, g0):
    """OurRule update, src/AdaProx.jl:258-273 (norm_A=0, t=1, delta=0)."""
    gamma1, gamma0 = state
    dg, dx = g1 - g0, x1 - x0
    dgdx = dg @ dx
    with np.errstate(all="ignore"):
        c = (dg @ dg) / dgdx
        lip = dgdx / (dx @ dx)
    c = 0.0 if np.isnan(c) else c
    lip = 0.0 if np.isnan(lip) else lip
    d = gamma1 * lip * (gamma1 * c - 1)
    with np.errstate(all="ignore"):
        t3 = gamma1 / np.sqrt(2 * max(d + np.sqrt(d * d), 0.0))
    gamma = min(gamma1 * np.sqrt(1 + gamma1 / gamma0), t3)
    return gamma, (gamma, gamma1)


def np_mm_rule(state, x1, g1, x0, g0):
    """MalitskyMishchenkoRule, src/AdaProx.jl:226-230 (t=1)."""
    gamma_prev, rho = state
    lip = np.linalg.norm(g1 - g0) / np.linalg.norm(x1 - x0)
    gamma = min(np.sqrt(1 + rho) * gamma_prev, 1 / (2 * lip))
    return gamma, (gamma, gamma / gamma_prev)


def soft(v, thr):
    return np.sign(v) * np.maximum(np.abs(v) - thr, 0)


def np_adaptive_proxgrad(a, b, lam, gamma0, rule_update, state0, iters):
    """adaptive_primal_dual with h=Zero, A=0 (src/AdaProx.jl:312-364)."""
    grad = lambda x: a.T @ (a @ x - b)
    x = np.zeros(a.shape[1])
    gamma = gamma0
    state = state0
    g = grad(x)
    v = x - gamma * g
    x_prev, g_prev = x, g
    x = soft(v, gamma * lam)
    gammas, xs = [], []
    for _ in range(iters):
        g_x = grad(x)
        gamma, state = rule_update(state, x, g_x, x_prev, g_prev)
        v = x - gamma * g_x
        x_prev, g_prev = x, g_x
        x = soft(v, gamma * lam)
        gammas.append(gamma)
        xs.append(x.copy())
    return np.array(gammas), np.array(xs)


def np_adaptive_pd(q, qv, labels, big_c, t, norm_a, iters):
    """Full PD loop (dual-SVM shape: g=IndBox, h=IndZero so prox_{h*}=id),
    src/AdaProx.jl:312-364 with OurRule (gamma = 1/(2*1.2*t*norm_a))."""
    n = q.shape[0]
    grad = lambda x: q @ x + qv
    clamp = lambda v: np.clip(v, 0.0, big_c)
    a_mv = lambda x: np.array([labels @ x])
    at_mv = lambda y: labels * y[0]

    theta_big = 1.2
    gamma = 1.0 / (2 * theta_big * t * norm_a)
    sigma = gamma * t * t
    g1 = g0 = gamma
    x = np.zeros(n)
    y = np.zeros(1)
    a_x = a_mv(x)
    g_x = grad(x)
    at_y = at_mv(y)
    v = x - gamma * (g_x + at_y)
    x_prev, a_x_prev, g_prev = x, a_x, g_x
    x = clamp(v)
    gammas, res = [], []
    for _ in range(iters):
        a_x = a_mv(x)
        g_x = grad(x)
        primal = (v - x) / gamma + g_x + at_y
        # OurRule with coupling (src/AdaProx.jl:258-273)
        dg, dx = g_x - g_prev, x - x_prev
        dgdx = dg @ dx
        with np.errstate(all="ignore"):
            c = (dg @ dg) / dgdx
            lip = dgdx / (dx @ dx)
        c = 0.0 if np.isnan(c) else c
        lip = 0.0 if np.isnan(lip) else lip
        d = g1 * lip * (g1 * c - 1)
        xi = t * t * g1 * g1 * norm_a * norm_a
        m4 = 1 - 4 * xi
        with np.errstate(all="ignore"):
            t3 = g1 * np.sqrt(m4) / np.sqrt(2 * max(d + np.sqrt(d * d + xi * m4), 0.0))
        gamma_new = min(g1 * np.sqrt(1 + g1 / g0), 1 / (2 * theta_big * t * norm_a), t3)
        g0, g1 = g1, gamma_new
        sigma = gamma_new * t * t
        rho = gamma_new / gamma
        gamma = gamma_new
        w = y + sigma * ((1 + rho) * a_x - rho * a_x_prev)
        y = w  # prox of (IndZero)* = Zero -> identity
        dual = (w - y) / sigma - a_x
        res.append(np.sqrt(primal @ primal + dual @ dual))
        at_y = at_mv(y)
        v = x - gamma * (g_x + at_y)
        x_prev, a_x_prev, g_prev = x, a_x, g_x
        x = clamp(v)
        gammas.append(gamma)
    return np.array(gammas), np.array(res)


# --- parity assertions ------------------------------------------------------


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("rule_name", ["ours", "mm"])
def test_pg_trajectory_matches_numpy_mirror(seed, rule_name):
    rng = np.random.default_rng(seed)
    m, n = 30, 50
    a = rng.standard_normal((m, n))
    b = rng.standard_normal(m)
    lam = 0.3
    gamma0 = 1.0 / np.linalg.norm(a, 2) ** 2
    iters = 60

    if rule_name == "ours":
        np_rule, state0 = np_adapgm_rule, (gamma0, gamma0)
        jx_rule = ap.AdaPGMRule(gamma=gamma0)
    else:
        np_rule, state0 = np_mm_rule, (gamma0, np.inf)
        jx_rule = ap.MalitskyMishchenkoRule(gamma=gamma0)

    gammas_np, xs_np = np_adaptive_proxgrad(a, b, lam, gamma0, np_rule, state0, iters)

    res = ap.adaptive_proxgrad(
        jnp.zeros(n), f=LeastSquares(a=jnp.asarray(a), b=jnp.asarray(b)),
        g=ap.L1Norm(lam=lam), rule=jx_rule, tol=0.0, maxit=iters, history=True,
    )
    gammas_jx = np.asarray(res.records.gamma)
    # float reassociation (jnp reductions vs BLAS) is amplified by the
    # recurrence; 1e-7 over 60 iterations is still trajectory-exact evidence
    np.testing.assert_allclose(gammas_jx, gammas_np, rtol=1e-7)
    np.testing.assert_allclose(np.asarray(res.x), xs_np[-1], rtol=1e-7, atol=1e-10)


@pytest.mark.parametrize("t", [0.1, 1.0])
def test_pd_trajectory_matches_numpy_mirror(t):
    rng = np.random.default_rng(3)
    n = 24
    feats = rng.standard_normal((n, 5))
    labels = np.sign(rng.standard_normal(n))
    labels[labels == 0] = 1
    q = (labels[:, None] * feats) @ (labels[:, None] * feats).T
    qv = -np.ones(n)
    big_c = 0.5
    norm_a = float(np.linalg.norm(labels))
    iters = 80

    gammas_np, res_np = np_adaptive_pd(q, qv, labels, big_c, t, norm_a, iters)

    res = ap.adaptive_primal_dual(
        jnp.zeros(n), jnp.zeros(1),
        f=Quadratic(q_mat=jnp.asarray(q), q_vec=jnp.asarray(qv)),
        g=ap.IndBox(lo=0.0, hi=big_c), h=ap.IndZero(),
        A=ap.DenseOperator(a=jnp.asarray(labels[None, :])),
        rule=ap.AdaPGMRule.make(t=t, norm_a=norm_a),
        tol=0.0, maxit=iters, history=True,
    )
    np.testing.assert_allclose(np.asarray(res.records.gamma), gammas_np, rtol=1e-7)
    np.testing.assert_allclose(np.asarray(res.records.norm_res), res_np, rtol=1e-7)
