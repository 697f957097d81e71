"""Adjudicate the non-converging synthetic dual-SVM grid rows (r3 verdict #2).

RESULTS.md `dual_svm/mushrooms_C_0.1` shows the best Malitsky-Pock variant
at residual ~2.1e+01 after 10,000 iterations (tol 1e-5) and Condat-Vu at
~6e-01 — far above tol. Two hypotheses:

  (a) expected behavior of these methods on THIS synthetic instance — then
      an independent NumPy transcription of the reference loops
      (src/AdaProx.jl:552-629 MP; :312-364 + FixedStepsize for CV) run on
      the same data must show the same non-convergence;
  (b) a solver bug — then the mirror would converge where the solver does
      not.

This tool runs both mirrors and the repo solvers (CPU f64) on the exact
instance the driver builds (load_or_synthesize('mushrooms', labels=(-1,1)),
factored Q = Dy X X' Dy, q = -1, g = IndBox(0, C), h = IndZero, A = y'),
and prints a JSON verdict per method: trajectory agreement over a prefix +
final residuals side by side.

Usage: python tools/adjudicate_dsvm.py [--dataset mushrooms] [--C 0.1]
       [--t 0.15] [--maxit 10000] [--prefix 200]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_instance(dataset):
    from adaprox_tpu.utils.datasets import load_or_synthesize

    x_np, y_np, source = load_or_synthesize(dataset, labels=(-1.0, 1.0))
    dyx = y_np[:, None] * x_np  # B: Q = B B'
    q = -np.ones(y_np.shape[0])
    return x_np, y_np, dyx, q, source


def np_malitsky_pock_dsvm(dyx, q, labels, big_c, sigma0, t, maxit, tol):
    """Reference MP (src/AdaProx.jl:552-629) on the dual-SVM shape:
    f = 0.5 x'BB'x + q'x (factored), g = IndBox(0,C), h = IndZero
    (prox of h* is the identity), A = labels' (1 x N)."""
    n = dyx.shape[0]
    f_val = lambda x: 0.5 * x @ (dyx @ (dyx.T @ x)) + q @ x
    f_grad = lambda x: dyx @ (dyx.T @ x) + q
    clamp = lambda v: np.clip(v, 0.0, big_c)
    a_mv = lambda x: np.array([labels @ x])
    at_mv = lambda y: labels * y[0]

    x = np.zeros(n)
    y = np.zeros(1)
    sigma = sigma0
    a_x = a_mv(x)
    at_y = at_mv(y)
    res_hist = []
    trials_hist = []
    for _ in range(maxit):
        at_y_prev = at_y
        w = y + sigma * a_x
        y = w  # prox_{(IndZero)*} = identity
        at_y = at_mv(y)
        sigma_prev = sigma
        sigma = sigma * np.sqrt(2.0)  # theta stays 1 in the outer loop

        f_x_prev = f_val(x)
        grad_x_prev = f_grad(x)
        x_prev, a_x_prev = x, a_x

        trials = 0
        while True:
            theta = sigma / sigma_prev
            gamma = t * t * sigma
            at_ybar = (1 + theta) * at_y - theta * at_y_prev
            v = x_prev - gamma * (at_ybar + grad_x_prev)
            x = clamp(v)
            a_x = a_mv(x)
            f_x = f_val(x)
            dx = x - x_prev
            lhs = gamma * sigma * np.sum((a_x - a_x_prev) ** 2) + 2 * gamma * (
                f_x - f_x_prev - grad_x_prev @ dx)
            if lhs <= 0.95 * (dx @ dx) or trials >= 100:
                break
            sigma /= 2
            trials += 1
        grad_x = f_grad(x)
        primal = (v - x) / gamma + grad_x + at_y
        dual = (w - y) / sigma_prev - a_x
        nr = float(np.sqrt(primal @ primal + dual @ dual))
        res_hist.append(nr)
        trials_hist.append(trials)
        if nr <= tol:
            break
    return np.asarray(res_hist), np.asarray(trials_hist)


def np_condat_vu_dsvm(dyx, q, labels, big_c, lf, maxit, tol):
    """Reference condat_vu = adaptive_primal_dual with FixedStepsize
    (src/AdaProx.jl:369-416, engine :312-364). Step heuristics par=5,
    par2=100 as in the reference."""
    n = dyx.shape[0]
    f_grad = lambda x: dyx @ (dyx.T @ x) + q
    clamp = lambda v: np.clip(v, 0.0, big_c)
    a_mv = lambda x: np.array([labels @ x])
    at_mv = lambda y: labels * y[0]
    norm_a = float(np.linalg.norm(labels))

    par, par2 = 5.0, 100.0
    alpha = 1.0 if norm_a > par * lf else par2 * norm_a / lf
    gamma = 1.0 / (lf / 2 + norm_a / alpha)
    sigma = 0.99 / (norm_a * alpha)

    x = np.zeros(n)
    y = np.zeros(1)
    a_x = a_mv(x)
    g_x = f_grad(x)
    at_y = at_mv(y)
    v = x - gamma * (g_x + at_y)
    x_prev, a_x_prev = x, a_x
    x = clamp(v)
    res_hist = []
    for _ in range(maxit):
        a_x = a_mv(x)
        g_x = f_grad(x)
        primal = (v - x) / gamma + g_x + at_y
        # FixedStepsize: rho = gamma_new/gamma_old = 1
        w = y + sigma * (2 * a_x - a_x_prev)
        y_new = w  # prox of (IndZero)* = identity
        dual = (w - y_new) / sigma - a_x
        nr = float(np.sqrt(primal @ primal + dual @ dual))
        res_hist.append(nr)
        y = y_new
        at_y = at_mv(y)
        v = x - gamma * (g_x + at_y)
        x_prev, a_x_prev = x, a_x
        x = clamp(v)
        if nr <= tol:
            break
    return np.asarray(res_hist)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="mushrooms")
    p.add_argument("--C", type=float, default=0.1)
    p.add_argument("--t", type=float, default=0.15)
    p.add_argument("--maxit", type=int, default=10_000)
    p.add_argument("--prefix", type=int, default=200,
                   help="iterations of strict trajectory comparison")
    p.add_argument("--tol", type=float, default=1e-5)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import adaprox_tpu as ap
    from adaprox_tpu.models.objectives import FactoredQuadratic

    x_np, y_np, dyx, q, source = build_instance(args.dataset)
    n = y_np.shape[0]
    norm_a = float(np.linalg.norm(y_np))
    # Frobenius norm of Q gram-free: ||Q||_F = ||B'B||_F
    btb = dyx.T @ dyx
    lf = float(np.linalg.norm(btb, "fro"))
    print(json.dumps({"instance": args.dataset, "source": source,
                      "shape": list(x_np.shape), "C": args.C,
                      "norm_a": norm_a, "lf_frob": lf}), flush=True)

    f = FactoredQuadratic(b_mat=jnp.asarray(dyx), q_vec=jnp.asarray(q))
    g = ap.IndBox(lo=0.0, hi=args.C)
    h = ap.IndZero()
    a_op = ap.DenseOperator(a=jnp.asarray(y_np[None, :]))
    x0 = jnp.zeros(n)
    y0 = jnp.zeros(1)

    # --- Malitsky-Pock ------------------------------------------------------
    sigma0 = 1.0 / norm_a
    mp_res, mp_trials = np_malitsky_pock_dsvm(
        dyx, q, y_np, args.C, sigma0, args.t, args.maxit, args.tol)
    sol = ap.malitsky_pock(
        x0, y0, f=f, g=g, h=h, A=a_op, sigma=sigma0, t=args.t,
        tol=args.tol, maxit=args.maxit, history=True)
    # shared verdict form (knife-edge linesearches flip at 1-ulp
    # formulation differences — CLAUDE.md: agreed prefix + endpoints)
    from tools.adjudicate_f0 import _verdict

    print(json.dumps(_verdict(f"Malitsky-Pock (t={args.t})", mp_res, sol,
                              args.tol, args.prefix)), flush=True)

    # --- Condat-Vu -----------------------------------------------------------
    cv_res = np_condat_vu_dsvm(dyx, q, y_np, args.C, lf, args.maxit, args.tol)
    sol_cv = ap.condat_vu(
        x0, y0, f=f, g=g, h=h, A=a_op, Lf=lf, tol=args.tol,
        maxit=args.maxit, history=True)
    print(json.dumps(_verdict("Condat-Vu", cv_res, sol_cv, args.tol,
                              args.prefix)), flush=True)


if __name__ == "__main__":
    main()
