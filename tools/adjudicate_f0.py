"""Adjudicate the sqrt-lasso / LAD plateau rows (VERDICT r4 next-round #5).

RESULTS.md's square_root_lasso and least_absolute_deviation sections show
Condat-Vu and the best Malitsky-Pock variants plateauing above tol on the
synthetic stand-in datasets — asserted so far only by budget-matching
against the reference's own tol/maxit regime. Same two hypotheses as the
r4 dual-SVM adjudication (tools/adjudicate_dsvm.py):

  (a) genuine algorithm behavior on THIS instance — an independent NumPy
      transcription of the reference loops (src/AdaProx.jl:552-629 MP;
      :312-364 + FixedStepsize for CV) on the same data must plateau the
      same way;
  (b) a solver bug — the mirror would converge where the solver does not.

Problem shape (square_root_lasso/runme.jl:18-42; LAD runme.jl:40-42):
f = 0, g = lam*||.||_1, h = Translate(inner, -y) with inner = NormL2
(sqrt-lasso) or NormL1 (LAD), A = [X 1]. The dual prox is the Moreau
composition exactly as ops.prox.MoreauConjugate evaluates it (matching
ProximalCore's prox(convex_conjugate(h), w, sigma), src/AdaProx.jl:345).

Usage: python tools/adjudicate_f0.py [--family srl|lad]
       [--dataset housing_scale] [--lam 10] [--t 0.5] [--maxit 5000]
       [--prefix 200] [--tol 1e-5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def soft(v, thr):
    return np.sign(v) * np.maximum(np.abs(v) - thr, 0.0)


def prox_inner_l2(v, gamma):
    """NormL2 (lam=1) block soft-threshold, transcribing ops.prox.L2Norm."""
    nrm = np.sqrt(np.sum(v * v))
    scale = (1 - gamma / (nrm if nrm > 0 else 1.0)) if nrm > gamma else 0.0
    return scale * v


def prox_inner_l1(v, gamma):
    return soft(v, gamma)


def make_prox_hstar(inner_prox, yv):
    """prox_{sigma h*} via the Moreau identity with h = Translate(inner,
    b=-yv) — composed exactly as MoreauConjugate.prox -> Translate.prox
    (ops/prox.py:528-530,597-600) so rounding matches the solver."""

    def prox_hstar(w, sigma):
        v = w / sigma
        u = inner_prox(v + (-yv), 1.0 / sigma) - (-yv)  # Translate.prox
        return w - sigma * u

    return prox_hstar


def np_malitsky_pock_f0(a, yv, lam, inner_prox, sigma0, t, maxit, tol):
    """Reference MP (src/AdaProx.jl:552-629) with f = 0: the linesearch
    acceptance reduces to gamma*sigma*||A dx||^2 <= 0.95||dx||^2 (the
    Bregman term is identically zero)."""
    m, n = a.shape
    prox_g = lambda v, gamma: soft(v, gamma * lam)
    prox_hstar = make_prox_hstar(inner_prox, yv)

    x = np.zeros(n)
    y = np.zeros(m)
    sigma = sigma0
    a_x = a @ x
    at_y = a.T @ y
    res_hist = []
    for _ in range(maxit):
        at_y_prev = at_y
        w = y + sigma * a_x
        y = prox_hstar(w, sigma)
        at_y = a.T @ y
        sigma_prev = sigma
        sigma = sigma * np.sqrt(2.0)  # theta stays 1 in the outer loop

        x_prev, a_x_prev = x, a_x
        trials = 0
        while True:
            theta = sigma / sigma_prev
            gamma = t * t * sigma
            at_ybar = (1 + theta) * at_y - theta * at_y_prev
            v = x_prev - gamma * at_ybar  # grad f = 0
            x = prox_g(v, gamma)
            a_x = a @ x
            dx = x - x_prev
            lhs = gamma * sigma * np.sum((a_x - a_x_prev) ** 2)
            if lhs <= 0.95 * (dx @ dx) or trials >= 100:
                break
            sigma /= 2
            trials += 1
        primal = (v - x) / gamma + at_y
        dual = (w - y) / sigma_prev - a_x
        nr = float(np.sqrt(primal @ primal + dual @ dual))
        res_hist.append(nr)
        if nr <= tol:
            break
    return np.asarray(res_hist)


def np_condat_vu_f0(a, yv, lam, inner_prox, maxit, tol):
    """Reference condat_vu (src/AdaProx.jl:369-416 heuristics with Lf = 0,
    engine loop :312-364) with f = 0: alpha = 1, gamma = 1/||A||,
    sigma = 0.99/||A|| (Frobenius norm, Julia norm(A))."""
    m, n = a.shape
    prox_g = lambda v, gamma: soft(v, gamma * lam)
    prox_hstar = make_prox_hstar(inner_prox, yv)
    norm_a = float(np.linalg.norm(a))
    gamma = 1.0 / (0.0 / 2 + norm_a / 1.0)
    sigma = 0.99 / (norm_a * 1.0)

    x = np.zeros(n)
    y = np.zeros(m)
    a_x = a @ x
    at_y = a.T @ y
    v = x - gamma * at_y
    x_prev, a_x_prev = x, a_x
    x = prox_g(v, gamma)
    res_hist = []
    for _ in range(maxit):
        a_x = a @ x
        primal = (v - x) / gamma + at_y
        w = y + sigma * (2 * a_x - a_x_prev)  # rho = 1 (fixed steps)
        y_new = prox_hstar(w, sigma)
        dual = (w - y_new) / sigma - a_x
        nr = float(np.sqrt(primal @ primal + dual @ dual))
        res_hist.append(nr)
        y = y_new
        at_y = a.T @ y
        v = x - gamma * at_y
        x_prev, a_x_prev = x, a_x
        x = prox_g(v, gamma)
        if nr <= tol:
            break
    return np.asarray(res_hist)


def _verdict(method, mirror_res, sol, tol, prefix):
    k = int(sol.numit)
    solver_res = np.asarray(sol.records.norm_res)[:k]
    pre = min(prefix, k, len(mirror_res))
    rel = np.abs(solver_res[:pre] - mirror_res[:pre]) / np.maximum(
        1e-30, np.abs(mirror_res[:pre]))
    first_split = int(np.argmax(rel > 1e-6)) if (rel > 1e-6).any() else pre
    return {
        "method": method,
        "mirror_final_res": float(mirror_res[-1]),
        "mirror_numit": int(len(mirror_res)),
        "solver_final_res": float(sol.norm_res),
        "solver_numit": k,
        "agreed_prefix_iters": first_split,
        "max_rel_diff_in_prefix": float(rel[:max(first_split, 1)].max()),
        "mirror_converged": bool(mirror_res[-1] <= tol),
        "solver_converged": bool(float(sol.norm_res) <= tol),
        "same_order_final": bool(
            0.1 < (float(sol.norm_res) + 1e-30)
            / (mirror_res[-1] + 1e-30) < 10),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--family", choices=("srl", "lad"), default="srl")
    p.add_argument("--dataset", default="housing_scale")
    p.add_argument("--lam", type=float, default=10.0)
    p.add_argument("--t", type=float, default=0.5)
    p.add_argument("--maxit", type=int, default=5000)
    p.add_argument("--prefix", type=int, default=200)
    p.add_argument("--tol", type=float, default=1e-5)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import adaprox_tpu as ap
    from adaprox_tpu.utils.datasets import load_or_synthesize

    x_np, y_np, source = load_or_synthesize(args.dataset)
    m = x_np.shape[0]
    a_np = np.hstack([x_np, np.ones((m, 1))])
    n = a_np.shape[1]
    norm_a = float(np.linalg.norm(a_np))
    inner_cls = ap.L2Norm if args.family == "srl" else ap.L1Norm
    inner_prox = prox_inner_l2 if args.family == "srl" else prox_inner_l1
    print(json.dumps({"family": args.family, "instance": args.dataset,
                      "source": source, "shape": list(a_np.shape),
                      "lam": args.lam, "t": args.t, "norm_a": norm_a}),
          flush=True)

    f = ap.ZeroSmooth()
    g = ap.L1Norm(lam=args.lam)
    h = ap.Translate(inner=inner_cls(lam=1.0), b=-jnp.asarray(y_np))
    a_op = ap.DenseOperator(a=jnp.asarray(a_np))
    x0 = jnp.zeros(n)
    y0 = jnp.zeros(m)

    # --- Malitsky-Pock (driver: sigma0 = 1.0, t from the sweep) -------------
    mp_res = np_malitsky_pock_f0(a_np, y_np, args.lam, inner_prox, 1.0,
                                 args.t, args.maxit, args.tol)
    sol = ap.malitsky_pock(x0, y0, f=f, g=g, h=h, A=a_op, sigma=1.0,
                           t=args.t, tol=args.tol, maxit=args.maxit,
                           history=True)
    print(json.dumps(_verdict(f"Malitsky-Pock (t={args.t})", mp_res, sol,
                              args.tol, args.prefix)), flush=True)

    # --- Condat-Vu (driver: Lf = 0, Frobenius ||A||) -------------------------
    cv_res = np_condat_vu_f0(a_np, y_np, args.lam, inner_prox, args.maxit,
                             args.tol)
    sol_cv = ap.condat_vu(x0, y0, f=f, g=g, h=h, A=a_op, Lf=0.0,
                          norm_A=norm_a, tol=args.tol, maxit=args.maxit,
                          history=True)
    print(json.dumps(_verdict("Condat-Vu", cv_res, sol_cv, args.tol,
                              args.prefix)), flush=True)


if __name__ == "__main__":
    main()
