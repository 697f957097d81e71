"""Malitsky-Pock primal-dual with linesearch (Algorithm 4 of "A first-order
primal-dual algorithm with linesearch", applied to the dual; reference
src/AdaProx.jl:552-629).

Inner linesearch: halve sigma until

    gamma*sigma*||A x - A x_prev||^2
      + 2*gamma*(f(x) - f(x_prev) - <grad_prev, x - x_prev>)  <=  0.95 ||x - x_prev||^2

Each trial costs 1 prox_g + 1 A-matvec + 1 f-eval; it compiles to a
``lax.while_loop`` nested in the outer iteration, with the oracle counters in
the carry. The gradient at the accepted x is finished once from the carried
forward ``aux``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import prox as prox_ops
from .common import Counters, Records, SolveResult, l2sq, reopen, run_loop
from .rules import validate_positive

__all__ = ["malitsky_pock"]

_MAX_TRIALS = 100


class _Carry(NamedTuple):
    it: jnp.ndarray
    x: jnp.ndarray
    y: jnp.ndarray
    a_x: jnp.ndarray
    at_y: jnp.ndarray
    sigma: jnp.ndarray
    counters: Counters
    norm_res: jnp.ndarray
    ls_failed: jnp.ndarray  # latched: some linesearch exhausted _MAX_TRIALS
    done: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("maxit", "history", "scalar_dtype",
                                              "exact_bregman"))
def _solve(parts, x0, y0, sigma0, t, tol, maxit, history, resume_state=None,
           scalar_dtype=None, exact_bregman=False, it_cap=None):
    f, g, h, a_op = parts
    # every SmoothOracle defines bregman_from_aux (the base returns None),
    # so whether the exact form is actually available is decided by the
    # method's RETURN value inside the linesearch body below — oracles
    # without a cancellation-resistant form fall back to the reference's
    # raw difference there, not here
    use_exact = bool(exact_bregman)
    h_conj = prox_ops.conjugate(h)
    dt = jnp.result_type(x0)
    # scalar hybrid (cf. primal_dual._solve_pd): step sizes, the linesearch
    # acceptance test (a difference of near-equal objective values), and the
    # residual norms run in sdt; prox/matvec vectors stay in the iterate dtype
    sdt = jnp.dtype(scalar_dtype) if scalar_dtype is not None else dt
    upcast = sdt != dt
    t, tol, sigma0 = (jnp.asarray(v, sdt) for v in (t, tol, sigma0))
    # NB: the reference initializes theta = 1 and never updates it in the
    # outer loop (src/AdaProx.jl:597; the linesearch helper's theta is local),
    # so sigma grows by sqrt(2) each iteration before backtracking.
    sqrt2 = jnp.sqrt(jnp.asarray(2.0, sdt))

    if resume_state is not None:
        carry0 = reopen(resume_state, dt, scalar_dtype=sdt,
                        scalar_fields=("sigma", "norm_res"))
    else:
        a_x = a_op.matvec(x0)
        at_y = a_op.rmatvec(y0)
        counters = Counters.zeros().bump(A_evals=1, At_evals=1)
        carry0 = _Carry(
            it=jnp.zeros((), jnp.int32),
            x=x0,
            y=y0,
            a_x=a_x,
            at_y=at_y,
            sigma=jnp.asarray(sigma0, sdt),
            counters=counters,
            norm_res=jnp.asarray(jnp.inf, sdt),
            ls_failed=jnp.zeros((), jnp.bool_),
            done=jnp.zeros((), jnp.bool_),
        )

    def step(c):
        # dual ascent step (src/AdaProx.jl:600-603)
        at_y_prev = c.at_y
        sigma_c_v = c.sigma.astype(dt)
        w = c.y + sigma_c_v * c.a_x
        y, _ = h_conj.prox(w, sigma_c_v)
        at_y = a_op.rmatvec(y)
        counters = c.counters.bump(prox_h_evals=1, At_evals=1)

        sigma_prev = c.sigma
        sigma = c.sigma * sqrt2

        f_x_prev, aux_prev = f.value_and_aux(c.x)
        grad_x_prev = f.grad_from_aux(c.x, aux_prev)
        counters = counters.bump(f_evals=1, grad_f_evals=1)
        x_prev, a_x_prev = c.x, c.a_x

        # linesearch on sigma (backtrack_stepsize_MP, src/AdaProx.jl:555-579)
        def trial(sigma, counters, trials):
            theta = sigma / sigma_prev
            gamma = t**2 * sigma
            gamma_v = gamma.astype(dt)
            theta_v = theta.astype(dt)
            at_ybar = (1 + theta_v) * at_y - theta_v * at_y_prev
            v = x_prev - gamma_v * (at_ybar + grad_x_prev)
            x, _ = g.prox(v, gamma_v)
            a_x = a_op.matvec(x)
            f_x, aux = f.value_and_aux(x)
            counters = counters.bump(prox_g_evals=1, A_evals=1, f_evals=1)
            dax = (a_x - a_x_prev).astype(sdt) if upcast else a_x - a_x_prev
            dx = (x - x_prev).astype(sdt) if upcast else x - x_prev
            breg = None
            if use_exact:
                # f(x) - f(x_prev) - <grad_prev, dx> via the oracle's
                # cancellation-resistant form (>= 0 for convex f): in f32 at
                # benchmark scale the raw difference below carries eps*|f|
                # noise that swamps the 0.95||dx||^2 comparison and stalls
                # the solve (tools/adjudicate_dsvm.py measured MP pinned at
                # residual ~2e+01 where f64 reaches 3e-05)
                breg = f.bregman_from_aux(x - x_prev, aux, aux_prev)
                if breg is not None and upcast:
                    breg = breg.astype(sdt)
            if breg is None:
                breg = (
                    f_x.astype(sdt) - f_x_prev.astype(sdt)
                    - jnp.vdot(grad_x_prev.astype(sdt) if upcast
                               else grad_x_prev, dx).real
                )
            lhs = gamma * sigma * l2sq(dax) + 2 * gamma * breg
            return (sigma, gamma, x, v, a_x, f_x, aux, lhs, counters, trials)

        def cond(cc):
            sigma, _, x, _, _, _, _, lhs, _, trials = cc
            dx = (x - x_prev).astype(sdt) if upcast else x - x_prev
            return jnp.logical_and(
                lhs > 0.95 * l2sq(dx), trials < _MAX_TRIALS
            )

        def body(cc):
            sigma, _, _, _, _, _, _, _, counters, trials = cc
            return trial(sigma / 2, counters, trials + 1)

        c0 = trial(sigma, counters, jnp.zeros((), jnp.int32))
        sigma, gamma, x, v, a_x, f_x, aux, lhs, counters, _ = jax.lax.while_loop(
            cond, body, c0
        )
        # acceptance test at loop exit: still failing means the trial cap hit
        ls_failed = lhs > 0.95 * l2sq(
            (x - x_prev).astype(sdt) if upcast else x - x_prev)
        grad_x = f.grad_from_aux(x, aux)
        counters = counters.bump(grad_f_evals=1)

        if upcast:
            primal_res = ((v.astype(sdt) - x.astype(sdt)) / gamma
                          + grad_x.astype(sdt) + at_y.astype(sdt))
            dual_res = ((w.astype(sdt) - y.astype(sdt)) / sigma_prev
                        - a_x.astype(sdt))
        else:
            primal_res = (v - x) / gamma + grad_x + at_y
            dual_res = (w - y) / sigma_prev - a_x
        norm_res = jnp.sqrt(l2sq(primal_res) + l2sq(dual_res))
        it = c.it + 1

        if history:
            objective = f_x + g(x) + h(a_x)  # uncounted (src/AdaProx.jl:620-622)
        else:
            objective = jnp.zeros((), dt)
        rec = Records(
            it=it,
            gamma=gamma,
            sigma=sigma,
            norm_res=norm_res,
            objective=objective,
            f_evals=counters.f_evals,
            grad_f_evals=counters.grad_f_evals,
            prox_g_evals=counters.prox_g_evals,
            prox_h_evals=counters.prox_h_evals,
            A_evals=counters.A_evals,
            At_evals=counters.At_evals,
            valid=jnp.logical_not(c.done),
        )

        new = _Carry(
            it=it,
            x=x,
            y=y,
            a_x=a_x,
            at_y=at_y,
            sigma=sigma,
            counters=counters,
            norm_res=norm_res,
            ls_failed=jnp.logical_or(c.ls_failed, ls_failed),
            done=jnp.logical_or(c.done, norm_res <= tol),
        )
        return new, rec

    final, recs = run_loop(carry0, step, maxit, history, it_cap=it_cap)
    return SolveResult(
        x=final.x,
        y=final.y,
        numit=final.it,
        norm_res=final.norm_res,
        counters=final.counters,
        records=recs,
        extra=final,  # resumable loop carry
        # cf. the reference's underflow error at src/AdaProx.jl:566-568
        diag={
            "sigma": final.sigma,
            "stepsize_underflow": final.sigma < 1e-12,
            "trials_exhausted": final.ls_failed,
        },
    )


def malitsky_pock(
    x0,
    y0,
    *,
    f,
    g,
    h,
    A,
    sigma,
    t=1.0,
    tol=1e-5,
    maxit=10_000,
    name="MP-ls",
    history=False,
    resume_state=None,
    scalar_dtype=None,
    exact_bregman=False,
    it_cap=None,
):
    """Malitsky-Pock linesearch PD (reference src/AdaProx.jl:581-629).
    ``t`` couples the steps via gamma = t^2 * sigma.

    ``scalar_dtype``: run step sizes, the linesearch acceptance test, and
    residual norms in a wider dtype (the engine-family f64-scalar hybrid).

    ``exact_bregman``: compute the linesearch acceptance test's Bregman
    term via the oracle's cancellation-resistant form when it has one
    (quadratic-type oracles: 0.5*||A dx||^2 from carried auxes) instead of
    the reference's raw objective difference. Mathematically identical;
    numerically it removes the eps*|f| noise floor that stalls f32 solves
    at benchmark scale. Default off = reference-exact trajectories."""
    # sigma <= 0 makes every dual prox step degenerate and t <= 0 flips the
    # gamma = t^2*sigma coupling — both NaN/stall silently inside the jitted
    # loop; fail loudly here instead (concrete scalars only; traced sweep
    # values pass through)
    validate_positive(sigma=sigma, t=t)
    x0 = jnp.asarray(x0)
    res = _solve(
        (f, g, h, A), x0, jnp.asarray(y0), sigma, t,
        tol, int(maxit), bool(history),
        resume_state=resume_state, scalar_dtype=scalar_dtype,
        exact_bregman=bool(exact_bregman),
        it_cap=None if it_cap is None else jnp.asarray(it_cap, jnp.int32),
    )
    return res.with_name(name)
