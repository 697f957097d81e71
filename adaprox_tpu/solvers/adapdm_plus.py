"""Fully-adaptive primal-dual with linesearch on the operator-norm estimate
("AdaPDM+"; reference ``adaptive_linesearch_primal_dual``,
src/AdaProx.jl:463-550).

For when ||A|| is unknown: maintains an estimate ``eta`` (optimistically
decayed by R=0.95 each outer iteration, inflated by r=2 inside the
linesearch) and accepts a trial dual step once

    eta >= ||A'y_next - A'y|| / ||y_next - y||.

Each inner trial costs 1 prox_{h*} + 1 A'-matvec; the loop is a
``lax.while_loop`` whose carry holds the trial state and oracle counters.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import prox as prox_ops
from ..solvers.rules import nan_to_zero, validate_positive
from .common import Counters, Records, SolveResult, l2sq, reopen, run_loop

__all__ = ["adaptive_linesearch_primal_dual"]

_MAX_TRIALS = 100


class _Carry(NamedTuple):
    it: jnp.ndarray
    x: jnp.ndarray
    v: jnp.ndarray
    y: jnp.ndarray
    at_y: jnp.ndarray
    x_prev: jnp.ndarray
    a_x_prev: jnp.ndarray
    grad_prev: jnp.ndarray
    gamma: jnp.ndarray
    gamma_prev: jnp.ndarray
    eta: jnp.ndarray
    counters: Counters
    norm_res: jnp.ndarray
    ck_x: jnp.ndarray
    ck_counters: Counters
    ls_failed: jnp.ndarray  # latched: some linesearch exhausted _MAX_TRIALS
    done: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("maxit", "history", "scalar_dtype"))
def _solve(parts, x0, y0, gamma0, eta0, t, delta, big_theta, r, big_r, tol, maxit, history,
           resume_state=None, scalar_dtype=None, it_cap=None):
    f, g, h, a_op = parts
    h_conj = prox_ops.conjugate(h)
    dt = jnp.result_type(x0)
    # scalar hybrid (cf. primal_dual._solve_pd): the gamma/eta recurrences,
    # curvature reductions, the eta acceptance ratio, and residual norms run
    # in sdt; prox/matvec vectors stay in the iterate dtype
    sdt = jnp.dtype(scalar_dtype) if scalar_dtype is not None else dt
    upcast = sdt != dt
    t, big_theta, r, big_r, tol, eta0 = (
        jnp.asarray(v, sdt) for v in (t, big_theta, r, big_r, tol, eta0))
    delta1 = 1 + jnp.asarray(delta, sdt)

    if resume_state is not None:
        carry0 = reopen(resume_state, dt, scalar_dtype=sdt,
                        scalar_fields=("gamma", "gamma_prev", "eta",
                                       "norm_res"))
    else:
        # warm-up (src/AdaProx.jl:491-499)
        a_x = a_op.matvec(x0)
        _, aux0 = f.value_and_aux(x0)
        grad0 = f.grad_from_aux(x0, aux0)
        at_y = a_op.rmatvec(y0)
        counters = Counters.zeros().bump(A_evals=1, f_evals=1, grad_f_evals=1, At_evals=1)
        gamma0 = jnp.asarray(gamma0, sdt)
        gamma0_v = gamma0.astype(dt)
        v = x0 - gamma0_v * (grad0 + at_y)
        x1, _ = g.prox(v, gamma0_v)
        counters = counters.bump(prox_g_evals=1)

        carry0 = _Carry(
            it=jnp.zeros((), jnp.int32),
            x=x1,
            v=v,
            y=y0,
            at_y=at_y,
            x_prev=x0,
            a_x_prev=a_x,
            grad_prev=grad0,
            gamma=gamma0,
            gamma_prev=gamma0,
            eta=jnp.asarray(eta0, sdt),
            counters=counters,
            norm_res=jnp.asarray(jnp.inf, sdt),
            ck_x=x1,
            ck_counters=counters,
            ls_failed=jnp.zeros((), jnp.bool_),
            done=jnp.zeros((), jnp.bool_),
        )

    def step(c):
        # outer half 1 (src/AdaProx.jl:502-514)
        a_x = a_op.matvec(c.x)
        f_x, aux = f.value_and_aux(c.x)
        grad_x = f.grad_from_aux(c.x, aux)
        counters = c.counters.bump(A_evals=1, f_evals=1, grad_f_evals=1)

        if upcast:
            primal_res = ((c.v.astype(sdt) - c.x.astype(sdt)) / c.gamma
                          + grad_x.astype(sdt) + c.at_y.astype(sdt))
        else:
            primal_res = (c.v - c.x) / c.gamma + grad_x + c.at_y

        dg = (grad_x - c.grad_prev).astype(sdt) if upcast else grad_x - c.grad_prev
        dx = (c.x - c.x_prev).astype(sdt) if upcast else c.x - c.x_prev
        dgdx = jnp.vdot(dg, dx).real
        # cancellation-free form of gamma*L*(gamma*C - 1) (src/AdaProx.jl:
        # 507-509); see rules.AdaPGMRule.update for why
        big_delta = nan_to_zero(
            c.gamma * (c.gamma * l2sq(dg) - dgdx) / l2sq(dx)
        )
        xi_bar = t**2 * c.gamma**2 * c.eta**2 * delta1**2
        m4xim1 = 1 - 4 * xi_bar

        eta = big_r * c.eta  # optimistic decay (src/AdaProx.jl:513)

        # inner linesearch on eta (src/AdaProx.jl:516-533)
        def trial(eta, counters, trials):
            # D + sqrt(D^2 + ...) is mathematically >= 0 but can round one
            # ulp negative when D < 0 and the xi-term underflows next to
            # D^2 (AdaPGMRule.update has the same clamp for the identical
            # expression) — unclamped it NaN-poisons gamma_next
            denom_ls = jnp.maximum(
                big_delta
                + jnp.sqrt(big_delta**2 + m4xim1 * (t * eta * c.gamma) ** 2),
                0.0)
            gamma_next = jnp.minimum(
                c.gamma * jnp.sqrt(1 + c.gamma / c.gamma_prev),
                jnp.minimum(
                    1 / (2 * big_theta * t * eta),
                    c.gamma * jnp.sqrt(m4xim1 / (2 * delta1 * denom_ls)),
                ),
            )
            rho = gamma_next / c.gamma
            sigma = t**2 * gamma_next
            sigma_v = sigma.astype(dt)
            rho_v = rho.astype(dt)
            w = c.y + sigma_v * ((1 + rho_v) * a_x - rho_v * c.a_x_prev)
            y_next, _ = h_conj.prox(w, sigma_v)
            at_y_next = a_op.rmatvec(y_next)
            counters = counters.bump(prox_h_evals=1, At_evals=1)
            daty = ((at_y_next - c.at_y).astype(sdt) if upcast
                    else at_y_next - c.at_y)
            dy = (y_next - c.y).astype(sdt) if upcast else y_next - c.y
            ok = eta >= jnp.sqrt(l2sq(daty)) / jnp.sqrt(l2sq(dy))
            return (eta, gamma_next, sigma, w, y_next, at_y_next, ok, counters, trials)

        def cond(cc):
            ok, trials = cc[6], cc[8]
            return jnp.logical_and(jnp.logical_not(ok), trials < _MAX_TRIALS)

        def body(cc):
            eta, counters, trials = cc[0], cc[7], cc[8]
            return trial(eta * r, counters, trials + 1)

        c0 = trial(eta, counters, jnp.zeros((), jnp.int32))
        eta, gamma_next, sigma, w, y, at_y, ok, counters, _ = jax.lax.while_loop(
            cond, body, c0
        )
        ls_failed = jnp.logical_not(ok)  # only possible when the cap hit
        gamma, gamma_prev = gamma_next, c.gamma

        if upcast:
            dual_res = ((w.astype(sdt) - y.astype(sdt)) / sigma
                        - a_x.astype(sdt))
        else:
            dual_res = (w - y) / sigma - a_x
        norm_res = jnp.sqrt(l2sq(primal_res) + l2sq(dual_res))
        ck = counters
        it = c.it + 1

        if history:
            objective = f_x + g(c.x) + h(a_x)  # uncounted (src/AdaProx.jl:538-540)
        else:
            objective = jnp.zeros((), dt)
        rec = Records(
            it=it,
            gamma=gamma,
            sigma=sigma,
            norm_res=norm_res,
            objective=objective,
            f_evals=ck.f_evals,
            grad_f_evals=ck.grad_f_evals,
            prox_g_evals=ck.prox_g_evals,
            prox_h_evals=ck.prox_h_evals,
            A_evals=ck.A_evals,
            At_evals=ck.At_evals,
            valid=jnp.logical_not(c.done),
        )

        # outer half 2 (src/AdaProx.jl:545-547; skipped by the reference on
        # the converging iteration — ck snapshots taken above)
        gamma_v = gamma.astype(dt)
        v = c.x - gamma_v * (grad_x + at_y)
        x_new, _ = g.prox(v, gamma_v)
        counters = counters.bump(prox_g_evals=1)

        new = _Carry(
            it=it,
            x=x_new,
            v=v,
            y=y,
            at_y=at_y,
            x_prev=c.x,
            a_x_prev=a_x,
            grad_prev=grad_x,
            gamma=gamma,
            gamma_prev=gamma_prev,
            eta=eta,
            counters=counters,
            norm_res=norm_res,
            ck_x=c.x,
            ck_counters=ck,
            ls_failed=jnp.logical_or(c.ls_failed, ls_failed),
            done=jnp.logical_or(c.done, norm_res <= tol),
        )
        return new, rec

    final, recs = run_loop(carry0, step, maxit, history, it_cap=it_cap)
    converged = final.norm_res <= tol
    x_out = jnp.where(converged, final.ck_x, final.x)
    counters = jax.tree_util.tree_map(
        lambda a, b: jnp.where(converged, a, b), final.ck_counters, final.counters
    )
    return SolveResult(
        x=x_out,
        y=final.y,
        numit=final.it,
        norm_res=final.norm_res,
        counters=counters,
        records=recs,
        extra=final,  # resumable loop carry
        diag={"eta": final.eta, "trials_exhausted": final.ls_failed},
    )


def adaptive_linesearch_primal_dual(
    x0,
    y0,
    *,
    f,
    g,
    h,
    A,
    gamma=None,
    eta=1.0,
    t=1.0,
    delta=1e-8,
    Theta=1.2,
    r=2.0,
    R=0.95,
    tol=1e-5,
    maxit=10_000,
    name="AdaPDM+",
    history=False,
    resume_state=None,
    scalar_dtype=None,
    it_cap=None,
):
    """AdaPDM+ (reference src/AdaProx.jl:463-550): fully adaptive PD that
    needs no ||A||, only an initial estimate ``eta``.

    ``scalar_dtype``: run the gamma/eta recurrences, curvature reductions,
    the linesearch acceptance ratio, and residual norms in a wider dtype
    (the engine-family f64-scalar hybrid)."""
    # t <= 0 flips the sigma = t^2*gamma coupling and eta <= 0 breaks the
    # operator-norm estimate recurrence — both NaN silently inside the
    # jitted loop; fail loudly (concrete scalars only)
    validate_positive(eta=eta, t=t)
    if not Theta > delta + 1:
        raise ValueError("must have Theta > delta + 1")
    if gamma is None:
        gamma = 1.0 / (2 * Theta * t * eta)
    elif gamma > 1.0 / (2 * Theta * t * eta):
        raise ValueError("gamma is too large")
    x0 = jnp.asarray(x0)
    res = _solve(
        (f, g, h, A), x0, jnp.asarray(y0), gamma, eta, t, delta, Theta, r, R,
        tol, int(maxit), bool(history),
        resume_state=resume_state, scalar_dtype=scalar_dtype,
        it_cap=None if it_cap is None else jnp.asarray(it_cap, jnp.int32),
    )
    return res.with_name(name)
