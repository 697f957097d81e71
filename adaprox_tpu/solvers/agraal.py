"""Adaptive Golden Ratio Algorithm (aGRAAL).

Reference src/AdaProx.jl:150-192, after Malitsky, "Golden ratio algorithms
for variational inequalities", Math. Prog. 184 (2020). Stepsize from the
inverse-cocoercivity estimate ||dx||^2 / ||dgrad||^2 and a golden-ratio
averaging sequence x_bar.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .common import Counters, Records, SolveResult, l2sq, reopen, run_loop

__all__ = ["agraal"]


class _Carry(NamedTuple):
    it: jnp.ndarray
    x: jnp.ndarray
    x_prev: jnp.ndarray
    x_bar: jnp.ndarray
    grad_x: jnp.ndarray
    grad_x_prev: jnp.ndarray
    gamma: jnp.ndarray
    theta: jnp.ndarray
    counters: Counters
    ck_counters: Counters
    norm_res: jnp.ndarray
    done: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("maxit", "history", "scalar_dtype"))
def _solve(parts, x1, x0, gamma0, gamma_max, phi, tol, maxit, history,
           resume_state=None, scalar_dtype=None, it_cap=None):
    f, g = parts
    dt = jnp.result_type(x1)
    # scalar hybrid: gamma/theta recurrence, curvature ratio, and residual
    # norm in sdt; vectors stay in the iterate dtype (cf. primal_dual)
    sdt = jnp.dtype(scalar_dtype) if scalar_dtype is not None else dt
    gamma_max, tol = jnp.asarray(gamma_max, sdt), jnp.asarray(tol, sdt)
    phi = jnp.asarray(phi, sdt)
    rho = 1 / phi + 1 / phi**2

    if resume_state is not None:
        carry0 = reopen(resume_state, dt, scalar_dtype=sdt,
                        scalar_fields=("gamma", "theta", "norm_res"))
        return _run(parts, carry0, rho, phi, gamma_max, tol, maxit, history,
                    it_cap=it_cap)

    _, aux1 = f.value_and_aux(x1)
    grad_x = f.grad_from_aux(x1, aux1)
    _, aux0 = f.value_and_aux(x0)
    grad_x_prev = f.grad_from_aux(x0, aux0)
    counters = Counters.zeros().bump(f_evals=2, grad_f_evals=2)

    gamma0 = jnp.where(
        jnp.asarray(gamma0, sdt) > 0,
        jnp.asarray(gamma0, sdt),
        (jnp.sqrt(l2sq((x1 - x0).astype(sdt)))
         / jnp.sqrt(l2sq((grad_x - grad_x_prev).astype(sdt)))),
    )

    carry0 = _Carry(
        it=jnp.zeros((), jnp.int32),
        x=x1,
        x_prev=x0,
        x_bar=x1,
        grad_x=grad_x,
        grad_x_prev=grad_x_prev,
        gamma=gamma0,
        theta=jnp.ones((), sdt),
        counters=counters,
        ck_counters=counters,
        norm_res=jnp.asarray(jnp.inf, sdt),
        done=jnp.zeros((), jnp.bool_),
    )
    return _run(parts, carry0, rho, phi, gamma_max, tol, maxit, history,
                it_cap=it_cap)


def _run(parts, carry0, rho, phi, gamma_max, tol, maxit, history,
         it_cap=None):
    f, g = parts
    dt = carry0.gamma.dtype  # the scalar dtype (sdt)
    vdt = jnp.result_type(carry0.x)

    def step(c):
        # src/AdaProx.jl:175-189; identical iterates give C = 0/0 = NaN —
        # treat as +inf so the min keeps the growth bound (f32 robustness)
        curv = (l2sq((c.x - c.x_prev).astype(dt))
                / l2sq((c.grad_x - c.grad_x_prev).astype(dt)))
        curv = jnp.where(jnp.isnan(curv), jnp.inf, curv)
        gamma = jnp.minimum(
            jnp.minimum(rho * c.gamma, phi * c.theta * curv / (4 * c.gamma)),
            gamma_max,
        )
        theta = phi * gamma / c.gamma
        gamma_v = gamma.astype(vdt)
        phi_v = phi.astype(vdt)
        x_bar = ((phi_v - 1) * c.x + c.x_bar) / phi_v
        x_prev, grad_x_prev = c.x, c.grad_x
        x, g_x = g.prox(x_bar - gamma_v * grad_x_prev, gamma_v)
        counters = c.counters.bump(prox_g_evals=1)
        norm_res = jnp.sqrt(l2sq((x - x_prev).astype(dt))) / gamma
        ck = counters
        it = c.it + 1

        if history:
            objective = f.value(x) + g_x  # uncounted, src/AdaProx.jl:183-185
        else:
            objective = jnp.zeros((), dt)
        rec = Records(
            it=it,
            gamma=gamma,
            sigma=jnp.zeros((), dt),
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

        # gradient for the next iteration (the reference skips this on the
        # converging iteration, src/AdaProx.jl:186-189 — ck snapshot above)
        _, aux = f.value_and_aux(x)
        grad_x = f.grad_from_aux(x, aux)
        counters = counters.bump(f_evals=1, grad_f_evals=1)

        new = _Carry(
            it=it,
            x=x,
            x_prev=x_prev,
            x_bar=x_bar,
            grad_x=grad_x,
            grad_x_prev=grad_x_prev,
            gamma=gamma,
            theta=theta,
            counters=counters,
            ck_counters=ck,
            norm_res=norm_res,
            done=jnp.logical_or(c.done, norm_res <= tol),
        )
        return new, rec

    final, recs = run_loop(carry0, step, maxit, history, it_cap=it_cap)
    converged = final.norm_res <= tol
    counters = jax.tree_util.tree_map(
        lambda a, b: jnp.where(converged, a, b), final.ck_counters, final.counters
    )
    return SolveResult(
        x=final.x,
        y=None,
        numit=final.it,
        norm_res=final.norm_res,
        counters=counters,
        records=recs,
        extra=final,  # resumable loop carry
    )


def agraal(
    x1,
    *,
    f,
    g,
    x0=None,
    gamma0=None,
    gamma_max=1e6,
    phi=1.5,
    tol=1e-5,
    maxit=100_000,
    name="aGRAAL",
    key=None,
    history=False,
    resume_state=None,
    scalar_dtype=None,
    it_cap=None,
):
    """aGRAAL (reference src/AdaProx.jl:150-192). ``x0`` defaults to a random
    perturbation of ``x1`` (pass ``key`` for determinism); ``gamma0`` defaults
    to the secant estimate ||x1-x0|| / ||grad(x1)-grad(x0)||."""
    x1 = jnp.asarray(x1)
    if x0 is None:
        if key is None:
            key = jax.random.PRNGKey(0)
        x0 = x1 + jax.random.normal(key, x1.shape, x1.dtype)
    if gamma0 is None:
        gamma0 = 0.0  # sentinel: computed from the secant estimate in _solve
    res = _solve(
        (f, g), x1, jnp.asarray(x0), gamma0, gamma_max, phi,
        tol, int(maxit), bool(history),
        resume_state=resume_state, scalar_dtype=scalar_dtype,
        it_cap=None if it_cap is None else jnp.asarray(it_cap, jnp.int32),
    )
    return res.with_name(name)
