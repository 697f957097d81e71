"""Fixed-stepsize accelerated proximal gradient with optional strong
convexity (Chambolle-Pock style momentum; reference src/AdaProx.jl:91-142,
after Chambolle & Pock, "An introduction to continuous optimization for
imaging", Acta Numerica 25 (2016)).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .common import Counters, Records, SolveResult, l2sq, reopen, run_loop

__all__ = ["fixed_nesterov"]


class _Carry(NamedTuple):
    it: jnp.ndarray
    x: jnp.ndarray
    x_prev: jnp.ndarray
    gamma: jnp.ndarray  # constant, but carried: live rows / checkpoints
    theta: jnp.ndarray  # read the step size from the carry (utils.live)
    counters: Counters
    norm_res: jnp.ndarray
    done: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("maxit", "history", "strongly_convex",
                                             "scalar_dtype"))
def _solve(parts, x0, gamma, muf, mug, theta0, tol, maxit, history, strongly_convex,
           resume_state=None, scalar_dtype=None, it_cap=None):
    f, g = parts
    dt = jnp.result_type(x0)
    # scalar hybrid: theta/beta recurrence and residual norm in sdt, vector
    # arithmetic in the iterate dtype (cf. primal_dual._solve_pd)
    sdt = jnp.dtype(scalar_dtype) if scalar_dtype is not None else dt
    gamma, muf, mug, theta0, tol = (jnp.asarray(v, sdt) for v in (gamma, muf, mug, theta0, tol))
    mu = muf + mug
    q = gamma * mu / (1 + gamma * mug)
    gamma_v = gamma.astype(dt)

    if resume_state is not None:
        carry0 = reopen(resume_state, dt, scalar_dtype=sdt,
                        scalar_fields=("theta", "norm_res"))
        # the step math uses the gamma ARGUMENT (closure); overwrite the
        # carried copy so telemetry/records report the step size actually
        # used when a resume passes a different gamma than the checkpoint
        carry0 = carry0._replace(gamma=gamma)
    else:
        carry0 = _Carry(
            it=jnp.zeros((), jnp.int32),
            x=x0,
            x_prev=x0,
            gamma=gamma,
            theta=jnp.asarray(theta0, sdt),
            counters=Counters.zeros(),
            norm_res=jnp.asarray(jnp.inf, sdt),
            done=jnp.zeros((), jnp.bool_),
        )

    def step(c):
        theta_prev = c.theta
        if strongly_convex:
            # src/AdaProx.jl:126-127
            a = 1 - q * theta_prev**2
            theta = (a + jnp.sqrt(a**2 + 4 * theta_prev**2)) / 2
            beta = (
                (theta_prev - 1)
                * (1 + gamma * mug - theta * gamma * mu)
                / theta
                / (1 - gamma * muf)
            )
        else:
            # src/AdaProx.jl:123-124
            theta = (1 + jnp.sqrt(1 + 4 * theta_prev**2)) / 2
            beta = (theta_prev - 1) / theta

        z = c.x + beta.astype(dt) * (c.x - c.x_prev)
        _, aux = f.value_and_aux(z)
        grad_z = f.grad_from_aux(z, aux)
        counters = c.counters.bump(f_evals=1, grad_f_evals=1)
        x, g_x = g.prox(z - gamma_v * grad_z, gamma_v)
        counters = counters.bump(prox_g_evals=1)
        norm_res = jnp.sqrt(l2sq((x - z).astype(sdt))) / gamma
        it = c.it + 1

        if history:
            # logging-only objective (uncounted, src/AdaProx.jl:134-136)
            objective = f.value(x) + g_x
        else:
            objective = jnp.zeros((), dt)
        rec = Records(
            it=it,
            gamma=gamma,
            sigma=jnp.zeros((), sdt),
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
            x_prev=c.x,
            gamma=c.gamma,
            theta=theta,
            counters=counters,
            norm_res=norm_res,
            done=jnp.logical_or(c.done, norm_res <= tol),
        )
        return new, rec

    final, recs = run_loop(carry0, step, maxit, history, it_cap=it_cap)
    return SolveResult(
        x=final.x,
        y=None,
        numit=final.it,
        norm_res=final.norm_res,
        counters=final.counters,
        records=recs,
        extra=final,  # resumable loop carry
    )


def fixed_nesterov(
    x0,
    *,
    f,
    g,
    Lf=None,
    muf=0.0,
    mug=0.0,
    gamma=None,
    theta=None,
    tol=1e-5,
    maxit=100_000,
    name="Fixed Nesterov",
    history=False,
    resume_state=None,
    scalar_dtype=None,
    it_cap=None,
):
    """Fixed-step accelerated PG; q-based momentum when muf+mug > 0
    (reference src/AdaProx.jl:91-142)."""
    if (gamma is None) == (Lf is None):
        raise ValueError("provide exactly one of gamma or Lf")
    if gamma is None:
        gamma = 1.0 / Lf
    mu = muf + mug
    q = gamma * mu / (1 + gamma * mug)
    if not q < 1:
        raise ValueError("q = gamma*mu/(1+gamma*mug) must be < 1")
    if theta is None:
        theta = 1.0 / jnp.sqrt(q) if q > 0 else 0.0
    if not (0 <= float(theta) <= (1.0 / float(jnp.sqrt(q)) if q > 0 else jnp.inf)):
        raise ValueError("need 0 <= theta <= 1/sqrt(q)")
    x0 = jnp.asarray(x0)
    res = _solve(
        (f, g), x0, gamma, muf, mug, theta,
        tol, int(maxit), bool(history),
        bool(mu != 0), resume_state=resume_state, scalar_dtype=scalar_dtype,
        it_cap=None if it_cap is None else jnp.asarray(it_cap, jnp.int32),
    )
    return res.with_name(name)
