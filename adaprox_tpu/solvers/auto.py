"""Zero-config adaptive proximal gradient (``auto_adaptive_proxgrad``,
reference src/AdaProx.jl:423-455): estimates the initial gamma with 1-2 trial
prox-gradient steps and secant curvature, re-estimates if the initial guess
was off by more than 1e5x, then runs AdaPGM.

The estimation runs eagerly (a handful of O(matvec) host-driven steps); the
main solve is the compiled engine. The reference has a known bug at
src/AdaProx.jl:431 (``prox(x - 0.1*grad, 0.1)`` missing ``g``); we implement
the evident intent ``prox(g, x - 0.1*grad, 0.1)``.
"""

from __future__ import annotations

import jax.numpy as jnp

from .primal_dual import adaptive_proxgrad
from .rules import AdaPGMRule
from .common import SolveResult, Counters

__all__ = ["auto_adaptive_proxgrad"]


def _secant_l(grad1, grad0, x1, x0):
    dx = x1 - x0
    return jnp.vdot(grad1 - grad0, dx).real / jnp.sum(dx * dx)


def auto_adaptive_proxgrad(
    x0,
    *,
    f,
    g,
    gamma=None,
    tol=1e-5,
    maxit=100_000,
    name="AutoAdaPGM",
    history=False,
    scalar_dtype=None,
):
    x = jnp.asarray(x0)
    # estimation-phase oracle meters: in the reference these calls hit the
    # caller's Counting wrappers (src/AdaProx.jl:424-449), so the main
    # loop's records report them — mirror that by offsetting the result
    est = dict(f_evals=1, grad_f_evals=1, prox_g_evals=0)
    _, grad_x = f.value_and_grad(x)

    if float(jnp.sqrt(jnp.sum(grad_x * grad_x))) <= tol:
        return SolveResult(
            x=x, y=None, numit=jnp.zeros((), jnp.int32),
            norm_res=jnp.sqrt(jnp.sum(grad_x * grad_x)),
            counters=Counters.zeros().bump(**est), records=None, name=name,
        )

    if gamma is None:
        xeps, _ = g.prox(x - 0.1 * grad_x, 0.1)
        _, grad_xeps = f.value_and_grad(xeps)
        est = {k: v + 1 for k, v in est.items()}
        lip = _secant_l(grad_x, grad_xeps, x, xeps)
        gamma = 1.0 if float(lip) == 0 else 1.0 / float(lip)

    if not gamma > 0:
        raise ValueError("gamma must be positive")

    x_prev, grad_x_prev, gamma_prev = x, grad_x, gamma
    x, _ = g.prox(x - gamma * grad_x, gamma)
    _, grad_x = f.value_and_grad(x)
    est = {k: v + 1 for k, v in est.items()}
    lip = _secant_l(grad_x, grad_x_prev, x, x_prev)
    gamma = float(jnp.sqrt(2.0)) * gamma if float(lip) == 0 else 1.0 / float(lip)

    if gamma_prev / gamma > 1e5:  # initial guess too large (src/AdaProx.jl:445)
        x, _ = g.prox(x_prev - gamma * grad_x_prev, gamma)
        _, grad_x = f.value_and_grad(x)
        est = {k: v + 1 for k, v in est.items()}
        lip = _secant_l(grad_x, grad_x_prev, x, x_prev)
        gamma = float(jnp.sqrt(2.0)) * gamma if float(lip) == 0 else 1.0 / float(lip)

    rule = AdaPGMRule(gamma=gamma, t=1.0, norm_a=0.0, delta=0.0, theta=1.2)
    res = adaptive_proxgrad(
        x_prev, f=f, g=g, rule=rule, tol=tol, maxit=maxit, name=name,
        history=history, scalar_dtype=scalar_dtype,
    )
    res = res._replace(counters=res.counters.bump(**est))
    if res.records is not None:
        res = res._replace(records=res.records._replace(**{
            k: getattr(res.records, k) + v for k, v in est.items()}))
    return res
