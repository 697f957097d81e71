"""Backtracking proximal-gradient and Nesterov (Beck-style sufficient
descent; reference src/AdaProx.jl:28-84, after Beck "First-Order Methods in
Optimization" sections 10.4.2/10.7).

The backtracking trial loop has a data-dependent trip count, so it compiles
to a ``lax.while_loop`` nested inside the outer solver loop. Each trial costs
1 prox + 1 f-evaluation; the gradient at the accepted point is finished
*once* from the carried forward-pass ``aux`` (the reference's lazy pullback
economy, src/AdaProx.jl:37,45,61 — see ops.oracles for why aux instead of a
closure).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .common import Counters, Records, SolveResult, l2sq, reopen, run_loop

__all__ = ["backtracking_proxgrad", "backtracking_nesterov"]

# hard cap on trial count: the reference loops unboundedly (logging an error
# below gamma=1e-12 but continuing, src/AdaProx.jl:40-42); a traced loop must
# not be able to hang the device.
_MAX_TRIALS = 100


def _backtrack(gamma, x, f_x, grad_x, aux_x, *, f, g, counters, shrink, sdt,
               exact_bregman=False):
    """``backtrack_stepsize`` (src/AdaProx.jl:34-48): halve gamma until the
    quadratic upper bound holds. Returns
    (gamma, z, f_z, g_z, aux_z, counters, failed) — ``failed`` is true when
    the trial cap was hit with the sufficient-descent test still violated
    (the reference loops unboundedly; a traced loop cannot, so the failure
    must be surfaced instead of silently accepting the bad point).

    ``gamma`` is carried in the scalar dtype ``sdt`` (the f64-scalar hybrid
    when wider than the iterate dtype): the sufficient-descent test is a
    difference of near-equal objective values — the solver's cancellation-
    sensitive scalar path — while prox/gradient vectors stay in the iterate
    dtype."""
    vdt = jnp.result_type(x)

    def trial(gamma, counters, trials):
        gamma_v = gamma.astype(vdt)
        z, g_z = g.prox(x - gamma_v * grad_x, gamma_v)
        f_z, aux = f.value_and_aux(z)
        counters = counters.bump(prox_g_evals=1, f_evals=1)
        return (gamma, z, f_z, g_z, aux, counters, trials)

    def violates(gamma, z, f_z, aux_z):
        # sufficient-descent test, equivalently Bregman(z, x) > ||dz||^2 /
        # (2 gamma) (src/AdaProx.jl:26) — evaluated in sdt (exact f32
        # differences, upcast before the reductions and the 1/gamma
        # amplification). With exact_bregman and a quadratic-type oracle
        # the Bregman term comes cancellation-free from the carried auxes
        # (0.5||A dz||^2): at f32 with |f| >> ||dz||^2 the raw difference
        # carries eps*|f| noise — measured to inflate bt-PG from 94 to
        # 16k iterations on a large-|f| lasso (same failure shape as the
        # MP stall fixed in solvers/malitsky_pock.py).
        dz = (z - x).astype(sdt)
        if exact_bregman:
            breg = f.bregman_from_aux(z - x, aux_z, aux_x)
            if breg is not None:
                return breg.astype(sdt) > l2sq(dz) / (2 * gamma)
        # default: the reference's exact comparison ordering — BIT-equal to
        # r3's formulation (the knife-edge mirror tests depend on it)
        return f_z.astype(sdt) > (
            f_x.astype(sdt) + jnp.vdot(grad_x.astype(sdt), dz).real
            + l2sq(dz) / (2 * gamma))

    def cond(c):
        gamma, z, f_z, _, aux_z, _, trials = c
        return jnp.logical_and(violates(gamma, z, f_z, aux_z),
                               trials < _MAX_TRIALS)

    def body(c):
        gamma, _, _, _, _, counters, trials = c
        return trial(gamma * shrink, counters, trials + 1)

    c0 = trial(gamma, counters, jnp.zeros((), jnp.int32))
    gamma, z, f_z, g_z, aux, counters, _ = jax.lax.while_loop(cond, body, c0)
    # acceptance test at loop exit
    failed = violates(gamma, z, f_z, aux)
    return gamma, z, f_z, g_z, aux, counters, failed


class _PGCarry(NamedTuple):
    it: jnp.ndarray
    x: jnp.ndarray
    z: jnp.ndarray
    gamma: jnp.ndarray
    f_x: jnp.ndarray
    grad_x: jnp.ndarray
    aux_x: object  # oracle aux at x (feeds the exact-Bregman acceptance)
    theta: jnp.ndarray  # momentum (nesterov only; 1.0 otherwise)
    counters: Counters
    ck_counters: Counters
    norm_res: jnp.ndarray
    ls_failed: jnp.ndarray  # latched: some backtrack exhausted _MAX_TRIALS
    done: jnp.ndarray


def _record(it, gamma, norm_res, objective, ck, done):
    z = jnp.zeros((), gamma.dtype)
    return Records(
        it=it,
        gamma=gamma,
        sigma=z,
        norm_res=norm_res,
        objective=objective,
        f_evals=ck.f_evals,
        grad_f_evals=ck.grad_f_evals,
        prox_g_evals=ck.prox_g_evals,
        prox_h_evals=ck.prox_h_evals,
        A_evals=ck.A_evals,
        At_evals=ck.At_evals,
        valid=jnp.logical_not(done),
    )


@functools.partial(jax.jit, static_argnames=("maxit", "history", "nesterov",
                                             "scalar_dtype", "exact_bregman"))
def _solve_bt(parts, x0, gamma0, xi, shrink, tol, maxit, history, nesterov,
              resume_state=None, scalar_dtype=None, exact_bregman=False,
              it_cap=None):
    f, g = parts
    dt = jnp.result_type(x0)
    sdt = jnp.dtype(scalar_dtype) if scalar_dtype is not None else dt
    gamma0, xi, shrink, tol = (jnp.asarray(v, sdt) for v in (gamma0, xi, shrink, tol))
    if resume_state is not None:
        carry0 = reopen(resume_state, dt, scalar_dtype=sdt,
                        scalar_fields=("gamma", "theta", "norm_res"))
    else:
        f_x0, aux0 = f.value_and_aux(x0)
        grad0 = f.grad_from_aux(x0, aux0)
        counters = Counters.zeros().bump(f_evals=1, grad_f_evals=1)
        carry0 = _PGCarry(
            it=jnp.zeros((), jnp.int32),
            x=x0,
            z=x0,
            gamma=jnp.asarray(gamma0, sdt),
            f_x=f_x0,
            grad_x=grad0,
            aux_x=aux0,
            theta=jnp.ones((), sdt),
            counters=counters,
            ck_counters=counters,
            norm_res=jnp.asarray(jnp.inf, sdt),
            ls_failed=jnp.zeros((), jnp.bool_),
            done=jnp.zeros((), jnp.bool_),
        )

    def step(c):
        # reference: PG inflates the trial step by xi each iteration
        # (src/AdaProx.jl:54); Nesterov does not (src/AdaProx.jl:72)
        trial_gamma = c.gamma * (1.0 if nesterov else xi)
        gamma, z, f_z, g_z, aux, counters, bt_failed = _backtrack(
            trial_gamma, c.x, c.f_x, c.grad_x, c.aux_x, f=f, g=g,
            counters=c.counters, shrink=shrink, sdt=sdt,
            exact_bregman=exact_bregman,
        )
        norm_res = jnp.sqrt(l2sq((z - c.x).astype(sdt))) / gamma
        ck = counters
        it = c.it + 1
        rec = _record(it, gamma, norm_res, f_z + g_z, ck, c.done)

        if nesterov:
            theta = (1 + jnp.sqrt(1 + 4 * c.theta**2)) / 2
            x = z + ((c.theta - 1) / theta).astype(jnp.result_type(z)) * (z - c.z)
            f_x, aux_x = f.value_and_aux(x)
            grad_x = f.grad_from_aux(x, aux_x)
            counters = counters.bump(f_evals=1, grad_f_evals=1)
        else:
            theta = c.theta
            x = z
            f_x = f_z
            aux_x = aux
            grad_x = f.grad_from_aux(z, aux)
            counters = counters.bump(grad_f_evals=1)

        new = _PGCarry(
            it=it,
            x=x,
            z=z,
            gamma=gamma,
            f_x=f_x,
            grad_x=grad_x,
            aux_x=aux_x,
            theta=theta,
            counters=counters,
            ck_counters=ck,
            norm_res=norm_res,
            ls_failed=jnp.logical_or(c.ls_failed, bt_failed),
            done=jnp.logical_or(c.done, norm_res <= tol),
        )
        return new, rec

    final, recs = run_loop(carry0, step, maxit, history, it_cap=it_cap)
    # converged: counters at the check (the reference returns before the
    # final pullback/momentum eval); maxed out: full counters including it
    converged = final.norm_res <= tol
    counters = jax.tree_util.tree_map(
        lambda a, b: jnp.where(converged, a, b), final.ck_counters, final.counters
    )
    return SolveResult(
        x=final.z,
        y=None,
        numit=final.it,
        norm_res=final.norm_res,
        counters=counters,
        records=recs,
        extra=final,  # resumable loop carry
        # failure-detection diagnostics: the reference logs an error when the
        # backtracked step drops below 1e-12 but continues (src/AdaProx.jl:
        # 40-42); a traced loop additionally caps the trial count, so a
        # cap-exhausted (poisoned) backtrack is latched and surfaced too
        diag={
            "gamma": final.gamma,
            "stepsize_underflow": final.gamma < 1e-12,
            "trials_exhausted": final.ls_failed,
        },
    )


def backtracking_proxgrad(
    x0,
    *,
    f,
    g,
    gamma0,
    xi=1.0,
    shrink=0.5,
    tol=1e-5,
    maxit=100_000,
    name="Backtracking PG",
    history=False,
    resume_state=None,
    scalar_dtype=None,
    exact_bregman=False,
    it_cap=None,
):
    """Prox-gradient with sufficient-descent backtracking and optional
    per-iteration stepsize inflation ``xi`` (reference src/AdaProx.jl:50-64).

    ``resume_state``: a previous result's ``.extra`` carry — continues that
    solve; ``maxit`` is the cumulative iteration cap.

    ``scalar_dtype``: run the sufficient-descent test, step sizes, and
    residual norm in a wider dtype (e.g. jnp.float64 with f32 iterates) —
    the same hybrid as adaptive_primal_dual's ``scalar_dtype``.

    ``exact_bregman``: evaluate the sufficient-descent test via the
    oracle's cancellation-resistant Bregman form when it has one (see
    SmoothOracle.bregman_from_aux) — removes the eps*|f| noise floor that
    stalls/inflates f32 backtracking at large-|f| scale. Default off =
    reference-exact trajectories."""
    x0 = jnp.asarray(x0)
    res = _solve_bt(
        (f, g), x0, gamma0, xi, shrink, tol,
        int(maxit), bool(history), False, resume_state=resume_state,
        scalar_dtype=scalar_dtype, exact_bregman=bool(exact_bregman),
        it_cap=None if it_cap is None else jnp.asarray(it_cap, jnp.int32),
    )
    return res.with_name(name)


def backtracking_nesterov(
    x0,
    *,
    f,
    g,
    gamma0,
    shrink=0.5,
    tol=1e-5,
    maxit=100_000,
    name="Backtracking Nesterov",
    history=False,
    resume_state=None,
    scalar_dtype=None,
    exact_bregman=False,
    it_cap=None,
):
    """Accelerated PG with backtracking; momentum theta recurrence
    ``(1 + sqrt(1 + 4 theta^2))/2`` (reference src/AdaProx.jl:66-84).
    ``exact_bregman``: see backtracking_proxgrad."""
    x0 = jnp.asarray(x0)
    res = _solve_bt(
        (f, g), x0, gamma0, 1.0, shrink, tol,
        int(maxit), bool(history), True, resume_state=resume_state,
        scalar_dtype=scalar_dtype, exact_bregman=bool(exact_bregman),
        it_cap=None if it_cap is None else jnp.asarray(it_cap, jnp.int32),
    )
    return res.with_name(name)
