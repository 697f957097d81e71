"""VMEM-resident whole-solve kernels for the LINESEARCH proximal-gradient
family: backtracking PG (with xi inflation), backtracking Nesterov, and
aGRAAL — the three solver families the resident menu (ops.resident) did not
yet cover on-core.

Why this matters: the reference's cubic-regularized subproblem
(cubic_sparse_logreg/runme.jl) and its lasso grid run EVERY one of these
methods on problems whose data fits VMEM many times over (the cubic
Hessian is (n+1)^2 with n ~ 113; the largest lasso is 4000x1000 f32 =
16 MB). A host-driven loop pays ~25 ms relay dispatch latency per step on
this backend; on-core the whole early-exit solve is one kernel launch.

Semantics are transcriptions of the engine loops (which are themselves
step-exact-mirror-tested against the reference):

* backtracking PG / Nesterov — solvers/backtracking.py (reference
  src/AdaProx.jl:28-84): halve gamma until the Beck sufficient-descent
  bound holds, xi inflation per outer iteration (PG only), theta momentum
  recurrence (Nesterov only), trial cap 101 evals with a latched
  ls_failed diagnostic.
* aGRAAL — solvers/agraal.py (reference src/AdaProx.jl:150-192): golden-
  ratio averaging x_bar, stepsize from the inverse-cocoercivity estimate,
  theta = phi*gamma/gamma_prev.

The smooth objective comes from the shared in-kernel oracle menu
(ops.resident._obj_split: "ls", "logreg", "cubic") and g from the static
prox menu; backtracking trials keep the reference's lazy-pullback economy
(one forward matvec per trial, the gradient finished once from the carried
aux after acceptance — src/AdaProx.jl:37,45,61).

Record mode carries per-iteration (gamma, norm_res, objective[, trials])
history buffers; oracle counters are reconstructed from the trial counts
exactly as the engine meters them (``resident_bt_records`` /
``resident_agraal_records``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .resident import _GVAL, _PROX, _hist_len, _obj_split

__all__ = ["resident_backtracking", "resident_bt_sweep", "resident_agraal",
           "resident_bt_records", "resident_agraal_records"]

# engine cap (solvers/backtracking._MAX_TRIALS): initial trial + up to 100
# halvings = 101 prox/f evaluations per outer iteration
_MAX_EVALS = 101


def _bt_core(a, at, b, x0, gamma0, xi, shrink, tol, p1, p2, cube_c, *,
             maxit, prox_kind, obj_kind, nesterov, m_true=None,
             record=False, nest_sel=None, exact_bregman=False):
    """Backtracking PG / Nesterov on VMEM-resident data, transcribing
    solvers/backtracking._solve_bt. Returns
    (z_final(1, n), it, norm_res, gamma, converged, ls_failed[, hists])
    with hists = (hg, hr, ho, ht) per-iteration (gamma, norm_res,
    objective, trials) when ``record``.

    ``exact_bregman`` (quadratic oracles only, i.e. obj_kind="ls" —
    mirroring the engine, where only quadratic-type oracles define
    bregman_from_aux): evaluate the sufficient-descent test as
    0.5||res_z - res_x||^2 > ||dz||^2/(2 gamma) from the carried residual
    auxes instead of the reference's raw objective difference. The raw
    form carries eps*|f| noise: measured in THIS kernel on a large-|f|
    f32 lasso, raw PG took 11716 iterations (f64: 90) and raw Nesterov
    never converged in 20k (f64: 111) — the identical failure shape the
    engine's exact_bregman closed (solvers/backtracking.py,
    solvers/malitsky_pock.py). Other obj_kinds fall back to the raw form.
    """
    dt = x0.dtype
    val_aux_of, grad_from_aux = _obj_split(a, at, b, obj_kind, m_true,
                                           cube_c, dt)
    prox_fn = _PROX[prox_kind]
    gval_fn = _GVAL[prox_kind]
    # only the LS oracle's aux (the residual) yields an exact Bregman form
    exact = bool(exact_bregman) and obj_kind == "ls"

    def prox(v, gamma):
        return prox_fn(v, gamma, p1, p2)

    f_x0, aux0 = val_aux_of(x0)
    grad0 = grad_from_aux(x0, aux0)

    hl = _hist_len(maxit)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, hl), 1)

    class C(NamedTuple):
        it: jnp.ndarray
        x: jnp.ndarray       # point where (f_x, grad_x) are evaluated
        z: jnp.ndarray       # last accepted backtracked point
        z_prev: jnp.ndarray
        gamma: jnp.ndarray
        f_x: jnp.ndarray
        grad_x: jnp.ndarray
        aux_x: object        # oracle aux at x (exact-Bregman mode only)
        theta: jnp.ndarray
        norm_res: jnp.ndarray
        ls_failed: jnp.ndarray
        hists: object        # (hg, hr, ho, ht) when record

    dynamic = nesterov == "dynamic"

    def body(c):
        # the nesterov row passes xi = 1.0 (no inflation, src/AdaProx.jl:72)
        trial_gamma = c.gamma * (1.0 if nesterov is True else xi)

        def trial(gamma, evals):
            z = prox(c.x - gamma * c.grad_x, gamma)
            f_z, aux = val_aux_of(z)
            return (gamma, z, f_z, aux, evals)

        def violates(gamma, z, f_z, aux):
            dz = z - c.x
            if exact:
                # Bregman(z, x) = 0.5||A dz||^2 = 0.5||res_z - res_x||^2
                # (sum of squares: second-order noise only, never eps*|f|)
                dres = aux - c.aux_x
                return (0.5 * jnp.sum(dres * dres)
                        > jnp.sum(dz * dz) / (2 * gamma))
            return f_z > (c.f_x + jnp.sum(c.grad_x * dz)
                          + jnp.sum(dz * dz) / (2 * gamma))

        def ls_cond(cc):
            gamma, z, f_z, aux, evals = cc
            return jnp.logical_and(violates(gamma, z, f_z, aux),
                                   evals < _MAX_EVALS)

        def ls_body(cc):
            gamma, _, _, _, evals = cc
            return trial(gamma * shrink, evals + 1)

        c0 = trial(trial_gamma, jnp.ones((), jnp.int32))
        gamma, z, f_z, aux, evals = jax.lax.while_loop(ls_cond, ls_body, c0)
        bt_failed = violates(gamma, z, f_z, aux)

        dz = z - c.x
        norm_res = jnp.sqrt(jnp.sum(dz * dz)) / gamma
        if record:
            hg, hr, ho, ht = c.hists
            mask = iota == c.it
            hists = (jnp.where(mask, gamma, hg),
                     jnp.where(mask, norm_res, hr),
                     jnp.where(mask, f_z + gval_fn(z, p1, p2), ho),
                     jnp.where(mask, evals.astype(dt), ht))
        else:
            hists = c.hists

        def post_nesterov(_):
            theta = (1 + jnp.sqrt(1 + 4 * c.theta * c.theta)) / 2
            x = z + ((c.theta - 1) / theta) * (z - c.z)
            f_x, aux_x = val_aux_of(x)
            return x, f_x, grad_from_aux(x, aux_x), theta, aux_x

        def post_pg(_):
            return z, f_z, grad_from_aux(z, aux), c.theta, aux

        if dynamic:
            x, f_x, grad_x, theta, aux_x = jax.lax.cond(
                nest_sel, post_nesterov, post_pg, None)
        elif nesterov:
            x, f_x, grad_x, theta, aux_x = post_nesterov(None)
        else:
            x, f_x, grad_x, theta, aux_x = post_pg(None)

        return C(c.it + 1, x, z, c.z, gamma, f_x, grad_x,
                 aux_x if exact else None, theta, norm_res,
                 jnp.logical_or(c.ls_failed, bt_failed), hists)

    def cond(c):
        return jnp.logical_and(c.it < maxit, c.norm_res > tol)

    hists0 = ((jnp.zeros((1, hl), dt),) * 4 if record else None)
    init = C(jnp.zeros((), jnp.int32), x0, x0, x0, gamma0, f_x0, grad0,
             aux0 if exact else None, jnp.ones((), dt),
             jnp.asarray(jnp.inf, dt), jnp.zeros((), jnp.bool_), hists0)
    final = jax.lax.while_loop(cond, body, init)
    out = (final.z, final.it.astype(jnp.float32), final.norm_res,
           final.gamma, (final.norm_res <= tol).astype(jnp.float32),
           final.ls_failed.astype(jnp.float32))
    if record:
        return out + (final.hists,)
    return out


def _agraal_core(a, at, b, x1, x0, gamma0, gamma_max, phi, tol, p1, p2,
                 cube_c, *, maxit, prox_kind, obj_kind, m_true=None,
                 record=False):
    """aGRAAL on VMEM-resident data, transcribing solvers/agraal._run.
    ``gamma0 <= 0`` selects the secant estimate ||x1-x0||/||g1-g0||
    (the engine's sentinel). Returns
    (x_final(1, n), it, norm_res, gamma, converged[, hists]) with
    hists = (hg, hr, ho) when ``record``."""
    dt = x1.dtype
    val_aux_of, grad_from_aux = _obj_split(a, at, b, obj_kind, m_true,
                                           cube_c, dt)
    prox_fn = _PROX[prox_kind]
    gval_fn = _GVAL[prox_kind]

    def prox(v, gamma):
        return prox_fn(v, gamma, p1, p2)

    def grad_of(x_row):
        _, aux = val_aux_of(x_row)
        return grad_from_aux(x_row, aux)

    rho = 1 / phi + 1 / (phi * phi)

    grad_x = grad_of(x1)
    grad_x_prev = grad_of(x0)
    dx0 = x1 - x0
    dg0 = grad_x - grad_x_prev
    secant = jnp.sqrt(jnp.sum(dx0 * dx0)) / jnp.sqrt(jnp.sum(dg0 * dg0))
    gamma_init = jnp.where(gamma0 > 0, gamma0, secant)

    hl = _hist_len(maxit)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, hl), 1)

    class C(NamedTuple):
        it: jnp.ndarray
        x: jnp.ndarray
        x_prev: jnp.ndarray
        x_bar: jnp.ndarray
        grad_x: jnp.ndarray
        grad_x_prev: jnp.ndarray
        gamma: jnp.ndarray
        theta: jnp.ndarray
        norm_res: jnp.ndarray
        hists: object  # (hg, hr, ho) when record

    def body(c):
        # src/AdaProx.jl:175-189; identical iterates give C = 0/0 = NaN —
        # treat as +inf so the min keeps the growth bound (engine semantics)
        dx = c.x - c.x_prev
        dg = c.grad_x - c.grad_x_prev
        curv = jnp.sum(dx * dx) / jnp.sum(dg * dg)
        curv = jnp.where(jnp.isnan(curv), jnp.inf, curv)
        gamma = jnp.minimum(
            jnp.minimum(rho * c.gamma, phi * c.theta * curv / (4 * c.gamma)),
            gamma_max,
        )
        theta = phi * gamma / c.gamma
        x_bar = ((phi - 1) * c.x + c.x_bar) / phi
        x_new = prox(x_bar - gamma * c.grad_x, gamma)
        dxn = x_new - c.x
        norm_res = jnp.sqrt(jnp.sum(dxn * dxn)) / gamma
        if record:
            # engine record semantics: objective at the NEW prox point
            # (f.value uncounted, src/AdaProx.jl:183-185) — costs one extra
            # forward matvec, record-mode only
            objective = val_aux_of(x_new)[0] + gval_fn(x_new, p1, p2)
            hg, hr, ho = c.hists
            mask = iota == c.it
            hists = (jnp.where(mask, gamma, hg),
                     jnp.where(mask, norm_res, hr),
                     jnp.where(mask, objective, ho))
        else:
            hists = c.hists
        grad_new = grad_of(x_new)
        return C(c.it + 1, x_new, c.x, x_bar, grad_new, c.grad_x, gamma,
                 theta, norm_res, hists)

    def cond(c):
        return jnp.logical_and(c.it < maxit, c.norm_res > tol)

    hists0 = ((jnp.zeros((1, hl), dt),) * 3 if record else None)
    init = C(jnp.zeros((), jnp.int32), x1, x0, x1, grad_x, grad_x_prev,
             gamma_init, jnp.ones((), dt), jnp.asarray(jnp.inf, dt), hists0)
    final = jax.lax.while_loop(cond, body, init)
    out = (final.x, final.it.astype(jnp.float32), final.norm_res,
           final.gamma, (final.norm_res <= tol).astype(jnp.float32))
    if record:
        return out + (final.hists,)
    return out


def _bt_kernel(a_ref, at_ref, b_ref, x0_ref, scal_ref, x_ref, stats_ref, *,
               maxit, prox_kind, obj_kind, nesterov, m_true,
               exact_bregman):
    """scal_ref (SMEM, (7,)): [gamma0, xi, shrink, tol, p1, p2, cube_c].
    stats (SMEM, (5,)): [numit, norm_res, gamma, converged, ls_failed]."""
    z, it_f, nres, gamma, conv, lsf = _bt_core(
        a_ref[:], at_ref[:], b_ref[:], x0_ref[:],
        scal_ref[0], scal_ref[1], scal_ref[2], scal_ref[3], scal_ref[4],
        scal_ref[5], scal_ref[6], maxit=maxit, prox_kind=prox_kind,
        obj_kind=obj_kind, nesterov=nesterov, m_true=m_true,
        exact_bregman=exact_bregman)
    x_ref[:] = z
    stats_ref[0] = it_f
    stats_ref[1] = nres.astype(jnp.float32)
    stats_ref[2] = gamma.astype(jnp.float32)
    stats_ref[3] = conv
    stats_ref[4] = lsf


def _bt_kernel_rec(a_ref, at_ref, b_ref, x0_ref, scal_ref, x_ref, stats_ref,
                   hg_ref, hr_ref, ho_ref, ht_ref, *, maxit, prox_kind,
                   obj_kind, nesterov, m_true, exact_bregman):
    z, it_f, nres, gamma, conv, lsf, hists = _bt_core(
        a_ref[:], at_ref[:], b_ref[:], x0_ref[:],
        scal_ref[0], scal_ref[1], scal_ref[2], scal_ref[3], scal_ref[4],
        scal_ref[5], scal_ref[6], maxit=maxit, prox_kind=prox_kind,
        obj_kind=obj_kind, nesterov=nesterov, m_true=m_true, record=True,
        exact_bregman=exact_bregman)
    x_ref[:] = z
    stats_ref[0] = it_f
    stats_ref[1] = nres.astype(jnp.float32)
    stats_ref[2] = gamma.astype(jnp.float32)
    stats_ref[3] = conv
    stats_ref[4] = lsf
    hg_ref[:], hr_ref[:], ho_ref[:], ht_ref[:] = hists


def _ag_kernel(a_ref, at_ref, b_ref, x1_ref, x0_ref, scal_ref, x_ref,
               stats_ref, *, maxit, prox_kind, obj_kind, m_true):
    """scal_ref (SMEM, (7,)): [gamma0, gamma_max, phi, tol, p1, p2, cube_c].
    stats (SMEM, (4,)): [numit, norm_res, gamma, converged]."""
    x, it_f, nres, gamma, conv = _agraal_core(
        a_ref[:], at_ref[:], b_ref[:], x1_ref[:], x0_ref[:],
        scal_ref[0], scal_ref[1], scal_ref[2], scal_ref[3], scal_ref[4],
        scal_ref[5], scal_ref[6], maxit=maxit, prox_kind=prox_kind,
        obj_kind=obj_kind, m_true=m_true)
    x_ref[:] = x
    stats_ref[0] = it_f
    stats_ref[1] = nres.astype(jnp.float32)
    stats_ref[2] = gamma.astype(jnp.float32)
    stats_ref[3] = conv
    stats_ref[4] = jnp.zeros((), jnp.float32)


def _ag_kernel_rec(a_ref, at_ref, b_ref, x1_ref, x0_ref, scal_ref, x_ref,
                   stats_ref, hg_ref, hr_ref, ho_ref, *, maxit, prox_kind,
                   obj_kind, m_true):
    x, it_f, nres, gamma, conv, hists = _agraal_core(
        a_ref[:], at_ref[:], b_ref[:], x1_ref[:], x0_ref[:],
        scal_ref[0], scal_ref[1], scal_ref[2], scal_ref[3], scal_ref[4],
        scal_ref[5], scal_ref[6], maxit=maxit, prox_kind=prox_kind,
        obj_kind=obj_kind, m_true=m_true, record=True)
    x_ref[:] = x
    stats_ref[0] = it_f
    stats_ref[1] = nres.astype(jnp.float32)
    stats_ref[2] = gamma.astype(jnp.float32)
    stats_ref[3] = conv
    stats_ref[4] = jnp.zeros((), jnp.float32)
    hg_ref[:], hr_ref[:], ho_ref[:] = hists


def _launch(kern, n, dt, hl, n_hists, record, interpret, operands):
    out_shape = [jax.ShapeDtypeStruct((1, n), dt),
                 jax.ShapeDtypeStruct((5,), jnp.float32)]
    out_specs = [pl.BlockSpec(memory_space=pltpu.VMEM),
                 pl.BlockSpec(memory_space=pltpu.SMEM)]
    if record:
        out_shape += [jax.ShapeDtypeStruct((1, hl), dt)] * n_hists
        out_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_hists
    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(operands) - 1) \
        + [pl.BlockSpec(memory_space=pltpu.SMEM)]
    return pl.pallas_call(
        kern,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(*operands)


@functools.partial(jax.jit, static_argnames=(
    "maxit", "prox_kind", "obj_kind", "nesterov", "m_true", "record",
    "interpret", "exact_bregman"))
def resident_backtracking(a, b, x0, gamma0, tol, maxit, *, xi=1.0,
                          shrink=0.5, prox_kind="l1", p1=0.0, p2=0.0,
                          cube_c=0.0, nesterov=False, obj_kind="ls",
                          m_true=None, record=False, interpret=False,
                          exact_bregman=False):
    """Whole-solve backtracking PG (``nesterov=False``; xi inflation per
    src/AdaProx.jl:54) or backtracking Nesterov (``nesterov=True``; no
    inflation, src/AdaProx.jl:72) in one resident kernel.

    a: (m, n) tile-aligned, fits VMEM twice (``resident_supported``);
    b: (m,) (the cubic model's q with a = H, m = n); x0: (n,). Returns
    (x, numit, norm_res, converged, ls_failed), plus
    (gamma_hist, norm_res_hist, objective_hist, trials_hist) of shape
    (maxit,) when ``record=True`` — feed ``resident_bt_records``.

    ``exact_bregman``: cancellation-resistant sufficient-descent test
    (obj_kind="ls" only; see _bt_core) — use for f32/bf16 solves at
    large |f|. Default off = reference-exact trajectories."""
    m, n = a.shape
    dt = x0.dtype
    scal = jnp.stack([
        jnp.asarray(gamma0, dt), jnp.asarray(xi, dt),
        jnp.asarray(shrink, dt), jnp.asarray(tol, dt),
        jnp.asarray(p1, dt), jnp.asarray(p2, dt), jnp.asarray(cube_c, dt),
    ])
    hl = _hist_len(maxit)
    kern_fn = _bt_kernel_rec if record else _bt_kernel
    kern = functools.partial(kern_fn, maxit=maxit, prox_kind=prox_kind,
                             obj_kind=obj_kind, nesterov=nesterov,
                             m_true=m_true, exact_bregman=exact_bregman)
    at = a.T / (m if m_true is None else m_true) if obj_kind == "logreg" \
        else a.T
    outs = _launch(kern, n, dt, hl, 4, record, interpret,
                   (a, at, b.reshape(1, m), x0.reshape(1, n), scal))
    x_out, stats = outs[0], outs[1]
    base = (x_out[0], stats[0].astype(jnp.int32), stats[1].astype(dt),
            stats[3] > 0, stats[4] > 0)
    if record:
        return base + tuple(o[0, :maxit] for o in outs[2:6])
    return base


@functools.partial(jax.jit, static_argnames=(
    "maxit", "prox_kind", "obj_kind", "m_true", "record", "interpret"))
def resident_agraal(a, b, x1, x0, gamma0, tol, maxit, *, gamma_max=1e6,
                    phi=1.5, prox_kind="l1", p1=0.0, p2=0.0, cube_c=0.0,
                    obj_kind="ls", m_true=None, record=False,
                    interpret=False):
    """Whole-solve aGRAAL in one resident kernel (reference
    src/AdaProx.jl:150-192). ``x0`` is the perturbed companion point (the
    engine draws x1 + noise host-side; pass the same to match trajectories
    — keep zero-padded coordinates 0 so the padded reductions are exact);
    ``gamma0 <= 0`` selects the secant estimate. Returns
    (x, numit, norm_res, converged), plus (gamma_hist, norm_res_hist,
    objective_hist) when ``record=True`` — feed
    ``resident_agraal_records``."""
    m, n = a.shape
    dt = x1.dtype
    scal = jnp.stack([
        jnp.asarray(gamma0, dt), jnp.asarray(gamma_max, dt),
        jnp.asarray(phi, dt), jnp.asarray(tol, dt),
        jnp.asarray(p1, dt), jnp.asarray(p2, dt), jnp.asarray(cube_c, dt),
    ])
    hl = _hist_len(maxit)
    kern_fn = _ag_kernel_rec if record else _ag_kernel
    kern = functools.partial(kern_fn, maxit=maxit, prox_kind=prox_kind,
                             obj_kind=obj_kind, m_true=m_true)
    at = a.T / (m if m_true is None else m_true) if obj_kind == "logreg" \
        else a.T
    outs = _launch(kern, n, dt, hl, 3, record, interpret,
                   (a, at, b.reshape(1, m), x1.reshape(1, n),
                    x0.reshape(1, n), scal))
    x_out, stats = outs[0], outs[1]
    base = (x_out[0], stats[0].astype(jnp.int32), stats[1].astype(dt),
            stats[3] > 0)
    if record:
        return base + tuple(o[0, :maxit] for o in outs[2:5])
    return base


def _bt_sweep_kernel_rec(scal_ref, a_ref, at_ref, b_ref, x0_ref, x_ref,
                         stats_ref, hg_ref, hr_ref, ho_ref, ht_ref, *,
                         maxit, prox_kind, obj_kind, m_true, exact_bregman):
    """One grid step per backtracking METHOD row: scal (R, 8) SMEM rows of
    [gamma0, xi, shrink, tol, p1, p2, cube_c, nesterov_flag] — one
    executable + one launch serves every backtracking row of an experiment
    (the xi variants AND the Nesterov row via a traced post-step cond)."""
    i = pl.program_id(0)
    z, it_f, nres, gamma, conv, lsf, hists = _bt_core(
        a_ref[:], at_ref[:], b_ref[:], x0_ref[:],
        scal_ref[i, 0], scal_ref[i, 1], scal_ref[i, 2], scal_ref[i, 3],
        scal_ref[i, 4], scal_ref[i, 5], scal_ref[i, 6], maxit=maxit,
        prox_kind=prox_kind, obj_kind=obj_kind, nesterov="dynamic",
        m_true=m_true, record=True, nest_sel=scal_ref[i, 7] > 0,
        exact_bregman=exact_bregman)
    x_ref[0] = z
    stats_ref[i, 0] = it_f
    stats_ref[i, 1] = nres.astype(jnp.float32)
    stats_ref[i, 2] = gamma.astype(jnp.float32)
    stats_ref[i, 3] = conv
    stats_ref[i, 4] = lsf
    hg_ref[0], hr_ref[0], ho_ref[0], ht_ref[0] = hists


@functools.partial(jax.jit, static_argnames=("maxit", "prox_kind",
                                             "obj_kind", "m_true", "shrink",
                                             "interpret", "exact_bregman"))
def resident_bt_sweep(a, b, x0, rows, tol, maxit, *, shrink=0.5,
                      prox_kind="l1", p1=0.0, p2=0.0, cube_c=0.0,
                      obj_kind="ls", m_true=None, interpret=False,
                      exact_bregman=False):
    """Every backtracking row of an experiment as ONE record-mode kernel
    launch: ``rows`` is a (R, 3) array of [gamma0, xi, nesterov_flag].
    Returns (x (R, n), numit, norm_res, converged, ls_failed,
    (hg, hr, ho, ht) each (R, maxit)) — feed each row to
    ``resident_bt_records`` with its own nesterov flag.
    ``exact_bregman``: see ``resident_backtracking``."""
    m, n = a.shape
    dt = x0.dtype
    rows = jnp.asarray(rows, dt)
    rcount = rows.shape[0]
    hl = _hist_len(maxit)
    scal = jnp.stack([
        rows[:, 0],
        rows[:, 1],
        jnp.full((rcount,), shrink, dt),
        jnp.full((rcount,), tol, dt),
        jnp.full((rcount,), p1, dt),
        jnp.full((rcount,), p2, dt),
        jnp.full((rcount,), cube_c, dt),
        rows[:, 2],
    ], axis=1)
    kern = functools.partial(_bt_sweep_kernel_rec, maxit=maxit,
                             prox_kind=prox_kind, obj_kind=obj_kind,
                             m_true=m_true, exact_bregman=exact_bregman)
    at = a.T / (m if m_true is None else m_true) if obj_kind == "logreg" \
        else a.T
    outs = pl.pallas_call(
        kern,
        grid=(rcount,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(at.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ) + tuple(pl.BlockSpec((1, 1, hl), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM) for _ in range(4)),
        out_shape=(
            jax.ShapeDtypeStruct((rcount, 1, n), dt),
            jax.ShapeDtypeStruct((rcount, 5), jnp.float32),
        ) + tuple(jax.ShapeDtypeStruct((rcount, 1, hl), dt)
                  for _ in range(4)),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(scal, a, at, b.reshape(1, m), x0.reshape(1, n))
    stats = outs[1]
    return (outs[0][:, 0, :], stats[:, 0].astype(jnp.int32),
            stats[:, 1].astype(dt), stats[:, 3] > 0, stats[:, 4] > 0,
            tuple(o[:, 0, :maxit] for o in outs[2:6]))


def resident_bt_records(numit, hg, hr, ho, ht, *, maxit, nesterov=False):
    """Records pytree for a resident backtracking solve from its history
    buffers. Counters reconstructed from the per-iteration trial counts
    exactly as the engine meters them (solvers/backtracking._solve_bt, ck
    snapshot at the record): init f/grad +1; per iteration the backtrack
    costs (prox_g, f) += trials; AFTER the record PG finishes the pullback
    (grad +1) while Nesterov evaluates the momentum point (f +1, grad +1).
    """
    import numpy as np_

    from ..solvers.common import Records

    hg, hr, ho, ht = (np_.asarray(h) for h in (hg, hr, ho, ht))
    k = int(numit)
    it = np_.arange(1, maxit + 1)
    cum_t = np_.cumsum(ht.astype(np_.int64))
    f_evals = 1 + cum_t + (it - 1 if nesterov else 0)
    return Records(
        it=it, gamma=hg, sigma=np_.zeros(maxit), norm_res=hr, objective=ho,
        f_evals=f_evals,
        grad_f_evals=it,  # 1 init + (it-1) completed post-record pullbacks
        prox_g_evals=cum_t,
        prox_h_evals=np_.zeros(maxit, np_.int64),
        A_evals=np_.zeros(maxit, np_.int64),
        At_evals=np_.zeros(maxit, np_.int64),
        valid=it <= k,
    )


def resident_agraal_records(numit, hg, hr, ho, *, maxit):
    """Records for a resident aGRAAL solve: deterministic counters matching
    the engine's ck snapshot (solvers/agraal.py): init f/grad +2 (both
    companion points); per iteration prox_g +1 at the record, f/grad +1
    after it (the reference skips the final gradient on convergence)."""
    import numpy as np_

    from ..solvers.common import Records

    hg, hr, ho = (np_.asarray(h) for h in (hg, hr, ho))
    k = int(numit)
    it = np_.arange(1, maxit + 1)
    return Records(
        it=it, gamma=hg, sigma=np_.zeros(maxit), norm_res=hr, objective=ho,
        f_evals=it + 1,       # 2 init + (it-1) post-record evals
        grad_f_evals=it + 1,
        prox_g_evals=it,
        prox_h_evals=np_.zeros(maxit, np_.int64),
        A_evals=np_.zeros(maxit, np_.int64),
        At_evals=np_.zeros(maxit, np_.int64),
        valid=it <= k,
    )
