"""Fused-kernel variant of the generic adaptive primal-dual engine.

Same algorithm as ``solvers.primal_dual.adaptive_primal_dual`` (reference
src/AdaProx.jl:312-364) with the iteration re-cut so the two A matvecs per
iteration (``A @ x`` at :335, ``A' @ y`` at :358) become ONE HBM pass:
half 2 of iteration k (A'y, primal prox) is fused with half 1 of
iteration k+1 (A @ x_new) in a Pallas kernel over contiguous row tiles of
the transposed matrix (ops.pd_kernels.fused_pd_primal_update; only A' is
kept in HBM — memory-neutral). The loop carry holds ``a_x``
(= A @ x for the CURRENT iterate), produced by the previous step's fused
pass, so no standalone A@x ever runs after warm-up.

Applies when g's prox is coordinate-separable from the kernel menu (l1 /
box / elastic / zero — every g the reference experiments use); h and the
dual prox keep full generality (XLA vector ops on m-vectors, negligible
next to the matvec). f is any SmoothOracle — its own oracle cost is
untouched (the fully nonsmooth sqrt-lasso/LAD problems have f = 0, making
the A traffic the entire iteration cost, hence the 2x).

Counters/records/stopping replicate the engine exactly (A_evals and
At_evals each +1 per iteration — the fused pass IS both calls).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ops import oracles, pd_kernels, prox as prox_ops
from ..solvers import rules as rules_mod
from .common import Counters, Records, SolveResult, cast_floats, l2sq, reopen, run_loop

__all__ = ["fused_adaptive_primal_dual", "fused_condat_vu", "prox_menu_entry"]


def prox_menu_entry(g):
    """Map a prox object to the kernel's static menu: (kind, p1, p2).
    Returns None if g has no separable closed form in the menu."""
    if isinstance(g, prox_ops.L1Norm):
        return "l1", g.lam, 0.0
    if isinstance(g, prox_ops.IndBox):
        return "box", g.lo, g.hi
    if isinstance(g, prox_ops.ElasticNet):
        return "elastic", g.lam1, g.lam2
    if isinstance(g, prox_ops.Zero):
        return "zero", 0.0, 0.0
    return None


class _Carry(NamedTuple):
    it: jnp.ndarray
    x: jnp.ndarray
    v: jnp.ndarray
    y: jnp.ndarray
    a_x: jnp.ndarray  # A @ x for the CURRENT x (from the fused pass)
    at_y: jnp.ndarray  # A' y for the current y
    x_prev: jnp.ndarray
    a_x_prev: jnp.ndarray
    grad_prev: jnp.ndarray
    gamma: jnp.ndarray
    sigma: jnp.ndarray
    rstate: object
    counters: Counters
    norm_res: jnp.ndarray
    ck_x: jnp.ndarray
    ck_counters: Counters
    rule_nan: jnp.ndarray  # latched: the rule produced a NaN step size
    done: jnp.ndarray


@functools.partial(
    jax.jit,
    static_argnames=("maxit", "history", "prox_kind", "interpret", "mesh"))
def _solve(parts, rule, x0, y0, p1, p2, tol, maxit, history, prox_kind,
           interpret, resume_state=None, mesh=None, it_cap=None):
    f, g, h, at_mat = parts  # TRANSPOSED (n, m) — the only copy of A needed
    h_conj = prox_ops.conjugate(h)
    dt = jnp.result_type(x0)
    rule = cast_floats(rule, dt)
    tol = jnp.asarray(tol, dt)
    p1 = jnp.asarray(p1, dt)
    p2 = jnp.asarray(p2, dt)

    if mesh is None:
        def fused(y, x, grad, gamma):
            return pd_kernels.fused_pd_primal_update(
                at_mat, y, x, grad, gamma, p1, p2, prox_kind=prox_kind,
                interpret=interpret)
    else:
        # pallas_call has no SPMD partitioning rule, so the sharded variant
        # goes through shard_map: each device runs the one-pass kernel on
        # its coordinate block of A' (rows of A' = the "rows" mesh axis);
        # A'y / v / x_new are block-local, and the A@x_new partials are
        # psum-ed — the same collective GSPMD inserts for the two-pass path
        # (cf. parallel/fused.RowShardedFusedLS).
        from ..parallel.mesh import ROWS

        def fused(y, x, grad, gamma):
            def local(at_blk, y_rep, x_blk, grad_blk, gam):
                aty, v, xn, axn = pd_kernels.fused_pd_primal_update(
                    at_blk, y_rep, x_blk, grad_blk, gam, p1, p2,
                    prox_kind=prox_kind, interpret=interpret)
                return aty, v, xn, jax.lax.psum(axn, ROWS)

            return jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(P(ROWS, None), P(), P(ROWS), P(ROWS), P()),
                out_specs=(P(ROWS), P(ROWS), P(ROWS), P()),
                check_vma=False,
            )(at_mat, y, x, grad, gamma)

    if resume_state is not None:
        carry0 = reopen(resume_state, dt)
    else:
        # warm-up (src/AdaProx.jl:324-332): one standalone A@x, then the
        # first fused pass plays the role of the engine's first half 2
        (gamma, sigma), rstate = rule.init()
        a_x0 = x0 @ at_mat  # A @ x0 through the transposed layout
        _, aux0 = f.value_and_aux(x0)
        grad0 = f.grad_from_aux(x0, aux0)
        counters = Counters.zeros().bump(A_evals=1, f_evals=1, grad_f_evals=1)
        at_y0, v, x1, a_x1 = fused(y0, x0, grad0, gamma)
        counters = counters.bump(At_evals=1, prox_g_evals=1, A_evals=1)
        carry0 = _Carry(
            it=jnp.zeros((), jnp.int32),
            x=x1,
            v=v,
            y=y0,
            a_x=a_x1,
            at_y=at_y0,
            x_prev=x0,
            a_x_prev=a_x0,
            grad_prev=grad0,
            gamma=gamma,
            sigma=sigma,
            rstate=rstate,
            counters=counters,
            norm_res=jnp.asarray(jnp.inf, dt),
            ck_x=x1,
            ck_counters=counters,
            # cf. primal_dual._init: a NaN initial step (direct rule ctor
            # bypassing .make) surfaces as diag["rule_nan"]
            rule_nan=jnp.isnan(gamma),
            done=jnp.zeros((), jnp.bool_),
        )

    def step(c):
        counters = c.counters
        # a_x for the current x came from the previous fused pass; the
        # engine charges it as this iteration's A_eval (src/AdaProx.jl:335)
        f_x, aux = f.value_and_aux(c.x)
        grad_x = f.grad_from_aux(c.x, aux)
        counters = counters.bump(f_evals=1, grad_f_evals=1)

        primal_res = (c.v - c.x) / c.gamma + grad_x + c.at_y
        curv = rules_mod.Curvature.of(c.x, grad_x, c.x_prev, c.grad_prev)
        (gamma, sigma), rstate = rule.update(c.rstate, curv)
        # NaN-step latch, cf. primal_dual._step (a poisoned rule makes
        # norm_res <= tol never true and the solve silently runs to maxit)
        rule_nan = jnp.logical_or(
            c.rule_nan, jnp.logical_or(jnp.isnan(gamma), jnp.isnan(sigma)))
        rho = gamma / c.gamma

        w = c.y + sigma * ((1 + rho) * c.a_x - rho * c.a_x_prev)
        y, _ = h_conj.prox(w, sigma)
        counters = counters.bump(prox_h_evals=1)
        dual_res = (w - y) / sigma - c.a_x
        norm_res = jnp.sqrt(l2sq(primal_res) + l2sq(dual_res))

        ck = counters
        it = c.it + 1

        if history:
            objective = f_x + g(c.x) + h(c.a_x)
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

        # fused half 2 + next half 1: one pass over A
        at_y, v, x_new, a_x_new = fused(y, c.x, grad_x, gamma)
        counters = counters.bump(At_evals=1, prox_g_evals=1, A_evals=1)

        new = _Carry(
            it=it,
            x=x_new,
            v=v,
            y=y,
            a_x=a_x_new,
            at_y=at_y,
            x_prev=c.x,
            a_x_prev=c.a_x,
            grad_prev=grad_x,
            gamma=gamma,
            sigma=sigma,
            rstate=rstate,
            counters=counters,
            norm_res=norm_res,
            ck_x=c.x,
            ck_counters=ck,
            rule_nan=rule_nan,
            done=jnp.logical_or(c.done, norm_res <= tol),
        )
        return new, rec

    final, recs = run_loop(carry0, step, maxit, history, it_cap=it_cap)
    converged = final.norm_res <= tol
    x_out = jnp.where(converged, final.ck_x, final.x)
    # the fused pass ran one A_eval "ahead" (it precomputed the NEXT
    # iteration's A@x); at the convergence check the reference has not made
    # that call yet, so the ck snapshot taken above is already correct
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
        extra=final,
        diag={"gamma": final.gamma, "rule_nan": final.rule_nan},
    )


def fused_adaptive_primal_dual(
    x0,
    y0,
    *,
    f,
    g,
    h,
    A,
    rule,
    tol=1e-5,
    maxit=10_000,
    name="AdaPDM (fused)",
    history=False,
    resume_state=None,
    interpret=None,
    mesh=None,
    at=None,
    pad="auto",
    it_cap=None,
):
    """Engine-parity AdaPDM with the one-pass fused PD kernel.

    ``A`` is a dense matrix (or DenseOperator); ``g`` must map onto the
    kernel prox menu (see ``prox_menu_entry``).

    ``pad``: "auto" (default) zero-pads a non-tile-aligned (m, n) problem
    to kernel alignment and corrects for it exactly: zero COLUMNS of A
    (new x coordinates) get a zero gradient (ops.oracles.PadDomain) and,
    because every menu prox satisfies prox(0) = 0 (checked for "box"),
    stay exactly 0; zero ROWS of A (new dual coordinates) see h through
    ops.prox.PadTail, whose conjugate pins the padded duals to 0. Both
    tails then contribute exactly 0 to every residual/curvature reduction,
    so the padded solve is trajectory-identical to the unpadded problem —
    this is what lets the fused engine run LIBSVM-shaped data (8124x112
    etc.). ``pad=False`` raises on misalignment instead.

    ``mesh``: a parallel.mesh 2-D mesh — runs the fused kernel per device
    over the "rows"-axis shards of A' (shard_map + psum of the A@x_new
    partials); shard x0/grad-space vectors P("rows") and replicate y0.

    ``at``: the already-materialized transposed matrix (n, m). The kernel
    streams row tiles of A', so the wrapper otherwise transposes A on EVERY
    call — a 1 GB strided pass that dominates short solves and repeated
    sweeps (measured ~7-10 ms at 16384^2 f32, tools/pd_bw_probe2.py).
    Pass ``A`` as well (only its shape/dtype are used for validation).
    """
    a_mat = getattr(A, "a", A)
    entry = prox_menu_entry(g)
    if entry is None:
        raise ValueError(f"g={type(g).__name__} not in the fused prox menu")
    kind, p1, p2 = entry
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    x0 = jnp.asarray(x0)
    # one-time transpose: the kernel streams contiguous row tiles of A'
    # (column tiles of row-major A cost ~25% bandwidth in strided DMA)
    if at is not None:
        at_mat = jnp.asarray(at)
        # np.shape: validating against a HOST a_mat must not upload it
        if at_mat.shape != np.shape(a_mat)[::-1]:
            raise ValueError(
                f"at shape {at_mat.shape} is not the transpose of A shape "
                f"{np.shape(a_mat)}")
    else:
        at_mat = jnp.asarray(a_mat).T
    y0 = jnp.asarray(y0)
    n_true, m_true = at_mat.shape
    if not pd_kernels.pd_fusable(at_mat) and mesh is None:
        if not pad:
            raise ValueError(
                f"A with shape {a_mat.shape} is not tile-aligned for the "
                "fused PD kernel (need n % 8 == 0 and m % 128 == 0); use "
                "pad='auto' or solvers.primal_dual.adaptive_primal_dual")
        if kind == "box" and not (float(p1) <= 0.0 <= float(p2)):
            # prox_box(0) != 0 would move the padded coordinates off zero
            raise ValueError(
                f"auto-pad needs prox_g(0) = 0; IndBox({float(p1)}, "
                f"{float(p2)}) violates it — pad the problem by hand")
        sub = 8 if at_mat.dtype.itemsize >= 4 else 16
        n_pad = -(-n_true // sub) * sub
        m_pad = -(-m_true // 128) * 128
        at_mat = jnp.pad(at_mat, ((0, n_pad - n_true), (0, m_pad - m_true)))
        x0 = jnp.pad(x0, (0, n_pad - n_true))
        y0 = jnp.pad(y0, (0, m_pad - m_true))
        if n_pad != n_true:
            f = oracles.PadDomain(f, n_true)
        if m_pad != m_true:
            h = prox_ops.PadTail(h, m_true)
    elif mesh is not None and not interpret and not pd_kernels.pd_fusable(at_mat):
        # the mesh path shards A' by rows — padding must happen shard-aware
        # at load time (parallel.mesh); interpret mesh runs are exact
        # unpadded (the kernel streams m whole in interpret mode)
        raise ValueError(
            f"A with shape {a_mat.shape} is not tile-aligned for the "
            "compiled sharded fused PD kernel; pad at load time "
            "(parallel.mesh) before sharding")
    res = _solve(
        (f, g, h, at_mat), rule, x0, y0, p1, p2,
        tol, int(maxit), bool(history),
        kind, bool(interpret), resume_state=resume_state, mesh=mesh,
        it_cap=None if it_cap is None else jnp.asarray(it_cap, jnp.int32),
    )
    if res.x.shape[0] != n_true or res.y.shape[0] != m_true:
        res = res._replace(x=res.x[:n_true], y=res.y[:m_true])
    return res.with_name(name)


def fused_condat_vu(x0, y0, *, f, g, h, A, Lf, norm_A=None, tol=1e-5,
                    maxit=10_000, name="Condat-Vu (fused)", history=False,
                    resume_state=None, interpret=None, mesh=None, at=None,
                    pad="auto", it_cap=None):
    """Condat-Vu on the fused engine: the reference's (gamma, sigma)
    heuristics (src/AdaProx.jl:367-416) with a FixedStepsize rule."""
    import numpy as np

    from ..solvers.rules import FixedStepsize

    from ..solvers.primal_dual import condat_vu_steps

    a_mat = getattr(A, "a", A)
    if norm_A is None:
        # Frobenius, matching DenseOperator.norm() / Julia norm(A) — the
        # engine condat_vu's default (src/AdaProx.jl:403). Computed ON
        # DEVICE from whichever matrix the solve will upload anyway (`at`
        # when given — a host->device pull of the full untransposed A just
        # for the norm cost a 1 GB relay transfer per call)
        norm_A = float(jnp.linalg.norm(jnp.asarray(
            at if at is not None else a_mat)))
    gamma, sigma = condat_vu_steps(jnp.asarray(float(Lf)),
                                   jnp.asarray(float(norm_A)))
    gamma, sigma = float(gamma), float(sigma)
    rule = FixedStepsize(gamma=gamma, t=float(np.sqrt(sigma / gamma)))
    return fused_adaptive_primal_dual(
        x0, y0, f=f, g=g, h=h, A=A, rule=rule, tol=tol, maxit=maxit,
        name=name, history=history, resume_state=resume_state,
        interpret=interpret, mesh=mesh, at=at, pad=pad, it_cap=it_cap)
