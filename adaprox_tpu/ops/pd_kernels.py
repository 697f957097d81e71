"""Fused one-pass primal-dual update kernel.

The generic PD iteration (reference src/AdaProx.jl:335,344-345,358-361)
streams the coupling matrix A twice per iteration:

    half 1:  A_x  = A @ x            (feeds the dual update)
    half 2:  At_y = A' @ y_new ;  v = x - gamma (grad + At_y) ;
             x_new = prox_g(v)

The two halves are separated by the dual prox (which needs ALL of A_x), so
they cannot fuse within one iteration. But half 2 of iteration k and half 1
of iteration k+1 CAN: for each coordinate block j of x,

    At_y_j   = A'[j, :] y            # reduce over lanes, tile in VMEM
    v_j      = x_j - gamma (grad_j + At_y_j)
    x_new_j  = prox_g(v_j, gamma)    # separable g: l1 / box / elastic / zero
    A_xnew  += A'[j, :]' x_new_j     # SAME tile — the next iteration's A_x

— one HBM pass instead of two, because the primal prox is coordinate-
separable so each coordinate's new x is known as soon as its A'y entry is.
(The dual prox keeps full generality: it runs in XLA vector space on
m-vectors, outside this kernel.) This is the PD counterpart of the PG
forward+pullback fusion in ops.kernels.

LAYOUT: the kernel takes the TRANSPOSED matrix ``at`` (n, m) and iterates
over its row tiles — contiguous DMA slabs. (A first version tiled columns
of row-major A; the strided slabs cost ~25% bandwidth: 492 vs 661 GB/s
measured on v5e.) Both in-kernel reductions are then the fast ones: A'y
reduces over lanes, A@x_new over sublanes. The fused engine
(solvers.pd_fused) keeps ONLY ``at`` in HBM — memory-neutral vs the
two-pass path.

VPU formulation (elementwise multiply + reduce, not width-1 MXU dots) for
full f32 accuracy — see ops.kernels._ls_kernel for the measured rationale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_pd_primal_update", "pd_primal_update_xla", "pd_fusable"]

_LANE = 128
_SUBLANE = 8
_TILE_BUDGET = 8 * 1024 * 1024  # per row tile of at: tn * m * itemsize


def _pick_block_rows_t(n: int, m: int, itemsize: int) -> int:
    """Largest At row tile (multiple of the dtype's sublane count, <= 1024)
    within the VMEM budget that divides n. bf16 register tiles are
    (16, 128), so 2-byte dtypes need 16-row multiples."""
    sub = _SUBLANE if itemsize >= 4 else _SUBLANE * 2
    tn = max(sub, min(1024, _TILE_BUDGET // max(1, m * itemsize)))
    tn = (tn // sub) * sub
    while tn > sub and n % tn:
        tn -= sub
    return tn


def pd_fusable(at) -> bool:
    """at: the (n, m) transposed coupling matrix."""
    n, m = at.shape
    sub = _SUBLANE if at.dtype.itemsize >= 4 else _SUBLANE * 2
    return (
        n % sub == 0
        and m % _LANE == 0
        and n % _pick_block_rows_t(n, m, at.dtype.itemsize) == 0
    )


def _prox_l1(v, gamma, p1, p2):
    thr = p1 * gamma
    return jnp.sign(v) * jnp.maximum(jnp.abs(v) - thr, 0.0)


def _prox_box(v, gamma, p1, p2):
    del gamma
    return jnp.clip(v, p1, p2)


def _prox_zero(v, gamma, p1, p2):
    del gamma, p1, p2
    return v


def _prox_elastic(v, gamma, p1, p2):
    # argmin 0.5||z-v||^2 + gamma(p1|z| + p2/2 z^2)
    soft = jnp.sign(v) * jnp.maximum(jnp.abs(v) - p1 * gamma, 0.0)
    return soft / (1.0 + gamma * p2)


_PROX = {"l1": _prox_l1, "box": _prox_box, "zero": _prox_zero,
         "elastic": _prox_elastic}


def _kernel(y_ref, x_ref, grad_ref, scal_ref, at_ref,
            aty_ref, v_ref, xn_ref, axn_ref, *, prox_kind, acc_dtype):
    j = pl.program_id(0)
    gamma = scal_ref[0, 0]
    p1 = scal_ref[0, 1]
    p2 = scal_ref[0, 2]
    at_tile = at_ref[:].astype(acc_dtype)  # (tn, m) — contiguous slab

    # A'y for this coordinate block: reduce over lanes (m)
    aty = jnp.sum(at_tile * y_ref[:], axis=1, keepdims=True)  # (tn, 1)
    v = x_ref[:] - gamma * (grad_ref[:] + aty)
    x_new = _PROX[prox_kind](v, gamma, p1, p2)

    aty_ref[:] = aty
    v_ref[:] = v
    xn_ref[:] = x_new

    # A @ x_new contribution: reduce over sublanes (tn)
    @pl.when(j == 0)
    def _():
        axn_ref[:] = jnp.zeros_like(axn_ref)

    axn_ref[:] += jnp.sum(at_tile * x_new, axis=0, keepdims=True)  # (1, m)


@functools.partial(jax.jit, static_argnames=("prox_kind", "interpret", "block_rows"))
def fused_pd_primal_update(at, y, x, grad, gamma, p1=0.0, p2=0.0,
                           prox_kind="l1", interpret=False, block_rows=None):
    """One-pass (A'y, v, x_new, A@x_new) for the PD primal half-step.

    ``at``: the TRANSPOSED coupling matrix (n, m) with n % 8 == 0,
    m % 128 == 0; ``y``: (m,); ``x``/``grad``: (n,); ``gamma``/``p1``/``p2``
    scalars (prox params per ``prox_kind``: l1 -> p1=lam; box -> (lo, hi);
    elastic -> (l1, l2)). Returns (at_y(n,), v(n,), x_new(n,), a_x_new(m,)).
    """
    n, m = at.shape
    acc = x.dtype
    tn = block_rows or _pick_block_rows_t(n, m, at.dtype.itemsize)
    if n % tn or (not interpret and m % _LANE):
        # a non-dividing row tile would silently skip the tail coordinates
        # — checked in interpret mode too (a poisoned CPU result is worse
        # than an error: CPU interpret is the validation/parity path). The
        # m % 128 lane constraint is Mosaic-only: interpret streams m whole
        # and stays exact, so it is enforced only for compiled kernels.
        raise ValueError(
            f"at shape {at.shape} not divisible into ({tn}, {m}) tiles; "
            "see pd_fusable")
    y2 = y.reshape(1, m).astype(acc)
    x2 = x.reshape(n, 1)
    g2 = grad.reshape(n, 1)
    scal = jnp.stack([jnp.asarray(gamma, acc), jnp.asarray(p1, acc),
                      jnp.asarray(p2, acc)]).reshape(1, 3)

    aty, v, xn, axn = pl.pallas_call(
        functools.partial(_kernel, prox_kind=prox_kind, acc_dtype=acc),
        grid=(n // tn,),
        in_specs=[
            pl.BlockSpec((1, m), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tn, m), lambda j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tn, 1), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, 1), acc),
            jax.ShapeDtypeStruct((n, 1), acc),
            jax.ShapeDtypeStruct((n, 1), acc),
            jax.ShapeDtypeStruct((1, m), acc),
        ),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * n, bytes_accessed=m * n * at.dtype.itemsize,
            transcendentals=0,
        ),
    )(y2, x2, g2, scal, at)
    return aty[:, 0], v[:, 0], xn[:, 0], axn[0]


def pd_primal_update_xla(at, y, x, grad, gamma, p1=0.0, p2=0.0,
                         prox_kind="l1", precision="highest"):
    """Two-pass XLA reference implementation (validation/fallback).
    Takes the same transposed ``at`` (n, m)."""
    acc = x.dtype
    aty = jax.lax.dot_general(
        at, y, (((1,), (0,)), ((), ())), precision=precision,
        preferred_element_type=acc,
    )
    v = x - gamma * (grad + aty)
    x_new = _PROX[prox_kind](v, gamma, jnp.asarray(p1, acc), jnp.asarray(p2, acc))
    axn = jax.lax.dot_general(
        x_new, at, (((0,), (0,)), ((), ())), precision=precision,
        preferred_element_type=acc,
    )
    return aty, v, x_new, axn
