"""Fused one-pass primal-dual update kernel.

The generic PD iteration (reference src/AdaProx.jl:335,344-345,358-361)
streams the coupling matrix A twice per iteration:

    half 1:  A_x  = A @ x            (feeds the dual update)
    half 2:  At_y = A' @ y_new ;  v = x - gamma (grad + At_y) ;
             x_new = prox_g(v)

The two halves are separated by the dual prox (which needs ALL of A_x), so
they cannot fuse within one iteration. But half 2 of iteration k and half 1
of iteration k+1 CAN: iterate over COLUMN tiles of A, and for each tile

    At_y_j   = A[:, j]' y            # reduce over rows, tile in VMEM
    v_j      = x_j - gamma (grad_j + At_y_j)
    x_new_j  = prox_g(v_j, gamma)    # separable g: l1 / box / zero
    A_xnew  += A[:, j] @ x_new_j     # SAME tile — the next iteration's A_x

— one HBM pass over A instead of two, because the primal prox is
coordinate-separable so each column's new x is known as soon as that
column's A'y entry is. (The dual prox keeps full generality: it runs in
XLA vector space on m-vectors, outside this kernel.) This is the PD
counterpart of the PG forward+pullback fusion in ops.kernels.

VMEM: the tile is a full column block (m, tn); tn is chosen so the tile
fits the budget, so the kernel supports m up to ~100k rows at f32.

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
_TILE_BUDGET = 8 * 1024 * 1024  # per column tile (m * tn * itemsize)


def _pick_block_cols(m: int, n: int, itemsize: int) -> int:
    """Largest column tile (multiple of 128, <= 1024) whose (m, tn) tile fits
    the VMEM budget and divides n."""
    tn = max(_LANE, min(1024, _TILE_BUDGET // max(1, m * itemsize)))
    tn = (tn // _LANE) * _LANE
    while tn > _LANE and n % tn:
        tn -= _LANE
    return tn


def pd_fusable(a) -> bool:
    m, n = a.shape
    return (
        m % _SUBLANE == 0
        and n % _LANE == 0
        and n % _pick_block_cols(m, n, a.dtype.itemsize) == 0
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


def _kernel(y_ref, x_ref, grad_ref, scal_ref, a_ref,
            aty_ref, v_ref, xn_ref, axn_ref, *, prox_kind, acc_dtype):
    j = pl.program_id(0)
    gamma = scal_ref[0, 0]
    p1 = scal_ref[0, 1]
    p2 = scal_ref[0, 2]
    a_tile = a_ref[:].astype(acc_dtype)  # (m, tn)

    # A'y over this column tile: reduce rows
    aty = jnp.sum(a_tile * y_ref[:], axis=0, keepdims=True)  # (1, tn)
    v = x_ref[:] - gamma * (grad_ref[:] + aty)
    x_new = _PROX[prox_kind](v, gamma, p1, p2)

    aty_ref[:] = aty
    v_ref[:] = v
    xn_ref[:] = x_new

    # A @ x_new contribution from this tile: reduce lanes
    @pl.when(j == 0)
    def _():
        axn_ref[:] = jnp.zeros_like(axn_ref)

    axn_ref[:] += jnp.sum(a_tile * x_new, axis=1, keepdims=True)  # (m, 1)


@functools.partial(jax.jit, static_argnames=("prox_kind", "interpret"))
def fused_pd_primal_update(a, y, x, grad, gamma, p1=0.0, p2=0.0,
                           prox_kind="l1", interpret=False):
    """One-pass (A'y, v, x_new, A@x_new) for the PD primal half-step.

    ``a``: (m, n) with m % 8 == 0, n % 128 == 0; ``y``: (m,); ``x``/``grad``:
    (n,); ``gamma``/``p1``/``p2`` scalars (prox params, meaning per
    ``prox_kind``: l1 -> p1=lam; box -> (lo, hi); elastic -> (l1, l2)).
    Returns (at_y(n,), v(n,), x_new(n,), a_x_new(m,)).
    """
    m, n = a.shape
    acc = x.dtype
    tn = _pick_block_cols(m, n, a.dtype.itemsize)
    y2 = y.reshape(m, 1).astype(acc)
    x2 = x.reshape(1, n)
    g2 = grad.reshape(1, n)
    scal = jnp.stack([jnp.asarray(gamma, acc), jnp.asarray(p1, acc),
                      jnp.asarray(p2, acc)]).reshape(1, 3)

    aty, v, xn, axn = pl.pallas_call(
        functools.partial(_kernel, prox_kind=prox_kind, acc_dtype=acc),
        grid=(n // tn,),
        in_specs=[
            pl.BlockSpec((m, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((m, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, n), acc),
            jax.ShapeDtypeStruct((1, n), acc),
            jax.ShapeDtypeStruct((1, n), acc),
            jax.ShapeDtypeStruct((m, 1), acc),
        ),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * n, bytes_accessed=m * n * a.dtype.itemsize,
            transcendentals=0,
        ),
    )(y2, x2, g2, scal, a)
    return aty[0], v[0], xn[0], axn[:, 0]


def pd_primal_update_xla(a, y, x, grad, gamma, p1=0.0, p2=0.0,
                         prox_kind="l1", precision="highest"):
    """Two-pass XLA reference implementation (validation/fallback)."""
    acc = x.dtype
    aty = jax.lax.dot_general(
        y, a, (((0,), (0,)), ((), ())), precision=precision,
        preferred_element_type=acc,
    )
    v = x - gamma * (grad + aty)
    x_new = _PROX[prox_kind](v, gamma, jnp.asarray(p1, acc), jnp.asarray(p2, acc))
    axn = jax.lax.dot_general(
        a, x_new, (((1,), (0,)), ((), ())), precision=precision,
        preferred_element_type=acc,
    )
    return aty, v, x_new, axn
