"""Experimental PD-kernel variants for the round-3 bandwidth hunt.

BENCH_r02 measured the fused PD kernel (ops/pd_kernels.py) at 491 GB/s in
the SAME window where the fused LS kernel hit 648 — co-tenancy cannot
explain a same-window gap (VERDICT r2 weak 2). Structural differences vs
the LS kernel:

  * 5 tiny per-tile DMAs (x, grad blocked in; aty, v, xn blocked out, each
    (tn, 1) = 512 B) riding alongside each 8 MB at-tile — the LS kernel has
    ONE (b) plus constant-map outputs flushed once.
  * 8 MB tile budget (vs 4 MB).

Variants measured by tools/pd_bw_probe.py on-chip:

  * ``fused_pd_primal_update(block_rows=...)`` — the shipping kernel at
    several tile sizes (isolates the budget).
  * ``fused_pd_resident_mxu`` — all n-vectors VMEM-resident as lane-major
    (1, n) constant-index-map blocks, sliced in-kernel with pl.ds; the two
    reductions run on the MXU via dot_general with precision=HIGHEST (full
    f32 accuracy — the DEFAULT MXU path inside Pallas is bf16, measured
    2.6e-3 grad error in ops/kernels.py) so no sublane<->lane relayouts are
    needed. Per grid step the ONLY DMA is the at tile.

The winner gets folded into ops/pd_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adaprox_tpu.ops.pd_kernels import _PROX, _pick_block_rows_t

_LANE = 128


def _kernel_resident_mxu(y_ref, x_ref, grad_ref, scal_ref, at_ref,
                         aty_ref, v_ref, xn_ref, axn_ref,
                         *, prox_kind, acc_dtype, tn):
    j = pl.program_id(0)
    gamma = scal_ref[0, 0]
    p1 = scal_ref[0, 1]
    p2 = scal_ref[0, 2]
    at_tile = at_ref[:].astype(acc_dtype)          # (tn, m) — the only DMA
    sl = pl.ds(j * tn, tn)

    # A'y for this coordinate block, lane-major: (1, m) x (tn, m) -> (1, tn)
    aty = jax.lax.dot_general(
        y_ref[:], at_tile, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=acc_dtype,
    )
    x = x_ref[0:1, sl]
    grad = grad_ref[0:1, sl]
    v = x - gamma * (grad + aty)
    xn = _PROX[prox_kind](v, gamma, p1, p2)

    aty_ref[0:1, sl] = aty
    v_ref[0:1, sl] = v
    xn_ref[0:1, sl] = xn

    # A @ x_new partial: (1, tn) x (tn, m) -> (1, m)
    part = jax.lax.dot_general(
        xn, at_tile, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=acc_dtype,
    )

    @pl.when(j == 0)
    def _():
        axn_ref[:] = jnp.zeros_like(axn_ref)

    axn_ref[:] += part


@functools.partial(jax.jit, static_argnames=("prox_kind", "interpret", "block_rows"))
def fused_pd_resident_mxu(at, y, x, grad, gamma, p1=0.0, p2=0.0,
                          prox_kind="l1", interpret=False, block_rows=None):
    """Resident-vector MXU variant of fused_pd_primal_update (same
    signature/returns). Requires n % tn == 0 with tn a multiple of 128
    (lane-aligned dynamic stores)."""
    n, m = at.shape
    acc = x.dtype
    tn = block_rows or max(_LANE, (_pick_block_rows_t(n, m, at.dtype.itemsize)
                                   // _LANE) * _LANE)
    if n % tn or tn % _LANE or m % _LANE:
        raise ValueError(f"shape {at.shape} not divisible into ({tn},{m}) "
                         "lane-aligned tiles")
    y2 = y.reshape(1, m).astype(acc)
    x2 = x.reshape(1, n)
    g2 = grad.reshape(1, n)
    scal = jnp.stack([jnp.asarray(gamma, acc), jnp.asarray(p1, acc),
                      jnp.asarray(p2, acc)]).reshape(1, 3)

    aty, v, xn, axn = pl.pallas_call(
        functools.partial(_kernel_resident_mxu, prox_kind=prox_kind,
                          acc_dtype=acc, tn=tn),
        grid=(n // tn,),
        in_specs=[
            pl.BlockSpec((1, m), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tn, m), lambda j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, n), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, n), acc),
            jax.ShapeDtypeStruct((1, n), acc),
            jax.ShapeDtypeStruct((1, n), acc),
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
    return aty[0], v[0], xn[0], axn[0]
