"""Block-sparse (BCSR) matvec kernels — the TPU-native sparse form.

Fine-grained gather sparsity does not map to this hardware (see ops.sparse
for the measured Mosaic gather limits); what DOES map is BLOCK sparsity:
store only the nonzero (bm, bn) tiles of A and stream exactly those
(default 64x512 — see the tile-size measurements at the defaults below).
The matvec touches nnzb * bm*bn*4 bytes of HBM instead of the dense m*n*4
— a direct bandwidth win proportional to block occupancy at the CHOSEN
granularity, with every byte moved in tile-aligned slabs and every FLOP a
dense VPU op.

Format (built host-side, ``bcsr_from_dense``):

  * ``vals``   (nnzb, bm, bn) — the nonzero tiles, block-row-major;
  * ``cols``   (nnzb,) int32  — block-column index of each tile;
  * ``rowptr`` (n_block_rows + 1,) int32 — CSR-style extents.

Kernel: ``grid = (n_block_rows, max_blocks_per_row)`` with
``PrefetchScalarGridSpec`` — ``rowptr``/``cols`` are scalar-prefetched so
the BLOCK INDEX MAPS themselves select which tile of ``vals`` and which
128-slice of ``x`` each grid step streams (flat = rowptr[i] + j, clamped
inside the row; steps past the row's tile count re-read the last tile and
are masked out of the accumulation). Rows shorter than max_bpr waste only
the masked iterations, not HBM traffic for untouched tiles... they do
re-read the final tile; with clamp-to-row the padding cost is
(max_bpr - count_i) redundant 4 KB tile reads per row — bounded by the
row-count skew, zero for uniform rows.

``A'y`` uses a second BCSR structure built from A' (same layout) — both
directions are gather-free streams, mirroring ops.sparse's design.

Memory-space note: the (8, 128) tile shape IS the f32 register tile, so
``vals`` blocks satisfy Mosaic's block constraints exactly; ``y`` output
blocks are (8, 1) columns (last-dim-1 layout) for the same reason.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .._pytree import pytree_dataclass
from .linops import opnorm2
from .sparse import _pad_up

__all__ = ["BCSROperator", "bcsr_from_dense", "bcsr_matvec",
           "bcsr_matvec_slab", "bcsr_matvec_xla", "bcsr_matvec_ref"]

# default tile: 128 KB f32. Measured on v5e at 8192x16384, 10% block
# density: (8,128) tiles 10 GB/s effective (DMA-latency-bound), (32,512)
# 46 GB/s, (64,512) 76 GB/s, (64,1024) 81 GB/s vs 434 GB/s dense — the
# scalar-prefetch-driven dynamic index maps limit pipelining, so the
# crossover vs dense sits near block_density ~0.2 with these defaults
# (1.85x win at 0.1). Bigger tiles trade sparsity granularity for DMA
# efficiency.
_BM = 64
_BN = 512


def bcsr_from_dense(dense_np, bm=_BM, bn=_BN):
    """(vals, cols, rowptr, padded_shape) for the (bm, bn) blocking of a
    dense numpy matrix. A tile is stored iff it has any nonzero. ``bm``
    must be a multiple of 8 and ``bn`` of 128 (f32 register tiles)."""
    d = np.asarray(dense_np)
    m, n = d.shape
    mp, np_ = _pad_up(max(m, 1), bm), _pad_up(max(n, 1), bn)
    dp = np.zeros((mp, np_), d.dtype)
    dp[:m, :n] = d
    nbr, nbc = mp // bm, np_ // bn
    tiles = dp.reshape(nbr, bm, nbc, bn).transpose(0, 2, 1, 3)
    mask = (tiles != 0).any(axis=(2, 3))  # (nbr, nbc)
    vals, cols, rowptr = [], [], [0]
    for i in range(nbr):
        for c in np.nonzero(mask[i])[0]:
            vals.append(tiles[i, c])
            cols.append(c)
        rowptr.append(len(cols))
    if not vals:  # all-zero matrix: keep one zero tile so shapes are valid
        vals, cols, rowptr = [np.zeros((bm, bn), d.dtype)], [0], [0] + [1] * nbr
    return (np.stack(vals), np.asarray(cols, np.int32),
            np.asarray(rowptr, np.int32), (mp, np_))


def _kernel(rowptr_ref, cols_ref, vals_ref, x_ref, y_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    count = rowptr_ref[i + 1] - rowptr_ref[i]

    @pl.when(j == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    @pl.when(j < count)
    def _():
        # dense (8, 128) tile times its x slice, reduced over lanes
        y_ref[:] += jnp.sum(vals_ref[0] * x_ref[:], axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret", "max_bpr"))
def bcsr_matvec(vals, cols, rowptr, max_bpr, x, interpret=False):
    """y = A @ x over the BCSR structure. ``x``: (n_padded,); returns
    (m_padded,). ``max_bpr``: max blocks per block-row (static; grid
    minor dimension). Tile shape comes from ``vals.shape[1:]``."""
    nnzb, bm, bn = vals.shape
    nbr = rowptr.shape[0] - 1
    acc = x.dtype
    x2 = x.reshape(1, -1)

    def _clamped(i, j, rowptr_ref):
        flat = rowptr_ref[i] + j
        # clamp inside the row (padded steps re-read the row's last tile,
        # masked out of the sum) AND inside the structure: for a TRAILING
        # empty block row, rowptr[i] == nnzb and the row-clamp alone would
        # index one past the end of vals/cols
        last = jnp.maximum(rowptr_ref[i + 1] - 1, rowptr_ref[i])
        return jnp.minimum(jnp.minimum(flat, last), nnzb - 1)

    def vals_map(i, j, rowptr_ref, cols_ref):
        return (_clamped(i, j, rowptr_ref), 0, 0)

    def x_map(i, j, rowptr_ref, cols_ref):
        return (0, cols_ref[_clamped(i, j, rowptr_ref)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nbr, int(max_bpr)),
        in_specs=[
            pl.BlockSpec((1, bm, bn), lambda i, j, *pref: (vals_map(i, j, *pref)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, *pref: (x_map(i, j, *pref)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, 1), lambda i, j, *pref: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    y = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbr * bm, 1), acc),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nnzb * bm * bn,
            bytes_accessed=nnzb * bm * bn * vals.dtype.itemsize,
            transcendentals=0,
        ),
    )(rowptr, cols, vals, x2)
    return y[:, 0]


def _slab_kernel(cols_ref, rows_ref, vals_ref, x_ref, y_ref, *, k, acc_dtype):
    """One grid step streams a CONTIGUOUS slab of ``k`` stored tiles (one
    large DMA — Pallas double-buffers the sequential slabs), contracts each
    against its x block (x fully VMEM-resident, dynamic leading-dim load)
    and accumulates into the resident y (dynamic leading-dim accumulate).
    This removes the per-tile DMA-latency bound of the scalar-prefetch
    index-map kernel (measured 81 GB/s at 128 KB tiles — VERDICT r2 item 6);
    the slab size k*bm*bn*4 (default 1 MB) amortizes issue latency."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    for kk in range(k):  # static unroll over the slab
        f = i * k + kk
        c = cols_ref[f]
        r = rows_ref[f]
        xt = x_ref[c]                                   # (1, bn) VMEM load
        tile = vals_ref[kk].astype(acc_dtype)           # (bm, bn)
        y_ref[r] += jnp.sum(tile * xt, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("nbr", "interpret", "slab"))
def bcsr_matvec_slab(vals, cols, rows, nbr, x, slab=8, interpret=False):
    """y = A @ x over BCSR storage, slab-streamed (see _slab_kernel).

    ``rows``: (nnzb,) per-tile block-row ids (block-row-major order, so
    each y block is touched in one contiguous run); ``nbr``: number of
    block rows (static); ``x``: (n_padded,). Returns (nbr*bm,).
    Zero-tile padding to a slab multiple is done here (padded tiles point
    at row/col 0 and contribute exact zeros)."""
    nnzb, bm, bn = vals.shape
    acc = x.dtype
    pad = (-nnzb) % slab
    if pad:
        vals = jnp.concatenate(
            [vals, jnp.zeros((pad, bm, bn), vals.dtype)], axis=0)
        cols = jnp.concatenate([cols, jnp.zeros((pad,), cols.dtype)])
        rows = jnp.concatenate([rows, jnp.zeros((pad,), rows.dtype)])
    nsteps = (nnzb + pad) // slab
    x3 = x.reshape(-1, 1, bn)  # (nbc, 1, bn): block index is the leading dim

    y = pl.pallas_call(
        functools.partial(_slab_kernel, k=slab, acc_dtype=acc),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nsteps,),
            in_specs=[
                pl.BlockSpec((slab, bm, bn), lambda i, *pref: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(x3.shape, lambda i, *pref: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((nbr, bm, 1), lambda i, *pref: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((nbr, bm, 1), acc),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nnzb * bm * bn,
            bytes_accessed=nnzb * bm * bn * vals.dtype.itemsize,
            transcendentals=0,
        ),
    )(cols, rows, vals, x3)
    return y.reshape(-1)


def bcsr_matvec_xla(vals, cols, rows, x, nbr):
    """Jittable dense-equivalent over the stored tiles (gather + einsum +
    segment-sum) — the non-TPU backend path; ``rows``: (nnzb,) per-tile
    block-row ids."""
    bn = vals.shape[2]
    xblk = jnp.take(x.reshape(-1, bn), cols, axis=0)         # (nnzb, bn)
    contrib = jnp.einsum("fij,fj->fi", vals.astype(x.dtype), xblk)
    y = jax.ops.segment_sum(contrib, rows, num_segments=nbr)
    return y.reshape(-1)


def bcsr_matvec_ref(vals, cols, rowptr, x):
    """Pure-numpy reference (validation)."""
    nbr = rowptr.shape[0] - 1
    bm, bn = vals.shape[1], vals.shape[2]
    y = np.zeros(nbr * bm, np.asarray(x).dtype)
    xv = np.asarray(x)
    v = np.asarray(vals)
    c = np.asarray(cols)
    rp = np.asarray(rowptr)
    for i in range(nbr):
        for f in range(rp[i], rp[i + 1]):
            y[i * bm:(i + 1) * bm] += v[f] @ xv[c[f] * bn:(c[f] + 1) * bn]
    return jnp.asarray(y)


@pytree_dataclass(meta=("shape", "padded_shape", "max_bpr", "max_bpr_t", "kernel"))
class BCSROperator:
    """Linear operator over (bm, bn) block-sparse storage, both directions
    (default 64x512 = 128 KB f32 tiles; pass ``block=`` to change — finer
    tiles capture more sparsity but are DMA-latency-bound, see the module
    header measurements).

    Construct with ``from_dense``. ``kernel`` selects the matvec path:
    "xla" (default, gather + einsum + segment_sum) or "pallas"
    (scalar-prefetch tile streaming) or "slab" (contiguous slab DMA).
    Same-window round-3 measurements (tools/bcsr_probe.py,
    tools/bcsr_mxu_probe.py, 8192x16384 @ 10.6% block density, 54.5 MB
    stored): ALL paths are dominated by a ~1 ms per-invocation floor on
    this chip — xla 0.91 ms, pallas 1.03, slab 1.02-1.07, MXU-formulated
    slabs slower still — so the XLA path wins by ~10% and sparse-vs-dense
    delivers 1.35-1.5x wall at this size (crossover density ~0.14).
    ``block_density`` (stored tiles / total tiles AT THE CHOSEN
    GRANULARITY) is the traffic ratio vs dense.
    """

    vals: jnp.ndarray
    cols: jnp.ndarray
    rowptr: jnp.ndarray
    rows: jnp.ndarray  # (nnzb,) per-tile block-row id (XLA fallback path)
    vals_t: jnp.ndarray
    cols_t: jnp.ndarray
    rowptr_t: jnp.ndarray
    rows_t: jnp.ndarray
    shape: tuple
    padded_shape: tuple
    max_bpr: int
    max_bpr_t: int
    kernel: str = "xla"

    @classmethod
    def from_dense(cls, dense, block=(_BM, _BN), kernel="xla"):
        d = np.asarray(dense)
        bm, bn = block
        vals, cols, rowptr, pshape = bcsr_from_dense(d, bm, bn)
        vals_t, cols_t, rowptr_t, _ = bcsr_from_dense(d.T, bm, bn)
        rows = np.repeat(np.arange(len(rowptr) - 1), np.diff(rowptr)).astype(np.int32)
        rows_t = np.repeat(np.arange(len(rowptr_t) - 1), np.diff(rowptr_t)).astype(np.int32)
        return cls(
            vals=jnp.asarray(vals), cols=jnp.asarray(cols),
            rowptr=jnp.asarray(rowptr), rows=jnp.asarray(rows),
            vals_t=jnp.asarray(vals_t), cols_t=jnp.asarray(cols_t),
            rowptr_t=jnp.asarray(rowptr_t), rows_t=jnp.asarray(rows_t),
            shape=d.shape, padded_shape=pshape,
            max_bpr=int(np.diff(rowptr).max(initial=1)),
            max_bpr_t=int(np.diff(rowptr_t).max(initial=1)),
            kernel=kernel,
        )

    @property
    def block_density(self):
        bm, bn = self.vals.shape[1], self.vals.shape[2]
        nbr = self.padded_shape[0] // bm
        nbc = self.padded_shape[1] // bn
        return self.vals.shape[0] / max(1, nbr * nbc)

    def _mv(self, vals, cols, rowptr, rows, max_bpr, v, in_dim, out_dim):
        vp = jnp.zeros(_pad_up(in_dim, vals.shape[2]), v.dtype).at[:in_dim].set(v)
        on_tpu = jax.default_backend() in ("tpu", "axon")
        if self.kernel == "pallas" and on_tpu:
            y = bcsr_matvec(vals, cols, rowptr, max_bpr, vp)
        elif self.kernel == "slab" and on_tpu:
            y = bcsr_matvec_slab(vals, cols, rows, rowptr.shape[0] - 1, vp)
        else:
            y = bcsr_matvec_xla(vals, cols, rows, vp, rowptr.shape[0] - 1)
        return y[:out_dim]

    def matvec(self, x):
        return self._mv(self.vals, self.cols, self.rowptr, self.rows,
                        self.max_bpr, x, self.shape[1], self.shape[0])

    def rmatvec(self, y):
        return self._mv(self.vals_t, self.cols_t, self.rowptr_t, self.rows_t,
                        self.max_bpr_t, y, self.shape[0], self.shape[1])

    def norm(self):
        return jnp.sqrt(jnp.sum(self.vals * self.vals))

    def opnorm(self, iters: int = 100, key=None):
        return opnorm2(self, iters=iters, key=key, n=self.shape[1],
                       dtype=self.vals.dtype)
