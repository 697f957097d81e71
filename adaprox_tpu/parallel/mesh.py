"""Device mesh + sharding helpers (SURVEY.md §2.4 — all net-new relative to
the single-process reference).

Design: the solver engine is a pure jitted program, so scaling out is purely
a *data placement* decision — shard the problem arrays over a
``jax.sharding.Mesh`` and XLA/GSPMD inserts the collectives:

  * ``A``   (m, n)  -> P("rows", "cols")   — 2-D sharded data matrix in HBM
  * ``b,y`` (m,)    -> P("rows")           — residual-space vectors
  * ``x``   (n,)    -> P("cols")           — iterate-space vectors
  * ``A @ x``   contracts n  -> psum over "cols", output P("rows")
  * ``A' @ r``  contracts m  -> psum over "rows", output P("cols")
  * rule curvature scalars / residual norms -> all-reduce to replicated

Per-iteration cross-device traffic is therefore two partial-matvec psums
plus ~6 scalars — the engine itself has no communication code (compare the
reference's single-process matvecs at src/AdaProx.jl:327,335,358).

Multi-host entry: ``distributed_init()`` wraps ``jax.distributed.initialize``
so the same SPMD program spans hosts (ICI within a slice, DCN across).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "shard_array",
    "replicate",
    "shard_lasso",
    "distributed_init",
    "ROWS",
    "COLS",
]

ROWS = "rows"
COLS = "cols"


def make_mesh(shape=None, devices=None) -> Mesh:
    """A 2-D ("rows", "cols") mesh. ``shape=None`` puts all devices on the
    rows axis (pure row sharding — right for tall data matrices, m >> n)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, (ROWS, COLS))


def shard_array(x, mesh: Mesh, spec: P):
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))


def shard_lasso(a, b, mesh: Mesh):
    """Place a least-squares data matrix + rhs for the canonical 2-D layout."""
    return (
        shard_array(a, mesh, P(ROWS, COLS)),
        shard_array(b, mesh, P(ROWS)),
    )


def distributed_init(**kwargs):
    """Multi-host runtime init (idempotent). On a single host this is a
    no-op; on a pod slice call it before building the mesh."""
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        # Only the idempotence case may be swallowed. XlaRuntimeError
        # (coordinator unreachable, timeouts) subclasses RuntimeError —
        # swallowing it would silently degrade a multi-host launch to
        # independent single-process runs reporting fabricated numbers.
        if "already initialized" not in str(e).lower():
            raise
    return jax.process_index(), jax.process_count()
