"""Scaling-efficiency benchmark harness (BASELINE.json: ">=80% iterations/s
scaling efficiency at 1 chip, 1 host, N>=2 hosts").

Measures AdaPGM iterations/s on a row-sharded lasso across growing mesh
sizes, in two regimes:

  * strong scaling — fixed global problem, more devices;
  * weak scaling   — fixed per-device rows, problem grows with the mesh.

Emits one JSON line per mesh size with iterations/s and efficiency vs the
single-device run. On a multi-chip TPU slice this is the real measurement;
on a single chip / CPU it validates the harness and the compiled collective
program (set --devices to use virtual CPU devices).

Multi-host: launch the same script under `jax.distributed` on every host
(parallel.mesh.distributed_init runs first when --multihost is passed).
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def measure(mesh_devices, m, n, iters, dtype_name="float32"):
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    import adaprox_tpu as ap
    from adaprox_tpu.models.objectives import LeastSquares
    from adaprox_tpu.parallel.mesh import COLS, ROWS, make_mesh, shard_array
    from adaprox_tpu.utils.profiling import timed

    dtype = jnp.dtype(dtype_name)
    mesh = make_mesh((len(mesh_devices), 1), devices=mesh_devices)
    key = jax.random.PRNGKey(0)
    # NB float(...): a raw np.float64 scalar is strong-typed in JAX and
    # would silently promote the f32 matrix to f64 under jax_enable_x64
    a = shard_array(
        jax.random.normal(key, (m, n), dtype) * float(1.0 / np.sqrt(n)),
        mesh, P(ROWS, COLS),
    )
    b = shard_array(jax.random.normal(jax.random.PRNGKey(1), (m,), dtype), mesh, P(ROWS))
    x0 = shard_array(jnp.zeros(n, dtype), mesh, P(COLS))
    f = LeastSquares(a=a, b=b)
    g = ap.L1Norm(lam=jnp.asarray(0.01, dtype))

    def run():
        res = ap.adaptive_proxgrad(
            x0, f=f, g=g, rule=ap.AdaPGMRule(gamma=jnp.asarray(1e-3, dtype)),
            tol=0.0, maxit=iters, history=False,
        )
        return res.norm_res

    secs, _ = timed(run)
    return iters / secs


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=8192, help="global rows (strong) / per-device rows (weak)")
    p.add_argument("--n", type=int, default=4096)
    p.add_argument("--iters", type=int, default=200)
    p.add_argument("--mode", choices=["strong", "weak"], default="strong")
    p.add_argument("--devices", type=int, default=0, help="0 = all available")
    p.add_argument("--cpu", type=int, default=0, help="N>0: use N virtual CPU devices")
    p.add_argument("--multihost", action="store_true")
    args = p.parse_args(argv)

    if args.cpu:
        import os

        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu}"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    if args.multihost:
        from adaprox_tpu.parallel.mesh import distributed_init

        distributed_init()

    devices = jax.devices()
    n_max = args.devices or len(devices)
    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= n_max]

    base_ips = None
    for nd in sizes:
        m = args.m if args.mode == "strong" else args.m * nd
        ips = measure(devices[:nd], m, args.n, args.iters)
        if base_ips is None:
            base_ips = ips
        if args.mode == "strong":
            # ideal: iterations/s scales with devices (each does m/nd rows)
            eff = ips / (base_ips * nd)
        else:
            # ideal: iterations/s stays flat as the problem grows with mesh
            eff = ips / base_ips
        print(json.dumps({
            "metric": f"scaling_{args.mode}_iters_per_sec",
            "devices": nd,
            "rows": m,
            "cols": args.n,
            "value": round(ips, 2),
            "unit": "iter/s",
            "efficiency": round(eff, 4),
        }), flush=True)


if __name__ == "__main__":
    main()
