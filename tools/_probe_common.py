"""Shared measurement boilerplate for the tools/ probes.

The measurement-methodology rules here are load-bearing (CLAUDE.md):

  * K kernel reps INSIDE one jitted ``lax.fori_loop`` with a carry
    dependence feeding each call — a single dispatched op on this
    remote-relay backend costs ~25 ms (10x a 1 GB kernel), and a
    loop-invariant call gets hoisted so the "measurement" is one
    execution amortized K times;
  * big arrays passed as jit ARGUMENTS (closure capture ships them to the
    remote compiler — observed 150 s+ compiles for trivial graphs);
  * a forced device->host transfer (``float(...)``) per measurement —
    ``block_until_ready`` is not enough on this backend.

Each probe used to carry its own copy of this; keep fixes here so the
probes can't drift apart methodologically.
"""

from __future__ import annotations

import os
import time


def setup_jax_cache(jax):
    """Point jax at the repo's persistent compile cache (repeat probe runs
    reuse executables instead of re-queueing the remote compiler)."""
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def make_timed_loop(jax, jnp, K):
    """Return ``timed_loop(step, *arrs) -> secs/rep`` measuring ONE timed
    invocation of a K-rep carry-fed fori_loop (probes that want best-of-N
    call it once per round-robin round so every variant shares the same
    co-tenant window)."""

    def timed_loop(step, *arrs):
        @jax.jit
        def loop(*arrs):
            return jax.lax.fori_loop(
                0, K, lambda i, c: c * 1e-30 + step(c, *arrs),
                jnp.float32(0.0))

        float(loop(*arrs))  # compile + settle
        t0 = time.perf_counter()
        float(loop(*arrs))
        return (time.perf_counter() - t0) / K

    return timed_loop
