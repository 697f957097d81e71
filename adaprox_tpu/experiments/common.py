"""Shared experiment harness.

Each experiment driver mirrors its reference `runme.jl`: build the problem,
run every applicable solver with history=True, write the reference-schema
JSONL (utils.logging), echo log-spaced rows to the console, and plot
convergence from the JSONL. Solvers run as compiled scan-mode programs; the
JSONL is written post-hoc from the stacked records.
"""

from __future__ import annotations

import os
from collections import defaultdict
from types import SimpleNamespace

import numpy as np

from ..utils import logging as tlog

__all__ = ["Sink", "group_rows", "plot_lines", "pick_platform", "pad_tiles",
           "run_timed"]


def pick_platform(force_cpu: bool = False, x64: bool = False):
    """Experiments default to whatever backend JAX resolves (TPU when
    available, running f32); --cpu forces the local CPU backend in f64 — the
    reference's numeric regime (see tests/conftest.py for why this image
    needs the config override, not just JAX_PLATFORMS). --f64 (x64=True)
    keeps the accelerator backend but enables f64 end to end — XLA:TPU
    emulated f64, the mode that meets the reference's tol-1e-7 criteria on
    hardware (PARITY_TPU.md)."""
    import jax

    # persistent compile cache: repeated grid runs reuse executables instead
    # of re-queueing the remote compiler (queue waits of 100-250 s were
    # observed landing in single wall_s rows)
    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        return
    if x64:
        jax.config.update("jax_enable_x64", True)
    else:
        # accelerator path runs f32: the f64-to-f32 truncation of the numpy
        # problem data is intended, not a bug — silence the per-array warning
        import warnings

        warnings.filterwarnings(
            "ignore", message=".*requested dtype float64.*", category=UserWarning
        )

    # force one tiny synced dispatch before anything is timed: the FIRST
    # device round-trip of a fresh process through the relay can stall
    # 60-100+ s (session establishment / queue) — measured landing entirely
    # in whichever wall_s row happened to run first, even with every kernel
    # compile already in the persistent cache
    try:
        import jax.numpy as jnp

        float(jnp.zeros((8, 128)).sum())
    except Exception:
        pass


def pad_tiles(a, b, m_mult=8, n_mult=128):
    """Zero-pad (A, b) to TPU tile alignment for the fused/resident fast
    paths. Exact for least-squares + separable g with prox(0) = 0: padded
    ROWS have zero residual (b padded with 0), padded COLUMNS get zero
    gradient and their coordinates stay exactly 0, so objective, residual
    norm, and every curvature reduction are unchanged (cf. the PadDomain/
    PadTail treatment in solvers.pd_fused)."""
    import jax.numpy as jnp

    m, n = a.shape
    mp = -(-m // m_mult) * m_mult
    np_ = -(-n // n_mult) * n_mult
    if (mp, np_) != (m, n):
        a = jnp.pad(jnp.asarray(a), ((0, mp - m), (0, np_ - n)))
        b = jnp.pad(jnp.asarray(b), (0, mp - m))
    return a, b


def route_menu_sweep(sweep_fn, a, b, x0, rows, tol, maxit, **kw):
    """Route a method-menu resident sweep (ops.resident.resident_rule_sweep /
    ops.resident_bt.resident_bt_sweep) through sweep-axis sharding: when more
    than one device is visible the method rows are split over a ("sweep",)
    mesh with the operands replicated (parallel/sweep.py — bit-equal to the
    single launch); on the one bench chip this is the direct call. Same
    routing the t-coupling sweeps already get in dual_svm/square_root_lasso."""
    import functools

    from adaprox_tpu.parallel.sweep import maybe_sharded_sweep

    fn = functools.partial(sweep_fn, tol=tol, maxit=maxit, **kw)
    return maybe_sharded_sweep(
        fn, {"a": a, "b": b, "x0": x0, "rows": rows}, {"rows"})


def sync_wall(fn):
    """Run ``fn`` and return ``(out, wall_seconds)`` with forced
    device->host sync: block_until_ready on every leaf plus one element
    transfer (block_until_ready alone under-syncs through the axon relay —
    utils/profiling.timed rationale). The shared timing primitive for the
    resident/grid fast-path walls."""
    import time as _time

    import jax
    import jax.numpy as jnp

    t0 = _time.perf_counter()
    out = fn()
    leaves = jax.tree_util.tree_leaves(out)
    for leaf in leaves:
        jax.block_until_ready(leaf)
    float(jnp.asarray(leaves[0]).ravel()[0])  # forced round-trip
    return out, _time.perf_counter() - t0


def run_timed(times, name, fn):
    """Run ``fn`` and record its forced-sync wall time under ``name``.

    Timing needs a device->host transfer on this backend
    (utils/profiling.timed rationale: block_until_ready alone under-syncs
    through the axon relay). Includes one compile — experiment rows are
    each compiled once anyway, so the wall column reflects what a user
    waits for; per-iteration rates belong to bench.py."""
    import time as _time

    import jax

    def _leaves(obj):
        # SimpleNamespace (the resident drivers' result wrapper) is a pytree
        # LEAF, not a node — recurse into vars() or the sync silently skips
        # the device arrays and the wall time excludes the kernel execution.
        if isinstance(obj, SimpleNamespace):
            obj = vars(obj)
        for leaf in jax.tree_util.tree_leaves(
                obj, is_leaf=lambda o: isinstance(o, SimpleNamespace)):
            if isinstance(leaf, SimpleNamespace):
                yield from _leaves(leaf)
            else:
                yield leaf

    t0 = _time.perf_counter()
    res = fn()
    for leaf in _leaves(res):
        if hasattr(leaf, "dtype"):
            np.asarray(leaf)  # host transfer = hard sync per computation
    times[name] = round(_time.perf_counter() - t0, 4)
    return res


def live_menu(sink, times, menu, objective=None, primal_dual=False,
              fixup=None, pipeline=1):
    """Run a method menu with live telemetry (the drivers' --live mode):
    each entry is (name, maxit, make) — or (name, maxit, make, fixup) for
    a per-entry row fixup overriding the menu-wide one — where
    ``make(**overrides)`` accepts maxit=, resume_state=, it_cap=,
    history= and returns a SolveResult.
    Early-exit history=False solves, reference-format rows echoed while
    solving (utils.live.live_solve with the scan-prefix for the early
    decades); the JSONL gets the log-spaced rows. ``pipeline`` defaults to
    1 here (not live_solve's 4): menu solves are tol-based early exits,
    and every chunk enqueued past convergence runs to its boundary before
    being discarded."""
    from ..utils.live import live_solve

    for entry in menu:
        name, mx, make = entry[:3]
        efix = entry[3] if len(entry) > 3 else fixup
        def do(name=name, mx=mx, make=make, efix=efix):
            res, rows = live_solve(
                lambda maxit, resume_state, it_cap: make(
                    maxit=maxit, resume_state=resume_state, it_cap=it_cap),
                mx, method=name, objective=objective,
                primal_dual=primal_dual, fixup=efix, pipeline=pipeline,
                # first two echo decades as one scan chunk: their
                # boundaries are 1-10 iterations apart, less device work
                # than one relay dispatch each
                hist_solve_fn=lambda maxit, make=make: make(
                    maxit=maxit, history=True))
            tlog.write_jsonl(sink.path, rows, keys=sink.keys)
            return res
        run_timed(times, name, do)


def run_menu(sink, times, menu, *, live, objective=None, primal_dual=False,
             fixup=None, pipeline=1):
    """Run a method menu either as history=True record solves (default) or
    with live telemetry (--live) — the shared driver wiring, so the
    fast_path label and the live/else split cannot drift per driver.
    Returns the fast_path label for the driver's meta row."""
    if live:
        live_menu(sink, times, menu, objective=objective,
                  primal_dual=primal_dual, fixup=fixup, pipeline=pipeline)
        return "live"
    for entry in menu:
        name, mx, make = entry[:3]
        sink.add(run_timed(times, name, lambda mx=mx, make=make: make(
            maxit=mx, history=True)), primal_dual=primal_dual or None)
    return "default"


class Sink:
    """JSONL sink + console echo for one experiment output file."""

    def __init__(self, path, keys=None, echo=True, base=10):
        self.path = str(path)
        self.keys = keys
        self.echo = echo
        self.base = base
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        open(self.path, "w").close()  # truncate

    def emit_pseudo(self, row: dict):
        """A non-solver record (e.g. the known optimum, lasso runme.jl:79)."""
        tlog.write_jsonl(self.path, [row], keys=self.keys)

    def emit_meta(self, **meta):
        """An unprojected metadata row (e.g. data_source) — bypasses the key
        projection so labels like synthetic-vs-libsvm survive into the file
        (summaries must say which tables ran on fallback data)."""
        tlog.write_jsonl(self.path, [dict(meta)], keys=None)

    def add(self, result, primal_dual=None):
        n, last = tlog.write_records_jsonl(
            self.path, result.records, result.name,
            primal_dual=primal_dual, keys=self.keys)
        if self.echo and last is not None:
            tlog.echo_logstep_rows([last], self.base)
        return n


def group_rows(rows):
    by = defaultdict(list)
    for r in rows:
        if r.get("method") is None:
            continue
        by[r["method"]].append(r)
    return by


def plot_lines(path, series, title, xlabel, ylabel, out_path=None):
    """Convergence plot: log-y lines per method (the reference's
    plot_convergence/plot_residual shape). ``series`` is a list of
    (label, xs, ys)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    fig, ax = plt.subplots(figsize=(7, 5))
    for label, xs, ys in series:
        ys = np.maximum(np.asarray(ys, float), 1e-14)
        ax.semilogy(xs, ys, label=label, linewidth=1.2)
    ax.set_title(title)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.legend(fontsize=7)
    fig.tight_layout()
    out = out_path or (str(path) + ".pdf")
    fig.savefig(out)
    plt.close(fig)
    return out
