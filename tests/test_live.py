"""Live log-spaced telemetry (utils.live) — VERDICT r4 missing item 3.

The reference echoes records WHILE solving (emission at src/AdaProx.jl:351,
decimation at experiments/logging.jl:13-17); the framework's history=False
while_loop was silent until return. live_solve chunks the compiled loop on
the traced it_cap bound and must be (a) bit-identical to an uninterrupted
solve and (b) row-identical to the history=True records at the echoed
iterations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import adaprox_tpu as ap
from adaprox_tpu.models.objectives import LeastSquares
from adaprox_tpu.utils.live import live_solve, logstep_boundaries
from adaprox_tpu.utils.logging import is_logstep


@pytest.fixture
def lasso_parts():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((80, 160)))
    b = jnp.asarray(rng.standard_normal(80))
    f = LeastSquares(a=a, b=b)
    g = ap.L1Norm(lam=0.5)
    lf = float(np.linalg.norm(np.asarray(a), 2) ** 2)
    return f, g, lf


def test_logstep_boundaries_match_is_logstep():
    for maxit in (1, 7, 10, 99, 1234, 10_000):
        bs = logstep_boundaries(maxit)
        expect = [it for it in range(1, maxit + 1) if is_logstep(it)]
        if expect[-1] != maxit:
            expect.append(maxit)
        assert bs == expect, maxit


def test_live_solve_bit_identical_and_rows_match_history(lasso_parts):
    f, g, lf = lasso_parts
    rule = ap.AdaPGMRule.make(gamma=1 / lf)
    maxit = 500

    def solve(maxit, resume_state, it_cap):
        return ap.adaptive_proxgrad(
            jnp.zeros(160), f=f, g=g, rule=rule, tol=1e-9, maxit=maxit,
            resume_state=resume_state, it_cap=it_cap)

    res, rows = live_solve(solve, maxit, method="AdaPGM",
                           objective=lambda x: f.value(x) + g(x),
                           out=lambda s: None)
    ref = solve(maxit, None, None)
    assert int(res.numit) == int(ref.numit)
    assert float(res.norm_res) == float(ref.norm_res)
    np.testing.assert_array_equal(np.asarray(res.x), np.asarray(ref.x))

    h = ap.adaptive_proxgrad(jnp.zeros(160), f=f, g=g, rule=rule, tol=1e-9,
                             maxit=maxit, history=True)
    its = np.asarray(h.records.it)
    assert len(rows) == len(logstep_boundaries(maxit))
    for row in rows:
        i = int(np.nonzero(its == row["it"])[0][0])
        for k, col in (("gamma", h.records.gamma),
                       ("norm_res", h.records.norm_res),
                       ("objective", h.records.objective)):
            assert row[k] == float(np.asarray(col)[i]), (row["it"], k)
        for k in ("f_evals", "grad_f_evals", "prox_g_evals"):
            assert row[k] == int(np.asarray(getattr(h.records, k))[i])


def test_live_solve_scan_prefix_bit_identical(lasso_parts):
    """hist_solve_fn: the first two echo decades run as ONE history=True
    scan chunk (every early row in a single transfer); the scan carry must
    hand off to the while_loop chunks bit-exactly."""
    f, g, lf = lasso_parts
    rule = ap.AdaPGMRule.make(gamma=1 / lf)
    maxit = 500

    def solve(maxit, resume_state, it_cap):
        return ap.adaptive_proxgrad(
            jnp.zeros(160), f=f, g=g, rule=rule, tol=1e-9, maxit=maxit,
            resume_state=resume_state, it_cap=it_cap)

    def hist_solve(maxit):
        return ap.adaptive_proxgrad(
            jnp.zeros(160), f=f, g=g, rule=rule, tol=1e-9, maxit=maxit,
            history=True)

    res, rows = live_solve(solve, maxit, method="AdaPGM",
                           objective=lambda x: f.value(x) + g(x),
                           out=lambda s: None, hist_solve_fn=hist_solve)
    ref = solve(maxit, None, None)
    assert int(res.numit) == int(ref.numit)
    assert float(res.norm_res) == float(ref.norm_res)
    np.testing.assert_array_equal(np.asarray(res.x), np.asarray(ref.x))
    # every boundary echoed exactly once, in order
    assert [r["it"] for r in rows] == logstep_boundaries(maxit)
    # early rows match the history records bit-for-bit (they ARE records)
    h = hist_solve(maxit)
    its = np.asarray(h.records.it)
    for row in rows:
        i = int(np.nonzero(its == row["it"])[0][0])
        assert row["gamma"] == float(np.asarray(h.records.gamma)[i])
        assert row["norm_res"] == float(np.asarray(h.records.norm_res)[i])

    # convergence INSIDE the scan prefix returns the scan result directly
    res2, rows2 = live_solve(solve, maxit, method="AdaPGM",
                             out=lambda s: None, hist_solve_fn=hist_solve,
                             scan_prefix=maxit)
    assert int(res2.numit) == int(ref.numit)
    assert rows2[-1]["it"] == int(ref.numit)


def test_live_solve_early_convergence_stops_chunking(lasso_parts):
    """A solve that converges inside a chunk must stop echoing there and
    return the converged result (same numit/counters as uninterrupted)."""
    f, g, lf = lasso_parts
    rule = ap.AdaPGMRule.make(gamma=1 / lf)
    tol = 1e-6

    def solve(maxit, resume_state, it_cap):
        return ap.adaptive_proxgrad(
            jnp.zeros(160), f=f, g=g, rule=rule, tol=tol, maxit=maxit,
            resume_state=resume_state, it_cap=it_cap)

    ref = solve(100_000, None, None)
    assert float(ref.norm_res) <= tol  # it does converge
    res, rows = live_solve(solve, 100_000, method="AdaPGM",
                           out=lambda s: None)
    assert int(res.numit) == int(ref.numit)
    assert float(res.norm_res) == float(ref.norm_res)
    for a, b in zip(res.counters, ref.counters):
        assert int(a) == int(b)
    assert rows[-1]["it"] == int(ref.numit)
    # echoed boundaries are strictly increasing and end at convergence
    its = [r["it"] for r in rows]
    assert its == sorted(set(its))


def test_live_solve_min_it_applies_to_scan_prefix(lasso_parts):
    """min_it must filter the scan-prefix rows too (review r5 finding 6)."""
    f, g, lf = lasso_parts
    rule = ap.AdaPGMRule.make(gamma=1 / lf)

    def solve(maxit, resume_state, it_cap):
        return ap.adaptive_proxgrad(
            jnp.zeros(160), f=f, g=g, rule=rule, tol=1e-9, maxit=maxit,
            resume_state=resume_state, it_cap=it_cap)

    def hist_solve(maxit):
        return ap.adaptive_proxgrad(
            jnp.zeros(160), f=f, g=g, rule=rule, tol=1e-9, maxit=maxit,
            history=True)

    res, rows = live_solve(solve, 300, method="AdaPGM", out=lambda s: None,
                           min_it=50, hist_solve_fn=hist_solve)
    its = [r["it"] for r in rows]
    assert all(i >= 50 for i in its), its
    assert its[-1] == int(res.numit)

    # prefix rows pass result=None to fixup (no per-row result exists; a
    # fixup reading result.extra must fail loud, not read end-of-prefix
    # state for every early row)
    seen = []
    res2, rows2 = live_solve(
        solve, 300, method="AdaPGM", out=lambda s: None,
        hist_solve_fn=hist_solve,
        fixup=lambda row, r: (seen.append(r is None), row)[1])
    n_prefix = sum(1 for r in rows2 if r["it"] <= 100)
    assert seen[:len([x for x in seen if x])].count(True) >= n_prefix - 1


def test_live_solve_pd_schema_and_fixup(lasso_parts):
    """PD solvers echo the PD schema; the fixup hook fills carry-absent
    columns (MP's gamma = t^2 * sigma)."""
    f, g, lf = lasso_parts
    rng = np.random.default_rng(2)
    a_op = ap.DenseOperator(a=jnp.asarray(rng.standard_normal((40, 160))))
    h = ap.L2Norm(lam=1.0)
    t = 1.0

    def solve(maxit, resume_state, it_cap):
        return ap.malitsky_pock(
            jnp.zeros(160), jnp.zeros(40), f=f, g=g, h=h, A=a_op,
            sigma=0.01, t=t, tol=1e-9, maxit=maxit,
            resume_state=resume_state, it_cap=it_cap)

    def fixup(row, res):
        row["gamma"] = t * t * row["sigma"]
        return row

    res, rows = live_solve(solve, 50, method="MP-ls", primal_dual=True,
                           fixup=fixup, out=lambda s: None)
    ref = solve(50, None, None)
    assert int(res.numit) == int(ref.numit)
    np.testing.assert_array_equal(np.asarray(res.x), np.asarray(ref.x))
    for row in rows:
        assert set(row) == set(
            ["method", "it", "gamma", "sigma", "norm_res", "objective",
             "grad_f_evals", "prox_g_evals", "prox_h_evals", "A_evals",
             "At_evals", "f_evals"])
        assert row["gamma"] == row["sigma"] * t * t
    hist = ap.malitsky_pock(
        jnp.zeros(160), jnp.zeros(40), f=f, g=g, h=h, A=a_op,
        sigma=0.01, t=t, tol=1e-9, maxit=50, history=True)
    its = np.asarray(hist.records.it)
    for row in rows:
        i = int(np.nonzero(its == row["it"])[0][0])
        assert row["sigma"] == float(np.asarray(hist.records.sigma)[i])
        assert row["norm_res"] == float(np.asarray(hist.records.norm_res)[i])


@pytest.mark.parametrize("seed", range(6))
def test_live_solve_fuzz_convergence_positions(seed):
    """Randomized tol/maxit/prefix/pipeline so convergence lands inside the
    scan prefix, inside a chunk, exactly on a boundary, or never — the
    live result must be bit-identical to the uninterrupted solve in every
    case, and the echoed iterations strictly increasing ending at numit."""
    rng = np.random.default_rng(seed)
    m, n = 40, 96
    a = jnp.asarray(rng.standard_normal((m, n)))
    b = jnp.asarray(rng.standard_normal(m))
    f = LeastSquares(a=a, b=b)
    g = ap.L1Norm(lam=float(rng.uniform(0.1, 1.0)))
    lf = float(np.linalg.norm(np.asarray(a), 2) ** 2)
    rule = ap.AdaPGMRule.make(gamma=1 / lf)
    maxit = int(rng.integers(5, 400))
    tol = float(10.0 ** rng.uniform(-9, -1))
    depth = int(rng.integers(0, 6))
    use_prefix = bool(rng.integers(0, 2))
    prefix = int(rng.integers(1, maxit + 1)) if use_prefix else 0

    def solve(maxit, resume_state, it_cap):
        return ap.adaptive_proxgrad(
            jnp.zeros(n), f=f, g=g, rule=rule, tol=tol, maxit=maxit,
            resume_state=resume_state, it_cap=it_cap)

    def hist_solve(maxit):
        return ap.adaptive_proxgrad(
            jnp.zeros(n), f=f, g=g, rule=rule, tol=tol, maxit=maxit,
            history=True)

    res, rows = live_solve(
        solve, maxit, method="AdaPGM", out=lambda s: None, pipeline=depth,
        hist_solve_fn=hist_solve if use_prefix else None,
        scan_prefix=prefix)
    ref = solve(maxit, None, None)
    ctx = dict(maxit=maxit, tol=tol, depth=depth, prefix=prefix)
    assert int(res.numit) == int(ref.numit), ctx
    assert float(res.norm_res) == float(ref.norm_res), ctx
    np.testing.assert_array_equal(np.asarray(res.x), np.asarray(ref.x))
    its = [r["it"] for r in rows]
    assert its == sorted(set(its)), ctx
    assert its[-1] == int(res.numit), ctx


@pytest.mark.parametrize("maker", [
    lambda f, g, lf: ("bt", lambda maxit, resume_state, it_cap:
                      ap.backtracking_proxgrad(
                          jnp.zeros(160), f=f, g=g, gamma0=10 / lf, xi=1.5,
                          tol=1e-9, maxit=maxit, resume_state=resume_state,
                          it_cap=it_cap)),
    lambda f, g, lf: ("nest", lambda maxit, resume_state, it_cap:
                      ap.backtracking_nesterov(
                          jnp.zeros(160), f=f, g=g, gamma0=10 / lf,
                          tol=1e-9, maxit=maxit, resume_state=resume_state,
                          it_cap=it_cap)),
    lambda f, g, lf: ("fixed_nesterov", lambda maxit, resume_state, it_cap:
                      ap.fixed_nesterov(
                          jnp.zeros(160), f=f, g=g, Lf=lf,
                          tol=1e-9, maxit=maxit, resume_state=resume_state,
                          it_cap=it_cap)),
    lambda f, g, lf: ("agraal", lambda maxit, resume_state, it_cap:
                      ap.agraal(
                          jnp.zeros(160), f=f, g=g, gamma0=0.5 / lf,
                          tol=1e-9, maxit=maxit, resume_state=resume_state,
                          it_cap=it_cap)),
])
def test_live_solve_other_families_bit_identical(lasso_parts, maker):
    """Every solver family accepts it_cap; the chunked live solve must be
    bit-identical to an uninterrupted one."""
    f, g, lf = lasso_parts
    name, solve = maker(f, g, lf)
    res, rows = live_solve(solve, 120, method=name, out=lambda s: None)
    ref = solve(120, None, None)
    assert int(res.numit) == int(ref.numit), name
    assert float(res.norm_res) == float(ref.norm_res), name
    np.testing.assert_array_equal(np.asarray(res.x), np.asarray(ref.x), name)
    assert [r["it"] for r in rows][-1] == int(res.numit)
    # every family's carry must surface gamma (review r5 finding 1:
    # fixed_nesterov's carry lacked it and rows read NaN mid-stream)
    assert all(np.isfinite(r["gamma"]) for r in rows), name
    if int(res.numit) == 120:  # ran to maxit: every boundary must echo
        # (catches a resume path that drops it_cap and jumps to maxit —
        # the agraal resume-branch bug this asserted against)
        assert [r["it"] for r in rows] == logstep_boundaries(120), name
