"""Device-parallel sweep sharding (parallel/sweep.py): the resident
whole-solve sweep kernels sharded over the virtual 8-device mesh must
reproduce the single-device launch bit-for-bit — every sweep cell is an
independent solve, so sharding only moves cells between devices.

Covers the t-coupling sweeps (f=0 MP/AdaPDM+, dual-SVM AdaPDM) and the
method-menu sweeps (rule menu, backtracking menu), the non-divisible
padding path, and record mode (nested history tuples through shard_map).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaprox_tpu.ops.resident import (
    resident_adapdm_dsvm_sweep, resident_adapdmp_sweep, resident_mpls_sweep,
    resident_rule_sweep, rule_rows)
from adaprox_tpu.ops.resident_bt import resident_bt_sweep
from adaprox_tpu.parallel.sweep import SWEEP, sharded_sweep, sweep_mesh


@pytest.fixture(scope="module")
def mesh():
    return sweep_mesh()


@pytest.fixture(scope="module")
def f0_problem():
    rng = np.random.default_rng(3)
    m, n = 64, 32
    return (jnp.asarray(rng.standard_normal((m, n))),
            jnp.asarray(rng.standard_normal(m)))


def _assert_tree_equal(ref, out):
    rl, ol = jax.tree.leaves(ref), jax.tree.leaves(out)
    assert len(rl) == len(ol)
    for r, o in zip(rl, ol):
        assert r.shape == o.shape
        np.testing.assert_array_equal(np.asarray(r), np.asarray(o))


@pytest.mark.parametrize("tcount", [8, 11])  # 11 exercises the pad path
@pytest.mark.parametrize("sweep_fn", [resident_mpls_sweep,
                                      resident_adapdmp_sweep])
def test_f0_sweep_sharded_matches_single(f0_problem, mesh, sweep_fn, tcount):
    a, bv = f0_problem
    ts = jnp.asarray(np.geomspace(0.1, 10.0, tcount))
    fn = functools.partial(sweep_fn, lam=0.1, sigma0=1.0, tol=1e-9,
                           maxit=50, record=True, interpret=True)
    if sweep_fn is resident_adapdmp_sweep:
        fn = functools.partial(sweep_fn, lam=0.1, eta0=1.0, tol=1e-9,
                               maxit=50, record=True, interpret=True)
    ref = fn(a=a, bv=bv, ts=ts)
    out = sharded_sweep(fn, mesh, {"a": a, "bv": bv, "ts": ts}, {"ts"})
    _assert_tree_equal(ref, out)


def test_dsvm_sweep_sharded_matches_single(mesh):
    rng = np.random.default_rng(5)
    N, d = 40, 16
    x_mat = rng.standard_normal((N, d))
    y = np.sign(rng.standard_normal(N))
    b_fac = y[:, None] * x_mat
    q = jnp.asarray(b_fac @ b_fac.T)
    lab = jnp.asarray(y)
    ts = jnp.asarray(np.geomspace(0.1, 10.0, 12))
    fn = functools.partial(
        resident_adapdm_dsvm_sweep, big_c=1.0,
        norm_a=float(jnp.linalg.norm(q, 2)), tol=1e-9, maxit=60,
        record=True, interpret=True)
    ref = fn(q=q, labels=lab, ts=ts)
    out = sharded_sweep(fn, mesh, {"q": q, "labels": lab, "ts": ts}, {"ts"})
    _assert_tree_equal(ref, out)


def test_method_menu_sweeps_sharded(f0_problem, mesh):
    """Menu sweeps shard the (small) method axis: R=3 on 8 devices —
    idle devices recompute the padded edge row and the slice drops it."""
    a, bv = f0_problem
    n = a.shape[1]
    x0 = jnp.zeros(n)
    rows = rule_rows([(1e-2, "adapgm", False), (1e-2, "mm", False),
                      (1e-2, "fixed", True)], tol=1e-9, maxit=40)
    fn = functools.partial(resident_rule_sweep, tol=1e-9, maxit=40,
                           prox_kind="l1", p1=0.1, interpret=True)
    ref = fn(a=a, b=bv, x0=x0, rows=rows)
    out = sharded_sweep(fn, mesh, {"a": a, "b": bv, "x0": x0, "rows": rows},
                        {"rows"})
    _assert_tree_equal(ref, out)

    btrows = jnp.asarray([[1e-2, 1.0, 0.0], [1e-2, 1.05, 0.0],
                          [1e-2, 1.0, 1.0]])
    fnb = functools.partial(resident_bt_sweep, tol=1e-9, maxit=40,
                            prox_kind="l1", p1=0.1, interpret=True)
    refb = fnb(a=a, b=bv, x0=x0, rows=btrows)
    outb = sharded_sweep(fnb, mesh, {"a": a, "b": bv, "x0": x0,
                                     "rows": btrows}, {"rows"})
    _assert_tree_equal(refb, outb)


def test_sharded_sweep_validates(f0_problem, mesh):
    a, bv = f0_problem
    ts = jnp.asarray(np.geomspace(0.1, 10.0, 8))
    fn = functools.partial(resident_mpls_sweep, lam=0.1, sigma0=1.0,
                           tol=1e-9, maxit=10, interpret=True)
    with pytest.raises(ValueError, match="not in arrays"):
        sharded_sweep(fn, mesh, {"a": a, "bv": bv, "ts": ts}, {"nope"})
    with pytest.raises(ValueError, match="sweep length"):
        sharded_sweep(fn, mesh, {"a": a, "bv": bv, "ts": ts},
                      {"ts", "bv"})


@pytest.mark.parametrize("h_kind", ["l2", "l1"])  # sqrt-lasso / LAD families
def test_f0_grid_t_axis_sharded_matches_single(mesh, h_kind):
    """The dataset-batched (dataset x t) grid launchers shard the t axis
    (out_axis=1: every output leaf is (D, T, ...)); t=11 on 8 devices
    exercises the pad path on the non-leading output axis."""
    from adaprox_tpu.ops.resident import resident_adapdmp_grid, resident_mpls_grid

    rng = np.random.default_rng(9)
    dcount, m, n = 2, 32, 16
    a_stack = jnp.asarray(rng.standard_normal((dcount, m, n)))
    bv_stack = jnp.asarray(rng.standard_normal((dcount, m)))
    lams = jnp.full((dcount,), 0.1)
    ts = jnp.asarray(np.geomspace(0.1, 10.0, 11))
    for grid_fn, p2name in ((resident_mpls_grid, "sigma0s"),
                            (resident_adapdmp_grid, "eta0s")):
        fn = functools.partial(grid_fn, tol=1e-9, maxit=40, record=True,
                               h_kind=h_kind, interpret=True)
        arrays = {"a_stack": a_stack, "bv_stack": bv_stack, "lams": lams,
                  "ts": ts, p2name: jnp.ones((dcount,))}
        ref = fn(**arrays)
        out = sharded_sweep(fn, mesh, arrays, {"ts"}, out_axis=1)
        _assert_tree_equal(ref, out)


def test_cv_grid_dataset_axis_sharded_matches_single(mesh):
    """Condat-Vu grid shards its dataset axis: D=3 on 8 devices — idle
    devices recompute the padded edge dataset and the slice drops it."""
    from adaprox_tpu.ops.resident import resident_cv_grid

    rng = np.random.default_rng(11)
    dcount, m, n = 3, 32, 16
    arrays = {
        "a_stack": jnp.asarray(rng.standard_normal((dcount, m, n))),
        "bv_stack": jnp.asarray(rng.standard_normal((dcount, m))),
        "lams": jnp.full((dcount,), 0.1),
        "gammas": jnp.full((dcount,), 0.05),
        "sigmas": jnp.full((dcount,), 0.04),
    }
    fn = functools.partial(resident_cv_grid, tol=1e-9, maxit=40,
                           interpret=True)
    ref = fn(**arrays)
    out = sharded_sweep(fn, mesh, arrays, set(arrays))
    _assert_tree_equal(ref, out)


def test_driver_sweep_sharding_matches_direct(tmp_path, monkeypatch):
    """The sqrt-lasso --resident driver routes its t-sweeps through
    maybe_sharded_sweep; under the 8-virtual-device conftest that is the
    SHARDED path. Forcing the direct path must give identical JSONL
    records (wall-clock meta rows excluded)."""
    import adaprox_tpu.parallel.sweep as sweep_mod
    from adaprox_tpu.experiments import square_root_lasso
    from adaprox_tpu.utils.logging import read_jsonl

    argv = ["--datasets", "housing_scale", "--maxit", "40",
            "--resident", "--no-plot"]
    square_root_lasso.main(argv + ["--outdir", str(tmp_path / "sharded")])

    monkeypatch.setattr(
        sweep_mod, "sharded_sweep",
        lambda fn, mesh, arrays, keys, out_axis=0: fn(**arrays))
    square_root_lasso.main(argv + ["--outdir", str(tmp_path / "direct")])

    def records(d):
        rows = read_jsonl(d / "housing_scale.jsonl")
        return [r for r in rows if "method" in r]

    assert records(tmp_path / "sharded") == records(tmp_path / "direct")


def test_menu_driver_sweep_sharding_matches_direct(tmp_path, monkeypatch):
    """The PG drivers route their method-menu resident sweeps (rule menu +
    backtracking menu) through maybe_sharded_sweep too (common.py
    route_menu_sweep); under the 8-virtual-device conftest that is the
    SHARDED path. Forcing the direct path must give identical JSONL
    records (wall-clock meta rows excluded)."""
    import adaprox_tpu.parallel.sweep as sweep_mod
    from adaprox_tpu.experiments import lasso
    from adaprox_tpu.utils.logging import read_jsonl

    argv = ["--sizes", "24x48x4", "--maxit", "40", "--resident", "--no-plot"]
    lasso.main(argv + ["--outdir", str(tmp_path / "sharded")])

    monkeypatch.setattr(
        sweep_mod, "sharded_sweep",
        lambda fn, mesh, arrays, keys, out_axis=0: fn(**arrays))
    lasso.main(argv + ["--outdir", str(tmp_path / "direct")])

    def records(d):
        rows = read_jsonl(d / "lasso_24_48_4.jsonl")
        return [r for r in rows if "method" in r]

    sharded = records(tmp_path / "sharded")
    assert sharded == records(tmp_path / "direct")
    # all nine menu rows (the method=None row is the optimum pseudo-record)
    assert len({r["method"] for r in sharded} - {None}) == 9


def test_composed_sweep_rows_regpath(f0_problem):
    """Composed 2-D (sweep x rows) parallelism: a vmapped regularization
    path with the lambda/batch axis placed on "sweep" and the data matrix
    row-sharded on "rows" (GSPMD keeps the row psums within each sweep
    group). Must match the unsharded vmapped solve to reduction-
    reassociation noise."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from adaprox_tpu.models.objectives import LeastSquares
    from adaprox_tpu.parallel.mesh import ROWS
    from adaprox_tpu.parallel.sweep import composed_mesh
    from adaprox_tpu.solvers.batch import regularization_path

    a, bv = f0_problem
    n = a.shape[1]
    x0 = jnp.zeros(n)
    lams = jnp.asarray(np.geomspace(0.05, 1.0, 8))
    gamma = 1.0 / float(jnp.linalg.norm(a, 2)) ** 2

    ref = regularization_path(x0, f=LeastSquares(a=a, b=bv), lams=lams,
                              gamma=gamma, tol=0.0, maxit=60)

    cmesh = composed_mesh(2, 4)
    sh = lambda v, spec: jax.device_put(v, NamedSharding(cmesh, spec))
    res = regularization_path(
        sh(x0, P()), f=LeastSquares(a=sh(a, P(ROWS)), b=sh(bv, P(ROWS))),
        lams=sh(lams, P(SWEEP)), gamma=gamma, tol=0.0, maxit=60)
    assert np.array_equal(np.asarray(res.numit), np.asarray(ref.numit))
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=1e-9, atol=1e-12)


def test_output_shards_live_on_the_mesh(f0_problem, mesh):
    """The gathered outputs must actually be sweep-sharded device arrays
    (each device held its own cells), not a host-side concat."""
    a, bv = f0_problem
    ts = jnp.asarray(np.geomspace(0.1, 10.0, 8))
    fn = functools.partial(resident_mpls_sweep, lam=0.1, sigma0=1.0,
                           tol=1e-9, maxit=20, interpret=True)
    out = sharded_sweep(fn, mesh, {"a": a, "bv": bv, "ts": ts}, {"ts"})
    x = out[0]
    assert len(x.sharding.device_set) == mesh.devices.size
    assert x.sharding.spec[0] == SWEEP
