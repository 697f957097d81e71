"""Pallas fused-oracle kernels vs their XLA two-pass references (interpret
mode on CPU; the same kernels compile natively on TPU — see bench.py)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import adaprox_tpu as ap
from adaprox_tpu.ops import kernels
from adaprox_tpu.models.objectives import LeastSquares, LogisticLoss


@pytest.mark.parametrize("m,n", [(64, 128), (128, 256), (8, 128)])
def test_fused_ls_matches_xla(rng, m, n):
    a = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
    b = jnp.asarray(rng.standard_normal(m), jnp.float32)
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    f_ref, g_ref = kernels.ls_value_grad_xla(a, b, x)
    f_k, g_k = kernels.fused_ls_value_grad(a, b, x, interpret=True)
    np.testing.assert_allclose(float(f_k), float(f_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_ref), rtol=1e-4, atol=1e-5)


def test_fused_ls_bf16_storage(rng):
    m, n = 64, 128
    a = jnp.asarray(rng.standard_normal((m, n)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal(m), jnp.float32)
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    f_k, g_k = kernels.fused_ls_value_grad(a, b, x, interpret=True)
    f_ref, g_ref = kernels.ls_value_grad_xla(a.astype(jnp.float32), b, x)
    # bf16 matrix storage: agreement to bf16 resolution
    np.testing.assert_allclose(float(f_k), float(f_ref), rtol=3e-2)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_ref), rtol=5e-2, atol=0.3)
    assert g_k.dtype == jnp.float32  # accumulation stays f32


def test_fused_logistic_matches_xla(rng):
    m, n = 64, 128
    x_mat = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
    y = jnp.asarray((rng.random(m) > 0.5).astype(np.float32))
    w = jnp.asarray(rng.standard_normal(n) * 0.1, jnp.float32)
    wb = jnp.asarray(0.3, jnp.float32)
    f_ref, gw_ref, gb_ref = kernels.logistic_value_grad_xla(x_mat, y, w, wb)
    f_k, gw_k, gb_k = kernels.fused_logistic_value_grad(x_mat, y, w, wb, interpret=True)
    np.testing.assert_allclose(float(f_k), float(f_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_k), np.asarray(gw_ref), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(gb_k), float(gb_ref), rtol=1e-4)


def test_fused_objective_solves_lasso(rng):
    """AdaPGM with the fused oracle reaches the same solution as unfused."""
    m, n = 64, 128
    a = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
    b = jnp.asarray(rng.standard_normal(m), jnp.float32)
    g = ap.L1Norm(lam=jnp.float32(0.5))
    kw = dict(g=g, rule=ap.AdaPGMRule(gamma=jnp.float32(1e-3)), tol=1e-5, maxit=500)
    r_plain = ap.adaptive_proxgrad(jnp.zeros(n, jnp.float32),
                                   f=LeastSquares(a=a, b=b), **kw)
    r_fused = ap.adaptive_proxgrad(jnp.zeros(n, jnp.float32),
                                   f=LeastSquares(a=a, b=b, fused=True), **kw)
    f_eval = LeastSquares(a=a, b=b)
    obj = lambda r: float(f_eval.value(r.x) + g(r.x))
    assert obj(r_fused) == pytest.approx(obj(r_plain), rel=1e-4, abs=1e-5)


def test_fused_objective_solves_logreg(rng):
    m, n = 64, 128
    x_mat = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
    y = jnp.asarray((rng.random(m) > 0.5).astype(np.float32))
    g = ap.L1Norm(lam=jnp.float32(0.01))
    kw = dict(g=g, rule=ap.AdaPGMRule(gamma=jnp.float32(1.0)), tol=1e-6, maxit=300)
    r_plain = ap.adaptive_proxgrad(jnp.zeros(n + 1, jnp.float32),
                                   f=LogisticLoss(x=x_mat, y=y), **kw)
    r_fused = ap.adaptive_proxgrad(jnp.zeros(n + 1, jnp.float32),
                                   f=LogisticLoss(x=x_mat, y=y, fused=True), **kw)
    np.testing.assert_allclose(np.asarray(r_fused.x), np.asarray(r_plain.x),
                               rtol=1e-3, atol=1e-4)


def test_unaligned_falls_back(rng):
    """Non-tile-aligned shapes silently use the XLA path."""
    a = jnp.asarray(rng.standard_normal((30, 50)), jnp.float32)  # unaligned
    b = jnp.asarray(rng.standard_normal(30), jnp.float32)
    f = LeastSquares(a=a, b=b, fused=True)
    assert not f._use_fused()
    v, g = f.value_and_grad(jnp.ones(50, jnp.float32))
    f_ref, g_ref = kernels.ls_value_grad_xla(a, b, jnp.ones(50, jnp.float32))
    np.testing.assert_allclose(float(v), float(f_ref), rtol=1e-6)


def test_pick_block_rows():
    assert kernels.pick_block_rows(4096, 4096, 4) % 8 == 0
    assert 4096 % kernels.pick_block_rows(4096, 4096, 4) == 0
    tm = kernels.pick_block_rows(16384, 16384, 4)
    assert tm * 16384 * 4 <= kernels._VMEM_TILE_BUDGET


def test_resident_adapgm_matches_engine(rng):
    """The whole-solve VMEM-resident kernel must track the engine's AdaPGM
    trajectory (same iteration structure) and reach the same solution."""
    from adaprox_tpu.models.synthetic import random_lasso
    from adaprox_tpu.ops.resident import resident_adapgm_l1, resident_supported

    prob = random_lasso(m=64, n=128, pfactor=8, seed=1)
    a = jnp.asarray(prob.a, jnp.float32)
    b = jnp.asarray(prob.b, jnp.float32)
    assert resident_supported(a)
    lf = float(np.linalg.norm(prob.a, 2) ** 2)
    x, numit, nres, conv = resident_adapgm_l1(
        a, b, jnp.zeros(128, jnp.float32), 1 / lf, 1.0, 1e-4, 3000, interpret=True
    )
    f = LeastSquares(a=a, b=b)
    g = ap.L1Norm(lam=jnp.float32(1.0))
    ref = ap.adaptive_proxgrad(
        jnp.zeros(128, jnp.float32), f=f, g=g,
        rule=ap.AdaPGMRule(gamma=jnp.float32(1 / lf)), tol=1e-4, maxit=3000,
    )
    assert bool(conv)
    assert abs(int(numit) - int(ref.numit)) <= 5
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref.x), rtol=1e-4, atol=1e-5)


def test_resident_supported_limits():
    from adaprox_tpu.ops.resident import resident_supported

    big = jnp.zeros((8192, 8192), jnp.float32)  # 256MB > VMEM budget
    assert not resident_supported(big)
    assert not resident_supported(jnp.zeros((30, 128), jnp.float32))  # misaligned


@pytest.mark.parametrize("kind,p1,p2,make_g", [
    ("box", -0.2, 0.4, lambda: ap.IndBox(lo=-0.2, hi=0.4)),
    ("elastic", 0.5, 0.3, lambda: ap.ElasticNet(lam1=0.5, lam2=0.3)),
    ("zero", 0.0, 0.0, lambda: ap.Zero()),
], ids=["box", "elastic", "zero"])
def test_resident_prox_menu(rng, kind, p1, p2, make_g):
    from adaprox_tpu.ops.resident import resident_adapgm

    m, n = 32, 128
    a = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
    b = jnp.asarray(rng.standard_normal(m), jnp.float32)
    lf = float(np.linalg.norm(np.asarray(a), 2) ** 2)
    x, numit, nres, conv = resident_adapgm(
        a, b, jnp.zeros(n, jnp.float32), 1 / lf, 1e-4, 3000,
        prox_kind=kind, p1=p1, p2=p2, interpret=True,
    )
    ref = ap.adaptive_proxgrad(
        jnp.zeros(n, jnp.float32), f=LeastSquares(a=a, b=b), g=make_g(),
        rule=ap.AdaPGMRule(gamma=jnp.float32(1 / lf)), tol=1e-4, maxit=3000,
    )
    # f32 reassociation drift shifts the stopping iteration near tol
    assert abs(int(numit) - int(ref.numit)) <= max(25, int(ref.numit) // 10)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref.x), rtol=1e-3, atol=1e-4)


def test_resident_kernel_vmaps(rng):
    """Batched whole-solves: vmap over the resident kernel's prox parameter
    (a regularization path of complete solves in one compiled program)."""
    from adaprox_tpu.ops.resident import resident_adapgm

    m, n = 32, 128
    a = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
    b = jnp.asarray(rng.standard_normal(m), jnp.float32)
    lf = float(np.linalg.norm(np.asarray(a), 2) ** 2)
    lams = jnp.asarray([0.2, 0.6, 1.2], jnp.float32)

    def solve(lam):
        return resident_adapgm(a, b, jnp.zeros(n, jnp.float32), 1 / lf, 1e-4,
                               2000, prox_kind="l1", p1=lam, interpret=True)

    xs, numits, nres, conv = jax.vmap(solve)(lams)
    assert xs.shape == (3, n)
    for i in range(3):
        x1, n1, r1, c1 = solve(lams[i])
        assert int(numits[i]) == int(n1)
        np.testing.assert_allclose(np.asarray(xs[i]), np.asarray(x1), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("rule_kind,make_rule", [
    ("mm", lambda g0: ap.MalitskyMishchenkoRule(gamma=g0)),
    ("fixed", lambda g0: ap.FixedStepsize(gamma=g0)),
], ids=["mm", "fixed"])
def test_resident_rule_menu(rng, rule_kind, make_rule):
    from adaprox_tpu.ops.resident import resident_adapgm

    m, n = 32, 128
    a = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
    b = jnp.asarray(rng.standard_normal(m), jnp.float32)
    lf = float(np.linalg.norm(np.asarray(a), 2) ** 2)
    x, numit, nres, conv = resident_adapgm(
        a, b, jnp.zeros(n, jnp.float32), 1 / lf, 1e-4, 5000,
        prox_kind="l1", p1=0.3, rule_kind=rule_kind, interpret=True,
    )
    ref = ap.adaptive_proxgrad(
        jnp.zeros(n, jnp.float32), f=LeastSquares(a=a, b=b),
        g=ap.L1Norm(lam=jnp.float32(0.3)),
        rule=make_rule(jnp.float32(1 / lf)), tol=1e-4, maxit=5000,
    )
    assert abs(int(numit) - int(ref.numit)) <= max(25, int(ref.numit) // 10)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref.x), rtol=1e-3, atol=1e-4)


def test_resident_pd_dsvm_matches_engine(rng):
    """Whole-solve PD kernel for the dual-SVM shape vs the engine."""
    from adaprox_tpu.ops.resident import resident_adapdm_dsvm
    from adaprox_tpu.models.objectives import Quadratic

    n = 128
    feats = rng.standard_normal((n, 6)).astype(np.float32)
    labels = np.sign(rng.standard_normal(n)).astype(np.float32)
    labels[labels == 0] = 1.0
    q = ((labels[:, None] * feats) @ (labels[:, None] * feats).T).astype(np.float32)
    big_c, t = 0.5, 1.0
    norm_a = float(np.linalg.norm(labels))

    x, numit, nres, conv = resident_adapdm_dsvm(
        jnp.asarray(q), jnp.asarray(labels), big_c, t, norm_a, 1e-4, 20_000,
        interpret=True,
    )
    ref = ap.adaptive_primal_dual(
        jnp.zeros(n, jnp.float32), jnp.zeros(1, jnp.float32),
        f=Quadratic(q_mat=jnp.asarray(q), q_vec=-jnp.ones(n, jnp.float32)),
        g=ap.IndBox(lo=0.0, hi=big_c), h=ap.IndZero(),
        A=ap.DenseOperator(a=jnp.asarray(labels[None, :])),
        rule=ap.AdaPGMRule.make(t=t, norm_a=norm_a), tol=1e-4, maxit=20_000,
    )
    assert bool(conv)
    assert abs(int(numit) - int(ref.numit)) <= max(25, int(ref.numit) // 10)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref.x), rtol=1e-3, atol=1e-4)
    # feasibility
    xs = np.asarray(x)
    assert (xs >= -1e-6).all() and (xs <= big_c + 1e-6).all()
    assert abs(labels @ xs) < 1e-2


def test_resident_momentum_matches_fixed_nesterov():
    """Resident kernel's momentum path (VERDICT r1 item 9) vs the engine's
    fixed_nesterov on a lasso instance (interpret mode)."""
    import numpy as np

    import adaprox_tpu as ap
    from adaprox_tpu.models.objectives import LeastSquares
    from adaprox_tpu.models.synthetic import random_lasso
    from adaprox_tpu.ops.resident import resident_adapgm

    prob = random_lasso(m=64, n=128, pfactor=8, seed=6)
    a = jnp.asarray(prob.a, jnp.float32)
    b = jnp.asarray(prob.b, jnp.float32)
    lf = float(np.linalg.norm(prob.a, 2) ** 2)
    x, numit, nres, conv = resident_adapgm(
        a, b, jnp.zeros(128, jnp.float32), 1 / lf, 1e-5, 800,
        prox_kind="l1", p1=1.0, rule_kind="fixed", momentum=True,
        interpret=True)
    ref = ap.fixed_nesterov(
        jnp.zeros(128, jnp.float32),
        f=LeastSquares(a=a, b=b), g=ap.L1Norm(lam=jnp.float32(1.0)),
        gamma=jnp.float32(1 / lf), tol=1e-5, maxit=800)
    assert int(numit) == int(ref.numit)
    # dual-layout lane reductions vs XLA matmul: f32 drift over ~500 iters
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref.x),
                               rtol=1e-3, atol=1e-5)
    assert bool(conv) == (float(ref.norm_res) <= 1e-5)


def test_resident_batch_matches_single():
    """Grid-batched multi-problem resident solve (one grid step per
    instance, per-instance SMEM scalars) == per-instance single solves
    (interpret mode). This is the compiled answer to the SMEM-vmap
    limitation documented in ops/resident.py."""
    import numpy as np

    from adaprox_tpu.models.synthetic import random_lasso
    from adaprox_tpu.ops.resident import resident_adapgm, resident_adapgm_batch

    mats, rhs, x0s, scals = [], [], [], []
    for seed, lam in [(0, 1.0), (1, 0.5), (2, 2.0), (3, 1.0)]:
        prob = random_lasso(m=64, n=128, pfactor=8, seed=seed)
        lf = float(np.linalg.norm(prob.a, 2) ** 2)
        mats.append(np.asarray(prob.a, np.float32))
        rhs.append(np.asarray(prob.b, np.float32))
        x0s.append(np.zeros(128, np.float32))
        scals.append([1 / lf, 1e-5, lam, 0.0])
    a = jnp.asarray(np.stack(mats))
    b = jnp.asarray(np.stack(rhs))
    x0 = jnp.asarray(np.stack(x0s))
    scal = jnp.asarray(np.asarray(scals, np.float32))

    xb, itb, nresb, convb = resident_adapgm_batch(
        a, b, x0, scal, maxit=600, interpret=True)
    for i in range(4):
        x1, it1, nres1, conv1 = resident_adapgm(
            a[i], b[i], x0[i], scal[i, 0], float(scal[i, 1]), 600,
            prox_kind="l1", p1=scal[i, 2], interpret=True)
        assert int(itb[i]) == int(it1)
        assert bool(convb[i]) == bool(conv1)
        np.testing.assert_allclose(np.asarray(xb[i]), np.asarray(x1),
                                   rtol=1e-6, atol=1e-7)


def test_resident_bf16_storage():
    """bf16-storage resident solve (halves VMEM -> 2x larger problems
    resident; f32 accumulation via dtype promotion) tracks the f32 solve."""
    import numpy as np

    from adaprox_tpu.models.synthetic import random_lasso
    from adaprox_tpu.ops.resident import resident_adapgm, resident_supported

    p = random_lasso(m=64, n=128, pfactor=8, seed=6)
    a32 = jnp.asarray(p.a, jnp.float32)
    b = jnp.asarray(p.b, jnp.float32)
    lf = float(np.linalg.norm(p.a, 2) ** 2)
    kw = dict(gamma0=1 / lf, tol=1e-5, maxit=800, p1=1.0, interpret=True)
    x32, it32, _, c32 = resident_adapgm(a32, b, jnp.zeros(128, jnp.float32), **kw)
    xbf, itbf, _, cbf = resident_adapgm(
        a32.astype(jnp.bfloat16), b, jnp.zeros(128, jnp.float32), **kw)
    assert bool(c32) and bool(cbf)
    assert abs(int(itbf) - int(it32)) <= max(5, int(it32) // 20)
    np.testing.assert_allclose(np.asarray(xbf), np.asarray(x32),
                               rtol=5e-2, atol=3e-2)
    # the VMEM budget check accounts for the smaller itemsize
    big = jnp.zeros((2048, 2048), jnp.bfloat16)
    assert resident_supported(big)  # 8 MB bf16 fits where 16 MB f32 might not


def test_resident_dsvm_sweep_matches_single():
    """On-core t-sweep (one launch, grid over couplings) == per-t resident
    solves (interpret mode)."""
    import numpy as np

    from adaprox_tpu.ops.resident import (
        resident_adapdm_dsvm,
        resident_adapdm_dsvm_sweep,
    )

    rng = np.random.default_rng(7)
    n = 128
    xd = rng.standard_normal((n, 10))
    labels = np.sign(rng.standard_normal(n))
    labels[labels == 0] = 1
    q = (labels[:, None] * xd) @ (labels[:, None] * xd).T
    qj = jnp.asarray(q, jnp.float32)
    lj = jnp.asarray(labels, jnp.float32)
    na = float(np.linalg.norm(labels))
    ts = [0.1, 1.0, 5.0]
    xs, its, nres, conv = resident_adapdm_dsvm_sweep(
        qj, lj, 0.1, jnp.asarray(ts), na, 1e-5, 3000, interpret=True)
    for i, t in enumerate(ts):
        x1, it1, nres1, conv1 = resident_adapdm_dsvm(
            qj, lj, 0.1, float(t), na, 1e-5, 3000, interpret=True)
        assert int(its[i]) == int(it1), t
        assert bool(conv[i]) == bool(conv1)
        np.testing.assert_allclose(np.asarray(xs[i]), np.asarray(x1),
                                   rtol=1e-6, atol=1e-7)


def test_resident_logreg_matches_engine():
    """Whole-solve logistic resident kernel vs the engine's LogisticLoss
    AdaPGM path (interpret mode; padded rows excluded from the mean)."""
    import numpy as np

    import adaprox_tpu as ap
    from adaprox_tpu.models.objectives import LogisticLoss
    from adaprox_tpu.ops.resident import resident_logreg_l1
    from adaprox_tpu.utils.datasets import synthetic_classification

    x_np, y_np = synthetic_classification(100, 23, seed=8)  # ragged sizes
    m, nf = x_np.shape
    f = LogisticLoss(x=jnp.asarray(x_np, jnp.float32),
                     y=jnp.asarray(y_np, jnp.float32))
    lam, gam = 0.01, 1.0
    ref = ap.adaptive_proxgrad(
        jnp.zeros(nf + 1, jnp.float32), f=f, g=ap.L1Norm(lam=jnp.float32(lam)),
        rule=ap.AdaPGMRule(gamma=jnp.float32(gam)), tol=1e-6, maxit=1500)

    x1 = np.hstack([x_np, np.ones((m, 1))]).astype(np.float32)
    mp = -(-m // 8) * 8
    npad = -(-(nf + 1) // 128) * 128
    xp = np.zeros((mp, npad), np.float32)
    xp[:m, :nf + 1] = x1
    yp = np.zeros(mp, np.float32)
    yp[:m] = y_np
    x, numit, nres, conv = resident_logreg_l1(
        jnp.asarray(xp), jnp.asarray(yp), jnp.zeros(npad, jnp.float32),
        gam, lam, 1e-6, 1500, m_true=float(m), interpret=True)
    # engine folds bias inside LogisticLoss; resident folds it as the last
    # data column — same math, compare the meaningful coordinates
    got = np.concatenate([np.asarray(x[:nf]), [float(x[nf])]])
    want = np.asarray(ref.x)
    assert abs(int(numit) - int(ref.numit)) <= max(3, int(ref.numit) // 20)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)
    # padding coordinates never activate
    assert float(jnp.max(jnp.abs(x[nf + 1:]))) == 0.0


def test_resident_record_matches_engine_records(rng):
    """Record-mode resident kernel: per-iteration (gamma, norm_res,
    objective) + reconstructed counters must match the engine's scan-mode
    records (VERDICT r2 weak 6 — the fast path must be able to produce the
    reference's JSONL trajectory). Run in f64 so formulation-order noise
    (lane reductions vs XLA matvec) does not amplify through the gamma
    recursion: parity is ~1e-11 over the first 60 iterations, growing
    chaotically to ~2e-4 by iteration 120 (measured)."""
    from adaprox_tpu.models.synthetic import random_lasso
    from adaprox_tpu.ops.resident import resident_adapgm, resident_records

    prob = random_lasso(m=64, n=128, pfactor=8, seed=3)
    a = jnp.asarray(prob.a, jnp.float64)
    b = jnp.asarray(prob.b, jnp.float64)
    lf = float(np.linalg.norm(prob.a, 2) ** 2)
    maxit = 120
    x, numit, nres, conv, hg, hr, ho = resident_adapgm(
        a, b, jnp.zeros(128, jnp.float64), 1 / lf, 0.0, maxit,
        prox_kind="l1", p1=1.0, record=True, interpret=True)
    recs = resident_records(numit, hg, hr, ho, maxit=maxit)

    ref = ap.adaptive_proxgrad(
        jnp.zeros(128, jnp.float64), f=LeastSquares(a=a, b=b),
        g=ap.L1Norm(lam=jnp.float64(1.0)),
        rule=ap.AdaPGMRule(gamma=jnp.float64(1 / lf)), tol=0.0, maxit=maxit,
        history=True)
    for name, got, want, pre in [
        ("gamma", recs.gamma, ref.records.gamma, 1e-8),
        ("norm_res", recs.norm_res, ref.records.norm_res, 1e-8),
        ("objective", recs.objective, ref.records.objective, 1e-10),
    ]:
        got, want = np.asarray(got), np.asarray(want)
        np.testing.assert_allclose(got[:60], want[:60], rtol=pre,
                                   err_msg=f"{name} prefix")
        np.testing.assert_allclose(got, want, rtol=2e-3,
                                   err_msg=f"{name} full")
    for k in ("f_evals", "grad_f_evals", "prox_g_evals"):
        np.testing.assert_array_equal(np.asarray(getattr(recs, k)),
                                      np.asarray(getattr(ref.records, k)), k)


def test_resident_record_momentum_matches_nesterov_records():
    from adaprox_tpu.models.synthetic import random_lasso
    from adaprox_tpu.ops.resident import resident_adapgm, resident_records

    prob = random_lasso(m=64, n=128, pfactor=8, seed=5)
    a = jnp.asarray(prob.a, jnp.float64)
    b = jnp.asarray(prob.b, jnp.float64)
    lf = float(np.linalg.norm(prob.a, 2) ** 2)
    maxit = 80
    x, numit, nres, conv, hg, hr, ho = resident_adapgm(
        a, b, jnp.zeros(128, jnp.float64), 1 / lf, 0.0, maxit,
        prox_kind="l1", p1=1.0, rule_kind="fixed", momentum=True,
        record=True, interpret=True)
    recs = resident_records(numit, hg, hr, ho, maxit=maxit, momentum=True)

    ref = ap.fixed_nesterov(
        jnp.zeros(128, jnp.float64), f=LeastSquares(a=a, b=b),
        g=ap.L1Norm(lam=jnp.float64(1.0)), gamma=1 / lf, tol=0.0,
        maxit=maxit, history=True)
    # fixed stepsize: no adaptive amplification — f64 parity is ~1e-12
    np.testing.assert_allclose(np.asarray(recs.norm_res),
                               np.asarray(ref.records.norm_res), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(recs.objective),
                               np.asarray(ref.records.objective), rtol=1e-12)
    for k in ("f_evals", "grad_f_evals", "prox_g_evals"):
        np.testing.assert_array_equal(np.asarray(getattr(recs, k)),
                                      np.asarray(getattr(ref.records, k)), k)


def test_resident_record_logreg_objective():
    """Logreg record-mode objective must equal the engine's (incl. the
    padded-row -log(2) correction)."""
    from adaprox_tpu.models.objectives import LogisticLoss
    from adaprox_tpu.ops.resident import resident_logreg_l1, resident_records

    rng = np.random.default_rng(2)
    m_true, n_feat = 60, 127  # pads to 64 rows x 128 cols (incl. ones col)
    x_np = rng.standard_normal((m_true, n_feat))
    y_np = (rng.random(m_true) > 0.5).astype(float)
    x1 = np.hstack([x_np, np.ones((m_true, 1))])
    x1_pad = np.zeros((64, 128), np.float64)
    x1_pad[:m_true, :128] = x1
    y_pad = np.zeros(64, np.float64)
    y_pad[:m_true] = y_np
    lf = float(np.linalg.norm(x1.T @ x1) / (4 * m_true))
    maxit = 60
    x, numit, nres, conv, hg, hr, ho = resident_logreg_l1(
        jnp.asarray(x1_pad), jnp.asarray(y_pad), jnp.zeros(128, jnp.float64),
        1 / lf, 0.01, 0.0, maxit, m_true=m_true, record=True, interpret=True)
    recs = resident_records(numit, hg, hr, ho, maxit=maxit)

    f = LogisticLoss(x=jnp.asarray(x_np, jnp.float64), y=jnp.asarray(y_np, jnp.float64))
    ref = ap.adaptive_proxgrad(
        jnp.zeros(n_feat + 1, jnp.float64), f=f,
        g=ap.L1Norm(lam=jnp.float64(0.01)),
        rule=ap.AdaPGMRule(gamma=jnp.float64(1 / lf)), tol=0.0, maxit=maxit,
        history=True)
    # f64: logaddexp-vs-log1p formulation noise stays below chaotic onset
    np.testing.assert_allclose(np.asarray(recs.objective),
                               np.asarray(ref.records.objective), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(recs.gamma),
                               np.asarray(ref.records.gamma), rtol=1e-4)


def test_resident_dsvm_sweep_record():
    """Record-mode t-sweep: per-t norm_res trajectories must match the
    engine's records for each coupling value."""
    from adaprox_tpu.models.objectives import Quadratic
    from adaprox_tpu.ops.resident import resident_adapdm_dsvm_sweep

    rng = np.random.default_rng(4)
    n = 128
    feats = rng.standard_normal((n, 10))
    labels = np.sign(rng.standard_normal(n))
    labels[labels == 0] = 1
    q = ((labels[:, None] * feats) @ (labels[:, None] * feats).T).astype(np.float64)
    norm_a = float(np.linalg.norm(labels))
    ts = [0.3, 1.0]
    maxit = 100
    xs, numits, nress, convs, hg, hr = resident_adapdm_dsvm_sweep(
        jnp.asarray(q), jnp.asarray(labels, jnp.float64), 0.5,
        jnp.asarray(ts, jnp.float64), norm_a, 0.0, maxit, record=True,
        interpret=True)
    for i, t in enumerate(ts):
        ref = ap.adaptive_primal_dual(
            jnp.zeros(n, jnp.float64), jnp.zeros(1, jnp.float64),
            f=Quadratic(q_mat=jnp.asarray(q), q_vec=-jnp.ones(n, jnp.float64)),
            g=ap.IndBox(lo=0.0, hi=0.5), h=ap.IndZero(),
            A=ap.DenseOperator(a=jnp.asarray(labels[None, :], jnp.float64)),
            rule=ap.AdaPGMRule.make(t=t, norm_a=norm_a),
            tol=0.0, maxit=maxit, history=True)
        np.testing.assert_allclose(np.asarray(hr[i]),
                                   np.asarray(ref.records.norm_res),
                                   rtol=1e-6, atol=1e-12)
        np.testing.assert_allclose(np.asarray(hg[i]),
                                   np.asarray(ref.records.gamma), rtol=1e-6)


def test_resident_dsvm_padded_matches_engine():
    """LIBSVM-shaped (misaligned) Q zero-padded to tile alignment with
    n_true: trajectories must match the engine on the UNPADDED problem and
    the padded coordinates must stay exactly 0 (the iota-masked linear term
    in _pd_core); resident_pd_records counters must equal the engine's."""
    from adaprox_tpu.models.objectives import Quadratic
    from adaprox_tpu.ops.resident import (
        resident_adapdm_dsvm_sweep, resident_pd_records)

    rng = np.random.default_rng(7)
    n = 100  # pads to 128
    n_pad = 128
    feats = rng.standard_normal((n, 9))
    labels = np.sign(rng.standard_normal(n))
    labels[labels == 0] = 1
    q = ((labels[:, None] * feats) @ (labels[:, None] * feats).T).astype(np.float64)
    q_pad = np.zeros((n_pad, n_pad))
    q_pad[:n, :n] = q
    lab_pad = np.zeros(n_pad)
    lab_pad[:n] = labels
    norm_a = float(np.linalg.norm(labels))
    ts = [0.5]
    maxit = 80
    xs, numits, nress, convs, hg, hr = resident_adapdm_dsvm_sweep(
        jnp.asarray(q_pad), jnp.asarray(lab_pad), 0.5,
        jnp.asarray(ts, jnp.float64), norm_a, 0.0, maxit, n_true=n,
        record=True, interpret=True)
    assert float(np.abs(np.asarray(xs)[0, n:]).max()) == 0.0
    ref = ap.adaptive_primal_dual(
        jnp.zeros(n, jnp.float64), jnp.zeros(1, jnp.float64),
        f=Quadratic(q_mat=jnp.asarray(q), q_vec=-jnp.ones(n, jnp.float64)),
        g=ap.IndBox(lo=0.0, hi=0.5), h=ap.IndZero(),
        A=ap.DenseOperator(a=jnp.asarray(labels[None, :], jnp.float64)),
        rule=ap.AdaPGMRule.make(t=0.5, norm_a=norm_a),
        tol=0.0, maxit=maxit, history=True)
    np.testing.assert_allclose(np.asarray(hr[0]),
                               np.asarray(ref.records.norm_res),
                               rtol=1e-6, atol=1e-12)
    np.testing.assert_allclose(np.asarray(xs)[0, :n], np.asarray(ref.x),
                               rtol=1e-8, atol=1e-10)
    recs = resident_pd_records(numits[0], hg[0], hr[0], maxit=maxit, t=0.5)
    for k in ("f_evals", "grad_f_evals", "prox_g_evals", "prox_h_evals",
              "A_evals", "At_evals", "it"):
        np.testing.assert_array_equal(np.asarray(getattr(recs, k)),
                                      np.asarray(getattr(ref.records, k)), k)
    np.testing.assert_allclose(np.asarray(recs.sigma),
                               np.asarray(ref.records.sigma), rtol=1e-6)


def test_resident_condat_vu_matches_engine():
    """Resident Condat-Vu (f = 0, h = Translate(L2, -bv)): per-iteration
    norm_res/objective + deterministic counters must match the engine's
    scan records on the sqrt-lasso shape."""
    from adaprox_tpu.ops.resident import resident_condat_vu, resident_cv_records

    rng_ = np.random.default_rng(9)
    m, n = 128, 128
    a = jnp.asarray(rng_.standard_normal((m, n)), jnp.float64)
    w_true = rng_.standard_normal(n) * (rng_.random(n) < 0.2)
    bv = a @ jnp.asarray(w_true) + 0.1 * jnp.asarray(rng_.standard_normal(m))
    lam = 1.0
    na = float(np.linalg.norm(np.asarray(a)))  # Julia norm(A) = Frobenius
    par, par2 = 5.0, 100.0
    alpha = 1.0  # Lf = 0 -> norm_A > par * Lf
    gamma = 1.0 / (0.0 / 2 + na / alpha)
    sigma = 0.99 / (na * alpha)
    maxit = 80

    x, numit, nres, conv, hists = resident_condat_vu(
        a, bv, lam, gamma, sigma, 0.0, maxit, record=True, interpret=True)
    recs = resident_cv_records(numit, gamma, sigma, hists, maxit=maxit)

    ref = ap.condat_vu(
        jnp.zeros(n, jnp.float64), jnp.zeros(m, jnp.float64),
        f=ap.ZeroSmooth(), g=ap.L1Norm(lam=lam),
        h=ap.Translate(inner=ap.L2Norm(lam=1.0), b=-bv),
        A=ap.DenseOperator(a=a), Lf=0.0, norm_A=na, tol=0.0, maxit=maxit,
        history=True)
    np.testing.assert_allclose(np.asarray(recs.norm_res),
                               np.asarray(ref.records.norm_res), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(recs.objective),
                               np.asarray(ref.records.objective), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref.x), rtol=1e-9,
                               atol=1e-12)
    for k in ("f_evals", "grad_f_evals", "prox_g_evals", "prox_h_evals",
              "A_evals", "At_evals"):
        np.testing.assert_array_equal(np.asarray(getattr(recs, k)),
                                      np.asarray(getattr(ref.records, k)), k)


def test_resident_mpls_sweep_matches_engine():
    """Resident Malitsky-Pock t-sweep: gamma/sigma/norm_res trajectories,
    linesearch trial counts (via the reconstructed counters), and the final
    iterate must match the engine per t."""
    from adaprox_tpu.ops.resident import resident_mpls_sweep, resident_mp_records

    rng_ = np.random.default_rng(4)
    m, n = 128, 128
    a = jnp.asarray(rng_.standard_normal((m, n)), jnp.float64)
    w_true = rng_.standard_normal(n) * (rng_.random(n) < 0.2)
    bv = a @ jnp.asarray(w_true) + 0.1 * jnp.asarray(rng_.standard_normal(m))
    lam = 1.0
    sigma0 = 1.0
    ts = [0.5, 1.0, 2.0]
    maxit = 60

    xs, numits, nress, convs, ls_failed, hists = resident_mpls_sweep(
        a, bv, lam, jnp.asarray(ts, jnp.float64), sigma0, 0.0, maxit,
        record=True, interpret=True)

    for i, t in enumerate(ts):
        recs = resident_mp_records(
            numits[i], tuple(h[i] for h in hists), maxit=maxit)
        ref = ap.malitsky_pock(
            jnp.zeros(n, jnp.float64), jnp.zeros(m, jnp.float64),
            f=ap.ZeroSmooth(), g=ap.L1Norm(lam=lam),
            h=ap.Translate(inner=ap.L2Norm(lam=1.0), b=-bv),
            A=ap.DenseOperator(a=a), sigma=sigma0, t=t, tol=0.0,
            maxit=maxit, history=True)
        np.testing.assert_allclose(np.asarray(recs.gamma),
                                   np.asarray(ref.records.gamma), rtol=1e-9,
                                   err_msg=f"gamma t={t}")
        np.testing.assert_allclose(np.asarray(recs.sigma),
                                   np.asarray(ref.records.sigma), rtol=1e-9,
                                   err_msg=f"sigma t={t}")
        np.testing.assert_allclose(np.asarray(recs.norm_res),
                                   np.asarray(ref.records.norm_res),
                                   rtol=1e-8, err_msg=f"norm_res t={t}")
        np.testing.assert_allclose(np.asarray(recs.objective),
                                   np.asarray(ref.records.objective),
                                   rtol=1e-9, err_msg=f"objective t={t}")
        np.testing.assert_allclose(np.asarray(xs[i]), np.asarray(ref.x),
                                   rtol=1e-8, atol=1e-12,
                                   err_msg=f"x t={t}")
        # trial-count equality rides through the eval counters
        for k in ("f_evals", "grad_f_evals", "prox_g_evals", "prox_h_evals",
                  "A_evals", "At_evals"):
            np.testing.assert_array_equal(
                np.asarray(getattr(recs, k)),
                np.asarray(getattr(ref.records, k)), f"{k} t={t}")


def test_resident_cv_padded_matches_engine():
    """Zero-padding rows/cols to tile alignment is exact for the f = 0
    translate-L2 family: padded dual coords stay 0 through prox_{sigma h*}
    (b pads with 0), padded primal coords stay 0 through the L1 prox."""
    from adaprox_tpu.ops.resident import resident_condat_vu

    rng_ = np.random.default_rng(2)
    m, n = 100, 13  # housing-like misaligned shape
    a_np = rng_.standard_normal((m, n))
    bv_np = a_np @ (rng_.standard_normal(n) * (rng_.random(n) < 0.5)) \
        + 0.1 * rng_.standard_normal(m)
    lam = 1.0
    na = float(np.linalg.norm(a_np))
    gamma = 1.0 / na
    sigma = 0.99 / na
    maxit = 60

    mp, np_pad = 128, 128
    a_pad = np.zeros((mp, np_pad))
    a_pad[:m, :n] = a_np
    bv_pad = np.zeros(mp)
    bv_pad[:m] = bv_np
    x, numit, nres, conv = resident_condat_vu(
        jnp.asarray(a_pad), jnp.asarray(bv_pad), lam, gamma, sigma, 0.0,
        maxit, interpret=True)

    ref = ap.condat_vu(
        jnp.zeros(n), jnp.zeros(m), f=ap.ZeroSmooth(), g=ap.L1Norm(lam=lam),
        h=ap.Translate(inner=ap.L2Norm(lam=1.0), b=-jnp.asarray(bv_np)),
        A=ap.DenseOperator(a=jnp.asarray(a_np)), gamma=gamma, sigma=sigma,
        Lf=0.0, tol=0.0, maxit=maxit)
    np.testing.assert_allclose(np.asarray(x[:n]), np.asarray(ref.x),
                               rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(np.asarray(x[n:]), 0.0, atol=0.0)
    np.testing.assert_allclose(float(nres), float(ref.norm_res), rtol=1e-6)


def test_resident_cv_l1_inner_matches_engine():
    """h_kind="l1" (least absolute deviation): translate-L1 conjugate prox."""
    from adaprox_tpu.ops.resident import resident_condat_vu

    rng_ = np.random.default_rng(6)
    m, n = 128, 128
    a = jnp.asarray(rng_.standard_normal((m, n)), jnp.float64)
    bv = a @ jnp.asarray(rng_.standard_normal(n) * (rng_.random(n) < 0.2)) \
        + 0.1 * jnp.asarray(rng_.standard_normal(m))
    lam = 1.0
    na = float(np.linalg.norm(np.asarray(a)))
    gamma, sigma = 1.0 / na, 0.99 / na
    maxit = 60

    x, numit, nres, conv = resident_condat_vu(
        a, bv, lam, gamma, sigma, 0.0, maxit, h_kind="l1", interpret=True)
    ref = ap.condat_vu(
        jnp.zeros(n, jnp.float64), jnp.zeros(m, jnp.float64),
        f=ap.ZeroSmooth(), g=ap.L1Norm(lam=lam),
        h=ap.Translate(inner=ap.L1Norm(lam=1.0), b=-bv),
        A=ap.DenseOperator(a=a), gamma=gamma, sigma=sigma, Lf=0.0,
        tol=0.0, maxit=maxit)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref.x), rtol=1e-8,
                               atol=1e-12)
    np.testing.assert_allclose(float(nres), float(ref.norm_res), rtol=1e-6)


def test_resident_adapdmp_sweep_matches_engine():
    """Resident AdaPDM+ t-sweep: gamma/sigma/eta linesearch trajectories,
    trial counts (via counters), and final iterates must match the engine
    per t."""
    from adaprox_tpu.ops.resident import (resident_adapdmp_records,
                                          resident_adapdmp_sweep)

    rng_ = np.random.default_rng(8)
    m, n = 128, 128
    a = jnp.asarray(rng_.standard_normal((m, n)), jnp.float64)
    bv = a @ jnp.asarray(rng_.standard_normal(n) * (rng_.random(n) < 0.2)) \
        + 0.1 * jnp.asarray(rng_.standard_normal(m))
    lam = 1.0
    eta0 = float(np.linalg.norm(np.asarray(a)))  # driver: eta = ||A||_F
    ts = [0.5, 1.0, 2.0]
    maxit = 60

    xs, numits, nress, convs, ls_failed, hists = resident_adapdmp_sweep(
        a, bv, lam, jnp.asarray(ts, jnp.float64), eta0, 0.0, maxit,
        record=True, interpret=True)

    for i, t in enumerate(ts):
        recs = resident_adapdmp_records(
            numits[i], tuple(h[i] for h in hists), maxit=maxit)
        ref = ap.adaptive_linesearch_primal_dual(
            jnp.zeros(n, jnp.float64), jnp.zeros(m, jnp.float64),
            f=ap.ZeroSmooth(), g=ap.L1Norm(lam=lam),
            h=ap.Translate(inner=ap.L2Norm(lam=1.0), b=-bv),
            A=ap.DenseOperator(a=a), eta=eta0, t=t, tol=0.0,
            maxit=maxit, history=True)
        np.testing.assert_allclose(np.asarray(recs.gamma),
                                   np.asarray(ref.records.gamma), rtol=1e-9,
                                   err_msg=f"gamma t={t}")
        np.testing.assert_allclose(np.asarray(recs.sigma),
                                   np.asarray(ref.records.sigma), rtol=1e-9,
                                   err_msg=f"sigma t={t}")
        np.testing.assert_allclose(np.asarray(recs.norm_res),
                                   np.asarray(ref.records.norm_res),
                                   rtol=1e-8, err_msg=f"norm_res t={t}")
        np.testing.assert_allclose(np.asarray(xs[i]), np.asarray(ref.x),
                                   rtol=1e-8, atol=1e-12,
                                   err_msg=f"x t={t}")
        for k in ("f_evals", "grad_f_evals", "prox_g_evals", "prox_h_evals",
                  "A_evals", "At_evals"):
            np.testing.assert_array_equal(
                np.asarray(getattr(recs, k)),
                np.asarray(getattr(ref.records, k)), f"{k} t={t}")


def test_resident_cv_converged_returns_ck_x():
    """At tol > 0 the engine returns ck_x (the iterate AT the convergence
    check, reference semantics) — the resident kernels must match there
    too, not return the extra second-half prox point (round-3 self-review
    finding)."""
    from adaprox_tpu.ops.resident import resident_condat_vu

    rng_ = np.random.default_rng(12)
    m, n = 128, 128
    a = jnp.asarray(rng_.standard_normal((m, n)), jnp.float64)
    bv = a @ jnp.asarray(rng_.standard_normal(n) * (rng_.random(n) < 0.2)) \
        + 0.1 * jnp.asarray(rng_.standard_normal(m))
    lam = 1.0
    na = float(np.linalg.norm(np.asarray(a)))
    gamma, sigma = 1.0 / na, 0.99 / na
    tol = 1e-2

    x, numit, nres, conv = resident_condat_vu(
        a, bv, lam, gamma, sigma, tol, 5000, interpret=True)
    ref = ap.condat_vu(
        jnp.zeros(n, jnp.float64), jnp.zeros(m, jnp.float64),
        f=ap.ZeroSmooth(), g=ap.L1Norm(lam=lam),
        h=ap.Translate(inner=ap.L2Norm(lam=1.0), b=-bv),
        A=ap.DenseOperator(a=a), gamma=gamma, sigma=sigma, Lf=0.0,
        tol=tol, maxit=5000)
    assert bool(conv)
    assert int(numit) == int(ref.numit)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref.x), rtol=1e-9,
                               atol=1e-12)


def test_resident_adapgm_converged_returns_ck_x():
    """_solve_core must also return the engine's ck_x on convergence (the
    iterate AT the residual check), not the extra prox step the loop body
    already took — f64 comparison at machine precision."""
    from adaprox_tpu.models.synthetic import random_lasso
    from adaprox_tpu.ops.resident import resident_adapgm_l1

    prob = random_lasso(m=64, n=128, pfactor=8, seed=1)
    a = jnp.asarray(prob.a, jnp.float64)
    b = jnp.asarray(prob.b, jnp.float64)
    lf = float(np.linalg.norm(prob.a, 2) ** 2)
    tol = 1e-6
    x, numit, nres, conv = resident_adapgm_l1(
        a, b, jnp.zeros(128, jnp.float64), 1 / lf, 1.0, tol, 5000,
        interpret=True)
    ref = ap.adaptive_proxgrad(
        jnp.zeros(128, jnp.float64), f=LeastSquares(a=a, b=b),
        g=ap.L1Norm(lam=1.0), rule=ap.AdaPGMRule(gamma=1 / lf),
        tol=tol, maxit=5000)
    assert bool(conv)
    assert int(numit) == int(ref.numit)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref.x),
                               rtol=1e-12, atol=1e-14)


def test_resident_dsvm_converged_returns_ck_x():
    """_pd_core (resident dual-SVM AdaPDM) ck_x semantics vs the engine."""
    from adaprox_tpu.ops.resident import resident_adapdm_dsvm
    from adaprox_tpu.models.objectives import Quadratic

    rng_ = np.random.default_rng(7)
    N, d = 48, 12
    x_mat = rng_.standard_normal((N, d))
    yv = np.sign(rng_.standard_normal(N))
    b_fac = yv[:, None] * x_mat
    q = jnp.asarray(b_fac @ b_fac.T, jnp.float64)
    lab = jnp.asarray(yv, jnp.float64)
    na = float(np.linalg.norm(np.asarray(q), 2))
    tol, t = 1e-3, 0.1
    x, numit, nres, conv = resident_adapdm_dsvm(
        q, lab, 1.0, t, na, tol, 10000, interpret=True)
    ref = ap.adaptive_primal_dual(
        jnp.zeros(N, jnp.float64), jnp.zeros(1, jnp.float64),
        f=Quadratic(q_mat=q, q_vec=-jnp.ones(N, jnp.float64)),
        g=ap.IndBox(lo=0.0, hi=1.0), h=ap.IndZero(),
        A=ap.DenseOperator(a=lab[None, :]),
        rule=ap.AdaPGMRule.make(t=t, norm_a=na), tol=tol, maxit=10000)
    assert bool(conv)
    assert int(numit) == int(ref.numit)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref.x),
                               rtol=1e-12, atol=1e-14)


def test_resident_adapdmp_sweep_bf16_storage():
    """AdaPDM+ sweep with bf16 matrix storage: iterates must follow the
    f32 data vector (the advertised _f0_sweep bf16 contract — regression
    for the dt = a.dtype bug)."""
    from adaprox_tpu.ops.resident import resident_adapdmp_sweep

    rng_ = np.random.default_rng(4)
    m, n = 32, 16
    a32 = jnp.asarray(rng_.standard_normal((m, n)), jnp.float32)
    bv = jnp.asarray(rng_.standard_normal(m), jnp.float32)
    ts = jnp.asarray(np.geomspace(0.1, 10.0, 4), jnp.float32)
    na = float(jnp.linalg.norm(a32))
    x, numit, nres, conv, lsf = resident_adapdmp_sweep(
        a32.astype(jnp.bfloat16), bv, 0.1, ts, na, 1e-9, 40,
        interpret=True)
    assert x.dtype == jnp.float32
    assert np.isfinite(np.asarray(x)).all()
    # bf16 storage tracks the f32 sweep to storage resolution
    x32, *_ = resident_adapdmp_sweep(a32, bv, 0.1, ts, na, 1e-9, 40,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x32),
                               rtol=0.15, atol=0.05)


def test_resident_dsvm_factored_matches_dense():
    """factored=True (B resident, grad = B(B'x) - 1) must reproduce the
    dense-Gram resident sweep trajectory exactly — the gram-free form that
    keeps mushrooms-sized dual SVMs on-core."""
    from adaprox_tpu.ops.resident import resident_adapdm_dsvm_sweep

    rng_ = np.random.default_rng(5)
    n_pts, d = 256, 64
    xb = rng_.standard_normal((n_pts, d)) / np.sqrt(d)
    lb = np.sign(rng_.standard_normal(n_pts)); lb[lb == 0] = 1
    dyx = jnp.asarray(lb[:, None] * xb, jnp.float64)
    q = jax.lax.dot_general(dyx, dyx, (((1,), (1,)), ((), ())),
                            precision="highest")
    lab = jnp.asarray(lb, jnp.float64)
    na = float(np.linalg.norm(lb))
    ts = jnp.asarray([0.5, 1.0, 5.0], jnp.float64)
    # pad B's feature dim to the lane multiple (zero cols are exact)
    b_pad = jnp.pad(dyx, ((0, 0), (0, 128 - d)))

    xs_d, it_d, res_d, conv_d, hg_d, hr_d = resident_adapdm_dsvm_sweep(
        q, lab, 0.1, ts, na, 1e-6, 400, record=True, interpret=True)
    xs_f, it_f, res_f, conv_f, hg_f, hr_f = resident_adapdm_dsvm_sweep(
        b_pad, lab, 0.1, ts, na, 1e-6, 400, record=True, factored=True,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(it_d), np.asarray(it_f))
    np.testing.assert_allclose(np.asarray(hg_f), np.asarray(hg_d), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(hr_f), np.asarray(hr_d),
                               rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(np.asarray(xs_f), np.asarray(xs_d),
                               rtol=1e-9, atol=1e-12)


# --- resident linesearch PG family (backtracking / aGRAAL / cubic) ---------


def _cubic_problem(seed=0, n=128):
    """A logistic-Hessian-shaped cubic model (PSD, modest scale) so the
    adaptive-rule chaos amplifies slowly enough for prefix assertions."""
    rng_ = np.random.default_rng(seed)
    feats = rng_.standard_normal((256, n)) / np.sqrt(n)
    sb = rng_.random(256) / 256
    h_mat = (feats.T @ (sb[:, None] * feats)).astype(np.float64)
    q_vec = rng_.standard_normal(n) / n
    return h_mat, q_vec


def test_resident_backtracking_matches_engine_records():
    """Step-exact: resident backtracking PG (xi inflation, in-kernel trial
    loop) must reproduce the engine's per-iteration gamma/norm_res/objective
    AND the data-dependent oracle counters (trial counts)."""
    from adaprox_tpu.models.synthetic import random_lasso
    from adaprox_tpu.ops.resident_bt import (resident_backtracking,
                                             resident_bt_records)

    prob = random_lasso(m=64, n=128, pfactor=8, seed=3)
    a = jnp.asarray(prob.a, jnp.float64)
    b = jnp.asarray(prob.b, jnp.float64)
    lf = float(np.linalg.norm(prob.a, 2) ** 2)
    maxit = 100
    x0 = jnp.zeros(128, jnp.float64)
    x, numit, nres, conv, lsf, hg, hr, ho, ht = resident_backtracking(
        a, b, x0, 10.0 / lf, 0.0, maxit, xi=1.5, prox_kind="l1", p1=1.0,
        record=True, interpret=True)
    recs = resident_bt_records(numit, hg, hr, ho, ht, maxit=maxit)
    ref = ap.backtracking_proxgrad(
        x0, f=LeastSquares(a=a, b=b), g=ap.L1Norm(lam=jnp.float64(1.0)),
        gamma0=10.0 / lf, xi=1.5, tol=0.0, maxit=maxit, history=True)
    np.testing.assert_allclose(np.asarray(recs.gamma)[:60],
                               np.asarray(ref.records.gamma)[:60], rtol=1e-9)
    np.testing.assert_allclose(np.asarray(recs.norm_res)[:60],
                               np.asarray(ref.records.norm_res)[:60],
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(recs.objective)[:60],
                               np.asarray(ref.records.objective)[:60],
                               rtol=1e-10)
    for k in ("f_evals", "grad_f_evals", "prox_g_evals"):
        np.testing.assert_array_equal(np.asarray(getattr(recs, k)),
                                      np.asarray(getattr(ref.records, k)), k)


def test_resident_backtracking_nesterov_matches_engine_records():
    from adaprox_tpu.models.synthetic import random_lasso
    from adaprox_tpu.ops.resident_bt import (resident_backtracking,
                                             resident_bt_records)

    prob = random_lasso(m=64, n=128, pfactor=8, seed=3)
    a = jnp.asarray(prob.a, jnp.float64)
    b = jnp.asarray(prob.b, jnp.float64)
    lf = float(np.linalg.norm(prob.a, 2) ** 2)
    maxit = 100
    x0 = jnp.zeros(128, jnp.float64)
    x, numit, nres, conv, lsf, hg, hr, ho, ht = resident_backtracking(
        a, b, x0, 10.0 / lf, 0.0, maxit, nesterov=True, prox_kind="l1",
        p1=1.0, record=True, interpret=True)
    recs = resident_bt_records(numit, hg, hr, ho, ht, maxit=maxit,
                               nesterov=True)
    ref = ap.backtracking_nesterov(
        x0, f=LeastSquares(a=a, b=b), g=ap.L1Norm(lam=jnp.float64(1.0)),
        gamma0=10.0 / lf, tol=0.0, maxit=maxit, history=True)
    np.testing.assert_allclose(np.asarray(recs.gamma)[:60],
                               np.asarray(ref.records.gamma)[:60], rtol=1e-9)
    np.testing.assert_allclose(np.asarray(recs.norm_res)[:60],
                               np.asarray(ref.records.norm_res)[:60],
                               rtol=1e-8)
    for k in ("f_evals", "grad_f_evals", "prox_g_evals"):
        np.testing.assert_array_equal(np.asarray(getattr(recs, k)),
                                      np.asarray(getattr(ref.records, k)), k)


def test_resident_backtracking_exact_bregman_mirror():
    """exact_bregman=True must mirror the ENGINE's exact-Bregman
    trajectories (solvers/backtracking exact_bregman=True) step-exactly —
    both replace the raw sufficient-descent difference with
    0.5||res_z - res_x||^2 from the carried residual auxes."""
    from adaprox_tpu.models.synthetic import random_lasso
    from adaprox_tpu.ops.resident_bt import (resident_backtracking,
                                             resident_bt_records)

    prob = random_lasso(m=64, n=128, pfactor=8, seed=3)
    a = jnp.asarray(prob.a, jnp.float64)
    b = jnp.asarray(prob.b, jnp.float64)
    lf = float(np.linalg.norm(prob.a, 2) ** 2)
    maxit = 100
    x0 = jnp.zeros(128, jnp.float64)
    for nesterov in (False, True):
        x, numit, nres, conv, lsf, hg, hr, ho, ht = resident_backtracking(
            a, b, x0, 10.0 / lf, 0.0, maxit, xi=1.0 if nesterov else 1.5,
            nesterov=nesterov, prox_kind="l1", p1=1.0, record=True,
            interpret=True, exact_bregman=True)
        recs = resident_bt_records(numit, hg, hr, ho, ht, maxit=maxit,
                                   nesterov=nesterov)
        solver = ap.backtracking_nesterov if nesterov else functools.partial(
            ap.backtracking_proxgrad, xi=1.5)
        ref = solver(
            x0, f=LeastSquares(a=a, b=b), g=ap.L1Norm(lam=jnp.float64(1.0)),
            gamma0=10.0 / lf, tol=0.0, maxit=maxit, history=True,
            exact_bregman=True)
        np.testing.assert_allclose(np.asarray(recs.gamma)[:60],
                                   np.asarray(ref.records.gamma)[:60],
                                   rtol=1e-9)
        np.testing.assert_allclose(np.asarray(recs.norm_res)[:60],
                                   np.asarray(ref.records.norm_res)[:60],
                                   rtol=1e-8)
        for k in ("f_evals", "grad_f_evals", "prox_g_evals"):
            np.testing.assert_array_equal(np.asarray(getattr(recs, k)),
                                          np.asarray(getattr(ref.records, k)),
                                          k)


def test_resident_backtracking_exact_bregman_f32_large_f():
    """The in-kernel sufficient-descent test has the engine's eps*|f|
    cancellation shape (VERDICT r4 weak 1). Measured on this instance:
    raw f32 PG takes 11716 iterations (f64: 90) and raw f32 Nesterov never
    converges in 20k (f64: 111); exact_bregman must cut both by >= 10x (or
    converge where raw stalls), and leave f64 counts identical."""
    from adaprox_tpu.ops.resident_bt import resident_backtracking

    rng_ = np.random.default_rng(0)
    m, n = 1536, 384
    a_np = rng_.standard_normal((m, n)) / np.sqrt(n)
    xs = rng_.standard_normal(n) * (rng_.random(n) < 0.1)
    b_np = a_np @ xs * 1e3 + rng_.standard_normal(m)
    lf = float(np.linalg.norm(a_np, 2) ** 2)

    def run(dt, nesterov, eb, maxit=20000):
        x, numit, nres, conv, lsf = resident_backtracking(
            jnp.asarray(a_np, dt), jnp.asarray(b_np, dt), jnp.zeros(n, dt),
            1 / lf, 1e-4, maxit, xi=1.0, prox_kind="l1", p1=1.0,
            nesterov=nesterov, obj_kind="ls", interpret=True,
            exact_bregman=eb)
        return int(numit), float(nres), bool(conv)

    for nesterov in (False, True):
        it64, _, _ = run(jnp.float64, nesterov, False, maxit=500)
        it64e, _, _ = run(jnp.float64, nesterov, True, maxit=500)
        assert it64 == it64e  # f64: the exact form changes nothing here
        it32, nres32, conv32 = run(jnp.float32, nesterov, False)
        it32e, _, conv32e = run(jnp.float32, nesterov, True)
        assert conv32e
        assert it32e * 10 <= it32 or not conv32


def test_resident_agraal_matches_engine_records():
    from adaprox_tpu.models.synthetic import random_lasso
    from adaprox_tpu.ops.resident_bt import (resident_agraal,
                                             resident_agraal_records)

    prob = random_lasso(m=64, n=128, pfactor=8, seed=3)
    a = jnp.asarray(prob.a, jnp.float64)
    b = jnp.asarray(prob.b, jnp.float64)
    maxit = 100
    x0 = jnp.zeros(128, jnp.float64)
    x0p = x0 + jax.random.normal(jax.random.PRNGKey(0), x0.shape, x0.dtype)
    x, numit, nres, conv, hg, hr, ho = resident_agraal(
        a, b, x0, x0p, 0.0, 0.0, maxit, prox_kind="l1", p1=1.0,
        record=True, interpret=True)
    recs = resident_agraal_records(numit, hg, hr, ho, maxit=maxit)
    ref = ap.agraal(x0, f=LeastSquares(a=a, b=b),
                    g=ap.L1Norm(lam=jnp.float64(1.0)), x0=x0p, tol=0.0,
                    maxit=maxit, history=True)
    np.testing.assert_allclose(np.asarray(recs.gamma)[:60],
                               np.asarray(ref.records.gamma)[:60], rtol=1e-8)
    np.testing.assert_allclose(np.asarray(recs.norm_res)[:60],
                               np.asarray(ref.records.norm_res)[:60],
                               rtol=1e-7)
    np.testing.assert_allclose(np.asarray(recs.objective)[:60],
                               np.asarray(ref.records.objective)[:60],
                               rtol=1e-9)
    for k in ("f_evals", "grad_f_evals", "prox_g_evals"):
        np.testing.assert_array_equal(np.asarray(getattr(recs, k)),
                                      np.asarray(getattr(ref.records, k)), k)


def test_resident_cubic_adapgm_matches_engine():
    """obj_kind="cubic" through the resident AdaPGM kernel vs the engine on
    models.objectives.Cubic. Adaptive-rule chaos amplifies formulation-
    order noise geometrically — tight prefix, loose full-trajectory check
    (same treatment as test_resident_record_matches_engine_records)."""
    from adaprox_tpu.models.objectives import Cubic
    from adaprox_tpu.ops.resident import resident_adapgm, resident_records

    h_mat, q_vec = _cubic_problem()
    maxit = 80
    x0 = jnp.zeros(128, jnp.float64)
    gam = 0.01
    fq = Cubic(q_mat=jnp.asarray(h_mat), q_vec=jnp.asarray(q_vec),
               c=jnp.asarray(1.0), precision="highest")
    x, numit, nres, conv, hg, hr, ho = resident_adapgm(
        jnp.asarray(h_mat), jnp.asarray(q_vec), x0, gam, 0.0, maxit,
        prox_kind="zero", obj_kind="cubic", cube_c=1.0, record=True,
        interpret=True)
    recs = resident_records(numit, hg, hr, ho, maxit=maxit)
    ref = ap.adaptive_proxgrad(x0, f=fq, g=ap.Zero(),
                               rule=ap.AdaPGMRule(gamma=jnp.float64(gam)),
                               tol=0.0, maxit=maxit, history=True)
    np.testing.assert_allclose(np.asarray(recs.gamma)[:20],
                               np.asarray(ref.records.gamma)[:20], rtol=1e-8)
    np.testing.assert_allclose(np.asarray(recs.objective)[:20],
                               np.asarray(ref.records.objective)[:20],
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(recs.objective),
                               np.asarray(ref.records.objective), rtol=5e-2)
    for k in ("f_evals", "grad_f_evals", "prox_g_evals"):
        np.testing.assert_array_equal(np.asarray(getattr(recs, k)),
                                      np.asarray(getattr(ref.records, k)), k)


def test_resident_cubic_backtracking_and_agraal():
    """Cubic objective through the resident backtracking and aGRAAL kernels
    (the cubic driver's full method menu on-core)."""
    from adaprox_tpu.models.objectives import Cubic
    from adaprox_tpu.ops.resident_bt import (resident_agraal,
                                             resident_agraal_records,
                                             resident_backtracking,
                                             resident_bt_records)

    h_mat, q_vec = _cubic_problem(seed=1)
    maxit = 60
    x0 = jnp.zeros(128, jnp.float64)
    fq = Cubic(q_mat=jnp.asarray(h_mat), q_vec=jnp.asarray(q_vec),
               c=jnp.asarray(1.0), precision="highest")

    x, numit, nres, conv, lsf, hg, hr, ho, ht = resident_backtracking(
        jnp.asarray(h_mat), jnp.asarray(q_vec), x0, 0.1, 0.0, maxit,
        xi=2.0, prox_kind="zero", obj_kind="cubic", cube_c=1.0,
        record=True, interpret=True)
    recs = resident_bt_records(numit, hg, hr, ho, ht, maxit=maxit)
    ref = ap.backtracking_proxgrad(x0, f=fq, g=ap.Zero(), gamma0=0.1,
                                   xi=2.0, tol=0.0, maxit=maxit,
                                   history=True)
    # backtracking accept/reject tests sit on knife edges for the cubic
    # (f_z ~ upper bound): a 1-ulp formulation difference flips a halving
    # and doubles gamma — discrete chaos. Exact prefix, then objective-level
    # agreement (both trajectories minimize the same model).
    np.testing.assert_allclose(np.asarray(recs.gamma)[:12],
                               np.asarray(ref.records.gamma)[:12], rtol=1e-9)
    np.testing.assert_allclose(np.asarray(recs.objective)[:12],
                               np.asarray(ref.records.objective)[:12],
                               rtol=1e-9)
    for k in ("f_evals", "grad_f_evals", "prox_g_evals"):
        np.testing.assert_array_equal(np.asarray(getattr(recs, k))[:12],
                                      np.asarray(getattr(ref.records, k))[:12], k)
    np.testing.assert_allclose(np.asarray(recs.objective)[-1],
                               np.asarray(ref.records.objective)[-1],
                               rtol=1e-6)

    x0p = x0 + jax.random.normal(jax.random.PRNGKey(0), x0.shape, x0.dtype)
    x, numit, nres, conv, hg, hr, ho = resident_agraal(
        jnp.asarray(h_mat), jnp.asarray(q_vec), x0, x0p, 0.0, 0.0, maxit,
        prox_kind="zero", obj_kind="cubic", cube_c=1.0, record=True,
        interpret=True)
    recs = resident_agraal_records(numit, hg, hr, ho, maxit=maxit)
    ref = ap.agraal(x0, f=fq, g=ap.Zero(), x0=x0p, tol=0.0, maxit=maxit,
                    history=True)
    np.testing.assert_allclose(np.asarray(recs.gamma)[:30],
                               np.asarray(ref.records.gamma)[:30], rtol=1e-8)
    np.testing.assert_allclose(np.asarray(recs.objective)[:30],
                               np.asarray(ref.records.objective)[:30],
                               rtol=1e-9)


def test_resident_f0_bf16_storage():
    """bf16 A/A' storage in the f = 0 linesearch PD kernels (iterates stay
    in bv.dtype = f32 via promotion): the MP t-sweep must track the f32-
    storage sweep and converge to the same solution."""
    from adaprox_tpu.ops.resident import resident_mpls_sweep

    rng_ = np.random.default_rng(7)
    m_, n_ = 64, 128
    a32 = jnp.asarray(rng_.standard_normal((m_, n_)) / np.sqrt(m_),
                      jnp.float32)
    xs = np.zeros(n_); xs[:6] = rng_.standard_normal(6)
    bv = jnp.asarray(np.asarray(a32) @ xs + 0.01 * rng_.standard_normal(m_),
                     jnp.float32)
    ts = jnp.asarray([0.5], jnp.float32)
    kw = dict(record=False, h_kind="l2", interpret=True)
    x32, it32, r32, c32, l32 = resident_mpls_sweep(
        a32, bv, 0.05, ts, 1.0, 1e-4, 3000, **kw)
    xbf, itbf, rbf, cbf, lbf = resident_mpls_sweep(
        a32.astype(jnp.bfloat16), bv, 0.05, ts, 1.0, 1e-4, 3000, **kw)
    assert xbf.dtype == jnp.float32
    assert bool(c32[0]) and bool(cbf[0])
    np.testing.assert_allclose(np.asarray(xbf), np.asarray(x32),
                               rtol=5e-2, atol=3e-2)


def test_resident_dsvm_bf16_storage():
    """bf16 Q storage in the dual-SVM resident sweep (iterates follow the
    f32 labels): converges to the f32-storage solution."""
    from adaprox_tpu.ops.resident import resident_adapdm_dsvm_sweep

    rng_ = np.random.default_rng(8)
    n_pts, d = 128, 16
    feats = rng_.standard_normal((n_pts, d)) / np.sqrt(d)
    lb = np.sign(rng_.standard_normal(n_pts)); lb[lb == 0] = 1
    dyx = (lb[:, None] * feats).astype(np.float32)
    q32 = jnp.asarray(dyx @ dyx.T, jnp.float32)
    lab = jnp.asarray(lb, jnp.float32)
    na = float(np.linalg.norm(lb))
    ts = jnp.asarray([1.0], jnp.float32)
    x32, it32, r32, c32 = resident_adapdm_dsvm_sweep(
        q32, lab, 0.1, ts, na, 1e-4, 4000, interpret=True)
    xbf, itbf, rbf, cbf = resident_adapdm_dsvm_sweep(
        q32.astype(jnp.bfloat16), lab, 0.1, ts, na, 1e-4, 4000,
        interpret=True)
    assert xbf.dtype == jnp.float32
    assert bool(c32[0]) and bool(cbf[0])
    np.testing.assert_allclose(np.asarray(xbf), np.asarray(x32),
                               rtol=5e-2, atol=5e-3)


def test_resident_f0_grid_matches_per_dataset_sweeps():
    """The (dataset x t) grid launch must reproduce each per-dataset sweep
    exactly — common zero-padding of rows beyond a dataset's true m is
    exact for the f = 0 translate family."""
    from adaprox_tpu.ops.resident import (resident_adapdmp_grid,
                                          resident_adapdmp_sweep,
                                          resident_mpls_grid,
                                          resident_mpls_sweep)

    rng_ = np.random.default_rng(11)
    shapes = [(64, 128), (32, 128)]
    m_max = 64
    ts = jnp.asarray([0.5, 2.0], jnp.float64)
    a_list, bv_list, na_list = [], [], []
    for mi, ni in shapes:
        ai = rng_.standard_normal((mi, ni)) / np.sqrt(mi)
        bvi = rng_.standard_normal(mi)
        a_pad = np.zeros((m_max, ni)); a_pad[:mi] = ai
        bv_pad = np.zeros(m_max); bv_pad[:mi] = bvi
        a_list.append(a_pad); bv_list.append(bv_pad)
        na_list.append(float(np.linalg.norm(ai)))
    a_stack = jnp.asarray(np.stack(a_list), jnp.float64)
    bv_stack = jnp.asarray(np.stack(bv_list), jnp.float64)
    lams = jnp.asarray([0.05, 0.1], jnp.float64)
    maxit = 300

    for grid_fn, sweep_fn, p2s in [
        (resident_mpls_grid, resident_mpls_sweep,
         jnp.asarray([1.0, 1.0], jnp.float64)),
        (resident_adapdmp_grid, resident_adapdmp_sweep,
         jnp.asarray(na_list, jnp.float64)),
    ]:
        xg, itg, resg, convg, lsg, hists_g = grid_fn(
            a_stack, bv_stack, lams, ts, p2s, 1e-6, maxit, record=True,
            interpret=True)
        for d in range(2):
            xs, its, ress, convs, lss, hists_s = sweep_fn(
                a_stack[d], bv_stack[d], float(lams[d]), ts, float(p2s[d]),
                1e-6, maxit, record=True, interpret=True)
            np.testing.assert_array_equal(np.asarray(itg[d]),
                                          np.asarray(its))
            np.testing.assert_allclose(np.asarray(xg[d]), np.asarray(xs),
                                       rtol=1e-12, atol=1e-15)
            for hg_, hs_ in zip(hists_g, hists_s):
                np.testing.assert_allclose(np.asarray(hg_[d]),
                                           np.asarray(hs_), rtol=1e-12,
                                           atol=1e-15)


def _dsvm_problem(seed=9, n_pts=128, d=16):
    rng_ = np.random.default_rng(seed)
    feats = rng_.standard_normal((n_pts, d)) / np.sqrt(d)
    lb = np.sign(rng_.standard_normal(n_pts)); lb[lb == 0] = 1
    return (lb[:, None] * feats).astype(np.float64), lb.astype(np.float64)


def test_resident_mp_dsvm_matches_engine_records():
    """Resident dual-SVM Malitsky-Pock t-sweep (general-f linesearch with
    the Bregman term in-kernel) must reproduce the engine's per-iteration
    gamma/sigma/norm_res AND trial counts."""
    from adaprox_tpu.models.objectives import FactoredQuadratic
    from adaprox_tpu.ops.resident import (resident_mp_dsvm_sweep,
                                          resident_mp_records)

    dyx, lb = _dsvm_problem()
    n_pts = lb.shape[0]
    dyx_j = jnp.asarray(dyx)
    lab = jnp.asarray(lb)
    f = FactoredQuadratic(b_mat=dyx_j, q_vec=-jnp.ones(n_pts, jnp.float64))
    na = float(np.linalg.norm(lb))
    big_c = 0.1
    maxit = 150
    ts = [0.5, 2.0]
    q = jax.lax.dot_general(dyx_j, dyx_j, (((1,), (1,)), ((), ())),
                            precision="highest")
    xs, numits, ress, convs, lsf, hists = resident_mp_dsvm_sweep(
        q, lab, big_c, jnp.asarray(ts, jnp.float64), 1.0 / na, 0.0, maxit,
        record=True, interpret=True)
    for i, t in enumerate(ts):
        recs = resident_mp_records(numits[i], tuple(h[i] for h in hists),
                                   maxit=maxit)
        ref = ap.malitsky_pock(
            jnp.zeros(n_pts, jnp.float64), jnp.zeros(1, jnp.float64),
            f=f, g=ap.IndBox(lo=0.0, hi=big_c), h=ap.IndZero(),
            A=ap.DenseOperator(a=jnp.asarray(lb[None, :])), sigma=1.0 / na,
            t=t, tol=0.0, maxit=maxit, history=True)
        # the quadratic's Bregman term makes the linesearch accept/reject
        # test a knife edge (difference of near-equal values): a 1-ulp
        # formulation difference flips a halving and doubles gamma —
        # discrete chaos (cf. the cubic backtracking test). Exact prefix,
        # then objective-level agreement at the end.
        np.testing.assert_allclose(np.asarray(recs.gamma)[:10],
                                   np.asarray(ref.records.gamma)[:10],
                                   rtol=1e-9, err_msg=f"gamma t={t}")
        np.testing.assert_allclose(np.asarray(recs.sigma)[:10],
                                   np.asarray(ref.records.sigma)[:10],
                                   rtol=1e-9, err_msg=f"sigma t={t}")
        np.testing.assert_allclose(np.asarray(recs.norm_res)[:10],
                                   np.asarray(ref.records.norm_res)[:10],
                                   rtol=1e-7, err_msg=f"norm_res t={t}")
        for k in ("f_evals", "prox_g_evals", "A_evals"):
            np.testing.assert_array_equal(
                np.asarray(getattr(recs, k))[:10],
                np.asarray(getattr(ref.records, k))[:10], f"{k} t={t}")
        np.testing.assert_allclose(np.asarray(recs.objective)[-1],
                                   float(f.value_and_aux(ref.x)[0]),
                                   rtol=1e-5, err_msg=f"final obj t={t}")
    # factored path: same trajectories from B without the Gram
    d_pad = 128
    b_pad = jnp.pad(dyx_j, ((0, 0), (0, d_pad - dyx.shape[1])))
    xs_f, numits_f, _, _, _, hists_f = resident_mp_dsvm_sweep(
        b_pad, lab, big_c, jnp.asarray(ts, jnp.float64), 1.0 / na, 0.0,
        maxit, record=True, factored=True, interpret=True)
    # dense-vs-factored formulation differences hit the same linesearch
    # knife edges — exact prefix + same converged objective
    np.testing.assert_allclose(np.asarray(hists_f[0])[:, :10],
                               np.asarray(hists[0])[:, :10], rtol=1e-10)
    np.testing.assert_allclose(np.asarray(hists_f[4])[:, -1],
                               np.asarray(hists[4])[:, -1], rtol=1e-5)


def test_resident_cv_dsvm_matches_engine():
    from adaprox_tpu.models.objectives import FactoredQuadratic
    from adaprox_tpu.ops.resident import resident_cv_dsvm, resident_cv_records

    dyx, lb = _dsvm_problem(seed=10)
    n_pts = lb.shape[0]
    dyx_j = jnp.asarray(dyx)
    lab = jnp.asarray(lb)
    f = FactoredQuadratic(b_mat=dyx_j, q_vec=-jnp.ones(n_pts, jnp.float64))
    lf = float(f.norm_q())
    na = float(np.linalg.norm(lb))
    big_c = 0.1
    maxit = 200
    # engine par-heuristics (solvers/primal_dual.condat_vu)
    par, par2 = 5.0, 100.0
    alpha = 1.0 if na > par * lf else par2 * na / lf
    gamma = 1.0 / (lf / 2 + na / alpha)
    sigma = 0.99 / (na * alpha)
    q = jax.lax.dot_general(dyx_j, dyx_j, (((1,), (1,)), ((), ())),
                            precision="highest")
    x, numit, nres, conv, hists = resident_cv_dsvm(
        q, lab, big_c, gamma, sigma, 0.0, maxit, record=True,
        interpret=True)
    recs = resident_cv_records(numit, gamma, sigma, hists, maxit=maxit)
    ref = ap.condat_vu(
        jnp.zeros(n_pts, jnp.float64), jnp.zeros(1, jnp.float64),
        f=f, g=ap.IndBox(lo=0.0, hi=big_c), h=ap.IndZero(),
        A=ap.DenseOperator(a=jnp.asarray(lb[None, :])), Lf=lf,
        tol=0.0, maxit=maxit, history=True)
    np.testing.assert_allclose(np.asarray(recs.norm_res)[:100],
                               np.asarray(ref.records.norm_res)[:100],
                               rtol=1e-8)
    np.testing.assert_array_equal(np.asarray(recs.f_evals),
                                  np.asarray(ref.records.f_evals))
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref.x), rtol=1e-8,
                               atol=1e-12)


def test_resident_rule_sweep_bit_exact():
    """The dynamic-rule sweep (lax.switch rule, lax.cond momentum, per-row
    tol/cap) must be BIT-exact vs the static per-row kernels — same math,
    one executable."""
    from adaprox_tpu.models.synthetic import random_lasso
    from adaprox_tpu.ops.resident import (resident_adapgm,
                                          resident_rule_sweep, rule_rows)

    prob = random_lasso(m=64, n=128, pfactor=8, seed=3)
    a = jnp.asarray(prob.a, jnp.float64)
    b = jnp.asarray(prob.b, jnp.float64)
    lf = float(np.linalg.norm(prob.a, 2) ** 2)
    x0 = jnp.zeros(128, jnp.float64)
    gam = 1.0 / lf
    specs = [(gam, "adapgm", False, 1e-9, 200), (gam, "fixed", False, 0.0, 100),
             (gam, "mm", False, 0.0, 100), (gam, "fixed", True, 0.0, 100)]
    xs, its, ress, convs, (hg, hr, ho) = resident_rule_sweep(
        a, b, x0, rule_rows(specs), 0.0, 200, prox_kind="l1", p1=1.0,
        interpret=True)
    for i, (g0, rk, mom, t, cap) in enumerate(specs):
        x1, it1, r1, c1, hg1, hr1, ho1 = resident_adapgm(
            a, b, x0, g0, t, cap, prox_kind="l1", p1=1.0, rule_kind=rk,
            momentum=mom, record=True, interpret=True)
        np.testing.assert_array_equal(np.asarray(its[i]), np.asarray(it1))
        np.testing.assert_array_equal(np.asarray(xs[i]), np.asarray(x1))
        np.testing.assert_array_equal(np.asarray(hg[i][:cap]), np.asarray(hg1))
        np.testing.assert_array_equal(np.asarray(hr[i][:cap]), np.asarray(hr1))
        np.testing.assert_array_equal(np.asarray(ho[i][:cap]), np.asarray(ho1))


def test_resident_bt_sweep_bit_exact():
    """The dynamic-nesterov backtracking sweep must be BIT-exact vs the
    static per-row kernels."""
    from adaprox_tpu.models.synthetic import random_lasso
    from adaprox_tpu.ops.resident_bt import (resident_backtracking,
                                             resident_bt_sweep)

    prob = random_lasso(m=64, n=128, pfactor=8, seed=3)
    a = jnp.asarray(prob.a, jnp.float64)
    b = jnp.asarray(prob.b, jnp.float64)
    lf = float(np.linalg.norm(prob.a, 2) ** 2)
    x0 = jnp.zeros(128, jnp.float64)
    gam = 10.0 / lf
    rows = np.asarray([[gam, 1.0, 0.0], [gam, 1.5, 0.0], [gam, 2.0, 0.0],
                       [gam, 1.0, 1.0]])
    xs, its, ress, convs, lsfs, hists = resident_bt_sweep(
        a, b, x0, rows, 0.0, 100, prox_kind="l1", p1=1.0, interpret=True)
    for i, (g0, xi, nst) in enumerate(rows):
        x1, it1, r1, c1, l1, hg1, hr1, ho1, ht1 = resident_backtracking(
            a, b, x0, float(g0), 0.0, 100, xi=float(xi), nesterov=bool(nst),
            prox_kind="l1", p1=1.0, record=True, interpret=True)
        np.testing.assert_array_equal(np.asarray(its[i]), np.asarray(it1))
        np.testing.assert_array_equal(np.asarray(xs[i]), np.asarray(x1))
        for got, want in zip(hists, (hg1, hr1, ho1, ht1)):
            np.testing.assert_array_equal(np.asarray(got[i]),
                                          np.asarray(want))


def test_hbm_dma_read_token_and_traffic(rng):
    """Manual N-deep DMA read probe (ceiling calibration): the output token
    is scale + sum over repeats*chunks of each chunk's first-row (1,128)
    slice — verify against NumPy for several depth/chunk configs (the DMA
    indexing must visit every chunk exactly `repeats` times)."""
    a = jnp.asarray(rng.standard_normal((64, 256)), jnp.float32)
    a_np = np.asarray(a)
    for chunk_rows, depth, repeats in [(16, 2, 1), (16, 3, 2), (32, 4, 3),
                                       (64, 2, 2)]:
        chunks = 64 // chunk_rows
        expect = 128 * 2.0  # scale broadcast over the (1, 128) accumulator
        for r in range(repeats * chunks):
            idx = r % chunks
            expect += a_np[idx * chunk_rows, :128].sum()
        got = float(kernels.hbm_dma_read(
            a, scale=2.0, chunk_rows=chunk_rows, depth=depth,
            repeats=repeats, interpret=True))
        np.testing.assert_allclose(got, expect, rtol=1e-5,
                                   err_msg=f"tm={chunk_rows} d={depth}")
    with pytest.raises(ValueError):
        kernels.hbm_dma_read(a, chunk_rows=48, interpret=True)
    # depth deeper than total chunks is clamped (no never-waited DMAs):
    # one 64-row chunk, depth 4 -> depth 1
    got = float(kernels.hbm_dma_read(a[:64], scale=0.0, chunk_rows=64,
                                     depth=4, repeats=1, interpret=True))
    np.testing.assert_allclose(got, np.asarray(a)[0, :128].sum(), rtol=1e-5)


def test_hbm_copy_token(rng):
    """R+W copy probe: the token samples the first AND last copied blocks
    (scaled), so a skipped write at either end of the grid shows; interior
    blocks are unobserved by the token (timing probe, not a checksum)."""
    a = jnp.asarray(rng.standard_normal((32, 256)), jnp.float32)
    got = float(kernels.hbm_copy(a, scale=3.0, block_rows=8, repeats=2, interpret=True))
    an = np.asarray(a)
    expect = float(3.0 * (an[0, :128].sum() + an[-1, -128:].sum()))
    np.testing.assert_allclose(got, expect, rtol=1e-5)
    with pytest.raises(ValueError):
        kernels.hbm_copy(a, block_rows=7, interpret=True)


def test_resident_pd_entries_validate_scalars():
    """The resident PD entry points must fail loudly on non-positive
    coupling scalars like the engine family does (review r5-6) — a
    t/norm_a/sigma0 of 0 used to NaN-poison the kernel silently."""
    from adaprox_tpu.ops.resident import (resident_adapdm_dsvm,
                                          resident_adapdm_dsvm_sweep,
                                          resident_mp_dsvm_sweep,
                                          resident_mpls_sweep, rule_rows)

    q = jnp.zeros((128, 128)); lab = jnp.zeros(128)
    ts = jnp.asarray([0.1])
    for call in (
        lambda: resident_adapdm_dsvm(q, lab, 1.0, 0.0, 5.0, 1e-5, 5,
                                     interpret=True),
        lambda: resident_adapdm_dsvm_sweep(q, lab, 1.0, ts, -1.0, 1e-5, 5,
                                           interpret=True),
        lambda: resident_mp_dsvm_sweep(q, lab, 1.0, ts, 0.0, 1e-5, 5,
                                       interpret=True),
        lambda: resident_mpls_sweep(jnp.zeros((8, 128)), jnp.zeros(8), 0.1,
                                    ts, -2.0, 1e-5, 5, interpret=True),
    ):
        with pytest.raises(ValueError, match="must be positive"):
            call()
    # rule_rows: 3-tuple specs without explicit budgets must fail loudly
    # (the old defaults silently produced zero-iteration rows)
    with pytest.raises(ValueError, match="maxit"):
        rule_rows([(0.1, "fixed", False)])
