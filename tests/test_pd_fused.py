"""Engine parity of the fused one-pass PD path (ops.pd_kernels +
solvers.pd_fused) against solvers.primal_dual — same algorithm, half the
HBM passes (VERDICT r1 item 3). Interpret mode on CPU."""

import jax.numpy as jnp
import numpy as np
import pytest

import adaprox_tpu as ap
from adaprox_tpu.models.synthetic import random_lasso
from adaprox_tpu.ops import pd_kernels
from adaprox_tpu.solvers.pd_fused import (
    fused_adaptive_primal_dual,
    fused_condat_vu,
    prox_menu_entry,
)


@pytest.fixture(scope="module")
def srl_problem():
    """Square-root-lasso shaped problem: f = 0, g = lam*l1,
    h = Translate(L2, -y), A dense (m, n) with kernel-aligned dims."""
    prob = random_lasso(m=64, n=256, pfactor=8, seed=11)
    a = jnp.asarray(prob.a, jnp.float64)
    yv = jnp.asarray(prob.b, jnp.float64)
    h = ap.Translate(inner=ap.L2Norm(lam=1.0), b=-yv)
    return a, yv, h


def test_kernel_matches_xla(srl_problem, rng):
    a, yv, h = srl_problem
    m, n = a.shape
    at = a.T
    y = jnp.asarray(rng.standard_normal(m))
    x = jnp.asarray(rng.standard_normal(n))
    grad = jnp.asarray(rng.standard_normal(n))
    for kind, p1, p2 in [("l1", 0.7, 0.0), ("box", -0.5, 0.5),
                         ("elastic", 0.3, 0.2), ("zero", 0.0, 0.0)]:
        ref = pd_kernels.pd_primal_update_xla(at, y, x, grad, 0.01, p1, p2,
                                              prox_kind=kind)
        got = pd_kernels.fused_pd_primal_update(at, y, x, grad, 0.01, p1, p2,
                                                prox_kind=kind, interpret=True)
        for r, g_ in zip(ref, got):
            np.testing.assert_allclose(np.asarray(g_), np.asarray(r),
                                       rtol=1e-10, atol=1e-12)


def test_fused_engine_matches_engine_adapdm(srl_problem):
    a, yv, h = srl_problem
    m, n = a.shape
    na = float(np.linalg.norm(np.asarray(a)))
    kw = dict(f=ap.ZeroSmooth(), g=ap.L1Norm(lam=10.0), h=h,
              rule=ap.AdaPGMRule.make(t=1.0, norm_a=na), tol=1e-9, maxit=400)
    ref = ap.adaptive_primal_dual(
        jnp.zeros(n), jnp.zeros(m), A=ap.DenseOperator(a=a), **kw)
    got = fused_adaptive_primal_dual(jnp.zeros(n), jnp.zeros(m), A=a, **kw)
    assert int(got.numit) == int(ref.numit)
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(got.y), np.asarray(ref.y),
                               rtol=1e-9, atol=1e-11)
    # below tol both residuals sit at the f64 noise floor; reassociation
    # in the fused reductions moves the last bits
    np.testing.assert_allclose(float(got.norm_res), float(ref.norm_res),
                               rtol=1e-8, atol=1e-12)
    # oracle-count parity at the convergence check (log-time semantics)
    for k in ref.counters._fields:
        assert int(getattr(got.counters, k)) == int(getattr(ref.counters, k)), k


def test_fused_engine_matches_engine_condat_vu(srl_problem):
    a, yv, h = srl_problem
    m, n = a.shape
    na = float(np.linalg.norm(np.asarray(a), 2))
    kw = dict(f=ap.ZeroSmooth(), g=ap.L1Norm(lam=10.0), h=h, Lf=0.0,
              tol=1e-9, maxit=300)
    ref = ap.condat_vu(jnp.zeros(n), jnp.zeros(m), A=ap.DenseOperator(a=a),
                       norm_A=na, **kw)
    got = fused_condat_vu(jnp.zeros(n), jnp.zeros(m), A=a, norm_A=na, **kw)
    assert int(got.numit) == int(ref.numit)
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               rtol=1e-9, atol=1e-11)


def test_fused_engine_history_records(srl_problem):
    """Scan-mode records must carry the reference JSONL schema semantics."""
    a, yv, h = srl_problem
    m, n = a.shape
    na = float(np.linalg.norm(np.asarray(a)))
    got = fused_adaptive_primal_dual(
        jnp.zeros(n), jnp.zeros(m), f=ap.ZeroSmooth(), g=ap.L1Norm(lam=10.0),
        h=h, A=a, rule=ap.AdaPGMRule.make(t=1.0, norm_a=na),
        tol=1e-9, maxit=50, history=True)
    ref = ap.adaptive_primal_dual(
        jnp.zeros(n), jnp.zeros(m), f=ap.ZeroSmooth(), g=ap.L1Norm(lam=10.0),
        h=h, A=ap.DenseOperator(a=a), rule=ap.AdaPGMRule.make(t=1.0, norm_a=na),
        tol=1e-9, maxit=50, history=True)
    np.testing.assert_allclose(np.asarray(got.records.norm_res),
                               np.asarray(ref.records.norm_res),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_array_equal(np.asarray(got.records.A_evals),
                                  np.asarray(ref.records.A_evals))
    np.testing.assert_allclose(np.asarray(got.records.objective),
                               np.asarray(ref.records.objective),
                               rtol=1e-8, atol=1e-10)


def test_fused_engine_resume(srl_problem):
    a, yv, h = srl_problem
    m, n = a.shape
    na = float(np.linalg.norm(np.asarray(a)))
    kw = dict(f=ap.ZeroSmooth(), g=ap.L1Norm(lam=10.0), h=h, A=a,
              rule=ap.AdaPGMRule.make(t=1.0, norm_a=na), tol=1e-12)
    straight = fused_adaptive_primal_dual(jnp.zeros(n), jnp.zeros(m), maxit=100, **kw)
    part1 = fused_adaptive_primal_dual(jnp.zeros(n), jnp.zeros(m), maxit=40, **kw)
    part2 = fused_adaptive_primal_dual(
        jnp.zeros(n), jnp.zeros(m), maxit=100, resume_state=part1.extra, **kw)
    np.testing.assert_array_equal(np.asarray(part2.x), np.asarray(straight.x))


def test_prox_menu_entry():
    assert prox_menu_entry(ap.L1Norm(lam=2.0))[0] == "l1"
    assert prox_menu_entry(ap.IndBox(lo=0.0, hi=1.0))[0] == "box"
    assert prox_menu_entry(ap.ElasticNet(lam1=1.0, lam2=2.0))[0] == "elastic"
    assert prox_menu_entry(ap.Zero())[0] == "zero"
    assert prox_menu_entry(ap.L2Norm(lam=1.0)) is None
    with pytest.raises(ValueError):
        fused_adaptive_primal_dual(
            jnp.zeros(4), jnp.zeros(4), f=ap.ZeroSmooth(), g=ap.L2Norm(lam=1.0),
            h=ap.IndZero(), A=jnp.eye(4), rule=ap.AdaPGMRule(gamma=0.1))


def test_fused_engine_sharded_matches_unsharded(srl_problem):
    """The fused PD engine over an 8-device virtual mesh (shard_map + psum
    of the A@x_new partials) must match the single-device fused solve."""
    import jax

    from adaprox_tpu.parallel.mesh import ROWS, make_mesh, shard_array
    from jax.sharding import PartitionSpec as P

    a, yv, h = srl_problem
    m, n = a.shape
    na = float(np.linalg.norm(np.asarray(a)))
    kw = dict(f=ap.ZeroSmooth(), g=ap.L1Norm(lam=10.0), h=h,
              rule=ap.AdaPGMRule.make(t=1.0, norm_a=na), tol=1e-9, maxit=200)

    single = fused_adaptive_primal_dual(jnp.zeros(n), jnp.zeros(m), A=a, **kw)

    mesh = make_mesh((len(jax.devices()), 1))
    at = shard_array(jnp.asarray(a).T, mesh, P(ROWS, None))
    x0 = shard_array(jnp.zeros(n), mesh, P(ROWS))
    y0 = shard_array(jnp.zeros(m), mesh, P())
    sharded = fused_adaptive_primal_dual(
        x0, y0, A=at.T, mesh=mesh, **kw)  # wrapper re-transposes internally
    assert int(sharded.numit) == int(single.numit)
    np.testing.assert_allclose(np.asarray(sharded.x), np.asarray(single.x),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(sharded.y), np.asarray(single.y),
                               rtol=1e-9, atol=1e-11)


def test_fused_engine_with_smooth_f(srl_problem, rng):
    """The fused engine's f is any SmoothOracle (its oracle cost rides
    outside the kernel): parity with the engine on a dual-SVM-shaped
    problem with f = Quadratic and g = IndBox."""
    from adaprox_tpu.models.objectives import Quadratic

    n = 128
    xd = rng.standard_normal((n, 12))
    labels = np.sign(rng.standard_normal(n))
    labels[labels == 0] = 1
    q = (labels[:, None] * xd) @ (labels[:, None] * xd).T
    f = Quadratic(q_mat=jnp.asarray(q), q_vec=-jnp.ones(n))
    g = ap.IndBox(lo=0.0, hi=0.1)
    h = ap.IndZero()
    a = jnp.asarray(labels[None, :])  # (1, n) coupling — m=1 row
    # m=1 is not lane-aligned for the kernel; use interpret explicitly
    na = float(np.linalg.norm(labels))
    kw = dict(f=f, g=g, h=h, rule=ap.AdaPGMRule.make(t=0.5, norm_a=na),
              tol=1e-7, maxit=3000)
    ref = ap.adaptive_primal_dual(jnp.zeros(n), jnp.zeros(1),
                                  A=ap.DenseOperator(a=a), **kw)
    got = fused_adaptive_primal_dual(jnp.zeros(n), jnp.zeros(1), A=a,
                                     interpret=True, **kw)
    assert int(got.numit) == int(ref.numit)
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               rtol=1e-7, atol=1e-9)


def test_fused_engine_autopad_matches_engine(rng):
    """VERDICT r2 item 8: a LIBSVM-shaped (misaligned) problem auto-pads to
    tile alignment with exact correction (PadDomain + PadTail) — the padded
    fused solve must be trajectory-identical to the two-pass engine on the
    UNPADDED problem."""
    m, n = 100, 13  # housing-like: both dims misaligned
    a = jnp.asarray(rng.standard_normal((m, n)))
    yv = jnp.asarray(rng.standard_normal(m))
    h = ap.Translate(inner=ap.L2Norm(lam=1.0), b=-yv)
    na = float(np.linalg.norm(np.asarray(a)))
    kw = dict(f=ap.ZeroSmooth(), g=ap.L1Norm(lam=1.0), h=h,
              rule=ap.AdaPGMRule.make(t=1.0, norm_a=na), tol=1e-9, maxit=400)
    ref = ap.adaptive_primal_dual(
        jnp.zeros(n), jnp.zeros(m), A=ap.DenseOperator(a=a), **kw)
    got = fused_adaptive_primal_dual(jnp.zeros(n), jnp.zeros(m), A=a, **kw)
    assert got.x.shape == (n,) and got.y.shape == (m,)
    assert int(got.numit) == int(ref.numit)
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(got.y), np.asarray(ref.y),
                               rtol=1e-9, atol=1e-11)
    for k in ref.counters._fields:
        assert int(getattr(got.counters, k)) == int(getattr(ref.counters, k)), k


def test_fused_engine_autopad_smooth_f_history(rng):
    """Auto-pad with a non-zero smooth f (PadDomain) and history records:
    objective/norm_res sequences must match the engine exactly (the padded
    tails contribute 0 to every reduction)."""
    from adaprox_tpu.models.objectives import LeastSquares

    m, n = 72, 29
    a = jnp.asarray(rng.standard_normal((m, n)))
    b = jnp.asarray(rng.standard_normal(m))
    a_f = jnp.asarray(rng.standard_normal((40, n)))
    b_f = jnp.asarray(rng.standard_normal(40))
    f = LeastSquares(a=a_f, b=b_f)
    h = ap.Translate(inner=ap.L2Norm(lam=1.0), b=-b)
    na = float(np.linalg.norm(np.asarray(a)))
    kw = dict(f=f, g=ap.L1Norm(lam=0.5), h=h,
              rule=ap.AdaPGMRule.make(t=1.0, norm_a=na), tol=1e-10, maxit=60,
              history=True)
    ref = ap.adaptive_primal_dual(
        jnp.zeros(n), jnp.zeros(m), A=ap.DenseOperator(a=a), **kw)
    got = fused_adaptive_primal_dual(jnp.zeros(n), jnp.zeros(m), A=a, **kw)
    np.testing.assert_allclose(np.asarray(got.records.norm_res),
                               np.asarray(ref.records.norm_res),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(got.records.objective),
                               np.asarray(ref.records.objective),
                               rtol=1e-8, atol=1e-10)


def test_fused_engine_pad_guards(rng):
    """pad=False raises on misalignment; auto-pad refuses an IndBox g whose
    box excludes 0 (prox(0) != 0 would move the padded coordinates)."""
    a = jnp.asarray(rng.standard_normal((10, 10)))
    common = dict(f=ap.ZeroSmooth(), h=ap.IndZero(),
                  rule=ap.AdaPGMRule(gamma=0.1), maxit=5)
    with pytest.raises(ValueError, match="tile-aligned"):
        fused_adaptive_primal_dual(
            jnp.zeros(10), jnp.zeros(10), g=ap.L1Norm(lam=1.0), A=a,
            pad=False, **common)
    with pytest.raises(ValueError, match="prox_g"):
        fused_adaptive_primal_dual(
            jnp.zeros(10), jnp.zeros(10), g=ap.IndBox(lo=1.0, hi=2.0), A=a,
            **common)


def test_fused_kernel_rejects_misaligned_interpret(rng):
    """ADVICE r2 (medium): the kernel-level tile validation must fire in
    interpret mode too — a poisoned CPU result is the failure mode."""
    at = jnp.asarray(rng.standard_normal((100, 64)))  # n=100 % 8 != 0
    with pytest.raises(ValueError, match="not divisible"):
        pd_kernels.fused_pd_primal_update(
            at, jnp.zeros(64), jnp.zeros(100), jnp.zeros(100), 0.1, 0.5, 0.0,
            prox_kind="l1", interpret=True)


def test_fused_engine_bf16_storage(srl_problem):
    """bf16 A' storage through the fused PD engine: same trajectory shape at
    bf16 input rounding (halves HBM traffic on TPU)."""
    a, yv, h = srl_problem
    m, n = a.shape
    a32 = jnp.asarray(a, jnp.float32)
    na = float(np.linalg.norm(np.asarray(a)))
    kw = dict(f=ap.ZeroSmooth(), g=ap.L1Norm(lam=jnp.float32(10.0)),
              h=ap.Translate(inner=ap.L2Norm(lam=jnp.float32(1.0)),
                             b=-jnp.asarray(yv, jnp.float32)),
              rule=ap.AdaPGMRule.make(t=1.0, norm_a=na), tol=1e-6, maxit=1500)
    r32 = fused_adaptive_primal_dual(
        jnp.zeros(n, jnp.float32), jnp.zeros(m, jnp.float32), A=a32, **kw)
    rbf = fused_adaptive_primal_dual(
        jnp.zeros(n, jnp.float32), jnp.zeros(m, jnp.float32),
        A=a32.astype(jnp.bfloat16), **kw)
    assert abs(int(rbf.numit) - int(r32.numit)) <= max(5, int(r32.numit) // 10)
    np.testing.assert_allclose(np.asarray(rbf.x), np.asarray(r32.x),
                               rtol=5e-2, atol=5e-2)
