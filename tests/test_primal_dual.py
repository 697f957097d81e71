"""Primal-dual solver tests on the reference's two PD problem shapes:

* dual SVM: box-constrained QP with one linear equality via h(Ax), h=IndZero,
  A = y^T (experiments/dual_svm/runme.jl:44-61)
* square-root lasso: fully nonsmooth f=0, g=L1, h=||. - y||_2 via Translate
  (experiments/square_root_lasso/runme.jl:37-42)

All PD solvers must agree on the objective and satisfy feasibility — the
reference never unit-tests this path (SURVEY §4), so these are new.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import adaprox_tpu as ap
from adaprox_tpu.models.objectives import Quadratic
from adaprox_tpu.ops.oracles import ZeroSmooth


@pytest.fixture(scope="module")
def dsvm():
    rng = np.random.default_rng(7)
    n_pts, n_feat = 40, 6
    x_data = rng.standard_normal((n_pts, n_feat))
    labels = np.sign(rng.standard_normal(n_pts))
    labels[labels == 0] = 1.0
    q_mat = (labels[:, None] * x_data) @ (labels[:, None] * x_data).T
    q_vec = -np.ones(n_pts)
    f = Quadratic(q_mat=jnp.asarray(q_mat), q_vec=jnp.asarray(q_vec))
    big_c = 0.5
    g = ap.IndBox(lo=0.0, hi=big_c)
    h = ap.IndZero()
    a_mat = jnp.asarray(labels[None, :])  # 1 x N
    a_op = ap.DenseOperator(a=a_mat)
    norm_a = float(jnp.linalg.norm(a_mat))
    lf = float(np.linalg.norm(q_mat, 2))
    return f, g, h, a_op, norm_a, lf, n_pts, labels, big_c


def _dsvm_check(res, f, labels, big_c, tol):
    x = np.asarray(res.x)
    assert (x >= -1e-9).all() and (x <= big_c + 1e-9).all(), "box feasibility"
    assert abs(labels @ x) < 50 * tol, "equality constraint y'x = 0"
    return float(f.value(res.x))


def test_h_without_a_raises():
    """Silently dropping a user-supplied h (or y0) when A is omitted would
    solve a different problem — it must raise (review finding)."""
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((8, 4)))
    f = ap.FromFunction(fn=lambda x: 0.5 * jnp.sum((a @ x) ** 2))
    with pytest.raises(ValueError, match="h was given without A"):
        ap.adaptive_primal_dual(
            jnp.zeros(4), f=f, g=ap.Zero(), h=ap.L1Norm(lam=1.0),
            rule=ap.AdaPGMRule(gamma=1e-2))
    with pytest.raises(ValueError, match="y0 was given without A"):
        ap.adaptive_primal_dual(
            jnp.zeros(4), jnp.zeros(8), f=f, g=ap.Zero(),
            rule=ap.AdaPGMRule(gamma=1e-2))


def test_resume_history_respects_cumulative_maxit(rng):
    """maxit is the CUMULATIVE cap on resume in BOTH loop modes: the scan
    (history=True) used to run maxit additional trips (review finding)."""
    from adaprox_tpu.models.objectives import LeastSquares

    a = jnp.asarray(rng.standard_normal((24, 12)))
    b = jnp.asarray(rng.standard_normal(24))
    kw = dict(f=LeastSquares(a=a, b=b), g=ap.L1Norm(lam=0.1),
              rule=ap.AdaPGMRule(gamma=1e-2), tol=0.0)
    r1 = ap.adaptive_proxgrad(jnp.zeros(12), maxit=30, history=True, **kw)
    r2 = ap.adaptive_proxgrad(jnp.zeros(12), maxit=50, history=True,
                              resume_state=r1.extra, **kw)
    assert int(r2.numit) == 50  # not 30 + 50
    assert int(np.sum(np.asarray(r2.records.valid))) == 20
    direct = ap.adaptive_proxgrad(jnp.zeros(12), maxit=50, history=True, **kw)
    np.testing.assert_array_equal(np.asarray(r2.x), np.asarray(direct.x))


def test_adapdm_dual_svm(dsvm):
    f, g, h, a_op, norm_a, lf, n, labels, big_c = dsvm
    tol = 1e-6
    res = ap.adaptive_primal_dual(
        jnp.zeros(n), jnp.zeros(1), f=f, g=g, h=h, A=a_op,
        rule=ap.AdaPGMRule.make(t=1.0, norm_a=norm_a), tol=tol, maxit=20_000,
    )
    assert float(res.norm_res) <= tol
    obj = _dsvm_check(res, f, labels, big_c, tol)
    # cross-check against Condat-Vu
    res_cv = ap.condat_vu(
        jnp.zeros(n), jnp.zeros(1), f=f, g=g, h=h, A=a_op, Lf=lf,
        tol=tol, maxit=50_000,
    )
    obj_cv = _dsvm_check(res_cv, f, labels, big_c, tol)
    assert obj == pytest.approx(obj_cv, abs=1e-4)


def test_malitsky_pock_dual_svm(dsvm):
    f, g, h, a_op, norm_a, lf, n, labels, big_c = dsvm
    tol = 1e-6
    res = ap.malitsky_pock(
        jnp.zeros(n), jnp.zeros(1), f=f, g=g, h=h, A=a_op,
        sigma=1 / norm_a, t=0.1, tol=tol, maxit=50_000,
    )
    assert float(res.norm_res) <= tol
    _dsvm_check(res, f, labels, big_c, tol)


def test_pd_counter_semantics(dsvm):
    """Engine meters at the check: A = it+1 (init + one per half1), At = it
    (init + half2 of the it-1 previous iterations), prox_h = it (half1 of
    each iteration incl. current), f = grad = it+1, prox_g = it
    (src/AdaProx.jl:327-361, log at :351)."""
    f, g, h, a_op, norm_a, lf, n, labels, big_c = dsvm
    res = ap.adaptive_primal_dual(
        jnp.zeros(n), jnp.zeros(1), f=f, g=g, h=h, A=a_op,
        rule=ap.AdaPGMRule.make(t=1.0, norm_a=norm_a), tol=1e-5, maxit=20_000,
    )
    it = int(res.numit)
    c = res.counters
    assert int(c.A_evals) == it + 1
    assert int(c.At_evals) == it
    assert int(c.f_evals) == it + 1
    assert int(c.grad_f_evals) == it + 1
    assert int(c.prox_h_evals) == it
    assert int(c.prox_g_evals) == it


@pytest.fixture(scope="module")
def sqrt_lasso():
    rng = np.random.default_rng(3)
    m, n = 30, 10
    x_data = rng.standard_normal((m, n))
    y = x_data @ (rng.standard_normal(n) * (rng.random(n) < 0.5)) + 0.01 * rng.standard_normal(m)
    a_mat = jnp.asarray(np.hstack([x_data, np.ones((m, 1))]))
    f = ZeroSmooth()
    g = ap.L1Norm(lam=0.5)
    h = ap.Translate(inner=ap.L2Norm(lam=1.0), b=-jnp.asarray(y))
    a_op = ap.DenseOperator(a=a_mat)
    norm_a = float(jnp.linalg.norm(a_mat))
    return f, g, h, a_op, norm_a, m, n


def _sqrt_lasso_obj(g, h, a_op, x):
    return float(g(x) + h(a_op.matvec(x)))


def test_condat_vu_sqrt_lasso(sqrt_lasso):
    f, g, h, a_op, norm_a, m, n = sqrt_lasso
    res = ap.condat_vu(
        jnp.zeros(n + 1), jnp.zeros(m), f=f, g=g, h=h, A=a_op,
        Lf=0.0, norm_A=norm_a, tol=1e-7, maxit=50_000,
    )
    assert float(res.norm_res) <= 1e-7
    assert np.isfinite(_sqrt_lasso_obj(g, h, a_op, res.x))


def test_adapdm_plus_sqrt_lasso_matches_condat_vu(sqrt_lasso):
    f, g, h, a_op, norm_a, m, n = sqrt_lasso
    tol = 1e-7
    res_cv = ap.condat_vu(
        jnp.zeros(n + 1), jnp.zeros(m), f=f, g=g, h=h, A=a_op,
        Lf=0.0, norm_A=norm_a, tol=tol, maxit=50_000,
    )
    res_plus = ap.adaptive_linesearch_primal_dual(
        jnp.zeros(n + 1), jnp.zeros(m), f=f, g=g, h=h, A=a_op,
        eta=norm_a, t=1.0, tol=tol, maxit=50_000,
    )
    assert float(res_plus.norm_res) <= tol
    obj_cv = _sqrt_lasso_obj(g, h, a_op, res_cv.x)
    obj_plus = _sqrt_lasso_obj(g, h, a_op, res_plus.x)
    assert obj_plus == pytest.approx(obj_cv, abs=1e-5)
    # AdaPDM+ should not need dramatically more matvecs than Condat-Vu
    assert int(res_plus.numit) <= 5 * int(res_cv.numit) + 100


def test_malitsky_pock_sqrt_lasso(sqrt_lasso):
    f, g, h, a_op, norm_a, m, n = sqrt_lasso
    tol = 1e-7
    res = ap.malitsky_pock(
        jnp.zeros(n + 1), jnp.zeros(m), f=f, g=g, h=h, A=a_op,
        sigma=1.0, t=1.0, tol=tol, maxit=50_000,
    )
    assert float(res.norm_res) <= tol
    res_cv = ap.condat_vu(
        jnp.zeros(n + 1), jnp.zeros(m), f=f, g=g, h=h, A=a_op,
        Lf=0.0, norm_A=norm_a, tol=tol, maxit=50_000,
    )
    assert _sqrt_lasso_obj(g, h, a_op, res.x) == pytest.approx(
        _sqrt_lasso_obj(g, h, a_op, res_cv.x), abs=1e-5
    )


def test_lad_least_absolute_deviation(sqrt_lasso):
    """LAD: identical harness with h = Translate(L1, -y)
    (experiments/least_absolute_deviation/runme.jl:40-42)."""
    f, g, h_l2, a_op, norm_a, m, n = sqrt_lasso
    h = ap.Translate(inner=ap.L1Norm(lam=1.0), b=h_l2.b)
    tol = 1e-6
    res_cv = ap.condat_vu(
        jnp.zeros(n + 1), jnp.zeros(m), f=f, g=g, h=h, A=a_op,
        Lf=0.0, norm_A=norm_a, tol=tol, maxit=50_000,
    )
    res_plus = ap.adaptive_linesearch_primal_dual(
        jnp.zeros(n + 1), jnp.zeros(m), f=f, g=g, h=h, A=a_op,
        eta=norm_a, t=1.0, tol=tol, maxit=50_000,
    )
    assert float(res_cv.norm_res) <= tol and float(res_plus.norm_res) <= tol
    obj = lambda r: float(g(r.x) + h(a_op.matvec(r.x)))
    assert obj(res_plus) == pytest.approx(obj(res_cv), abs=1e-4)


def test_pd_history_mode(dsvm):
    f, g, h, a_op, norm_a, lf, n, labels, big_c = dsvm
    res = ap.adaptive_primal_dual(
        jnp.zeros(n), jnp.zeros(1), f=f, g=g, h=h, A=a_op,
        rule=ap.AdaPGMRule.make(t=1.0, norm_a=norm_a), tol=1e-5, maxit=2000,
        history=True,
    )
    nv = int(res.records.valid.sum())
    assert nv == int(res.numit)
    assert float(res.records.norm_res[nv - 1]) == pytest.approx(float(res.norm_res))
    # sigma column populated for PD (the reference logs sigma only for PD runs)
    assert float(res.records.sigma[0]) > 0


def test_adapdm_plus_inner_loop_counters(sqrt_lasso):
    """AdaPDM+ meters every inner linesearch trial: each costs one prox_h +
    one A'-matvec (src/AdaProx.jl:523-526), so prox_h_evals == At_evals - 1
    (the extra At is the warm-up at :496) and both exceed numit when any
    backtracking occurred."""
    f, g, h, a_op, norm_a, m, n = sqrt_lasso
    res = ap.adaptive_linesearch_primal_dual(
        jnp.zeros(n + 1), jnp.zeros(m), f=f, g=g, h=h, A=a_op,
        eta=norm_a, t=1.0, tol=1e-6, maxit=5000,
    )
    it = int(res.numit)
    prox_h = int(res.counters.prox_h_evals)
    at = int(res.counters.At_evals)
    assert prox_h == at - 1
    assert prox_h >= it  # at least one trial per outer iteration
    assert int(res.counters.A_evals) == it + 1


def test_scalar_dtype_hybrid_f32_iterates_f64_rule():
    """f64-scalar hybrid (VERDICT r1 item 1): f32 iterates/matvecs with the
    rule, curvature reductions, and residual norms in f64. The curvature
    upcast happens before the cross-iterate subtraction, so the rule sees
    exact differences; trajectories track the pure-f32 run (same problem,
    same stepsizes to f32 resolution) while steps/norms come out f64."""
    import numpy as np

    from adaprox_tpu.models.objectives import LeastSquares
    from adaprox_tpu.models.synthetic import random_lasso

    prob = random_lasso(m=64, n=128, pfactor=8, seed=3)
    f = LeastSquares(a=jnp.asarray(prob.a, jnp.float32),
                     b=jnp.asarray(prob.b, jnp.float32))
    g = ap.L1Norm(lam=1.0)
    lf = float(np.linalg.norm(prob.a, 2) ** 2)
    kw = dict(f=f, g=g, rule=ap.AdaPGMRule(gamma=1 / lf), tol=0.0, maxit=300)
    r32 = ap.adaptive_proxgrad(jnp.zeros(128, jnp.float32), **kw)
    rhy = ap.adaptive_proxgrad(jnp.zeros(128, jnp.float32),
                               scalar_dtype=jnp.float64, **kw)
    assert rhy.x.dtype == jnp.float32
    assert rhy.norm_res.dtype == jnp.float64
    assert rhy.extra.gamma.dtype == jnp.float64
    # same algorithm at f32 resolution: iterates agree to f32-level noise
    np.testing.assert_allclose(
        np.asarray(rhy.x), np.asarray(r32.x), rtol=1e-3, atol=1e-5)
    # the hybrid's residual is the exact residual of the f32 iterates; the
    # objective must be as good as the pure run's
    f64 = LeastSquares(a=jnp.asarray(prob.a, jnp.float64),
                       b=jnp.asarray(prob.b, jnp.float64))
    obj_h = float(f64.value(rhy.x.astype(jnp.float64)))
    obj_p = float(f64.value(r32.x.astype(jnp.float64)))
    assert obj_h <= obj_p * (1 + 1e-4) + 1e-8


@pytest.mark.parametrize("solver", ["mp", "adapdm_plus"])
def test_scalar_dtype_hybrid_pd_linesearch(sqrt_lasso, solver):
    """scalar_dtype on the PD linesearch families (VERDICT r2 weak 7
    uniformity): f32 iterates with f64 step/acceptance scalars must run,
    expose f64 scalars, and solve the problem."""
    f, g, h, a_op, norm_a, m, n = sqrt_lasso
    a32 = ap.DenseOperator(a=a_op.a.astype(jnp.float32))
    h32 = ap.Translate(inner=ap.L2Norm(lam=jnp.float32(1.0)),
                       b=h.b.astype(jnp.float32))
    g32 = ap.L1Norm(lam=jnp.float32(0.5))
    x0 = jnp.zeros(n + 1, jnp.float32)
    y0 = jnp.zeros(m, jnp.float32)
    if solver == "mp":
        res = ap.malitsky_pock(x0, y0, f=f, g=g32, h=h32, A=a32,
                               sigma=1.0 / norm_a, tol=1e-5, maxit=20_000,
                               scalar_dtype=jnp.float64)
    else:
        res = ap.adaptive_linesearch_primal_dual(
            x0, y0, f=f, g=g32, h=h32, A=a32, eta=norm_a, t=1.0,
            tol=1e-5, maxit=20_000, scalar_dtype=jnp.float64)
    assert res.x.dtype == jnp.float32
    assert res.norm_res.dtype == jnp.float64
    assert float(res.norm_res) <= 1e-5
    assert np.isfinite(_sqrt_lasso_obj(g32, h32, a32, res.x))
