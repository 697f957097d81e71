"""Golden tests for the stepsize-rule recurrences: each rule's gamma sequence
is checked against an independent NumPy implementation of the reference
formulas (src/AdaProx.jl:208-308)."""

import jax.numpy as jnp
import numpy as np
import pytest

import adaprox_tpu as ap
from adaprox_tpu.solvers.rules import Curvature


def random_curv(rng):
    dg = rng.standard_normal(12)
    dx = rng.standard_normal(12)
    return Curvature(
        ndg2=jnp.asarray(dg @ dg), dgdx=jnp.asarray(dg @ dx), ndx2=jnp.asarray(dx @ dx)
    )


def test_fixed_stepsize():
    rule = ap.FixedStepsize(gamma=0.3, t=2.0)
    (g, s), st = rule.init()
    assert float(g) == 0.3 and float(s) == pytest.approx(0.3 * 4)
    (g2, s2), _ = rule.update(st, None)
    assert float(g2) == 0.3 and float(s2) == pytest.approx(1.2)


def test_malitsky_mishchenko_golden(rng):
    t = 1.0
    rule = ap.MalitskyMishchenkoRule(gamma=0.05, t=t)
    (g, s), st = rule.init()
    # numpy replica (src/AdaProx.jl:222-230)
    gamma_prev, rho = 0.05, np.inf
    for _ in range(6):
        curv = random_curv(rng)
        (g, s), st = rule.update(st, curv)
        lip = np.sqrt(float(curv.ndg2)) / np.sqrt(float(curv.ndx2))
        expect = min(np.sqrt(1 + rho) * gamma_prev, 1 / (2 * lip))
        assert float(g) == pytest.approx(expect, rel=1e-12)
        assert float(s) == pytest.approx(expect * t**2, rel=1e-12)
        rho = expect / gamma_prev
        gamma_prev = expect


def _adapgm_expected(state, curv, t, norm_a, delta, theta):
    """NumPy replica of src/AdaProx.jl:258-273."""
    gamma1, gamma0 = state
    xi = t**2 * gamma1**2 * norm_a**2
    dgdx = float(curv.dgdx)
    c = float(curv.ndg2) / dgdx if dgdx != 0 else np.nan
    c = 0.0 if np.isnan(c) else c
    lip = dgdx / float(curv.ndx2)
    lip = 0.0 if np.isnan(lip) else lip
    d = gamma1 * lip * (gamma1 * c - 1)
    opd = 1 + delta
    m4 = 1 - 4 * xi * opd**2
    with np.errstate(all="ignore"):
        t2 = np.divide(1.0, 2 * theta * t * norm_a)
        denom = max(d + np.sqrt(d**2 + xi * m4), 0.0)
        t3 = gamma1 * np.sqrt(m4) / np.sqrt(2 * opd * denom)
    gamma = min(gamma1 * np.sqrt(1 + gamma1 / gamma0), t2, t3)
    return gamma, gamma * t**2, (gamma, gamma1)


@pytest.mark.parametrize("t,norm_a", [(1.0, 0.0), (0.5, 2.3), (2.0, 0.7)])
def test_adapgm_golden(rng, t, norm_a):
    rule = ap.AdaPGMRule(gamma=0.02, t=t, norm_a=norm_a, delta=0.0, theta=1.2)
    (g, s), st = rule.init()
    assert float(g) == pytest.approx(0.02)
    assert float(s) == pytest.approx(0.02 * t**2)
    state_np = (0.02, 0.02)
    for _ in range(8):
        curv = random_curv(rng)
        (g, s), st = rule.update(st, curv)
        eg, es, state_np = _adapgm_expected(state_np, curv, t, norm_a, 0.0, 1.2)
        assert float(g) == pytest.approx(eg, rel=1e-10)
        assert float(s) == pytest.approx(es, rel=1e-10)


def test_adapgm_zero_diff_is_finite():
    """Identical iterates (0/0 curvature) must not poison gamma: the nan
    guards at src/AdaProx.jl:260-261 map 0/0 -> 0."""
    rule = ap.AdaPGMRule(gamma=0.1, t=1.0, norm_a=0.0)
    (_, _), st = rule.init()
    z = jnp.zeros(())
    (g, s), _ = rule.update(st, Curvature(ndg2=z, dgdx=z, ndx2=z))
    # C = L = D = 0 -> third term = gamma1/sqrt(0) = inf; first term finite
    assert np.isfinite(float(g))
    assert float(g) == pytest.approx(0.1 * np.sqrt(2.0), rel=1e-12)


def test_adapgm_negative_d_no_nan(rng):
    """D < 0 with norm_a == 0 must give +inf for the third bound (never NaN
    from sqrt rounding), so gamma falls back to the growth bound."""
    rule = ap.AdaPGMRule(gamma=0.01, t=1.0, norm_a=0.0)
    (_, _), st = rule.init()
    # craft curvature with gamma1*C < 1 -> D < 0
    curv = Curvature(
        ndg2=jnp.asarray(1.0), dgdx=jnp.asarray(10.0), ndx2=jnp.asarray(1.0)
    )
    (g, _), _ = rule.update(st, curv)
    assert np.isfinite(float(g))


def test_adapgm_make_resolves_gamma():
    r = ap.AdaPGMRule.make(t=2.0, norm_a=3.0)
    assert float(r.gamma) == pytest.approx(1 / (2 * 1.2 * 2.0 * 3.0))
    with pytest.raises(ValueError):
        ap.AdaPGMRule.make(t=1.0, norm_a=0.0)


def test_adapgm_make_clamps_gamma_to_coupling_bound():
    """gamma_init above 1/(2*t*||A||*(1+delta)) makes the first update's
    sqrt(1 - 4 xi (1+delta)^2) negative — the reference dies with a Julia
    DomainError there (src/AdaProx.jl:267); jnp.sqrt would silently NaN the
    whole solve. make() clamps (with a warning) instead. The bound must be
    the reference's OWN failure threshold, not the tighter Theta-based
    coupling cap: inits between the two run fine in the reference (the
    first iterate uses gamma_init; the coupling min binds from update 1)
    and must pass through unclamped (r3 ADVICE)."""
    import warnings as _w

    bound = 1 / (2 * 1.0 * 5.0 * (1 + 1e-6))
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        r = ap.AdaPGMRule.make(gamma=10 * bound, t=1.0, norm_a=5.0)
    assert float(r.gamma) == pytest.approx(bound)
    assert any("coupling bound" in str(w.message) for w in rec)
    # the clamped init keeps the first update finite
    (_, _), st = r.init()
    curv = Curvature(ndg2=jnp.asarray(4.0), dgdx=jnp.asarray(2.0),
                     ndx2=jnp.asarray(1.0))
    (g1, _), _ = r.update(st, curv)
    assert np.isfinite(float(g1)) and float(g1) > 0
    # valid gammas and the default pass through BIT-exactly (the knife-edge
    # linesearch mirrors depend on this) — INCLUDING inits between the
    # Theta cap 1/(2.4*t*||A||) and the true bound 1/(2*t*||A||), which the
    # old Theta-based clamp wrongly squashed
    with _w.catch_warnings():
        _w.simplefilter("error")
        r_def = ap.AdaPGMRule.make(t=1.0, norm_a=5.0)
        r_same = ap.AdaPGMRule.make(gamma=float(r_def.gamma), t=1.0, norm_a=5.0)
        r_small = ap.AdaPGMRule.make(gamma=0.5 * bound, t=1.0, norm_a=5.0)
        mid = 0.95 / (2 * 1.0 * 5.0)  # above Theta cap, below the bound
        r_mid = ap.AdaPGMRule.make(gamma=mid, t=1.0, norm_a=5.0)
    assert float(r_same.gamma) == float(r_def.gamma)
    assert float(r_small.gamma) == 0.5 * bound
    assert float(r_mid.gamma) == mid
    # ... and the first update from such an init stays finite (the point of
    # permitting it: the reference runs fine there)
    (_, _), st_mid = r_mid.init()
    (g_mid, _), _ = r_mid.update(st_mid, curv)
    assert np.isfinite(float(g_mid)) and float(g_mid) > 0
    # traced path (vmapped t-sweeps): default gamma equals the unclamped
    # formula bit-exactly; an oversized traced gamma is clamped
    import jax

    ts = jnp.asarray([0.5, 1.0, 2.0])
    gs = jax.vmap(lambda t: ap.AdaPGMRule.make(gamma=0.0, t=t, norm_a=5.0).gamma)(ts)
    np.testing.assert_array_equal(np.asarray(gs), np.asarray(1.0 / (2 * 1.2 * ts * 5.0)))
    g_big = jax.vmap(lambda t: ap.AdaPGMRule.make(gamma=1e3, t=t, norm_a=5.0).gamma)(ts)
    np.testing.assert_allclose(np.asarray(g_big), np.asarray(1.0 / (2 * ts * 5.0 * (1 + 1e-6))))


def test_adapgm_plus_identical_iterates_keeps_constant_term():
    """On identical iterates (0/0 curvature fractions) the reference's
    per-ratio nan guards give C = L = 0, so D = 1 - 2r — a LIVE constant
    when r != 0.5 that a whole-expression nan_to_zero would erase
    (review finding): the second bound must stay finite."""
    nu, xi, r_par = 1.0, 1.0, 0.25
    rule = ap.AdaPGMPlusRule(gamma=0.04, xi=xi, nu=nu, r=r_par)
    (_, _), st = rule.init()
    curv = ap.Curvature(ndg2=jnp.zeros(()), dgdx=jnp.zeros(()),
                        ndx2=jnp.zeros(()))
    (g, _), _ = rule.update(st, curv)
    d = 1 - 2 * r_par
    expect = 0.04 * min(
        np.sqrt(1 / (r_par * (nu + xi)) + 1.0),
        np.sqrt((nu * (1 + xi) - 1) / (nu * (nu + xi))) / np.sqrt(d),
    )
    assert float(g) == pytest.approx(expect, rel=1e-12)


def test_adapgm_plus_golden(rng):
    nu, xi, r_par = 1.0, 1.0, 0.5
    rule = ap.AdaPGMPlusRule(gamma=0.04, xi=xi, nu=nu, r=r_par)
    (g, s), st = rule.init()
    assert float(g) == pytest.approx(0.04) and float(s) == pytest.approx(0.04)
    g1, g0 = 0.04, 0.04
    for _ in range(6):
        curv = random_curv(rng)
        (g, s), st = rule.update(st, curv)
        dgdx = float(curv.dgdx)
        c = float(curv.ndg2) / dgdx
        lip = dgdx / float(curv.ndx2)
        d = 1 - 2 * r_par + g1 * lip * (g1 * c + 2 * (r_par - 1))
        with np.errstate(all="ignore"):
            expect = g1 * min(
                np.sqrt(1 / (r_par * (nu + xi)) + g1 / g0),
                np.sqrt((nu * (1 + xi) - 1) / (nu * (nu + xi))) / np.sqrt(max(d, 0)),
            )
        assert float(g) == pytest.approx(expect, rel=1e-10)
        g0, g1 = g1, expect


def test_adapgm_dgdx_underflow_no_nan():
    """Near convergence dgdx can underflow to exactly 0 while ndg2 > 0 (f32);
    the factored reference form would give D = 0*inf = NaN — the
    cancellation-free form must stay finite."""
    rule = ap.AdaPGMRule(gamma=0.1, t=1.0, norm_a=0.0)
    (_, _), st = rule.init()
    curv = Curvature(
        ndg2=jnp.asarray(1e-12), dgdx=jnp.asarray(0.0), ndx2=jnp.asarray(1e-10)
    )
    (g, _), _ = rule.update(st, curv)
    assert np.isfinite(float(g)) and float(g) > 0


def test_f32_adapgm_full_convergence():
    """f32 end-to-end: AdaPGM on the known-optimum lasso must reach tol
    without NaN (exercises the near-convergence degenerate curvatures)."""
    import adaprox_tpu as ap2
    from adaprox_tpu.models.objectives import LeastSquares
    from adaprox_tpu.models.synthetic import random_lasso

    prob = random_lasso(m=256, n=512, pfactor=10, seed=0)
    lf = float(np.linalg.norm(prob.a, 2) ** 2)
    f = LeastSquares(a=jnp.asarray(prob.a, jnp.float32), b=jnp.asarray(prob.b, jnp.float32))
    g = ap2.L1Norm(lam=jnp.float32(1.0))
    res = ap2.adaptive_proxgrad(
        jnp.zeros(512, jnp.float32), f=f, g=g,
        rule=ap2.AdaPGMRule(gamma=jnp.float32(1 / lf)), tol=1e-4, maxit=8000,
        history=True,
    )
    nr = np.asarray(res.records.norm_res)[: int(res.numit)]
    assert np.isfinite(nr).all(), "residual history contains NaN/inf"
    gap = float(f.value(res.x) + g(res.x)) - prob.optimum
    assert abs(gap) < 1e-2


# ---------------------------------------------------------------------------
# Uniform parameter validation (r3 verdict #4): every rule .make and the
# linesearch solver entries must reject invalid concrete parameters with a
# clear error instead of silently NaN-poisoning the jitted trajectory.
# Reference behavior: Julia DomainError at src/AdaProx.jl:267.
# ---------------------------------------------------------------------------

def _tiny_pd_parts():
    from adaprox_tpu.models.objectives import LeastSquares

    A = jnp.asarray(np.eye(3))
    f = LeastSquares(a=A, b=jnp.ones(3))
    return dict(f=f, g=ap.L1Norm(lam=0.1), h=ap.L2Norm(lam=0.1),
                A=ap.DenseOperator(A))


@pytest.mark.parametrize("ctor,bad_kwargs", [
    (ap.FixedStepsize.make, dict(gamma=0.0)),
    (ap.FixedStepsize.make, dict(gamma=-1.0)),
    (ap.FixedStepsize.make, dict(gamma=0.1, t=0.0)),
    (ap.MalitskyMishchenkoRule.make, dict(gamma=-0.5)),
    (ap.MalitskyMishchenkoRule.make, dict(gamma=0.1, t=-1.0)),
    (ap.AdaPGMPlusRule.make, dict(gamma=None)),
    (ap.AdaPGMPlusRule.make, dict(gamma=0.0)),
    (ap.AdaPGMPlusRule.make, dict(gamma=0.1, r=0.0)),
    (ap.AdaPGMPlusRule.make, dict(gamma=0.1, r=-0.5)),
    (ap.AdaPGMPlusRule.make, dict(gamma=0.1, nu=-1.0)),
    (ap.AdaPGMPlusRule.make, dict(gamma=0.1, xi=0.0)),
    # nu*(1+xi) <= 1 -> sqrt((nu(1+xi)-1)/...) imaginary -> NaN every update
    (ap.AdaPGMPlusRule.make, dict(gamma=0.1, nu=0.4, xi=0.5)),
])
def test_rule_make_rejects_invalid_params(ctor, bad_kwargs):
    with pytest.raises(ValueError):
        ctor(**bad_kwargs)


def test_adapgm_plus_make_valid_passthrough():
    r = ap.AdaPGMPlusRule.make(gamma=0.04, xi=1.0, nu=1.0, r=0.25)
    assert float(r.gamma) == 0.04 and float(r.r) == 0.25
    # a valid rule's first update from nonzero curvature is finite
    (_, _), st = r.init()
    curv = Curvature(ndg2=jnp.asarray(1.0), dgdx=jnp.asarray(0.5),
                     ndx2=jnp.asarray(1.0))
    (g, _), _ = r.update(st, curv)
    assert np.isfinite(float(g)) and float(g) > 0


@pytest.mark.parametrize("bad", [dict(sigma=0.0), dict(sigma=-1.0),
                                 dict(sigma=0.1, t=0.0),
                                 dict(sigma=0.1, t=-2.0)])
def test_malitsky_pock_rejects_invalid_sigma_t(bad):
    parts = _tiny_pd_parts()
    kw = dict(sigma=0.1, t=1.0); kw.update(bad)
    with pytest.raises(ValueError, match="must be positive"):
        ap.malitsky_pock(jnp.zeros(3), jnp.zeros(3), **parts, **kw, maxit=2)


@pytest.mark.parametrize("bad", [dict(eta=0.0), dict(eta=-1.0),
                                 dict(eta=1.0, t=0.0), dict(eta=1.0, t=-3.0)])
def test_adapdm_plus_rejects_invalid_eta_t(bad):
    parts = _tiny_pd_parts()
    kw = dict(eta=1.0, t=1.0); kw.update(bad)
    with pytest.raises(ValueError, match="must be positive"):
        ap.adaptive_linesearch_primal_dual(
            jnp.zeros(3), jnp.zeros(3), **parts, **kw, maxit=2)


def test_validate_positive_rejects_bools_and_numpy_scalars():
    """ADVICE r4: np.float32 scalars used to skip validation (not a Python
    float); bools used to be silently skipped (gamma=True meaning 1.0 is a
    bug, not a parameter). Both must now fail loudly."""
    from adaprox_tpu.solvers.rules import validate_positive

    validate_positive(gamma=np.float32(2.0), t=np.float64(1.0))  # fine
    validate_positive(gamma=jnp.asarray(0.5))  # concrete 0-d jax array: fine
    with pytest.raises(ValueError, match="must be positive"):
        validate_positive(gamma=np.float32(-1.0))
    with pytest.raises(ValueError, match="must be positive"):
        validate_positive(gamma=jnp.asarray(-0.5))
    for b in (True, False, np.bool_(True), np.asarray(True),
              jnp.asarray(True)):
        with pytest.raises(TypeError, match="bool"):
            validate_positive(gamma=b)
    with pytest.raises(TypeError, match="bool"):
        ap.FixedStepsize.make(gamma=True)
    # complex scalars/arrays poison like negatives — same loud failure
    import numpy as _np
    for c in (1 + 2j, _np.complex128(-1), _np.asarray(1 + 2j)):
        with pytest.raises(TypeError, match="real"):
            validate_positive(gamma=c)


def test_validation_skips_traced_values():
    """Traced params can't be validated at trace time — vmapped sweeps must
    still construct (rules are dynamic pytree leaves by design)."""
    import jax

    sigs = jnp.asarray([0.05, 0.1])
    parts = _tiny_pd_parts()

    def run(sig):
        return ap.malitsky_pock(
            jnp.zeros(3), jnp.zeros(3), **parts, sigma=sig, maxit=3).norm_res

    out = jax.vmap(run)(sigs)
    assert np.isfinite(np.asarray(out)).all()
