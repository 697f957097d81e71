"""Prox operator correctness: closed forms, prox optimality conditions, and
the Moreau identity (which the dual update in every PD solver relies on)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import adaprox_tpu as ap
from adaprox_tpu.ops.prox import MoreauConjugate


def prox_objective(g, v, gamma, z):
    return float(g(z)) + float(jnp.sum((z - v) ** 2)) / (2 * gamma)


OPS = [
    ap.Zero(),
    ap.L1Norm(lam=0.7),
    ap.L2Norm(lam=1.3),
    ap.SqrL2Norm(lam=2.0),
    ap.IndBox(lo=-0.5, hi=1.5),
    ap.IndBall2(r=0.8),
    ap.IndZero(),
]


@pytest.mark.parametrize("g", OPS, ids=lambda g: type(g).__name__)
def test_prox_minimizes_objective(g, rng):
    """prox output must beat random candidates on g(z) + ||z-v||^2/(2 gamma)."""
    v = jnp.asarray(rng.standard_normal(20))
    gamma = 0.37
    y, g_y = g.prox(v, gamma)
    base = prox_objective(g, v, gamma, y)
    assert np.isfinite(base)
    # value returned by prox matches g at the prox point
    np.testing.assert_allclose(float(g_y), float(g(y)), rtol=1e-12, atol=1e-12)
    for _ in range(20):
        z = y + 0.1 * jnp.asarray(rng.standard_normal(20))
        assert prox_objective(g, v, gamma, z) >= base - 1e-9


def test_l1_soft_threshold_closed_form(rng):
    v = jnp.asarray(rng.standard_normal(50))
    lam, gamma = 0.3, 0.7
    y, _ = ap.L1Norm(lam=lam).prox(v, gamma)
    expected = np.sign(v) * np.maximum(np.abs(v) - gamma * lam, 0)
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-14)


def test_box_clamp(rng):
    v = jnp.asarray(rng.standard_normal(50) * 3)
    y, val = ap.IndBox(lo=-1.0, hi=2.0).prox(v, 0.5)
    np.testing.assert_allclose(np.asarray(y), np.clip(v, -1.0, 2.0))
    assert float(val) == 0.0
    assert float(ap.IndBox(lo=-1.0, hi=2.0)(y)) == 0.0
    assert float(ap.IndBox(lo=-1.0, hi=2.0)(v)) == np.inf


def test_l2_block_soft_threshold(rng):
    v = jnp.asarray(rng.standard_normal(30))
    lam, gamma = 0.5, 0.9
    y, _ = ap.L2Norm(lam=lam).prox(v, gamma)
    nv = float(jnp.linalg.norm(v))
    scale = max(0.0, 1 - gamma * lam / nv)
    np.testing.assert_allclose(np.asarray(y), scale * np.asarray(v), rtol=1e-12)
    # below threshold: maps to zero
    y0, _ = ap.L2Norm(lam=lam).prox(v / nv * gamma * lam * 0.5, gamma)
    np.testing.assert_allclose(np.asarray(y0), 0.0)


def test_translate(rng):
    b = jnp.asarray(rng.standard_normal(10))
    v = jnp.asarray(rng.standard_normal(10))
    h = ap.Translate(inner=ap.L2Norm(lam=1.0), b=-b)  # h(x) = ||x - b||
    np.testing.assert_allclose(
        float(h(v)), float(jnp.linalg.norm(v - b)), rtol=1e-12
    )
    y, val = h.prox(v, 0.4)
    base = prox_objective(h, v, 0.4, y)
    for _ in range(20):
        z = y + 0.05 * jnp.asarray(rng.standard_normal(10))
        assert prox_objective(h, v, 0.4, z) >= base - 1e-9


@pytest.mark.parametrize(
    "g", [ap.L1Norm(lam=0.7), ap.L2Norm(lam=1.1), ap.IndBox(lo=-1.0, hi=1.0), ap.Zero()],
    ids=lambda g: type(g).__name__,
)
def test_moreau_identity(g, rng):
    """prox_{s g*}(w) == w - s*prox_{g/s}(w/s): the analytic conjugates must
    agree with the generic Moreau wrapper (used at src/AdaProx.jl:345)."""
    w = jnp.asarray(rng.standard_normal(25))
    s = 0.63
    analytic = ap.conjugate(g)
    moreau = MoreauConjugate(inner=g)
    ya, _ = analytic.prox(w, s)
    ym, _ = moreau.prox(w, s)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(ym), rtol=1e-10, atol=1e-12)


def test_conjugate_pairs():
    assert isinstance(ap.conjugate(ap.Zero()), ap.IndZero)
    assert isinstance(ap.conjugate(ap.IndZero()), ap.Zero)
    assert isinstance(ap.conjugate(ap.L1Norm(lam=2.0)), ap.IndBox)
    assert isinstance(ap.conjugate(ap.L2Norm(lam=2.0)), ap.IndBall2)


def test_prox_is_jittable_and_vmappable(rng):
    v = jnp.asarray(rng.standard_normal((8, 16)))
    lams = jnp.linspace(0.1, 1.0, 8)

    @jax.jit
    @jax.vmap
    def batch_prox(lam, vi):
        return ap.L1Norm(lam=lam).prox(vi, 0.5)[0]

    out = batch_prox(lams, v)
    for i in range(8):
        yi, _ = ap.L1Norm(lam=float(lams[i])).prox(v[i], 0.5)
        np.testing.assert_allclose(np.asarray(out[i]), np.asarray(yi), rtol=1e-12)
