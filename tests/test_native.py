"""Native C++ LIBSVM parser vs the pure-Python parser."""

import numpy as np
import pytest

from adaprox_tpu import native
from adaprox_tpu.utils.libsvm import load_libsvm_dataset


def _write_toy(path, rows=50, cols=20, seed=0):
    rng = np.random.default_rng(seed)
    lines = []
    dense = np.zeros((rows, cols))
    ys = np.zeros(rows)
    for r in range(rows):
        ys[r] = rng.choice([-1.0, 1.0])
        toks = [f"{ys[r]:g}"]
        for c in sorted(rng.choice(cols, size=rng.integers(1, 8), replace=False)):
            v = round(float(rng.standard_normal()), 6)
            dense[r, c] = v
            toks.append(f"{c + 1}:{v}")
        lines.append(" ".join(toks))
    path.write_text("\n".join(lines) + "\n")
    return dense, ys


@pytest.fixture(scope="module")
def native_available():
    if native.get_lib() is None:
        pytest.skip(f"native parser unavailable: {native.build_error()}")


def test_native_matches_python(tmp_path, native_available):
    p = tmp_path / "toy.libsvm"
    dense, ys = _write_toy(p)
    xp, yp = load_libsvm_dataset(p, engine="python")
    xn, yn = load_libsvm_dataset(p, engine="native")
    np.testing.assert_allclose(xn, xp)
    np.testing.assert_allclose(yn, yp)
    np.testing.assert_allclose(xp[:, : dense.shape[1]], dense[:, : xp.shape[1]])


def test_native_with_padding_and_labels(tmp_path, native_available):
    p = tmp_path / "toy2.libsvm"
    _write_toy(p, rows=37, cols=13, seed=1)
    xp, yp, mp_, np_ = load_libsvm_dataset(p, engine="python", pad_to=16, labels=(0.0, 1.0))
    xn, yn, mn, nn = load_libsvm_dataset(p, engine="native", pad_to=16, labels=(0.0, 1.0))
    assert (mp_, np_) == (mn, nn)
    np.testing.assert_allclose(xn, xp)
    np.testing.assert_allclose(yn, yp)
    assert set(np.unique(yn[:mn])) <= {0.0, 1.0}


def test_native_blank_lines(tmp_path, native_available):
    p = tmp_path / "blanks.libsvm"
    p.write_text("1 1:2.0\n\n-1 2:3.0\n   \n1 1:1.0 3:4.0\n")
    xp, yp = load_libsvm_dataset(p, engine="python")
    xn, yn = load_libsvm_dataset(p, engine="native")
    np.testing.assert_allclose(xn, xp)
    np.testing.assert_allclose(yn, yp)
    assert xn.shape == (3, 3)


def test_native_speedup(tmp_path, native_available):
    """The parallel native parser should beat the Python parser comfortably
    on a larger file (this is why it exists)."""
    import time

    p = tmp_path / "big.libsvm"
    _write_toy(p, rows=20_000, cols=100, seed=2)
    t0 = time.perf_counter()
    load_libsvm_dataset(p, engine="python")
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    load_libsvm_dataset(p, engine="native")
    t_native = time.perf_counter() - t0
    assert t_native < t_py  # typically 10-50x on real datasets
