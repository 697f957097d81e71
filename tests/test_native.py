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


def test_native_jsonl_sink_matches_python(tmp_path):
    """The C++ JSONL sink writes byte-identical rows to the Python writer
    (shortest-round-trip float formatting, same key order/projection)."""
    import json

    import jax.numpy as jnp
    import numpy as np

    import adaprox_tpu as ap
    from adaprox_tpu import native
    from adaprox_tpu.models.objectives import LeastSquares
    from adaprox_tpu.models.synthetic import random_lasso
    from adaprox_tpu.utils import logging as tlog

    if native.get_sink_lib() is None:
        import pytest

        pytest.skip(f"native sink unavailable: {native._sink_error}")

    prob = random_lasso(m=32, n=64, pfactor=8, seed=1)
    f = LeastSquares(a=jnp.asarray(prob.a), b=jnp.asarray(prob.b))
    lf = float(np.linalg.norm(prob.a, 2) ** 2)
    res = ap.adaptive_proxgrad(
        jnp.zeros(64), f=f, g=ap.L1Norm(lam=1.0),
        rule=ap.AdaPGMRule(gamma=1 / lf), tol=1e-9, maxit=120, history=True)

    p_native = tmp_path / "native.jsonl"
    p_python = tmp_path / "python.jsonl"
    n, last = tlog.write_records_jsonl(p_native, res.records, "AdaPGM")
    rows = tlog.records_to_rows(res.records, "AdaPGM")
    tlog.write_jsonl(p_python, rows)
    assert n == len(rows)

    nat = p_native.read_text().splitlines()
    py = p_python.read_text().splitlines()
    assert len(nat) == len(py)
    for a_line, b_line in zip(nat, py):
        assert json.loads(a_line) == json.loads(b_line)
    # and the echo row matches the final python row
    assert last == rows[-1]

    # projected keys (the dual_svm/sqrt-lasso pattern), appending
    keys = ["method", "it", "f_evals", "norm_res"]
    tlog.write_records_jsonl(p_native, res.records, "AdaPGM", keys=keys)
    projected = tlog.read_jsonl(p_native)[len(rows):]
    assert list(projected[0].keys()) == keys
    assert len(projected) == len(rows)


def test_native_jsonl_sink_speed(tmp_path):
    """Native sink should beat the per-row Python writer (informational;
    asserts only that it is not slower than 2x python)."""
    import time

    import numpy as np

    from adaprox_tpu import native
    from adaprox_tpu.solvers.common import Records
    from adaprox_tpu.utils import logging as tlog

    if native.get_sink_lib() is None:
        import pytest

        pytest.skip("native sink unavailable")

    n = 200_000
    rng = np.random.default_rng(0)
    recs = Records(
        it=np.arange(1, n + 1, dtype=np.int32),
        gamma=rng.random(n), sigma=np.zeros(n), norm_res=rng.random(n),
        objective=rng.random(n),
        f_evals=np.arange(n, dtype=np.int32),
        grad_f_evals=np.arange(n, dtype=np.int32),
        prox_g_evals=np.arange(n, dtype=np.int32),
        prox_h_evals=np.zeros(n, np.int32),
        A_evals=np.zeros(n, np.int32), At_evals=np.zeros(n, np.int32),
        valid=np.ones(n, bool),
    )
    t0 = time.perf_counter()
    tlog.write_records_jsonl(tmp_path / "n.jsonl", recs, "m")
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    tlog.write_jsonl(tmp_path / "p.jsonl", tlog.records_to_rows(recs, "m"))
    t_python = time.perf_counter() - t0
    print(f"native {t_native:.3f}s python {t_python:.3f}s "
          f"({t_python / t_native:.1f}x)")
    assert t_native < 2 * t_python


def test_native_jsonl_sink_inf_and_echo_projection(tmp_path):
    """Infinity must round-trip like json.dumps ('Infinity'), and the echo
    row must keep 'it' even when the file projection drops it (the console
    log-spaced predicate reads it)."""
    import json
    import math

    import numpy as np

    from adaprox_tpu import native
    from adaprox_tpu.solvers.common import Records
    from adaprox_tpu.utils import logging as tlog

    if native.get_sink_lib() is None:
        import pytest

        pytest.skip("native sink unavailable")

    n = 4
    recs = Records(
        it=np.arange(1, n + 1, dtype=np.int32),
        gamma=np.asarray([1.0, np.inf, -np.inf, np.nan]),
        sigma=np.zeros(n), norm_res=np.ones(n), objective=np.ones(n),
        f_evals=np.ones(n, np.int32), grad_f_evals=np.ones(n, np.int32),
        prox_g_evals=np.ones(n, np.int32), prox_h_evals=np.zeros(n, np.int32),
        A_evals=np.zeros(n, np.int32), At_evals=np.zeros(n, np.int32),
        valid=np.ones(n, bool),
    )
    path = tmp_path / "inf.jsonl"
    tlog.write_records_jsonl(path, recs, "m")
    rows = tlog.read_jsonl(path)  # json.loads must accept every line
    assert rows[1]["gamma"] == math.inf
    assert rows[2]["gamma"] == -math.inf
    assert math.isnan(rows[3]["gamma"])

    # projected keys without 'it': file drops it, echo row keeps it
    path2 = tmp_path / "proj.jsonl"
    nrows, last = tlog.write_records_jsonl(
        path2, recs, "m", keys=["method", "norm_res"])
    assert "it" not in tlog.read_jsonl(path2)[0]
    assert last["it"] == n  # echo predicate has what it needs


def test_native_no_trailing_newline(tmp_path, native_available):
    """A file ending mid-token at EOF must parse (NUL-terminated heap-copy
    path) and match the Python parser — an unbounded strtod on the mmap
    could read past the mapping (review finding)."""
    p = tmp_path / "notrail.libsvm"
    p.write_bytes(b"+1 1:0.5 3:2.25\n-1 2:1.5")  # no trailing '\n'
    xp, yp = load_libsvm_dataset(p, engine="python")
    xn, yn = load_libsvm_dataset(p, engine="native")
    np.testing.assert_allclose(xn, xp)
    np.testing.assert_allclose(yn, yp)


def test_native_truncated_value_rejected(tmp_path, native_available):
    """'3:' at end of line must be a parse ERROR, not silently consume the
    next line's label as the value (review finding). The native parser
    returns None -> engine='auto' falls back -> Python raises too."""
    p = tmp_path / "trunc.libsvm"
    p.write_text("+1 3:\n-1 2:5\n")
    assert native.parse_libsvm_dense(p) is None
    with pytest.raises(ValueError):
        load_libsvm_dataset(p, engine="python")


def test_zero_index_rejected_both_engines(tmp_path, native_available):
    """LIBSVM indices are 1-based: index 0 must raise in the Python parser
    (it used to write column -1 = the LAST column) and be rejected by the
    native one."""
    p = tmp_path / "zeroidx.libsvm"
    p.write_text("+1 0:2.5 2:1.0\n")
    assert native.parse_libsvm_dense(p) is None
    with pytest.raises(ValueError, match="1-based"):
        load_libsvm_dataset(p, engine="python")
