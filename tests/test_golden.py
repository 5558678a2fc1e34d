"""Data-driven golden parity harness (SURVEY.md §4b; BASELINE north-star:
posterior mean/variance parity at 1e-6 rtol on shipped test problems).

Reads tests/golden/<case>/{state.txt,queries.txt,expected.txt}, predicts
through BOTH implementations (JAX f64 and the native C++ emulator), and
checks 1e-6 rtol. Fixtures are currently self-generated (reference mount
empty — SURVEY.md §0; see tools/make_goldens.py); reference-produced
state/expected files drop in with no code change.
"""

import pathlib
import shutil

import jax.numpy as jnp
import numpy as np
import pytest

from madaiemulator_tpu.io.snapshot import read_snapshot
from madaiemulator_tpu.models.multivariate import predict_multivariate

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"
CASES = sorted(p.name for p in GOLDEN_DIR.iterdir() if p.is_dir()) if GOLDEN_DIR.exists() else []

RTOL = 1e-6


def load_case(name):
    d = GOLDEN_DIR / name
    queries = np.loadtxt(d / "queries.txt", ndmin=2)
    expected = np.loadtxt(d / "expected.txt", ndmin=2)
    return d, queries, expected


@pytest.mark.skipif(not CASES, reason="no golden fixtures generated")
@pytest.mark.parametrize("case", CASES)
def test_jax_path_matches_golden(case):
    d, queries, expected = load_case(case)
    emu, _, _ = read_snapshot(str(d / "state.txt"))
    t = emu.n_outputs
    mean, var = predict_multivariate(emu, jnp.asarray(queries))
    scale = max(1.0, float(np.abs(expected[:, :t]).max()))
    np.testing.assert_allclose(
        np.asarray(mean), expected[:, :t], rtol=RTOL, atol=RTOL * scale
    )
    np.testing.assert_allclose(
        np.asarray(var), expected[:, t:], rtol=RTOL, atol=1e-12
    )


@pytest.mark.skipif(not CASES, reason="no golden fixtures generated")
@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")
@pytest.mark.parametrize("case", CASES)
def test_native_path_matches_golden(case):
    from madaiemulator_tpu import native

    d, queries, expected = load_case(case)
    ne = native.NativeEmulator(str(d / "state.txt"))
    t = ne.noutputs
    scale = max(1.0, float(np.abs(expected[:, :t]).max()))
    for i in range(queries.shape[0]):
        m, v = ne.query(queries[i])
        np.testing.assert_allclose(
            m, expected[i, :t], rtol=RTOL, atol=RTOL * scale
        )
        np.testing.assert_allclose(v, expected[i, t:], rtol=RTOL, atol=1e-12)
