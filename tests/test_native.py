"""Native C++ embedding API (EmuPlusPlus equivalent) vs the JAX path:
cross-implementation parity on the same snapshot file (SURVEY.md §2 "C++
predict API" row; §4b golden-parity strategy applied between our own two
implementations until the reference appears)."""

import shutil
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madaiemulator_tpu import native
from madaiemulator_tpu.io.snapshot import write_snapshot
from madaiemulator_tpu.models.multivariate import fit_multivariate, predict_multivariate
from madaiemulator_tpu.utils.config import CovarianceFamily, GPConfig

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="no C++ toolchain"
)


@pytest.fixture(scope="module")
def lib():
    assert native.available()
    return True


def trained(rng, cov=CovarianceFamily.POWER_EXPONENTIAL, order=1):
    X = rng.uniform(1.0, 3.0, size=(25, 2))  # deliberately unscaled
    Y = np.stack(
        [np.sin(2 * X[:, 0]) + X[:, 1], X[:, 0] * X[:, 1], X[:, 1] ** 2],
        axis=1,
    )
    cfg = GPConfig(
        nparams=2, covariance=cov, regression_order=order,
        n_restarts=2, max_opt_steps=30,
    )
    emu = fit_multivariate(
        jax.random.key(0), jnp.asarray(X), jnp.asarray(Y), cfg, pca_variance=0.999
    )
    return X, Y, emu


@pytest.mark.parametrize(
    "cov,order",
    [
        (CovarianceFamily.POWER_EXPONENTIAL, 1),
        (CovarianceFamily.POWER_EXPONENTIAL, 0),
        (CovarianceFamily.MATERN32, 2),
        (CovarianceFamily.MATERN52, 1),
        (CovarianceFamily.MATERN32_ARD, 1),
        (CovarianceFamily.MATERN52_ARD, 1),
    ],
)
def test_native_matches_jax_predictions(rng, tmp_path, lib, cov, order):
    X, Y, emu = trained(rng, cov=cov, order=order)
    state = str(tmp_path / "state.txt")
    write_snapshot(state, emu)
    ne = native.NativeEmulator(state)
    assert ne.nparams == 2 and ne.noutputs == 3
    Xq = rng.uniform(1.2, 2.8, size=(10, 2))
    mj, vj = predict_multivariate(emu, jnp.asarray(Xq))
    for i in range(10):
        mc, vc = ne.query(Xq[i])
        # two independent implementations, f64, different summation orders:
        # agreement well inside the 1e-6 parity contract
        np.testing.assert_allclose(mc, np.asarray(mj[i]), rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(vc, np.asarray(vj[i]), rtol=1e-6, atol=1e-9)


def test_native_matches_jax_with_noise(rng, tmp_path, lib):
    """Version-2 snapshot (per-point PC-space noise block): the C++
    Emulator bakes the noise into its covariance diagonal and stays in
    cross-implementation parity with the JAX path."""
    X = rng.uniform(1.0, 3.0, size=(25, 2))
    Y = np.stack(
        [np.sin(2 * X[:, 0]) + X[:, 1], X[:, 0] * X[:, 1], X[:, 1] ** 2],
        axis=1,
    )
    noise = 10.0 ** rng.uniform(-4, -1, size=25)
    cfg = GPConfig(nparams=2, regression_order=1, n_restarts=2,
                   max_opt_steps=30)
    emu = fit_multivariate(
        jax.random.key(0), jnp.asarray(X), jnp.asarray(Y), cfg,
        pca_variance=0.999, noise=jnp.asarray(noise),
    )
    state = str(tmp_path / "state.txt")
    write_snapshot(state, emu)
    with open(state) as f:
        assert f.readline().split()[-1] == "2"
    ne = native.NativeEmulator(state)
    Xq = rng.uniform(1.2, 2.8, size=(8, 2))
    mj, vj = predict_multivariate(emu, jnp.asarray(Xq))
    for i in range(8):
        mc, vc = ne.query(Xq[i])
        np.testing.assert_allclose(mc, np.asarray(mj[i]), rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(vc, np.asarray(vj[i]), rtol=1e-6, atol=1e-9)


def test_native_rejects_wrong_dimension(rng, tmp_path, lib):
    _, _, emu = trained(rng)
    state = str(tmp_path / "state.txt")
    write_snapshot(state, emu)
    ne = native.NativeEmulator(state)
    with pytest.raises(ValueError):
        ne.query(np.zeros(5))


def test_native_rejects_bad_file(tmp_path, lib):
    p = tmp_path / "bad.txt"
    p.write_text("garbage\n")
    with pytest.raises(RuntimeError, match="native load failed"):
        native.NativeEmulator(str(p))


@pytest.mark.parametrize(
    "cov,order,grad_noise",
    [
        (CovarianceFamily.POWER_EXPONENTIAL, 1, False),
        (CovarianceFamily.POWER_EXPONENTIAL, 2, True),
        (CovarianceFamily.MATERN52, 1, False),
        (CovarianceFamily.MATERN52_ARD, 0, True),
    ],
)
def test_native_matches_jax_v3_gradient_snapshot(
    rng, tmp_path, lib, cov, order, grad_noise
):
    """Version-3 snapshot (gradient-enhanced payload): the C++ Emulator
    rebuilds the joint (value, gradient) GLS system of models/gp.py
    training_gram/training_basis from the PC-space dZ blocks and stays in
    cross-implementation parity with the JAX serving path."""
    X = rng.uniform(0.0, 1.0, size=(12, 2))
    Y = np.stack(
        [np.sin(3 * X[:, 0]) + X[:, 1], X[:, 0] * X[:, 1]], axis=1
    )
    dY = np.stack(
        [
            np.stack([3 * np.cos(3 * X[:, 0]), np.ones(12)], axis=1),
            np.stack([X[:, 1], X[:, 0]], axis=1),
        ],
        axis=2,
    )  # (N, d, t)
    cfg = GPConfig(nparams=2, covariance=cov, regression_order=order,
                   n_restarts=2, max_opt_steps=25)
    kw = {}
    if grad_noise:
        kw["gradient_noise"] = jnp.asarray(
            10.0 ** rng.uniform(-4, -2, size=(12, 2, 2))
        )
    emu = fit_multivariate(
        jax.random.key(0), jnp.asarray(X), jnp.asarray(Y), cfg,
        pca_variance=0.999, gradients=jnp.asarray(dY), **kw,
    )
    state = str(tmp_path / "v3.txt")
    write_snapshot(state, emu)
    assert open(state).readline().split()[1] == "3"
    ne = native.NativeEmulator(state)
    Xq = rng.uniform(0.1, 0.9, size=(8, 2))
    mj, vj = predict_multivariate(emu, jnp.asarray(Xq))
    for i in range(8):
        mc, vc = ne.query(Xq[i])
        np.testing.assert_allclose(mc, np.asarray(mj[i]), rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(vc, np.asarray(vj[i]), rtol=1e-6, atol=1e-9)


def test_native_rejects_v3_gradient_with_nongrad_family(rng, tmp_path, lib):
    """A v3 snapshot whose covariance family has no twice-differentiable
    radial profile (e.g. Matérn-3/2) is malformed by construction — the
    reader must refuse loudly, matching ops/kernels.py
    _require_grad_family."""
    _, _, emu = trained(rng, cov=CovarianceFamily.MATERN32)
    state = str(tmp_path / "bad_v3.txt")
    write_snapshot(state, emu)
    # graft a v3 header with gradient flags onto a Matérn-3/2 snapshot
    lines = open(state).read().splitlines(keepends=True)
    lines[0] = lines[0].replace(" 1\n", " 3\n")
    lines.insert(6, "has_noise 0\nhas_gradients 1\nhas_gradient_noise 0\n")
    open(state, "w").writelines(lines)
    with pytest.raises(RuntimeError, match="native load failed"):
        native.NativeEmulator(state)


def _trained_mf(rng, levels=2, noise=False, cov=CovarianceFamily.POWER_EXPONENTIAL):
    from madaiemulator_tpu.models.multifidelity import fit_multifidelity

    def f_lo(x):
        return 0.5 * (6 * x - 2) ** 2 * np.sin(12 * x - 4) + 10 * (x - 0.5) - 5

    def f_hi(x):
        return (6 * x - 2) ** 2 * np.sin(12 * x - 4)

    x_lo = np.linspace(0, 1, 21)
    x_hi = np.array([0.0, 0.4, 0.6, 1.0])
    cfg = GPConfig(nparams=1, covariance=cov, regression_order=1,
                   n_restarts=3, max_opt_steps=40)
    designs = [x_lo[:, None], x_hi[:, None]]
    targets = [f_lo(x_lo), f_hi(x_hi)]
    lower = [f_lo(x_hi)]
    nz = None
    if noise:
        nz = [10.0 ** rng.uniform(-4, -2, size=21), None]
    if levels == 3:
        x_mid = np.linspace(0, 1, 9)
        designs = [x_lo[:, None], x_mid[:, None], x_hi[:, None]]
        targets = [f_lo(x_lo), 0.7 * f_hi(x_mid) + 1.0, f_hi(x_hi)]
        lower = [f_lo(x_mid), 0.7 * f_hi(x_hi) + 1.0]
        nz = None
    return fit_multifidelity(
        jax.random.key(0), designs, targets, cfg,
        lower_values=lower, noise=nz,
    )


@pytest.mark.parametrize(
    "levels,noise,cov",
    [
        (2, False, CovarianceFamily.POWER_EXPONENTIAL),
        (2, True, CovarianceFamily.POWER_EXPONENTIAL),
        (3, False, CovarianceFamily.MATERN52),
    ],
)
def test_native_matches_jax_multifidelity(rng, tmp_path, lib, levels, noise, cov):
    """Multi-fidelity snapshots serve through the SAME C ABI: the native
    MultiFidelityEmulator rebuilds every level's GLS state and recurses
    mean/variance exactly as models/multifidelity.py _predict_recursive."""
    from madaiemulator_tpu.io.snapshot import write_snapshot_multifidelity
    from madaiemulator_tpu.models.multifidelity import predict_multifidelity

    emu = _trained_mf(rng, levels=levels, noise=noise, cov=cov)
    state = str(tmp_path / "mf.txt")
    write_snapshot_multifidelity(state, emu, ["x"], "y")
    ne = native.NativeEmulator(state)
    assert ne.nparams == 1 and ne.noutputs == 1
    xq = np.linspace(0.05, 0.95, 9)
    mj, vj = predict_multifidelity(emu, xq[:, None])
    for i in range(9):
        mc, vc = ne.query(xq[i: i + 1])
        np.testing.assert_allclose(mc[0], float(mj[i]), rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(vc[0], float(vj[i]), rtol=1e-6, atol=1e-10)


def test_native_pipe_binary_serves_multifidelity(rng, tmp_path, lib):
    """madai_query dispatches on the MF magic token and speaks the same
    pipe protocol over a multi-fidelity snapshot."""
    from madaiemulator_tpu.io.snapshot import write_snapshot_multifidelity
    from madaiemulator_tpu.models.multifidelity import predict_multifidelity

    emu = _trained_mf(rng)
    state = str(tmp_path / "mf.txt")
    write_snapshot_multifidelity(state, emu, ["x"], "y")
    native.build()
    r = subprocess.run(
        [str(native._NATIVE_DIR / "build" / "madai_query"), state],
        input="0.25\n0.75\n", capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr
    lines = r.stdout.strip().splitlines()
    # header: d, names, 2t, output labels
    assert lines[0] == "1" and lines[1] == "x"
    assert lines[2] == "2" and lines[3] == "mean_y" and lines[4] == "variance_y"
    vals = [float(v) for v in lines[5:]]
    assert len(vals) == 4
    mj, vj = predict_multifidelity(emu, np.array([[0.25], [0.75]]))
    np.testing.assert_allclose(vals[0], float(mj[0]), rtol=1e-7)
    np.testing.assert_allclose(vals[2], float(mj[1]), rtol=1e-7)
    np.testing.assert_allclose(vals[1], float(vj[0]), rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(vals[3], float(vj[1]), rtol=1e-6, atol=1e-10)


@pytest.mark.parametrize(
    "cov,order",
    [
        (CovarianceFamily.POWER_EXPONENTIAL, 1),
        (CovarianceFamily.MATERN52, 0),
    ],
)
def test_native_matches_jax_sparse_snapshot(rng, tmp_path, lib, cov, order):
    """Sparse (SGPR) snapshots serve through the same C ABI: the native
    SparseEmulator consumes the stored O(m^2) state directly and matches
    models/sparse.predict_multivariate_sparse."""
    from madaiemulator_tpu.io.snapshot import write_snapshot_sparse
    from madaiemulator_tpu.models import sparse as msparse

    X = rng.uniform(1.0, 3.0, (200, 2))
    g1 = np.sin(2 * X[:, 0]) + X[:, 1]
    g2 = X[:, 0] * X[:, 1]
    Y = np.stack([g1, g2, g1 - g2], axis=1)
    cfg = GPConfig(nparams=2, covariance=cov, regression_order=order,
                   n_restarts=2, max_opt_steps=25)
    emu = msparse.fit_multivariate_sparse(
        jax.random.key(0), jnp.asarray(X), jnp.asarray(Y), cfg,
        pca_variance=0.999, inducing=25, n_restarts=2, max_steps=25,
    )
    state = str(tmp_path / "sgpr.txt")
    write_snapshot_sparse(state, emu, ["a", "b"], ["o0", "o1", "o2"])
    assert open(state).readline().split()[0] == (
        "MADAIEMULATOR_TPU_SNAPSHOT_SGPR"
    )
    ne = native.NativeEmulator(state)
    assert ne.nparams == 2 and ne.noutputs == 3
    Xq = rng.uniform(1.2, 2.8, (10, 2))
    mj, vj = msparse.predict_multivariate_sparse(emu, jnp.asarray(Xq))
    for i in range(10):
        mc, vc = ne.query(Xq[i])
        np.testing.assert_allclose(mc, np.asarray(mj[i]), rtol=1e-8,
                                   atol=1e-10)
        np.testing.assert_allclose(vc, np.asarray(vj[i]), rtol=1e-7,
                                   atol=1e-11)


def test_native_pipe_binary_matches_python_cli(rng, tmp_path, lib):
    """The C++ madai_query binary speaks the same pipe protocol as the
    Python interactive_mode."""
    X, Y, emu = trained(rng)
    state = str(tmp_path / "state.txt")
    write_snapshot(state, emu, ["a", "b"], ["o0", "o1", "o2"])
    q = "1.5 2.0\n2.5 1.1\n"
    native.build()
    r_cpp = subprocess.run(
        [str(native._NATIVE_DIR / "build" / "madai_query"), state],
        input=q, capture_output=True, text=True, timeout=120,
    )
    assert r_cpp.returncode == 0, r_cpp.stderr
    import sys

    r_py = subprocess.run(
        [sys.executable, "-m", "madaiemulator_tpu.cli", "interactive_mode", state],
        input=q, capture_output=True, text=True, timeout=300,
    )
    assert r_py.returncode == 0, r_py.stderr
    cpp_lines = r_cpp.stdout.splitlines()
    py_lines = r_py.stdout.splitlines()
    # identical headers
    hdr = 1 + 2 + 1 + 6  # d, param names, 2t, labels
    assert cpp_lines[:hdr] == py_lines[:hdr]
    a = np.asarray([float(v) for v in cpp_lines[hdr:]])
    b = np.asarray([float(v) for v in py_lines[hdr:]])
    np.testing.assert_allclose(a, b, rtol=1e-7, atol=1e-9)


@pytest.mark.parametrize("noise", [False, True])
def test_native_matches_jax_mv_multifidelity(rng, tmp_path, lib, noise):
    """MULTIVARIATE multi-fidelity (MF grammar v2) snapshots serve through
    the same C ABI: the native emulator rebuilds every (level, component)
    GLS state, recurses componentwise, and applies the shared-PCA
    rotation exactly as the JAX path."""
    from madaiemulator_tpu.io.snapshot import write_snapshot_multifidelity_mv
    from madaiemulator_tpu.models.multifidelity import (
        fit_multivariate_multifidelity,
        predict_multivariate_multifidelity,
    )

    def f_hi(x):
        return (6 * x - 2) ** 2 * np.sin(12 * x - 4)

    def f_lo(x):
        return 0.5 * f_hi(x) + 10 * (x - 0.5) - 5

    def obs(f, x):
        b = f(x)
        return np.stack([b, 0.5 * b + 3 * x, -b + x ** 2], axis=1)

    x_lo = np.linspace(0, 1, 25)
    x_hi = np.linspace(0, 1, 7)
    cfg = GPConfig(nparams=1, regression_order=1, n_restarts=3,
                   max_opt_steps=40)
    nz = [10.0 ** rng.uniform(-5, -3, size=25), None] if noise else None
    emu = fit_multivariate_multifidelity(
        jax.random.key(0), [x_lo[:, None], x_hi[:, None]],
        [obs(f_lo, x_lo), obs(f_hi, x_hi)], cfg, pca_variance=0.999,
        lower_values=[obs(f_lo, x_hi)], noise=nz,
    )
    state = str(tmp_path / "mvmf.txt")
    write_snapshot_multifidelity_mv(state, emu, ["x"], ["a", "b", "c"])
    ne = native.NativeEmulator(state)
    assert ne.nparams == 1 and ne.noutputs == 3
    xq = np.linspace(0.05, 0.95, 9)
    mj, vj = predict_multivariate_multifidelity(emu, xq[:, None])
    for i in range(9):
        mc, vc = ne.query(xq[i: i + 1])
        np.testing.assert_allclose(mc, np.asarray(mj[i]), rtol=1e-7,
                                   atol=1e-9)
        np.testing.assert_allclose(vc, np.asarray(vj[i]), rtol=1e-6,
                                   atol=1e-10)
    # and through the pipe binary: 2t labeled columns
    native.build()
    r = subprocess.run(
        [str(native._NATIVE_DIR / "build" / "madai_query"), state],
        input="0.25\n", capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr
    lines = r.stdout.strip().splitlines()
    assert lines[0] == "1" and lines[2] == "6"
    assert lines[3] == "mean_a" and lines[6] == "variance_a"
    vals = np.array([float(v) for v in lines[9:]])
    mq, vq = predict_multivariate_multifidelity(emu, np.array([[0.25]]))
    np.testing.assert_allclose(vals[:3], np.asarray(mq[0]), rtol=1e-7)
    np.testing.assert_allclose(vals[3:], np.asarray(vq[0]), rtol=1e-6,
                               atol=1e-10)
