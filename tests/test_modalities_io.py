"""Train/serve contract for the round-3 modalities (VERDICT r3 missing #2):

- gradient-enhanced multivariate emulators persist as snapshot v3 (text +
  npz) and serve through every dense path after a round trip;
- multi-fidelity emulators persist under their own grammar and serve;
- the CLI trains both from files (--gradients_file; MULTIFIDELITY model
  files) and serves them over the interactive_mode pipe;
- the sensitivity subcommand closes the last library-vs-CLI asymmetry.

SURVEY.md §1 layering note: "the snapshot file is the contract between
train-time and serve-time" — these tests pin that contract for the new
modalities.
"""

import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madaiemulator_tpu import (
    GPConfig,
    fit_multifidelity,
    fit_multivariate,
    predict_multifidelity,
    predict_multivariate,
    predict_multivariate_gradient,
)
from madaiemulator_tpu.io.modelfile import (
    is_multifidelity_model_file,
    read_multifidelity_model_file,
    write_model_file,
    write_multifidelity_model_file,
)
from madaiemulator_tpu.io.snapshot import (
    read_snapshot_auto,
    write_snapshot_auto,
)

CLI = [sys.executable, "-m", "madaiemulator_tpu.cli"]


# --- gradient-enhanced multivariate: fit + snapshot v3 ----------------------


def _grad_problem(rng, n=15):
    """d=2, t=2 with analytic gradients: f1 = sin(3 x0) + x1^2, f2 = x0 x1."""
    X = rng.uniform(0.5, 2.5, size=(n, 2))
    Y = np.stack([np.sin(3 * X[:, 0]) + X[:, 1] ** 2, X[:, 0] * X[:, 1]],
                 axis=1)
    dY = np.empty((n, 2, 2))
    dY[:, 0, 0] = 3 * np.cos(3 * X[:, 0])  # df1/dx0
    dY[:, 1, 0] = 2 * X[:, 1]              # df1/dx1
    dY[:, 0, 1] = X[:, 1]                  # df2/dx0
    dY[:, 1, 1] = X[:, 0]                  # df2/dx1
    return X, Y, dY


def _fit_grad_multivariate(rng):
    X, Y, dY = _grad_problem(rng)
    cfg = GPConfig(nparams=2, regression_order=1, n_restarts=2,
                   max_opt_steps=30)
    emu = fit_multivariate(
        jax.random.key(0), jnp.asarray(X), jnp.asarray(Y), cfg,
        pca_variance=0.999, gradients=jnp.asarray(dY),
    )
    return X, Y, dY, emu


def test_gradient_multivariate_fit_and_accuracy(rng):
    """Gradients flow through PCA projection into every component; the
    joint fit interpolates values AND reproduces gradients."""
    X, Y, dY, emu = _fit_grad_multivariate(rng)
    assert emu.dZ is not None and emu.dZ.shape == (15, 2, emu.n_components)
    m, v = predict_multivariate(emu, jnp.asarray(X))
    np.testing.assert_allclose(np.asarray(m), Y, atol=5e-3)
    gm, gv = predict_multivariate_gradient(emu, jnp.asarray(X))
    assert gm.shape == (15, 2, 2) and gv.shape == (15, 2, 2)
    # observed gradients are training data for the joint GP -> reproduced
    np.testing.assert_allclose(np.asarray(gm), dY, atol=0.05)
    assert bool(jnp.all(gv >= 0))


@pytest.mark.parametrize("ext", ["txt", "npz"])
def test_gradient_snapshot_v3_round_trip(rng, tmp_path, ext):
    """Snapshot v3 persists the gradient blocks; the reloaded emulator's
    values, variances AND gradient posteriors match exactly."""
    X, Y, dY, emu = _fit_grad_multivariate(rng)
    path = str(tmp_path / f"state.{ext}")
    write_snapshot_auto(path, emu, ["p0", "p1"], ["o0", "o1"])
    if ext == "txt":
        head = open(path).readline().split()
        assert head == ["MADAIEMULATOR_TPU_SNAPSHOT", "3"]
    emu2, pn, on = read_snapshot_auto(path)
    assert pn == ["p0", "p1"] and on == ["o0", "o1"]
    assert emu2.dZ is not None
    Xq = rng.uniform(0.6, 2.4, size=(9, 2))
    m1, v1 = predict_multivariate(emu, jnp.asarray(Xq))
    m2, v2 = predict_multivariate(emu2, jnp.asarray(Xq))
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-8,
                               atol=1e-14)
    g1, gv1 = predict_multivariate_gradient(emu, jnp.asarray(Xq))
    g2, gv2 = predict_multivariate_gradient(emu2, jnp.asarray(Xq))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-9,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(gv1), np.asarray(gv2), rtol=1e-8,
                               atol=1e-14)


def test_gradient_snapshot_rejects_stateless_load(rng, tmp_path):
    """build_states=False (matrix-free serving) has no joint operator —
    v3 snapshots must refuse it loudly, not serve garbage."""
    _, _, _, emu = _fit_grad_multivariate(rng)
    path = str(tmp_path / "state.txt")
    write_snapshot_auto(path, emu)
    with pytest.raises(ValueError, match="dense path"):
        read_snapshot_auto(path, build_states=False)


def test_gradient_noise_round_trip(rng, tmp_path):
    """dZ_noise (known gradient-noise variances) also persists in v3."""
    X, Y, dY = _grad_problem(rng)
    cfg = GPConfig(nparams=2, regression_order=0, n_restarts=2,
                   max_opt_steps=25)
    gn = np.full((15, 2, 2), 1e-4)
    emu = fit_multivariate(
        jax.random.key(1), jnp.asarray(X), jnp.asarray(Y), cfg,
        pca_variance=0.999, gradients=jnp.asarray(dY),
        gradient_noise=jnp.asarray(gn),
    )
    assert emu.dZ_noise is not None
    path = str(tmp_path / "state.txt")
    write_snapshot_auto(path, emu)
    emu2, _, _ = read_snapshot_auto(path)
    np.testing.assert_allclose(
        np.asarray(emu.dZ_noise), np.asarray(emu2.dZ_noise), rtol=1e-12
    )
    Xq = rng.uniform(0.6, 2.4, size=(5, 2))
    m1, _ = predict_multivariate(emu, jnp.asarray(Xq))
    m2, _ = predict_multivariate(emu2, jnp.asarray(Xq))
    # text stores thetas in NATURAL space: the exp/log round trip costs a
    # ulp that the near-interpolation conditioning amplifies to ~1e-9
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-7)


# --- multi-fidelity persistence ----------------------------------------------


def _mf_problem(rng):
    """Classic Forrester-style pair: cheap level biased + scaled."""
    def hi(x):
        return np.sin(8 * x[:, 0]) + x[:, 0]

    def lo(x):
        return 0.6 * hi(x) + 0.4 * x[:, 0] - 0.2

    X_lo = np.linspace(0.0, 1.0, 21)[:, None]
    X_hi = np.linspace(0.0, 1.0, 6)[:, None]  # nested
    return (
        [X_lo, X_hi],
        [lo(X_lo), hi(X_hi)],
        [lo(X_hi)],  # observed lower values at the high-fidelity design
    )


def _fit_mf(rng):
    designs, targets, lower = _mf_problem(rng)
    cfg = GPConfig(nparams=1, regression_order=1, n_restarts=3,
                   max_opt_steps=40)
    emu = fit_multifidelity(
        jax.random.key(2),
        [jnp.asarray(X) for X in designs],
        [jnp.asarray(y) for y in targets],
        cfg,
        lower_values=[jnp.asarray(lower[0])],
    )
    return designs, targets, emu


@pytest.mark.parametrize("ext", ["txt", "npz"])
def test_multifidelity_snapshot_round_trip(rng, tmp_path, ext):
    designs, targets, emu = _fit_mf(rng)
    path = str(tmp_path / f"state.{ext}")
    write_snapshot_auto(path, emu, param_names=["x"], output_names=["f"])
    emu2, pn, on = read_snapshot_auto(path)
    assert pn == ["x"] and on == ["f"]
    assert emu2.n_levels == 2
    np.testing.assert_allclose(
        float(np.asarray(emu.rho)[0]), float(np.asarray(emu2.rho)[0]),
        rtol=1e-12,
    )
    Xq = np.linspace(0.05, 0.95, 11)[:, None]
    m1, v1 = predict_multifidelity(emu, jnp.asarray(Xq))
    m2, v2 = predict_multifidelity(emu2, jnp.asarray(Xq))
    # thetas round-trip through natural space: one exp/log ulp
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-8,
                               atol=1e-14)
    # the reloaded emulator still beats a plausible tolerance on truth
    truth = np.sin(8 * Xq[:, 0]) + Xq[:, 0]
    assert float(np.max(np.abs(np.asarray(m2) - truth))) < 0.2


def test_multifidelity_model_file_round_trip(rng, tmp_path):
    designs, targets, lower = _mf_problem(rng)
    path = str(tmp_path / "model.mf")
    write_multifidelity_model_file(
        path, designs, targets, lower_values=lower,
        param_names=["x"], output_name="f",
    )
    assert is_multifidelity_model_file(path)
    mf = read_multifidelity_model_file(path)
    assert mf.nlevels == 2 and mf.nparams == 1
    assert mf.param_names == ["x"] and mf.output_name == "f"
    for k in range(2):
        np.testing.assert_array_equal(mf.designs[k], designs[k])
        np.testing.assert_array_equal(mf.targets[k], targets[k])
    np.testing.assert_array_equal(mf.lower_values[0], lower[0])
    # plain model files are not multi-fidelity
    plain = str(tmp_path / "model.txt")
    write_model_file(plain, designs[0], targets[0][:, None])
    assert not is_multifidelity_model_file(plain)


# --- CLI: train + pipe-serve both modalities ---------------------------------


def test_cli_gradient_train_and_serve(rng, tmp_path):
    """estimate_thetas --gradients_file trains a v3 snapshot; the pipe
    serves it; answers match the library on the same snapshot."""
    n = 12
    X = np.linspace(0.0, 1.0, n)[:, None]
    Y = np.sin(2 * np.pi * X)
    dY = 2 * np.pi * np.cos(2 * np.pi * X)  # (n, 1) = N*t*d values
    model = tmp_path / "model.txt"
    grads = tmp_path / "grads.txt"
    state = tmp_path / "state.txt"
    write_model_file(str(model), X, Y, ["x"], ["f"])
    with open(grads, "w") as f:
        for v in dY.ravel():
            f.write(f"{v:.17g}\n")
    r = subprocess.run(
        CLI + [
            "estimate_thetas", str(model), str(state),
            "--regression_order=1", "--restarts=2", "--steps=40",
            f"--gradients_file={grads}", "--quiet",
        ],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    assert open(state).readline().split()[1] == "3"
    # library predictions from the same snapshot
    emu, _, _ = read_snapshot_auto(str(state))
    Xq = np.array([[0.2], [0.55], [0.8]])
    m_lib, v_lib = predict_multivariate(emu, jnp.asarray(Xq))
    r = subprocess.run(
        CLI + ["interactive_mode", str(state)],
        input="0.2\n0.55\n0.8\n",
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    vals = [float(v) for v in r.stdout.splitlines()[5:]]
    means, variances = vals[0::2], vals[1::2]
    np.testing.assert_allclose(means, np.asarray(m_lib).ravel(), rtol=1e-8)
    np.testing.assert_allclose(
        variances, np.asarray(v_lib).ravel(), rtol=1e-6, atol=1e-12
    )
    # with only 12 points, gradient enhancement should interpolate sin well
    np.testing.assert_allclose(
        means, np.sin(2 * np.pi * Xq[:, 0]), atol=5e-3
    )
    # fast serving rejects the gradient snapshot with a clean error
    r = subprocess.run(
        CLI + ["interactive_mode", str(state), "--serve_method=fast"],
        input="0.5\n", capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 2 and "gradient" in r.stderr
    # iterative serving too
    r = subprocess.run(
        CLI + ["interactive_mode", str(state), "--serve_method=iterative"],
        input="0.5\n", capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 2 and "dense path" in r.stderr


def test_cli_gradient_rejects_bad_combinations(rng, tmp_path):
    model = tmp_path / "model.txt"
    grads = tmp_path / "grads.txt"
    X = np.linspace(0, 1, 8)[:, None]
    write_model_file(str(model), X, np.sin(X), ["x"], ["f"])
    with open(grads, "w") as f:
        f.write(" ".join(["0.0"] * 8))
    # iterative fit has no joint operator
    r = subprocess.run(
        CLI + [
            "estimate_thetas", str(model), str(tmp_path / "s.txt"),
            f"--gradients_file={grads}", "--fit_method=iterative", "--quiet",
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 2 and "joint" in r.stderr
    # matern32 is not twice differentiable
    r = subprocess.run(
        CLI + [
            "estimate_thetas", str(model), str(tmp_path / "s.txt"),
            f"--gradients_file={grads}", "--covariance_fn=matern32",
            "--quiet",
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 2 and "twice" in r.stderr
    # wrong value count
    with open(grads, "w") as f:
        f.write("0.0 1.0")
    r = subprocess.run(
        CLI + [
            "estimate_thetas", str(model), str(tmp_path / "s.txt"),
            f"--gradients_file={grads}", "--quiet",
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 2 and "expected" in r.stderr


def test_cli_multifidelity_train_serve_print(rng, tmp_path):
    """A MULTIFIDELITY model file routes estimate_thetas to co-kriging;
    interactive_mode serves the MF snapshot; print_thetas shows rho."""
    designs, targets, lower = _mf_problem(rng)
    model = tmp_path / "model.mf"
    state = tmp_path / "state.txt"
    write_multifidelity_model_file(
        str(model), designs, targets, lower_values=lower,
        param_names=["x"], output_name="f",
    )
    r = subprocess.run(
        CLI + [
            "estimate_thetas", str(model), str(state),
            "--regression_order=1", "--restarts=3", "--steps=40", "--quiet",
        ],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    assert open(state).readline().split()[0] == (
        "MADAIEMULATOR_TPU_SNAPSHOT_MF"
    )
    # print_thetas shows per-level thetas and rho
    r = subprocess.run(
        CLI + ["print_thetas", str(state)],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    rows = [l for l in r.stdout.splitlines() if l and not l.startswith("#")]
    assert len(rows) == 2 and "rho" in rows[1]
    # pipe serving matches the library on the reloaded snapshot
    emu, _, _ = read_snapshot_auto(str(state))
    Xq = np.array([[0.3], [0.7]])
    m_lib, v_lib = predict_multifidelity(emu, jnp.asarray(Xq))
    r = subprocess.run(
        CLI + ["interactive_mode", str(state)],
        input="0.3\n0.7\n",
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    lines = r.stdout.splitlines()
    assert lines[0] == "1" and lines[1] == "x" and lines[2] == "2"
    vals = [float(v) for v in lines[5:]]
    np.testing.assert_allclose(vals[0::2], np.asarray(m_lib), rtol=1e-8)
    np.testing.assert_allclose(
        vals[1::2], np.asarray(v_lib), rtol=1e-6, atol=1e-12
    )
    # calibrate runs against MF snapshots in-graph (recursive predict);
    # only the matrix-free route is rejected (levels are dense)
    exp = tmp_path / "exp.txt"
    exp.write_text("1\n0.5 0.01\n")
    out = tmp_path / "post.txt"
    r = subprocess.run(
        CLI + ["calibrate", str(state), str(exp), "--n_steps=40",
               "--n_walkers=16", f"--output={out}", "--quiet"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    draws = np.loadtxt(str(out), comments="#")
    assert draws.ndim == 1 and draws.size > 0
    assert np.all((draws >= 0.0) & (draws <= 1.0))
    r = subprocess.run(
        CLI + ["calibrate", str(state), str(exp), "--matrix_free",
               "--n_steps=10", "--quiet"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 2 and "multi-fidelity" in r.stderr


def test_cli_convert_handles_v3_and_mf(rng, tmp_path):
    """convert re-encodes v3 and MF snapshots text <-> npz losslessly."""
    _, _, _, emu = _fit_grad_multivariate(rng)
    t1 = str(tmp_path / "g.txt")
    write_snapshot_auto(t1, emu)
    t2 = str(tmp_path / "g.npz")
    r = subprocess.run(CLI + ["convert", t1, t2], capture_output=True,
                       text=True, timeout=600)
    assert r.returncode == 0, r.stderr
    e1, _, _ = read_snapshot_auto(t1)
    e2, _, _ = read_snapshot_auto(t2)
    Xq = rng.uniform(0.6, 2.4, size=(5, 2))
    m1, _ = predict_multivariate(e1, jnp.asarray(Xq))
    m2, _ = predict_multivariate(e2, jnp.asarray(Xq))
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-12)

    _, _, emu_mf = _fit_mf(rng)
    m1p = str(tmp_path / "mf.txt")
    write_snapshot_auto(m1p, emu_mf, param_names=["x"],
                        output_names=["f"])
    m2p = str(tmp_path / "mf.npz")
    r = subprocess.run(CLI + ["convert", m1p, m2p], capture_output=True,
                       text=True, timeout=600)
    assert r.returncode == 0, r.stderr
    ea, _, _ = read_snapshot_auto(m1p)
    eb, pn, on = read_snapshot_auto(m2p)
    assert pn == ["x"] and on == ["f"]
    Xq = np.linspace(0.1, 0.9, 7)[:, None]
    ma, _ = predict_multifidelity(ea, jnp.asarray(Xq))
    mb, _ = predict_multifidelity(eb, jnp.asarray(Xq))
    np.testing.assert_allclose(np.asarray(ma), np.asarray(mb), rtol=1e-12)


def test_cli_sensitivity_subcommand(rng, tmp_path):
    """sensitivity writes a Sobol table; the dominant parameter of an
    additive anisotropic function gets the dominant total index."""
    n = 40
    X = rng.uniform(size=(n, 2))
    # x0 drives ~25x the variance of x1
    Y = (np.sin(4 * X[:, 0]) + 0.2 * X[:, 1])[:, None]
    model = tmp_path / "model.txt"
    state = tmp_path / "state.txt"
    write_model_file(str(model), X, Y, ["a", "b"], ["f"])
    r = subprocess.run(
        CLI + [
            "estimate_thetas", str(model), str(state),
            "--regression_order=0", "--restarts=3", "--steps=40", "--quiet",
        ],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    out = tmp_path / "sobol.txt"
    eff = tmp_path / "effects.txt"
    r = subprocess.run(
        CLI + [
            "sensitivity", str(state), "--n=2048", "--quiet",
            f"--output={out}", f"--main_effects={eff}", "--grid=9",
            "--effects_n=512",
        ],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    rows = [
        l.split() for l in out.read_text().splitlines()
        if l and not l.startswith("#")
    ]
    assert [r_[0] for r_ in rows] == ["a", "b"]
    assert all(r_[1] == "f" for r_ in rows)
    tot = {r_[0]: float(r_[3]) for r_ in rows}
    assert tot["a"] > 5 * max(tot["b"], 1e-3)
    # main-effect file: grid rows x (1 + d*t) columns
    erows = [
        l.split() for l in eff.read_text().splitlines()
        if l and not l.startswith("#")
    ]
    assert len(erows) == 9 and all(len(r_) == 3 for r_ in erows)
    # the x0 curve has much larger swing than the x1 curve
    curves = np.asarray([[float(v) for v in r_[1:]] for r_ in erows])
    assert np.ptp(curves[:, 0]) > 3 * np.ptp(curves[:, 1])


def test_cli_multifidelity_rejects_unsupported_flags(rng, tmp_path):
    """Flags the MF route cannot honor (e.g. a single --noise_file cannot
    express per-level noise) must fail fast, never silently drop."""
    designs, targets, lower = _mf_problem(rng)
    model = tmp_path / "model.mf"
    write_multifidelity_model_file(
        str(model), designs, targets, lower_values=lower,
        param_names=["x"], output_name="f",
    )
    nf = tmp_path / "noise.txt"
    nf.write_text("0.01\n" * len(np.asarray(targets[0])))
    r = subprocess.run(
        CLI + ["estimate_thetas", str(model), str(tmp_path / "s.txt"),
               "--noise_file", str(nf), "--quiet"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 2 and "--noise_file" in r.stderr
    r = subprocess.run(
        CLI + ["estimate_thetas", str(model), str(tmp_path / "s.txt"),
               "--inducing=8", "--quiet"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 2 and "--inducing" in r.stderr


# --- CLI validate: multi-fidelity (per-level LOO) + sparse (residuals) ------


def test_cli_validate_multifidelity(rng, tmp_path):
    """validate on an MF snapshot prints one closed-form-LOO block per
    level and the per-point table covers every level's points."""
    _, _, emu = _fit_mf(rng)
    state = tmp_path / "mf.txt"
    write_snapshot_auto(str(state), emu, param_names=["x"],
                        output_names=["f"])
    table = tmp_path / "loo.txt"
    r = subprocess.run(
        CLI + ["validate", str(state), f"--output={table}"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    kv = dict(
        l.split() for l in r.stdout.splitlines()
        if l and not l.startswith("#")
    )
    for k in range(2):
        assert f"level{k}_rmse" in kv and f"level{k}_coverage" in kv
        assert np.isfinite(float(kv[f"level{k}_rmse"]))
    # level sizes: 21 low-fi + 6 high-fi rows in the table
    rows = [l for l in open(table) if not l.startswith("#")]
    assert len(rows) == 21 + 6
    assert {row.split()[0] for row in rows} == {"0", "1"}
    # unsupported flag combinations fail loudly
    r = subprocess.run(
        CLI + ["validate", str(state), "--holdout=3"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 2 and "multi-fidelity" in r.stderr


def test_cli_validate_sparse(rng, tmp_path):
    """validate on a sparse snapshot scores training residuals against
    --model_file truth; without truth (or with --holdout) it fails with
    an explanation."""
    from madaiemulator_tpu.models.sparse import fit_multivariate_sparse

    n = 150
    X = rng.uniform(1.0, 3.0, (n, 2))
    g1 = np.sin(2 * X[:, 0]) + X[:, 1]
    Y = np.stack([g1, X[:, 0] * X[:, 1]], axis=1)
    Y += 0.02 * rng.normal(size=Y.shape)
    cfg = GPConfig(nparams=2, regression_order=1)
    emu = fit_multivariate_sparse(
        jax.random.key(0), jnp.asarray(X), jnp.asarray(Y), cfg,
        pca_variance=0.999, inducing=30, n_restarts=2, max_steps=30,
    )
    state = tmp_path / "sgpr.txt"
    write_snapshot_auto(str(state), emu, param_names=["a", "b"],
                        output_names=["f1", "f2"])
    model = tmp_path / "model.txt"
    write_model_file(str(model), X, Y)
    table = tmp_path / "resid.txt"
    r = subprocess.run(
        CLI + ["validate", str(state), f"--model_file={model}",
               f"--output={table}"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    kv = dict(
        l.split() for l in r.stdout.splitlines()
        if l and not l.startswith("#")
    )
    assert int(float(kv["n"])) == n * 2
    # m=30 inducing over N=150 with 0.02 noise: smoothed but accurate
    assert float(kv["rmse"]) < 0.25, kv["rmse"]
    # Titsias variance is conservative -> coverage at or above target
    # (generous floor: small-sample noise)
    assert float(kv["coverage"]) > 0.80
    rows = [l for l in open(table) if not l.startswith("#")]
    assert len(rows) == n and len(rows[0].split()) == 6
    # truth is mandatory
    r = subprocess.run(
        CLI + ["validate", str(state)],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 2 and "--model_file" in r.stderr
    # holdout cannot apply to a stateless distillate
    r = subprocess.run(
        CLI + ["validate", str(state), "--holdout=10",
               f"--model_file={model}"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 2 and "sparse" in r.stderr.lower()


def test_cli_multivariate_multifidelity_end_to_end(rng, tmp_path):
    """A `noutputs` MULTIFIDELITY model file routes estimate_thetas to
    the multivariate MF fit (shared PCA basis, componentwise AR(1));
    the v2 snapshot serves through the pipe, prints per-component
    thetas/rho, validates per level, converts to npz, and runs
    sensitivity — the whole subcommand surface."""
    from madaiemulator_tpu.models.multifidelity import (
        predict_multivariate_multifidelity,
    )

    def hi_f(x):
        return (6 * x - 2) ** 2 * np.sin(12 * x - 4)

    def lo_f(x):
        return 0.5 * hi_f(x) + 10 * (x - 0.5) - 5

    def obs(f, x):
        b = f(x)
        return np.stack([b, 0.5 * b + 3 * x, -b + x ** 2], axis=1)

    x_lo = np.linspace(0, 1, 30)
    x_hi = np.linspace(0, 1, 8)
    model = tmp_path / "model_mv.mf"
    state = tmp_path / "state.txt"
    write_multifidelity_model_file(
        str(model), [x_lo[:, None], x_hi[:, None]],
        [obs(lo_f, x_lo), obs(hi_f, x_hi)],
        lower_values=[obs(lo_f, x_hi)],
        param_names=["x"], output_names=["a", "b", "c"],
    )
    r = subprocess.run(
        CLI + [
            "estimate_thetas", str(model), str(state),
            "--regression_order=1", "--restarts=3", "--steps=40",
            "--pca_variance=0.999", "--quiet",
        ],
        capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr
    head = open(state).readline().split()
    assert head[0] == "MADAIEMULATOR_TPU_SNAPSHOT_MF" and head[1] == "2"
    # print_thetas: per level x component rows; rho on level-1 rows
    r = subprocess.run(CLI + ["print_thetas", str(state)],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    rows = [l for l in r.stdout.splitlines() if l and not l.startswith("#")]
    emu, pn, on = read_snapshot_auto(str(state))
    assert pn == ["x"] and on == ["a", "b", "c"]
    assert len(rows) == 2 * emu.n_components
    assert all("rho" in l for l in rows if l.startswith("level 1"))
    # pipe serving matches the library: t means + t variances per query
    Xq = np.array([[0.3], [0.7]])
    m_lib, v_lib = predict_multivariate_multifidelity(emu, jnp.asarray(Xq))
    r = subprocess.run(
        CLI + ["interactive_mode", str(state)],
        input="0.3\n0.7\n", capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    lines = r.stdout.splitlines()
    assert lines[0] == "1" and lines[1] == "x" and lines[2] == "6"
    vals = np.array([float(v) for v in lines[9:]]).reshape(2, 6)
    np.testing.assert_allclose(vals[:, 0:3], np.asarray(m_lib), rtol=1e-8)
    np.testing.assert_allclose(vals[:, 3:6], np.asarray(v_lib), rtol=1e-6,
                               atol=1e-12)
    # validate: per-level observable-space LOO blocks
    r = subprocess.run(CLI + ["validate", str(state)],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr
    assert "level0_rmse" in r.stdout and "level1_rmse" in r.stdout
    # calibrate in-graph; matrix_free rejected
    exp = tmp_path / "exp.txt"
    y_exp = obs(hi_f, np.array([0.55]))[0]
    exp.write_text("3\n" + "\n".join(f"{v:.17g} 0.01" for v in y_exp) + "\n")
    r = subprocess.run(
        CLI + ["calibrate", str(state), str(exp), "--n_steps=40",
               "--n_walkers=16", "--quiet"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    r = subprocess.run(
        CLI + ["calibrate", str(state), str(exp), "--matrix_free",
               "--n_steps=10", "--quiet"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 2 and "multi-fidelity" in r.stderr
    # convert text -> npz losslessly
    npz = tmp_path / "state.npz"
    r = subprocess.run(CLI + ["convert", str(state), str(npz)],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr
    e2, _, on2 = read_snapshot_auto(str(npz))
    assert on2 == ["a", "b", "c"]
    m2, v2 = predict_multivariate_multifidelity(e2, jnp.asarray(Xq))
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m_lib),
                               rtol=1e-10)
    # sensitivity over the observable-space mean
    r = subprocess.run(
        CLI + ["sensitivity", str(state), "--n=64", "--output=-",
               "--quiet"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    body = [l for l in r.stdout.splitlines() if not l.startswith("#")]
    assert len(body) == 3  # 1 param x 3 observables
