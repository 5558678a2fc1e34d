"""Model-file / snapshot round-trips and the CLI pipe protocol
(SURVEY.md §3.1/§3.2, §5 checkpoint/resume)."""

import io
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madaiemulator_tpu.io.modelfile import read_model_file, write_model_file
from madaiemulator_tpu.io.snapshot import read_snapshot, write_snapshot
from madaiemulator_tpu.models.multivariate import fit_multivariate, predict_multivariate
from madaiemulator_tpu.utils.config import GPConfig


def test_model_file_round_trip(rng, tmp_path):
    X = rng.uniform(size=(12, 3))
    Y = rng.standard_normal((12, 2))
    path = str(tmp_path / "model.txt")
    write_model_file(path, X, Y, ["a", "b", "c"], ["o1", "o2"])
    mf = read_model_file(path)
    assert mf.param_names == ["a", "b", "c"]
    assert mf.output_names == ["o1", "o2"]
    assert np.array_equal(mf.X, X)
    assert np.array_equal(mf.Y, Y)


def test_model_file_comments_and_errors():
    good = "1\nx\n1\ny\n2\n0.0\n1.0\n# comment\n3.0 4.0\n"
    mf = read_model_file(io.StringIO(good))
    assert mf.npoints == 2 and np.allclose(mf.Y[:, 0], [3.0, 4.0])
    with pytest.raises(ValueError):
        read_model_file(io.StringIO("1\nx\n1\ny\n3\n0 1 2\n"))  # truncated
    with pytest.raises(ValueError):
        read_model_file(io.StringIO("0\n"))  # bad nparams


def fit_small(rng, seed=0):
    X = rng.uniform(size=(20, 2))
    Y = np.stack([np.sin(3 * X[:, 0]), X[:, 1] ** 2 + X[:, 0]], axis=1)
    cfg = GPConfig(nparams=2, regression_order=1, n_restarts=2, max_opt_steps=30)
    emu = fit_multivariate(
        jax.random.key(seed), jnp.asarray(X), jnp.asarray(Y), cfg, pca_variance=0.999
    )
    return X, Y, emu


def test_snapshot_round_trip(rng, tmp_path):
    X, Y, emu = fit_small(rng)
    path = str(tmp_path / "state.txt")
    write_snapshot(path, emu, ["p0", "p1"], ["m0", "m1"])
    emu2, pn, on = read_snapshot(path)
    assert pn == ["p0", "p1"] and on == ["m0", "m1"]
    Xq = rng.uniform(0.1, 0.9, size=(7, 2))
    m1, v1 = predict_multivariate(emu, jnp.asarray(Xq))
    m2, v2 = predict_multivariate(emu2, jnp.asarray(Xq))
    # text format stores %.17g => exact f64 round-trip
    assert np.allclose(np.asarray(m1), np.asarray(m2), rtol=1e-12, atol=1e-14)
    assert np.allclose(np.asarray(v1), np.asarray(v2), rtol=1e-10, atol=1e-14)


def test_npz_snapshot_round_trip(rng, tmp_path):
    from madaiemulator_tpu.io.snapshot import read_snapshot_npz, write_snapshot_npz

    X, Y, emu = fit_small(rng, seed=3)
    path = str(tmp_path / "state.npz")
    write_snapshot_npz(path, emu, ["p0", "p1"], ["m0", "m1"])
    emu2, pn, on = read_snapshot_npz(path)
    assert pn == ["p0", "p1"] and on == ["m0", "m1"]
    Xq = rng.uniform(0.1, 0.9, size=(5, 2))
    m1, v1 = predict_multivariate(emu, jnp.asarray(Xq))
    m2, v2 = predict_multivariate(emu2, jnp.asarray(Xq))
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-10)


def test_latin_hypercube_design():
    import jax

    from madaiemulator_tpu.utils.designs import latin_hypercube

    X = np.asarray(latin_hypercube(jax.random.key(0), 50, 3))
    assert X.shape == (50, 3)
    assert X.min() >= 0 and X.max() <= 1
    # one point per stratum in every dimension
    for k in range(3):
        strata = np.floor(X[:, k] * 50).astype(int)
        assert len(np.unique(strata)) == 50


def test_snapshot_rejects_garbage(tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("NOT_A_SNAPSHOT 1\n")
    with pytest.raises(ValueError):
        read_snapshot(str(p))


CLI = [sys.executable, "-m", "madaiemulator_tpu.cli"]


def _make_model_file(path, rng):
    X = np.linspace(0, 1, 25)[:, None]
    Y = np.sin(2 * np.pi * X)
    write_model_file(str(path), X, Y, ["x"], ["f"])
    return X, Y


def test_cli_end_to_end_pipe_protocol(rng, tmp_path):
    model = tmp_path / "model.txt"
    state = tmp_path / "state.txt"
    X, Y = _make_model_file(model, rng)
    r = subprocess.run(
        CLI
        + [
            "estimate_thetas",
            str(model),
            str(state),
            "--regression_order=1",
            "--restarts=2",
            "--steps=40",
            "--quiet",
        ],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr
    assert state.exists()

    # print_thetas
    r = subprocess.run(
        CLI + ["print_thetas", str(state)], capture_output=True, text=True, timeout=300
    )
    assert r.returncode == 0, r.stderr
    rows = [l for l in r.stdout.splitlines() if l and not l.startswith("#")]
    assert len(rows) == 1 and len(rows[0].split()) == 3  # amp nugget ls

    # interactive_mode pipe: query 3 points
    queries = "0.25\n0.5 0.75\n"
    r = subprocess.run(
        CLI + ["interactive_mode", str(state)],
        input=queries,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r.returncode == 0, r.stderr
    lines = r.stdout.splitlines()
    # header: d, names, 2t, labels
    assert lines[0] == "1" and lines[1] == "x" and lines[2] == "2"
    assert lines[3] == "mean_f" and lines[4] == "variance_f"
    vals = [float(v) for v in lines[5:]]
    assert len(vals) == 6  # 3 queries x (mean, var)
    means = vals[0::2]
    for q, m in zip([0.25, 0.5, 0.75], means):
        assert abs(m - np.sin(2 * np.pi * q)) < 5e-3, (q, m)
    assert all(v >= 0 for v in vals[1::2])


def test_cli_interactive_mode_batches_piped_points(rng, tmp_path):
    """Throughput path (VERDICT r1 weak #6): many points piped at once must
    be answered correctly and in order (they are drained and predicted as
    batched calls rather than one dispatch per point)."""
    model = tmp_path / "model.txt"
    state = tmp_path / "state.txt"
    _make_model_file(model, rng)
    r = subprocess.run(
        CLI + ["estimate_thetas", str(model), str(state), "--restarts=2",
               "--steps=40", "--quiet"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    qs = np.linspace(0.01, 0.99, 300)
    queries = "\n".join(f"{q:.10g}" for q in qs) + "\n"
    r = subprocess.run(
        CLI + ["interactive_mode", str(state)],
        input=queries, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    vals = [float(v) for v in r.stdout.splitlines()[5:]]
    assert len(vals) == 2 * len(qs)
    means = np.asarray(vals[0::2])
    variances = np.asarray(vals[1::2])
    assert np.all(variances >= 0)
    # order preserved: predictions must track sin at each query in sequence
    err = np.abs(means - np.sin(2 * np.pi * qs))
    assert err.max() < 2e-2, err.max()


def test_cli_iterative_fit_and_serve(rng, tmp_path):
    """--fit_method=iterative writes the standard snapshot;
    --serve_method=iterative answers the pipe protocol without dense
    factorizations, agreeing with the dense serve path."""
    model = tmp_path / "model.txt"
    state = tmp_path / "state.txt"
    _make_model_file(model, rng)
    r = subprocess.run(
        CLI
        + [
            "estimate_thetas", str(model), str(state),
            "--regression_order=1", "--restarts=2", "--steps=25",
            "--fit_method=iterative", "--rank=25", "--probes=25",
            "--lanczos_iters=25", "--cg_tol=1e-10", "--quiet",
        ],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    queries = "0.3\n0.7\n"
    outs = {}
    for method in ("dense", "iterative"):
        r = subprocess.run(
            CLI + ["interactive_mode", str(state), f"--serve_method={method}",
                   "--cg_tol=1e-10"],
            input=queries, capture_output=True, text=True, timeout=600,
        )
        assert r.returncode == 0, r.stderr
        outs[method] = np.asarray(
            [float(t) for t in r.stdout.split()[-4:]]
        )  # 2 queries x (mean, var)
    # atol covers near-zero interpolation variances (both paths report
    # O(1e-8) at training-adjacent queries; signs of numerical zero differ)
    np.testing.assert_allclose(
        outs["iterative"], outs["dense"], rtol=1e-5, atol=1e-7
    )
    # PCG-free serving variance (--variance_method=precond): the MEANS are
    # exact (cached-alpha GEMMs, no PCG involved); the variances are the
    # Woodbury approximation — at this noiseless fit's tiny nugget the
    # pivoted Cholesky hits the kernel's numerical rank and the
    # approximation saturates at ~1e-4 (the documented small-nugget
    # clamping caveat), so only sanity-bound them
    r = subprocess.run(
        CLI + ["interactive_mode", str(state), "--serve_method=iterative",
               "--cg_tol=1e-10", "--rank=25", "--variance_method=precond",
               "--query_chunk=1"],
        input=queries, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    vals = np.asarray([float(t) for t in r.stdout.split()[-4:]])
    np.testing.assert_allclose(
        vals[0::2], outs["dense"][0::2], rtol=1e-6, atol=1e-9
    )
    assert np.all(vals[1::2] >= 0) and np.all(vals[1::2] < 1e-2)


def test_cli_noise_file_end_to_end(rng, tmp_path):
    """--noise_file: known per-point observation noise flows through the
    CLI fit into a version-2 snapshot, and a corrupted-but-known-noisy
    training point does not drag the served predictions."""
    model = tmp_path / "model.txt"
    X = np.linspace(0, 1, 25)[:, None]
    f = np.sin(2 * np.pi * X[:, 0])
    Y = f.copy()
    j = 12
    Y[j] += 5.0
    write_model_file(str(model), X, Y[:, None], ["x"], ["f"])
    noise = np.full(25, 1e-10)
    noise[j] = 1e4
    nf = tmp_path / "noise.txt"
    np.savetxt(nf, noise)
    state = tmp_path / "state.txt"
    r = subprocess.run(
        CLI + [
            "estimate_thetas", str(model), str(state),
            "--restarts=2", "--steps=25", "--quiet",
            f"--noise_file={nf}",
        ],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    assert state.read_text().splitlines()[0].endswith(" 2")  # v2 snapshot
    # serve at the corrupted location: must recover sin, not sin + 5
    q = " ".join(str(v) for v in X[j]) + "\n"
    r = subprocess.run(
        CLI + ["interactive_mode", str(state)],
        input=q, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    vals = [float(v) for v in r.stdout.split()[-2:]]  # mean, variance
    assert abs(vals[0] - f[j]) < 0.1, vals
    # wrong-size noise file is a clean usage error
    np.savetxt(nf, noise[:7])
    r = subprocess.run(
        CLI + [
            "estimate_thetas", str(model), str(state), "--quiet",
            f"--noise_file={nf}",
        ],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 2 and "expected N=" in r.stderr


def test_cli_large_n_flags_end_to_end(rng, tmp_path):
    """VERDICT r2 weak #9: the large-N recipes must be reachable from the
    CLI — numerics backends (--cholesky_method/--gram_method/
    --update_precision/--linesearch), --restart_chunk on the dense path,
    and --checkpoint_path + --logdet_method on the iterative path."""
    model = tmp_path / "model.txt"
    _make_model_file(model, rng)

    # dense with backend selection + restart chunking
    state_d = tmp_path / "state_dense.txt"
    r = subprocess.run(
        CLI + [
            "estimate_thetas", str(model), str(state_d),
            "--restarts=2", "--steps=25", "--quiet",
            "--cholesky_method=left", "--update_precision=auto",
            "--linesearch=backtracking", "--restart_chunk=1",
        ],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    assert state_d.exists()

    # iterative with mbcg + checkpointing: the per-component checkpoint
    # file must be created, and a re-run must resume from it (fast, same
    # result file)
    state_i = tmp_path / "state_iter.txt"
    ckpt = tmp_path / "fit.ckpt"
    args = CLI + [
        "estimate_thetas", str(model), str(state_i),
        "--restarts=2", "--steps=20", "--quiet",
        "--fit_method=iterative", "--rank=25", "--probes=25",
        "--lanczos_iters=25", "--cg_tol=1e-10",
        "--logdet_method=mbcg", f"--checkpoint_path={ckpt}",
    ]
    r = subprocess.run(args, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "fit.ckpt.c0").exists()
    first = state_i.read_text()
    r = subprocess.run(args, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr
    assert state_i.read_text() == first  # resumed at the converged state

    # both states serve the pipe protocol and agree near training data
    for state in (state_d, state_i):
        r = subprocess.run(
            CLI + ["interactive_mode", str(state)],
            input="0.25\n", capture_output=True, text=True, timeout=600,
        )
        assert r.returncode == 0, r.stderr
        mean = float(r.stdout.split()[-2])
        assert abs(mean - np.sin(2 * np.pi * 0.25)) < 2e-2, mean


def test_cli_alpha_grid_flag(rng, tmp_path):
    """--alpha_grid profiles the power exponent; the snapshot records the
    winning alpha and serving honors it; malformed grids error cleanly."""
    model = tmp_path / "model.txt"
    state = tmp_path / "state.txt"
    _make_model_file(model, rng)
    r = subprocess.run(
        CLI + [
            "estimate_thetas", str(model), str(state),
            "--restarts=2", "--steps=25", "--quiet",
            "--alpha_grid=1.5,2.0",
        ],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    txt = state.read_text()
    alpha = [
        l.split()[1] for l in txt.splitlines()
        if l.startswith("power_exp_alpha")
    ][0]
    assert float(alpha) in (1.5, 2.0)
    r = subprocess.run(
        CLI + ["interactive_mode", str(state)],
        input="0.25\n", capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    mean = float(r.stdout.split()[-2])
    assert abs(mean - np.sin(2 * np.pi * 0.25)) < 2e-2, mean
    r = subprocess.run(
        CLI + ["estimate_thetas", str(model), str(state),
               "--alpha_grid=1.5,banana", "--quiet"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 2 and "alpha_grid" in r.stderr


def test_cli_npz_state_file(rng, tmp_path):
    """state files ending in .npz use the binary format end to end."""
    model = tmp_path / "model.txt"
    state = tmp_path / "state.npz"
    _make_model_file(model, rng)
    r = subprocess.run(
        CLI + ["estimate_thetas", str(model), str(state), "--restarts=2",
               "--steps=30", "--quiet"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    import numpy as _np

    _np.load(state)  # actually npz
    r = subprocess.run(
        CLI + ["interactive_mode", str(state)],
        input="0.5\n", capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    vals = [float(v) for v in r.stdout.splitlines()[5:]]
    assert abs(vals[0] - np.sin(np.pi)) < 5e-3


def test_cli_unknown_covariance_errors(rng, tmp_path):
    model = tmp_path / "model.txt"
    _make_model_file(model, rng)
    r = subprocess.run(
        CLI
        + ["estimate_thetas", str(model), str(tmp_path / "s.txt"), "--covariance_fn=bogus"],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r.returncode == 2
    assert "covariance_fn" in r.stderr


def _fit_mv_cli(tmp_path, rng):
    """Fit a 3-observable emulator through the CLI; returns paths + data."""
    model = tmp_path / "model.txt"
    state = tmp_path / "state.txt"
    X = rng.uniform(0.0, 2.0, size=(40, 2))
    Y = np.stack(
        [
            np.sin(X[:, 0]) * np.cos(X[:, 1]),
            X[:, 0] + X[:, 1] ** 2,
            np.exp(-X[:, 0]) + 0.5 * X[:, 1],
        ],
        axis=1,
    )
    write_model_file(str(model), X, Y, ["a", "b"], ["o1", "o2", "o3"])
    r = subprocess.run(
        CLI + ["estimate_thetas", str(model), str(state),
               "--regression_order=1", "--restarts=2", "--steps=30",
               "--pca_variance=0.999", "--quiet"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    return model, state, X, Y


def test_cli_validate(rng, tmp_path):
    """`validate` prints the LOO calibration summary; --model_file scores
    against raw outputs; --output writes the per-point table."""
    model, state, X, Y = _fit_mv_cli(tmp_path, rng)
    r = subprocess.run(
        CLI + ["validate", str(state)],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    got = dict(
        l.split() for l in r.stdout.splitlines() if l and not l.startswith("#")
    )
    for k in ("n", "rmse", "coverage", "standardized_std",
              "log_pseudo_likelihood"):
        assert k in got, (k, r.stdout)
    assert int(float(got["n"])) == X.shape[0] * Y.shape[1]
    assert float(got["rmse"]) < 0.5  # smooth 40-pt problem: LOO tracks truth
    assert "GP error only" in r.stdout

    table = tmp_path / "loo.txt"
    r = subprocess.run(
        CLI + ["validate", str(state), f"--model_file={model}",
               f"--output={table}", "--interval=0.9"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    assert "truncation" in r.stdout
    got2 = dict(
        l.split() for l in r.stdout.splitlines() if l and not l.startswith("#")
    )
    assert float(got2["coverage_target"]) == 0.9
    lines = table.read_text().splitlines()
    assert lines[0].startswith("# per-point LOO: loo_mean_o1")
    rows = [l.split() for l in lines[1:]]
    assert len(rows) == X.shape[0] and len(rows[0]) == 3 * Y.shape[1]
    lv = np.asarray([[float(v) for v in row] for row in rows])
    assert np.all(lv[:, 3:6] >= 0)  # LOO variances
    # the truth columns are the raw Y when --model_file is given
    np.testing.assert_allclose(lv[:, 6:9], Y, rtol=1e-12)


def test_cli_design_variance_and_nroy(rng, tmp_path):
    """`design` proposes natural-space batches; nroy needs an experiment
    file and reports the viable pool fraction."""
    from madaiemulator_tpu.io.experiment import write_experiment_file

    model, state, X, Y = _fit_mv_cli(tmp_path, rng)
    r = subprocess.run(
        CLI + ["design", str(state), "--n_new=4", "--pool_size=512"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    assert "active-variance" in r.stderr
    lines = r.stdout.splitlines()
    assert lines[0] == "# proposed runs: a b"
    pts = np.asarray([[float(v) for v in l.split()] for l in lines[1:]])
    assert pts.shape == (4, 2)
    # natural space: inside the training design's bounding box
    assert np.all(pts >= X.min(axis=0) - 1e-9)
    assert np.all(pts <= X.max(axis=0) + 1e-9)
    # distinct points
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    assert d2.min() > 1e-12

    # nroy without observations is a clean usage error
    r = subprocess.run(
        CLI + ["design", str(state), "--method=nroy"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 2
    assert "experiment_file" in r.stderr and "Traceback" not in r.stderr

    exp = tmp_path / "exp.txt"
    theta_true = np.array([1.0, 0.8])
    y_exp = np.array(
        [
            np.sin(theta_true[0]) * np.cos(theta_true[1]),
            theta_true[0] + theta_true[1] ** 2,
            np.exp(-theta_true[0]) + 0.5 * theta_true[1],
        ]
    )
    write_experiment_file(str(exp), y_exp, np.full(3, 0.05**2))
    out = tmp_path / "wave.txt"
    r = subprocess.run(
        CLI + ["design", str(state), "--method=nroy",
               f"--experiment_file={exp}", "--n_new=6", "--pool_size=1024",
               f"--output={out}"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    assert "NROY wave" in r.stderr and "%" in r.stderr
    lines = out.read_text().splitlines()
    pts = np.asarray([[float(v) for v in l.split()] for l in lines[1:]])
    assert pts.shape == (6, 2)
    assert np.all(pts >= X.min(axis=0) - 1e-9)
    assert np.all(pts <= X.max(axis=0) + 1e-9)


def test_cli_convert_round_trip(rng, tmp_path):
    """convert re-encodes text <-> npz exactly (text stores %.17g, so the
    text -> npz -> text round trip is byte-identical) and the converted
    snapshot serves identical predictions."""
    model = tmp_path / "model.txt"
    state = tmp_path / "state.txt"
    _make_model_file(model, rng)
    r = subprocess.run(
        CLI + ["estimate_thetas", str(model), str(state), "--restarts=2",
               "--steps=30", "--quiet"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    npz = tmp_path / "state.npz"
    back = tmp_path / "state2.txt"
    for src, dst in ((state, npz), (npz, back)):
        r = subprocess.run(
            CLI + ["convert", str(src), str(dst)],
            capture_output=True, text=True, timeout=300,
        )
        assert r.returncode == 0, r.stderr
        assert "wrote" in r.stderr
    assert state.read_text() == back.read_text()
    out = []
    for s in (state, npz):
        r = subprocess.run(
            CLI + ["interactive_mode", str(s)],
            input="0.3\n", capture_output=True, text=True, timeout=300,
        )
        assert r.returncode == 0, r.stderr
        out.append(r.stdout.splitlines()[5:])
    assert out[0] == out[1]


def test_cli_validate_design_matrix_free(rng, tmp_path):
    """--matrix_free routes validate (--holdout) and design through the
    iterative path end to end on an iterative-fit .npz snapshot."""
    model = tmp_path / "model.txt"
    state = tmp_path / "state.npz"
    X = rng.uniform(0.0, 2.0, size=(40, 2))
    Y = np.stack(
        [np.sin(X[:, 0]) * np.cos(X[:, 1]), X[:, 0] + X[:, 1] ** 2], axis=1
    )
    write_model_file(str(model), X, Y, ["a", "b"], ["o1", "o2"])
    r = subprocess.run(
        CLI + ["estimate_thetas", str(model), str(state),
               "--fit_method=iterative", "--regression_order=1",
               "--restarts=2", "--steps=25", "--pca_variance=0.999",
               "--rank=16", "--quiet"],
        capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr
    r = subprocess.run(
        CLI + ["validate", str(state), "--matrix_free", "--holdout=8",
               "--rank=16"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    assert "holdout(8) validation" in r.stdout
    got = dict(
        l.split() for l in r.stdout.splitlines() if l and not l.startswith("#")
    )
    assert int(float(got["n"])) == 8 * 2
    assert float(got["rmse"]) < 0.5
    # LOO without --holdout under --matrix_free is a clean usage error
    r = subprocess.run(
        CLI + ["validate", str(state), "--matrix_free"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 2 and "--holdout" in r.stderr
    r = subprocess.run(
        CLI + ["design", str(state), "--matrix_free", "--n_new=3",
               "--pool_size=128", "--rank=16"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    pts = np.asarray(
        [[float(v) for v in l.split()]
         for l in r.stdout.splitlines() if not l.startswith("#")]
    )
    assert pts.shape == (3, 2)
    assert np.all(pts >= X.min(axis=0) - 1e-9)
    assert np.all(pts <= X.max(axis=0) + 1e-9)
    # in-graph calibration through the matrix-free serving cache
    from madaiemulator_tpu.io.experiment import write_experiment_file

    exp = tmp_path / "exp.txt"
    th = np.array([1.0, 0.8])
    write_experiment_file(
        str(exp),
        [np.sin(th[0]) * np.cos(th[1]), th[0] + th[1] ** 2],
        np.full(2, 0.05**2),
    )
    r = subprocess.run(
        CLI + ["calibrate", str(state), str(exp), "--matrix_free",
               "--rank=16", "--n_walkers=12", "--n_steps=200",
               "--burn_in=80", "--output=-"],
        capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr
    assert "acceptance" in r.stderr
    draws = np.asarray(
        [[float(v) for v in l.split()]
         for l in r.stdout.splitlines() if not l.startswith("#")]
    )
    assert draws.shape == (120 * 12, 2)
    assert np.all(np.abs(draws.mean(axis=0) - th) < 0.3), draws.mean(axis=0)
