"""Contract tests for the R binding layer (r/EmuRbind.R).

R is not installed in this image, so the shim itself cannot execute here;
these tests pin from Python the EXACT protocol EmuRbind.R drives:
  * reticulate layer: compat.call_estimate / call_emulate_at_list accept the
    plain-matrix/vector marshalling reticulate produces and return arrays
    convertible with as.numeric();
  * pipe layer: the interactive server emits the header line-by-line the way
    madaiOpenEmulator's readLines(n=...) consumes it, and answers a batched
    multi-point write with m*2t numbers, one per line, in point order.
Ref: src/libRbind/rbind.c callEstimate/callEmulateAtList + EmuRbind.R
(mount empty — SURVEY.md §0); SURVEY.md §3.4.
"""

import pathlib
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

from madaiemulator_tpu.compat import call_emulate_at_list, call_estimate

REPO = pathlib.Path(__file__).parent.parent
CLI = [sys.executable, "-m", "madaiemulator_tpu.cli"]


def test_rbind_shim_exists_with_upstream_names():
    src = (REPO / "r" / "EmuRbind.R").read_text()
    for name in (
        "callEstimate",
        "callEmulateAtList",
        "madaiOpenEmulator",
        "madaiQuery",
        "madaiCloseEmulator",
    ):
        assert f"{name} <- function" in src, name


def test_compat_layer_r_marshalling_roundtrip():
    """Exactly what reticulate sends: R matrix -> 2D float64 ndarray,
    R numeric -> 1D float64; returns must be plain ndarrays."""
    design = np.linspace(0, 1, 25, dtype=np.float64)[:, None]
    y = np.sin(2 * np.pi * design[:, 0])
    thetas = call_estimate(design, y, n_restarts=2, max_steps=40)
    assert isinstance(thetas, np.ndarray) and thetas.ndim == 1
    assert thetas.shape[0] == 3  # amp, nugget, 1 length scale
    pts = np.linspace(0.02, 0.98, 50, dtype=np.float64)[:, None]
    means, variances = call_emulate_at_list(design, y, thetas, pts)
    assert means.shape == (50,) and variances.shape == (50,)
    assert np.all(variances >= 0)
    rmse = float(np.sqrt(np.mean((means - np.sin(2 * np.pi * pts[:, 0])) ** 2)))
    assert rmse < 5e-3, rmse


def test_pipe_protocol_matches_r_client_reads(tmp_path):
    """Drive the server exactly as madaiQuery does: one batched write of m
    points, then read exactly m*2t lines; header parsed line-by-line."""
    from madaiemulator_tpu.io.modelfile import write_model_file

    model, state = tmp_path / "model.txt", tmp_path / "state.txt"
    X = np.linspace(0, 1, 25)[:, None]
    write_model_file(str(model), X, np.sin(2 * np.pi * X), ["x"], ["f"])
    r = subprocess.run(
        CLI + ["estimate_thetas", str(model), str(state), "--restarts=2",
               "--steps=40", "--quiet"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr

    qs = np.asarray([0.2, 0.4, 0.6, 0.8])
    batch = "\n".join(f"{q:.10g}" for q in qs) + "\n"
    r = subprocess.run(
        CLI + ["interactive_mode", str(state)],
        input=batch, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    lines = r.stdout.splitlines()
    # madaiOpenEmulator reads: n=1 (nparams) -> n=nparams names ->
    # n=1 (2*noutputs) -> n=2*noutputs labels
    nparams = int(lines[0])
    assert nparams == 1
    names = lines[1 : 1 + nparams]
    assert names == ["x"]
    nvals = int(lines[1 + nparams])
    assert nvals == 2
    labels = lines[2 + nparams : 2 + nparams + nvals]
    assert labels == ["mean_f", "variance_f"]
    body = lines[2 + nparams + nvals :]
    # madaiQuery reads exactly m * 2t value lines, one number per line
    assert len(body) == len(qs) * nvals
    vals = np.asarray([float(v) for v in body]).reshape(len(qs), nvals)
    np.testing.assert_allclose(
        vals[:, 0], np.sin(2 * np.pi * qs), atol=5e-3
    )
    assert np.all(vals[:, 1] >= 0)
