"""Trained-emulator snapshot (state file): the train-time/serve-time contract.

Equivalent of the reference's dump/load of the trained multi_modelstruct
(ref: src/multi_modelstruct.c dump_multi_modelstruct /
load_multi_modelstruct, consumed by interactive_mode, EmuPlusPlus and the R
bindings — SURVEY.md §5 "checkpoint/resume"). The reference's exact text
grammar could not be lifted this round (mount empty — SURVEY.md §0), so the
format below is versioned and explicit; a reader for the upstream grammar
slots in next to it once golden files exist.

Layout (text; '#' comments allowed between sections; all floats "%.17g" so
f64 round-trips exactly):

    MADAIEMULATOR_TPU_SNAPSHOT 1
    covariance <power_exponential|matern32|matern52>
    power_exp_alpha <float>
    regression_order <int>
    predict_variance_includes_nugget <0|1>
    pca_standardize <0|1>
    nparams <d> ; noutputs <t> ; npoints <N> ; ncomponents <r>
    param/output names, design scaling, PCA state (ymean, ystd,
    eigenvalues, U), scaled design X, PC scores Z, per-component thetas
    in the reference's natural layout [amp, nugget, length_scales...].
"""

from __future__ import annotations

from typing import List, TextIO, Tuple, Union

import jax.numpy as jnp
import numpy as np

from madaiemulator_tpu.models.gp import GPPosteriorState
from madaiemulator_tpu.models.multivariate import (
    MultivariateEmulator,
    PCAState,
    _vmapped_states,
)
from madaiemulator_tpu.ops.kernels import GPParams
from madaiemulator_tpu.utils.config import COVARIANCE_CLI_NAMES, GPConfig
from madaiemulator_tpu.utils.designs import DesignScaling

MAGIC = "MADAIEMULATOR_TPU_SNAPSHOT"
VERSION = 1
# version 2 = version 1 + a trailing per-point PC-space observation-noise
# block (n x r); written ONLY when the emulator carries noise, so
# noise-free snapshots stay byte-compatible with every version-1 reader
# (incl. the native C++ Emulator and the pipe servers).
VERSION_NOISE = 2


def _fmt_vec(v) -> str:
    return " ".join(f"{float(x):.17g}" for x in np.asarray(v).ravel())


def _fmt_mat(M) -> str:
    return "\n".join(
        " ".join(f"{float(x):.17g}" for x in row) for row in np.asarray(M)
    )


def _derived_standardize(emu: MultivariateEmulator) -> bool:
    """The pca_standardize flag, derived from the trained state itself.

    fit_multivariate(standardize=False) stores ystd = ones, so the flag is
    recoverable exactly; deriving it (instead of trusting a caller-supplied
    argument) keeps the snapshot honest. Readers apply ystd directly and
    only carry the flag as metadata.
    """
    ystd = np.asarray(emu.pca.ystd)
    return bool(np.any(ystd != 1.0))


def write_snapshot(
    dest: Union[str, TextIO],
    emu: MultivariateEmulator,
    param_names: List[str] | None = None,
    output_names: List[str] | None = None,
) -> None:
    if isinstance(dest, str):
        with open(dest, "w") as f:
            write_snapshot(f, emu, param_names, output_names)
            return
    pca_standardize = _derived_standardize(emu)
    d = emu.X.shape[1]
    t = emu.n_outputs
    n = emu.X.shape[0]
    r = emu.n_components
    cfg = emu.config
    param_names = list(param_names or [f"param_{i}" for i in range(d)])
    output_names = list(output_names or [f"output_{i}" for i in range(t)])
    thetas = np.concatenate(
        [
            np.exp(np.asarray(emu.params.log_amp))[:, None],
            np.exp(np.asarray(emu.params.log_nugget))[:, None],
            np.exp(np.asarray(emu.params.log_ls)),
        ],
        axis=1,
    )  # (r, ntheta), natural space, reference layout
    w = dest.write
    version = VERSION if emu.noise is None else VERSION_NOISE
    w(f"{MAGIC} {version}\n")
    w(f"covariance {cfg.covariance.value}\n")
    w(f"power_exp_alpha {cfg.power_exp_alpha:.17g}\n")
    w(f"regression_order {cfg.regression_order}\n")
    w(f"predict_variance_includes_nugget {int(cfg.predict_variance_includes_nugget)}\n")
    w(f"pca_standardize {int(pca_standardize)}\n")
    w(f"nparams {d}\nnoutputs {t}\nnpoints {n}\nncomponents {r}\n")
    for s in param_names:
        w(f"{s}\n")
    for s in output_names:
        w(f"{s}\n")
    w("# design scaling (mins; ranges)\n")
    w(_fmt_vec(emu.scaling.mins) + "\n")
    w(_fmt_vec(emu.scaling.ranges) + "\n")
    w("# pca: ymean; ystd; eigenvalues; U (t x r)\n")
    w(_fmt_vec(emu.pca.ymean) + "\n")
    w(_fmt_vec(emu.pca.ystd) + "\n")
    w(_fmt_vec(emu.pca.eigenvalues) + "\n")
    w(_fmt_mat(emu.pca.U) + "\n")
    w("# scaled design X (n x d)\n")
    w(_fmt_mat(emu.X) + "\n")
    w("# pc scores Z (n x r)\n")
    w(_fmt_mat(emu.Z) + "\n")
    w("# thetas per component (r x ntheta) [amp nugget ls...]\n")
    w(_fmt_mat(thetas) + "\n")
    if emu.noise is not None:
        w("# per-point PC-space observation-noise variances (n x r)\n")
        w(_fmt_mat(emu.noise) + "\n")


def write_snapshot_npz(
    dest: str,
    emu: MultivariateEmulator,
    param_names: List[str] | None = None,
    output_names: List[str] | None = None,
) -> None:
    """Binary snapshot (numpy .npz): same payload as the text format, ~10-50x
    faster to parse at large N (SURVEY.md §5: 'native format for speed').
    The text format stays the compatibility surface; this is the fast path.
    """
    d = emu.X.shape[1]
    t = emu.n_outputs
    cfg = emu.config
    pca_standardize = _derived_standardize(emu)
    extra = (
        {} if emu.noise is None else {"noise_pc": np.asarray(emu.noise)}
    )
    np.savez_compressed(
        dest,
        magic=np.array([MAGIC]),
        version=np.array([VERSION if emu.noise is None else VERSION_NOISE]),
        covariance=np.array([cfg.covariance.value]),
        power_exp_alpha=np.array([cfg.power_exp_alpha]),
        regression_order=np.array([cfg.regression_order]),
        predict_variance_includes_nugget=np.array(
            [int(cfg.predict_variance_includes_nugget)]
        ),
        pca_standardize=np.array([int(pca_standardize)]),
        param_names=np.array(
            list(param_names or [f"param_{i}" for i in range(d)])
        ),
        output_names=np.array(
            list(output_names or [f"output_{i}" for i in range(t)])
        ),
        mins=np.asarray(emu.scaling.mins),
        ranges=np.asarray(emu.scaling.ranges),
        ymean=np.asarray(emu.pca.ymean),
        ystd=np.asarray(emu.pca.ystd),
        eigenvalues=np.asarray(emu.pca.eigenvalues),
        U=np.asarray(emu.pca.U),
        X=np.asarray(emu.X),
        Z=np.asarray(emu.Z),
        log_amp=np.asarray(emu.params.log_amp),
        log_nugget=np.asarray(emu.params.log_nugget),
        log_ls=np.asarray(emu.params.log_ls),
        **extra,
    )


def read_snapshot_npz(
    source: str, dtype=jnp.float64, build_states: bool = True
) -> Tuple[MultivariateEmulator, List[str], List[str]]:
    """build_states=False skips the dense per-component factorizations and
    returns an IterativeMultivariateEmulator (matrix-free serving — the
    only option when N^2 per component exceeds HBM)."""
    z = np.load(source, allow_pickle=False)
    if str(z["magic"][0]) != MAGIC or int(z["version"][0]) not in (
        VERSION, VERSION_NOISE,
    ):
        raise ValueError("not a compatible npz snapshot")
    cfg = GPConfig(
        nparams=int(z["X"].shape[1]),
        covariance=COVARIANCE_CLI_NAMES[str(z["covariance"][0])],
        regression_order=int(z["regression_order"][0]),
        power_exp_alpha=float(z["power_exp_alpha"][0]),
        predict_variance_includes_nugget=bool(
            int(z["predict_variance_includes_nugget"][0])
        ),
    )
    params = GPParams(
        log_amp=jnp.asarray(z["log_amp"], dtype=dtype),
        log_nugget=jnp.asarray(z["log_nugget"], dtype=dtype),
        log_ls=jnp.asarray(z["log_ls"], dtype=dtype),
    )
    Xj = jnp.asarray(z["X"], dtype=dtype)
    Zj = jnp.asarray(z["Z"], dtype=dtype)
    scaling = DesignScaling(
        mins=jnp.asarray(z["mins"], dtype=dtype),
        ranges=jnp.asarray(z["ranges"], dtype=dtype),
    )
    pca = PCAState(
        ymean=jnp.asarray(z["ymean"], dtype=dtype),
        ystd=jnp.asarray(z["ystd"], dtype=dtype),
        eigenvalues=jnp.asarray(z["eigenvalues"], dtype=dtype),
        U=jnp.asarray(z["U"], dtype=dtype),
    )
    noisej = (
        jnp.asarray(z["noise_pc"], dtype=dtype) if "noise_pc" in z else None
    )
    if build_states:
        emu = MultivariateEmulator(
            scaling=scaling, X=Xj, Z=Zj, pca=pca, params=params,
            states=_vmapped_states(params, Xj, Zj, cfg, noise_pc=noisej),
            config=cfg, noise=noisej,
        )
    else:
        from madaiemulator_tpu.models.multivariate import (
            IterativeMultivariateEmulator,
        )

        emu = IterativeMultivariateEmulator(
            scaling=scaling, X=Xj, Z=Zj, pca=pca, params=params, config=cfg,
            noise=noisej,
        )
    return emu, list(map(str, z["param_names"])), list(map(str, z["output_names"]))


def write_snapshot_auto(dest: str, *args, **kwargs) -> None:
    """Dispatch on extension: '.npz' -> binary, else text."""
    writer = write_snapshot_npz if dest.endswith(".npz") else write_snapshot
    writer(dest, *args, **kwargs)


def read_snapshot_auto(source: str, dtype=jnp.float64, build_states: bool = True):
    """Dispatch on extension: '.npz' -> binary, else text."""
    reader = read_snapshot_npz if source.endswith(".npz") else read_snapshot
    return reader(source, dtype=dtype, build_states=build_states)


def _tokens(stream: TextIO):
    for line in stream:
        body = line.split("#", 1)[0]
        for tok in body.split():
            yield tok


def read_snapshot(
    source: Union[str, TextIO], dtype=jnp.float64, build_states: bool = True
) -> Tuple[MultivariateEmulator, List[str], List[str]]:
    """Load a snapshot; recomputes the per-component posterior factorizations
    (the serve-time precompute of SURVEY.md §3.2). Returns
    (emulator, param_names, output_names). build_states=False returns an
    IterativeMultivariateEmulator instead (matrix-free serving, no N^2)."""
    if isinstance(source, str):
        with open(source, "r") as f:
            return read_snapshot(f, dtype=dtype, build_states=build_states)
    toks = _tokens(source)

    def tok() -> str:
        try:
            return next(toks)
        except StopIteration:
            raise ValueError("snapshot ended early") from None

    def expect(name: str) -> str:
        got = tok()
        if got != name:
            raise ValueError(f"snapshot: expected {name!r}, got {got!r}")
        return tok()

    if tok() != MAGIC:
        raise ValueError("not a madaiemulator_tpu snapshot")
    version = int(tok())
    if version not in (VERSION, VERSION_NOISE):
        raise ValueError(f"unsupported snapshot version {version}")
    cov = COVARIANCE_CLI_NAMES[expect("covariance")]
    alpha = float(expect("power_exp_alpha"))
    order = int(expect("regression_order"))
    pred_nug = bool(int(expect("predict_variance_includes_nugget")))
    _pca_std = bool(int(expect("pca_standardize")))
    d = int(expect("nparams"))
    t = int(expect("noutputs"))
    n = int(expect("npoints"))
    r = int(expect("ncomponents"))
    param_names = [tok() for _ in range(d)]
    output_names = [tok() for _ in range(t)]

    def vec(k):
        return np.asarray([float(tok()) for _ in range(k)])

    def mat(rows, cols):
        return vec(rows * cols).reshape(rows, cols)

    mins = vec(d)
    ranges = vec(d)
    ymean = vec(t)
    ystd = vec(t)
    lam = vec(r)
    U = mat(t, r)
    X = mat(n, d)
    Z = mat(n, r)
    ntheta = 2 + cov.num_length_scales(d)
    thetas = mat(r, ntheta)
    noise = mat(n, r) if version >= VERSION_NOISE else None

    cfg = GPConfig(
        nparams=d,
        covariance=cov,
        regression_order=order,
        power_exp_alpha=alpha,
        predict_variance_includes_nugget=pred_nug,
    )
    params = GPParams(
        log_amp=jnp.asarray(np.log(thetas[:, 0]), dtype=dtype),
        log_nugget=jnp.asarray(np.log(thetas[:, 1]), dtype=dtype),
        log_ls=jnp.asarray(np.log(thetas[:, 2:]), dtype=dtype),
    )
    Xj = jnp.asarray(X, dtype=dtype)
    Zj = jnp.asarray(Z, dtype=dtype)
    scaling = DesignScaling(
        mins=jnp.asarray(mins, dtype=dtype),
        ranges=jnp.asarray(ranges, dtype=dtype),
    )
    pca = PCAState(
        ymean=jnp.asarray(ymean, dtype=dtype),
        ystd=jnp.asarray(ystd, dtype=dtype),
        eigenvalues=jnp.asarray(lam, dtype=dtype),
        U=jnp.asarray(U, dtype=dtype),
    )
    noisej = None if noise is None else jnp.asarray(noise, dtype=dtype)
    if build_states:
        emu = MultivariateEmulator(
            scaling=scaling, X=Xj, Z=Zj, pca=pca, params=params,
            states=_vmapped_states(params, Xj, Zj, cfg, noise_pc=noisej),
            config=cfg, noise=noisej,
        )
    else:
        from madaiemulator_tpu.models.multivariate import (
            IterativeMultivariateEmulator,
        )

        emu = IterativeMultivariateEmulator(
            scaling=scaling, X=Xj, Z=Zj, pca=pca, params=params, config=cfg,
            noise=noisej,
        )
    return emu, param_names, output_names
