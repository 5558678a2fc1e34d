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
# version 3 = version 2 + explicit has_noise/has_gradients/
# has_gradient_noise header flags and trailing PC-space gradient blocks
# ((n*d) x r, point-major/dim-inner — the layout of MultivariateEmulator.dZ
# flattened over (point, dim)); written ONLY for gradient-enhanced
# emulators, so value-only snapshots keep their v1/v2 encodings and every
# existing reader. The native C++ Emulator implements v3 in full (it
# rebuilds the joint value+gradient GLS system from the dZ blocks); the
# matrix-free loader rejects v3 — the PCG engine has no joint operator
# (FORMATS.md).
VERSION_GRADIENTS = 3

# Multi-fidelity (AR(1) co-kriging) snapshots use their OWN magic + grammar:
# the payload is per-LEVEL scalar GPs (designs, targets, lower-fidelity
# basis columns, thetas, rho), not a PCA multivariate container, so
# overloading the main grammar would contort both. Readers dispatch on the
# magic token (read_snapshot_auto).
MAGIC_MF = "MADAIEMULATOR_TPU_SNAPSHOT_MF"
VERSION_MF = 1
# version 2 = MULTIVARIATE multi-fidelity: one shared PCA block (the basis
# every level projects through — models/multifidelity.py MV section) and
# per-level COMPONENT-BATCHED payloads: thetas (r x ntheta), rho (r),
# targets Z (N_k x r), lower-mean columns H (N_k x r), noise (N_k x r).
# Scalar (version-1) snapshots keep their grammar and readers untouched;
# the version token dispatches.
VERSION_MF_MV = 2


def _snapshot_version(emu) -> int:
    # getattr: IterativeMultivariateEmulator has no gradient fields (the
    # matrix-free engine has no joint value+gradient operator)
    if getattr(emu, "dZ", None) is not None:
        return VERSION_GRADIENTS
    if emu.noise is not None:
        return VERSION_NOISE
    return VERSION


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
    version = _snapshot_version(emu)
    w(f"{MAGIC} {version}\n")
    w(f"covariance {cfg.covariance.value}\n")
    w(f"power_exp_alpha {cfg.power_exp_alpha:.17g}\n")
    w(f"regression_order {cfg.regression_order}\n")
    w(f"predict_variance_includes_nugget {int(cfg.predict_variance_includes_nugget)}\n")
    w(f"pca_standardize {int(pca_standardize)}\n")
    if version >= VERSION_GRADIENTS:
        w(f"has_noise {int(emu.noise is not None)}\n")
        w(f"has_gradients {int(emu.dZ is not None)}\n")
        w(f"has_gradient_noise "
          f"{int(getattr(emu, 'dZ_noise', None) is not None)}\n")
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
    if getattr(emu, "dZ", None) is not None:
        w("# PC-space gradient observations ((n*d) x r, point-major)\n")
        w(_fmt_mat(np.asarray(emu.dZ).reshape(n * d, r)) + "\n")
    if getattr(emu, "dZ_noise", None) is not None:
        w("# PC-space gradient-noise variances ((n*d) x r, point-major)\n")
        w(_fmt_mat(np.asarray(emu.dZ_noise).reshape(n * d, r)) + "\n")


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
    extra = {}
    if emu.noise is not None:
        extra["noise_pc"] = np.asarray(emu.noise)
    if getattr(emu, "dZ", None) is not None:
        extra["dZ_pc"] = np.asarray(emu.dZ)
    if getattr(emu, "dZ_noise", None) is not None:
        extra["dZ_noise_pc"] = np.asarray(emu.dZ_noise)
    np.savez_compressed(
        dest,
        magic=np.array([MAGIC]),
        version=np.array([_snapshot_version(emu)]),
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
    if str(z["magic"][0]) == MAGIC_MF:
        raise ValueError(
            "multi-fidelity npz snapshot: use read_snapshot_auto / "
            "read_snapshot_multifidelity_npz"
        )
    if str(z["magic"][0]) != MAGIC or int(z["version"][0]) not in (
        VERSION, VERSION_NOISE, VERSION_GRADIENTS,
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
    dZj = jnp.asarray(z["dZ_pc"], dtype=dtype) if "dZ_pc" in z else None
    dZnj = (
        jnp.asarray(z["dZ_noise_pc"], dtype=dtype)
        if "dZ_noise_pc" in z else None
    )
    emu = _assemble_multivariate(
        scaling, Xj, Zj, pca, params, cfg, noisej, dZj, dZnj, build_states
    )
    return emu, list(map(str, z["param_names"])), list(map(str, z["output_names"]))


def _assemble_multivariate(
    scaling, Xj, Zj, pca, params, cfg, noisej, dZj, dZnj, build_states: bool
):
    """Shared text/npz tail: build the serving container from parsed arrays."""
    if build_states:
        return MultivariateEmulator(
            scaling=scaling, X=Xj, Z=Zj, pca=pca, params=params,
            states=_vmapped_states(params, Xj, Zj, cfg, noise_pc=noisej,
                                   dZ=dZj, dZ_noise=dZnj),
            config=cfg, noise=noisej, dZ=dZj, dZ_noise=dZnj,
        )
    from madaiemulator_tpu.models.multivariate import (
        IterativeMultivariateEmulator,
    )

    if dZj is not None:
        raise ValueError(
            "gradient-enhanced snapshots serve through the dense path only "
            "(build_states=True): the matrix-free engine has no joint "
            "value+gradient operator"
        )
    return IterativeMultivariateEmulator(
        scaling=scaling, X=Xj, Z=Zj, pca=pca, params=params, config=cfg,
        noise=noisej,
    )


def write_snapshot_auto(
    dest: str,
    emu,
    param_names: List[str] | None = None,
    output_names: List[str] | None = None,
) -> None:
    """Dispatch on container type (multivariate / multi-fidelity / sparse)
    and on extension ('.npz' -> binary, else text). Takes the
    write_snapshot argument shape for every family (output_names is a
    LIST even for the scalar-output multi-fidelity writers — positional
    or keyword, it is remapped to their singular output_name)."""
    from madaiemulator_tpu.models.multifidelity import (
        MultiFidelityEmulator,
        MultivariateMultiFidelityEmulator,
    )
    from madaiemulator_tpu.models.sparse import SparseMultivariateEmulator

    if isinstance(emu, SparseMultivariateEmulator):
        writer = (
            write_snapshot_sparse_npz
            if dest.endswith(".npz")
            else write_snapshot_sparse
        )
        writer(dest, emu, param_names, output_names)
        return
    if isinstance(emu, MultivariateMultiFidelityEmulator):
        writer = (
            write_snapshot_multifidelity_mv_npz
            if dest.endswith(".npz")
            else write_snapshot_multifidelity_mv
        )
        writer(dest, emu, param_names, output_names)
        return
    if isinstance(emu, MultiFidelityEmulator):
        writer = (
            write_snapshot_multifidelity_npz
            if dest.endswith(".npz")
            else write_snapshot_multifidelity
        )
        writer(dest, emu, param_names,
               None if output_names is None else output_names[0])
        return
    writer = write_snapshot_npz if dest.endswith(".npz") else write_snapshot
    writer(dest, emu, param_names, output_names)


def read_snapshot_auto(source: str, dtype=jnp.float64, build_states: bool = True):
    """Dispatch on the snapshot's own magic (multivariate / multi-fidelity /
    sparse SGPR) and on extension ('.npz' -> binary, else text).
    Multi-fidelity returns a MultiFidelityEmulator (its serving states are
    always rebuilt — the levels are small by construction); sparse returns
    a SparseMultivariateEmulator (its payload IS the serve state);
    build_states only affects the dense multivariate family."""
    if source.endswith(".npz"):
        with np.load(source, allow_pickle=False) as z:
            magic = str(z["magic"][0])
        if magic == MAGIC_MF:
            return read_snapshot_multifidelity_npz(source, dtype=dtype)
        if magic == "MADAIEMULATOR_TPU_SNAPSHOT_SGPR":
            return read_snapshot_sparse_npz(source, dtype=dtype)
        return read_snapshot_npz(source, dtype=dtype,
                                 build_states=build_states)
    with open(source, "r") as f:
        head = f.readline().split()
    if head and head[0] == MAGIC_MF:
        return read_snapshot_multifidelity(source, dtype=dtype)
    if head and head[0] == "MADAIEMULATOR_TPU_SNAPSHOT_SGPR":
        return read_snapshot_sparse(source, dtype=dtype)
    return read_snapshot(source, dtype=dtype, build_states=build_states)


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

    first = tok()
    if first == MAGIC_MF:
        raise ValueError(
            "multi-fidelity snapshot: use read_snapshot_auto / "
            "read_snapshot_multifidelity"
        )
    if first != MAGIC:
        raise ValueError("not a madaiemulator_tpu snapshot")
    version = int(tok())
    if version not in (VERSION, VERSION_NOISE, VERSION_GRADIENTS):
        raise ValueError(f"unsupported snapshot version {version}")
    cov = COVARIANCE_CLI_NAMES[expect("covariance")]
    alpha = float(expect("power_exp_alpha"))
    order = int(expect("regression_order"))
    pred_nug = bool(int(expect("predict_variance_includes_nugget")))
    _pca_std = bool(int(expect("pca_standardize")))
    if version >= VERSION_GRADIENTS:
        has_noise = bool(int(expect("has_noise")))
        has_grad = bool(int(expect("has_gradients")))
        has_grad_noise = bool(int(expect("has_gradient_noise")))
    else:
        has_noise = version >= VERSION_NOISE
        has_grad = has_grad_noise = False
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
    noise = mat(n, r) if has_noise else None
    dZ = mat(n * d, r).reshape(n, d, r) if has_grad else None
    dZ_noise = mat(n * d, r).reshape(n, d, r) if has_grad_noise else None

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
    dZj = None if dZ is None else jnp.asarray(dZ, dtype=dtype)
    dZnj = None if dZ_noise is None else jnp.asarray(dZ_noise, dtype=dtype)
    emu = _assemble_multivariate(
        scaling, Xj, Zj, pca, params, cfg, noisej, dZj, dZnj, build_states
    )
    return emu, param_names, output_names


# --- Multi-fidelity (AR(1) co-kriging) snapshots ----------------------------
#
# Grammar (text; '#' comments allowed; floats %.17g):
#
#     MADAIEMULATOR_TPU_SNAPSHOT_MF 1
#     covariance <family> ; power_exp_alpha ; regression_order ;
#     predict_variance_includes_nugget
#     nparams <d> ; nlevels <L>
#     param names (d), output name (1)
#     design scaling (mins; ranges) — shared across levels
#     per level k = 0..L-1:
#         level <k> <N_k> <has_noise 0|1>
#         thetas [amp nugget length_scales...]        (natural space)
#         rho <float>                                  (k >= 1 only)
#         X_k (N_k x d)    scaled design
#         y_k (N_k)        targets
#         h_k (N_k)        lower-fidelity basis column (k >= 1 only —
#                          state/beta depend on it, so it is data)
#         noise_k (N_k)    per-point noise variances   (if has_noise)
#
# Serving states (Cholesky, alpha, beta, ...) are rebuilt on load — the
# expensive levels are small by construction (that is the point of
# multi-fidelity), so the rebuild is cheap and keeps the file format free
# of redundant derived arrays. SURVEY §1 layering note: the snapshot is the
# train-time/serve-time contract; this extends it to the multi-fidelity
# modality (VERDICT r3 missing #2).


def _mf_rebuild_level(params, data, config):
    """Rebuild one level's serving factorization (jitted per shape —
    same-shape levels reuse ONE compiled program; a fresh lambda per call
    would recompile every level)."""
    return _mf_rebuild_jit(params, data, config)


def _mf_rebuild_jit_impl(params, data, config):
    from madaiemulator_tpu.models.gp import precompute_predictor

    return precompute_predictor(params, data, config)


import jax as _jax  # noqa: E402

_mf_rebuild_jit = _jax.jit(_mf_rebuild_jit_impl, static_argnames=("config",))


def write_snapshot_multifidelity(
    dest: Union[str, TextIO],
    emu,
    param_names: List[str] | None = None,
    output_name: str | None = None,
) -> None:
    """Persist a trained MultiFidelityEmulator (text grammar above)."""
    if isinstance(dest, str):
        with open(dest, "w") as f:
            write_snapshot_multifidelity(f, emu, param_names, output_name)
            return
    cfg = emu.config
    L = emu.n_levels
    d = emu.levels[0].data.X.shape[1]
    param_names = list(param_names or [f"param_{i}" for i in range(d)])
    output_name = output_name or "output_0"
    w = dest.write
    w(f"{MAGIC_MF} {VERSION_MF}\n")
    w(f"covariance {cfg.covariance.value}\n")
    w(f"power_exp_alpha {cfg.power_exp_alpha:.17g}\n")
    w(f"regression_order {cfg.regression_order}\n")
    w(f"predict_variance_includes_nugget "
      f"{int(cfg.predict_variance_includes_nugget)}\n")
    w(f"nparams {d}\nnlevels {L}\n")
    for s in param_names:
        w(f"{s}\n")
    w(f"{output_name}\n")
    w("# design scaling (mins; ranges)\n")
    w(_fmt_vec(emu.scaling.mins) + "\n")
    w(_fmt_vec(emu.scaling.ranges) + "\n")
    for k, lv in enumerate(emu.levels):
        nk = lv.data.X.shape[0]
        has_noise = int(lv.data.noise is not None)
        w(f"level {k} {nk} {has_noise}\n")
        theta = np.concatenate([
            np.exp(np.asarray(lv.params.log_amp))[None],
            np.exp(np.asarray(lv.params.log_nugget))[None],
            np.exp(np.asarray(lv.params.log_ls)).ravel(),
        ])
        w("# thetas [amp nugget ls...]\n")
        w(_fmt_vec(theta) + "\n")
        if k > 0:
            w(f"rho {float(np.asarray(lv.rho)):.17g}\n")
        w(f"# level {k}: scaled design ({nk} x {d}); targets; "
          + ("lower-fidelity column; " if k > 0 else "")
          + ("noise" if has_noise else "") + "\n")
        w(_fmt_mat(lv.data.X) + "\n")
        w(_fmt_vec(lv.data.y) + "\n")
        if k > 0:
            w(_fmt_vec(lv.data.h_extra[:, 0]) + "\n")
        if has_noise:
            w(_fmt_vec(lv.data.noise) + "\n")


def read_snapshot_multifidelity(
    source: Union[str, TextIO], dtype=jnp.float64
):
    """Load a multi-fidelity snapshot; rebuilds every level's serving
    factorization. Returns (MultiFidelityEmulator, param_names,
    [output_name])."""
    from madaiemulator_tpu.models.gp import GPData
    from madaiemulator_tpu.models.multifidelity import (
        FidelityLevel,
        MultiFidelityEmulator,
    )

    if isinstance(source, str):
        with open(source, "r") as f:
            return read_snapshot_multifidelity(f, dtype=dtype)
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

    if tok() != MAGIC_MF:
        raise ValueError("not a multi-fidelity snapshot")
    version = int(tok())
    if version == VERSION_MF_MV:
        return _read_mf_mv_body(tok, expect, dtype)
    if version != VERSION_MF:
        raise ValueError(f"unsupported multi-fidelity snapshot version {version}")
    cov = COVARIANCE_CLI_NAMES[expect("covariance")]
    alpha = float(expect("power_exp_alpha"))
    order = int(expect("regression_order"))
    pred_nug = bool(int(expect("predict_variance_includes_nugget")))
    d = int(expect("nparams"))
    L = int(expect("nlevels"))
    param_names = [tok() for _ in range(d)]
    output_name = tok()

    def vec(k):
        return np.asarray([float(tok()) for _ in range(k)])

    mins = vec(d)
    ranges = vec(d)
    cfg = GPConfig(
        nparams=d, covariance=cov, regression_order=order,
        power_exp_alpha=alpha, predict_variance_includes_nugget=pred_nug,
    )
    scaling = DesignScaling(
        mins=jnp.asarray(mins, dtype=dtype),
        ranges=jnp.asarray(ranges, dtype=dtype),
    )
    ntheta = 2 + cov.num_length_scales(d)
    levels = []
    for k in range(L):
        kk = int(expect("level"))
        if kk != k:
            raise ValueError(f"snapshot: expected level {k}, got {kk}")
        nk = int(tok())
        has_noise = bool(int(tok()))
        theta = vec(ntheta)
        rho = float(expect("rho")) if k > 0 else 0.0
        X = vec(nk * d).reshape(nk, d)
        y = vec(nk)
        h = vec(nk)[:, None] if k > 0 else None
        nz = vec(nk) if has_noise else None
        params = GPParams(
            log_amp=jnp.asarray(np.log(theta[0]), dtype=dtype),
            log_nugget=jnp.asarray(np.log(theta[1]), dtype=dtype),
            log_ls=jnp.asarray(np.log(theta[2:]), dtype=dtype),
        )
        data = GPData(
            X=jnp.asarray(X, dtype=dtype),
            y=jnp.asarray(y, dtype=dtype),
            noise=None if nz is None else jnp.asarray(nz, dtype=dtype),
            h_extra=None if h is None else jnp.asarray(h, dtype=dtype),
        )
        state = _mf_rebuild_level(params, data, cfg)
        levels.append(FidelityLevel(
            data=data, params=params, state=state,
            rho=jnp.asarray(rho, dtype=dtype),
        ))
    emu = MultiFidelityEmulator(
        scaling=scaling, levels=tuple(levels), config=cfg
    )
    return emu, param_names, [output_name]


def write_snapshot_multifidelity_mv(
    dest: Union[str, TextIO],
    emu,
    param_names: List[str] | None = None,
    output_names: List[str] | None = None,
) -> None:
    """Persist a MultivariateMultiFidelityEmulator (MF grammar version 2:
    shared PCA block + component-batched per-level payloads)."""
    if isinstance(dest, str):
        with open(dest, "w") as f:
            write_snapshot_multifidelity_mv(f, emu, param_names,
                                            output_names)
            return
    cfg = emu.config
    L = emu.n_levels
    t = emu.n_outputs
    r = emu.n_components
    d = emu.levels[0].X.shape[1]
    param_names = list(param_names or [f"param_{i}" for i in range(d)])
    output_names = list(output_names or [f"output_{j}" for j in range(t)])
    standardize = bool(np.any(np.asarray(emu.pca.ystd) != 1.0))
    w = dest.write
    w(f"{MAGIC_MF} {VERSION_MF_MV}\n")
    w(f"covariance {cfg.covariance.value}\n")
    w(f"power_exp_alpha {cfg.power_exp_alpha:.17g}\n")
    w(f"regression_order {cfg.regression_order}\n")
    w(f"predict_variance_includes_nugget "
      f"{int(cfg.predict_variance_includes_nugget)}\n")
    w(f"pca_standardize {int(standardize)}\n")
    w(f"nparams {d}\nnoutputs {t}\nncomponents {r}\nnlevels {L}\n")
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
    for k, lv in enumerate(emu.levels):
        nk = lv.X.shape[0]
        has_noise = int(lv.noise is not None)
        w(f"level {k} {nk} {has_noise}\n")
        thetas = np.column_stack([
            np.exp(np.asarray(lv.params.log_amp)),
            np.exp(np.asarray(lv.params.log_nugget)),
            np.exp(np.asarray(lv.params.log_ls)).reshape(r, -1),
        ])
        w(f"# thetas ({r} x {thetas.shape[1]}) [amp nugget ls...]\n")
        w(_fmt_mat(thetas) + "\n")
        if k > 0:
            w(f"rho {_fmt_vec(lv.rho)}\n")
        w(f"# level {k}: scaled design ({nk} x {d}); Z ({nk} x {r}); "
          + ("H; " if k > 0 else "")
          + ("noise" if has_noise else "") + "\n")
        w(_fmt_mat(lv.X) + "\n")
        w(_fmt_mat(lv.Z) + "\n")
        if k > 0:
            w(_fmt_mat(lv.H) + "\n")
        if has_noise:
            w(_fmt_mat(lv.noise) + "\n")


def _read_mf_mv_body(tok, expect, dtype):
    """Shared v2 text-body parser (called with the header's token stream
    already past the version token)."""
    from madaiemulator_tpu.models.multifidelity import (
        MultivariateMultiFidelityEmulator,
        MVFidelityLevel,
    )
    from madaiemulator_tpu.models.multivariate import _vmapped_states

    cov = COVARIANCE_CLI_NAMES[expect("covariance")]
    alpha = float(expect("power_exp_alpha"))
    order = int(expect("regression_order"))
    pred_nug = bool(int(expect("predict_variance_includes_nugget")))
    expect("pca_standardize")  # metadata; ystd is applied directly
    d = int(expect("nparams"))
    t = int(expect("noutputs"))
    r = int(expect("ncomponents"))
    L = int(expect("nlevels"))
    param_names = [tok() for _ in range(d)]
    output_names = [tok() for _ in range(t)]

    def vec(k):
        return np.asarray([float(tok()) for _ in range(k)])

    mins = vec(d)
    ranges = vec(d)
    cfg = GPConfig(
        nparams=d, covariance=cov, regression_order=order,
        power_exp_alpha=alpha, predict_variance_includes_nugget=pred_nug,
    )
    scaling = DesignScaling(
        mins=jnp.asarray(mins, dtype=dtype),
        ranges=jnp.asarray(ranges, dtype=dtype),
    )
    pca = PCAState(
        ymean=jnp.asarray(vec(t), dtype=dtype),
        ystd=jnp.asarray(vec(t), dtype=dtype),
        eigenvalues=jnp.asarray(vec(r), dtype=dtype),
        U=jnp.asarray(vec(t * r).reshape(t, r), dtype=dtype),
    )
    ntheta = 2 + cov.num_length_scales(d)
    levels = []
    for k in range(L):
        kk = int(expect("level"))
        if kk != k:
            raise ValueError(f"snapshot: expected level {k}, got {kk}")
        nk = int(tok())
        has_noise = bool(int(tok()))
        thetas = vec(r * ntheta).reshape(r, ntheta)
        rho = (
            jnp.asarray(
                np.asarray([float(expect("rho"))] + [float(tok()) for _ in range(r - 1)]),
                dtype=dtype,
            )
            if k > 0 else jnp.zeros((r,), dtype)
        )
        X = jnp.asarray(vec(nk * d).reshape(nk, d), dtype=dtype)
        Z = jnp.asarray(vec(nk * r).reshape(nk, r), dtype=dtype)
        H = (
            jnp.asarray(vec(nk * r).reshape(nk, r), dtype=dtype)
            if k > 0 else None
        )
        nz = (
            jnp.asarray(vec(nk * r).reshape(nk, r), dtype=dtype)
            if has_noise else None
        )
        params = GPParams(
            log_amp=jnp.asarray(np.log(thetas[:, 0]), dtype=dtype),
            log_nugget=jnp.asarray(np.log(thetas[:, 1]), dtype=dtype),
            log_ls=jnp.asarray(np.log(thetas[:, 2:]), dtype=dtype),
        )
        states = _vmapped_states(params, X, Z, cfg, noise_pc=nz, H_pc=H)
        levels.append(MVFidelityLevel(
            X=X, Z=Z, H=H, noise=nz, params=params, states=states, rho=rho,
        ))
    emu = MultivariateMultiFidelityEmulator(
        scaling=scaling, pca=pca, levels=tuple(levels), config=cfg,
    )
    return emu, param_names, output_names


def write_snapshot_multifidelity_npz(
    dest: str,
    emu,
    param_names: List[str] | None = None,
    output_name: str | None = None,
) -> None:
    """Binary multi-fidelity snapshot: same payload as the text grammar,
    per-level arrays suffixed _<k>."""
    cfg = emu.config
    L = emu.n_levels
    d = emu.levels[0].data.X.shape[1]
    arrays = {}
    for k, lv in enumerate(emu.levels):
        arrays[f"X_{k}"] = np.asarray(lv.data.X)
        arrays[f"y_{k}"] = np.asarray(lv.data.y)
        arrays[f"log_amp_{k}"] = np.asarray(lv.params.log_amp)
        arrays[f"log_nugget_{k}"] = np.asarray(lv.params.log_nugget)
        arrays[f"log_ls_{k}"] = np.asarray(lv.params.log_ls)
        if k > 0:
            arrays[f"h_{k}"] = np.asarray(lv.data.h_extra[:, 0])
            arrays[f"rho_{k}"] = np.asarray(lv.rho)
        if lv.data.noise is not None:
            arrays[f"noise_{k}"] = np.asarray(lv.data.noise)
    np.savez_compressed(
        dest,
        magic=np.array([MAGIC_MF]),
        version=np.array([VERSION_MF]),
        covariance=np.array([cfg.covariance.value]),
        power_exp_alpha=np.array([cfg.power_exp_alpha]),
        regression_order=np.array([cfg.regression_order]),
        predict_variance_includes_nugget=np.array(
            [int(cfg.predict_variance_includes_nugget)]
        ),
        nlevels=np.array([L]),
        param_names=np.array(
            list(param_names or [f"param_{i}" for i in range(d)])
        ),
        output_name=np.array([output_name or "output_0"]),
        mins=np.asarray(emu.scaling.mins),
        ranges=np.asarray(emu.scaling.ranges),
        **arrays,
    )


def write_snapshot_multifidelity_mv_npz(
    dest: str,
    emu,
    param_names: List[str] | None = None,
    output_names: List[str] | None = None,
) -> None:
    """Binary multivariate multi-fidelity snapshot: same payload as the
    text grammar (version 2), per-level arrays suffixed _<k>."""
    cfg = emu.config
    L = emu.n_levels
    d = emu.levels[0].X.shape[1]
    t = emu.n_outputs
    arrays = {}
    for k, lv in enumerate(emu.levels):
        arrays[f"X_{k}"] = np.asarray(lv.X)
        arrays[f"Z_{k}"] = np.asarray(lv.Z)
        arrays[f"log_amp_{k}"] = np.asarray(lv.params.log_amp)
        arrays[f"log_nugget_{k}"] = np.asarray(lv.params.log_nugget)
        arrays[f"log_ls_{k}"] = np.asarray(lv.params.log_ls)
        if k > 0:
            arrays[f"H_{k}"] = np.asarray(lv.H)
            arrays[f"rho_{k}"] = np.asarray(lv.rho)
        if lv.noise is not None:
            arrays[f"noise_{k}"] = np.asarray(lv.noise)
    np.savez_compressed(
        dest,
        magic=np.array([MAGIC_MF]),
        version=np.array([VERSION_MF_MV]),
        covariance=np.array([cfg.covariance.value]),
        power_exp_alpha=np.array([cfg.power_exp_alpha]),
        regression_order=np.array([cfg.regression_order]),
        predict_variance_includes_nugget=np.array(
            [int(cfg.predict_variance_includes_nugget)]
        ),
        nlevels=np.array([L]),
        param_names=np.array(
            list(param_names or [f"param_{i}" for i in range(d)])
        ),
        output_names=np.array(
            list(output_names or [f"output_{j}" for j in range(t)])
        ),
        mins=np.asarray(emu.scaling.mins),
        ranges=np.asarray(emu.scaling.ranges),
        ymean=np.asarray(emu.pca.ymean),
        ystd=np.asarray(emu.pca.ystd),
        eigenvalues=np.asarray(emu.pca.eigenvalues),
        U=np.asarray(emu.pca.U),
        **arrays,
    )


def _read_mf_mv_npz(z, dtype):
    from madaiemulator_tpu.models.multifidelity import (
        MultivariateMultiFidelityEmulator,
        MVFidelityLevel,
    )
    from madaiemulator_tpu.models.multivariate import _vmapped_states

    cfg = GPConfig(
        nparams=int(z["mins"].shape[0]),
        covariance=COVARIANCE_CLI_NAMES[str(z["covariance"][0])],
        regression_order=int(z["regression_order"][0]),
        power_exp_alpha=float(z["power_exp_alpha"][0]),
        predict_variance_includes_nugget=bool(
            int(z["predict_variance_includes_nugget"][0])
        ),
    )
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
    r = pca.U.shape[1]
    L = int(z["nlevels"][0])
    levels = []
    for k in range(L):
        params = GPParams(
            log_amp=jnp.asarray(z[f"log_amp_{k}"], dtype=dtype),
            log_nugget=jnp.asarray(z[f"log_nugget_{k}"], dtype=dtype),
            log_ls=jnp.asarray(z[f"log_ls_{k}"], dtype=dtype),
        )
        X = jnp.asarray(z[f"X_{k}"], dtype=dtype)
        Z = jnp.asarray(z[f"Z_{k}"], dtype=dtype)
        H = jnp.asarray(z[f"H_{k}"], dtype=dtype) if k > 0 else None
        nz = (
            jnp.asarray(z[f"noise_{k}"], dtype=dtype)
            if f"noise_{k}" in z else None
        )
        states = _vmapped_states(params, X, Z, cfg, noise_pc=nz, H_pc=H)
        rho = (
            jnp.asarray(z[f"rho_{k}"], dtype=dtype)
            if k > 0 else jnp.zeros((r,), dtype)
        )
        levels.append(MVFidelityLevel(
            X=X, Z=Z, H=H, noise=nz, params=params, states=states, rho=rho,
        ))
    emu = MultivariateMultiFidelityEmulator(
        scaling=scaling, pca=pca, levels=tuple(levels), config=cfg,
    )
    return emu, list(map(str, z["param_names"])), list(map(str, z["output_names"]))


def read_snapshot_multifidelity_npz(source: str, dtype=jnp.float64):
    """Binary multi-fidelity loader (see read_snapshot_multifidelity)."""
    from madaiemulator_tpu.models.gp import GPData
    from madaiemulator_tpu.models.multifidelity import (
        FidelityLevel,
        MultiFidelityEmulator,
    )

    z = np.load(source, allow_pickle=False)
    if str(z["magic"][0]) != MAGIC_MF or int(z["version"][0]) not in (
        VERSION_MF, VERSION_MF_MV,
    ):
        raise ValueError("not a compatible multi-fidelity npz snapshot")
    if int(z["version"][0]) == VERSION_MF_MV:
        return _read_mf_mv_npz(z, dtype)
    cfg = GPConfig(
        nparams=int(z["mins"].shape[0]),
        covariance=COVARIANCE_CLI_NAMES[str(z["covariance"][0])],
        regression_order=int(z["regression_order"][0]),
        power_exp_alpha=float(z["power_exp_alpha"][0]),
        predict_variance_includes_nugget=bool(
            int(z["predict_variance_includes_nugget"][0])
        ),
    )
    scaling = DesignScaling(
        mins=jnp.asarray(z["mins"], dtype=dtype),
        ranges=jnp.asarray(z["ranges"], dtype=dtype),
    )
    L = int(z["nlevels"][0])
    levels = []
    for k in range(L):
        params = GPParams(
            log_amp=jnp.asarray(z[f"log_amp_{k}"], dtype=dtype),
            log_nugget=jnp.asarray(z[f"log_nugget_{k}"], dtype=dtype),
            log_ls=jnp.asarray(z[f"log_ls_{k}"], dtype=dtype),
        )
        data = GPData(
            X=jnp.asarray(z[f"X_{k}"], dtype=dtype),
            y=jnp.asarray(z[f"y_{k}"], dtype=dtype),
            noise=(
                jnp.asarray(z[f"noise_{k}"], dtype=dtype)
                if f"noise_{k}" in z else None
            ),
            h_extra=(
                jnp.asarray(z[f"h_{k}"], dtype=dtype)[:, None]
                if k > 0 else None
            ),
        )
        state = _mf_rebuild_level(params, data, cfg)
        rho = (
            jnp.asarray(z[f"rho_{k}"], dtype=dtype)
            if k > 0 else jnp.asarray(0.0, dtype=dtype)
        )
        levels.append(
            FidelityLevel(data=data, params=params, state=state, rho=rho)
        )
    emu = MultiFidelityEmulator(
        scaling=scaling, levels=tuple(levels), config=cfg
    )
    return emu, list(map(str, z["param_names"])), [str(z["output_name"][0])]


# --- Sparse (SGPR) snapshots -------------------------------------------------
#
# Grammar (text; '#' comments; floats %.17g):
#
#     MADAIEMULATOR_TPU_SNAPSHOT_SGPR 1
#     covariance <family> ; power_exp_alpha ; regression_order ;
#     predict_variance_includes_nugget ; pca_standardize
#     nparams <d> ; noutputs <t> ; ninducing <m> ; ncomponents <r>
#     param names (d), output names (t)
#     design scaling (mins; ranges)
#     pca: ymean; ystd; eigenvalues; U (t x r)
#     Z (m x d)                          shared inducing points, scaled
#     thetas (r x ntheta)                [amp nugget ls...] natural space
#     per component c = 0..r-1:
#         Lm (m x m)  lower chol(K_mm + jitter)
#         LB (m x m)  lower chol(I + A A^T)
#         c  (m)      LB^-1 A D^-1/2 (y - H beta)
#         beta (p)    GLS trend coefficients   (p = 1 + order*d)
#         LA (p x p)  lower chol(H^T Sigma^-1 H)
#         E  (m x p)  GLS variance operator
#
# Unlike every other snapshot family, the payload IS the serve state
# (models/sparse.SGPRServeState): a sparse fit's training set can be a
# million points — persisting it to rebuild factorizations on load would
# defeat the O(m^2) serving distillate that is the point of SGPR. Lm is
# stored rather than rebuilt so a state fitted at one dtype serves
# bit-consistently at another (the jitter and kernel roundings of a
# rebuild would not match the LB/c/E computed at fit time).

MAGIC_SGPR = "MADAIEMULATOR_TPU_SNAPSHOT_SGPR"
VERSION_SGPR = 1


def _check_sparse_ok(emu) -> None:
    """Refuse to persist a sparse emulator with failed factorizations:
    _sgpr_system substitutes identity placeholders when a Cholesky fails
    (ok=False), and the readers/C++ have no ok concept — writing them
    would persist silently-meaningless serve states."""
    ok = np.asarray(emu.states.ok)
    if not bool(np.all(ok)):
        bad = [int(i) for i in np.nonzero(~ok.reshape(-1))[0]]
        raise ValueError(
            f"write_snapshot_sparse: component(s) {bad} carry FAILED "
            "factorizations (state.ok=False — identity placeholder "
            "factors); refusing to persist. Refit with different "
            "hyperparameter bounds or more restarts."
        )


def write_snapshot_sparse(
    dest: Union[str, TextIO],
    emu,
    param_names: List[str] | None = None,
    output_names: List[str] | None = None,
) -> None:
    """Persist a SparseMultivariateEmulator (text grammar above)."""
    _check_sparse_ok(emu)
    if isinstance(dest, str):
        with open(dest, "w") as f:
            write_snapshot_sparse(f, emu, param_names, output_names)
            return
    cfg = emu.config
    m, d = emu.Z.shape
    t = emu.n_outputs
    r = emu.n_components
    param_names = list(param_names or [f"param_{i}" for i in range(d)])
    output_names = list(output_names or [f"output_{j}" for j in range(t)])
    standardize = bool(np.any(np.asarray(emu.pca.ystd) != 1.0))
    thetas = np.concatenate(
        [
            np.exp(np.asarray(emu.params.log_amp))[:, None],
            np.exp(np.asarray(emu.params.log_nugget))[:, None],
            np.exp(np.asarray(emu.params.log_ls)).reshape(r, -1),
        ],
        axis=1,
    )
    w = dest.write
    w(f"{MAGIC_SGPR} {VERSION_SGPR}\n")
    w(f"covariance {cfg.covariance.value}\n")
    w(f"power_exp_alpha {cfg.power_exp_alpha:.17g}\n")
    w(f"regression_order {cfg.regression_order}\n")
    w(f"predict_variance_includes_nugget "
      f"{int(cfg.predict_variance_includes_nugget)}\n")
    w(f"pca_standardize {int(standardize)}\n")
    w(f"nparams {d}\nnoutputs {t}\nninducing {m}\nncomponents {r}\n")
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
    w("# inducing points Z (m x d), scaled\n")
    w(_fmt_mat(emu.Z) + "\n")
    w("# thetas per component (r x ntheta) [amp nugget ls...]\n")
    w(_fmt_mat(thetas) + "\n")
    st = emu.states
    for c in range(r):
        w(f"# component {c}: Lm; LB; c; beta; LA; E\n")
        w(_fmt_mat(st.Lm[c]) + "\n")
        w(_fmt_mat(st.LB[c]) + "\n")
        w(_fmt_vec(st.c[c]) + "\n")
        w(_fmt_vec(st.beta[c]) + "\n")
        w(_fmt_mat(st.LA[c]) + "\n")
        w(_fmt_mat(st.E[c]) + "\n")


def read_snapshot_sparse(source: Union[str, TextIO], dtype=jnp.float64):
    """Load a sparse snapshot. Returns (SparseMultivariateEmulator,
    param_names, output_names) — ready to serve, nothing rebuilt."""
    from madaiemulator_tpu.models.multivariate import PCAState
    from madaiemulator_tpu.models.sparse import (
        SGPRServeState,
        SparseMultivariateEmulator,
    )
    from madaiemulator_tpu.ops.kernels import GPParams
    from madaiemulator_tpu.utils.designs import DesignScaling

    if isinstance(source, str):
        with open(source, "r") as f:
            return read_snapshot_sparse(f, dtype=dtype)
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

    if tok() != MAGIC_SGPR:
        raise ValueError("not a sparse (SGPR) snapshot")
    version = int(tok())
    if version != VERSION_SGPR:
        raise ValueError(f"unsupported sparse snapshot version {version}")
    cov = COVARIANCE_CLI_NAMES[expect("covariance")]
    alpha = float(expect("power_exp_alpha"))
    order = int(expect("regression_order"))
    pred_nug = bool(int(expect("predict_variance_includes_nugget")))
    int(expect("pca_standardize"))  # metadata; ystd carries the effect
    d = int(expect("nparams"))
    t = int(expect("noutputs"))
    m = int(expect("ninducing"))
    r = int(expect("ncomponents"))
    param_names = [tok() for _ in range(d)]
    output_names = [tok() for _ in range(t)]

    def vec(k):
        return np.asarray([float(tok()) for _ in range(k)])

    scaling = DesignScaling(
        mins=jnp.asarray(vec(d), dtype=dtype),
        ranges=jnp.asarray(vec(d), dtype=dtype),
    )
    pca = PCAState(
        ymean=jnp.asarray(vec(t), dtype=dtype),
        ystd=jnp.asarray(vec(t), dtype=dtype),
        eigenvalues=jnp.asarray(vec(r), dtype=dtype),
        U=jnp.asarray(vec(t * r).reshape(t, r), dtype=dtype),
    )
    Z = jnp.asarray(vec(m * d).reshape(m, d), dtype=dtype)
    cfg = GPConfig(
        nparams=d, covariance=cov, regression_order=order,
        power_exp_alpha=alpha, predict_variance_includes_nugget=pred_nug,
    )
    ntheta = 2 + cov.num_length_scales(d)
    th = vec(r * ntheta).reshape(r, ntheta)
    params = GPParams(
        log_amp=jnp.asarray(np.log(th[:, 0]), dtype=dtype),
        log_nugget=jnp.asarray(np.log(th[:, 1]), dtype=dtype),
        log_ls=jnp.asarray(np.log(th[:, 2:]), dtype=dtype),
    )
    p = 1 + order * d
    Lm = np.empty((r, m, m)); LB = np.empty((r, m, m))
    cc = np.empty((r, m)); beta = np.empty((r, p))
    LA = np.empty((r, p, p)); E = np.empty((r, m, p))
    for c in range(r):
        Lm[c] = vec(m * m).reshape(m, m)
        LB[c] = vec(m * m).reshape(m, m)
        cc[c] = vec(m)
        beta[c] = vec(p)
        LA[c] = vec(p * p).reshape(p, p)
        E[c] = vec(m * p).reshape(m, p)
    states = SGPRServeState(
        Z=jnp.broadcast_to(Z, (r, m, d)),
        Lm=jnp.asarray(Lm, dtype=dtype),
        LB=jnp.asarray(LB, dtype=dtype),
        c=jnp.asarray(cc, dtype=dtype),
        beta=jnp.asarray(beta, dtype=dtype),
        LA=jnp.asarray(LA, dtype=dtype),
        E=jnp.asarray(E, dtype=dtype),
        ok=jnp.ones((r,), bool),
    )
    emu = SparseMultivariateEmulator(
        scaling=scaling, pca=pca, Z=Z, params=params, states=states,
        config=cfg,
    )
    return emu, param_names, output_names


def write_snapshot_sparse_npz(
    dest: str,
    emu,
    param_names: List[str] | None = None,
    output_names: List[str] | None = None,
) -> None:
    """Binary sparse snapshot: same payload as the text grammar."""
    _check_sparse_ok(emu)
    cfg = emu.config
    m, d = emu.Z.shape
    t = emu.n_outputs
    r = emu.n_components
    standardize = bool(np.any(np.asarray(emu.pca.ystd) != 1.0))
    st = emu.states
    np.savez_compressed(
        dest,
        magic=np.array([MAGIC_SGPR]),
        version=np.array([VERSION_SGPR]),
        covariance=np.array([cfg.covariance.value]),
        power_exp_alpha=np.array([cfg.power_exp_alpha]),
        regression_order=np.array([cfg.regression_order]),
        predict_variance_includes_nugget=np.array(
            [int(cfg.predict_variance_includes_nugget)]
        ),
        pca_standardize=np.array([int(standardize)]),
        param_names=np.array(
            list(param_names or [f"param_{i}" for i in range(d)])
        ),
        output_names=np.array(
            list(output_names or [f"output_{j}" for j in range(t)])
        ),
        mins=np.asarray(emu.scaling.mins),
        ranges=np.asarray(emu.scaling.ranges),
        ymean=np.asarray(emu.pca.ymean),
        ystd=np.asarray(emu.pca.ystd),
        eigenvalues=np.asarray(emu.pca.eigenvalues),
        U=np.asarray(emu.pca.U),
        Z=np.asarray(emu.Z),
        log_amp=np.asarray(emu.params.log_amp),
        log_nugget=np.asarray(emu.params.log_nugget),
        log_ls=np.asarray(emu.params.log_ls),
        Lm=np.asarray(st.Lm),
        LB=np.asarray(st.LB),
        c=np.asarray(st.c),
        beta=np.asarray(st.beta),
        LA=np.asarray(st.LA),
        E=np.asarray(st.E),
    )


def read_snapshot_sparse_npz(source: str, dtype=jnp.float64):
    """Binary twin of read_snapshot_sparse."""
    from madaiemulator_tpu.models.multivariate import PCAState
    from madaiemulator_tpu.models.sparse import (
        SGPRServeState,
        SparseMultivariateEmulator,
    )
    from madaiemulator_tpu.ops.kernels import GPParams
    from madaiemulator_tpu.utils.designs import DesignScaling

    with np.load(source, allow_pickle=False) as z:
        if (str(z["magic"][0]) != MAGIC_SGPR
                or int(z["version"][0]) != VERSION_SGPR):
            raise ValueError("not a sparse (SGPR) .npz snapshot")
        cfg = GPConfig(
            nparams=int(z["mins"].shape[0]),
            covariance=COVARIANCE_CLI_NAMES[str(z["covariance"][0])],
            regression_order=int(z["regression_order"][0]),
            power_exp_alpha=float(z["power_exp_alpha"][0]),
            predict_variance_includes_nugget=bool(
                int(z["predict_variance_includes_nugget"][0])
            ),
        )
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
        Z = jnp.asarray(z["Z"], dtype=dtype)
        params = GPParams(
            log_amp=jnp.asarray(z["log_amp"], dtype=dtype),
            log_nugget=jnp.asarray(z["log_nugget"], dtype=dtype),
            log_ls=jnp.asarray(z["log_ls"], dtype=dtype),
        )
        r, m, _ = z["Lm"].shape
        states = SGPRServeState(
            Z=jnp.broadcast_to(Z, (r, m, Z.shape[1])),
            Lm=jnp.asarray(z["Lm"], dtype=dtype),
            LB=jnp.asarray(z["LB"], dtype=dtype),
            c=jnp.asarray(z["c"], dtype=dtype),
            beta=jnp.asarray(z["beta"], dtype=dtype),
            LA=jnp.asarray(z["LA"], dtype=dtype),
            E=jnp.asarray(z["E"], dtype=dtype),
            ok=jnp.ones((r,), bool),
        )
        emu = SparseMultivariateEmulator(
            scaling=scaling, pca=pca, Z=Z, params=params, states=states,
            config=cfg,
        )
        return (
            emu,
            list(map(str, z["param_names"])),
            list(map(str, z["output_names"])),
        )
