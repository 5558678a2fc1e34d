"""Training model-file reader/writer.

Equivalent of the reference CLI's model-file input path (ref:
src/interactive_emulator.c open_model_file / read of nparams, param names,
nouts, output names, N, design, Y — SURVEY.md §3.1; mount empty this round,
so the exact upstream grammar is pinned as FORMAT NOTE below and must be
re-verified against the reference once available; the parser is isolated
here so only this module changes).

FORMAT (text, whitespace-tolerant, '#' starts a comment to end-of-line):

    <nparams>
    <param name> x nparams          (one token per line)
    <noutputs>
    <output name> x noutputs
    <nmodel_points>
    design matrix                    (nmodel_points rows x nparams floats)
    training outputs                 (nmodel_points rows x noutputs floats)

All numeric payloads are free-form whitespace separated; row structure is
by count, not by line.
"""

from __future__ import annotations

import io as _io
from dataclasses import dataclass
from typing import List, Sequence, TextIO, Union

import numpy as np


@dataclass
class ModelFile:
    param_names: List[str]
    output_names: List[str]
    X: np.ndarray  # (N, d) raw (unscaled) design
    Y: np.ndarray  # (N, t) training outputs

    @property
    def nparams(self) -> int:
        return self.X.shape[1]

    @property
    def noutputs(self) -> int:
        return self.Y.shape[1]

    @property
    def npoints(self) -> int:
        return self.X.shape[0]


def _tokens(stream: TextIO):
    for line in stream:
        body = line.split("#", 1)[0]
        for tok in body.split():
            yield tok


def read_model_file(source: Union[str, TextIO]) -> ModelFile:
    if isinstance(source, str):
        with open(source, "r") as f:
            return read_model_file(f)
    toks = _tokens(source)

    def next_tok() -> str:
        try:
            return next(toks)
        except StopIteration:
            raise ValueError("model file ended early") from None

    nparams = int(next_tok())
    if nparams < 1:
        raise ValueError(f"bad nparams {nparams}")
    param_names = [next_tok() for _ in range(nparams)]
    nouts = int(next_tok())
    if nouts < 1:
        raise ValueError(f"bad noutputs {nouts}")
    output_names = [next_tok() for _ in range(nouts)]
    npoints = int(next_tok())
    if npoints < 1:
        raise ValueError(f"bad nmodel_points {npoints}")
    vals = [float(next_tok()) for _ in range(npoints * nparams)]
    X = np.asarray(vals, dtype=np.float64).reshape(npoints, nparams)
    vals = [float(next_tok()) for _ in range(npoints * nouts)]
    Y = np.asarray(vals, dtype=np.float64).reshape(npoints, nouts)
    return ModelFile(param_names=param_names, output_names=output_names, X=X, Y=Y)


def write_model_file(
    dest: Union[str, TextIO],
    X: np.ndarray,
    Y: np.ndarray,
    param_names: Sequence[str] | None = None,
    output_names: Sequence[str] | None = None,
) -> None:
    if isinstance(dest, str):
        with open(dest, "w") as f:
            write_model_file(f, X, Y, param_names, output_names)
            return
    X = np.atleast_2d(np.asarray(X))
    Y = np.asarray(Y)
    if Y.ndim == 1:
        Y = Y[:, None]
    n, d = X.shape
    t = Y.shape[1]
    param_names = list(param_names or [f"param_{i}" for i in range(d)])
    output_names = list(output_names or [f"output_{i}" for i in range(t)])
    w = dest.write
    w(f"{d}\n")
    for s in param_names:
        w(f"{s}\n")
    w(f"{t}\n")
    for s in output_names:
        w(f"{s}\n")
    w(f"{n}\n")
    for row in X:
        w(" ".join(f"{v:.17g}" for v in row) + "\n")
    for row in Y:
        w(" ".join(f"{v:.17g}" for v in row) + "\n")
