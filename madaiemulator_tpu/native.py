"""ctypes bindings to the native C++ embedding library.

The C ABI in native/src/emulator.cc is the moral equivalent of the
reference's R-binding `.C()` surface (ref: src/libRbind/rbind.c) and its
EmuPlusPlus class (ref: src/EmuPlusPlus.cc): load a snapshot, query posterior
means/variances in-process with no Python/JAX in the serving loop. Used here
for (a) embedding consumers and (b) cross-implementation parity tests against
the JAX path.

The library is built on demand with `make -C native` (g++); `available()`
reports whether a usable build exists.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "build" / "libmadai_emu.so"
_lib: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> pathlib.Path:
    """Build the native library (idempotent)."""
    if force or not _LIB_PATH.exists():
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)], check=True, capture_output=True
        )
    return _LIB_PATH


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        build()
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.madai_emulator_load.restype = ctypes.c_void_p
        lib.madai_emulator_load.argtypes = [
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.c_int,
        ]
        lib.madai_emulator_nparams.argtypes = [ctypes.c_void_p]
        lib.madai_emulator_nparams.restype = ctypes.c_int
        lib.madai_emulator_noutputs.argtypes = [ctypes.c_void_p]
        lib.madai_emulator_noutputs.restype = ctypes.c_int
        lib.madai_emulator_query.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.madai_emulator_query.restype = ctypes.c_int
        lib.madai_emulator_free.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


class NativeEmulator:
    """C++-served emulator over a snapshot file (EmuPlusPlus equivalent)."""

    def __init__(self, state_file: str):
        lib = _load()
        err = ctypes.create_string_buffer(512)
        self._h = lib.madai_emulator_load(
            str(state_file).encode(), err, len(err)
        )
        if not self._h:
            raise RuntimeError(
                f"native load failed: {err.value.decode(errors='replace')}"
            )
        self._lib = lib
        self.nparams = lib.madai_emulator_nparams(self._h)
        self.noutputs = lib.madai_emulator_noutputs(self._h)

    def query(self, x) -> Tuple[np.ndarray, np.ndarray]:
        """Posterior (means, variances) at one raw point x (nparams,)."""
        x = np.ascontiguousarray(np.asarray(x, dtype=np.float64))
        if x.shape != (self.nparams,):
            raise ValueError(f"expected shape ({self.nparams},), got {x.shape}")
        means = np.empty(self.noutputs, dtype=np.float64)
        variances = np.empty(self.noutputs, dtype=np.float64)
        rc = self._lib.madai_emulator_query(
            self._h,
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            means.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            variances.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        if rc != 0:
            raise RuntimeError("native query failed")
        return means, variances

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.madai_emulator_free(h)
            self._h = None
