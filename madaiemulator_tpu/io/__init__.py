"""IO: model files (training input) and snapshots (train/serve contract)."""

from madaiemulator_tpu.io.modelfile import ModelFile, read_model_file, write_model_file
from madaiemulator_tpu.io.snapshot import (
    read_snapshot,
    read_snapshot_npz,
    write_snapshot,
    write_snapshot_npz,
)

__all__ = [
    "ModelFile",
    "read_model_file",
    "write_model_file",
    "read_snapshot",
    "read_snapshot_npz",
    "write_snapshot",
    "write_snapshot_npz",
]
