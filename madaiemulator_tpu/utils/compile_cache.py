"""Client-side AOT reuse of XLA executables (the compile-tax killer).

Round-3 finding (docs/ROUND3.md): the dominant cost of every dense fit is
ONE XLA compile — 168.6 s of the 261 s config-4 wall at N=16,384 — paid
again by every new process at the same shapes. The relay-side JIT cache was
a measured dead end (ROADMAP "closed dead ends"), but the CLIENT-side
persistent compilation cache is not: JAX serializes each compiled
executable to disk keyed on (HLO fingerprint, compile options, jaxlib
version) and rehydrates it on the next process. Measured on the axon TPU
v5e relay (round 4): a 2.36 s compile replays in 0.06 s from a fresh
process — a 40x cut, and the mechanism is size-independent (the N=16k
value+grad program replays the same way; see docs/ROUND4.md for the
measured warm-start fit numbers).

Enabled by default in the CLI (every subcommand) and in bench.py; library
users opt in with one call:

    from madaiemulator_tpu import enable_compile_cache
    enable_compile_cache()          # ~/.cache/madaiemulator_tpu/xla

The cache is write-through and concurrency-safe (JAX names entries by
content hash); stale entries are invalidated by the key, so upgrades never
serve wrong code. Disable with MADAI_COMPILE_CACHE=off.
"""

from __future__ import annotations

import os
from typing import Optional

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "madaiemulator_tpu", "xla"
)


def enable_compile_cache(
    cache_dir: Optional[str] = None,
    min_compile_time_secs: float = 1.0,
) -> Optional[str]:
    """Point JAX's persistent compilation cache at `cache_dir` (default:
    $MADAI_COMPILE_CACHE or ~/.cache/madaiemulator_tpu/xla).

    Only compiles slower than `min_compile_time_secs` are persisted — the
    sub-second dispatch programs (device_put, tiny reshapes) stay
    memory-only so the directory holds executables worth replaying.
    Returns the directory, or None when disabled via
    MADAI_COMPILE_CACHE=off. Safe to call more than once.
    """
    env = os.environ.get("MADAI_COMPILE_CACHE", "")
    if env.lower() == "off":
        return None
    import jax

    cache_dir = cache_dir or env or _DEFAULT_DIR
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs",
        float(min_compile_time_secs),
    )
    # cache entries of any size: the big value+grad executables are the
    # point, and small ones are bounded by min_compile_time anyway
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir
