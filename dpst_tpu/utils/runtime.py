"""Runtime knobs: compilation cache, profiling, NaN debugging.

TPU-native observability layer (SURVEY.md §5): the reference has no
tracing/profiling; here `--profile-dir` wires jax.profiler and
`--debug-nans` wires jax's NaN checker, and the persistent compilation
cache makes repeat runs skip XLA compiles entirely (first compiles through
a remote-compile tunnel can cost minutes).
"""
from __future__ import annotations

import contextlib
import os

import jax

DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/dpst_tpu_xla")


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Persist compiled XLA executables across processes."""
    d = cache_dir or os.environ.get("DPST_XLA_CACHE", DEFAULT_CACHE_DIR)
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def enable_debug_nans() -> None:
    jax.config.update("jax_debug_nans", True)


@contextlib.contextmanager
def maybe_profile(profile_dir: str):
    """jax.profiler trace context when `profile_dir` is set (else no-op)."""
    if not profile_dir:
        yield
        return
    os.makedirs(profile_dir, exist_ok=True)
    with jax.profiler.trace(profile_dir):
        yield
