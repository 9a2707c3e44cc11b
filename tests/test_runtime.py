"""Runtime observability utilities (SURVEY.md §5: tracing/profiling)."""
import os

import numpy as np


def test_maybe_profile_writes_trace(tmp_path):
    import jax.numpy as jnp
    from dpst_tpu.utils.runtime import maybe_profile

    d = str(tmp_path / "trace")
    with maybe_profile(d):
        _ = jnp.sum(jnp.ones((64, 64))).block_until_ready()
    files = [os.path.join(r, f) for r, _, fs in os.walk(d) for f in fs]
    assert files, "profiler produced no trace files"


def test_maybe_profile_noop():
    from dpst_tpu.utils.runtime import maybe_profile
    with maybe_profile(""):
        pass  # must not create anything or fail


def test_compilation_cache_dir(tmp_path, monkeypatch):
    import jax
    from dpst_tpu.utils import runtime
    d = str(tmp_path / "cache")
    runtime.enable_compilation_cache(d)
    assert os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d
