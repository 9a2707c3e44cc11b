"""Test environment: force CPU backend with 8 virtual devices.

Sharding tests run on a virtual 8-device CPU mesh (SURVEY.md §4
"No-real-cluster story") so the suite never contends for the single real
TPU chip and runs anywhere. Must execute before jax is imported.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the shell presets axon (the real TPU)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize imports jax and registers the TPU plugin at
# interpreter start (before this file runs), ignoring JAX_PLATFORMS.
# Backend *selection* is still lazy, so this override wins as long as no
# computation has run yet.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_jit_cache():
    """Bound accumulated compiled-executable state (round 5): XLA:CPU
    segfaulted inside backend_compile_and_load ~245 tests into the FULL
    suite in three runs — at two DIFFERENT big-compile tests — while
    every subset (solo files, the entire second half: 70 tests) is
    green. The crash tracks total in-process compiled state, not any
    one program. Dropping compiled programs at each module boundary
    keeps that state bounded for any test order; cross-module programs
    recompile on next use (seconds)."""
    yield
    jax.clear_caches()


@pytest.fixture()
def rng():
    """Function-scoped so each test sees a deterministic stream
    regardless of which other tests ran (a session-scoped generator made
    test inputs depend on collection order)."""
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def small_images():
    """Deterministic 32×32 content/style pair in [0, 255]."""
    r = np.random.default_rng(42)
    content = r.uniform(0, 255, (32, 32, 3)).astype(np.float32)
    style = r.uniform(0, 255, (32, 32, 3)).astype(np.float32)
    return content, style


@pytest.fixture(scope="session")
def vgg_params_small():
    from dpst_tpu.models import vgg
    return vgg.init_params(seed=0)
