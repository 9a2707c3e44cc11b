"""NIMA-guided Γ auto-tuning (SURVEY.md §2 comp.12): sweep, scoring,
bracketing — tiny shapes, CPU, candidates sharded over the virtual mesh."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def pair():
    r = np.random.default_rng(17)
    content = r.uniform(0, 255, (24, 24, 3)).astype(np.float32)
    style = r.uniform(0, 255, (24, 24, 3)).astype(np.float32)
    return content, style


def _cfg():
    from dpst_tpu import StylizeConfig
    return StylizeConfig(use_segmentation=False, use_photorealism=False,
                         compute_dtype="float32", iterations=6)


def test_autotune_sweep(pair):
    from dpst_tpu.autotune import autotune
    content, style = pair
    res = autotune(content, style, _cfg(), gammas=(1.0, 100.0, 10000.0))
    assert res.best_gamma in (1.0, 100.0, 10000.0)
    assert res.scores.shape == (3,)
    assert np.all((res.scores >= 1.0) & (res.scores <= 10.0))
    assert res.best_image.shape == content.shape
    assert np.all(np.isfinite(res.best_image))
    # the reported best really is the max-scoring candidate
    assert res.scores[list(res.gammas).index(res.best_gamma)] \
        == res.scores.max()


def test_autotune_bracketing(pair):
    from dpst_tpu.autotune import autotune
    content, style = pair
    res = autotune(content, style, _cfg(), gammas=(1.0, 100.0),
                   rounds=2)
    assert res.gammas.shape == (4,)   # 2 rounds × 2 candidates
    assert res.scores.shape == (4,)
    assert res.best_gamma in res.gammas


def test_gamma_changes_output(pair):
    """Different Γ must actually produce different stylizations."""
    from dpst_tpu.autotune import autotune
    content, style = pair
    res = autotune(content, style, _cfg(), gammas=(0.0, 1000.0))
    assert not np.allclose(res.images[0], res.images[1])


def test_autotune_multiscale(pair):
    """Γ-sweep over a coarse-to-fine schedule: every candidate carries
    its own image between scales; the winner comes out at native size."""
    from dpst_tpu import StylizeConfig
    from dpst_tpu.autotune import autotune
    content, style = pair
    cfg = StylizeConfig(use_segmentation=False, use_photorealism=False,
                        compute_dtype="float32", iterations=4,
                        scales=(16, 24))
    res = autotune(content, style, cfg, gammas=(1.0, 1000.0))
    assert res.best_image.shape == content.shape
    assert res.images.shape == (2,) + content.shape
    assert np.all(np.isfinite(res.images))
    assert not np.allclose(res.images[0], res.images[1])


def test_sweep_jit_key_is_loop_config(pair):
    """Runs differing only in non-loop fields (α, λ, iterations, seed)
    must reuse the compiled sweep executable (VERDICT r1 #8: _sweep was
    keyed on the FULL config)."""
    from dpst_tpu import StylizeConfig
    from dpst_tpu.autotune import _sweep, autotune
    content, style = pair
    base = dict(use_segmentation=False, use_photorealism=False,
                compute_dtype="float32")
    n0 = _sweep._cache_size()
    autotune(content, style, StylizeConfig(iterations=5, **base),
             gammas=(1.0, 10.0))
    n1 = _sweep._cache_size()
    assert n1 > n0                      # first run compiles
    autotune(content, style,
             StylizeConfig(iterations=5, content_weight=3.0, seed=9,
                           intermediate_interval=7, **base),
             gammas=(2.0, 20.0))
    assert _sweep._cache_size() == n1   # α/seed/interval: no recompile


def test_autotune_surface_survives_submodule_import():
    """`import dpst_tpu.autotune` rebinds the package attribute from the
    __init__ wrapper to the module; the documented surface
    `dpst_tpu.autotune(...)` must keep working (the module is callable —
    round-5 regression found the first time a full-suite run ordered
    test_autotune before test_weights_e2e)."""
    import dpst_tpu.autotune  # noqa: F401  (the rebinding import)
    import dpst_tpu

    assert callable(dpst_tpu.autotune)
