"""End-to-end stylize() smoke + integration (BASELINE configs 1 & 3 at toy
resolution, CPU)."""
import numpy as np
import pytest

from dpst_tpu import StylizeConfig, stylize


@pytest.fixture(scope="module")
def pair():
    r = np.random.default_rng(21)
    content = r.uniform(0, 255, (32, 32, 3)).astype(np.float32)
    style = r.uniform(0, 255, (40, 48, 3)).astype(np.float32)
    return content, style


def test_config1_end_to_end(pair):
    """Content + Gram style only (BASELINE config 1 shape)."""
    content, style = pair
    cfg = StylizeConfig(use_segmentation=False, use_photorealism=False,
                        compute_dtype="float32", iterations=15)
    out, hist = stylize(content, style, cfg, return_history=True)
    assert out.shape == content.shape
    assert out.dtype == np.float32
    assert np.all(np.isfinite(out))
    assert out.min() >= 0.0 and out.max() <= 255.0
    assert hist.shape == (15, 5)
    assert hist[-1, 0] < hist[0, 0]


def test_full_pipeline_with_photorealism(pair):
    """Laplacian photorealism term active (BASELINE config 3 shape)."""
    content, style = pair
    cfg = StylizeConfig(use_segmentation=False, use_photorealism=True,
                        laplacian_impl="xla", compute_dtype="float32",
                        iterations=10, regularization_weight=100.0)
    out, hist = stylize(content, style, cfg, return_history=True)
    assert np.all(np.isfinite(out))
    assert np.all(hist[:, 3] >= -1e-4)  # photoreal term is a PSD quadratic


def test_external_masks(pair):
    """User-supplied segmentation masks (SURVEY.md §7 step 2 entry point)."""
    content, style = pair
    cmask = np.zeros((4, 32, 32), np.float32)
    cmask[0, :16] = 1.0
    cmask[1, 16:] = 1.0
    smask = np.zeros((4, 40, 48), np.float32)
    smask[0, :, :24] = 1.0
    smask[1, :, 24:] = 1.0
    cfg = StylizeConfig(use_segmentation=True, use_photorealism=False,
                        compute_dtype="float32", iterations=10,
                        max_classes=4)
    out = stylize(content, style, cfg, content_masks=cmask,
                  style_masks=smask)
    assert out.shape == content.shape
    assert np.all(np.isfinite(out))


def test_paper_style_norm_end_to_end(pair):
    """Reference-exact normalization mode converges end to end; the two
    modes genuinely optimize different objectives."""
    content, style = pair
    cfg = StylizeConfig(use_segmentation=False, use_photorealism=False,
                        compute_dtype="float32", iterations=10,
                        style_norm="paper", style_weight=1e-4)
    out, hist = stylize(content, style, cfg, return_history=True)
    assert np.all(np.isfinite(out))
    assert hist[-1, 0] < hist[0, 0]
    cfg_g = StylizeConfig(use_segmentation=False, use_photorealism=False,
                          compute_dtype="float32", iterations=10)
    _, hist_g = stylize(content, style, cfg_g, return_history=True)
    assert not np.isclose(hist[0, 2], hist_g[0, 2])  # style terms differ


def test_one_sided_masks_raise(pair):
    """Exactly one of content_masks/style_masks is an error — the class
    channels must be aligned, and silently recomputing the provided
    side (round-1 behavior) discarded user input (ADVICE r1)."""
    content, style = pair
    cmask = np.ones((1, 32, 32), np.float32)
    cfg = StylizeConfig(use_segmentation=False, use_photorealism=False,
                        compute_dtype="float32", iterations=2)
    with pytest.raises(ValueError, match="must be provided together"):
        stylize(content, style, cfg, content_masks=cmask)
    with pytest.raises(ValueError, match="must be provided together"):
        stylize(content, style, cfg, style_masks=cmask)


def test_multiscale(pair):
    content, style = pair
    cfg = StylizeConfig(use_segmentation=False, use_photorealism=False,
                        compute_dtype="float32", iterations=5,
                        scales=(16, 32))
    out = stylize(content, style, cfg)
    assert out.shape == content.shape
    assert np.all(np.isfinite(out))


def test_scale_schedule_invariants():
    """No stage exceeds native; duplicates merge; final stage is native
    (VERDICT r1 #8)."""
    from dpst_tpu.api import _scale_schedule

    # scales above the native size clamp to it and merge
    cfg = StylizeConfig(iterations=100, scales=(256, 512, 1024))
    stages = _scale_schedule(cfg, (512, 384))
    assert stages == [(256, 192, 100), (512, 384, 200)]
    assert all(h <= 512 and w <= 384 for h, w, _ in stages)

    # all-coarser schedule still finishes at the native size
    cfg2 = StylizeConfig(iterations=50, scales=(128, 256))
    stages2 = _scale_schedule(cfg2, (512, 512))
    assert stages2[-1][:2] == (512, 512)
    assert stages2[0][:2] == (128, 128)

    # iteration decay applies per original schedule position
    cfg3 = StylizeConfig(iterations=100, scales=(256, 512),
                         scale_iter_factor=0.5)
    stages3 = _scale_schedule(cfg3, (512, 512))
    assert stages3 == [(256, 256, 50), (512, 512, 100)]


def test_multiscale_output_matches_requested_size(pair):
    """Oversized scales entries must not inflate the output shape."""
    content, style = pair
    cfg = StylizeConfig(use_segmentation=False, use_photorealism=False,
                        compute_dtype="float32", iterations=3,
                        scales=(16, 32, 64))   # 64 > the 32px content
    out = stylize(content, style, cfg)
    assert out.shape == content.shape


def test_multiscale_per_stage_resume(pair, tmp_path):
    """A resumed multi-scale run restores every completed stage from its
    own checkpoint key instead of redoing coarse stages."""
    import os
    content, style = pair
    ckdir = str(tmp_path / "ck")
    cfg = StylizeConfig(use_segmentation=False, use_photorealism=False,
                        compute_dtype="float32", iterations=6,
                        scales=(16, 32), checkpoint_dir=ckdir,
                        intermediate_interval=3)
    out1, hist1 = stylize(content, style, cfg, return_history=True)
    stage_dirs = sorted(os.listdir(ckdir))
    assert stage_dirs == ["stage0_16x16", "stage1_32x32"]
    assert len(hist1) == 12

    out2, hist2 = stylize(content, style, cfg, resume=True,
                          return_history=True)
    assert len(hist2) == 0          # nothing re-run, every stage restored
    np.testing.assert_allclose(out2, out1, atol=1e-4)


def test_size_argument(pair):
    content, style = pair
    cfg = StylizeConfig(use_segmentation=False, use_photorealism=False,
                        compute_dtype="float32", iterations=3)
    out = stylize(content, style, cfg, size=(24, 24))
    assert out.shape == (24, 24, 3)


def test_presets_valid():
    from dpst_tpu import PRESETS, StylizeConfig
    assert set(PRESETS) == {f"config{i}" for i in range(1, 6)}
    for cfg in PRESETS.values():
        assert isinstance(cfg, StylizeConfig)
        hash(cfg)  # jit-static requirement


def test_profile_dir_library_path(pair, tmp_path):
    import os
    content, style = pair
    from dpst_tpu import StylizeConfig, stylize
    d = str(tmp_path / "prof")
    cfg = StylizeConfig(use_segmentation=False, use_photorealism=False,
                        compute_dtype="float32", iterations=3,
                        profile_dir=d)
    out = stylize(content, style, cfg)
    assert out.shape == content.shape
    files = [f for r, _, fs in os.walk(d) for f in fs]
    assert files, "no profiler trace written via cfg.profile_dir"


def test_top_level_exports():
    import dpst_tpu
    for name in ("stylize", "prepare_constants", "StylizeConfig",
                 "PRESETS", "autotune", "stylize_batch"):
        assert hasattr(dpst_tpu, name), name
