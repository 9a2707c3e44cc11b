"""Pin the bench config9 iso-loss protocol (VERDICT r4 weak #4) so its
semantics can't silently drift: the reported wall-clock must correspond
to a REAL runnable truncated schedule, which requires (a) the per-stage
`scale_iters` override to schedule exactly as specified, (b) the segment
records of `bench._timed_staged_run` to index the concatenated history
correctly, and (c) truncation at a segment boundary to reproduce the
full run's prefix bit-for-bit (CPU determinism)."""
import dataclasses

import numpy as np
import pytest

import bench
from dpst_tpu import StylizeConfig
from dpst_tpu.api import _scale_schedule


def test_scale_schedule_scale_iters_explicit():
    cfg = StylizeConfig(iterations=999, scales=(32, 48, 64),
                        scale_iters=(3, 5, 7))
    assert _scale_schedule(cfg, (64, 64)) == [(32, 32, 3), (48, 48, 5),
                                              (64, 64, 7)]


def test_scale_schedule_scale_iters_clamp_merge():
    # both entries clamp to the native 48² -> one merged stage, iters
    # summed (same merge rule as the factor formula)
    cfg = StylizeConfig(iterations=999, scales=(64, 128),
                        scale_iters=(5, 7))
    assert _scale_schedule(cfg, (48, 48)) == [(48, 48, 12)]


def test_scale_iters_validation():
    with pytest.raises(ValueError, match="scale_iters"):
        StylizeConfig(scales=(32, 64), scale_iters=(3,))
    with pytest.raises(ValueError, match="scale_iters"):
        StylizeConfig(scales=(32, 64), scale_iters=(3, 0))


def test_scale_iters_not_in_jit_keys():
    # the hot loop and the precompute never read the schedule — two
    # configs differing only in scale_iters must share both jit keys
    # (CLAUDE.md rule 7)
    a = StylizeConfig(scales=(32, 64), scale_iters=(3, 5))
    b = StylizeConfig(scales=(32, 64), scale_iters=(7, 9))
    assert a.loop_config() == b.loop_config()
    assert a.prepare_config() == b.prepare_config()


@pytest.fixture(scope="module")
def tiny():
    content, style = bench._pair(64, 64)
    masks = np.ones((1, 64, 64), np.float32)
    cfg = StylizeConfig(
        use_segmentation=False, use_photorealism=False,
        compute_dtype="float32", intermediate_interval=2,
        iterations=8, scales=(32, 64), scale_iters=(3, 5))
    return content, style, masks, cfg


def test_records_index_history(tiny):
    content, style, masks, cfg = tiny
    wall, recs, hist = bench._timed_staged_run(
        content, style, masks, masks.copy(), cfg)
    # stage 1: 3 iters chunked at 2 -> boundaries at global 2, 3;
    # stage 2: 5 iters -> global 5, 7, 8
    assert [s for s, _, _ in recs] == [2, 3, 5, 7, 8]
    assert hist.shape[0] == 8
    for step, _, loss in recs:
        assert loss == hist[step - 1, 0]
    # cumulative walls are nondecreasing and bounded by the total
    walls = [w for _, w, _ in recs]
    assert walls == sorted(walls) and walls[-1] <= wall


def test_truncated_schedule_is_prefix(tiny):
    content, style, masks, cfg = tiny
    _, _, hist_full = bench._timed_staged_run(
        content, style, masks, masks.copy(), cfg)
    cfg_cut = dataclasses.replace(cfg, scale_iters=(3, 2))
    _, _, hist_cut = bench._timed_staged_run(
        content, style, masks, masks.copy(), cfg_cut)
    np.testing.assert_array_equal(hist_cut, hist_full[:5])


def test_iso_cross():
    recs = [(2, 1.0, 50.0), (3, 1.5, 40.0),      # coarse stages
            (5, 2.0, 45.0), (7, 3.0, 30.0), (8, 3.5, 32.0)]
    # target met at the first FINAL-stage boundary at/below it
    assert bench._iso_cross(recs, 3, 31.0) == (4, 3.0)
    # coarse-stage losses are a different objective — never counted,
    # even when numerically below the target
    assert bench._iso_cross(recs, 3, 44.0) == (4, 3.0)
    assert bench._iso_cross(recs, 3, 10.0) is None
