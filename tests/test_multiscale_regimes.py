"""Multi-scale schedules that CROSS the per-shape lowering gates
(s2b strips / s2d block 1 / stream12 streaming) must resolve each
stage's regime independently and leave the trajectory unchanged
(VERDICT r3 item 2: the schedule's stages span regimes — e.g. 1024²
standard -> 4096² streamed — and nothing pinned that composition).

Two halves:
  * gate resolution — pure-Python checks of the documented TPU auto
    ladder at the exact stage shapes a high-res schedule emits
    (backend monkeypatched to "tpu"; no computation runs);
  * trajectory equivalence — real CPU runs where an EXPLICIT strip /
    stream count crosses its validity gate between stages (the gates'
    shape conditions, not the TPU check, flip the regime), compared
    against the regime-off run. The lowerings are exact, so the
    multi-scale histories must match.
"""
import dataclasses

import numpy as np
import pytest

from dpst_tpu import StylizeConfig, stylize


@pytest.fixture(scope="module")
def pair():
    r = np.random.default_rng(7)
    content = r.uniform(0, 255, (64, 64, 3)).astype(np.float32)
    style = r.uniform(0, 255, (64, 64, 3)).astype(np.float32)
    return content, style


BASE = dict(use_segmentation=False, use_photorealism=False,
            compute_dtype="float32", iterations=4)


def test_schedule_stages_resolve_their_own_regimes(monkeypatch):
    """A 4096²-native coarse-to-fine schedule crosses every auto gate;
    each stage must land in its documented regime (ARCHITECTURE.md):
      256²  — standard convs (no strips, no s2d, no streaming)
      1024² — s2b strips + s2d block 1 + s2d-Gram kernel, no streaming
      4096² — stream12 (128-row strips)
    """
    import jax

    from dpst_tpu import optimize
    from dpst_tpu.api import _scale_schedule
    from dpst_tpu.models import vgg

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    cfg = StylizeConfig(scales=(256, 1024, 4096), iterations=100)
    stages = _scale_schedule(cfg, (4096, 4096))
    assert [s[:2] for s in stages] == [(256, 256), (1024, 1024),
                                       (4096, 4096)]
    layers = tuple(dict.fromkeys(cfg.style_layers + cfg.content_layers))

    regimes = {}
    for h, w, _ in stages:
        s2b = vgg._resolve_s2b(cfg.s2b_strips, h, w)
        regimes[h] = dict(
            s2b=vgg._s2b_enabled(s2b, (1, h, w, 3), layers),
            s2d=vgg._resolve_block1(cfg.block1_impl, h, w),
            s2d_kernel=optimize._s2d_gram_kernel(cfg, h, w, k=4),
            stream=vgg.stream12_strips(cfg.stream12, h, w),
        )
    assert regimes[256] == dict(s2b=False, s2d=False, s2d_kernel=False,
                                stream=0)
    assert regimes[1024] == dict(s2b=True, s2d=True, s2d_kernel=True,
                                 stream=0)
    # at 4096² streaming takes over blocks 1-2 entirely
    assert regimes[4096]["stream"] == 4096 // 128
    assert vgg.stream12_compatible(layers, regimes[4096]["stream"],
                                   (4096, 4096, 3))
    # 2048² sits between: standard path, but the s2d-Gram kernel route
    # (past the fused block bound) keeps s2d alive (campaign #12)
    assert vgg.stream12_strips(cfg.stream12, 2048, 2048) == 0
    assert vgg._resolve_block1(cfg.block1_impl, 2048, 2048)
    assert optimize._s2d_gram_kernel(cfg, 2048, 2048, k=4)


def test_multiscale_crossing_s2b_gate_matches_unstripped(pair):
    """scales=(32, 64) with s2b_strips=2: stage 1 (32²) is below the
    strip path's minimum strip height (hs=16 < 4·halo) so it runs the
    standard path; stage 2 (64²) strips. The decomposition is exact, so
    the multi-scale trajectory must match the strips-off run."""
    from dpst_tpu.models import vgg

    content, style = pair
    layers = ("conv1_1", "conv2_1", "conv3_1", "conv4_1", "conv5_1",
              "conv4_2")
    # the gate genuinely flips between the two stages
    assert not vgg._s2b_enabled(2, (1, 32, 32, 3), layers)
    assert vgg._s2b_enabled(2, (1, 64, 64, 3), layers)

    cfg_on = StylizeConfig(**BASE, scales=(32, 64), s2b_strips=2)
    cfg_off = StylizeConfig(**BASE, scales=(32, 64), s2b_strips=0)
    out_on, h_on = stylize(content, style, cfg_on, return_history=True)
    out_off, h_off = stylize(content, style, cfg_off, return_history=True)
    assert h_on.shape == h_off.shape == (8, 5)
    np.testing.assert_allclose(h_on[:, 0], h_off[:, 0], rtol=1e-3)
    np.testing.assert_allclose(out_on, out_off, rtol=5e-2, atol=2.0)


def test_multiscale_crossing_stream12_gate_matches_standard(pair):
    """scales=(32, 64) with stream12=2: stage 1 (32²) is below the
    streaming path's minimum strip height so blocks 1-2 materialize;
    stage 2 (64²) streams them as Grams + pool2 inside the checkpointed
    scan. Loss/grad are ≡ the standard path (tests/test_stream12.py),
    so the multi-scale trajectory must match streaming-off."""
    from dpst_tpu.models import vgg

    content, style = pair
    cfg_on = StylizeConfig(**BASE, scales=(32, 64), stream12=2)
    layers = tuple(dict.fromkeys(
        cfg_on.style_layers + cfg_on.content_layers))
    assert not vgg.stream12_compatible(layers, 2, (32, 32, 3))
    assert vgg.stream12_compatible(layers, 2, (64, 64, 3))

    cfg_off = StylizeConfig(**BASE, scales=(32, 64), stream12=0)
    out_on, h_on = stylize(content, style, cfg_on, return_history=True)
    out_off, h_off = stylize(content, style, cfg_off, return_history=True)
    np.testing.assert_allclose(h_on[:, 0], h_off[:, 0], rtol=1e-3)
    np.testing.assert_allclose(out_on, out_off, rtol=5e-2, atol=2.0)


def test_multiscale_crossing_both_gates_with_photorealism(pair):
    """Full deep-photo loss across the same crossing (the Laplacian term
    resizes per stage too) — strips+streaming on vs off."""
    content, style = pair
    base = dict(BASE, use_photorealism=True, laplacian_impl="xla",
                iterations=3)
    cfg_on = StylizeConfig(**base, scales=(32, 64), s2b_strips=2,
                           stream12=2)
    cfg_off = StylizeConfig(**base, scales=(32, 64))
    out_on, h_on = stylize(content, style, cfg_on, return_history=True)
    out_off, h_off = stylize(content, style, cfg_off, return_history=True)
    np.testing.assert_allclose(h_on[:, 0], h_off[:, 0], rtol=1e-3)
    np.testing.assert_allclose(out_on, out_off, rtol=5e-2, atol=2.0)
