"""The config-2 layout anchor: a ZERO Laplacian term with exact-zero
loss and gradient (ARCHITECTURE.md round-3 config-2 anomaly).

On TPU, dropping the photorealism term made the step ~12% SLOWER than
config3 (XLA flips the s2b strip-backward layout without the image-space
gradient consumer). The fix keeps the term with `lap.zero_stats` when
photorealism is off but the strip path is active. These tests pin:
the zero operator is exactly zero (value AND gradient, both impls),
the anchored loop is bit-identical to the unanchored one, and
`lap_anchor_active` gates on exactly the measured regime.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dpst_tpu
from dpst_tpu import optimize
from dpst_tpu.ops import laplacian as lap


def test_zero_stats_matvec_and_grad_exactly_zero():
    r = np.random.default_rng(0)
    v = jnp.asarray(r.normal(size=(24, 20, 3)).astype(np.float32))
    stats = lap.zero_stats(24, 20)
    y = lap.matvec_xla(stats, v)
    assert np.all(np.asarray(y) == 0.0)

    def loss(img):
        return lap.photoreal_loss(stats, img, impl="xla")

    val, g = jax.value_and_grad(loss)(v)
    assert float(val) == 0.0
    assert np.all(np.asarray(g) == 0.0)


def test_zero_stats_pallas_interpret_exactly_zero():
    from dpst_tpu.ops.laplacian_pallas import matvec_pallas

    r = np.random.default_rng(1)
    v = jnp.asarray(r.normal(size=(16, 128, 3)).astype(np.float32))
    y = matvec_pallas(lap.zero_stats(16, 128), v)  # interpret off-TPU
    assert np.all(np.asarray(y) == 0.0)


def _loop_hist(cfg, consts, image, steps=5):
    loop_cfg = cfg.loop_config()
    weights = optimize.LossWeights.from_config(cfg)
    from dpst_tpu.models import vgg

    params = vgg.get_params(seed=0)
    opt = optimize.make_optimizer(loop_cfg)
    st = optimize.init_opt_state(opt, loop_cfg, image)
    img, _, hist = optimize.run_segment(image, st, consts, weights,
                                        params, n_steps=steps, cfg=loop_cfg)
    return np.asarray(img), np.asarray(hist)


def test_anchored_loop_bit_identical_to_unanchored():
    """run_segment with zero_stats == run_segment with stats=None,
    bit for bit (image and all history terms), photoreal term == 0."""
    r = np.random.default_rng(2)
    content = r.uniform(0, 255, (64, 64, 3)).astype(np.float32)
    style = r.uniform(0, 255, (64, 64, 3)).astype(np.float32)
    masks = np.ones((1, 64, 64), np.float32)
    cfg = dpst_tpu.StylizeConfig(use_segmentation=True,
                                 use_photorealism=False, max_classes=1,
                                 compute_dtype="float32", iterations=5)
    from dpst_tpu.models import vgg

    params = vgg.get_params(seed=0)
    consts = dpst_tpu.prepare_constants(
        jnp.asarray(content), jnp.asarray(style), jnp.asarray(masks),
        jnp.asarray(masks.copy()), cfg, params)
    assert consts.lap_stats is None          # CPU: anchor inactive
    image = optimize.init_image(cfg, jnp.asarray(content))

    img_none, hist_none = _loop_hist(cfg, consts, image)
    consts_anch = consts._replace(lap_stats=lap.zero_stats(64, 64))
    img_anch, hist_anch = _loop_hist(cfg, consts_anch, image)

    assert np.array_equal(img_none, img_anch)
    assert np.array_equal(hist_none, hist_anch)
    assert np.all(hist_anch[:, 3] == 0.0)    # photoreal term exact 0


def test_lap_anchor_active_gates_on_the_measured_regime(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    cfg2 = dpst_tpu.StylizeConfig(use_segmentation=True,
                                  use_photorealism=False, max_classes=4)
    assert optimize.lap_anchor_active(cfg2, 512, 512)
    # photorealism on -> real stats, no anchor
    assert not optimize.lap_anchor_active(
        dataclasses.replace(cfg2, use_photorealism=True), 512, 512)
    # 256²: auto s2b is off -> no strip backward to anchor
    assert not optimize.lap_anchor_active(cfg2, 256, 256)
    # strips explicitly off
    assert not optimize.lap_anchor_active(
        dataclasses.replace(cfg2, s2b_strips=0), 512, 512)
    # 4096²: blocks 1-2 stream (no s2b backward in the program)
    assert not optimize.lap_anchor_active(cfg2, 4096, 4096)
    # CPU backend
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert not optimize.lap_anchor_active(cfg2, 512, 512)


def test_prepare_constants_zero_mode_builds_zero_stats(monkeypatch):
    """With the anchor active, prepare_constants supplies zero stats
    (not real ones) and the loop's photoreal term is exactly zero."""
    from dpst_tpu import api

    monkeypatch.setattr(optimize, "lap_anchor_active",
                        lambda cfg, h, w: True)
    r = np.random.default_rng(3)
    content = r.uniform(0, 255, (64, 64, 3)).astype(np.float32)
    style = r.uniform(0, 255, (64, 64, 3)).astype(np.float32)
    masks = np.ones((1, 64, 64), np.float32)
    cfg = dpst_tpu.StylizeConfig(use_segmentation=True,
                                 use_photorealism=False, max_classes=1,
                                 compute_dtype="float32", iterations=5)
    from dpst_tpu.models import vgg

    params = vgg.get_params(seed=0)
    consts = api.prepare_constants(
        jnp.asarray(content), jnp.asarray(style), jnp.asarray(masks),
        jnp.asarray(masks.copy()), cfg, params)
    assert consts.lap_stats is not None
    for leaf in jax.tree.leaves(consts.lap_stats):
        assert np.all(np.asarray(leaf) == 0.0)
    image = optimize.init_image(cfg, jnp.asarray(content))
    _, hist = _loop_hist(cfg, consts, image)
    assert np.all(hist[:, 3] == 0.0)
    assert np.all(np.isfinite(hist))
