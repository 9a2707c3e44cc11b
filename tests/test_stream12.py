"""Block-1/2 activation streaming (vgg.stream_block12_grams) — the
≥3072²-class single-chip memory path (VERDICT r2 missing #5): the
strip-streamed loss must equal the standard full-tensor loss in VALUE
and GRADIENT, because it is the same math in a different schedule."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dpst_tpu import StylizeConfig, optimize, prepare_constants
from dpst_tpu.models import vgg


@pytest.fixture(scope="module")
def setup():
    r = np.random.default_rng(17)
    h = w = 96
    content = r.uniform(0, 255, (h, w, 3)).astype(np.float32)
    style = r.uniform(0, 255, (h, w, 3)).astype(np.float32)
    masks = np.zeros((2, h, w), np.float32)
    masks[0, :48] = 1.0
    masks[1, 48:] = 1.0
    params = vgg.init_params(seed=0)
    cfg = StylizeConfig(use_segmentation=True, use_photorealism=True,
                        laplacian_impl="xla", compute_dtype="float32",
                        max_classes=2, iterations=4, stream12=0)
    consts = prepare_constants(
        jnp.asarray(content), jnp.asarray(style), jnp.asarray(masks),
        jnp.asarray(masks.copy()), cfg, params)
    weights = optimize.LossWeights.from_config(cfg)
    return content, cfg, consts, weights, params


def _value_grad(cfg, image, consts, weights, params):
    fn = optimize.make_loss_fn(cfg.loop_config())
    (total, terms), g = jax.value_and_grad(fn, has_aux=True)(
        jnp.asarray(image), consts, weights, params)
    return np.asarray(total), np.asarray(terms), np.asarray(g)


def test_stream12_loss_and_grad_match_standard(setup):
    content, cfg, consts, weights, params = setup
    t0, terms0, g0 = _value_grad(cfg, content, consts, weights, params)
    cfg_s = dataclasses.replace(cfg, stream12=3)   # 32-row strips
    t1, terms1, g1 = _value_grad(cfg_s, content, consts, weights, params)
    np.testing.assert_allclose(t1, t0, rtol=1e-5)
    np.testing.assert_allclose(terms1, terms0, rtol=1e-5)
    np.testing.assert_allclose(g1, g0, rtol=1e-3, atol=1e-6 * np.abs(
        g0).max())


def test_stream12_s2d_block1_matches_standard(setup):
    """block1_impl="s2d" inside the strip scan (conv1_1 as the stride-2
    4×4 K4 conv, pool1 a parity max, conv1_1's Gram from the four parity
    lane-slices via the nd analytic VJP) is the same math in a different
    lowering — value and gradient must match the standard path to fp
    summation order."""
    content, cfg, consts, weights, params = setup
    t0, terms0, g0 = _value_grad(cfg, content, consts, weights, params)
    cfg_s = dataclasses.replace(cfg, stream12=3, block1_impl="s2d")
    t1, terms1, g1 = _value_grad(cfg_s, content, consts, weights, params)
    np.testing.assert_allclose(t1, t0, rtol=1e-5)
    # atol: a 0-valued term (content at init) may come back as ~1e-8 of
    # fp32 dust from the s2d form's different summation order
    np.testing.assert_allclose(terms1, terms0, rtol=1e-5,
                               atol=1e-6 * abs(t0))
    np.testing.assert_allclose(g1, g0, rtol=1e-3,
                               atol=1e-5 * np.abs(g0).max())
    # avg pooling rides the s2d parity-mean lowering
    cfg_a = dataclasses.replace(cfg, pooling="avg")
    consts_a = prepare_constants(
        jnp.asarray(content), jnp.asarray(content[::-1].copy()),
        jnp.asarray(np.asarray(consts.masks["conv1_1"])),
        jnp.asarray(np.asarray(consts.masks["conv1_1"])), cfg_a, params)
    ta, _, ga = _value_grad(cfg_a, content, consts_a, weights, params)
    tk, _, gk = _value_grad(
        dataclasses.replace(cfg_a, stream12=3, block1_impl="s2d"),
        content, consts_a, weights, params)
    np.testing.assert_allclose(tk, ta, rtol=1e-5)
    np.testing.assert_allclose(gk, ga, rtol=1e-3,
                               atol=1e-5 * np.abs(ga).max())


def test_stream12_remat_b2_bit_identical(setup):
    """stream12_remat="b2" (campaign #18: the strip backward saves the
    block-2 conv outputs + pool results instead of re-running them)
    changes only WHEN values are computed, never what — value and
    gradient must be BIT-identical to the full-remat scan on CPU, in
    both block-1 lowerings. (On TPU the saved vs recomputed convs get
    different MXU accumulation schedules, so gradients there match
    only to ~1 bf16 ulp per element — measured on chip @512²: value
    bit-identical, grad 0.27% rms / 0.45% max rel-to-scale.)"""
    content, cfg, consts, weights, params = setup
    for b1 in ("conv", "s2d"):
        cfg_f = dataclasses.replace(cfg, stream12=3, block1_impl=b1,
                                    stream12_remat="full")
        t0, terms0, g0 = _value_grad(cfg_f, content, consts, weights,
                                     params)
        # "b12"/"b12f" extend the saved set into block 1 (round-4
        # roofline harvest candidates) — same equivalence contract
        for mode in ("b2", "b12", "b12f"):
            cfg_b = dataclasses.replace(cfg_f, stream12_remat=mode)
            t1, terms1, g1 = _value_grad(cfg_b, content, consts,
                                         weights, params)
            np.testing.assert_array_equal(t1, t0, err_msg=f"{b1}/{mode}")
            np.testing.assert_array_equal(terms1, terms0,
                                          err_msg=f"{b1}/{mode}")
            np.testing.assert_array_equal(g1, g0, err_msg=f"{b1}/{mode}")


def test_stream12_conv2_dot_grams_and_pool2_exact(setup):
    """stream12_conv2="dot" (campaign #19: block-2 convs as flat
    offset-slice matmuls — one row-major padded grid through conv2_1 →
    conv2_2 → pool2, Grams fed grid-layout masks with zeros at
    pads/halo) is the same math in a different lowering. At the
    `stream_block12_grams` level — where no downstream relu/max-pool
    branch can amplify summation-order dust — value AND gradient of
    every output (both block-2 Grams + a random pool2 cotangent) must
    match the conv form to fp rounding, across block-1 lowerings,
    remat modes and poolings."""
    content, cfg, consts, weights, params = setup
    r = np.random.default_rng(3)
    img = jnp.asarray(content)
    gl = ("conv1_1", "conv2_1", "conv2_2")
    masks = {}
    for layer in gl:
        f = vgg.layer_downsample_factor(layer)
        m = r.uniform(0, 1, (2, 96 // f, 96 // f)).astype(np.float32)
        masks[layer] = jnp.asarray(m / m.sum(0, keepdims=True))
    cts = {l: jnp.asarray(r.normal(size=(
        2, vgg.CONV_SHAPES[l][1], vgg.CONV_SHAPES[l][1])
        ).astype(np.float32)) for l in gl}
    ct_p2 = jnp.asarray(np.random.default_rng(7).normal(
        size=(1, 24, 24, 128)).astype(np.float32))

    def outputs(impl, b1, remat, pooling):
        g, p2 = vgg.stream_block12_grams(
            params, img, masks, strips=3, gram_layers=gl,
            pooling=pooling, compute_dtype="float32",
            pool_impl="auto", block1_impl=b1, remat_mode=remat,
            conv2_impl=impl)
        return {**{l: np.asarray(g[l]) for l in gl},
                "pool2": np.asarray(p2)}

    def grad(impl, which, b1, remat, pooling):
        def loss(im):
            g, p2 = vgg.stream_block12_grams(
                params, im, masks, strips=3, gram_layers=gl,
                pooling=pooling, compute_dtype="float32",
                pool_impl="auto", block1_impl=b1, remat_mode=remat,
                conv2_impl=impl)
            if which == "pool2":
                return jnp.sum(p2 * ct_p2)
            return jnp.sum(g[which] * cts[which])
        return np.asarray(jax.grad(loss)(img))

    for b1, remat, pooling in (("conv", "b2", "max"),
                               ("s2d", "full", "max"),
                               ("conv", "b2", "avg")):
        o0 = outputs("conv", b1, remat, pooling)
        o1 = outputs("dot", b1, remat, pooling)
        for k in o0:
            np.testing.assert_allclose(
                o1[k], o0[k], rtol=1e-4, atol=1e-5 * np.abs(o0[k]).max(),
                err_msg=f"{b1}/{remat}/{pooling}/{k} value")
        for which in ("conv2_1", "conv2_2", "pool2"):
            d0 = grad("conv", which, b1, remat, pooling)
            d1 = grad("dot", which, b1, remat, pooling)
            np.testing.assert_allclose(
                d1, d0, rtol=1e-3, atol=1e-5 * np.abs(d0).max(),
                err_msg=f"{b1}/{remat}/{pooling}/{which} grad")


def test_stream12_conv2_dot_full_loss(setup):
    """The dot lowering through the FULL deep-photo loss: values and
    terms tight; the image gradient compared in l2 with a bound that
    tolerates sparse branch flips. The two lowerings differ by fp
    summation order only, but pool2's ~1e-6 rel dust propagates into
    blocks 3-5 where a pre-activation sitting on zero flips ONE relu
    branch (measured: exactly one, at conv3_2) and reroutes O(1)
    gradient across its receptive field — same chaos class as the
    documented L-BFGS Wolfe-branch sensitivity. Exactness of the
    lowering itself is pinned branch-free by
    test_stream12_conv2_dot_grams_and_pool2_exact; measured l2rel here
    is 0.0035 (max pooling, both b1 modes) and 0.0 (avg)."""
    content, cfg, consts, weights, params = setup
    for b1 in ("conv", "s2d"):
        cfg_c = dataclasses.replace(cfg, stream12=3, block1_impl=b1,
                                    stream12_conv2="conv")
        cfg_d = dataclasses.replace(cfg_c, stream12_conv2="dot")
        t0, terms0, g0 = _value_grad(cfg_c, content, consts, weights,
                                     params)
        t1, terms1, g1 = _value_grad(cfg_d, content, consts, weights,
                                     params)
        np.testing.assert_allclose(t1, t0, rtol=1e-5)
        np.testing.assert_allclose(terms1, terms0, rtol=1e-5,
                                   atol=1e-6 * abs(t0))
        l2rel = np.linalg.norm(g1 - g0) / np.linalg.norm(g0)
        assert l2rel < 0.02, f"b1={b1}: grad l2rel {l2rel}"
    # avg pooling through the flat block-2 path
    cfg_a = dataclasses.replace(cfg, pooling="avg", stream12=3,
                                stream12_conv2="conv")
    cfg_b = dataclasses.replace(cfg_a, stream12_conv2="dot")
    ta, _, ga = _value_grad(cfg_a, content, consts, weights, params)
    tb, _, gb = _value_grad(cfg_b, content, consts, weights, params)
    np.testing.assert_allclose(tb, ta, rtol=1e-5)
    assert (np.linalg.norm(gb - ga) / np.linalg.norm(ga)) < 0.02


def test_stream12_k4_gate_is_per_strip(setup, monkeypatch):
    """The K4 matmul-dx gate inside the stream12 scan reads PER-STRIP
    pixels against its own scan-context crossover (k4_px/k4_max at the
    _block1_s2d call site — VERDICT r4 weak #3; the round-5 chip A/B
    measured that crossover at 0, i.e. the emitter dx wins in-scan:
    1.402 vs 1.419 it/s @4096²). Pin (a) the gate unit — with the STRIP
    threshold set BETWEEN strip px and image px, the matmul path must
    activate (a full-image gate would not) — and (b) the exactness of
    both gate sides against the standard full-tensor path, including
    the production default (strip crossover 0 -> emitter)."""
    content, cfg, consts, weights, params = setup
    t0, terms0, g0 = _value_grad(cfg, content, consts, weights, params)
    cfg_s = dataclasses.replace(cfg, stream12=3, block1_impl="s2d")
    # strips: 3 × (32+16) rows × 96 cols = 4608 px; image: 96² = 9216
    strip_px = (96 // 3 + 2 * vgg._S2B_HALO) * 96
    img_px = 96 * 96
    assert strip_px < img_px

    calls = {"n": 0}
    real_k4 = vgg._k4_conv

    def counting_k4(x, k4):
        calls["n"] += 1
        return real_k4(x, k4)

    monkeypatch.setattr(vgg, "_k4_conv", counting_k4)

    # STRIP threshold between strip and image px: a per-strip gate takes
    # the matmul path, a full-image gate would not.
    # stream_block12_grams is itself @jax.jit — the gate constant isn't
    # in its cache key, so each threshold change must drop the cached
    # jaxpr or the spy sees a stale program (same mechanism the chip
    # campaign's A/B handles with clear_caches — CLAUDE.md rule 12:
    # a silent NON-retrace)
    monkeypatch.setattr(vgg, "_K4_MATMUL_BWD_MAX_STRIP",
                        (strip_px + img_px) // 2)
    jax.clear_caches()
    t1, terms1, g1 = _value_grad(cfg_s, content, consts, weights, params)
    assert calls["n"] > 0, "per-strip gate did not route to _k4_conv"
    np.testing.assert_allclose(t1, t0, rtol=1e-5)
    np.testing.assert_allclose(terms1, terms0, rtol=1e-5,
                               atol=1e-6 * abs(t0))
    np.testing.assert_allclose(g1, g0, rtol=1e-3,
                               atol=1e-5 * np.abs(g0).max())

    # the PRODUCTION default (strip crossover 0): the conv-emitter side
    # of the gate, same math (the two dx lowerings must agree through
    # the full loss)
    calls["n"] = 0
    monkeypatch.setattr(vgg, "_K4_MATMUL_BWD_MAX_STRIP", 0)
    jax.clear_caches()
    t2, terms2, g2 = _value_grad(cfg_s, content, consts, weights, params)
    assert calls["n"] == 0, "gate below strip px must use the emitter"
    np.testing.assert_allclose(t2, t0, rtol=1e-5)
    np.testing.assert_allclose(terms2, terms0, rtol=1e-5,
                               atol=1e-6 * abs(t0))
    np.testing.assert_allclose(g2, g0, rtol=1e-3,
                               atol=1e-5 * np.abs(g0).max())
    # drop programs traced under the test thresholds so later tests
    # never see a stale routing (values would still be exact, but the
    # cache must not outlive the monkeypatch)
    jax.clear_caches()


def test_stream12_s2d_rejects_conv1_2_tap():
    params = vgg.init_params(seed=0)
    m = {"conv1_2": jnp.ones((1, 96, 96), jnp.float32)}
    with pytest.raises(ValueError, match="s2d"):
        vgg.stream_block12_grams(
            params, jnp.zeros((96, 96, 3)), m, strips=3,
            gram_layers=("conv1_2",), block1_impl="s2d")


def test_stream12_paper_norm(setup):
    """m1 (paper) normalization streams too — the numerator is shared,
    only the divisor changes."""
    content, cfg, consts0, weights, params = setup
    cfg_p = dataclasses.replace(cfg, style_norm="paper")
    half = np.zeros((2, 96, 96), np.float32)
    half[0, :, :48] = 1.0
    half[1, :, 48:] = 1.0
    consts = prepare_constants(
        jnp.asarray(content), jnp.asarray(content[::-1].copy()),
        jnp.asarray(half), jnp.asarray(half.copy()), cfg_p, params)
    t0, _, g0 = _value_grad(cfg_p, content, consts, weights, params)
    cfg_s = dataclasses.replace(cfg_p, stream12=3)
    t1, _, g1 = _value_grad(cfg_s, content, consts, weights, params)
    np.testing.assert_allclose(t1, t0, rtol=1e-5)
    np.testing.assert_allclose(g1, g0, rtol=1e-3,
                               atol=1e-6 * np.abs(g0).max())


def test_stream12_optimization_trajectory(setup):
    """A short optimization run through run_segment matches the standard
    path (same math end to end, including the scan-of-scans backward)."""
    content, cfg, consts, weights, params = setup
    outs = {}
    for name, c in (("std", cfg),
                    ("stream", dataclasses.replace(cfg, stream12=3))):
        lc = c.loop_config()
        opt = optimize.make_optimizer(lc)
        img0 = optimize.init_image(c, jnp.asarray(content))
        st = optimize.init_opt_state(opt, lc, img0)
        img, _, hist = optimize.run_segment(
            img0, st, consts, weights, params, n_steps=4, cfg=lc)
        outs[name] = (np.asarray(img), np.asarray(hist))
    np.testing.assert_allclose(outs["stream"][1][:, 0],
                               outs["std"][1][:, 0], rtol=1e-4)
    np.testing.assert_allclose(outs["stream"][0], outs["std"][0],
                               rtol=1e-2, atol=0.5)


def test_stream12_incompatible_falls_back(setup):
    """A content tap inside blocks 1-2 cannot stream (needs the full
    tensor) — the loss builder must silently use the standard path and
    still produce the identical value."""
    content, cfg, _, weights, params = setup
    cfg_c = dataclasses.replace(cfg, content_layers=("conv2_2", "conv4_2"),
                                use_photorealism=False)
    consts = prepare_constants(
        jnp.asarray(content), jnp.asarray(content[::-1].copy()),
        jnp.asarray(np.ones((2, 96, 96), np.float32) * [[[1]], [[0]]]),
        jnp.asarray(np.ones((2, 96, 96), np.float32) * [[[1]], [[0]]]),
        cfg_c, params)
    t0, _, _ = _value_grad(cfg_c, content, consts, weights, params)
    t1, _, _ = _value_grad(dataclasses.replace(cfg_c, stream12=3),
                           content, consts, weights, params)
    np.testing.assert_allclose(t1, t0, rtol=1e-6)


def test_stream12_pallas_kernel_full_loss(setup):
    """stream12_impl="pallas" (the fused block-1/2 kernel,
    ops/block12_pallas.py) must reproduce the standard path's loss AND
    gradient — same contract as the scan lowering. 128² so the kernel's
    width/tile gates (W%128, H%32) hold; interpret mode off-TPU."""
    r = np.random.default_rng(23)
    h = w = 128
    content = r.uniform(0, 255, (h, w, 3)).astype(np.float32)
    style = r.uniform(0, 255, (h, w, 3)).astype(np.float32)
    masks = np.zeros((2, h, w), np.float32)
    masks[0, :, :64] = 1.0
    masks[1, :, 64:] = 1.0
    params = vgg.init_params(seed=0)
    cfg = StylizeConfig(use_segmentation=True, use_photorealism=True,
                        laplacian_impl="xla", compute_dtype="float32",
                        max_classes=2, iterations=4, stream12=0)
    consts = prepare_constants(
        jnp.asarray(content), jnp.asarray(style), jnp.asarray(masks),
        jnp.asarray(masks.copy()), cfg, params)
    weights = optimize.LossWeights.from_config(cfg)
    t0, terms0, g0 = _value_grad(cfg, content, consts, weights, params)
    cfg_k = dataclasses.replace(cfg, stream12=4,
                                stream12_impl="pallas")
    t1, terms1, g1 = _value_grad(cfg_k, content, consts, weights,
                                 params)
    np.testing.assert_allclose(t1, t0, rtol=1e-5)
    # atol: a 0-valued term (content at init) may come back as ~1e-8 of
    # fp32 dust from the kernel's different summation order
    np.testing.assert_allclose(terms1, terms0, rtol=1e-5,
                               atol=1e-6 * abs(t0))
    # max pool: a handful of elements (~0.01%) sit on window ties that
    # flip under the kernel's ulp-different recompute — a different
    # VALID subgradient (same class as the 'noties' lowering). The
    # tie-free avg-pool check below stays tight, pinning everything
    # else exactly.
    np.testing.assert_allclose(g1, g0, rtol=1e-3,
                               atol=5e-6 * np.abs(g0).max())
    # avg pooling lowering too
    cfg_a = dataclasses.replace(cfg, pooling="avg")
    consts_a = prepare_constants(
        jnp.asarray(content), jnp.asarray(style), jnp.asarray(masks),
        jnp.asarray(masks.copy()), cfg_a, params)
    ta, _, ga = _value_grad(cfg_a, content, consts_a, weights, params)
    cfg_ka = dataclasses.replace(cfg_a, stream12=4,
                                 stream12_impl="pallas")
    tk, _, gk = _value_grad(cfg_ka, content, consts_a, weights, params)
    np.testing.assert_allclose(tk, ta, rtol=1e-5)
    np.testing.assert_allclose(gk, ga, rtol=1e-3,
                               atol=1e-6 * np.abs(ga).max())


def test_stream12_config_canonicalization():
    assert StylizeConfig(stream12=1) == StylizeConfig(stream12=0)
    with pytest.raises(ValueError, match="stream12"):
        StylizeConfig(stream12=-2)
    # sharded entry points disable the strip scan
    assert StylizeConfig(stream12=8).spmd_safe().stream12 == 0
    # precompute doesn't read it
    assert (StylizeConfig(stream12=8).prepare_config()
            == StylizeConfig(stream12=0).prepare_config())
