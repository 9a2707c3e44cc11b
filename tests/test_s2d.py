"""Space-to-depth block 1 (vgg._block1_s2d, campaign #7): exactness.

The s2d path re-expresses conv1_1/conv1_2 as 2×2 convs between
half-cell-shifted s2d grids and pool1 as a parity max — the SAME
arithmetic per output pixel, so on CPU fp32 every stage must match the
direct path to float roundoff (summation order inside the contraction
differs, nothing else). Covers: the raw block driver vs direct convs,
strip-form extract_features, the full loss value+gradient, aligned-grid
(conv1_2) taps, avg pooling, and the pool tie rule.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dpst_tpu
from dpst_tpu import optimize, prepare_constants
from dpst_tpu.models import vgg


def _direct_block1(params, x, pooling="max"):
    """Reference block 1: SAME convs + bias + ReLU + 2×2 pool."""
    w11 = params["conv1_1"]["w"][:, :, ::-1, :]
    y = jax.lax.conv_general_dilated(
        x, w11, (1, 1), "SAME", dimension_numbers=vgg._DN,
        preferred_element_type=x.dtype)
    y = jnp.maximum(y + params["conv1_1"]["b"], 0.0)
    z = jax.lax.conv_general_dilated(
        y, params["conv1_2"]["w"].astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=vgg._DN, preferred_element_type=x.dtype)
    z = jnp.maximum(z + params["conv1_2"]["b"], 0.0)
    if pooling == "max":
        p = jax.lax.reduce_window(
            z, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    else:
        p = 0.25 * jax.lax.reduce_window(
            z, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return y, z, p


@pytest.mark.parametrize("pooling", ["max", "avg"])
def test_block_driver_matches_direct(pooling):
    """Plain-batch _block1_s2d ≡ direct convs at every stage."""
    r = np.random.default_rng(0)
    params = vgg.get_params(seed=0)
    x = jnp.asarray(r.normal(0, 50, (2, 16, 20, 3)), jnp.float32)
    y_ref, z_ref, p_ref = _direct_block1(params, x, pooling)
    taps, p = vgg._block1_s2d(
        params, x, ("conv1_1", "conv1_2"), pooling=pooling,
        cdt=jnp.float32, pool_impl="xla",
        base=np.zeros(2, np.int64), hi=16, halo_px=0, own_px=16)
    for t in taps.values():
        t.strip = False                      # plain batch, not strips
    np.testing.assert_allclose(
        np.asarray(taps["conv1_1"].plain()), np.asarray(y_ref),
        rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(taps["conv1_2"].plain()), np.asarray(z_ref),
        rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_ref),
                               rtol=1e-5, atol=1e-4)


def test_extract_features_strip_s2d_parity():
    """Strip-form s2d extract ≡ the direct path for every tap."""
    r = np.random.default_rng(3)
    img = r.uniform(0, 255, (256, 64, 3)).astype(np.float32)
    params = vgg.get_params(seed=0)
    layers = ("conv1_1", "conv2_1", "conv3_1", "conv4_2")
    ref = vgg.extract_features(params, jnp.asarray(img), layers,
                               s2b_strips=8, block1_impl="conv")
    out = vgg.extract_features(params, jnp.asarray(img), layers,
                               s2b_strips=8, block1_impl="s2d")
    for l in layers:
        a, b = np.asarray(out[l]), np.asarray(ref[l])
        assert a.shape == b.shape, l
        scale = max(np.max(np.abs(b)), 1.0)
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-5,
                                   err_msg=l)


BASE = dict(use_segmentation=True, use_photorealism=True, max_classes=2,
            compute_dtype="float32", s2b_strips=8)


def _val_grad(params, content, style, masks, **kw):
    cfg = dpst_tpu.StylizeConfig(**{**BASE, **kw})
    consts = prepare_constants(
        jnp.asarray(content), jnp.asarray(style), jnp.asarray(masks),
        jnp.asarray(masks), cfg, params)
    w = optimize.LossWeights.from_config(cfg)
    loss_fn = optimize.make_loss_fn(cfg.loop_config())
    (v, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
        jnp.asarray(content) + 3.0, consts, w, params)
    return np.asarray(v), np.asarray(g)


def _tall_pair():
    r = np.random.default_rng(11)
    content = r.uniform(0, 255, (256, 64, 3)).astype(np.float32)
    style = r.uniform(0, 255, (256, 64, 3)).astype(np.float32)
    masks = np.zeros((2, 256, 64), np.float32)
    masks[0, :128] = 1.0
    masks[1, 128:] = 1.0
    return content, style, masks


@pytest.mark.parametrize("kw", [
    {},                                       # odd-grid conv1_1 tap
    {"style_layers": ("conv1_1", "conv1_2", "conv2_1", "conv3_1",
                      "conv4_1", "conv5_1"),
     "style_layer_weights": (0.2,) * 6},      # + aligned-grid conv1_2 tap
    {"pooling": "avg"},
    {"pool_impl": "xla"},                     # no postact deferral
], ids=["default", "conv1_2-tap", "avgpool", "xla-pool"])
def test_s2d_full_loss_parity(kw):
    content, style, masks = _tall_pair()
    params = vgg.get_params(seed=0)
    v0, g0 = _val_grad(params, content, style, masks,
                       block1_impl="conv", **kw)
    v1, g1 = _val_grad(params, content, style, masks,
                       block1_impl="s2d", **kw)
    np.testing.assert_allclose(v1, v0, rtol=1e-5)
    scale = np.max(np.abs(g0))
    np.testing.assert_allclose(g1 / scale, g0 / scale, atol=1e-5)


@pytest.mark.parametrize("kw", [
    {},                                       # conv1_1 tap, K=2 masks
    {"style_layers": ("conv1_1", "conv1_2", "conv2_1", "conv3_1",
                      "conv4_1", "conv5_1"),
     "style_layer_weights": (0.2,) * 6},      # + conv1_2 tap
], ids=["default", "conv1_2-tap"])
def test_s2d_plain_batch_loss_parity(kw):
    """Campaign #8: the s2d path without the strip decomposition
    (strips=1, halo=0 — the regime the vmapped B-pair batch runs in)
    matches the direct convs on the full loss value + gradient."""
    content, style, masks = _tall_pair()
    params = vgg.get_params(seed=0)
    v0, g0 = _val_grad(params, content, style, masks,
                       s2b_strips=0, block1_impl="conv", **kw)
    v1, g1 = _val_grad(params, content, style, masks,
                       s2b_strips=0, block1_impl="s2d", **kw)
    np.testing.assert_allclose(v1, v0, rtol=1e-5)
    scale = np.max(np.abs(g0))
    np.testing.assert_allclose(g1 / scale, g0 / scale, atol=1e-5)


def test_s2d_batch_vmap_trajectory():
    """stylize_batch (vmapped per-pair loop, plain-batch s2d) tracks the
    direct path per pair."""
    from dpst_tpu.parallel.batch import stylize_batch
    content, style, masks = _tall_pair()
    contents = np.stack([content, np.flip(content, 0).copy()])
    styles = np.stack([style, style])
    bmask = np.stack([masks, masks])
    hists = {}
    for impl in ("conv", "s2d"):
        cfg = dpst_tpu.StylizeConfig(
            **{**BASE, "s2b_strips": 0}, block1_impl=impl, iterations=4)
        _, hist = stylize_batch(contents, styles, bmask, bmask, cfg=cfg)
        hists[impl] = np.asarray(hist)
    assert np.all(np.isfinite(hists["s2d"]))
    assert not np.allclose(hists["s2d"][0], hists["s2d"][1])  # distinct pairs
    np.testing.assert_allclose(hists["s2d"], hists["conv"],
                               rtol=1e-3, atol=1e-3)


def test_run_segment_s2d_plain_batch_trajectory():
    """run_segment with s2b off + s2d (strips=1/halo=0 precomputed mask
    grids via _with_s2d_masks) tracks the direct path."""
    content, style, masks = _tall_pair()
    params = vgg.get_params(seed=0)
    hists = {}
    for impl in ("conv", "s2d"):
        cfg = dpst_tpu.StylizeConfig(**{**BASE, "s2b_strips": 0},
                                     block1_impl=impl)
        consts = prepare_constants(
            jnp.asarray(content), jnp.asarray(style), jnp.asarray(masks),
            jnp.asarray(masks), cfg, params)
        loop = cfg.loop_config()
        opt = optimize.make_optimizer(loop)
        img = optimize.init_image(cfg, jnp.asarray(content))
        st = optimize.init_opt_state(opt, loop, img)
        _, _, hist = optimize.run_segment(
            img, st, consts, optimize.LossWeights.from_config(cfg),
            params, n_steps=5, cfg=loop)
        hists[impl] = np.asarray(hist)
    assert np.all(np.isfinite(hists["s2d"]))
    np.testing.assert_allclose(hists["s2d"], hists["conv"],
                               rtol=1e-3, atol=1e-3)


def test_k4_conv_matmul_vjp():
    """_k4_conv (campaign #9): forward equals the plain stride-2 conv
    bit-for-bit; the matmul-form input gradient matches autodiff of the
    plain conv to fp32 roundoff (odd grid dims exercise the shifted
    selection slices)."""
    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(0, 50, (2, 16, 20, 3)), jnp.float32)
    w3 = jnp.asarray(r.normal(0, 0.1, (3, 3, 3, 64)), jnp.float32)
    k4 = vgg._s2d_kernel4(w3)
    g = jnp.asarray(r.normal(size=(2, 9, 11, 256)), jnp.float32)

    def plain(t):
        return jax.lax.conv_general_dilated(
            t, k4, (2, 2), ((2, 2), (2, 2)), dimension_numbers=vgg._DN,
            preferred_element_type=t.dtype)

    np.testing.assert_array_equal(np.asarray(vgg._k4_conv(x, k4)),
                                  np.asarray(plain(x)))
    g0 = jax.grad(lambda t: jnp.vdot(plain(t), g))(x)
    g1 = jax.grad(lambda t: jnp.vdot(vgg._k4_conv(t, k4), g))(x)
    scale = np.max(np.abs(np.asarray(g0)))
    np.testing.assert_allclose(np.asarray(g1) / scale,
                               np.asarray(g0) / scale, atol=1e-5)


def test_parity_pool_tie_rule():
    """_parity_pool's VJP splits ties exactly like _maxpool2's."""
    r = np.random.default_rng(5)
    # quantized values force exact ties inside many windows
    x = jnp.asarray(np.round(r.uniform(0, 3, (1, 8, 8, 4))),
                    jnp.float32)
    g = jnp.asarray(r.normal(size=(1, 4, 4, 4)), jnp.float32)

    def via_pool(t):
        return jnp.vdot(vgg._maxpool2(t, "xla"), g)

    def via_parity(t):
        return jnp.vdot(vgg._parity_pool(vgg._s2d_cells(t), "xla"), g)

    np.testing.assert_allclose(np.asarray(jax.grad(via_pool)(x)),
                               np.asarray(jax.grad(via_parity)(x)),
                               rtol=1e-6)


def test_s2d_mask_flatten_consistency():
    """s2d_masks lines up with s2d_flatten: the masked Gram of the
    flattened tap equals the plain tap's masked Gram, both grids."""
    from dpst_tpu.ops import losses
    r = np.random.default_rng(9)
    s, own, halo, w, c = 4, 16, 8, 24, 8
    h = s * own
    mask = r.uniform(0, 1, (2, h, w)).astype(np.float32)
    for off in (-1, 0):
        nr = (own + 2 * halo) // 2 + (1 if off else 0)
        nc = w // 2 + (1 if off else 0)
        data = np.zeros((s, nr, nc, 4 * c), np.float32)
        plain = r.normal(size=(h, w, c)).astype(np.float32)
        # scatter the plain tap into the grid slots (loop = test oracle)
        for si in range(s):
            for o in range(nr):
                for p in range(2):
                    lr = 2 * o + p + off
                    gr = si * own - halo + lr
                    for oc in range(nc):
                        for pc in range(2):
                            lc = 2 * oc + pc + off
                            if 0 <= gr < h and 0 <= lc < w:
                                data[si, o, oc,
                                     (p * 2 + pc) * c:(p * 2 + pc + 1) * c
                                     ] = plain[gr, lc]
        tap = vgg.S2dTap(jnp.asarray(data), off, halo, own, w)
        f2d = vgg.s2d_flatten(tap)
        mfl = vgg.s2d_masks(jnp.asarray(mask), s, halo, off)
        assert f2d.shape[0] == mfl.shape[1]
        g1 = losses.masked_grams_flat(f2d, mfl, compute_dtype="float32")
        g0 = losses.masked_grams_fused(
            jnp.asarray(plain), jnp.asarray(mask),
            compute_dtype="float32")
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                   rtol=2e-5, err_msg=f"off={off}")
        # the per-parity lane-slice split (what the loss actually uses):
        # unflattened nd contraction, and the flat cross-check
        m_par = vgg.s2d_masks_par(jnp.asarray(mask), s, halo, off)
        g2 = losses.masked_grams_nd_multi(
            list(zip(vgg.s2d_slices_par(tap), m_par)),
            compute_dtype="float32")
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g0),
                                   rtol=2e-5, err_msg=f"nd off={off}")
        g3 = losses.masked_grams_flat_multi(
            list(zip(vgg.s2d_flatten_par(tap),
                     [m.reshape(m.shape[0], -1) for m in m_par])),
            compute_dtype="float32")
        np.testing.assert_allclose(np.asarray(g3), np.asarray(g0),
                                   rtol=2e-5, err_msg=f"flat off={off}")


def test_run_segment_s2d_trajectory():
    """run_segment with block1_impl="s2d" (which precomputes the
    per-parity mask grids via _with_s2d_masks) tracks the direct path's
    loss trajectory."""
    content, style, masks = _tall_pair()
    params = vgg.get_params(seed=0)
    hists = {}
    for impl in ("conv", "s2d"):
        cfg = dpst_tpu.StylizeConfig(**BASE, block1_impl=impl)
        consts = prepare_constants(
            jnp.asarray(content), jnp.asarray(style), jnp.asarray(masks),
            jnp.asarray(masks), cfg, params)
        loop = cfg.loop_config()
        opt = optimize.make_optimizer(loop)
        img = optimize.init_image(cfg, jnp.asarray(content))
        st = optimize.init_opt_state(opt, loop, img)
        _, _, hist = optimize.run_segment(
            img, st, consts, optimize.LossWeights.from_config(cfg),
            params, n_steps=5, cfg=loop)
        hists[impl] = np.asarray(hist)
    assert np.all(np.isfinite(hists["s2d"]))
    # fp32 summation-order noise compounds over steps; the tiny
    # photoreal term (~0.5 against a ~1e7 total) sits at roundoff
    np.testing.assert_allclose(hists["s2d"], hists["conv"],
                               rtol=1e-3, atol=1e-3)


def test_block1_impl_canonicalization():
    cfg = dpst_tpu.StylizeConfig(block1_impl="s2d")
    assert cfg.prepare_config().block1_impl == "conv"
    assert cfg.spmd_safe().block1_impl == "conv"
    assert cfg.loop_config().block1_impl == "s2d"
    with pytest.raises(ValueError):
        dpst_tpu.StylizeConfig(block1_impl="nope")


@pytest.mark.parametrize("kw", [
    {},                                       # odd-grid conv1_1 tap
    {"style_layers": ("conv1_1", "conv1_2", "conv2_1", "conv3_1",
                      "conv4_1", "conv5_1"),
     "style_layer_weights": (0.2,) * 6},      # + aligned-grid conv1_2 tap
    {"s2b_strips": 0},                        # plain batch (strips=1)
    {"style_norm": "paper"},                  # m1 normalizer in nvec
], ids=["default", "conv1_2-tap", "plain-batch", "paper-norm"])
def test_s2d_gram_kernel_loss_parity(kw):
    """Campaign #10: the streamed s2d-Gram Pallas kernel
    (ops/gram_s2d.py, interpret mode on CPU) matches the nd XLA path on
    the full loss value + gradient, consts packed the production way
    (_with_s2d_masks -> s2d_gram_consts)."""
    content, style, masks = _tall_pair()
    params = vgg.get_params(seed=0)

    def vg(s2d_gram):
        cfg = dpst_tpu.StylizeConfig(
            **{**BASE, **kw}, block1_impl="s2d", s2d_gram=s2d_gram)
        consts = prepare_constants(
            jnp.asarray(content), jnp.asarray(style), jnp.asarray(masks),
            jnp.asarray(masks), cfg, params)
        lcfg = cfg.loop_config()
        consts = optimize._with_s2d_masks(lcfg, consts, content.shape)
        if s2d_gram == "pallas":
            assert consts.s2d_gram_consts is not None
            assert "conv1_1" in consts.s2d_gram_consts
        loss_fn = optimize.make_loss_fn(lcfg)
        w = optimize.LossWeights.from_config(cfg)
        (v, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
            jnp.asarray(content) + 3.0, consts, w, params)
        return np.asarray(v), np.asarray(g)

    v0, g0 = vg("nd")
    scale = np.max(np.abs(g0))
    # "pallas" = the round-5 two-half kernel (production);
    # "pallas1" = the round-3 full-width diag-block form (opt-in) —
    # both must hold value+grad parity against the nd path
    for variant in ("pallas", "pallas1"):
        v1, g1 = vg(variant)
        np.testing.assert_allclose(v1, v0, rtol=1e-5, err_msg=variant)
        np.testing.assert_allclose(g1 / scale, g0 / scale, atol=1e-5,
                                   err_msg=variant)


def test_s2d_gram_canonicalization():
    cfg = dpst_tpu.StylizeConfig(s2d_gram="pallas")
    assert cfg.prepare_config().s2d_gram == "nd"
    assert cfg.spmd_safe().s2d_gram == "nd"
    assert cfg.loop_config().s2d_gram == "pallas"
    # "pallas2" is an alias of "pallas" (one program, one jit key)
    cfg2 = dpst_tpu.StylizeConfig(s2d_gram="pallas2")
    assert cfg2.loop_config() == cfg.loop_config()
    # "pallas1" (the round-3 form) is a DISTINCT program
    assert (dpst_tpu.StylizeConfig(s2d_gram="pallas1").loop_config()
            != cfg.loop_config())
    # "auto" survives construction: it resolves BY SIZE at trace time
    # (optimize._s2d_gram_kernel) — nd at fused-routed sizes, kernel
    # past the fused block bound (round-3 campaign #12)
    cfg = dpst_tpu.StylizeConfig()
    assert cfg.s2d_gram == "auto"
    assert cfg.loop_config().s2d_gram == "auto"
    assert cfg.prepare_config().s2d_gram == "nd"
    with pytest.raises(ValueError):
        dpst_tpu.StylizeConfig(s2d_gram="nope")


def test_s2d_gram_auto_resolves_by_size(monkeypatch):
    """auto → nd at fused-routed block-1 shapes (kernel off), → the
    streamed Pallas kernel past the fused block bound on TPU (where
    the nd consumption is impossible), never the kernel on CPU (it
    would run interpreted)."""
    from dpst_tpu.ops import losses

    lcfg = dpst_tpu.StylizeConfig(**BASE).loop_config()
    assert lcfg.s2d_gram == "auto"
    monkeypatch.setattr(optimize.jax, "default_backend", lambda: "tpu")
    assert not optimize._s2d_gram_kernel(lcfg, 256, 64, 2)  # small+fused
    # measured crossover: kernel at h·w >= 2^19 (768²+), nd at 512²
    assert not optimize._s2d_gram_kernel(lcfg, 512, 512, 4)
    assert optimize._s2d_gram_kernel(lcfg, 768, 768, 4)
    assert optimize._s2d_gram_kernel(lcfg, 1024, 1024, 8)
    monkeypatch.setattr(losses, "_FUSED_MAX_ELEMENTS", 1)
    assert optimize._s2d_gram_kernel(lcfg, 256, 64, 2)      # past bound
    monkeypatch.setattr(optimize.jax, "default_backend", lambda: "cpu")
    assert not optimize._s2d_gram_kernel(lcfg, 256, 64, 2)
    assert not optimize._s2d_gram_kernel(lcfg, 1024, 1024, 4)


def test_s2d_gate_lifts_past_fused_bound_with_kernel(monkeypatch):
    """Past the fused-Gram block bound (2048²-class conv1_1) the s2d
    gate normally closes (the nd consumption needs the fused dot); with
    s2d_gram="pallas" it must stay OPEN — the streamed kernel builds
    the weighted block band-by-band in VMEM, so no full-block bound
    applies. Shrink the bound so the tall test pair crosses it, then
    pin gate behavior and full value+grad parity vs the standard path."""
    from dpst_tpu.ops import losses

    content, style, masks = _tall_pair()
    params = vgg.get_params(seed=0)
    v0, g0 = _val_grad(params, content, style, masks)   # standard conv

    monkeypatch.setattr(losses, "_FUSED_MAX_ELEMENTS", 1)
    all_layers = tuple(dict.fromkeys(
        dpst_tpu.StylizeConfig(**BASE).style_layers))
    mask_shapes = {"conv1_1": (2, 256, 64)}
    cfg_nd = dpst_tpu.StylizeConfig(**BASE, block1_impl="s2d",
                                    s2d_gram="nd")
    assert not optimize._block1_s2d_ok(
        cfg_nd.loop_config(), content.shape, all_layers, ("conv1_1",),
        mask_shapes)
    cfg_pl = dpst_tpu.StylizeConfig(**BASE, block1_impl="s2d",
                                    s2d_gram="pallas")
    assert optimize._block1_s2d_ok(
        cfg_pl.loop_config(), content.shape, all_layers, ("conv1_1",),
        mask_shapes)

    consts = prepare_constants(
        jnp.asarray(content), jnp.asarray(style), jnp.asarray(masks),
        jnp.asarray(masks), cfg_pl, params)
    lcfg = cfg_pl.loop_config()
    consts = optimize._with_s2d_masks(lcfg, consts, content.shape)
    assert consts.s2d_gram_consts is not None
    loss_fn = optimize.make_loss_fn(lcfg)
    w = optimize.LossWeights.from_config(cfg_pl)
    (v1, _), g1 = jax.value_and_grad(loss_fn, has_aux=True)(
        jnp.asarray(content) + 3.0, consts, w, params)
    np.testing.assert_allclose(np.asarray(v1), v0, rtol=1e-5)
    scale = np.max(np.abs(g0))
    np.testing.assert_allclose(np.asarray(g1) / scale, g0 / scale,
                               atol=1e-5)


def test_s2d_consts_skip_under_stream12(monkeypatch):
    """When the stream12 path owns blocks 1-2 (≥3072² auto, or explicit
    cfg.stream12), _with_s2d_masks must NOT pack s2d mask grids / kernel
    consts — the streamed loss never reads them (they would be dead
    HBM weight at 4096²)."""
    from dpst_tpu.ops import losses

    content, style, masks = _tall_pair()
    params = vgg.get_params(seed=0)
    monkeypatch.setattr(losses, "_FUSED_MAX_ELEMENTS", 1)
    monkeypatch.setattr(optimize.jax, "default_backend", lambda: "tpu")
    cfg = dpst_tpu.StylizeConfig(**BASE, stream12=4)
    consts = prepare_constants(
        jnp.asarray(content), jnp.asarray(style), jnp.asarray(masks),
        jnp.asarray(masks), cfg, params)
    out = optimize._with_s2d_masks(cfg.loop_config(), consts,
                                   content.shape)
    assert out.s2d_mask_parts is None
    assert out.s2d_gram_consts is None
    # same shape WITHOUT stream12: the (monkeypatched-past-the-bound)
    # auto s2d_gram packs the kernel consts (block1_impl explicit —
    # its own auto needs ≥2^18 px, more than the test pair has)
    cfg2 = dpst_tpu.StylizeConfig(**BASE, block1_impl="s2d")
    out2 = optimize._with_s2d_masks(cfg2.loop_config(), consts,
                                    content.shape)
    assert out2.s2d_gram_consts is not None


def test_pick_trw_prefers_exact_divisors():
    """Campaign #13: the band height prefers an exact divisor of P (the
    XLA-side pad-to-band-multiple and its backward slice then never
    exist). 2048²'s production P picks one; a prime-ish P falls back to
    the padded power-of-two ladder."""
    from dpst_tpu.ops import gram_s2d

    p2048 = 32 * 41 * 1025            # the 2048² production grid size
    trw = gram_s2d._pick_trw(p2048, 4, 256)
    assert p2048 % trw == 0 and trw % 16 == 0 and trw >= 256
    p1024 = 16 * 41 * 513
    trw = gram_s2d._pick_trw(p1024, 4, 256)
    assert p1024 % trw == 0
    # prime P has no in-range divisor: the fallback ladder pads
    trw = gram_s2d._pick_trw(1048583, 4, 256)  # prime > 2^20
    assert 1048583 % trw != 0 and trw in (4096, 2048, 1024, 512, 256, 128)
