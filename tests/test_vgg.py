"""VGG-19 extractor vs an independently-built torch reference stack.

Validates conv semantics (SAME padding, stride-1 3×3), pooling (floor-mode
2×2), Caffe BGR+mean preprocessing, and tap selection by comparing against
torch.nn layers carrying the SAME weights (SURVEY.md §4 unit tests).
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from dpst_tpu.models import vgg


def _torch_features(params, img_np, layers, pooling="max"):
    """Reference forward pass in torch with dpst_tpu's weights."""
    x = torch.from_numpy(img_np[None]).permute(0, 3, 1, 2).double()
    x = x.flip(1)  # RGB -> BGR
    means = torch.tensor(vgg.BGR_MEANS, dtype=torch.float64).view(1, 3, 1, 1)
    x = x - means
    taps = {}
    deepest = max(vgg.LAYER_ORDER.index(l) for l in layers)
    for idx, name in enumerate(vgg.LAYER_ORDER):
        if idx > deepest:
            break
        if name.startswith("pool"):
            if pooling == "max":
                x = F.max_pool2d(x, 2, 2)
            else:
                x = F.avg_pool2d(x, 2, 2)
            continue
        w = torch.from_numpy(
            np.asarray(params[name]["w"])).permute(3, 2, 0, 1).double()
        b = torch.from_numpy(np.asarray(params[name]["b"])).double()
        x = F.conv2d(x, w, b, padding=1)
        x = F.relu(x)
        if name in layers:
            taps[name] = x[0].permute(1, 2, 0).numpy()
    return taps


@pytest.mark.parametrize("pooling", ["max", "avg"])
def test_features_match_torch(vgg_params_small, small_images, pooling):
    content, _ = small_images
    layers = ("conv1_1", "conv2_1", "conv3_1", "conv4_1", "conv4_2",
              "conv5_1")
    ours = vgg.extract_features(
        vgg_params_small, content, layers, pooling=pooling,
        compute_dtype="float32")
    theirs = _torch_features(vgg_params_small, content, layers, pooling)
    for layer in layers:
        a = np.asarray(ours[layer])
        b = theirs[layer]
        assert a.shape == b.shape, layer
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3,
                                   err_msg=layer)


def test_truncation_matches_full(vgg_params_small, small_images):
    """Stopping at the deepest tap must not change tap values."""
    content, _ = small_images
    shallow = vgg.extract_features(
        vgg_params_small, content, ("conv1_1", "conv2_1"),
        compute_dtype="float32")
    deep = vgg.extract_features(
        vgg_params_small, content, ("conv1_1", "conv2_1", "conv5_1"),
        compute_dtype="float32")
    np.testing.assert_allclose(np.asarray(shallow["conv2_1"]),
                               np.asarray(deep["conv2_1"]), rtol=1e-6)


def test_batched_matches_single(vgg_params_small, small_images):
    content, style = small_images
    batch = np.stack([content, style])
    single = vgg.extract_features(
        vgg_params_small, content, ("conv3_1",), compute_dtype="float32")
    batched = vgg.extract_features(
        vgg_params_small, batch, ("conv3_1",), compute_dtype="float32")
    assert batched["conv3_1"].shape[0] == 2
    np.testing.assert_allclose(np.asarray(batched["conv3_1"][0]),
                               np.asarray(single["conv3_1"]), rtol=1e-5,
                               atol=1e-5)


def test_layer_shapes(vgg_params_small, small_images):
    content, _ = small_images
    feats = vgg.extract_features(
        vgg_params_small, content,
        ("conv1_1", "conv2_1", "conv3_1", "conv4_1", "conv5_1"),
        compute_dtype="float32")
    assert feats["conv1_1"].shape == (32, 32, 64)
    assert feats["conv2_1"].shape == (16, 16, 128)
    assert feats["conv3_1"].shape == (8, 8, 256)
    assert feats["conv4_1"].shape == (4, 4, 512)
    assert feats["conv5_1"].shape == (2, 2, 512)


def test_deterministic_init():
    p1 = vgg.init_params(seed=0)
    p2 = vgg.init_params(seed=0)
    np.testing.assert_array_equal(np.asarray(p1["conv3_2"]["w"]),
                                  np.asarray(p2["conv3_2"]["w"]))


# --- manual space-to-batch of blocks 1-2 (s2b_strips) --------------------

def test_s2b_strips_exact():
    """The strip decomposition is exact: taps are bit-identical to the
    undecomposed path (every halo-contaminated row is sliced away or
    re-zeroed — models/vgg._zero_oob), and gradients agree to fp32
    summation-order roundoff (the reassembly's overlapping halo
    scatter-adds sum strip cotangents in a different order)."""
    import jax
    import jax.numpy as jnp
    r = np.random.default_rng(7)
    params = vgg.init_params(seed=0)
    layers = ("conv1_1", "conv2_1", "conv3_1", "conv5_1", "conv4_2")
    for (h, w, s) in [(256, 64, 8), (128, 96, 4)]:
        assert vgg._s2b_enabled(s, (1, h, w, 3), layers)
        img = jnp.asarray(r.uniform(0, 255, (h, w, 3)), jnp.float32)
        for pooling in ("max", "avg"):
            t0 = vgg.extract_features(params, img, layers, pooling=pooling)
            t8 = vgg.extract_features(params, img, layers, pooling=pooling,
                                      s2b_strips=s)
            for l in layers:
                np.testing.assert_array_equal(np.asarray(t0[l]),
                                              np.asarray(t8[l]))

        def loss(x, st):
            t = vgg.extract_features(params, x, layers, s2b_strips=st)
            return sum(jnp.sum(v.astype(jnp.float32) ** 2)
                       for v in t.values())

        g0 = np.asarray(jax.grad(loss)(img, 0))
        g8 = np.asarray(jax.grad(loss)(img, s))
        scale = np.max(np.abs(g0))
        np.testing.assert_allclose(g8 / scale, g0 / scale, atol=1e-5)


def test_s2b_stack_vjp_bitexact():
    """The _s2b_stack custom VJP (round-3 campaign #11a: the explicit
    reshape/pad overlap-add backward that replaces autodiff's S-way
    split — 16.1 ms/step of the 2048² step) is bit-identical to the
    autodiff of the plain stack-of-slices it shadows: every padded-image
    row receives at most two contributions (one strip's own rows + one
    neighbor's halo rows) and a two-term fp add is commutative."""
    import jax
    import jax.numpy as jnp

    def ref_stack(x0, strips):
        hs = x0.shape[0] // strips
        h0 = vgg._S2B_HALO
        xp = jnp.pad(x0, ((h0, h0), (0, 0), (0, 0)))
        return jnp.stack([
            jax.lax.slice_in_dim(xp, i * hs, i * hs + hs + 2 * h0, axis=0)
            for i in range(strips)])

    r = np.random.default_rng(3)
    for (h, w, s) in [(256, 128, 4), (512, 64, 8), (128, 32, 2)]:
        x0 = jnp.asarray(r.normal(size=(h, w, 3)), jnp.float32)
        ct = jnp.asarray(r.normal(size=(s, h // s + 16, w, 3)), jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(vgg._s2b_stack(x0, s)), np.asarray(ref_stack(x0, s)))
        g_new = jax.grad(lambda x: jnp.vdot(vgg._s2b_stack(x, s), ct))(x0)
        g_ref = jax.grad(lambda x: jnp.vdot(ref_stack(x, s), ct))(x0)
        np.testing.assert_array_equal(np.asarray(g_new), np.asarray(g_ref))


def test_s2b_gate_fallbacks():
    """Images the strip arithmetic can't decompose fall back to the
    plain path (indivisible rows, too-small strips, shallow taps)."""
    assert vgg._s2b_enabled(8, (1, 512, 512, 3), ("conv5_1",))
    assert not vgg._s2b_enabled(0, (1, 512, 512, 3), ("conv5_1",))
    assert not vgg._s2b_enabled(8, (1, 24 * 8, 512, 3), ("conv5_1",))  # hs=24 < 32
    assert not vgg._s2b_enabled(8, (1, 66 * 8, 512, 3), ("conv5_1",))  # hs % 4
    assert not vgg._s2b_enabled(8, (1, 500, 512, 3), ("conv5_1",))     # 500 % 8
    assert not vgg._s2b_enabled(8, (2, 512, 512, 3), ("conv5_1",))     # batch
    assert not vgg._s2b_enabled(8, (1, 512, 512, 3), ("conv2_1",))     # shallow
    r = np.random.default_rng(3)
    import jax.numpy as jnp
    img = jnp.asarray(r.uniform(0, 255, (192, 64, 3)), jnp.float32)  # hs=24
    params = vgg.init_params(seed=0)
    t = vgg.extract_features(params, img, ("conv3_1",), s2b_strips=8)
    assert t["conv3_1"].shape == (48, 16, 256)


def test_strip_taps_equivalence():
    """strip_taps=True returns StripTaps whose .plain() is bit-identical
    to the default taps, and strip_masks-weighted Grams reproduce the
    plain masked Grams exactly (halo rows carry zero weight)."""
    import jax.numpy as jnp
    from dpst_tpu.ops import losses
    r = np.random.default_rng(5)
    img = jnp.asarray(r.uniform(0, 255, (256, 64, 3)), jnp.float32)
    params = vgg.init_params(seed=0)
    layers = ("conv1_1", "conv2_1", "conv3_1")
    t0 = vgg.extract_features(params, img, layers, s2b_strips=8)
    ts = vgg.extract_features(params, img, layers, s2b_strips=8,
                              strip_taps=True)
    assert isinstance(ts["conv1_1"], vgg.StripTap)
    assert isinstance(ts["conv2_1"], vgg.StripTap)
    assert not isinstance(ts["conv3_1"], vgg.StripTap)   # past pool2
    for l in ("conv1_1", "conv2_1"):
        np.testing.assert_array_equal(np.asarray(ts[l].plain()),
                                      np.asarray(t0[l]))
    # Gram equivalence through strip-geometry masks
    tap = ts["conv2_1"]
    masks = jnp.asarray(r.uniform(0, 1, (3, 128, 32)), jnp.float32)
    g_ref = losses.masked_grams_fused(t0["conv2_1"], masks)
    s, rows, w, c = tap.data.shape
    g_strip = losses.masked_grams_fused(
        tap.data.reshape(s * rows, w, c),
        vgg.strip_masks(masks, tap.halo, tap.own))
    np.testing.assert_allclose(np.asarray(g_strip), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)


def test_s2b_odd_width():
    """W is untouched by the row-strip decomposition — odd widths must
    stay exact (pools drop the trailing col identically in both paths)."""
    import jax.numpy as jnp
    r = np.random.default_rng(9)
    img = jnp.asarray(r.uniform(0, 255, (256, 67, 3)), jnp.float32)
    params = vgg.init_params(seed=0)
    layers = ("conv1_1", "conv2_1", "conv3_1")
    t0 = vgg.extract_features(params, img, layers)
    t8 = vgg.extract_features(params, img, layers, s2b_strips=8)
    for l in layers:
        np.testing.assert_array_equal(np.asarray(t0[l]), np.asarray(t8[l]))
