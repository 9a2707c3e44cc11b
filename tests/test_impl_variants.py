"""Full-loss value+gradient parity of the perf impl switches.

Each (conv_impl/pool_impl/gram_impl) variant reroutes part of the hot
loop through a different lowering of the SAME math (see tools/perf_lab.py
and ARCHITECTURE.md's layout-tax notes):
  * conv_impl="flipvjp" — conv backward as a forward-form conv with
    spatially flipped, in/out-transposed weights (exact for stride-1
    SAME 3×3);
  * pool_impl="noties"  — max-pool backward giving every tied position
    the full cotangent (differs from the equal-split default ONLY on
    exact float ties, which continuous random inputs never produce);
  * gram_impl="dotg"    — masked Grams via a dot_general contracting the
    (H, W) dims of the NHWC tap directly (no (P, K·C) reshape).

On CPU fp32 all three must reproduce the default path's loss value and
image gradient to float roundoff.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dpst_tpu
from dpst_tpu import optimize, prepare_constants
from dpst_tpu.models import vgg

BASE = dict(use_segmentation=True, use_photorealism=True, max_classes=2,
            compute_dtype="float32")


def _pair():
    r = np.random.default_rng(7)
    content = r.uniform(0, 255, (64, 64, 3)).astype(np.float32)
    style = r.uniform(0, 255, (64, 64, 3)).astype(np.float32)
    masks = np.zeros((2, 64, 64), np.float32)
    masks[0, :32] = 1.0
    masks[1, 32:] = 1.0
    return content, style, masks


def _val_grad(params, content, style, masks, **kw):
    cfg = dpst_tpu.StylizeConfig(**BASE, **kw)
    consts = prepare_constants(
        jnp.asarray(content), jnp.asarray(style), jnp.asarray(masks),
        jnp.asarray(masks), cfg, params)
    w = optimize.LossWeights.from_config(cfg)
    loss_fn = optimize.make_loss_fn(cfg.loop_config())
    (v, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
        jnp.asarray(content) + 3.0, consts, w, params)
    return np.asarray(v), np.asarray(g)


@pytest.mark.parametrize("kw", [
    {"conv_impl": "flipvjp"},
    {"pool_impl": "noties"},
    {"gram_impl": "dotg"},
    {"remat": "full"},
    {"remat": "block1"},
    {"remat": "block12"},
    {"pool_impl": "postact"},
    {"pool_impl": "xla"},
    {"conv_impl": "flipvjp", "pool_impl": "noties", "gram_impl": "dotg"},
    {"gram_impl": "stream"},
    {"gram_impl": "hybrid"},
    {"conv_impl": "padbwd"},
    {"conv_impl": "dotbwd"},
    {"conv_impl": "dot11"},
], ids=lambda kw: "+".join(str(v) for v in kw.values()))
def test_variant_matches_default(kw):
    content, style, masks = _pair()
    params = vgg.get_params(seed=0)
    v0, g0 = _val_grad(params, content, style, masks)
    v1, g1 = _val_grad(params, content, style, masks, **kw)
    assert np.isfinite(v1)
    np.testing.assert_allclose(v1, v0, rtol=1e-5)
    scale = np.max(np.abs(g0))
    np.testing.assert_allclose(g1 / scale, g0 / scale, atol=1e-5)


def test_s2b_strips_full_loss_parity():
    """s2b_strips through the full loss (needs rows ≥ 32·strips, so a
    tall 256×64 pair rather than the shared 64² fixture)."""
    r = np.random.default_rng(11)
    content = r.uniform(0, 255, (256, 64, 3)).astype(np.float32)
    style = r.uniform(0, 255, (256, 64, 3)).astype(np.float32)
    masks = np.zeros((2, 256, 64), np.float32)
    masks[0, :128] = 1.0
    masks[1, 128:] = 1.0
    params = vgg.get_params(seed=0)
    v0, g0 = _val_grad(params, content, style, masks)
    v1, g1 = _val_grad(params, content, style, masks, s2b_strips=8)
    # forward is bit-exact (same convs over the same windows); the
    # gradient picks up fp32 summation-order noise in the reassembly's
    # overlapping halo scatter-adds
    np.testing.assert_allclose(v1, v0, rtol=1e-6)
    scale = np.max(np.abs(g0))
    np.testing.assert_allclose(g1 / scale, g0 / scale, atol=1e-5)


def test_stream_strip_tap_parity():
    """Campaign #11b: a stream-routed STRIP tap feeds the kernel the
    full strip tensor via the layout-order bitcast flatten with
    halo-zeroed permuted masks (optimize.make_loss_fn →
    gram_stream.masked_grams_stream_flat) — value+grad must match the
    unstripped stream path (and the default fused path) to fp
    summation-order noise."""
    r = np.random.default_rng(13)
    content = r.uniform(0, 255, (256, 64, 3)).astype(np.float32)
    style = r.uniform(0, 255, (256, 64, 3)).astype(np.float32)
    masks = np.zeros((2, 256, 64), np.float32)
    masks[0, :128] = 1.0
    masks[1, 128:] = 1.0
    params = vgg.get_params(seed=0)
    v0, g0 = _val_grad(params, content, style, masks,
                       gram_impl="stream")
    v1, g1 = _val_grad(params, content, style, masks,
                       gram_impl="stream", s2b_strips=8)
    np.testing.assert_allclose(v1, v0, rtol=1e-5)
    scale = np.max(np.abs(g0))
    np.testing.assert_allclose(g1 / scale, g0 / scale, atol=1e-5)
    vd, gd = _val_grad(params, content, style, masks)
    np.testing.assert_allclose(v1, vd, rtol=1e-5)
    np.testing.assert_allclose(g1 / scale, gd / scale, atol=1e-5)


def test_strip_gram_perm_parity():
    """strip_gram="perm" (layout-order tap flatten + permuted masks)
    reproduces the default loss and gradient: the Gram sum is
    pixel-permutation-invariant, so only fp32 summation order differs."""
    r = np.random.default_rng(11)
    content = r.uniform(0, 255, (256, 64, 3)).astype(np.float32)
    style = r.uniform(0, 255, (256, 64, 3)).astype(np.float32)
    masks = np.zeros((2, 256, 64), np.float32)
    masks[0, :128] = 1.0
    masks[1, 128:] = 1.0
    params = vgg.get_params(seed=0)
    v0, g0 = _val_grad(params, content, style, masks, s2b_strips=8)
    v1, g1 = _val_grad(params, content, style, masks, s2b_strips=8,
                       strip_gram="perm")
    np.testing.assert_allclose(v1, v0, rtol=1e-5)
    scale = np.max(np.abs(g0))
    np.testing.assert_allclose(g1 / scale, g0 / scale, atol=1e-5)


def test_strip_gram_perm_content_tap_in_b12():
    """A content tap inside blocks 1-2 must not break the perm path:
    the tap needs the image-order tensor (StripTap.plain fallback), and
    the mask-shape lookup must not touch non-style layers (consts.masks
    has style layers only — regression for a KeyError)."""
    r = np.random.default_rng(11)
    content = r.uniform(0, 255, (256, 64, 3)).astype(np.float32)
    style = r.uniform(0, 255, (256, 64, 3)).astype(np.float32)
    masks = np.zeros((2, 256, 64), np.float32)
    masks[0, :128] = 1.0
    masks[1, 128:] = 1.0
    params = vgg.get_params(seed=0)
    kw = dict(content_layers=("conv1_2", "conv4_2"))
    v0, g0 = _val_grad(params, content, style, masks, **kw)
    v1, g1 = _val_grad(params, content, style, masks, s2b_strips=8,
                       strip_gram="perm", **kw)
    np.testing.assert_allclose(v1, v0, rtol=1e-5)
    scale = np.max(np.abs(g0))
    np.testing.assert_allclose(g1 / scale, g0 / scale, atol=1e-5)


def test_strip_gram_permh_parity():
    """strip_gram="permh" (no interior slice; halo rows zero-weighted
    via the permuted masks) is exact like "perm". Measured-negative
    on-chip (148.8 vs 161.1 it/s @512² — the +25% weighted-block HBM
    outweighs the saved slice materialization); stays opt-in."""
    r = np.random.default_rng(11)
    content = r.uniform(0, 255, (256, 64, 3)).astype(np.float32)
    style = r.uniform(0, 255, (256, 64, 3)).astype(np.float32)
    masks = np.zeros((2, 256, 64), np.float32)
    masks[0, :128] = 1.0
    masks[1, 128:] = 1.0
    params = vgg.get_params(seed=0)
    v0, g0 = _val_grad(params, content, style, masks, s2b_strips=8)
    v1, g1 = _val_grad(params, content, style, masks, s2b_strips=8,
                       strip_gram="permh")
    np.testing.assert_allclose(v1, v0, rtol=1e-5)
    scale = np.max(np.abs(g0))
    np.testing.assert_allclose(g1 / scale, g0 / scale, atol=1e-5)


def test_perm_flatten_matches_plain():
    """vgg.perm_flatten/perm_masks are a consistent re-ordering: the
    flat Gram from them equals the fused Gram from the plain tap."""
    from dpst_tpu.ops import losses as L
    r = np.random.default_rng(3)
    data = r.normal(size=(4, 24, 16, 8)).astype(np.float32)  # S=4 strips
    halo, own = 4, 16
    tap = vgg.StripTap(jnp.asarray(data), halo, own)
    plain = tap.plain()                                   # (64, 16, 8)
    masks = r.uniform(0, 1, (3, 64, 16)).astype(np.float32)
    g_ref = L.masked_grams_fused(plain, jnp.asarray(masks))
    g_perm = L.masked_grams_flat(
        vgg.perm_flatten(tap), vgg.perm_masks(jnp.asarray(masks), 4))
    np.testing.assert_allclose(np.asarray(g_perm), np.asarray(g_ref),
                               rtol=2e-5, atol=1e-6)


def test_noties_differs_only_on_ties():
    # A constructed tie: a flat 2×2 window shares the max; "noties" gives
    # each tied position the full cotangent, the default splits it.
    x = jnp.ones((1, 2, 2, 1), jnp.float32)

    def pooled_sum(x, impl):
        return jnp.sum(vgg._maxpool2(x, impl))

    g_split = jax.grad(pooled_sum)(x, "xla")
    g_full = jax.grad(pooled_sum)(x, "noties")
    np.testing.assert_allclose(np.asarray(g_split), 0.25 * np.ones((1, 2, 2, 1)))
    np.testing.assert_allclose(np.asarray(g_full), np.ones((1, 2, 2, 1)))


def test_conv11_auto_gate(monkeypatch):
    """auto resolves conv1_1 to the matmul lowerings ONLY on TPU below
    1024²-class pixel counts (measured gate — vgg._resolve_conv11):
    strip-form → dotbwd, batch-1 → dot11, large/CPU → emitter."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert vgg._resolve_conv11("auto", (8, 80, 512, 3)) == "dotbwd"
    assert vgg._resolve_conv11("auto", (1, 256, 256, 3)) == "dot11"
    assert vgg._resolve_conv11("auto", (16, 80, 1024, 3)) == ""
    assert vgg._resolve_conv11("auto", (8, 80, 512, 64)) == ""  # conv1_1 only
    assert vgg._resolve_conv11("dotbwd", (16, 80, 1024, 3)) == "dotbwd"
    assert vgg._resolve_conv11("dot11", (8, 80, 512, 3)) == "dot11"
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert vgg._resolve_conv11("auto", (8, 80, 512, 3)) == ""
