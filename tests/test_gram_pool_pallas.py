"""Opt-in Pallas kernels: masked-Gram contraction and max-pool backward.

Both are validated (here in interpret mode; on-chip during round-2 perf
work) but ship opt-in: measured slower than XLA inside the full step
because their operands live in XLA's conv-emitter layouts, so the custom
call's standard-layout constraint adds relayout copies (see the
use_pallas docstrings for the numbers). These tests keep the kernels
correct for future Mosaic versions. The production pool backward is the
conv-formulated XLA path (models/vgg._upsample2/_downsample2_sum),
covered transitively by every optimization test and golden.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dpst_tpu.models import vgg
from dpst_tpu.ops import losses
from dpst_tpu.ops.gram_pallas import masked_grams_pallas, weighted_grams
from dpst_tpu.ops import pool_pallas


@pytest.mark.parametrize("shape,k", [((40, 56, 16), 3), ((64, 64, 64), 4)])
def test_gram_pallas_matches_xla(rng, shape, k):
    feat = rng.normal(size=shape).astype(np.float32)
    masks = rng.uniform(size=(k,) + shape[:2]).astype(np.float32)
    ref = losses.masked_grams_fused(jnp.asarray(feat), jnp.asarray(masks))
    got = masked_grams_pallas(jnp.asarray(feat), jnp.asarray(masks),
                              interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-6)


def test_gram_pallas_gradient_matches_xla(rng):
    feat = rng.normal(size=(40, 56, 16)).astype(np.float32)
    masks = rng.uniform(size=(3, 40, 56)).astype(np.float32)

    def loss(fn):
        def f(x):
            g = fn(x, jnp.asarray(masks))
            return jnp.sum(g * g)
        return f

    gr = jax.grad(loss(losses.masked_grams_fused))(jnp.asarray(feat))
    gp = jax.grad(loss(lambda x, m: masked_grams_pallas(
        x, m, interpret=True)))(jnp.asarray(feat))
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                               rtol=1e-3, atol=1e-5)


def test_gram_pallas_m1_norm(rng):
    feat = rng.normal(size=(40, 56, 16)).astype(np.float32)
    masks = rng.uniform(size=(2, 40, 56)).astype(np.float32)
    ref = losses.masked_grams_fused(jnp.asarray(feat), jnp.asarray(masks),
                                    norm="m1")
    got = masked_grams_pallas(jnp.asarray(feat), jnp.asarray(masks),
                              norm="m1", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-6)


def test_gram_pallas_mask_cotangent_is_zero(rng):
    """Masks are run constants; the kernel's mask cotangent contract is
    zeros (same as the VGG-weight cotangent in _pallas_conv)."""
    f = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
    m2t = jnp.asarray(rng.uniform(size=(64, 2)).astype(np.float32))
    dm = jax.grad(lambda m: jnp.sum(weighted_grams(f, m, True)),
                  argnums=0)(m2t)
    np.testing.assert_array_equal(np.asarray(dm), 0.0)


def _interp_pool_bwd(x, y, g):
    from unittest import mock
    real = pool_pallas.pl.pallas_call

    def icall(*a, **k):
        k["interpret"] = True
        return real(*a, **k)

    with mock.patch.object(pool_pallas.pl, "pallas_call", icall):
        return pool_pallas.maxpool2_bwd_pallas(x, y, g)


@pytest.mark.parametrize("shape", [(1, 32, 32, 8), (1, 64, 48, 16),
                                   (1, 16, 256, 64)])
def test_pool_pallas_bwd_matches_xla(rng, shape):
    x = rng.normal(size=shape).astype(np.float32)
    x[0, :4, :4, :] = 0.5                    # force ties
    x = jnp.asarray(x)
    y = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                              (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    g = jnp.asarray(rng.normal(size=y.shape).astype(np.float32))
    ref = vgg._maxpool2_bwd("xla", (x, y), g)[0]
    got = _interp_pool_bwd(x, y, g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    # gradient mass is conserved exactly by tie-splitting
    np.testing.assert_allclose(float(jnp.sum(got)), float(jnp.sum(g)),
                               rtol=1e-4)


def test_conv_form_upsample_matches_broadcast(rng):
    """_upsample2's depthwise-transposed-conv form is an exact 2x nearest
    upsample (the conv-emitter-friendly production pool backward)."""
    y = jnp.asarray(rng.normal(size=(1, 5, 7, 4)).astype(np.float32))
    up = np.asarray(vgg._upsample2(y))
    yb = np.asarray(y)
    expected = np.repeat(np.repeat(yb, 2, axis=1), 2, axis=2)
    np.testing.assert_array_equal(up, expected)
    s = np.asarray(vgg._downsample2_sum(jnp.asarray(expected)))
    np.testing.assert_allclose(s, 4.0 * yb, rtol=1e-6)


# --- second-generation streamed Gram (ops/gram_stream.py) ----------------

@pytest.mark.parametrize("shape,k,norm", [
    ((40, 56, 16), 3, "m2"),    # P not a lane multiple -> padded bands
    ((64, 64, 64), 4, "m1"),
    ((32, 32, 8), 1, "m2"),
])
def test_gram_stream_matches_fused(rng, shape, k, norm):
    from dpst_tpu.ops.gram_stream import masked_grams_stream
    feat = rng.normal(size=shape).astype(np.float32)
    masks = rng.uniform(size=(k,) + shape[:2]).astype(np.float32)
    if k > 1:
        masks[-1] = 0.0           # padded class contributes exactly 0
    ref = losses.masked_grams_fused(jnp.asarray(feat), jnp.asarray(masks),
                                    norm=norm)
    got = masked_grams_stream(jnp.asarray(feat), jnp.asarray(masks),
                              norm=norm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-6)


def test_gram_stream_gradient_matches_fused(rng):
    from dpst_tpu.ops.gram_stream import masked_grams_stream
    feat = jnp.asarray(rng.normal(size=(40, 56, 16)).astype(np.float32))
    masks = jnp.asarray(rng.uniform(size=(3, 40, 56)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(3, 16, 16)).astype(np.float32))

    def loss(fn):
        return lambda x: jnp.sum(
            (fn(x, masks) - tgt) ** 2)

    g_ref = jax.grad(loss(losses.masked_grams_fused))(feat)
    g_new = jax.grad(loss(masked_grams_stream))(feat)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_gram_stream_in_style_loss(rng):
    """gram_impl="stream" through style_layer_loss ≡ the fused path
    (values and gradients), both norms."""
    feat = jnp.asarray(rng.normal(size=(32, 48, 16)).astype(np.float32))
    masks = jnp.asarray(rng.uniform(size=(2, 32, 48)).astype(np.float32))
    grams = jnp.asarray(rng.normal(size=(2, 16, 16)).astype(np.float32))
    cov = jnp.asarray([0.4, 0.6], jnp.float32)
    for style_norm in ("gatys", "paper"):
        args = (grams, masks, cov)
        f_ref = lambda x: losses.style_layer_loss(
            x, *args, style_norm=style_norm, gram_impl="xla")
        f_new = lambda x: losses.style_layer_loss(
            x, *args, style_norm=style_norm, gram_impl="stream")
        np.testing.assert_allclose(float(f_new(feat)), float(f_ref(feat)),
                                   rtol=1e-5)
        g_ref = jax.grad(f_ref)(feat)
        g_new = jax.grad(f_new)(feat)
        np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-6)
