"""Pallas 3×3 conv kernel ≡ lax.conv (forward + input gradient),
interpret mode on CPU; compiled validation happens on real TPU via bench
(SURVEY.md §4 device-test strategy)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpst_tpu.ops.conv_pallas import conv3x3_same, flip_transpose_weights


def _ref(x, w):
    dn = jax.lax.conv_dimension_numbers(
        x[None].shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x[None], w, (1, 1), "SAME", dimension_numbers=dn)[0]


@pytest.mark.parametrize("shape", [
    (16, 128, 64, 64), (33, 130, 128, 64), (8, 256, 128, 256)])
def test_forward_matches_lax(shape):
    h, wd, cin, cout = shape
    r = np.random.default_rng(sum(shape))
    x = jnp.asarray(r.normal(size=(h, wd, cin)).astype(np.float32))
    w = jnp.asarray(r.normal(0, 0.1, (3, 3, cin, cout)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(conv3x3_same(x, w)),
                               np.asarray(_ref(x, w)),
                               rtol=1e-4, atol=1e-4)


def test_input_gradient_identity():
    r = np.random.default_rng(4)
    x = jnp.asarray(r.normal(size=(16, 128, 64)).astype(np.float32))
    w = jnp.asarray(r.normal(0, 0.1, (3, 3, 64, 128)).astype(np.float32))
    g = jnp.asarray(r.normal(size=(16, 128, 128)).astype(np.float32))
    _, vjp = jax.vjp(lambda xx: _ref(xx, w), x)
    gx_ref = vjp(g)[0]
    gx = conv3x3_same(g, flip_transpose_weights(w))
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-4)


def test_vgg_features_pallas_vs_xla():
    """Whole-extractor equivalence with conv_impl='pallas' forced."""
    from dpst_tpu.models import vgg
    params = vgg.init_params(seed=0)
    r = np.random.default_rng(5)
    img = jnp.asarray(r.uniform(0, 255, (64, 128, 3)).astype(np.float32))
    layers = ("conv1_2", "conv2_1", "conv3_1")
    f_xla = vgg.extract_features(params, img, layers,
                                 compute_dtype="float32",
                                 conv_impl="xla")
    f_pl = vgg.extract_features(params, img, layers,
                                compute_dtype="float32",
                                conv_impl="pallas")
    for l in layers:
        np.testing.assert_allclose(np.asarray(f_pl[l]),
                                   np.asarray(f_xla[l]),
                                   rtol=1e-3, atol=1e-3, err_msg=l)


def test_vgg_gradients_pallas_vs_xla():
    from dpst_tpu.models import vgg
    params = vgg.init_params(seed=0)
    r = np.random.default_rng(6)
    img = jnp.asarray(r.uniform(0, 255, (32, 128, 3)).astype(np.float32))

    def loss(im, impl):
        f = vgg.extract_features(params, im, ("conv2_1",),
                                 compute_dtype="float32", conv_impl=impl)
        return jnp.sum(f["conv2_1"] ** 2)

    g_xla = np.asarray(jax.grad(lambda im: loss(im, "xla"))(img))
    g_pl = np.asarray(jax.grad(lambda im: loss(im, "pallas"))(img))
    np.testing.assert_allclose(g_pl, g_xla, rtol=1e-3,
                               atol=1e-2 * np.abs(g_xla).max())
