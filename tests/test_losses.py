"""Loss math vs hand-rolled numpy (SURVEY.md §4 unit tests)."""
import jax.numpy as jnp
import numpy as np

from dpst_tpu.ops import losses


def test_gram_vs_numpy(rng):
    f = rng.normal(size=(8, 8, 16)).astype(np.float32)
    g = np.asarray(losses.gram_matrix(jnp.asarray(f)))
    flat = f.reshape(-1, 16).astype(np.float64)
    expected = (flat.T @ flat) / 64.0
    np.testing.assert_allclose(g, expected, rtol=1e-4, atol=1e-6)


def test_masked_gram_ones_equals_gram(rng):
    f = rng.normal(size=(8, 8, 16)).astype(np.float32)
    g_plain = np.asarray(losses.gram_matrix(jnp.asarray(f)))
    g_masked = np.asarray(
        losses.masked_gram(jnp.asarray(f), jnp.ones((8, 8))))
    np.testing.assert_allclose(g_masked, g_plain, rtol=1e-5)


def test_masked_gram_zero_mask_is_zero(rng):
    f = rng.normal(size=(8, 8, 16)).astype(np.float32)
    g = np.asarray(losses.masked_gram(jnp.asarray(f), jnp.zeros((8, 8))))
    np.testing.assert_array_equal(g, np.zeros((16, 16)))


def test_masked_gram_vs_numpy(rng):
    f = rng.normal(size=(8, 8, 16)).astype(np.float32)
    m = rng.uniform(size=(8, 8)).astype(np.float32)
    g = np.asarray(losses.masked_gram(jnp.asarray(f), jnp.asarray(m)))
    fm = (f * m[..., None]).reshape(-1, 16).astype(np.float64)
    expected = (fm.T @ fm) / (m.astype(np.float64) ** 2).sum()
    np.testing.assert_allclose(g, expected, rtol=1e-4)


def test_content_loss(rng):
    a = rng.normal(size=(8, 8, 16)).astype(np.float32)
    b = rng.normal(size=(8, 8, 16)).astype(np.float32)
    val = float(losses.content_loss(jnp.asarray(a), jnp.asarray(b)))
    expected = 0.5 * np.mean((a - b) ** 2)
    np.testing.assert_allclose(val, expected, rtol=1e-5)
    assert float(losses.content_loss(jnp.asarray(a), jnp.asarray(a))) == 0.0


def test_style_layer_loss_padding_invariant(rng):
    """Extra all-zero mask rows (class padding) must not change the loss."""
    f = rng.normal(size=(8, 8, 16)).astype(np.float32)
    masks2 = np.stack([rng.uniform(size=(8, 8)),
                       rng.uniform(size=(8, 8))]).astype(np.float32)
    grams2 = np.stack([rng.normal(size=(16, 16)),
                       rng.normal(size=(16, 16))]).astype(np.float32)
    cov2 = np.array([0.6, 0.4], np.float32)

    loss2 = float(losses.style_layer_loss(
        jnp.asarray(f), jnp.asarray(grams2), jnp.asarray(masks2),
        jnp.asarray(cov2)))

    masks4 = np.concatenate([masks2, np.zeros((2, 8, 8), np.float32)])
    grams4 = np.concatenate([grams2, np.zeros((2, 16, 16), np.float32)])
    cov4 = np.concatenate([cov2, np.zeros(2, np.float32)])
    loss4 = float(losses.style_layer_loss(
        jnp.asarray(f), jnp.asarray(grams4), jnp.asarray(masks4),
        jnp.asarray(cov4)))
    np.testing.assert_allclose(loss2, loss4, rtol=1e-6)


def test_style_layer_loss_zero_at_match(rng):
    """Output == style statistics → zero style loss."""
    f = rng.normal(size=(8, 8, 16)).astype(np.float32)
    mask = np.ones((1, 8, 8), np.float32)
    gram = losses.masked_gram(jnp.asarray(f), jnp.asarray(mask[0]))
    loss = float(losses.style_layer_loss(
        jnp.asarray(f), gram[None], jnp.asarray(mask),
        jnp.ones(1, jnp.float32)))
    assert abs(loss) < 1e-8


def test_tv_loss(rng):
    flat = np.full((8, 8, 3), 7.0, np.float32)
    assert float(losses.tv_loss(jnp.asarray(flat))) == 0.0
    noisy = rng.normal(size=(8, 8, 3)).astype(np.float32)
    assert float(losses.tv_loss(jnp.asarray(noisy))) > 0.0


def test_fused_grams_match_per_class(rng):
    """masked_grams_fused ≡ K independent masked_gram calls."""
    import jax.numpy as jnp
    f = rng.normal(size=(16, 12, 8)).astype(np.float32)
    masks = rng.uniform(size=(3, 16, 12)).astype(np.float32)
    fused = np.asarray(losses.masked_grams_fused(
        jnp.asarray(f), jnp.asarray(masks)))
    for k in range(3):
        single = np.asarray(losses.masked_gram(
            jnp.asarray(f), jnp.asarray(masks[k])))
        np.testing.assert_allclose(fused[k], single, rtol=1e-4,
                                   atol=1e-6, err_msg=f"class {k}")
