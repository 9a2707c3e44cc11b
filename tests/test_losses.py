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


def test_masked_gram_m1_norm_vs_numpy(rng):
    """norm="m1" (reference lineage): G = (M∘F)ᵀ(M∘F) / Σm."""
    f = rng.normal(size=(8, 8, 16)).astype(np.float32)
    m = rng.uniform(size=(8, 8)).astype(np.float32)
    g = np.asarray(losses.masked_gram(jnp.asarray(f), jnp.asarray(m),
                                      norm="m1"))
    fm = (f * m[..., None]).reshape(-1, 16).astype(np.float64)
    expected = (fm.T @ fm) / m.astype(np.float64).sum()
    np.testing.assert_allclose(g, expected, rtol=1e-4, atol=1e-7)
    g_fused = np.asarray(losses.masked_grams_fused(
        jnp.asarray(f), jnp.asarray(m)[None], norm="m1"))[0]
    np.testing.assert_allclose(g_fused, expected, rtol=1e-4, atol=1e-7)


def test_paper_style_norm_vs_numpy(rng):
    """style_norm="paper" (SURVEY.md §2 comp.4): per class,
    ½‖ΔG‖² with Σm-normalized Grams and NO coverage reweighting —
    hand-rolled end to end in numpy (VERDICT r1 #3)."""
    f_out = rng.normal(size=(8, 8, 16)).astype(np.float32)
    f_sty = rng.normal(size=(8, 8, 16)).astype(np.float32)
    cmasks = rng.uniform(size=(3, 8, 8)).astype(np.float32)
    smasks = rng.uniform(size=(3, 8, 8)).astype(np.float32)
    coverage = np.array([0.5, 0.3, 0.2], np.float32)  # must be IGNORED

    def np_gram_m1(f, m):
        fm = (f * m[..., None]).reshape(-1, f.shape[-1]).astype(np.float64)
        return (fm.T @ fm) / max(m.astype(np.float64).sum(), 1e-8)

    expected = 0.0
    for k in range(3):
        d = np_gram_m1(f_out, cmasks[k]) - np_gram_m1(f_sty, smasks[k])
        expected += 0.5 * np.sum(d * d)

    style_grams = losses.masked_grams_fused(
        jnp.asarray(f_sty), jnp.asarray(smasks), norm="m1")
    got = float(losses.style_layer_loss(
        jnp.asarray(f_out), style_grams, jnp.asarray(cmasks),
        jnp.asarray(coverage), style_norm="paper"))
    np.testing.assert_allclose(got, expected, rtol=1e-4)

    # gatys mode on the same inputs differs (different normalization)
    style_grams_g = losses.masked_grams_fused(
        jnp.asarray(f_sty), jnp.asarray(smasks))
    got_gatys = float(losses.style_layer_loss(
        jnp.asarray(f_out), style_grams_g, jnp.asarray(cmasks),
        jnp.asarray(coverage)))
    assert not np.isclose(got, got_gatys)


def test_paper_style_norm_padding_invariant(rng):
    """Zero-mask padding rows contribute exactly 0 in paper mode too."""
    f = rng.normal(size=(8, 8, 16)).astype(np.float32)
    masks2 = rng.uniform(size=(2, 8, 8)).astype(np.float32)
    grams2 = rng.normal(size=(2, 16, 16)).astype(np.float32)
    cov2 = np.ones(2, np.float32)
    loss2 = float(losses.style_layer_loss(
        jnp.asarray(f), jnp.asarray(grams2), jnp.asarray(masks2),
        jnp.asarray(cov2), style_norm="paper"))
    masks4 = np.concatenate([masks2, np.zeros((2, 8, 8), np.float32)])
    grams4 = np.concatenate([grams2, np.zeros((2, 16, 16), np.float32)])
    cov4 = np.concatenate([cov2, np.ones(2, np.float32)])
    loss4 = float(losses.style_layer_loss(
        jnp.asarray(f), jnp.asarray(grams4), jnp.asarray(masks4),
        jnp.asarray(cov4), style_norm="paper"))
    np.testing.assert_allclose(loss4, loss2, rtol=1e-6)


def test_grams_raw_flat_analytic_vjp(rng):
    """The one-pass custom VJP of _grams_raw_flat equals autodiff of the
    same mul+dot chain — soft (non-binary) masks, arbitrary cotangent."""
    import jax
    f = rng.normal(size=(48, 8)).astype(np.float32)
    m2 = rng.uniform(size=(3, 48)).astype(np.float32)
    ct = rng.normal(size=(8, 24)).astype(np.float32)       # (C, K·C)

    def ref(f, m2):
        fw = (f[:, None, :] * m2.T[:, :, None]).reshape(48, 24)
        return jax.lax.dot_general(
            f, fw, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def proj(fn):
        return lambda f: jnp.vdot(fn(f, jnp.asarray(m2)), jnp.asarray(ct))

    g_custom = jax.grad(proj(losses._grams_raw_flat))(jnp.asarray(f))
    g_ref = jax.grad(proj(ref))(jnp.asarray(f))
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)


def test_gram_route_ladder(monkeypatch):
    """The size-laddered auto routing (measured bounds, ARCHITECTURE.md)
    and explicit-impl forcing resolve as documented."""
    import jax

    from dpst_tpu.ops import gram_pallas, gram_stream
    from dpst_tpu.ops.losses import gram_route

    # off-TPU (this CPU suite): auto is fused-or-scan
    assert gram_route(512, 512, 4, 64, "auto") == "fused"
    assert gram_route(2048, 2048, 4, 64, "auto") == "scan"
    # explicit impls force their lowering regardless of size
    assert gram_route(64, 64, 2, 16, "stream") == "stream"
    assert gram_route(64, 64, 2, 16, "hybrid") == "hybrid"
    assert gram_route(64, 64, 2, 16, "pallas") == "pallas"
    assert gram_route(64, 64, 2, 16, "dotg") == "dotg"
    assert gram_route(64, 64, 2, 16, "xla") == "fused"
    assert gram_route(2048, 2048, 8, 64, "xla") == "scan"

    # on TPU (monkeypatched backend): the measured ladder. The hybrid
    # rung left "auto" when the analytic one-pass Gram VJP made plain
    # fused faster at every size it fits (1024²: 39.3 vs 37.0 it/s).
    for mod in (gram_stream,):
        monkeypatch.setattr(mod.jax, "default_backend", lambda: "tpu")
    # (losses and gram_stream share the one jax module — patched above)
    assert gram_route(512, 512, 4, 64, "auto") == "fused"      # 2^26
    assert gram_route(1024, 1024, 4, 64, "auto") == "fused"    # 2^28
    assert gram_route(2048, 2048, 4, 64, "auto") == "stream"   # 2^30
    assert gram_route(512, 512, 4, 128, "auto") == "fused"     # 2^27
    assert gram_route(512, 512, 4, 256, "auto") == "fused"     # 2^28
    # the bound moved to 2^29 with the analytic VJP (2048² conv2_1
    # fused 6.88 vs streamed 6.74 it/s); boundary stays fused
    assert gram_route(1024, 1024, 4, 128, "auto") == "fused"   # 2^29
    assert gram_route(1024, 1024, 8, 128, "auto") == "stream"  # 2^30
    assert jax.default_backend() == "tpu"                      # patched
