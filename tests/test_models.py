"""PSPNet / NIMA model smoke + architecture tests (CPU, random weights —
the architecture must be exact, the weights are drop-in; SURVEY.md §7)."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def image(rng=None):
    r = np.random.default_rng(5)
    return r.uniform(0, 255, (64, 80, 3)).astype(np.float32)


class TestPSPNet:
    def test_segment_shapes_and_determinism(self, image):
        import jax.numpy as jnp
        from dpst_tpu.models import pspnet
        p = pspnet.init_params(0)
        seg = pspnet.segment(p, jnp.asarray(image), compute_dtype="float32")
        assert seg.shape == image.shape[:2]
        assert seg.dtype == jnp.int32
        a = np.asarray(seg)
        assert a.min() >= 0 and a.max() < pspnet.N_CLASSES
        b = np.asarray(
            pspnet.segment(p, jnp.asarray(image), compute_dtype="float32"))
        np.testing.assert_array_equal(a, b)

    def test_param_count_resnet50(self):
        """Backbone conv parameter count must match dilated ResNet-50."""
        from dpst_tpu.models import pspnet
        p = pspnet.init_params(0)
        n = sum(int(np.prod(v["w"].shape)) for k, v in p.items()
                if k.startswith(("stem", "res")))
        # ResNet-50-v1c convs: ~23.5M (no fc); exactness pins architecture
        assert 23_000_000 < n < 24_500_000, n

    def test_output_stride_8(self):
        """res5 feature map must be input/8 (dilated, not strided)."""
        from dpst_tpu.models import pspnet
        assert pspnet.STAGES[2][2] == 1 and pspnet.STAGES[2][3] == 2
        assert pspnet.STAGES[3][2] == 1 and pspnet.STAGES[3][3] == 4

    def test_logits_forward(self):
        import jax.numpy as jnp
        from dpst_tpu.models import pspnet
        p = pspnet.init_params(0)
        x = jnp.zeros((1, 473, 473, 3))
        out = pspnet.forward(p, x, compute_dtype="float32")
        assert out.shape == (1, 473, 473, 150)


class TestNIMA:
    def test_score_scalar_and_range(self, image):
        import jax.numpy as jnp
        from dpst_tpu.models import nima
        p = nima.init_params(0)
        s = float(nima.nima_score(p, jnp.asarray(image),
                                  compute_dtype="float32"))
        assert 1.0 <= s <= 10.0

    def test_distribution_normalized(self):
        import jax.numpy as jnp
        from dpst_tpu.models import nima
        p = nima.init_params(0)
        x = jnp.zeros((2, 224, 224, 3))
        d = nima.score_distribution(p, x, compute_dtype="float32")
        assert d.shape == (2, 10)
        np.testing.assert_allclose(np.asarray(d).sum(-1), 1.0, rtol=1e-5)

    def test_batched(self, image):
        import jax.numpy as jnp
        from dpst_tpu.models import nima
        p = nima.init_params(0)
        batch = np.stack([image, image[::-1]])
        s = nima.nima_score(p, jnp.asarray(batch), compute_dtype="float32")
        assert s.shape == (2,)
        s1 = nima.nima_score(p, jnp.asarray(image),
                             compute_dtype="float32")
        np.testing.assert_allclose(float(s[0]), float(s1), rtol=1e-4)


class TestMerge:
    def test_similarity_matrix_props(self):
        from dpst_tpu import semantic_merge as sm
        for metric in ("grouped", "token", "combined"):
            s = sm.similarity_matrix(metric)
            assert s.shape == (150, 150)
            np.testing.assert_array_equal(np.diag(s), np.ones(150))
            np.testing.assert_allclose(s, s.T)
            assert s.min() >= 0.0 and s.max() <= 1.0

    def test_merge_aligns_label_sets(self):
        from dpst_tpu import semantic_merge as sm
        seg_c = np.zeros((32, 32), np.int64)
        seg_c[:12] = 2          # sky
        seg_c[12:20] = 21       # water
        seg_c[20:] = 4          # tree (content only)
        seg_s = np.zeros((32, 32), np.int64)
        seg_s[:8] = 2
        seg_s[8:16] = 26        # sea (style only, ~water)
        seg_s[16:] = 21
        mc, ms, ids = sm.merge_classes(seg_c, seg_s, metric="grouped",
                                       threshold=0.25)
        assert set(np.unique(mc)) == set(np.unique(ms)) == set(ids)
        assert ms[10, 0] == 21  # sea -> water (same semantic group)

    def test_max_classes_cap(self):
        from dpst_tpu import semantic_merge as sm
        r = np.random.default_rng(3)
        seg = r.integers(0, 30, (64, 64))
        mc, ms, ids = sm.merge_classes(seg, seg, max_classes=5)
        assert len(ids) <= 5
        assert set(np.unique(mc)) <= set(ids)

    def test_disjoint_label_sets(self):
        from dpst_tpu import semantic_merge as sm
        mc, ms, ids = sm.merge_classes(
            np.full((8, 8), 5), np.full((8, 8), 7))
        assert len(ids) == 1
        assert np.unique(mc).tolist() == np.unique(ms).tolist() == ids

    def test_embedding_matrix_asset_hook(self, tmp_path, monkeypatch):
        """$DPST_SIMILARITY_MATRIX drops in the paper's word-embedding
        metric (VERDICT r1 #3): the asset is used for metric='embedding',
        takes precedence for built-in names, renormalizes cosine range,
        and malformed assets are rejected."""
        from dpst_tpu import semantic_merge as sm

        r = np.random.default_rng(8)
        # synthetic "embeddings" -> cosine similarity in [-1, 1]
        emb = r.normal(size=(150, 16))
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        cos = (emb @ emb.T).astype(np.float32)
        path = str(tmp_path / "similarity_matrix.npz")
        np.savez(path, similarity=cos)
        monkeypatch.setenv("DPST_SIMILARITY_MATRIX", path)

        s = sm.similarity_matrix("embedding")
        assert s.shape == (150, 150)
        assert s.min() >= 0.0 and s.max() <= 1.0   # renormalized
        np.testing.assert_array_equal(np.diag(s), np.ones(150))
        np.testing.assert_allclose(s, s.T, atol=1e-6)
        # precedence over built-in metrics while the asset is present
        np.testing.assert_array_equal(sm.similarity_matrix("grouped"), s)
        # merge runs with it
        mc, ms, ids = sm.merge_classes(
            np.full((8, 8), 2), np.full((8, 8), 2), metric="embedding")
        assert ids == [2]

        # malformed assets are rejected loudly
        bad = str(tmp_path / "bad.npz")
        np.savez(bad, similarity=np.zeros((10, 10), np.float32))
        monkeypatch.setenv("DPST_SIMILARITY_MATRIX", bad)
        try:
            sm.similarity_matrix("embedding")
            assert False, "expected ValueError for wrong shape"
        except ValueError:
            pass
        monkeypatch.delenv("DPST_SIMILARITY_MATRIX")
        # without the asset, 'embedding' demands it
        try:
            sm.similarity_matrix("embedding")
            assert False, "expected FileNotFoundError"
        except FileNotFoundError:
            pass


class TestAutomaticMasks:
    def test_end_to_end_masks(self, image):
        from dpst_tpu import StylizeConfig
        from dpst_tpu import segmentation
        from dpst_tpu.models import pspnet
        cfg = StylizeConfig(max_classes=4, compute_dtype="float32")
        style = image[::-1].copy()
        p = pspnet.init_params(0)
        mc, ms, ids = segmentation.automatic_masks(image, style, cfg, p)
        assert mc.shape == (4,) + image.shape[:2]
        assert ms.shape == (4,) + style.shape[:2]
        # each pixel belongs to exactly one class (partition of unity)
        np.testing.assert_allclose(mc.sum(0), np.ones(image.shape[:2]))
        np.testing.assert_allclose(ms.sum(0), np.ones(style.shape[:2]))

    def test_segment_batch_chunking(self, image):
        """segment_batch's fixed-size chunking (tail zero-padded and
        discarded) returns the same labels regardless of chunk size."""
        import jax.numpy as jnp
        from dpst_tpu.models import pspnet
        p = pspnet.init_params(0)
        imgs = np.stack([image, np.roll(image, 5, axis=0),
                         image[::-1].copy()])
        a = np.asarray(pspnet.segment_batch(
            p, jnp.asarray(imgs), "float32", chunk=2))  # 2 chunks + pad
        b = np.asarray(pspnet.segment_batch(
            p, jnp.asarray(imgs), "float32", chunk=8))  # 1 padded chunk
        assert a.shape == (3,) + image.shape[:2]
        np.testing.assert_array_equal(a, b)

    def test_batch_matches_per_pair(self, image):
        """automatic_masks_batch (one batched PSPNet dispatch for all
        contents + one for the style) reproduces the per-pair loop."""
        from dpst_tpu import StylizeConfig
        from dpst_tpu import segmentation
        from dpst_tpu.models import pspnet
        cfg = StylizeConfig(max_classes=4, compute_dtype="float32")
        style = image[::-1].copy()
        contents = np.stack([image, np.roll(image, 7, axis=1)])
        p = pspnet.init_params(0)
        cm_b, sm_b = segmentation.automatic_masks_batch(
            contents, style, cfg, p)
        assert cm_b.shape == (2, 4) + image.shape[:2]
        for i, c in enumerate(contents):
            mc, ms, _ = segmentation.automatic_masks(c, style, cfg, p)
            np.testing.assert_array_equal(cm_b[i], mc)
            np.testing.assert_array_equal(sm_b[i], ms)
