"""Direct unit coverage of the mask pipeline (SURVEY.md §2 comp. 9) and
segmentation helpers — previously exercised only transitively through
prepare_constants/automatic_masks.
"""
import numpy as np
import pytest

from dpst_tpu import segmentation
from dpst_tpu.ops import resize


def _partition_masks(k, h, w, seed=0):
    """Soft masks forming an exact partition of unity."""
    r = np.random.default_rng(seed)
    logits = r.normal(size=(k, h, w)).astype(np.float32)
    e = np.exp(logits)
    return (e / e.sum(axis=0, keepdims=True)).astype(np.float32)


def test_masks_from_labels_one_hot():
    labels = np.array([[3, 3, 7], [7, 12, 3]], np.int32)
    m = segmentation.masks_from_labels(labels, [3, 7, 12], max_classes=5)
    assert m.shape == (5, 2, 3)
    np.testing.assert_array_equal(m[:3].sum(axis=0), np.ones((2, 3)))
    np.testing.assert_array_equal(m[3:], 0.0)
    np.testing.assert_array_equal(m[0], (labels == 3).astype(np.float32))
    with pytest.raises(ValueError, match="max_classes"):
        segmentation.masks_from_labels(labels, [3, 7, 12], max_classes=2)


def test_coverage_weights_partition_and_padding():
    m = _partition_masks(3, 16, 16)
    m = np.concatenate([m, np.zeros((2, 16, 16), np.float32)])  # padding
    w = np.asarray(segmentation.coverage_weights(m))
    assert w.shape == (5,)
    np.testing.assert_array_equal(w[3:], 0.0)
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-6)
    assert (w[:3] > 0).all()


def test_downsample_mask_preserves_partition_of_unity():
    m = _partition_masks(4, 32, 32)
    for factor in (2, 4, 8):
        d = np.asarray(resize.downsample_mask(m, factor, "avg"))
        assert d.shape == (4, 32 // factor, 32 // factor)
        np.testing.assert_allclose(d.sum(axis=0),
                                   np.ones_like(d[0]), rtol=1e-5)
    # nearest keeps binary masks binary (and still partitions)
    hard = (m == m.max(axis=0, keepdims=True)).astype(np.float32)
    n = np.asarray(resize.downsample_mask(hard, 2, "nearest"))
    assert set(np.unique(n)) <= {0.0, 1.0}
    np.testing.assert_array_equal(n.sum(axis=0), np.ones_like(n[0]))


def test_mask_pyramid_layer_shapes():
    m = _partition_masks(2, 64, 48)
    layers = ("conv1_1", "conv2_1", "conv3_1", "conv4_1", "conv5_1")
    pyr = segmentation.layer_masks(m, layers)
    assert np.asarray(pyr["conv1_1"]).shape == (2, 64, 48)
    assert np.asarray(pyr["conv2_1"]).shape == (2, 32, 24)
    assert np.asarray(pyr["conv3_1"]).shape == (2, 16, 12)
    assert np.asarray(pyr["conv4_1"]).shape == (2, 8, 6)
    assert np.asarray(pyr["conv5_1"]).shape == (2, 4, 3)
    for layer in layers:
        np.testing.assert_allclose(
            np.asarray(pyr[layer]).sum(axis=0),
            np.ones_like(np.asarray(pyr[layer])[0]), rtol=1e-5)


def test_resize_image_shapes_and_range():
    r = np.random.default_rng(1)
    img = r.uniform(0, 255, (20, 30, 3)).astype(np.float32)
    out = np.asarray(resize.resize_image(img, (10, 15)))
    assert out.shape == (10, 15, 3)
    assert out.min() >= -1.0 and out.max() <= 256.0
    batched = np.asarray(resize.resize_image(img[None], (40, 60)))
    assert batched.shape == (1, 40, 60, 3)


def test_segment_images_end_to_end():
    """PSPNet on both images (random init): ADE20K label maps at image
    resolution, deterministic across calls."""
    r = np.random.default_rng(2)
    content = r.uniform(0, 255, (48, 64, 3)).astype(np.float32)
    style = r.uniform(0, 255, (32, 40, 3)).astype(np.float32)
    from dpst_tpu.models import pspnet
    params = pspnet.get_params(seed=0)
    seg_c, seg_s = segmentation.segment_images(
        content, style, params, compute_dtype="float32")
    assert seg_c.shape == (48, 64) and seg_s.shape == (32, 40)
    assert seg_c.dtype == np.int32
    assert 0 <= seg_c.min() and seg_c.max() < 150
    seg_c2, _ = segmentation.segment_images(
        content, style, params, compute_dtype="float32")
    np.testing.assert_array_equal(seg_c, seg_c2)


def test_assets_bundle_helpers(tmp_path, monkeypatch):
    from dpst_tpu.utils import assets
    p = assets.bundle_path("vgg19")
    assert p.endswith(".npz")
    monkeypatch.setenv("DPST_VGG_WEIGHTS", str(tmp_path / "nope.npz"))
    assert not assets.bundle_available("vgg19")
    np.savez(tmp_path / "yes.npz", x=np.zeros(1))
    monkeypatch.setenv("DPST_VGG_WEIGHTS", str(tmp_path / "yes.npz"))
    assert assets.bundle_available("vgg19")
