"""Image I/O edge cases (SURVEY.md §2 comp.13)."""
import numpy as np
import pytest

from dpst_tpu.utils import io


def test_grayscale_array_promoted():
    g = np.random.default_rng(0).uniform(0, 255, (20, 24)).astype(
        np.float32)
    out = io.load_image(g)
    assert out.shape == (20, 24, 3)
    np.testing.assert_array_equal(out[..., 0], out[..., 2])


def test_rgba_array_drops_alpha():
    a = np.random.default_rng(1).uniform(0, 255, (10, 10, 4)).astype(
        np.float32)
    out = io.load_image(a)
    assert out.shape == (10, 10, 3)
    np.testing.assert_array_equal(out, a[..., :3])


def test_unit_range_array_rescaled():
    a = np.random.default_rng(2).uniform(0, 1, (8, 8, 3)).astype(
        np.float32)
    out = io.load_image(a)
    assert out.max() > 1.5  # promoted to [0, 255]
    np.testing.assert_allclose(out, a * 255.0, rtol=1e-6)


def test_int_size_keeps_aspect_snaps_to_8():
    a = np.random.default_rng(3).uniform(0, 255, (100, 200, 3)).astype(
        np.float32)
    out = io.load_image(a, size=96)
    h, w = out.shape[:2]
    assert w == 96 and h % 8 == 0
    assert abs(h / w - 0.5) < 0.1  # aspect roughly preserved


def test_tuple_size_exact():
    a = np.random.default_rng(4).uniform(0, 255, (50, 60, 3)).astype(
        np.float32)
    out = io.load_image(a, size=(40, 48))
    assert out.shape == (40, 48, 3)


def test_save_load_roundtrip(tmp_path):
    a = np.random.default_rng(5).uniform(0, 255, (16, 16, 3)).astype(
        np.float32)
    p = str(tmp_path / "x.png")
    io.save_image(a, p)
    b = io.load_image(p)
    np.testing.assert_allclose(b, np.round(np.clip(a, 0, 255)), atol=0.5)


def test_save_clips_out_of_range(tmp_path):
    a = np.full((8, 8, 3), 300.0, np.float32)
    p = str(tmp_path / "y.png")
    io.save_image(a, p)
    assert io.load_image(p).max() == 255.0


def test_missing_file_raises():
    with pytest.raises(Exception):
        io.load_image("/nonexistent/image.png")
