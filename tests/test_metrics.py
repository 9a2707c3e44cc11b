"""SSIM/PSNR sanity (SURVEY.md §7: SSIM harness is a build obligation)."""
import numpy as np

from dpst_tpu.ops.metrics import psnr, ssim


def test_ssim_identity(rng):
    img = rng.uniform(0, 255, (48, 48, 3)).astype(np.float32)
    assert abs(float(ssim(img, img)) - 1.0) < 1e-6


def test_ssim_decreases_with_noise(rng):
    img = rng.uniform(0, 255, (48, 48, 3)).astype(np.float32)
    s_small = float(ssim(img, np.clip(
        img + rng.normal(0, 5, img.shape), 0, 255)))
    s_big = float(ssim(img, np.clip(
        img + rng.normal(0, 50, img.shape), 0, 255)))
    assert 1.0 > s_small > s_big > 0.0


def test_ssim_range(rng):
    a = rng.uniform(0, 255, (32, 32, 3)).astype(np.float32)
    b = rng.uniform(0, 255, (32, 32, 3)).astype(np.float32)
    s = float(ssim(a, b))
    assert -1.0 <= s <= 1.0


def test_ssim_grayscale(rng):
    a = rng.uniform(0, 255, (32, 32)).astype(np.float32)
    assert abs(float(ssim(a, a)) - 1.0) < 1e-6


def test_psnr(rng):
    img = rng.uniform(0, 255, (32, 32, 3)).astype(np.float32)
    assert float(psnr(img, img)) > 100.0
    noisy = np.clip(img + rng.normal(0, 10, img.shape), 0, 255)
    p = float(psnr(img, noisy))
    assert 20.0 < p < 40.0
