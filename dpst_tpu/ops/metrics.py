"""Image metrics: SSIM and PSNR (jnp, jit-friendly).

BASELINE.md holds this repo to "SSIM ≥ 0.95 vs the reference output" —
skimage is absent from this environment (SURVEY.md §7 risks), so SSIM is
implemented here: the standard Wang et al. 2004 formulation with the
11×11 Gaussian (σ=1.5) window, matching skimage's
`structural_similarity(..., gaussian_weights=True, use_sample_covariance=False)`
defaults for [0, 255] images.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_K1, _K2 = 0.01, 0.03
_SIGMA = 1.5
_RADIUS = 5  # 11×11 window


def _gaussian_kernel() -> jnp.ndarray:
    x = jnp.arange(-_RADIUS, _RADIUS + 1, dtype=jnp.float32)
    g = jnp.exp(-(x ** 2) / (2.0 * _SIGMA ** 2))
    return g / jnp.sum(g)


def _blur(x: jnp.ndarray) -> jnp.ndarray:
    """Separable Gaussian filter over (H, W, C), VALID windows."""
    g = _gaussian_kernel()
    kh = g.reshape(-1, 1, 1, 1)          # (11, 1, 1, 1) HWIO
    kw = g.reshape(1, -1, 1, 1)
    c = x.shape[-1]
    x4 = jnp.moveaxis(x, -1, 0)[..., None]   # (C, H, W, 1)
    dn = jax.lax.conv_dimension_numbers(
        x4.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x4, kh, (1, 1), "VALID", dimension_numbers=dn,
        preferred_element_type=jnp.float32)
    y = jax.lax.conv_general_dilated(
        y, kw, (1, 1), "VALID", dimension_numbers=dn,
        preferred_element_type=jnp.float32)
    return jnp.moveaxis(y[..., 0], 0, -1)


@partial(jax.jit, static_argnames=("data_range",))
def ssim(a: jnp.ndarray, b: jnp.ndarray,
         data_range: float = 255.0) -> jnp.ndarray:
    """Mean SSIM over an (H, W, C) or (H, W) image pair."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    if a.ndim == 2:
        a = a[..., None]
        b = b[..., None]
    c1 = (_K1 * data_range) ** 2
    c2 = (_K2 * data_range) ** 2

    mu_a = _blur(a)
    mu_b = _blur(b)
    mu_aa = mu_a * mu_a
    mu_bb = mu_b * mu_b
    mu_ab = mu_a * mu_b
    var_a = _blur(a * a) - mu_aa
    var_b = _blur(b * b) - mu_bb
    cov = _blur(a * b) - mu_ab

    num = (2.0 * mu_ab + c1) * (2.0 * cov + c2)
    den = (mu_aa + mu_bb + c1) * (var_a + var_b + c2)
    return jnp.mean(num / den)


@partial(jax.jit, static_argnames=("data_range",))
def psnr(a: jnp.ndarray, b: jnp.ndarray,
         data_range: float = 255.0) -> jnp.ndarray:
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    mse = jnp.mean((a - b) ** 2)
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))
