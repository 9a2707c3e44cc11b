"""On-device resize / pooling utilities (images and mask pyramids).

Covers the reference's mask-downsampling pipeline (SURVEY.md §2 comp.9):
per-class soft masks are pooled to each VGG style layer's spatial
resolution. All ops are jnp/XLA — shape-static, fusable, batch-friendly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_image(image: jnp.ndarray, hw: tuple[int, int],
                 method: str = "bilinear") -> jnp.ndarray:
    """Resize (..., H, W, C) to (..., hw[0], hw[1], C)."""
    out_shape = image.shape[:-3] + (hw[0], hw[1], image.shape[-1])
    return jax.image.resize(image, out_shape, method=method)


def downsample_mask(masks: jnp.ndarray, factor: int,
                    method: str = "avg") -> jnp.ndarray:
    """Downsample (K, H, W) soft masks by an integer stride.

    "avg": average pooling — preserves partition-of-unity (Σ_k m_k = 1 at
    every pixel stays exact under linear pooling).
    "nearest": strided subsampling.
    """
    if factor == 1:
        return masks
    if method == "nearest":
        return masks[:, ::factor, ::factor]
    k, h, w = masks.shape
    s = jax.lax.reduce_window(
        masks, 0.0, jax.lax.add,
        (1, factor, factor), (1, factor, factor), "VALID")
    return s / jnp.float32(factor * factor)


def mask_pyramid(masks: jnp.ndarray, layers: tuple[str, ...],
                 method: str = "avg") -> dict:
    """Per-style-layer mask stacks: {layer: (K, H/2^(b-1), W/2^(b-1))}."""
    from ..models.vgg import layer_downsample_factor
    pyr = {}
    for layer in layers:
        pyr[layer] = downsample_mask(
            masks, layer_downsample_factor(layer), method)
    return pyr
