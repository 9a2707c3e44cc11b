"""Compute ops: losses, matting Laplacian (XLA + Pallas + SPMD), conv
kernel, resize/pooling, metrics.

The Pallas kernel modules (laplacian_pallas, gram_stream, gram_pallas,
pool_pallas, conv_pallas) are imported lazily by their dispatchers
(`laplacian.matvec`, `losses.gram_route`) so CPU-only users never touch
Mosaic machinery.
"""
from .laplacian import (LaplacianStats, matvec, matvec_xla, photoreal_loss,
                        precompute_stats)
from .losses import (content_loss, gram_matrix, gram_route, masked_gram,
                     masked_grams_fused, style_layer_loss, style_loss,
                     tv_loss)
from .metrics import psnr, ssim

__all__ = [
    "LaplacianStats", "matvec", "matvec_xla", "photoreal_loss",
    "precompute_stats", "content_loss", "gram_matrix", "gram_route",
    "masked_gram", "masked_grams_fused", "style_layer_loss", "style_loss",
    "tv_loss", "psnr", "ssim",
]
