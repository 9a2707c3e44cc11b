"""Compute ops: losses, matting Laplacian (XLA + Pallas), conv kernel,
resize/pooling, metrics."""
from .laplacian import (LaplacianStats, matvec, matvec_xla, photoreal_loss,
                        precompute_stats)
from .losses import (content_loss, gram_matrix, masked_gram,
                     masked_grams_fused, style_layer_loss, style_loss,
                     tv_loss)
from .metrics import psnr, ssim

__all__ = [
    "LaplacianStats", "matvec", "matvec_xla", "photoreal_loss",
    "precompute_stats", "content_loss", "gram_matrix", "masked_gram",
    "masked_grams_fused", "style_layer_loss", "style_loss", "tv_loss",
    "psnr", "ssim",
]
