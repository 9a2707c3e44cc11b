"""Color guided filter — TPU-native smooth-local-affine post-processing.

The DPST lineage's original implementation (Luan et al., arXiv:1703.07511)
ships an optional CUDA `smooth_local_affine` post-process that fits a
local affine transfer from the content image to the stylization per
window and applies the spatially smoothed transform. The automated
reimplementation this project rebuilds drops it (SURVEY.md §2 "Native
components": photorealism is enforced via the matting-Laplacian loss
only). This module restores the capability the TPU way: He et al.'s
color guided filter ("Guided Image Filtering", ECCV 2010) computes the
same windowed ridge-regression affine model in O(N) box filters —
pure fusable XLA, no N×N systems, no CUDA.

Per window k (radius r, pixel count N_k — border-aware):
    A_k = (Σ_k + ε·Id)⁻¹ · cov_k(I, p)        (3×C affine slope)
    b_k = p̄_k − A_kᵀ·μ_k                       (C offset)
    q_i = Ā_iᵀ·I_i + b̄_i                       (window-averaged model)
with I the [0,1] RGB guide (the CONTENT image) and p the signal (the
stylized output). Reuses the matting module's closed-form symmetric 3×3
inverse (`laplacian._sym3_inv`) — elementwise VPU math, no LU.

fp32 throughout: the regression inverts covariance matrices whose
conditioning depends on ε ~ 1e-4 (CLAUDE.md rule 6 — correctness-
critical math must not ride bf16 MXU passes).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .laplacian import _sym3_inv


def _box(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(2r+1)² window sums over the leading two axes of (H, W, C)."""
    k = 2 * r + 1
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (k, k, 1), (1, 1, 1), "SAME")


def _box_counts(h: int, w: int, r: int) -> jnp.ndarray:
    """Border-aware per-pixel window pixel counts, (H, W, 1) fp32.

    Closed form of `_box(ones)`: a SAME (2r+1)-window at position i
    holds min(i, r) + 1 + min(H-1-i, r) rows — computed as a separable
    outer product of two 1-D count vectors instead of reduce_window
    over a constant ones image (which XLA constant-folds with a
    slow-compile warning)."""
    def axis_counts(n: int) -> jnp.ndarray:
        i = jnp.arange(n, dtype=jnp.float32)
        return jnp.minimum(i, r) + 1.0 + jnp.minimum(n - 1 - i, r)
    return (axis_counts(h)[:, None] * axis_counts(w)[None, :])[..., None]


@partial(jax.jit, static_argnames=("radius",))
def guided_filter(guide: jnp.ndarray, src: jnp.ndarray,
                  radius: int = 2, eps: float = 1e-4) -> jnp.ndarray:
    """Edge-preserving smoothing of `src` guided by `guide`.

    guide: (H, W, 3) float in [0, 1] (the content photo).
    src:   (H, W, C) float, any range (filtered per channel).
    radius/eps: window radius and ridge regularizer — smaller eps hews
    closer to a pure local affine recoloring of the guide.
    """
    guide = guide.astype(jnp.float32)
    src = src.astype(jnp.float32)
    h, w, _ = guide.shape
    c = src.shape[-1]

    n = _box_counts(h, w, radius)                             # counts
    mu = _box(guide, radius) / n                               # (H,W,3)
    pbar = _box(src, radius) / n                               # (H,W,C)

    # second moments via 9/3C channel-stacked box passes
    ii = guide[..., :, None] * guide[..., None, :]             # (H,W,3,3)
    corr_ii = _box(ii.reshape(h, w, 9), radius).reshape(h, w, 3, 3) / \
        n[..., None]
    cov_ii = corr_ii - mu[..., :, None] * mu[..., None, :]
    ip = guide[..., :, None] * src[..., None, :]               # (H,W,3,C)
    corr_ip = _box(ip.reshape(h, w, 3 * c), radius
                   ).reshape(h, w, 3, c) / n[..., None]
    cov_ip = corr_ip - mu[..., :, None] * pbar[..., None, :]

    lam = _sym3_inv(cov_ii + eps * jnp.eye(3, dtype=jnp.float32))
    a = jnp.einsum("hwij,hwjc->hwic", lam, cov_ip)             # (H,W,3,C)
    b = pbar - jnp.einsum("hwi,hwic->hwc", mu, a)              # (H,W,C)

    a_bar = _box(a.reshape(h, w, 3 * c), radius
                 ).reshape(h, w, 3, c) / n[..., None]
    b_bar = _box(b, radius) / n
    return jnp.einsum("hwi,hwic->hwc", guide, a_bar) + b_bar


def smooth_local_affine(content: jnp.ndarray, stylized: jnp.ndarray,
                        radius: int = 2, eps: float = 1e-4
                        ) -> jnp.ndarray:
    """Photorealism post-process: re-express the stylization as a
    smoothed local affine function of the content photo (the lineage's
    `smooth_local_affine`, guided-filter formulation).

    content/stylized: (H, W, 3) float [0, 255] RGB.
    Returns the smoothed stylization, clipped to [0, 255].
    """
    out = guided_filter(content.astype(jnp.float32) / 255.0,
                        stylized.astype(jnp.float32) / 255.0,
                        radius=radius, eps=eps)
    return jnp.clip(out * 255.0, 0.0, 255.0)
