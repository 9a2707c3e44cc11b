"""Matrix-free matting-Laplacian operator (Levin closed-form matting).

TPU-native replacement for the reference's CPU scipy.sparse Laplacian
(SURVEY.md §2 comp.6, §3.5; "A Closed-Form Solution to Natural Image
Matting", Levin/Lischinski/Weiss, PAMI 2008). The reference builds an N×N
CSR matrix on the host and ships it into the graph; we never materialize a
matrix at all.

The operator: for each interior 3×3 window k of the content image I,
    W_k[i,j] = δ_ij − (1/9)·(1 + (I_i−μ_k)ᵀ (Σ_k + ε/9·Id)⁻¹ (I_j−μ_k)),
and L = Σ_k W_k (scattered into N×N). The matvec y = L·v factorizes into
two 3×3 box-filter passes plus pointwise 3-vector algebra:

  pass 1 (per window center k):
      s_k = Σ_{j∈w_k} v_j                      (box3 of v)
      q_k = Σ_{j∈w_k} I_j·v_j                  (box3 of I∘v, 3-vector)
      t_k = q_k − μ_k·s_k
      b_k = Λ_k·t_k            with Λ_k = (Σ_k + ε/9·Id)⁻¹  (precomputed)
      α_k = (μ_kᵀ·b_k − s_k)/9,   β_k = −b_k/9
  pass 2 (per pixel i):
      y_i = n_i·v_i + box3(α)_i + I_iᵀ·box3(β)_i
  where n_i = #valid windows containing i and α/β are zeroed at invalid
  (border) window centers.

This is O(N) with two small stencils — ideal for TPU: fully fusable XLA
(`reduce_window` + elementwise) with a Pallas fused-stencil variant in
`laplacian_pallas.py` for the hot path. Window statistics (μ, Λ, n) are
precomputed ONCE per content image; each optimizer step pays only the two
box passes per RGB channel, batched into single (H, W, 3) ops.

The photorealism loss L_m = Σ_{c∈RGB} v_cᵀ·L·v_c (paper eq.2 of
arXiv:1703.07511) has analytic gradient 2·L·v_c, wired as a `custom_vjp`
that reuses the forward matvec result — one matvec per step total.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

WIN = 9.0  # |w| — 3×3 windows


class LaplacianStats(NamedTuple):
    """Per-window-center statistics of the content image (all (H, W, ...))."""
    mu: jnp.ndarray        # (H, W, 3)   window mean (zero at invalid centers)
    lam: jnp.ndarray       # (H, W, 3, 3) (Σ_k + ε/9·Id)⁻¹ (zero at invalid)
    valid: jnp.ndarray     # (H, W)      1.0 at interior window centers
    win_count: jnp.ndarray  # (H, W)     n_i = #valid windows containing i
    image: jnp.ndarray     # (H, W, 3)   I in [0, 1] (needed by the matvec)


def _box3(x: jnp.ndarray) -> jnp.ndarray:
    """Sum over the 3×3 neighborhood, zero-padded ("SAME"). x: (H, W, C?)."""
    if x.ndim == 2:
        return jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (3, 3), (1, 1), "SAME")
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (3, 3, 1), (1, 1, 1), "SAME")


def _sym3_inv(m: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form inverse of symmetric 3×3 matrices (..., 3, 3).

    Hand-rolled adjugate/determinant — elementwise VPU math, no LU solve
    (jnp.linalg.inv on huge batches of 3×3s lowers poorly on TPU).
    """
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 1], m[..., 1, 2], m[..., 2, 2]
    co00 = d * f - e * e
    co01 = c * e - b * f
    co02 = b * e - c * d
    co11 = a * f - c * c
    co12 = b * c - a * e
    co22 = a * d - b * b
    det = a * co00 + b * co01 + c * co02
    inv_det = 1.0 / det
    row0 = jnp.stack([co00, co01, co02], axis=-1)
    row1 = jnp.stack([co01, co11, co12], axis=-1)
    row2 = jnp.stack([co02, co12, co22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2) * inv_det[..., None, None]


def precompute_stats(image01: jnp.ndarray,
                     eps: float = 1e-5) -> LaplacianStats:
    """Window statistics of the content image (run once per stylization).

    image01: (H, W, 3) float in [0, 1] (Levin's matting operates on
    unit-range intensities; SURVEY.md §2 comp.6).
    """
    img = image01.astype(jnp.float32)
    h, w, _ = img.shape
    ones = jnp.ones((h, w), jnp.float32)
    # interior window centers only (Levin uses full windows)
    valid = jnp.zeros((h, w), jnp.float32).at[1:-1, 1:-1].set(1.0)

    mu = _box3(img) / WIN                                   # (H, W, 3)
    # second moment  E[I Iᵀ]: box of outer products, 6 unique entries
    outer = img[..., :, None] * img[..., None, :]           # (H, W, 3, 3)
    m2 = _box3(outer.reshape(h, w, 9)).reshape(h, w, 3, 3) / WIN
    cov = m2 - mu[..., :, None] * mu[..., None, :]
    eye = jnp.eye(3, dtype=jnp.float32)
    lam = _sym3_inv(cov + (eps / WIN) * eye)

    vmask = valid[..., None, None]
    mu = mu * valid[..., None]
    lam = lam * vmask
    win_count = _box3(valid)
    return LaplacianStats(mu=mu, lam=lam, valid=valid,
                          win_count=win_count, image=img)


def zero_stats(h: int, w: int) -> LaplacianStats:
    """Stats of the ZERO operator: matvec(zero_stats, v) == 0 exactly.

    Every term of the matvec vanishes — win_count·v (win_count = 0),
    box(α) (α = valid·(…) = 0) and I·box(β) (β = −Λ(…)/9 = 0 with
    Λ = 0) — so vᵀLv and its gradient are exact fp32 zeros, for every
    implementation (the Pallas kernel computes the same expressions).
    Used by `api.prepare_constants` as a layout anchor when photorealism
    is off but the s2b strip path is active: XLA's layout assignment for
    the strip backward flips to a transposed layout without the
    image-space Laplacian gradient consumer, costing ~0.87 ms/step of
    relayout copies at 512² — ~9× the matvec it avoids (profiled in
    ARCHITECTURE.md, round-3 config-2 anomaly)."""
    z2 = jnp.zeros((h, w), jnp.float32)
    z3 = jnp.zeros((h, w, 3), jnp.float32)
    return LaplacianStats(mu=z3, lam=jnp.zeros((h, w, 3, 3), jnp.float32),
                          valid=z2, win_count=z2, image=z3)


def matvec_xla(stats: LaplacianStats, v: jnp.ndarray) -> jnp.ndarray:
    """y = L·v for v of shape (H, W) or (H, W, C) — pure XLA implementation.

    Channels are processed together: box filters run on (H, W, C) blocks so
    HBM traffic over the stats planes is amortized across RGB.
    """
    squeeze = v.ndim == 2
    if squeeze:
        v = v[..., None]
    v = v.astype(jnp.float32)
    img, mu, lam, valid = stats.image, stats.mu, stats.lam, stats.valid
    h, w, c = v.shape

    # pass 1: per-window-center quantities
    s = _box3(v)                                            # (H, W, C)
    # q[.,m,c] = box3(I_m * v_c)
    iv = img[..., :, None] * v[..., None, :]                # (H, W, 3, C)
    q = _box3(iv.reshape(h, w, 3 * c)).reshape(h, w, 3, c)
    t = q - mu[..., :, None] * s[..., None, :]              # (H, W, 3, C)
    # The 3-vector contractions are written as explicit broadcast-mul +
    # sum, NOT einsum/dot: on TPU, fp32 dots default to bf16 MXU passes,
    # and Λ entries reach ~|w|/ε ≈ 1e6 — bf16 roundoff there breaks the
    # operator's PSD property (observed: negative vᵀLv). Elementwise VPU
    # math is exact fp32 and faster for length-3 reductions anyway.
    b = jnp.sum(lam[..., :, :, None] * t[..., None, :, :], axis=-2)
    alpha = (jnp.sum(mu[..., :, None] * b, axis=-2) - s) / WIN
    beta = -b / WIN
    alpha = alpha * valid[..., None]
    beta = beta * valid[..., None, None]

    # pass 2: gather window contributions back to pixels
    box_alpha = _box3(alpha)
    box_beta = _box3(beta.reshape(h, w, 3 * c)).reshape(h, w, 3, c)
    y = (stats.win_count[..., None] * v
         + box_alpha
         + jnp.sum(img[..., :, None] * box_beta, axis=-2))
    return y[..., 0] if squeeze else y


def matvec(stats: LaplacianStats, v: jnp.ndarray,
           impl: str = "auto") -> jnp.ndarray:
    """Dispatch between the XLA and Pallas matvec implementations.

    "auto" → the fused Pallas kernel on TPU (measured 1.13× the XLA path
    in-graph at 512²: 0.389 vs 0.441 ms/matvec on v5e), XLA elsewhere
    (the kernel runs interpret-mode off-TPU — correct but slow).
    Both implementations are validated against each other and the scipy
    CSR oracle.
    """
    if impl == "xla":
        return matvec_xla(stats, v)
    if impl == "pallas" or (impl == "auto"
                            and jax.default_backend() == "tpu"):
        from .laplacian_pallas import matvec_pallas
        return matvec_pallas(stats, v)
    if impl == "auto":
        return matvec_xla(stats, v)
    if impl == "spmd":
        # row-sharded multi-device path: shard_map + halo exchange keeps
        # the Pallas kernel usable under SPMD (laplacian_spmd.py)
        from .laplacian_spmd import matvec_spmd
        return matvec_spmd(stats, v)
    raise ValueError(f"unknown laplacian impl {impl!r}")


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _photoreal(stats: LaplacianStats, img255: jnp.ndarray,
               impl: str) -> jnp.ndarray:
    v = img255.astype(jnp.float32) * (1.0 / 255.0)
    y = matvec(stats, v, impl=impl)
    return jnp.sum(v * y)


def _photoreal_vjp_fwd(stats, img255, impl):
    v = img255.astype(jnp.float32) * (1.0 / 255.0)
    y = matvec(stats, v, impl=impl)
    return jnp.sum(v * y), (stats, y)


def _photoreal_vjp_bwd(impl, res, g):
    stats, y = res
    # d/dv (vᵀLv) = 2·L·v = 2·y (L symmetric); chain through v = img/255.
    # The stats are constants of the optimization — zero cotangents (DCE'd).
    zeros = jax.tree.map(jnp.zeros_like, stats)
    return zeros, (2.0 / 255.0) * y * g


_photoreal.defvjp(_photoreal_vjp_fwd, _photoreal_vjp_bwd)


def photoreal_loss(stats: LaplacianStats, img255: jnp.ndarray,
                   impl: str = "auto") -> jnp.ndarray:
    """Photorealism regularizer Σ_c v_cᵀ·L·v_c on a [0,255] RGB image.

    Exact analytic gradient (2·L·v) via custom_vjp — the backward pass
    reuses the forward matvec result, so each optimizer step pays exactly
    one Laplacian matvec over the 3 channels.
    """
    return _photoreal(stats, img255, impl)
