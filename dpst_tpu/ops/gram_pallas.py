"""Fused masked-Gram Pallas kernel: G_k = Σ_p m²_{k,p}·f_p f_pᵀ, matrix-free.

Why (profiler, 512² step, round 2): the XLA path of
`losses.masked_grams_fused` materializes the mask-weighted feature block
(P, K·C) — 134 MB bf16 at conv1_1 with K=4 — once in the forward and
again (transposed) in the backward, costing ~1.36 ms of the 9.1 ms step.
The contraction is mathematically fᵀ·diag(m²)·f per class: this kernel
streams f through VMEM in P-tiles, applies the m² weighting on the fly,
and accumulates all K Grams in a fp32 VMEM scratch — HBM traffic drops
to one read of f (+ masks) instead of ~4× f plus 2× the K-wide block.

Backward: dL/df_p = Σ_k m²_{k,p} · f_p · (dG_k + dG_kᵀ) — a second
streaming kernel with the same traffic shape. The mask cotangent is
returned as zeros: masks are per-run constants of the optimization (the
same contract as the VGG-weight cotangent in models/vgg._pallas_conv);
differentiate w.r.t. masks through the XLA path if ever needed.

SPMD caveat (CLAUDE.md): Pallas custom calls do not partition — the
multi-device paths (parallel/batch.py, parallel/spatial.py) force the
XLA implementation, exactly as they do for the Laplacian kernel.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# P-tile length: 2048 rows keeps every tile (f, weighted copy, df) well
# under 1 MB of VMEM at C ≤ 512 while amortizing the grid overhead.
_PT = 2048

# Use the kernel only where the streamed contraction actually matters:
# below this pixel count the (P, K·C) block is VMEM-scale and XLA's
# single wide matmul is already optimal (conv4_1/conv5_1 at 512²).
MIN_PIXELS = 16384


def _fwd_kernel(f_ref, m2_ref, out_ref, acc_ref):
    """Grid over P tiles (sequential on TPU): accumulate K Grams.

    m2 arrives as (P, K) so the per-class weight column is a (PT, 1)
    SLICE — a bf16 (PT,)→(PT,1) reshape is a minor-dim insertion Mosaic
    rejects for 16-bit types."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    f = f_ref[:]                               # (PT, C) compute dtype
    k_classes = m2_ref.shape[1]
    c = f.shape[1]
    for k in range(k_classes):                 # static, K ≤ max_classes
        fw = f * m2_ref[:, k:k + 1]            # m²-weighted operand
        acc_ref[k * c:(k + 1) * c, :] += jnp.dot(
            fw.T, f, preferred_element_type=jnp.float32)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _bwd_kernel(f_ref, m2_ref, s_ref, df_ref):
    """df_p = Σ_k m²_{k,p} · (f_p @ S_k), S_k = dG_k + dG_kᵀ (fp32)."""
    f = f_ref[:]                               # (PT, C)
    k_classes = m2_ref.shape[1]
    acc = jnp.zeros(f.shape, jnp.float32)
    for k in range(k_classes):
        g = jnp.dot(f, s_ref[k].astype(f.dtype),
                    preferred_element_type=jnp.float32)
        acc = acc + g * m2_ref[:, k:k + 1].astype(jnp.float32)
    df_ref[:] = acc.astype(df_ref.dtype)


def _pad_rows(x, pt):
    p = x.shape[0]
    rem = (-p) % pt
    if rem:
        x = jnp.pad(x, ((0, rem),) + ((0, 0),) * (x.ndim - 1))
    return x


def _pad_cols(x, pt):
    rem = (-x.shape[-1]) % pt
    if rem:
        x = jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, rem),))
    return x


def _fwd_call(f, m2t, interpret=False):
    k, c = m2t.shape[1], f.shape[1]
    f = _pad_rows(f, _PT)
    m2t = _pad_rows(m2t, _PT)                  # zero rows contribute 0
    p = f.shape[0]
    grid = (p // _PT,)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_PT, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_PT, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k * c, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k * c, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((k * c, c), jnp.float32)],
        interpret=interpret,
    )(f, m2t)
    return out.reshape(k, c, c)


def _bwd_call(f, m2t, s, interpret=False):
    k, c = m2t.shape[1], f.shape[1]
    p_orig = f.shape[0]
    f = _pad_rows(f, _PT)
    m2t = _pad_rows(m2t, _PT)
    p = f.shape[0]
    grid = (p // _PT,)
    df = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_PT, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_PT, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c, c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_PT, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, c), f.dtype),
        interpret=interpret,
    )(f, m2t, s)
    return df[:p_orig]


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def weighted_grams(f: jnp.ndarray, m2t: jnp.ndarray,
                   interpret: bool = False) -> jnp.ndarray:
    """(P, C) features × (P, K) m²-weights -> (K, C, C) fp32 UNNORMALIZED
    Grams (caller divides by Σm²). Differentiable in f; the m2t cotangent
    is zeros (masks are run constants — see module docstring)."""
    return _fwd_call(f, m2t, interpret)


def _weighted_grams_fwd(f, m2t, interpret):
    return _fwd_call(f, m2t, interpret), (f, m2t)


def _weighted_grams_bwd(interpret, res, dg):
    f, m2t = res
    s = (dg + jnp.swapaxes(dg, 1, 2)).astype(jnp.float32)
    df = _bwd_call(f, m2t, s, interpret)
    return df, jnp.zeros_like(m2t)


weighted_grams.defvjp(_weighted_grams_fwd, _weighted_grams_bwd)


def masked_grams_pallas(feat: jnp.ndarray, masks: jnp.ndarray,
                        eps: float = 1e-8,
                        compute_dtype: str | jnp.dtype = "float32",
                        norm: str = "m2",
                        interpret: bool = False) -> jnp.ndarray:
    """Drop-in for losses.masked_grams_fused on the Pallas path.

    Same semantics: masking multiply and matmul operands in
    `compute_dtype`, fp32 accumulation, Σm² (or Σm) normalization.
    """
    h, w, c = feat.shape
    k = masks.shape[0]
    cdt = jnp.dtype(compute_dtype)
    f = feat.astype(cdt).reshape(h * w, c)
    m2t = (masks * masks).astype(cdt).reshape(k, h * w).T
    g = weighted_grams(f, m2t, interpret)
    masks32 = masks.astype(jnp.float32)
    n = (jnp.sum(masks32 ** 2, axis=(1, 2)) if norm == "m2"
         else jnp.sum(masks32, axis=(1, 2)))
    return g / jnp.maximum(n, eps)[:, None, None]


def use_pallas(h: int, w: int, k: int, c: int, impl: str) -> bool:
    """Static routing decision (mirrors laplacian.py's impl switch).

    "auto" resolves to XLA: this kernel is validated (interpret + chip)
    but measured SLOWER than XLA's materialized wide-block matmul in the
    full 512² step (75.7 vs 106.7 it/s) — Mosaic lowers the dim-0
    (P-axis) contraction poorly for tall-skinny C≤64 operands (~3.6% MXU
    at conv1_1; wide/concat variants measured 1.15-1.23 ms vs XLA's
    0.73 ms), so XLA's extra 134 MB of HBM traffic still wins on MXU
    scheduling. Kept as an opt-in baseline for future Mosaic versions,
    exactly like conv_pallas.
    """
    if impl == "pallas":
        return True
    return False
