"""Streamed masked-Gram Pallas kernel (the layout-tax winner).

Why a second Gram kernel (see ARCHITECTURE.md "layout-tax campaign"):
the production XLA path (`losses.masked_grams_fused`) materializes the
mask-weighted feature block (P, K·C) — 134 MB bf16 at conv1_1/512²/K=4 —
and the round trip through HBM (write + read forward, cotangent write +
read backward) makes the Gram ~1.5 ms of the 8 ms step (profiler, round
2). The earlier streaming attempt (`gram_pallas.py`) fused the masking
but contracted over dim 0 of tall-skinny (P, C) operands, which Mosaic
lowers at ~3.6% MXU — slower than XLA's wide dot despite the HBM saved.

This kernel keeps BOTH properties:
  * streaming — the (P, K·C) block never exists outside VMEM; HBM
    traffic is one read of the tap (plus one read of its transpose) and
    the (K, P) mask-weight planes;
  * MXU-friendly dots — the host side supplies the tap twice, as
    f (P, C) and ft = fᵀ (C, P) (ONE XLA transpose, ~the same cost as
    the relayout the fused path already pays), so every in-kernel
    contraction is a standard (M, K)×(K, N) matmul with the huge P axis
    in the lane/contraction position and NO in-kernel transposes:

      forward, per row band of TRW pixels:
        fwt = [ft·m2₁; …; ft·m2_K]           (K·C, TRW)  lane-broadcast
        G  += fwt · f_band                   (K·C, TRW)×(TRW, C)
      backward (dF_p = Σ_k m2_kp·S_k·F_p with S_k = D_k + D_kᵀ):
        per band, per class:  dftᵀ += (S_k · ft_band)·m2_k
      — the output dft (C, P) is transposed back by XLA (the conv
      backward wants (H, W, C) anyway).

Accumulation is fp32 in a revisited VMEM output block; operands stay in
the configured compute dtype (bf16 by default — exactly what the XLA
path feeds its dot). Masks are optimization CONSTANTS, so their
cotangent is zero (custom_vjp returns symbolic zeros, DCE'd).

SPMD caveat (CLAUDE.md): like every Pallas custom call this does not
partition under a sharded mesh; multi-device paths keep the XLA Gram.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
# VMEM working-set budget for picking the band width (double-buffered
# input blocks + the fp32 accumulator live simultaneously).
_VMEM_BUDGET = 9 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_trw(p: int, k: int, c: int, itemsize: int) -> int:
    """Largest lane-multiple band width whose working set fits VMEM."""
    for trw in (4096, 2048, 1024, 512, 256, _LANE):
        if trw > max(p, _LANE):
            continue
        # fwd: fwt (K·C, TRW) cdt + y-part (K·C, C) f32 + 2×(ft, f) blocks
        work = (k * c * trw * itemsize + k * c * c * 4
                + 2 * 2 * (c * trw + trw * c) * itemsize)
        if work <= _VMEM_BUDGET:
            return trw
    return _LANE


def use_stream(h: int, w: int, k: int, c: int, gram_impl: str) -> bool:
    """Static routing: "stream" forces the kernel; "auto" uses it on TPU
    only ABOVE the fused path's size bound.

    At ordinary sizes the kernel loses to XLA's fused wide matmul
    (512² full step: 79.5 vs 121.1 it/s — the custom call's row-major
    operand constraint relayouts the conv-emitter-layout taps and the
    fᵀ/dft transposes add full-tensor copies; same layout tax that sank
    pool_pallas/gram_pallas). But once the (P, K·C) weighted block
    exceeds the fused bound (losses._FUSED_MAX_ELEMENTS — 2^29 since
    the analytic one-pass Gram VJP; was 3·2^27)
    the XLA fallback is a per-class scan, and streaming crushes it:
    2048² full step 6.48 vs 4.16 it/s (+56%). Unlike the hybrid (which
    matched it there, 6.52), the stream forward never materializes the
    block — memory-safe for arbitrarily large images."""
    if gram_impl == "stream":
        return True
    if gram_impl != "auto" or jax.default_backend() != "tpu":
        return False
    from .losses import _FUSED_MAX_ELEMENTS
    return h * w * k * c > _FUSED_MAX_ELEMENTS


def _fwd_kernel(ft_ref, f_ref, m2_ref, out_ref, *, k: int):
    i = pl.program_id(0)
    ft = ft_ref[...]                                   # (C, TRW)
    fwt = jnp.concatenate(
        [ft * m2_ref[j, :] for j in range(k)], axis=0)  # (K·C, TRW)
    part = jnp.dot(fwt, f_ref[...],
                   preferred_element_type=jnp.float32)  # (K·C, C)

    @pl.when(i == 0)
    def _init():
        out_ref[...] = part

    @pl.when(i > 0)
    def _acc():
        out_ref[...] += part


def _bwd_kernel(ft_ref, m2_ref, s_ref, dft_ref, *, k: int):
    ft = ft_ref[...]                                   # (C, TRW)
    c = ft.shape[0]
    acc = jnp.zeros(ft.shape, jnp.float32)
    for j in range(k):
        y = jnp.dot(s_ref[j * c:(j + 1) * c, :], ft,
                    preferred_element_type=jnp.float32)  # (C, TRW)
        acc += y * m2_ref[j, :]
    dft_ref[...] = acc.astype(dft_ref.dtype)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _gram_raw(f2: jnp.ndarray, m2: jnp.ndarray, k: int) -> jnp.ndarray:
    """Σ_p m2_kp·F_p·F_pᵀ for all k: (Ppad, C)×(Kpad, Ppad) -> (K, C, C).

    Unnormalized; rows of f2 / columns of m2 beyond the true pixel count
    must be zero (they then contribute nothing).
    """
    out, _ = _gram_raw_fwd(f2, m2, k)
    return out


def _gram_fwd_call(f2, ft, m2, k):
    p, c = f2.shape
    trw = _pick_trw(p, k, c, f2.dtype.itemsize)
    assert p % trw == 0, (p, trw)
    kp = m2.shape[0]
    graw = pl.pallas_call(
        partial(_fwd_kernel, k=k),
        grid=(p // trw,),
        in_specs=[
            pl.BlockSpec((c, trw), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((trw, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, trw), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k * c, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k * c, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(_VMEM_BUDGET * 1.6)),
        cost_estimate=pl.CostEstimate(
            flops=2 * k * c * c * p, transcendentals=0,
            bytes_accessed=(2 * p * c + kp * p) * f2.dtype.itemsize),
        interpret=_interpret(),
    )(ft, f2, m2)
    return graw.reshape(k, c, c)


def _gram_raw_fwd(f2, m2, k):
    ft = f2.T                     # ONE XLA transpose, reused by the bwd
    return _gram_fwd_call(f2, ft, m2, k), (ft, m2)


def _gram_raw_bwd(k, res, d):
    ft, m2 = res
    c, p = ft.shape
    cdt = ft.dtype
    trw = _pick_trw(p, k, c, ft.dtype.itemsize)
    kp = m2.shape[0]
    d = d.astype(jnp.float32)
    s = (d + jnp.swapaxes(d, 1, 2)).reshape(k * c, c).astype(cdt)
    dft = pl.pallas_call(
        partial(_bwd_kernel, k=k),
        grid=(p // trw,),
        in_specs=[
            pl.BlockSpec((c, trw), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, trw), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k * c, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, trw), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, p), cdt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(_VMEM_BUDGET * 1.6)),
        cost_estimate=pl.CostEstimate(
            flops=2 * k * c * c * p, transcendentals=0,
            bytes_accessed=(2 * p * c + kp * p) * ft.dtype.itemsize),
        interpret=_interpret(),
    )(ft, m2, s)
    return dft.T, jnp.zeros_like(m2)


_gram_raw.defvjp(_gram_raw_fwd, _gram_raw_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _gram_raw_hybrid(f2: jnp.ndarray, m2: jnp.ndarray, k: int
                     ) -> jnp.ndarray:
    """Like _gram_raw but with the FORWARD on XLA's fused wide matmul.

    Rationale (hybrid = best of both measured worlds): the XLA forward
    (materialized (P, K·C) weighted block + one wide dot) beats every
    streamed forward tried, but XLA's autodiff of that formulation
    moves ~3×134 MB at conv1_1/512²/K=4 — the stored fw residual is
    re-read and a full-size d_fw cotangent is written then re-read. The
    stream BACKWARD kernel needs only one pass over fᵀ (the band dots
    compute dFᵀ = Σ_k m2_k ⊙ (S_k·fᵀ) directly), so the backward HBM
    drops ~6×. Masks are constants — zero cotangent.
    """
    out, _ = _gram_raw_hybrid_fwd(f2, m2, k)
    return out


def _gram_raw_hybrid_fwd(f2, m2, k):
    p, c = f2.shape
    fw = (f2[:, None, :] * m2[:k].T[:, :, None]).reshape(p, k * c)
    g = jnp.dot(f2.T, fw, preferred_element_type=jnp.float32)
    g = g.reshape(c, k, c).transpose(1, 0, 2)            # (K, C, C)
    return g, (f2.T, m2)          # ft residual feeds the stream backward


_gram_raw_hybrid.defvjp(_gram_raw_hybrid_fwd, _gram_raw_bwd)


def masked_grams_hybrid(feat: jnp.ndarray, masks: jnp.ndarray,
                        eps: float = 1e-8,
                        compute_dtype: str | jnp.dtype = "float32",
                        norm: str = "m2") -> jnp.ndarray:
    """masked_grams_fused forward + streamed Pallas backward (see
    _gram_raw_hybrid). Same signature/semantics as the other backends."""
    h, w, c = feat.shape
    k = masks.shape[0]
    cdt = jnp.dtype(compute_dtype)
    p = h * w
    trw = _pick_trw(p, k, c, cdt.itemsize)
    ppad = _round_up(p, trw)
    kpad = _round_up(k, 16)

    f2 = feat.astype(cdt).reshape(p, c)
    m2 = (masks * masks).astype(cdt).reshape(k, p)
    if ppad != p:
        f2 = jnp.pad(f2, ((0, ppad - p), (0, 0)))
        m2 = jnp.pad(m2, ((0, 0), (0, ppad - p)))
    m2 = jnp.pad(m2, ((0, kpad - k), (0, 0)))

    g = _gram_raw_hybrid(f2, m2, k)
    masks32 = masks.astype(jnp.float32)
    n = (jnp.sum(masks32 ** 2, axis=(1, 2)) if norm == "m2"
         else jnp.sum(masks32, axis=(1, 2)))
    return g / jnp.maximum(n, eps)[:, None, None]


def masked_grams_stream(feat: jnp.ndarray, masks: jnp.ndarray,
                        eps: float = 1e-8,
                        compute_dtype: str | jnp.dtype = "float32",
                        norm: str = "m2") -> jnp.ndarray:
    """All K masked Grams, streamed: (H, W, C) × (K, H, W) -> (K, C, C).

    Same math as `losses.masked_grams_fused` (pixel weight m², normalizer
    Σm² for norm="m2" / Σm for "m1"), different lowering: the
    mask-weighted block lives only in VMEM band by band.
    """
    h, w, c = feat.shape
    k = masks.shape[0]
    return masked_grams_stream_flat(
        feat.reshape(h * w, c), masks.reshape(k, h * w),
        eps=eps, compute_dtype=compute_dtype, norm=norm)


def masked_grams_stream_flat(f2d: jnp.ndarray, masks_flat: jnp.ndarray,
                             eps: float = 1e-8,
                             compute_dtype: str | jnp.dtype = "float32",
                             norm: str = "m2") -> jnp.ndarray:
    """`masked_grams_stream` on PRE-FLATTENED operands: (P, C) × (K, P).

    The Gram sum is pixel-permutation-invariant, so any consistent
    (features, masks) pixel order is exact — including orders that
    carry zero-weighted halo/padding rows. This is the strip-form entry
    (round-3 campaign #11b): at 2048²+ the conv1_1 tap lives in s2b
    strip form, and feeding the kernel `vgg.perm_flatten_halo(tap)` (a
    layout BITCAST of the full strip tensor — no interior slice) with
    `vgg.perm_masks_halo` weights replaces the image-order feed chain
    the trace priced at ~10 ms/step (interior slice 3.3 ms + three
    relayout copies) with the kernel's own +25% halo-row overhead.
    """
    p, c = f2d.shape
    k = masks_flat.shape[0]
    cdt = jnp.dtype(compute_dtype)
    trw = _pick_trw(p, k, c, cdt.itemsize)
    ppad = _round_up(p, trw)
    # bf16 sublane tiles are 16 rows; zero rows/classes contribute 0.
    kpad = _round_up(k, 16)

    f2 = f2d.astype(cdt)
    m2 = (masks_flat * masks_flat).astype(cdt)
    if ppad != p:
        f2 = jnp.pad(f2, ((0, ppad - p), (0, 0)))
        m2 = jnp.pad(m2, ((0, 0), (0, ppad - p)))
    m2 = jnp.pad(m2, ((0, kpad - k), (0, 0)))

    g = _gram_raw(f2, m2, k)                            # (K, C, C) fp32
    masks32 = masks_flat.astype(jnp.float32)
    n = (jnp.sum(masks32 ** 2, axis=1) if norm == "m2"
         else jnp.sum(masks32, axis=1))
    return g / jnp.maximum(n, eps)[:, None, None]
