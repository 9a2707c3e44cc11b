"""Loss terms: content, (masked) Gram style, total variation.

TPU-native rebuild of the reference's loss construction layer
(SURVEY.md §2 comps. 3-4; paper eqs. 1, 3-4 of arXiv:1703.07511):
  * content loss — ½·mean‖F_l[O] − F_l[C]‖² at the content tap(s);
  * style loss — per merged semantic class c and style layer l, the Gram
    matrix of mask-weighted features, compared between output and style;
  * optional total-variation smoothing.

Design notes (tpu-first):
  * all K per-class Grams are ONE (C,P)×(P,K·C) MXU contraction
    (`masked_grams_fused`) — K× wider output tiles keep the systolic
    array occupied (measured 1.2-1.3× full-step speedup over a K-scan of
    small matmuls); a memory-light per-class `lax.scan` fallback covers
    shapes where the weighted block would exceed ~1 GB;
  * everything is shape-static: masks are padded to `max_classes` with
    all-zero rows, which contribute exactly 0 loss (zero coverage weight);
  * all accumulation in fp32 regardless of the conv compute dtype.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def content_loss(feat_out: jnp.ndarray, feat_content: jnp.ndarray
                 ) -> jnp.ndarray:
    """½·mean squared feature difference (paper eq. 1, normalized)."""
    d = feat_out.astype(jnp.float32) - feat_content.astype(jnp.float32)
    return 0.5 * jnp.mean(d * d)


def gram_matrix(feat: jnp.ndarray) -> jnp.ndarray:
    """Pixel-normalized Gram: (H, W, C) -> (C, C), G = FᵀF / P."""
    h, w, c = feat.shape
    f = feat.reshape(h * w, c).astype(jnp.float32)
    g = jnp.dot(f.T, f, preferred_element_type=jnp.float32)
    return g / jnp.float32(h * w)


def masked_gram(feat: jnp.ndarray, mask: jnp.ndarray,
                eps: float = 1e-8,
                compute_dtype: str | jnp.dtype = "float32",
                norm: str = "m2") -> jnp.ndarray:
    """Gram of mask-weighted features, normalized by effective pixel count.

    feat: (H, W, C); mask: (H, W) soft in [0,1].
    G = (M∘F)ᵀ(M∘F) / max(n, eps)  — an all-zero mask yields G = 0 —
    with n = Σ m² (`norm="m2"`, this repo's default: the exact soft-mask
    analogue of "pixels in the region") or n = Σ m (`norm="m1"`, the
    reference lineage's normalizer; identical for binary masks).

    compute_dtype: dtype of the masking multiply and matmul operands
    (accumulation is always fp32). bfloat16 runs the MXU at full rate and
    halves the HBM traffic of the per-class masked feature copies — use
    the same dtype on the style-precompute and output sides so the Gram
    difference stays unbiased.
    """
    h, w, c = feat.shape
    cdt = jnp.dtype(compute_dtype)
    fm = (feat.astype(cdt) * mask[..., None].astype(cdt)).reshape(h * w, c)
    g = jnp.dot(fm.T, fm, preferred_element_type=jnp.float32)
    n = jnp.sum(mask * mask) if norm == "m2" else jnp.sum(mask)
    return g / jnp.maximum(n, eps)


def masked_grams_fused(feat: jnp.ndarray, masks: jnp.ndarray,
                       eps: float = 1e-8,
                       compute_dtype: str | jnp.dtype = "float32",
                       norm: str = "m2") -> jnp.ndarray:
    """All K masked Grams in ONE matmul: (H, W, C) × (K, H, W) -> (K, C, C).

    Builds the mask-weighted feature block F_w of shape (P, K·C) and
    computes Fᵀ·F_w — a single (C, P)×(P, K·C) MXU contraction instead of
    K small (C, P)×(P, C) ones. Same FLOPs and HBM bytes, but the output
    tile is K× wider, so the systolic array runs at far higher occupancy
    (K=4, C=64 at conv1_1: 64×256 vs 64×64 output tiles).

    `norm` as in masked_gram ("m2" default, "m1" reference lineage).
    """
    h, w, c = feat.shape
    k = masks.shape[0]
    cdt = jnp.dtype(compute_dtype)
    f = feat.astype(cdt).reshape(h * w, c)
    # one unmasked operand × one m²-weighted operand ≡ (m∘F)ᵀ(m∘F);
    # _grams_raw_flat carries the one-pass analytic backward (dF =
    # Σ_k FW_k(dG_k+dG_kᵀ) — autodiff of the mul+dot chain re-walks
    # the (P, K·C) block three times per step; measured +6.7% full-step
    # on the strip path, same structure here)
    m2 = (masks * masks).astype(cdt).reshape(k, h * w)
    g = _grams_raw_flat(f, m2)
    g = g.reshape(c, k, c).transpose(1, 0, 2)            # (K, C, C)
    masks32 = masks.astype(jnp.float32)
    n = (jnp.sum(masks32 ** 2, axis=(1, 2)) if norm == "m2"
         else jnp.sum(masks32, axis=(1, 2)))
    return g / jnp.maximum(n, eps)[:, None, None]


def masked_grams_fused_nhwc(feat: jnp.ndarray, masks: jnp.ndarray,
                            eps: float = 1e-8,
                            compute_dtype: str | jnp.dtype = "float32",
                            norm: str = "m2") -> jnp.ndarray:
    """masked_grams_fused without the (P, C) reshape: contracts the (H, W)
    dims of the NHWC tap directly via `dot_general`.

    Same math as masked_grams_fused; the point is layout — the explicit
    reshape to (P, K·C) forces the tap out of XLA's conv-emitter layout
    before the matmul, while a dot whose contracting dims are the spatial
    dims leaves the relayout decision to the dot emitter (gram_impl="dotg"
    experiment; see ARCHITECTURE.md layout-tax discussion).

    Measured (tools/perf_lab.py, 512² full step, v5e): 109.8 vs
    114.6 it/s — the dot emitter's own handling of the 3-D operands costs
    more than the explicit reshape. Opt-in.
    """
    h, w, c = feat.shape
    k = masks.shape[0]
    cdt = jnp.dtype(compute_dtype)
    f = feat.astype(cdt)                                       # (H, W, C)
    m2 = (masks * masks).astype(cdt).transpose(1, 2, 0)        # (H, W, K)
    fw = f[:, :, None, :] * m2[:, :, :, None]                  # (H, W, K, C)
    g = jax.lax.dot_general(
        f, fw.reshape(h, w, k * c),
        dimension_numbers=(((0, 1), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32)                    # (C, K·C)
    g = g.reshape(c, k, c).transpose(1, 0, 2)                  # (K, C, C)
    masks32 = masks.astype(jnp.float32)
    n = (jnp.sum(masks32 ** 2, axis=(1, 2)) if norm == "m2"
         else jnp.sum(masks32, axis=(1, 2)))
    return g / jnp.maximum(n, eps)[:, None, None]


@jax.custom_vjp
def _grams_raw_flat(f: jnp.ndarray, m2: jnp.ndarray) -> jnp.ndarray:
    """Unnormalized flat masked Grams: (P, C) × (K, P) m² -> (C, K·C).

    G[c1, (k, c2)] = Σ_p f[p, c1] · m2[k, p] · f[p, c2] — a dim-0
    `dot_general` of f against the (P, K·C) weighted block.

    Custom VJP: G_k = Fᵀdiag(m²_k)F is quadratic in F, so
        dF = Σ_k diag(m²_k) F (dG_k + dG_kᵀ) = Σ_k FW_k (dG_k + dG_kᵀ)
    — ONE dot of the already-materialized weighted block FW against the
    tiny symmetrized (K, C, C) cotangent. Autodiff of the mul+dot chain
    instead makes three passes over the block per step (write dFW, read
    FW for the direct term, read dFW for the mul backward — the two
    ~230 µs ops in the round-3 512² trace); this backward makes one.
    m² is a loop-invariant constant — its cotangent is zeros (DCE'd).
    """
    p, c = f.shape
    k = m2.shape[0]
    fw = (f[:, None, :] * m2.T[:, :, None]).reshape(p, k * c)
    return jax.lax.dot_general(
        f, fw, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # (C, K·C)


def _grams_raw_flat_fwd(f, m2):
    p, c = f.shape
    k = m2.shape[0]
    fw = (f[:, None, :] * m2.T[:, :, None]).reshape(p, k * c)
    g = jax.lax.dot_general(
        f, fw, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return g, (fw, c, k)


def _grams_raw_flat_bwd(res, dg):
    fw, c, k = res
    p = fw.shape[0]
    dg = dg.reshape(c, k, c)
    s = (dg + dg.transpose(2, 1, 0)).astype(fw.dtype)      # (C, K, C) sym
    # contract fw's (k, c1) against s[c1, k, c2] -> free c2
    df = jax.lax.dot_general(
        fw.reshape(p, k, c), s.transpose(1, 0, 2),         # (K, C, C)
        dimension_numbers=(((1, 2), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32).astype(fw.dtype)
    return df, jnp.zeros((k, p), fw.dtype)


_grams_raw_flat.defvjp(_grams_raw_flat_fwd, _grams_raw_flat_bwd)


def masked_grams_flat(f2d: jnp.ndarray, masks_flat: jnp.ndarray,
                      eps: float = 1e-8,
                      compute_dtype: str | jnp.dtype = "float32",
                      norm: str = "m2") -> jnp.ndarray:
    """All K masked Grams from PRE-FLATTENED operands: (P, C) features ×
    (K, P) masks -> (K, C, C), normalized like `masked_grams_fused`.

    The Gram sum is permutation-invariant over P, so the caller may
    flatten pixels in ANY order as long as features and masks use the
    same one. The strip-form tap path (optimize.make_loss_fn,
    strip_gram="perm") exploits this: it flattens block-1/2 taps in the
    conv-emitter layout's own memory order — (rows, W, strips, C), a
    pure bitcast of the strip tensor since the strip axis spans exactly
    the sublane tile — with the loop-invariant masks permuted to match
    (vgg.perm_masks), so the (P, C) view costs no relayout copy. The
    contraction itself is `dot_general` over dim 0 of both operands (no
    explicit fᵀ transpose op), with the one-pass analytic backward of
    `_grams_raw_flat`.
    """
    c = f2d.shape[1]
    k = masks_flat.shape[0]
    cdt = jnp.dtype(compute_dtype)
    f = f2d.astype(cdt)
    # the weighting is always m² ((m∘F)ᵀ(m∘F) = Fᵀdiag(m²)F); `norm`
    # only selects the normalizer below, as in masked_grams_fused
    m2 = masks_flat.astype(cdt) * masks_flat.astype(cdt)
    g = _grams_raw_flat(f, m2)                             # (C, K·C)
    g = g.reshape(c, k, c).transpose(1, 0, 2)              # (K, C, C)
    m32 = masks_flat.astype(jnp.float32)
    n = (jnp.sum(m32 * m32, axis=1) if norm == "m2"
         else jnp.sum(m32, axis=1))
    return g / jnp.maximum(n, eps)[:, None, None]


@jax.custom_vjp
def _grams_raw_nd(f: jnp.ndarray, m2: jnp.ndarray) -> jnp.ndarray:
    """Unnormalized masked Grams from an UNFLATTENED pixel block:
    (..., C) features × (K, ...) m² -> (C, K·C), contracting every
    pixel dim in place via dot_general — no (P, C) flatten. Same math
    and analytic one-pass VJP as _grams_raw_flat; used where the
    explicit flatten forces relayout copies (the s2d block-1 tap's
    64-lane parity slices measured ~0.5 ms/step of slice copies when
    flattened — fed unflattened, the weighting mul and the dot absorb
    the slice)."""
    nd = f.ndim - 1
    c = f.shape[-1]
    k = m2.shape[0]
    fw = (f[..., None, :] * jnp.moveaxis(m2, 0, -1)[..., :, None]
          ).reshape(f.shape[:-1] + (k * c,))
    dims = tuple(range(nd))
    return jax.lax.dot_general(
        f, fw, dimension_numbers=((dims, dims), ((), ())),
        preferred_element_type=jnp.float32)


def _grams_raw_nd_fwd(f, m2):
    nd = f.ndim - 1
    c = f.shape[-1]
    k = m2.shape[0]
    fw = (f[..., None, :] * jnp.moveaxis(m2, 0, -1)[..., :, None]
          ).reshape(f.shape[:-1] + (k * c,))
    dims = tuple(range(nd))
    g = jax.lax.dot_general(
        f, fw, dimension_numbers=((dims, dims), ((), ())),
        preferred_element_type=jnp.float32)
    return g, (fw, c, k)


def _grams_raw_nd_bwd(res, dg):
    fw, c, k = res
    nd = fw.ndim - 1
    dg = dg.reshape(c, k, c)
    s = (dg + dg.transpose(2, 1, 0)).astype(fw.dtype)      # (C, K, C)
    df = jax.lax.dot_general(
        fw.reshape(fw.shape[:-1] + (k, c)), s.transpose(1, 0, 2),
        dimension_numbers=(((nd, nd + 1), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32).astype(fw.dtype)
    return df, jnp.zeros((k,) + fw.shape[:-1], fw.dtype)


_grams_raw_nd.defvjp(_grams_raw_nd_fwd, _grams_raw_nd_bwd)


def masked_grams_nd_multi(parts, eps: float = 1e-8,
                          compute_dtype: str | jnp.dtype = "float32",
                          norm: str = "m2") -> jnp.ndarray:
    """All K masked Grams from several UNFLATTENED pixel blocks:
    [((..., C), (K, ...)), ...] -> (K, C, C), one normalization over
    the union. The s2d tap path feeds its four parity lane-slices
    here without reshapes."""
    c = parts[0][0].shape[-1]
    k = parts[0][1].shape[0]
    cdt = jnp.dtype(compute_dtype)
    g = None
    n = None
    for f, masks in parts:
        m2 = masks.astype(cdt) * masks.astype(cdt)
        gi = _grams_raw_nd(f.astype(cdt), m2)              # (C, K·C)
        g = gi if g is None else g + gi
        m32 = masks.astype(jnp.float32)
        axes = tuple(range(1, m32.ndim))
        ni = (jnp.sum(m32 * m32, axis=axes) if norm == "m2"
              else jnp.sum(m32, axis=axes))
        n = ni if n is None else n + ni
    g = g.reshape(c, k, c).transpose(1, 0, 2)              # (K, C, C)
    return g / jnp.maximum(n, eps)[:, None, None]


def masked_grams_flat_multi(parts, eps: float = 1e-8,
                            compute_dtype: str | jnp.dtype = "float32",
                            norm: str = "m2") -> jnp.ndarray:
    """All K masked Grams from SEVERAL pre-flattened pixel blocks:
    [((P_i, C), (K, P_i)), ...] -> (K, C, C), normalized ONCE over the
    union (the Gram sum splits over any pixel partition).

    The s2d block-1 tap consumes through this: its (…, 4C) grid tensor
    splits into four 64-lane parity slices, each flattened by collapsing
    LEADING dims only — no lane-regrouping reshape, which measured
    ~0.9 ms/step of relayout copies when the tap was flattened
    interleaved (round-3 campaign #7 first cut).
    """
    c = parts[0][0].shape[1]
    k = parts[0][1].shape[0]
    cdt = jnp.dtype(compute_dtype)
    g = None
    n = None
    for f2d, masks_flat in parts:
        m2 = masks_flat.astype(cdt) * masks_flat.astype(cdt)
        gi = _grams_raw_flat(f2d.astype(cdt), m2)          # (C, K·C)
        g = gi if g is None else g + gi
        m32 = masks_flat.astype(jnp.float32)
        ni = (jnp.sum(m32 * m32, axis=1) if norm == "m2"
              else jnp.sum(m32, axis=1))
        n = ni if n is None else n + ni
    g = g.reshape(c, k, c).transpose(1, 0, 2)              # (K, C, C)
    return g / jnp.maximum(n, eps)[:, None, None]


# The fused path materializes the (P, K·C) mask-weighted block; beyond
# this bound the block stops being worth storing and "auto" streams
# (gram_stream.use_stream reads this constant). The analytic one-pass
# VJP moved the bound up from 3·2^27: with the backward's extra block
# passes gone, storing a 1 GB block still wins — 2048² full step 6.88
# (conv2_1 = 2^29 elements fused) vs 6.74 it/s (streamed). conv1_1 at
# 2048² (2^30, a 2.1 GB block) stays streamed.
_FUSED_MAX_ELEMENTS = 1 << 29
# The hybrid (XLA fused fwd + streamed Pallas bwd) rung existed because
# autodiff of the fused chain re-walked the (P, K·C) block three times
# in the backward (1024² conv1_1: hybrid 33.0 vs fused 31.9 it/s,
# round 2). The analytic one-pass VJP (_grams_raw_flat) removed those
# passes in pure XLA: re-measured 1024² full step fused 39.3 vs hybrid
# 37.0 it/s — "auto" no longer routes hybrid; it stays an explicit
# opt-in (see gram_stream._gram_raw_hybrid).


def gram_route(h: int, w: int, k: int, c: int, gram_impl: str) -> str:
    """Resolve the masked-Gram lowering for one layer shape.

    Explicit impls ("stream"/"hybrid"/"pallas"/"dotg"/"xla") force their
    lowering (with "xla" still falling back to the per-class scan above
    _FUSED_MAX_ELEMENTS — the fused block must fit). "auto" ladders by
    weighted-block size on TPU, each step measured (ARCHITECTURE.md):

        elements = H·W·K·C      lowering            why it wins there
        ≤ 3·2^27                fused XLA wide dot  one-pass analytic VJP
        > 3·2^27                stream              block never
                                                    materializes
                                                    (2048²: 6.48 vs 4.16)

    Off-TPU "auto" is fused-or-scan (the kernels would run interpreted).
    """
    from .gram_pallas import use_pallas
    from .gram_stream import use_stream
    size = h * w * k * c
    if use_stream(h, w, k, c, gram_impl):
        return "stream"
    if gram_impl == "hybrid":
        return "hybrid"
    if use_pallas(h, w, k, c, gram_impl):
        return "pallas"
    if gram_impl == "dotg":
        return "dotg"
    return "fused" if size <= _FUSED_MAX_ELEMENTS else "scan"


def style_layer_loss(feat_out: jnp.ndarray | None,
                     style_grams: jnp.ndarray,
                     out_masks: jnp.ndarray,
                     coverage: jnp.ndarray,
                     compute_dtype: str | jnp.dtype = "float32",
                     style_norm: str = "gatys",
                     gram_impl: str = "auto",
                     g_out: jnp.ndarray | None = None) -> jnp.ndarray:
    """Masked Gram style loss for one VGG layer, summed over classes.

    feat_out:    (H, W, C) output-image features at this layer.
    style_grams: (K, C, C) precomputed masked Grams of the STYLE image
                 (normalizer matching `style_norm` — see
                 api.prepare_constants).
    out_masks:   (K, H, W) content-image masks at this layer's resolution
                 (the output is spatially aligned with the content image).
    coverage:    (K,) per-class weights (content-mask coverage fractions);
                 zero rows of padding carry zero coverage → zero loss.
                 Ignored in "paper" mode (padding still contributes 0:
                 both Grams vanish).

    style_norm="gatys" (default): per class,
        coverage_k / (4 C²) · Σ (G_out,k − G_style,k)²
    with Σm²-normalized Grams — Gatys normalization, coverage-weighted.
    style_norm="paper": reference-exact (SURVEY.md §2 comp.4,
    arXiv:1703.07511 eqs. 3-4): per class, ½ Σ (ΔG)² with Σm-normalized
    Grams (the 1/(2 N_{l,c}²) per-class scale with each Gram normalized
    by its own region size) and NO coverage reweighting.

    g_out: (K, C, C) PRE-NORMALIZED output Grams computed elsewhere
    (the block-1/2 streaming path, vgg.stream_block12_grams) — skips
    the Gram contraction here; feat_out may then be None.
    """
    c = style_grams.shape[-1]
    k = out_masks.shape[0]
    if style_norm == "paper":
        scale = 0.5
        class_w = jnp.ones_like(coverage)
        norm = "m1"
    else:
        scale = 1.0 / (4.0 * c * c)
        class_w = coverage
        norm = "m2"

    if g_out is not None:
        d = g_out - style_grams
        per_class = jnp.sum(d * d, axis=(1, 2))
        return scale * jnp.sum(class_w * per_class)

    h, w, c = feat_out.shape
    route = gram_route(h, w, k, c, gram_impl)
    if route != "scan":
        if route == "stream":
            from .gram_stream import masked_grams_stream as fn
        elif route == "hybrid":
            from .gram_stream import masked_grams_hybrid as fn
        elif route == "pallas":
            from .gram_pallas import masked_grams_pallas as fn
        elif route == "dotg":
            fn = masked_grams_fused_nhwc
        else:
            fn = masked_grams_fused
        g_o = fn(feat_out, out_masks, compute_dtype=compute_dtype,
                 norm=norm)                                # (K, C, C)
        d = g_o - style_grams
        per_class = jnp.sum(d * d, axis=(1, 2))
        return scale * jnp.sum(class_w * per_class)

    feat_out = feat_out.astype(jnp.dtype(compute_dtype))

    def body(acc, inp):
        g_s, m, r = inp
        g_o = masked_gram(feat_out, m, compute_dtype=compute_dtype,
                          norm=norm)
        d = g_o - g_s
        return acc + r * scale * jnp.sum(d * d), None

    total, _ = jax.lax.scan(
        body, jnp.float32(0.0), (style_grams, out_masks, class_w))
    return total


def style_loss(feats_out: dict, style_grams: dict, out_masks: dict,
               coverage: jnp.ndarray, layer_weights: dict,
               compute_dtype: str | jnp.dtype = "float32",
               style_norm: str = "gatys",
               gram_impl: str = "auto",
               g_out: dict | None = None) -> jnp.ndarray:
    """Sum of per-layer masked style losses, weighted per layer.

    `g_out`: optional {layer: (K, C, C) pre-normalized output Grams} for
    layers whose Grams were streamed (vgg.stream_block12_grams); those
    layers need no tap in `feats_out`.
    """
    total = jnp.float32(0.0)
    for layer, w in layer_weights.items():
        if g_out is not None and layer in g_out:
            total = total + w * style_layer_loss(
                None, style_grams[layer], out_masks[layer], coverage,
                compute_dtype, style_norm, gram_impl,
                g_out=g_out[layer])
        else:
            total = total + w * style_layer_loss(
                feats_out[layer], style_grams[layer], out_masks[layer],
                coverage, compute_dtype, style_norm, gram_impl)
    return total


def tv_loss(image: jnp.ndarray) -> jnp.ndarray:
    """Anisotropic total variation on an (H, W, 3) image (mean-normalized)."""
    dh = image[1:, :, :] - image[:-1, :, :]
    dw = image[:, 1:, :] - image[:, :-1, :]
    return jnp.mean(dh * dh) + jnp.mean(dw * dw)
