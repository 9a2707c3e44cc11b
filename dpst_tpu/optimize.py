"""Device-side image optimization loop (the hot path).

TPU-native rebuild of the reference's optimization core (SURVEY.md §2
comp.10, §3.2): where the reference drives TF 1.x with one host
`session.run` per Adam step, here the ENTIRE loop — VGG forward, loss
assembly, gradients, optimizer update, pixel projection — is a single
`lax.scan` body compiled once by XLA. Host round-trips per step: zero.
The per-step loss history comes back as a stacked array for free (it lives
in the scan carry outputs, no host sync until the user looks at it).
"""
from __future__ import annotations

from functools import lru_cache, partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from .config import StylizeConfig
from .models import vgg
from .ops import laplacian as lap
from .ops import losses

HISTORY_TERMS = ("total", "content", "style", "photoreal", "tv")


class LossWeights(NamedTuple):
    """Traced loss weights — a pytree so autotune can vmap over Γ (style)."""
    content: jnp.ndarray
    style: jnp.ndarray
    reg: jnp.ndarray
    tv: jnp.ndarray

    @staticmethod
    def from_config(cfg: StylizeConfig) -> "LossWeights":
        f = lambda x: jnp.float32(x)
        return LossWeights(f(cfg.content_weight), f(cfg.style_weight),
                           f(cfg.regularization_weight), f(cfg.tv_weight))


class StylizeConstants(NamedTuple):
    """Per-run precomputed device constants (traced jit args, never baked
    into the executable — one compile serves every image pair of a shape)."""
    content_feats: dict         # {layer: (h, w, C)}
    style_grams: dict           # {layer: (K, C, C)}
    masks: dict                 # {layer: (K, h_l, w_l)} content-side masks
    coverage: jnp.ndarray       # (K,)
    lap_stats: Any              # LaplacianStats | None
    # {layer: 4-tuple of per-parity grid masks} for the s2d block-1
    # taps, precomputed OUTSIDE the optimization scan (run_segment →
    # _with_s2d_masks): XLA's while-loop LICM refuses to hoist the
    # padded mask buffers, which cost ~0.28 ms/step built in-loop.
    # None whenever the s2d path is inactive.
    s2d_mask_parts: Any = None
    # {layer: (m2t, rep, e, nvec)} loop-invariant operands of the
    # streamed s2d-Gram Pallas kernel (ops/gram_s2d.pack_mask_consts),
    # packed alongside s2d_mask_parts when cfg.s2d_gram resolves to the
    # kernel. None otherwise (the loss falls back to the nd path).
    s2d_gram_consts: Any = None


def lap_anchor_active(cfg: StylizeConfig, h: int, w: int) -> bool:
    """Should the no-photorealism loss carry a ZERO Laplacian term?

    The round-3 config-2 anomaly (VERDICT r2 weak #1, profiled with
    tools/trace_report.py): without the photorealism term, XLA's layout
    assignment flips the (S, strip_h, W, 3) image-cotangent of the s2b
    strip decomposition to a transposed {0,3,2,1} layout, splits it
    there, and copies every strip back — +0.87 ms/step at 512²
    (config2 7.99 vs config3 7.12 ms/step device time), i.e. dropping a
    loss term made the step SLOWER. Keeping the term with
    `lap.zero_stats` (exact zero loss AND gradient) anchors the
    cotangent in the forward layout: measured 126.3 vs 119.9 it/s
    (≈ config3's 125.9, same session) — and the config2 program becomes
    byte-identical HLO to config3's, sharing its compiled executable.

    Active exactly where the anomaly is: TPU, strip path enabled for
    this shape, and blocks 1-2 NOT streaming (the stream12 scan has no
    strip backward to anchor)."""
    if cfg.use_photorealism or jax.default_backend() != "tpu":
        return False
    all_layers = tuple(dict.fromkeys(cfg.style_layers + cfg.content_layers))
    if not vgg.s2b_active(cfg.s2b_strips, h, w, all_layers):
        return False
    _p2 = vgg.LAYER_ORDER.index("pool2")
    b12_layers = tuple(l for l in all_layers
                       if vgg.LAYER_ORDER.index(l) < _p2)
    strips = vgg.stream12_strips(cfg.stream12, h, w)
    if (vgg.stream12_compatible(all_layers, strips, (h, w, 3))
            and all(l in cfg.style_layers and l not in cfg.content_layers
                    for l in b12_layers)):
        return False
    return True


def _strip_gram_perm(cfg: StylizeConfig, image_shape, all_layers,
                     b12_layers, mask_shapes: dict) -> tuple:
    """Resolve `cfg.strip_gram` for this (config, shape): the tuple of
    block-1/2 layers whose taps should stay in strip form and flatten in
    the conv layout's pixel order (vgg.perm_flatten), feeding the Gram
    pre-flattened operands (losses.masked_grams_flat).

    A layer qualifies where it is exact AND the layout argument holds:
    the strip path is active, the tap is style-only (content taps need
    the image-order tensor), and the layer routes to the fused Gram (the
    flat form materializes the same (P, K·C) block; the hybrid/stream
    lowerings above the fused bound keep their own tap handling — at
    1024² conv1_1 rides hybrid while conv2_1 still qualifies). "auto"
    resolves to "perm": measured 149.0 vs 142.5 it/s on the 512² full
    step (tools/perf_lab.py s2b8+permgram, v5e) — the image-order
    flatten's relayout copies (copy.1272/1273 + reshape.857 in the
    round-3 trace, ~0.5 ms/step) become bitcasts.
    """
    if cfg.strip_gram == "interior":
        return ()
    # "permh" gates identically; only the flatten/mask pair differs
    h, w = image_shape[:2]
    if not vgg.s2b_active(cfg.s2b_strips, h, w, all_layers):
        return ()
    out = []
    for l in b12_layers:
        if l not in cfg.style_layers or l in cfg.content_layers:
            continue
        k, hl, wl = mask_shapes[l]
        c = vgg.VGG19_BLOCKS[int(l[4]) - 1][1]
        if losses.gram_route(hl, wl, k, c, cfg.gram_impl) == "fused":
            out.append(l)
    return tuple(out)


def _s2d_gram_kernel(cfg: StylizeConfig, h: int, w: int,
                     k: int | None = None) -> bool:
    """Should active s2d block-1 taps feed the streamed Pallas Gram
    (ops/gram_s2d.py) instead of the nd XLA path? "auto" resolves BY
    SIZE. Campaign #10 first measured the kernel LOSING in context at
    1024² (39.7 vs 40.3 it/s) despite winning standalone — but that
    loss was the FEED's: the logical-order flatten+pad around the
    kernel materialized ~5 ms/step of relayout copies. Campaign #13
    (memory-order bitcast feed + divisor band heights) removed them,
    flipping every measured shape above 512²-class:
      1024² K=4: 44.5 vs 40.2   1024² K=8: 35.9 vs 34.3
      768²  K=4: 66.9 vs 65.7   512²  K=4: 178 vs 190 (nd keeps it)
    and PAST the fused block bound (2048²-class) nd is impossible —
    the kernel keeps the s2d form alive at all (campaign #12, 10.0 vs
    8.58 over the standard-conv fallback). So: kernel at h·w ≥ 2^19
    (768²+) or any non-fused route; nd below."""
    if cfg.s2d_gram in ("pallas", "pallas1", "pallas2"):
        return True
    if (cfg.s2d_gram == "auto" and k is not None
            and jax.default_backend() == "tpu"):
        if h * w >= 2 ** 19:
            return True
        c = vgg.VGG19_BLOCKS[0][1]
        return losses.gram_route(h, w, k, c, cfg.gram_impl) != "fused"
    return False


def _block1_s2d_ok(cfg: StylizeConfig, image_shape, all_layers,
                   b1_layers, mask_shapes: dict) -> bool:
    """Should the loss take the space-to-depth block-1 path
    (vgg._block1_s2d — campaign #7)? Works in BOTH batching regimes:
    the strip decomposition (S2dTap strips, where it needs flat-form
    Gram consumption — strip_gram not "interior") and the plain-batch
    case (strips=1, halo=0 — the vmapped B-pair path, campaign #8,
    where the (B, 512, 512, 64) 3x3 emitters pay the same layout
    copies the strips paid at batch 1). Every block-1 tap must be
    style-only and fused-routed — the S2dTap is consumed via the
    per-parity nd Gram. Content taps or non-fused routes fall back to
    the direct convs."""
    h, w = image_shape[:2]
    if not vgg._resolve_block1(cfg.block1_impl, h, w):
        return False
    if h % 2 or w % 2:
        return False
    if (vgg.s2b_active(cfg.s2b_strips, h, w, all_layers)
            and cfg.strip_gram == "interior"):
        return False
    for l in b1_layers:
        if l not in cfg.style_layers or l in cfg.content_layers:
            return False
        k, hl, wl = mask_shapes[l]
        c = vgg.VGG19_BLOCKS[0][1]
        if (losses.gram_route(hl, wl, k, c, cfg.gram_impl) != "fused"
                and not _s2d_gram_kernel(cfg, h, w, k)):
            # the nd consumption needs the fused XLA Gram (the dot
            # absorbs the parity slices); past the fused block bound
            # only the streamed Pallas kernel (campaign #10) can take
            # an s2d tap — with s2d_gram="pallas" the size gate lifts
            # (the kernel builds the weighted block band-by-band in
            # VMEM, so there is no full-block materialization to bound)
            return False
    return True


@lru_cache(maxsize=64)
def make_loss_fn(cfg: StylizeConfig) -> Callable[..., tuple]:
    """Build loss(image, consts, weights, vgg_params) -> (total, terms).

    Static structure (layer set, pooling, dtypes, Laplacian impl) comes
    from `cfg`; ALL data — image, constants, loss weights, and the VGG
    parameters — is traced. Passing params as arguments (rather than
    closing over them) keeps 80 MB of weights out of the jaxpr constants
    and makes the jit cache key independent of parameter identity.
    Memoized so repeated runs share one closure (and thus one executable).
    """
    style_lw = dict(zip(cfg.style_layers, cfg.style_layer_weights))
    all_layers = tuple(dict.fromkeys(cfg.style_layers + cfg.content_layers))
    _p2 = vgg.LAYER_ORDER.index("pool2")
    b12_layers = tuple(l for l in all_layers
                       if vgg.LAYER_ORDER.index(l) < _p2)
    deep_layers = tuple(l for l in all_layers if l not in b12_layers)
    gram_norm = "m1" if cfg.style_norm == "paper" else "m2"

    def loss_fn(image: jnp.ndarray, consts: StylizeConstants,
                weights: LossWeights, vgg_params: dict):
        strips = vgg.stream12_strips(cfg.stream12, *image.shape[:2])
        g_out = None
        if (vgg.stream12_compatible(all_layers, strips, image.shape)
                and all(l in cfg.style_layers
                        and l not in cfg.content_layers
                        for l in b12_layers)):
            # Blocks 1-2 stream as Grams + pool2, activations never
            # materializing at full resolution: "scan" = checkpointed
            # lax.scan of strips (the ≥3072² memory path); "pallas" =
            # the fused whole-block kernel (VMEM-resident, C-major —
            # the round-3 conv campaign lowering).
            h_img, w_img = image.shape[:2]
            # W ≥ 256-multiple keeps every in-kernel level at ≥128
            # lanes — Mosaic rejects the sublane↔lane merges the
            # C-major matmuls need on padded (<128) lane tiles
            use_kernel = (
                cfg.stream12_impl == "pallas"
                and b12_layers == ("conv1_1", "conv2_1")
                and w_img % 256 == 0 and h_img % 32 == 0)
            if use_kernel:
                from .ops import block12_pallas as b12k
                fused = b12k.make_block12_fused(
                    pooling=cfg.pooling,
                    compute_dtype=cfg.compute_dtype)
                wts = b12k.pack_weights(vgg_params, cfg.compute_dtype)
                m1 = consts.masks["conv1_1"]
                m2 = consts.masks["conv2_1"]
                g1s, g2s, p2c = fused(
                    vgg._preprocess_noflip(image.astype(jnp.float32)),
                    m1 * m1, m2 * m2, wts)
                gsums = {"conv1_1": g1s, "conv2_1": g2s}
                x_p2 = p2c.transpose(1, 2, 0)[None]
            else:
                # block-1 s2d inside the strip scan (campaign #7/#9
                # lowerings applied to the streamed path): per-strip
                # blocks are small, so the nd Gram consumption has no
                # fused-bound constraint — gate only on the resolver
                # (TPU + >=2^18 px) and the s2d shape requirements
                hs12 = h_img // strips
                s2d12 = (vgg._resolve_block1(
                             cfg.block1_impl, h_img, w_img)
                         and vgg.stream12_s2d_ok(
                             w_img, hs12, b12_layers))
                gsums, x_p2 = vgg.stream_block12_grams(
                    vgg_params, image,
                    {l: consts.masks[l] for l in b12_layers},
                    strips=strips, gram_layers=b12_layers,
                    pooling=cfg.pooling,
                    compute_dtype=cfg.compute_dtype,
                    pool_impl=cfg.pool_impl,
                    block1_impl="s2d" if s2d12 else "conv",
                    remat_mode=vgg.stream12_remat_mode(
                        cfg.stream12_remat),
                    conv2_impl=vgg.stream12_conv2_mode(
                        cfg.stream12_conv2))
            g_out = {}
            for l in b12_layers:
                m = consts.masks[l].astype(jnp.float32)
                n = (jnp.sum(m * m, axis=(1, 2)) if gram_norm == "m2"
                     else jnp.sum(m, axis=(1, 2)))
                g_out[l] = gsums[l] / jnp.maximum(n, 1e-8)[:, None, None]
            feats = vgg.extract_tail(
                vgg_params, x_p2, deep_layers,
                pooling=cfg.pooling, compute_dtype=cfg.compute_dtype,
                conv_impl=cfg.conv_impl, pool_impl=cfg.pool_impl)
        else:
            # strip_taps=False: feeding the Gram the raw strip tensors
            # with halo-zeroed masks (vgg.StripTap / strip_masks)
            # measured 127.4 vs 134.3 it/s — the +25% wider contraction
            # costs more than the interior-slice copies it removes.
            # strip_gram="perm" instead keeps the interior slice but
            # flattens it in the conv layout's own pixel order with
            # permuted masks (vgg.perm_flatten/perm_masks — a bitcast
            # where the image-order flatten pays relayout copies).
            mask_shapes = {l: consts.masks[l].shape for l in b12_layers
                           if l in style_lw}  # masks: style layers only
            perm_layers = _strip_gram_perm(
                cfg, image.shape, all_layers, b12_layers, mask_shapes)
            _p1 = vgg.LAYER_ORDER.index("pool1")
            b1_layers = tuple(l for l in b12_layers
                              if vgg.LAYER_ORDER.index(l) < _p1)
            use_s2d = _block1_s2d_ok(
                cfg, image.shape, all_layers, b1_layers, mask_shapes)
            feats = vgg.extract_features(
                vgg_params, image, all_layers,
                pooling=cfg.pooling, compute_dtype=cfg.compute_dtype,
                conv_impl=cfg.conv_impl, pool_impl=cfg.pool_impl,
                s2b_strips=cfg.s2b_strips,
                strip_taps=bool(perm_layers or use_s2d),
                block1_impl="s2d" if use_s2d else "conv")
            if perm_layers or use_s2d:
                g_out = {}
                for l in list(feats):
                    tap = feats[l]
                    if isinstance(tap, vgg.S2dTap):
                        # block-1 s2d tap: four 64-lane parity slices
                        # fed UNFLATTENED to the nd Gram (the dot
                        # absorbs the slice), masks permuted to match
                        # (halo / garbage slots zero-weighted — exact),
                        # one normalization. Mask grids come
                        # precomputed from run_segment when available
                        # (consts.s2d_mask_parts — in-loop they cost
                        # ~0.28 ms/step, unhoisted).
                        gc = getattr(consts, "s2d_gram_consts", None)
                        kc = (gc or {}).get(l) if isinstance(
                            gc, dict) else None
                        if kc is not None:
                            # streamed Pallas Gram (ops/gram_s2d.py):
                            # the raw grid tensor flattens as a layout
                            # bitcast; bias + ReLU + parity regrouping
                            # + all K Grams happen in-kernel (the nd
                            # path's weighted-block relayouts and
                            # interior slice never exist).
                            from .ops import gram_s2d
                            m2t, e2, nvec = kc
                            # the round-5 two-half kernel is THE kernel
                            # ("pallas"/auto); "pallas1" keeps the
                            # round-3 full-width form as an opt-in
                            g_out[l] = gram_s2d.masked_grams_s2d_tap(
                                tap, m2t, e2, nvec,
                                v2=(cfg.s2d_gram != "pallas1"))
                            del feats[l]
                            continue
                        mp = getattr(consts, "s2d_mask_parts", None)
                        m_par = (mp or {}).get(l) if isinstance(
                            mp, dict) else None
                        if m_par is None:
                            m_par = vgg.s2d_masks_par(
                                consts.masks[l], tap.data.shape[0],
                                tap.halo_px, tap.off)
                        g_out[l] = losses.masked_grams_nd_multi(
                            list(zip(vgg.s2d_slices_par(tap), m_par)),
                            compute_dtype=cfg.compute_dtype,
                            norm=gram_norm)
                        del feats[l]
                        continue
                    if not isinstance(tap, vgg.StripTap):
                        continue
                    if l in perm_layers:
                        if cfg.strip_gram == "permh":
                            # no interior slice: full strip tensor
                            # (bitcast) + halo rows zeroed via masks
                            f2d = vgg.perm_flatten_halo(tap)
                            mfl = vgg.perm_masks_halo(
                                consts.masks[l], tap.data.shape[0],
                                tap.halo)
                        else:
                            f2d = vgg.perm_flatten(tap)
                            mfl = vgg.perm_masks(consts.masks[l],
                                                 tap.data.shape[0])
                        g_out[l] = losses.masked_grams_flat(
                            f2d, mfl, compute_dtype=cfg.compute_dtype,
                            norm=gram_norm)
                        del feats[l]
                    else:
                        if (l in style_lw
                                and l not in cfg.content_layers
                                and l in consts.masks
                                and losses.gram_route(
                                    *consts.masks[l].shape[1:],
                                    consts.masks[l].shape[0],
                                    tap.data.shape[-1],
                                    cfg.gram_impl) == "stream"):
                            # stream-routed strip tap (2048²+ conv1_1):
                            # feed the kernel the FULL strip tensor
                            # flattened in layout order (a bitcast) with
                            # halo rows zero-weighted via the permuted
                            # masks — the interior slice and the
                            # image-order relayout copies (~10 ms/step
                            # at 2048², campaign #11b) never exist.
                            from .ops import gram_stream
                            f2d = vgg.perm_flatten_halo(tap)
                            mfl = vgg.perm_masks_halo(
                                consts.masks[l], tap.data.shape[0],
                                tap.halo)
                            g_out[l] = gram_stream.\
                                masked_grams_stream_flat(
                                    f2d, mfl,
                                    compute_dtype=cfg.compute_dtype,
                                    norm=gram_norm)
                            del feats[l]
                            continue
                        # e.g. a hybrid-routed or content tap: back to
                        # the image-order tensor (= interior)
                        feats[l] = tap.plain()

        l_content = jnp.float32(0.0)
        for layer in cfg.content_layers:
            l_content = l_content + losses.content_loss(
                feats[layer], consts.content_feats[layer])

        l_style = losses.style_loss(
            feats, consts.style_grams, consts.masks, consts.coverage,
            style_lw, compute_dtype=cfg.compute_dtype,
            style_norm=cfg.style_norm, gram_impl=cfg.gram_impl,
            g_out=g_out)

        # Stats PRESENCE is the static gate, not cfg.use_photorealism:
        # with photorealism off, prepare_constants may still supply
        # zero_stats as a layout anchor (lap_anchor_active below) — the
        # term is then an exact 0 with exact-0 gradient, but its
        # image-space gradient consumer keeps XLA's layout assignment
        # for the s2b strip backward in the forward layout (-0.87
        # ms/step of relayout copies at 512²; ARCHITECTURE.md round 3).
        if consts.lap_stats is not None:
            l_reg = lap.photoreal_loss(
                consts.lap_stats, image, impl=cfg.laplacian_impl)
        else:
            l_reg = jnp.float32(0.0)

        l_tv = losses.tv_loss(image) if cfg.tv_weight else jnp.float32(0.0)

        total = (weights.content * l_content + weights.style * l_style
                 + weights.reg * l_reg + weights.tv * l_tv)
        terms = jnp.stack([total, l_content, l_style, l_reg, l_tv])
        return total, terms

    if cfg.remat == "full":
        # backward recomputes the whole forward (no stored residuals) —
        # targets the HBM-bound layout copies around the batch-1 convs
        loss_fn = jax.checkpoint(loss_fn)
    elif cfg.remat in ("block1", "block12"):
        # selective: recompute ONLY the cheapest-to-recompute, most
        # copy-expensive activations (the 33 MB block-1 / 17 MB block-2
        # tensors tagged via checkpoint_name in vgg.extract_features);
        # everything else keeps normal residual saving
        names = (("vgg_block1",) if cfg.remat == "block1"
                 else ("vgg_block1", "vgg_block2"))
        loss_fn = jax.checkpoint(
            loss_fn,
            policy=jax.checkpoint_policies.save_anything_except_these_names(
                *names))
    return loss_fn


@lru_cache(maxsize=64)
def make_optimizer(cfg: StylizeConfig) -> optax.GradientTransformation:
    if cfg.optimizer == "adam":
        return optax.adam(cfg.learning_rate, b1=cfg.adam_b1, b2=cfg.adam_b2,
                          eps=cfg.adam_eps)
    return optax.lbfgs()


# --- L-BFGS pixel parameterization ---------------------------------------
# Hard clipping after every step (the Adam projection) would invalidate
# L-BFGS's curvature pairs and the Wolfe linesearch. Instead, when
# clip_pixels is set, L-BFGS optimizes an unconstrained logit image u with
# pixels = 255*sigmoid(u) — a smooth bijection onto (0, 255) that keeps
# the quasi-Newton assumptions intact while enforcing the box exactly.
_LOGIT_EPS = 1e-4


def pixels_to_logits(image: jnp.ndarray) -> jnp.ndarray:
    p = jnp.clip(image.astype(jnp.float32) / 255.0,
                 _LOGIT_EPS, 1.0 - _LOGIT_EPS)
    return jnp.log(p) - jnp.log1p(-p)


def logits_to_pixels(u: jnp.ndarray) -> jnp.ndarray:
    return 255.0 * jax.nn.sigmoid(u)


def _strong_typed(tree):
    """Strip weak_type from every leaf (Python-scalar-seeded entries in
    optax's lbfgs state init as weak-typed; run_segment's outputs are
    strong, so the SECOND dispatch of an otherwise identical call would
    silently retrace + recompile — measured as a one-time ~3.6 s stall
    (16 s without the persistent cache) in the middle of the second
    100-step window, long misattributed to Wolfe-zoom trajectory
    phase)."""
    return jax.tree_util.tree_map(
        lambda x: jax.lax.convert_element_type(x, jnp.asarray(x).dtype),
        tree)


def init_opt_state(opt: optax.GradientTransformation, cfg: StylizeConfig,
                   image0: jnp.ndarray):
    """Optimizer state for `image0` — in logit space for constrained
    L-BFGS (the lbfgs state stores the current params for its s-vectors,
    so it must be initialized in the space the loop steps in)."""
    if cfg.optimizer == "lbfgs" and cfg.clip_pixels:
        return _strong_typed(opt.init(pixels_to_logits(image0)))
    return _strong_typed(opt.init(image0))


def _with_s2d_masks(cfg: StylizeConfig, consts: StylizeConstants,
                    image_shape) -> StylizeConstants:
    """Precompute the s2d taps' per-parity grid masks OUTSIDE the scan.

    The masks are loop-invariant, but XLA's while-loop invariant code
    motion declines to hoist the padded (K, S, ro, co) buffers — built
    inside the loss they measured ~0.28 ms/step at 512² (round-3 trace,
    pad.1967 + copies at the s2d_masks_par lines). Doing it here, the
    work runs once per run_segment dispatch. No-op (returns consts
    unchanged) whenever the loss won't take the s2d path."""
    all_layers = tuple(dict.fromkeys(cfg.style_layers + cfg.content_layers))
    _p1 = vgg.LAYER_ORDER.index("pool1")
    b1_layers = tuple(l for l in all_layers
                      if vgg.LAYER_ORDER.index(l) < _p1)
    mask_shapes = {l: consts.masks[l].shape for l in b1_layers
                   if l in consts.masks}
    if len(mask_shapes) != len(b1_layers):
        return consts
    _p2 = vgg.LAYER_ORDER.index("pool2")
    b12_layers = tuple(l for l in all_layers
                       if vgg.LAYER_ORDER.index(l) < _p2)
    st12 = vgg.stream12_strips(cfg.stream12, *image_shape[:2])
    if (vgg.stream12_compatible(all_layers, st12, image_shape)
            and all(l in cfg.style_layers and l not in cfg.content_layers
                    for l in b12_layers)):   # mirrors make_loss_fn: the
        return consts                        # ≥3072² stream12 path owns
                                             # blocks 1-2 — s2d consts
                                             # would be dead weight
    if not _block1_s2d_ok(cfg, image_shape, all_layers, b1_layers,
                          mask_shapes):
        return consts
    h, w = image_shape[:2]
    if vgg.s2b_active(cfg.s2b_strips, h, w, all_layers):
        strips, halo = vgg._resolve_s2b(cfg.s2b_strips, h, w), vgg._S2B_HALO
    else:
        strips, halo = 1, 0      # plain batch (the vmapped B-pair path)
    parts = {
        l: tuple(vgg.s2d_masks_par(consts.masks[l], strips, halo,
                                   -1 if l == "conv1_1" else 0))
        for l in b1_layers}
    consts = consts._replace(s2d_mask_parts=parts)
    if _s2d_gram_kernel(cfg, h, w, mask_shapes[b1_layers[0]][0]):
        from .ops import gram_s2d
        own = h // strips
        norm = "m1" if cfg.style_norm == "paper" else "m2"
        gc = {}
        for l in b1_layers:
            g = 1 if l == "conv1_1" else 0     # odd vs aligned grid
            nr = (own + 2 * halo + 2 * g) // 2
            gc[l] = gram_s2d.pack_mask_consts(
                parts[l], nr, halo // 2, cfg.compute_dtype, norm=norm)
        consts = consts._replace(s2d_gram_consts=gc)
    return consts


def _lbfgs_scan_step(cfg: StylizeConfig, loss_fn, opt, consts, weights,
                     vgg_params, emit_evals: bool):
    """The L-BFGS scan body shared by run_segment (emit_evals=False) and
    lbfgs_eval_trajectory (True — the scan additionally emits the zoom
    linesearch's per-step evaluation count). One definition so the
    diagnostic can never drift from the production step."""
    boxed = cfg.clip_pixels
    to_img = logits_to_pixels if boxed else (lambda u: u)
    scalar_loss = lambda u: loss_fn(to_img(u), consts, weights,
                                    vgg_params)[0]
    vg = optax.value_and_grad_from_state(scalar_loss)
    full_hist = cfg.history_terms != "total"

    def step(carry, _):
        u, st = carry
        value, grad = vg(u, state=st)
        if full_hist:
            # per-term history at the pre-update point (same
            # convention as the Adam branch) costs one EXTRA forward
            # on top of the linesearch-cached value — opt-in via
            # history_terms="full" (default "auto" logs totals-only
            # from the cache at zero cost; VERDICT r2 weak #2).
            _, terms = loss_fn(to_img(u), consts, weights, vgg_params)
        else:
            z = jnp.zeros_like(value)
            terms = jnp.stack([value, z, z, z, z])
        updates, st = opt.update(grad, st, u, value=value, grad=grad,
                                 value_fn=scalar_loss)
        u = optax.apply_updates(u, updates)
        if emit_evals:
            return (u, st), (terms, st[-1].info.num_linesearch_steps)
        return (u, st), terms

    return step


@partial(jax.jit, static_argnames=("n_steps", "cfg"))
def lbfgs_eval_trajectory(image: jnp.ndarray, opt_state,
                          consts: StylizeConstants, weights: LossWeights,
                          vgg_params: dict, *, n_steps: int,
                          cfg: StylizeConfig):
    """Diagnostic twin of run_segment's L-BFGS branch: same scan step
    (literally — _lbfgs_scan_step), additionally emitting optax's
    ZoomLinesearchInfo.num_linesearch_steps per step. The golden test
    pins this trajectory (VERDICT r3 item 6): a systematic linesearch
    regression that hides inside the loss curve's tolerance still shows
    up as extra evaluations. Returns (history (n_steps, 5),
    evals (n_steps,) int)."""
    if cfg.optimizer != "lbfgs":
        raise ValueError("lbfgs_eval_trajectory requires optimizer='lbfgs'")
    consts = _with_s2d_masks(cfg, consts, image.shape)
    loss_fn = make_loss_fn(cfg)
    opt = make_optimizer(cfg)
    step = _lbfgs_scan_step(cfg, loss_fn, opt, consts, weights,
                            vgg_params, emit_evals=True)
    u0 = pixels_to_logits(image) if cfg.clip_pixels else image
    (_, _), (history, evals) = jax.lax.scan(
        step, (u0, opt_state), None, length=n_steps)
    return history, evals


@partial(jax.jit, static_argnames=("n_steps", "cfg"))
def run_segment(image: jnp.ndarray, opt_state, consts: StylizeConstants,
                weights: LossWeights, vgg_params: dict, *, n_steps: int,
                cfg: StylizeConfig):
    """Run `n_steps` optimizer steps fully on device (one lax.scan).

    The jit cache key is (shapes, n_steps, cfg) — pass
    `cfg.loop_config()` so runs differing only in non-loop fields (scale
    schedule, iteration budget, segmentation knobs) share the executable.
    Returns (image, opt_state, history) with history (n_steps, 5) fp32 —
    [total, content, style, photoreal, tv] per step. With L-BFGS and
    `cfg.history_terms` resolving to "total" (the default via "auto"),
    columns 1-4 are zeros and column 0 comes from the linesearch-cached
    value (no extra forward pass).
    """
    consts = _with_s2d_masks(cfg, consts, image.shape)
    loss_fn = make_loss_fn(cfg)
    opt = make_optimizer(cfg)
    if cfg.optimizer == "adam":
        def step(carry, _):
            img, st = carry
            (_, terms), grad = jax.value_and_grad(
                loss_fn, has_aux=True)(img, consts, weights, vgg_params)
            updates, st = opt.update(grad, st, img)
            img = optax.apply_updates(img, updates)
            if cfg.clip_pixels:
                img = jnp.clip(img, 0.0, 255.0)
            return (img, st), terms
    else:  # lbfgs — Wolfe linesearch needs value_fn; the box constraint
        # is enforced by the smooth sigmoid parameterization (see
        # pixels_to_logits) rather than per-step clipping.
        boxed = cfg.clip_pixels
        step = _lbfgs_scan_step(cfg, loss_fn, opt, consts, weights,
                                vgg_params, emit_evals=False)
        if boxed:
            u0 = pixels_to_logits(image)
            (u_final, opt_state), history = jax.lax.scan(
                step, (u0, opt_state), None, length=n_steps)
            return logits_to_pixels(u_final), opt_state, history

    (image, opt_state), history = jax.lax.scan(
        step, (image, opt_state), None, length=n_steps)
    return image, opt_state, history


def init_image(cfg: StylizeConfig, content: jnp.ndarray,
               style_mean: jnp.ndarray | None = None) -> jnp.ndarray:
    """Initial output image per cfg.init_mode (reference comp.10 init)."""
    if cfg.init_mode == "content":
        return content.astype(jnp.float32)
    if cfg.init_mode == "noise":
        key = jax.random.PRNGKey(cfg.seed)
        noise = jax.random.normal(key, content.shape, jnp.float32)
        return jnp.clip(127.5 + cfg.init_noise_scale * noise, 0.0, 255.0)
    # style_mean: content structure with style's mean color
    base = content.astype(jnp.float32)
    mean_c = jnp.mean(base, axis=(0, 1), keepdims=True)
    mean_s = (style_mean if style_mean is not None else mean_c)
    return jnp.clip(base - mean_c + mean_s, 0.0, 255.0)


def run(image0: jnp.ndarray, consts: StylizeConstants, weights: LossWeights,
        vgg_params: dict, cfg: StylizeConfig, iterations: int | None = None,
        callback: Callable[[int, jnp.ndarray, jnp.ndarray], None] | None
        = None, checkpointer=None, resume: bool = False):
    """Full optimization at one scale.

    `callback(step, image, history_chunk)` fires every
    `cfg.intermediate_interval` steps (the reference's intermediate-dump
    UX); with no callback the whole run is ONE device dispatch.
    `checkpointer` (utils.checkpoint.RunCheckpointer) saves
    (step, image, opt_state) at the same cadence; `resume=True` continues
    from its latest checkpoint (history then covers only the new steps).
    Returns (final image, (iterations_run, 5) loss history).
    """
    loop_cfg = cfg.loop_config()
    opt = make_optimizer(loop_cfg)
    opt_state = init_opt_state(opt, loop_cfg, image0)
    total_iters = cfg.iterations if iterations is None else iterations

    interval = cfg.intermediate_interval if (callback or checkpointer) \
        else 0
    if interval <= 0 and checkpointer is not None:
        interval = 100
    image = image0
    done = 0
    if checkpointer is not None and resume:
        restored = checkpointer.restore(image0, opt_state)
        if restored is not None:
            done, image, opt_state = restored
    histories = []
    while done < total_iters:
        n = total_iters - done if interval <= 0 else min(
            interval, total_iters - done)
        image, opt_state, hist = run_segment(
            image, opt_state, consts, weights, vgg_params,
            n_steps=n, cfg=loop_cfg)
        done += n
        histories.append(hist)
        if callback is not None:
            callback(done, image, hist)
        if checkpointer is not None:
            checkpointer.save(done, image, opt_state)
    history = jnp.concatenate(histories) if len(histories) > 1 else (
        histories[0] if histories else jnp.zeros((0, 5), jnp.float32))
    if not cfg.clip_pixels:
        image = jnp.clip(image, 0.0, 255.0)
    return image, history
