"""Configuration for the TPU-native automated deep photo style transfer pipeline.

Mirrors the flag semantics of the reference CLI (SURVEY.md §5 "Config / flag
system": content/style weights, similarity metric + threshold, iteration count,
intermediate interval, init mode) as a frozen, hashable dataclass so it can be
passed as a jit-static argument.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class StylizeConfig:
    """All knobs for one stylization run.

    Weight semantics follow the reference (SURVEY.md §2 comp.10):
    total loss = content_weight * L_content
               + style_weight   * L_style      (Γ — the auto-tuned knob)
               + regularization_weight * L_photoreal
               + tv_weight * L_tv
    """

    # --- loss weights -----------------------------------------------------
    content_weight: float = 1.0
    style_weight: float = 100.0          # Γ in the paper; NIMA-tuned when auto
    regularization_weight: float = 1e4   # λ on the matting-Laplacian term
    tv_weight: float = 0.0               # optional total-variation smoothing

    # --- optimization -----------------------------------------------------
    iterations: int = 500
    optimizer: str = "adam"              # "adam" | "lbfgs"
    learning_rate: float = 2.0           # Adam on raw [0,255] pixels
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    init_mode: str = "content"           # "content" | "noise" | "style_mean"
    init_noise_scale: float = 50.0       # stddev when init_mode == "noise"
    clip_pixels: bool = True             # project to [0,255] every step
    seed: int = 0

    # --- multi-scale schedule (SURVEY.md §7 step 5) -----------------------
    # () disables; e.g. (256, 512, 1024) runs coarse-to-fine, upsampling the
    # running output between scales. `iterations` applies to the final scale;
    # earlier scales run `iterations * scale_iter_factor ** (n_remaining)`.
    scales: Tuple[int, ...] = ()
    scale_iter_factor: float = 1.0
    # Explicit per-stage iteration counts (same length as `scales`),
    # overriding the `iterations`/`scale_iter_factor` formula — e.g.
    # scales=(512, 1024, 2048), scale_iters=(100, 100, 250). Stages that
    # clamp/merge to one resolution sum their entries (api._scale_schedule).
    scale_iters: Tuple[int, ...] = ()

    # --- VGG feature extraction ------------------------------------------
    style_layers: Tuple[str, ...] = (
        "conv1_1", "conv2_1", "conv3_1", "conv4_1", "conv5_1")
    content_layers: Tuple[str, ...] = ("conv4_2",)
    style_layer_weights: Tuple[float, ...] = (0.2, 0.2, 0.2, 0.2, 0.2)
    # Style-loss normalization (docs/PARITY.md "loss scale mapping"):
    #   "gatys": Σm²-normalized Grams, 1/(4C²) scale, coverage-weighted
    #            classes (this repo's default).
    #   "paper": reference-exact (SURVEY.md §2 comp.4) — Σm-normalized
    #            Grams, ½‖ΔG‖² per class, NO coverage reweighting; the
    #            reference's (α, Γ, λ) transfer at face value.
    style_norm: str = "gatys"
    pooling: str = "max"                 # "max" | "avg"
    compute_dtype: str = "bfloat16"      # conv compute dtype on TPU
    # fp32 accumulation is always used (preferred_element_type)
    conv_impl: str = "auto"              # "auto" | "pallas" | "xla"
    # masked-Gram backend: "auto" = XLA fused wide matmul (the measured
    # winner); "stream" (gram_stream.py band-dot kernel) / "pallas" /
    # "dotg" force a specific lowering (all slower in-loop — layout tax,
    # see ARCHITECTURE.md)
    gram_impl: str = "auto"
    # max-pool lowering: "auto"/"postact" = deferred bias+ReLU past the
    # pool (bit-equivalent, measured faster); "xla" = classic pre-pool
    # epilogue; "pallas" = fused bwd kernel; "noties" = full-tie bwd
    pool_impl: str = "auto"
    # Manual space-to-batch of VGG blocks 1-2 (models/vgg._s2b_enabled):
    # -1 = auto (64-row strips on TPU at ≥512²-class images, off
    # elsewhere — 256² measured a regression); 0 = off (XLA's
    # own batch-1 space-to-batch rewrite); N>1 = split the image into N
    # row strips with an 8-px halo and run blocks 1-2 at batch=N — kills
    # the per-conv relayout copies of the rewrite at the price of ~25%
    # redundant conv FLOPs in those blocks (512² full step: 135.2 vs
    # 121.5 it/s). Exact: strip interiors are the undecomposed values.
    s2b_strips: int = -1
    # Block-1 conv lowering (models/vgg._block1_s2d): "auto" = space-to-
    # depth on TPU at h·w >= 2^18 (conv1_1 as ONE stride-2 4×4 conv off
    # the pixel image, conv1_2 as a full-lane 2×2 conv between
    # half-cell-shifted s2d grids, pool1 as a free parity max — the
    # 64-channel 3×3 emitters underfill the MXU; 163.4 -> 171.9 it/s on
    # the 512² strips step, 137.3 -> 162.2 pair-it/s on the B=8 vmapped
    # batch, 39.4 -> 40.3 @1024², but SLOWER at 256² where dot11 is the
    # better conv1_1 — campaigns #7/#8); "s2d" forces it, "conv" keeps
    # the direct 3×3 emitters. Exact: same arithmetic, boundary
    # semantics pinned by tests/test_s2d.py. Taken in the loss only
    # where block-1 taps are style-only and fused-routed
    # (optimize._block1_s2d_ok).
    block1_impl: str = "auto"
    # How the masked Gram consumes block-1/2 taps when the strip path is
    # active: "interior" = slice strips back to image order and flatten
    # (H·W, C) — XLA pays relayout copies moving the tap out of the
    # conv-emitter layout; "perm" = flatten in the layout's OWN memory
    # order (rows, W, strips) with the loop-invariant masks permuted to
    # match (vgg.perm_flatten/perm_masks — exact: the Gram sum is
    # pixel-permutation-invariant), so the (P, C) view is a bitcast.
    # "auto" = "perm" (measured 149.0 vs 142.5 it/s @512² full step).
    # Applied per layer, where strips are active AND the layer is
    # style-only AND routes to the fused Gram (the flat form
    # materializes the same (P, K·C) block the fused lowering does).
    # "permh" = like "perm" but WITHOUT the interior slice — halo rows
    # zero-weighted via the masks instead (exact; measured-negative:
    # 148.8 vs 161.1 @512², the +25% block HBM beats the saved slice).
    strip_gram: str = "auto"
    # How the masked Gram consumes an ACTIVE s2d block-1 tap:
    # "nd" = four parity lane-slices through losses.masked_grams_nd_multi
    # (the XLA path — exact, but materializes the (…, K·C) mask-weighted
    # block; the round-3 1024² trace attributes ~2.2 ms/step to its
    # relayout copies + interior slice); "pallas" = the streamed
    # ops/gram_s2d.py kernel — consumes the FULL raw grid tensor as a
    # layout bitcast (no interior slice, no transposed operand, bias +
    # ReLU in-kernel, parity regrouping as 0/1 selection matmuls),
    # accumulating all K Grams band-by-band in VMEM. MEASURED-NEGATIVE
    # in context: the kernel wins its standalone scan A/B at 1024²
    # (8.56 vs 9.50 ms/step) but loses inside the full step (39.7 vs
    # 40.3 it/s) — the selection matmuls are as costly as the Gram dot
    # and the real tap arrives in the conv emitter's layout, so the
    # "bitcast" flatten materializes (ARCHITECTURE.md campaign #10).
    # "auto" therefore resolves to "nd"; "pallas" stays a validated
    # opt-in. Like every Pallas custom call it does not
    # SPMD-partition: spmd_safe() pins "nd", and the vmapped batch
    # path does the same (parallel/batch.py).
    s2d_gram: str = "auto"
    # Block-1/2 activation STREAMING (models/vgg.stream_block12_grams):
    # the single-chip path for ≥3072²-class images, where block-1/2
    # activations exceed HBM in any batch-form decomposition. Blocks 1-2
    # run strip-by-strip inside a checkpointed lax.scan that emits only
    # the masked-Gram sums of their style taps + the pool2 tensor.
    # -1 = auto (64-row strips on TPU at ≥3072²-class images, off
    # elsewhere); 0 = off; N = strip count.
    stream12: int = -1
    # Lowering of the streamed blocks 1-2 when stream12 is active:
    # "scan" = checkpointed lax.scan of XLA convs (the memory path);
    # "pallas" = fused whole-block kernel (ops/block12_pallas.py) —
    # activations stay in VMEM, C-major layouts, in-kernel Grams; the
    # round-3 conv-perf campaign lowering. Falls back to "scan" when
    # the kernel's gates don't hold (non-default block-1/2 taps, odd
    # widths).
    stream12_impl: str = "scan"
    # Remat granularity of the streamed strip backward: "full" re-runs
    # the whole strip (blocks 1-2); "b2" saves the block-2 conv outputs
    # + pool results (~2.1 GB bf16 at 4096² — 4× smaller than the
    # block-1 tensors that must keep streaming) so the backward re-runs
    # only block 1 and pool2's tie backward stops re-running its
    # reduce-window. "b12" additionally saves conv1_2's raw output
    # (+2.4 GB at 4096²; the backward re-runs only the cheap K4
    # conv1_1 — ~95% of block 1's remat FLOPs drop); "b12f" saves
    # conv1_1's grid too (+4.9 GB total; no convs re-run). "auto" =
    # measured default (vgg.stream12_remat_mode).
    stream12_remat: str = "auto"
    # Lowering of the streamed block-2 convs: "conv" = the generic
    # conv_general_dilated loop; "dot" = flat offset-slice matmul form
    # (campaign #19, vgg._flat_conv3x3 — kills the emitter's batch-1
    # space-to-batch repacks). "dot" is a measured-negative opt-in
    # (4096² same-process A/B: 1.135 vs 1.419 it/s — the repack copies
    # overlap with compute; the im2col concatenate is real new traffic).
    # "auto" = measured default "conv" (vgg.stream12_conv2_mode).
    stream12_conv2: str = "auto"
    # "none" | "full" | "block1" | "block12": jax.checkpoint the loss —
    # the backward recomputes (all | block-1 | block-1+2) VGG activations
    # instead of storing residuals (trades MXU FLOPs for the HBM-bound
    # layout copies around batch-1 convs)
    remat: str = "none"
    # Per-step loss-history detail. "full" = all five terms per step;
    # "total" = total-only (terms 1-4 are zero). For Adam the terms are
    # free (they ride the value_and_grad aux), so "auto" resolves to
    # "full"; for L-BFGS a per-term row costs one EXTRA VGG forward per
    # step on top of the linesearch-cached value (~20% of the step,
    # VERDICT r2 weak #2), so "auto" resolves to "total" — the total
    # comes from the optimizer's cached value at zero cost.
    history_terms: str = "auto"

    # --- segmentation / masks --------------------------------------------
    use_segmentation: bool = True
    max_classes: int = 8                 # pad merged classes to a static count
    # "grouped" | "token" | "combined" | "embedding" (external matrix
    # asset via $DPST_SIMILARITY_MATRIX — semantic_merge.py)
    similarity_metric: str = "grouped"
    similarity_threshold: float = 0.25   # below → fall back to global merge
    mask_downsample: str = "avg"         # "avg" | "nearest" per VGG layer
    # PSPNet inference protocol (models/pspnet.segment): "resize" = one
    # 473² squash (fast default); "sliding" = the semseg-lineage eval
    # protocol (aspect-preserving base-512 resize per scale in
    # seg_scales, 473² sliding windows with mirror averaging) — what the
    # checkpoint's published mask quality uses at non-square sizes.
    seg_protocol: str = "resize"
    seg_scales: Tuple[float, ...] = (1.0,)

    # --- matting Laplacian (photorealism) ---------------------------------
    use_photorealism: bool = True
    matting_epsilon: float = 1e-5        # ε in Levin's closed-form matting
    # "auto" (Pallas kernel on TPU, XLA elsewhere) | "pallas" | "xla" |
    # "spmd" (row-sharded shard_map + halo exchange around the Pallas
    # kernel — ops/laplacian_spmd.py; requires an ambient mesh)
    laplacian_impl: str = "auto"

    # --- post-processing ---------------------------------------------------
    # Smooth-local-affine photorealism post-process (the DPST lineage's
    # optional CUDA smooth_local_affine, as a TPU guided filter —
    # ops/guided_filter.py). 0 disables; >0 is the window radius.
    post_smooth: int = 0
    post_smooth_eps: float = 1e-4

    # --- checkpointing / observability ------------------------------------
    intermediate_interval: int = 100     # save every k iters (0 = off)
    checkpoint_dir: str = ""             # orbax checkpoints; "" = disabled
    profile_dir: str = ""                # jax.profiler trace; "" = disabled
    debug_nans: bool = False

    def loop_config(self) -> "StylizeConfig":
        """Canonical sub-config for the hot loop's jit static key.

        Only the fields the scan'd optimizer actually reads survive;
        everything else (scale schedule, iteration counts, segmentation
        knobs, checkpoint paths, seeds) is neutralized — so two runs that
        differ only in those fields share one compiled executable.
        `tv_weight` is normalized to its truthiness (the loss builder
        reads it statically only to include/exclude the term; the actual
        weight is traced). `history_terms` resolves "auto" per optimizer
        — and for Adam any value canonicalizes to "full" (the terms are
        free there; honoring "total" would compile a distinct executable
        for identical math).
        """
        # stream12_remat / stream12_conv2 resolve shape-independently
        # ("auto" -> the measured defaults in vgg.stream12_remat_mode /
        # stream12_conv2_mode), so "auto" and the resolved value describe
        # one program — canonicalize so they share a jit key; and when
        # streaming is explicitly OFF the loop never reads them at all,
        # so force the defaults (ADVICE r3).
        from dpst_tpu.models import vgg as _vgg
        s12_remat = _vgg.stream12_remat_mode(self.stream12_remat)
        s12_conv2 = _vgg.stream12_conv2_mode(self.stream12_conv2)
        s12_impl = self.stream12_impl
        if self.stream12 == 0:
            s12_remat, s12_conv2, s12_impl = "b2", "conv", "scan"
        return dataclasses.replace(
            self,
            stream12_remat=s12_remat, stream12_conv2=s12_conv2,
            stream12_impl=s12_impl,
            # "pallas2" is an alias of "pallas" (both = the round-5
            # two-half kernel): one program, one jit key (rule 7)
            s2d_gram=("pallas" if self.s2d_gram == "pallas2"
                      else self.s2d_gram),
            history_terms=("full" if self.optimizer == "adam"
                           else ("total" if self.history_terms == "auto"
                                 else self.history_terms)),
            content_weight=1.0, style_weight=1.0,
            regularization_weight=1.0,
            tv_weight=1.0 if self.tv_weight else 0.0,
            iterations=0, init_mode="content", init_noise_scale=0.0,
            seed=0, scales=(), scale_iter_factor=1.0, scale_iters=(),
            use_segmentation=False, max_classes=0,
            similarity_metric="grouped", similarity_threshold=0.0,
            mask_downsample="avg", matting_epsilon=0.0,
            seg_protocol="resize", seg_scales=(1.0,),
            post_smooth=0, post_smooth_eps=0.0,
            intermediate_interval=0, checkpoint_dir="", profile_dir="",
            debug_nans=False)

    def spmd_safe(self) -> "StylizeConfig":
        """Resolve impl switches to SPMD-partitionable lowerings.

        Pallas custom calls don't partition under XLA's automatic SPMD —
        a sharded operand would be silently all-gathered. On a sharded
        mesh the multi-device entry points (`parallel/spatial.py`,
        `parallel/batch.py`) therefore canonicalize:
          * laplacian "pallas" → "spmd" (shard_map + halo exchange keeps
            the kernel — ops/laplacian_spmd.py); "auto" → "xla" (the XLA
            stencil, which XLA partitions with its own halo exchanges);
          * gram "stream"/"pallas"/"auto" → "xla" (fused wide matmul —
            partitions as a plain dot);
          * pool "pallas" → "xla".
        Everything else ("postact", "noties", "dotg", "flipvjp", …) is
        ordinary XLA HLO and partitions as-is — in particular the
        measured-fastest postact pool structure survives sharding.
        """
        return dataclasses.replace(
            self,
            laplacian_impl={"pallas": "spmd", "auto": "xla"}.get(
                self.laplacian_impl, self.laplacian_impl),
            conv_impl={"pallas": "xla"}.get(self.conv_impl, self.conv_impl),
            gram_impl={"stream": "xla", "pallas": "xla", "auto": "xla",
                       "hybrid": "xla"}.get(self.gram_impl, self.gram_impl),
            pool_impl={"pallas": "xla"}.get(self.pool_impl, self.pool_impl),
            # strip slicing along the row axis would gather across
            # shards; XLA's own rewrite partitions correctly instead
            s2b_strips=0, strip_gram="interior",
            # the s2d grids' odd-cell slices would likewise gather
            # across row shards; the direct convs partition cleanly
            block1_impl="conv", s2d_gram="nd",
            # the strip scan's slices likewise; row-sharded meshes are
            # the multi-chip answer to the same memory regime
            stream12=0, stream12_impl="scan", stream12_remat="auto",
            stream12_conv2="auto",
        )

    def prepare_config(self) -> "StylizeConfig":
        """Canonical sub-config for the per-pair precompute's jit key.

        `prepare_constants`/`_prepare_stage` read only the feature-
        extraction, mask-pyramid and Laplacian-stats knobs; optimizer,
        schedule and observability fields are neutralized here so runs
        differing only in e.g. `iterations` or `learning_rate` share one
        compiled precompute program (the same discipline `loop_config`
        applies to the hot loop — CLAUDE.md rule 7, ADVICE r1)."""
        return dataclasses.replace(
            self,
            content_weight=1.0, style_weight=1.0,
            regularization_weight=1.0, tv_weight=0.0,
            iterations=0, optimizer="adam", learning_rate=0.0,
            adam_b1=0.0, adam_b2=0.0, adam_eps=0.0,
            init_mode="content", init_noise_scale=0.0,
            clip_pixels=True, seed=0,
            scales=(), scale_iter_factor=1.0, scale_iters=(),
            style_layer_weights=(1.0,) * len(self.style_layers),
            remat="none", s2b_strips=0, strip_gram="interior",
            block1_impl="conv", s2d_gram="nd",
            stream12=0, stream12_impl="scan", stream12_remat="auto",
            stream12_conv2="auto", history_terms="auto",
            use_segmentation=False, max_classes=0,
            similarity_metric="grouped", similarity_threshold=0.0,
            seg_protocol="resize", seg_scales=(1.0,),
            laplacian_impl="auto",
            post_smooth=0, post_smooth_eps=0.0,
            intermediate_interval=0, checkpoint_dir="", profile_dir="",
            debug_nans=False)

    def __post_init__(self):
        if len(self.style_layer_weights) != len(self.style_layers):
            raise ValueError(
                "style_layer_weights must match style_layers: "
                f"{len(self.style_layer_weights)} vs {len(self.style_layers)}")
        if self.optimizer not in ("adam", "lbfgs"):
            raise ValueError(f"unknown optimizer {self.optimizer!r}")
        if self.scale_iters:
            if len(self.scale_iters) != len(self.scales):
                raise ValueError(
                    "scale_iters must match scales: "
                    f"{len(self.scale_iters)} vs {len(self.scales)}")
            if any(n < 1 for n in self.scale_iters):
                raise ValueError("scale_iters entries must be >= 1")
        if self.init_mode not in ("content", "noise", "style_mean"):
            raise ValueError(f"unknown init_mode {self.init_mode!r}")
        if self.pooling not in ("max", "avg"):
            raise ValueError(f"unknown pooling {self.pooling!r}")
        if self.laplacian_impl not in ("auto", "pallas", "xla", "spmd"):
            raise ValueError(f"unknown laplacian_impl {self.laplacian_impl!r}")
        if self.conv_impl not in ("auto", "pallas", "xla", "flipvjp",
                                  "padbwd", "dotbwd", "dot11"):
            raise ValueError(f"unknown conv_impl {self.conv_impl!r}")
        if self.style_norm not in ("gatys", "paper"):
            raise ValueError(f"unknown style_norm {self.style_norm!r}")
        if self.gram_impl not in ("auto", "pallas", "xla", "dotg",
                                  "stream", "hybrid"):
            raise ValueError(f"unknown gram_impl {self.gram_impl!r}")
        if self.pool_impl not in ("auto", "pallas", "xla", "noties",
                                  "postact"):
            raise ValueError(f"unknown pool_impl {self.pool_impl!r}")
        if self.remat not in ("none", "full", "block1", "block12"):
            raise ValueError(f"unknown remat {self.remat!r}")
        if self.s2b_strips < -1:
            raise ValueError(
                f"s2b_strips must be -1 (auto), 0 (off) or a strip "
                f"count, got {self.s2b_strips}")
        if self.stream12 < -1:
            raise ValueError(
                f"stream12 must be -1 (auto), 0 (off) or a strip count, "
                f"got {self.stream12}")
        if self.stream12 == 1:
            object.__setattr__(self, "stream12", 0)  # 1 strip = no-op
        if self.stream12_impl not in ("scan", "pallas"):
            raise ValueError(
                f"unknown stream12_impl {self.stream12_impl!r}")
        if self.stream12_remat not in ("auto", "full", "b2", "b12",
                                       "b12f"):
            raise ValueError(
                f"unknown stream12_remat {self.stream12_remat!r}")
        if self.stream12_conv2 not in ("auto", "conv", "dot"):
            raise ValueError(
                f"unknown stream12_conv2 {self.stream12_conv2!r}")
        if self.s2b_strips == 1:
            # one strip is a no-op (vgg._s2b_enabled treats <=1 as off)
            # but would mint a distinct jit static key for the identical
            # program — canonicalize so the executable is shared
            # (ADVICE r2).
            object.__setattr__(self, "s2b_strips", 0)
        if self.strip_gram not in ("auto", "interior", "perm", "permh"):
            raise ValueError(f"unknown strip_gram {self.strip_gram!r}")
        if self.block1_impl not in ("auto", "s2d", "conv"):
            raise ValueError(f"unknown block1_impl {self.block1_impl!r}")
        if self.s2d_gram not in ("auto", "nd", "pallas", "pallas1",
                                 "pallas2"):
            raise ValueError(f"unknown s2d_gram {self.s2d_gram!r}")
        # "pallas" IS the round-5 two-half kernel ("pallas2" is an
        # accepted alias, canonicalized in loop_config); "pallas1" keeps
        # the round-3 full-width diag-block form as a measured-history
        # opt-in (1024² 48.25 vs 46.29, 2048² 10.79 vs 10.38, B=8 batch
        # 180.9 vs 175.1 — v2 wins every measured shape).
        # "auto" stays "auto": it resolves BY SIZE at trace time
        # (optimize._s2d_gram_kernel) — the streamed Pallas kernel at
        # h·w ≥ 2^19 (768²+; campaign #13's memory-order feed flipped
        # campaign #10's in-context loss: 1024² 44.5 vs 40.2 it/s) and
        # past the fused block bound (2048²+, where the nd consumption
        # is impossible: 10.0 vs 8.58 over the standard-conv
        # fallback, #12/#13); the nd XLA path below (512² 190 vs 178).
        if self.history_terms not in ("auto", "full", "total"):
            raise ValueError(
                f"unknown history_terms {self.history_terms!r}")
        if self.seg_protocol not in ("resize", "sliding"):
            raise ValueError(
                f"unknown seg_protocol {self.seg_protocol!r}")


# Named presets matching BASELINE.json configs 1-5.
PRESETS = {
    "config1": StylizeConfig(  # 256² content + Gram style only, CPU-runnable
        use_segmentation=False, use_photorealism=False,
        iterations=300, compute_dtype="float32"),
    "config2": StylizeConfig(  # 512² with automatic segmentation masks
        use_photorealism=False, iterations=500),
    "config3": StylizeConfig(  # 512² full deep-photo w/ Pallas Laplacian
        iterations=500),
    "config4": StylizeConfig(  # 1024² multi-scale coarse-to-fine
        iterations=300, scales=(256, 512, 1024), scale_iter_factor=1.0),
    "config5": StylizeConfig(  # batched 8-pair sharded stylization
        iterations=500),
}
