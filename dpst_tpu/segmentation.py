"""Segmentation subsystem: PSPNet inference + mask pipeline.

TPU-native rebuild of the reference's segmentation stage (SURVEY.md §2
comps. 7-9): PSPNet-style semantic segmentation of content and style
images (150 ADE20K classes), semantic class merging (semantic_merge.py),
and conversion of aligned label maps into static-shape per-class soft mask
stacks padded to `max_classes` — ragged class counts are the enemy of
jit/scan, so the class axis is always (K_max,) with all-zero padding rows.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .ops.resize import mask_pyramid


def segment_images(content: np.ndarray, style: np.ndarray,
                   params=None, compute_dtype: str = "bfloat16",
                   protocol: str = "resize",
                   seg_scales: tuple = (1.0,)
                   ) -> tuple[np.ndarray, np.ndarray]:
    """Run PSPNet on both images → per-pixel ADE20K class maps (H, W) int32.

    Weights come from the bundled `.npz` if present (tools/convert_pspnet.py
    drop-in path — no network in this environment, SURVEY.md §7 risks),
    else deterministic random init. `protocol`/`seg_scales` select the
    inference protocol (models/pspnet.segment: fast 473² squash vs the
    semseg-lineage sliding-window eval).
    """
    from .models import pspnet
    if params is None:
        params = pspnet.get_params()
    seg_c = pspnet.segment(params, jnp.asarray(content), compute_dtype,
                           protocol=protocol, scales=seg_scales)
    seg_s = pspnet.segment(params, jnp.asarray(style), compute_dtype,
                           protocol=protocol, scales=seg_scales)
    return np.asarray(seg_c), np.asarray(seg_s)


def masks_from_labels(labels: np.ndarray, class_ids: list[int],
                      max_classes: int) -> np.ndarray:
    """One-hot (K_max, H, W) float32 masks for `class_ids`, zero-padded.

    `class_ids` is the MERGED class list shared by content and style
    (semantic_merge.merge_classes output); order defines the class axis.
    """
    if len(class_ids) > max_classes:
        raise ValueError(
            f"{len(class_ids)} merged classes > max_classes={max_classes}; "
            "raise StylizeConfig.max_classes")
    h, w = labels.shape
    masks = np.zeros((max_classes, h, w), dtype=np.float32)
    for k, cid in enumerate(class_ids):
        masks[k] = (labels == cid)
    return masks


def uniform_masks(hw: tuple[int, int], max_classes: int = 1) -> np.ndarray:
    """Single all-ones mask (padded) — the no-segmentation fallback: the
    masked style loss degenerates to the plain Gatys Gram loss."""
    masks = np.zeros((max_classes, hw[0], hw[1]), dtype=np.float32)
    masks[0] = 1.0
    return masks


def automatic_masks(content: np.ndarray, style: np.ndarray,
                    cfg, params=None
                    ) -> tuple[np.ndarray, np.ndarray, list[int]]:
    """Full automatic pipeline: segment both → merge label sets →
    aligned (K_max, H, W) mask stacks for content and style."""
    from . import semantic_merge
    seg_c, seg_s = segment_images(content, style, params,
                                  cfg.compute_dtype,
                                  protocol=cfg.seg_protocol,
                                  seg_scales=cfg.seg_scales)
    merged_c, merged_s, class_ids = semantic_merge.merge_classes(
        seg_c, seg_s, metric=cfg.similarity_metric,
        threshold=cfg.similarity_threshold,
        max_classes=cfg.max_classes)
    mc = masks_from_labels(merged_c, class_ids, cfg.max_classes)
    ms = masks_from_labels(merged_s, class_ids, cfg.max_classes)
    return mc, ms, class_ids


def automatic_masks_batch(contents: np.ndarray, style: np.ndarray,
                          cfg, params=None
                          ) -> tuple[np.ndarray, np.ndarray]:
    """`automatic_masks` for N content images sharing one style:
    (N, H, W, 3) + (H, W, 3) -> ((N, K, H, W), (N, K, H, W)).

    Segments ALL contents in one batched PSPNet dispatch and the style
    ONCE (the per-pair loop re-segments the style N times and pays the
    ~100 ms remote-dispatch floor per call — ARCHITECTURE.md); the
    label-set merge stays per pair (each content sees different
    classes). Resize protocol only — the sliding protocol's per-scale
    window geometry is image-specific, so it falls back to the loop.
    """
    from .models import pspnet
    if params is None:
        params = pspnet.get_params()
    if cfg.seg_protocol != "resize":
        pairs = [automatic_masks(c, style, cfg, params) for c in contents]
        return (np.stack([p[0] for p in pairs]),
                np.stack([p[1] for p in pairs]))
    seg_c_all = np.asarray(pspnet.segment_batch(
        params, jnp.asarray(contents), cfg.compute_dtype))
    seg_s = np.asarray(pspnet.segment(
        params, jnp.asarray(style), cfg.compute_dtype))
    from . import semantic_merge
    cms, sms = [], []
    for seg_c in seg_c_all:
        merged_c, merged_s, ids = semantic_merge.merge_classes(
            seg_c, seg_s, metric=cfg.similarity_metric,
            threshold=cfg.similarity_threshold,
            max_classes=cfg.max_classes)
        cms.append(masks_from_labels(merged_c, ids, cfg.max_classes))
        sms.append(masks_from_labels(merged_s, ids, cfg.max_classes))
    return np.stack(cms), np.stack(sms)


def coverage_weights(content_masks: jnp.ndarray) -> jnp.ndarray:
    """(K,) per-class style-loss weights = content-image coverage fraction.

    Zero-padded classes get exactly 0; real classes sum to ~1 (soft masks
    that tile the image partition the weight budget).
    """
    m = jnp.asarray(content_masks, jnp.float32)
    area = jnp.sum(m * m, axis=(1, 2))
    total = jnp.maximum(jnp.sum(area), 1e-8)
    return area / total


def layer_masks(masks: jnp.ndarray, style_layers: tuple[str, ...],
                method: str = "avg") -> dict:
    """Per-style-layer downsampled mask stacks (SURVEY.md §2 comp.9)."""
    return mask_pyramid(jnp.asarray(masks, jnp.float32), style_layers,
                        method)
