#!/usr/bin/env python
"""End-to-end demo of every dpst-tpu entry point on synthetic photos.

No downloads needed: generates a structured "landscape" content photo and
a warm-palette style photo, then runs
  1. the full automatic pipeline (PSPNet segmentation → class merge →
     masked style + photorealism losses),
  2. a multi-scale coarse-to-fine run,
  3. the NIMA-guided Γ auto-tuner,
  4. batched stylization of several pairs.

Outputs land in ./demo_out. With bundled weights absent (see
`python -m dpst_tpu.utils.assets`), models run with deterministic random
init — the mechanics are identical, the semantics arrive with weights.

Run:  python examples/demo.py [--size 256] [--iters 200]
(no PYTHONPATH needed — and PYTHONPATH=. alone would clobber the axon
site path the TPU backend needs; the script inserts the repo itself)
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def make_pair(size: int) -> tuple[np.ndarray, np.ndarray]:
    """Synthetic content (sky/ground/building) + sunset-palette style."""
    h = w = size
    yy = np.linspace(0, 1, h)[:, None]
    xx = np.linspace(0, 1, w)[None, :]

    content = np.zeros((h, w, 3), np.float32)
    content[..., 0] = 70 + 40 * yy
    content[..., 1] = 110 + 50 * yy
    content[..., 2] = 210 - 130 * yy                     # blue sky
    ground = yy[:, 0] > 0.62
    content[ground] = [75, 125, 65]                      # green ground
    b0, b1 = int(0.3 * h), int(0.8 * h)
    c0, c1 = int(0.38 * w), int(0.62 * w)
    content[b0:b1, c0:c1] = [125, 115, 105]              # building
    content += np.random.default_rng(0).normal(0, 2, content.shape)

    style = np.zeros((h, w, 3), np.float32)
    style[..., 0] = 245 - 110 * yy                       # sunset sky
    style[..., 1] = 140 - 80 * yy
    style[..., 2] = 90 * (1 - yy) * (0.6 + 0.4 * np.sin(6 * np.pi * xx))
    style[ground] = [95, 60, 35]
    style += np.random.default_rng(1).normal(0, 4, style.shape)
    return (np.clip(content, 0, 255).astype(np.float32),
            np.clip(style, 0, 255).astype(np.float32))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--out", default="demo_out")
    args = ap.parse_args()
    if args.size < 16 or args.iters < 2:
        ap.error("--size must be >= 16 and --iters >= 2")

    from dpst_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    import dpst_tpu
    from dpst_tpu.utils import io

    os.makedirs(args.out, exist_ok=True)
    content, style = make_pair(args.size)
    io.save_image(content, f"{args.out}/content.png")
    io.save_image(style, f"{args.out}/style.png")

    # 1. full automatic pipeline
    cfg = dpst_tpu.StylizeConfig(iterations=args.iters, max_classes=4)
    t0 = time.time()
    out, hist = dpst_tpu.stylize(content, style, cfg,
                                 return_history=True)
    io.save_image(out, f"{args.out}/stylized.png")
    print(f"[1] full pipeline: {time.time() - t0:.1f}s; loss "
          f"{hist[0, 0]:.3g} -> {hist[-1, 0]:.3g} "
          f"-> {args.out}/stylized.png")

    # 1b. smooth-local-affine photorealism post-process (guided filter)
    cfg_sm = dpst_tpu.StylizeConfig(iterations=args.iters, max_classes=4,
                                    post_smooth=2)
    out_sm = dpst_tpu.stylize(content, style, cfg_sm)
    io.save_image(out_sm, f"{args.out}/stylized_smooth.png")
    print(f"[1b] + post-smooth -> {args.out}/stylized_smooth.png")

    # 2. multi-scale
    cfg_ms = dpst_tpu.StylizeConfig(
        iterations=args.iters // 2, max_classes=4,
        scales=(args.size // 2, args.size))
    t0 = time.time()
    out_ms = dpst_tpu.stylize(content, style, cfg_ms)
    io.save_image(out_ms, f"{args.out}/stylized_multiscale.png")
    print(f"[2] multi-scale: {time.time() - t0:.1f}s "
          f"-> {args.out}/stylized_multiscale.png")

    # 3. NIMA-guided Γ tuning (candidates optimize simultaneously)
    cfg_tune = dpst_tpu.StylizeConfig(
        iterations=args.iters // 2, max_classes=4,
        use_segmentation=False)
    t0 = time.time()
    res = dpst_tpu.autotune(content, style, cfg_tune,
                            gammas=(1.0, 100.0, 10000.0))
    io.save_image(res.best_image, f"{args.out}/stylized_autotuned.png")
    print(f"[3] autotune: {time.time() - t0:.1f}s; best Γ = "
          f"{res.best_gamma:g}; NIMA "
          + " ".join(f"{g:g}:{s:.3f}"
                     for g, s in zip(res.gammas, res.scores)))

    # 4. batched pairs, sharded over every available device
    from dpst_tpu.segmentation import uniform_masks
    pairs = [make_pair(args.size // 2) for _ in range(2)]
    contents = np.stack([p[0] for p in pairs])
    styles = np.stack([p[1][::-1].copy() for p in pairs])
    masks = np.stack([uniform_masks(c.shape[:2]) for c in contents])
    cfg_b = dpst_tpu.StylizeConfig(iterations=args.iters // 2,
                                   use_segmentation=False,
                                   max_classes=1)
    t0 = time.time()
    imgs, _ = dpst_tpu.stylize_batch(contents, styles, masks, masks,
                                     cfg=cfg_b)
    for i, img in enumerate(np.asarray(imgs)):
        io.save_image(img, f"{args.out}/batch_{i}.png")
    print(f"[4] batched x{len(pairs)}: {time.time() - t0:.1f}s "
          f"-> {args.out}/batch_*.png")
    return 0


if __name__ == "__main__":
    sys.exit(main())
