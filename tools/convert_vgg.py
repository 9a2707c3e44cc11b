#!/usr/bin/env python
"""Convert VGG-19 ImageNet weights to the dpst_tpu `.npz` bundle.

The reference workflow downloads framework checkpoints into a weights dir
(SURVEY.md §2 comp.14); this environment has no network, so conversion is
the documented drop-in path: obtain a torchvision-style VGG-19 state dict
(`vgg19-*.pth`, torch OIHW layout) elsewhere, run

    python tools/convert_vgg.py vgg19.pth weights/vgg19.npz

and dpst_tpu picks the bundle up automatically (models/vgg.py:get_params,
or $DPST_VGG_WEIGHTS).

Accepted inputs:
  * torch state dict (.pth/.pt): keys `features.<idx>.weight/bias` in the
    torchvision layer numbering, conv weights OIHW;
  * a `.npz` already in bundle layout (validated and rewritten).

Preprocessing conventions (--convention):
  * `torchvision` (default for .pth): torchvision VGG-19 was trained on
    RGB inputs normalized as t = (img/255 - mean)/std. This pipeline
    (Caffe lineage, models/vgg.py:preprocess) feeds mean-subtracted
    [0,255] BGR. The converter folds the torchvision normalization into
    conv1_1 EXACTLY — per-input-channel weight scale 1/(255*std_c), bias
    shift by the affine offset, then a BGR channel flip — so the
    converted bundle reproduces torchvision activations exactly (up to
    fp rounding) on interior pixels when fed this pipeline's
    preprocessing; border rings keep a ≤1e-2 residual because the two
    conventions pad with slightly different mean pixels. Without the
    folding, activations sit ~58-255x outside the trained operating
    point and ReLU gating/Gram statistics diverge non-linearly.
  * `caffe`: the state dict is already trained on mean-subtracted
    [0,255] BGR (the classic VGG .caffemodel lineage re-exported with
    torchvision key names): layout transpose only, no flip, no scale.
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dpst_tpu.models.vgg import BGR_MEANS, CONV_SHAPES  # noqa: E402

# torchvision features.* module indices of the 16 conv layers, in order
TORCHVISION_IDX = (0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30,
                   32, 34)

# torchvision ImageNet normalization constants (RGB order).
TV_MEAN = (0.485, 0.456, 0.406)
TV_STD = (0.229, 0.224, 0.225)


def _fold_torchvision_preprocessing(w: np.ndarray, b: np.ndarray):
    """Fold t = (rgb/255 - mean)/std into conv1_1 (HWIO, RGB input).

    The pipeline feeds x_j = bgr255_j - BGR_MEANS_j (BGR index j); the
    RGB channel c the torch weights expect satisfies
        t_c = x_{2-c}/(255*std_c) + k_c,
        k_c = (BGR_MEANS[2-c]/255 - mean_c)/std_c.
    So: bias += W·k, weights *= 1/(255*std) per RGB input channel, then
    flip input channels RGB->BGR.
    """
    mean = np.asarray(TV_MEAN, np.float64)
    std = np.asarray(TV_STD, np.float64)
    m_rgb = np.asarray(BGR_MEANS[::-1], np.float64)  # means in RGB order
    k = (m_rgb / 255.0 - mean) / std
    b = b + np.einsum("hwio,i->o", w, k)
    w = w / (255.0 * std)[None, None, :, None]
    return w[:, :, ::-1, :], b


def convert_torch(state: dict, convention: str = "torchvision") -> dict:
    if convention not in ("torchvision", "caffe"):
        raise ValueError(f"unknown convention {convention!r}")
    names = list(CONV_SHAPES)
    out = {}
    for name, tv_idx in zip(names, TORCHVISION_IDX):
        w = np.asarray(state[f"features.{tv_idx}.weight"],
                       np.float64)                           # OIHW
        b = np.asarray(state[f"features.{tv_idx}.bias"], np.float64)
        w = w.transpose(2, 3, 1, 0)                          # -> HWIO
        if name == "conv1_1" and convention == "torchvision":
            w, b = _fold_torchvision_preprocessing(w, b)
        cin, cout = CONV_SHAPES[name]
        if w.shape != (3, 3, cin, cout):
            raise ValueError(f"{name}: unexpected shape {w.shape}")
        out[f"{name}_w"] = w.astype(np.float32)
        out[f"{name}_b"] = b.astype(np.float32)
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src", help="vgg19 .pth state dict or .npz bundle")
    ap.add_argument("dst", help="output .npz path")
    ap.add_argument("--convention", choices=("torchvision", "caffe"),
                    default="torchvision",
                    help="training-time preprocessing of the source "
                         "weights (see module docstring)")
    args = ap.parse_args(argv)

    if args.src.endswith(".npz"):
        data = dict(np.load(args.src))
    else:
        import torch
        state = torch.load(args.src, map_location="cpu",
                           weights_only=True)
        if hasattr(state, "state_dict"):
            state = state.state_dict()
        data = convert_torch(state, convention=args.convention)

    for name, (cin, cout) in CONV_SHAPES.items():
        w = data[f"{name}_w"]
        if w.shape != (3, 3, cin, cout):
            raise SystemExit(f"{name}: bad shape {w.shape}")
    np.savez(args.dst, **data)
    print(f"wrote {args.dst} ({len(data)} arrays)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
