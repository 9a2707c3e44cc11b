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

NOTE on channel order: torchvision VGG is RGB-input with [0,1]-normalized
preprocessing, while this pipeline (and the Caffe lineage the reference
uses) feeds mean-subtracted BGR in [0,255]. The converter flips the
first conv's input channels and leaves magnitudes untouched — features
then differ from torchvision's by the preprocessing convention, which is
absorbed by the loss being relative. Pass --no-bgr-flip to keep RGB.
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dpst_tpu.models.vgg import CONV_SHAPES  # noqa: E402

# torchvision features.* module indices of the 16 conv layers, in order
TORCHVISION_IDX = (0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30,
                   32, 34)


def convert_torch(state: dict, bgr_flip: bool = True) -> dict:
    names = list(CONV_SHAPES)
    out = {}
    for name, tv_idx in zip(names, TORCHVISION_IDX):
        w = np.asarray(state[f"features.{tv_idx}.weight"])  # OIHW
        b = np.asarray(state[f"features.{tv_idx}.bias"])
        w = w.transpose(2, 3, 1, 0)                          # -> HWIO
        if bgr_flip and name == "conv1_1":
            w = w[:, :, ::-1, :]
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
    ap.add_argument("--no-bgr-flip", action="store_true")
    args = ap.parse_args(argv)

    if args.src.endswith(".npz"):
        data = dict(np.load(args.src))
    else:
        import torch
        state = torch.load(args.src, map_location="cpu",
                           weights_only=True)
        if hasattr(state, "state_dict"):
            state = state.state_dict()
        data = convert_torch(state, bgr_flip=not args.no_bgr_flip)

    for name, (cin, cout) in CONV_SHAPES.items():
        w = data[f"{name}_w"]
        if w.shape != (3, 3, cin, cout):
            raise SystemExit(f"{name}: bad shape {w.shape}")
    np.savez(args.dst, **data)
    print(f"wrote {args.dst} ({len(data)} arrays)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
