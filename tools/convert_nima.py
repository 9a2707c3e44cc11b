#!/usr/bin/env python
"""Convert NIMA MobileNetV1 weights to the dpst_tpu `.npz` bundle.

Drop-in path for the reference's NIMA checkpoint workflow (SURVEY.md §2
comps. 11, 14): obtain a torch MobileNetV1+NIMA state dict — the common
public port lays the backbone out as `features.<i>.{conv,bn}` pairs
(full conv at i=0, then alternating depthwise/pointwise convs) and a
10-way `classifier` linear head — then

    python tools/convert_nima.py nima_mobilenet.pth \
        weights/nima_mobilenet.npz

Batch norms are folded to (scale, bias) exactly as models/nima.py applies
them. Keras-origin weights should be repacked to this torch-style dict
first (channel orders differ per source; the bundle layout in
models/nima.py SPECS is the stable contract).
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dpst_tpu.models.nima import MB_BLOCKS, SPECS  # noqa: E402


def fold_bn(w_oihw, gamma, beta, mean, var, eps=1e-5, depthwise=False):
    w = np.asarray(w_oihw)
    if depthwise:                       # torch (C,1,3,3) -> HWIO (3,3,1,C)
        w = w.transpose(2, 3, 1, 0)
    else:
        w = w.transpose(2, 3, 1, 0)
    scale = (np.asarray(gamma)
             / np.sqrt(np.asarray(var) + eps)).astype(np.float32)
    bias = (np.asarray(beta) - np.asarray(mean) * scale).astype(
        np.float32)
    return w.astype(np.float32), scale, bias


def convert_torch(state: dict) -> dict:
    out = {}
    idx = 0

    def grab(name, depthwise=False):
        nonlocal idx
        w, s, b = fold_bn(
            state[f"features.{idx}.conv.weight"],
            state[f"features.{idx}.bn.weight"],
            state[f"features.{idx}.bn.bias"],
            state[f"features.{idx}.bn.running_mean"],
            state[f"features.{idx}.bn.running_var"],
            depthwise=depthwise)
        out[f"{name}_w"] = w
        out[f"{name}_scale"] = s
        out[f"{name}_bias"] = b
        idx += 1

    grab("stem")
    for i in range(len(MB_BLOCKS)):
        grab(f"dw{i}", depthwise=True)
        grab(f"pw{i}")
    out["head_w"] = np.asarray(
        state["classifier.weight"]).T.astype(np.float32)
    out["head_scale"] = np.ones(10, np.float32)
    out["head_bias"] = np.asarray(
        state["classifier.bias"]).astype(np.float32)
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src")
    ap.add_argument("dst")
    args = ap.parse_args(argv)

    if args.src.endswith(".npz"):
        data = dict(np.load(args.src))
    else:
        import torch
        state = torch.load(args.src, map_location="cpu",
                           weights_only=True)
        if "state_dict" in state:
            state = state["state_dict"]
        data = convert_torch(state)

    for name, kind, cin, cout in SPECS:
        if f"{name}_w" not in data:
            raise SystemExit(f"missing {name}_w")
    np.savez(args.dst, **data)
    print(f"wrote {args.dst} ({len(data)} arrays)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
