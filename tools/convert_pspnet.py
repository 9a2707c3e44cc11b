#!/usr/bin/env python
"""Convert PSPNet-50 ADE20K weights to the dpst_tpu `.npz` bundle.

Documented drop-in path for the reference's segmentation checkpoint
workflow (SURVEY.md §2 comps. 7, 14 — no network in this environment):
obtain a torch state dict of PSPNet-50 (e.g. hszhao/semseg's
`pspnet50_ade20k.pth`: `layer0..layer4` backbone, `ppm` pyramid head,
`cls` classifier), then

    python tools/convert_pspnet.py pspnet50_ade20k.pth \
        weights/pspnet50_ade20k.npz

Batch norms are FOLDED here: for y = γ·(conv(x)−μ)/√(σ²+ε) + β the
bundle stores scale = γ/√(σ²+ε) and bias = β − μ·scale, which is exactly
what models/pspnet.py applies after each conv.

The source key naming varies across public PSPNet ports; adapt KEY_MAP
to the checkpoint at hand — the bundle layout (models/pspnet.py
CONV_SPECS) is the stable contract.
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dpst_tpu.models.pspnet import CONV_SPECS, PPM_BINS, STAGES  # noqa: E402


def fold_bn(w_oihw, gamma, beta, mean, var, eps=1e-5):
    """torch OIHW conv + BN stats -> (HWIO conv, scale, bias)."""
    w = np.asarray(w_oihw).transpose(2, 3, 1, 0).astype(np.float32)
    scale = (np.asarray(gamma) /
             np.sqrt(np.asarray(var) + eps)).astype(np.float32)
    bias = (np.asarray(beta)
            - np.asarray(mean) * scale).astype(np.float32)
    return w, scale, bias


def build_key_map() -> dict[str, tuple[str, str]]:
    """bundle conv name -> (torch conv prefix, torch bn prefix),
    following hszhao/semseg naming."""
    m = {
        "stem1": ("layer0.0", "layer0.1"),
        "stem2": ("layer0.3", "layer0.4"),
        "stem3": ("layer0.6", "layer0.7"),
        "fuse": ("cls.0", "cls.1"),
    }
    for si, (blocks, _c, _s, _d) in enumerate(STAGES):
        for b in range(blocks):
            p = f"res{si + 2}_{b}"
            t = f"layer{si + 1}.{b}"
            m[f"{p}_a"] = (f"{t}.conv1", f"{t}.bn1")
            m[f"{p}_b"] = (f"{t}.conv2", f"{t}.bn2")
            m[f"{p}_c"] = (f"{t}.conv3", f"{t}.bn3")
            if b == 0:
                m[f"{p}_proj"] = (f"{t}.downsample.0",
                                  f"{t}.downsample.1")
    for i, bin_ in enumerate(PPM_BINS):
        m[f"ppm{bin_}"] = (f"ppm.features.{i}.1",
                           f"ppm.features.{i}.2")
    return m


def convert_torch(state: dict) -> dict:
    key_map = build_key_map()
    out = {}
    for name, _kh, _kw, _cin, _cout in CONV_SPECS:
        if name == "head":
            w = np.asarray(state["cls.4.weight"])
            b = np.asarray(state["cls.4.bias"])
            out["head_w"] = w.transpose(2, 3, 1, 0).astype(np.float32)
            out["head_scale"] = np.ones(w.shape[0], np.float32)
            out["head_bias"] = b.astype(np.float32)
            continue
        conv_p, bn_p = key_map[name]
        w, scale, bias = fold_bn(
            state[f"{conv_p}.weight"], state[f"{bn_p}.weight"],
            state[f"{bn_p}.bias"], state[f"{bn_p}.running_mean"],
            state[f"{bn_p}.running_var"])
        out[f"{name}_w"] = w
        out[f"{name}_scale"] = scale
        out[f"{name}_bias"] = bias
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
        state = {k.removeprefix("module."): v for k, v in state.items()}
        data = convert_torch(state)

    for name, kh, kw, cin, cout in CONV_SPECS:
        if data[f"{name}_w"].shape != (kh, kw, cin, cout):
            raise SystemExit(
                f"{name}: bad shape {data[f'{name}_w'].shape}")
    np.savez(args.dst, **data)
    print(f"wrote {args.dst} ({len(data)} arrays)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
