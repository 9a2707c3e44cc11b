#!/usr/bin/env python
"""Convert NIMA MobileNetV1 weights to the dpst_tpu `.npz` bundle.

Drop-in path for the reference's NIMA checkpoint workflow (SURVEY.md §2
comps. 11, 14). Two accepted sources:

  * Keras H5 (`.h5`/`.hdf5`) — THE public NIMA weight format
    (idealo/image-quality-assessment, titu1994/neural-image-assessment
    `mobilenet_weights.h5`): keras.applications MobileNet layer names
    (`conv1`, `conv_dw_<i>`, `conv_pw_<i>` + `_bn` pairs) and a 10-way
    Dense head; kernels HWIO, depthwise (3,3,C,1); BN eps 1e-3.

        python tools/convert_nima.py mobilenet_weights.h5 \\
            weights/nima_mobilenet.npz

  * torch state dict (`.pth`/`.pt`) — the common torch port layout:
    `features.<i>.{conv,bn}` pairs (full conv at i=0, then alternating
    depthwise/pointwise convs) and a 10-way `classifier` linear head;
    BN eps 1e-5.

Batch norms are folded to (scale, bias) exactly as models/nima.py
applies them; the bundle layout (models/nima.py SPECS) is the stable
contract.
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


def _load_keras_h5(path: str) -> dict:
    """Flatten a Keras H5 weight file to {slash-path: array}."""
    import h5py

    arrs = {}

    def visit(name, obj):
        if isinstance(obj, h5py.Dataset):
            arrs[name] = np.asarray(obj)

    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        root.visititems(visit)
    return arrs


def convert_keras(arrs: dict) -> dict:
    """keras.applications MobileNet + Dense(10) head -> bundle.

    Keras kernels are already HWIO; depthwise kernels (3,3,C,1) become
    (3,3,1,C); BN folding uses the Keras epsilon 1e-3."""
    out = {}

    def find(frag):
        hits = [v for k, v in arrs.items() if frag in k]
        if len(hits) != 1:
            raise KeyError(f"{frag}: {len(hits)} matches in H5")
        return hits[0]

    def fold_keras_bn(prefix, eps=1e-3):
        gamma = find(f"{prefix}/gamma")
        beta = find(f"{prefix}/beta")
        mean = find(f"{prefix}/moving_mean")
        var = find(f"{prefix}/moving_variance")
        scale = (gamma / np.sqrt(var + eps)).astype(np.float32)
        return scale, (beta - mean * scale).astype(np.float32)

    out["stem_w"] = find("conv1/kernel").astype(np.float32)
    out["stem_scale"], out["stem_bias"] = fold_keras_bn("conv1_bn")
    for i in range(len(MB_BLOCKS)):
        dw = find(f"conv_dw_{i + 1}/depthwise_kernel")   # (3,3,C,1)
        out[f"dw{i}_w"] = dw.transpose(0, 1, 3, 2).astype(np.float32)
        out[f"dw{i}_scale"], out[f"dw{i}_bias"] = fold_keras_bn(
            f"conv_dw_{i + 1}_bn")
        out[f"pw{i}_w"] = find(
            f"conv_pw_{i + 1}/kernel").astype(np.float32)
        out[f"pw{i}_scale"], out[f"pw{i}_bias"] = fold_keras_bn(
            f"conv_pw_{i + 1}_bn")
    # head Dense: any 2-D (1024, 10) kernel (idealo names it `dense`,
    # other ports `dense_1`)
    kernels = [v for k, v in arrs.items()
               if k.endswith("kernel:0") and v.ndim == 2
               and v.shape == (1024, 10)]
    if len(kernels) != 1:
        raise KeyError(f"expected one (1024, 10) Dense kernel, "
                       f"found {len(kernels)}")
    biases = [v for k, v in arrs.items()
              if k.endswith("bias:0") and v.shape == (10,)]
    out["head_w"] = kernels[0].astype(np.float32)
    out["head_scale"] = np.ones(10, np.float32)
    out["head_bias"] = (biases[0] if len(biases) == 1
                        else np.zeros(10)).astype(np.float32)
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src")
    ap.add_argument("dst")
    args = ap.parse_args(argv)

    if args.src.endswith(".npz"):
        data = dict(np.load(args.src))
    elif args.src.endswith((".h5", ".hdf5")):
        data = convert_keras(_load_keras_h5(args.src))
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
