#!/usr/bin/env python
"""Validate a dropped-in `.npz` weight bundle before first use.

Weight drop-in day is the riskiest moment of the offline-weights
workflow (SURVEY.md §7 risks): a converter key-map or layout mistake
surfaces only as silently wrong stylizations. This tool hard-checks the
structural contract and smoke-runs the network:

    python tools/verify_bundle.py vgg19    weights/vgg19.npz
    python tools/verify_bundle.py pspnet   weights/pspnet50_ade20k.npz
    python tools/verify_bundle.py nima     weights/nima_mobilenet.npz

Exit code 0 = structurally valid + forward pass sane; structural
failures exit 1. Statistics (activation operating point, segmentation
diversity, score distribution entropy) are printed for human review —
trained weights have characteristic signatures that random init lacks.
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _test_image(h=224, w=224):
    x, y = np.meshgrid(np.linspace(0, 1, w), np.linspace(0, 1, h))
    img = np.stack([x * 255, y * 255, (x + y) * 127], -1)
    img[h // 3: 2 * h // 3, w // 3: 2 * w // 3] = [30, 160, 80]
    return img.astype(np.float32)


def verify_vgg(path: str) -> bool:
    import jax.numpy as jnp

    from dpst_tpu.models import vgg

    params = vgg.load_params(path)       # raises on any bad shape/key
    ok = True
    for name, p in params.items():
        for k, v in p.items():
            if not np.all(np.isfinite(np.asarray(v))):
                print(f"FAIL {name}.{k}: non-finite values")
                ok = False
    feats = vgg.extract_features(
        params, jnp.asarray(_test_image()),
        ("conv1_1", "conv3_1", "conv5_1", "conv4_2"),
        compute_dtype="float32")
    for layer, f in feats.items():
        a = np.asarray(f)
        alive = float((a > 0).mean())
        print(f"  {layer}: mean|act|={np.abs(a).mean():.3g} "
              f"alive={alive:.2%}")
        if not np.all(np.isfinite(a)):
            print(f"FAIL {layer}: non-finite activations")
            ok = False
        if alive == 0.0:
            print(f"FAIL {layer}: all activations dead (ReLU collapse — "
                  "wrong preprocessing convention? see convert_vgg.py "
                  "--convention)")
            ok = False
    return ok


def verify_pspnet(path: str) -> bool:
    import jax.numpy as jnp

    from dpst_tpu.models import pspnet

    params = pspnet.load_params(path)
    ok = True
    for name, p in params.items():
        if not all(np.all(np.isfinite(np.asarray(v)))
                   for v in p.values()):
            print(f"FAIL {name}: non-finite values")
            ok = False
        scale = np.asarray(p["scale"])
        if np.all(scale == 1.0) and name != "head":
            print(f"  note: {name} has identity BN scale (unfused or "
                  "synthetic checkpoint?)")
    seg = np.asarray(pspnet.segment(
        params, jnp.asarray(_test_image(473, 473)),
        compute_dtype="float32"))
    ids, counts = np.unique(seg, return_counts=True)
    print(f"  segment(): {len(ids)} classes on the test image; top: "
          + ", ".join(f"{i}:{c}" for i, c in
                      sorted(zip(ids, counts), key=lambda t: -t[1])[:5]))
    if not (0 <= seg.min() and seg.max() < pspnet.N_CLASSES):
        print("FAIL segment(): class ids out of range")
        ok = False
    return ok


def verify_nima(path: str) -> bool:
    import jax.numpy as jnp

    from dpst_tpu.models import nima

    params = nima.load_params(path)
    ok = True
    for name, p in params.items():
        if not all(np.all(np.isfinite(np.asarray(v)))
                   for v in p.values()):
            print(f"FAIL {name}: non-finite values")
            ok = False
    imgs = jnp.asarray(np.stack([_test_image(),
                                 _test_image()[::-1].copy()]))
    dist = np.asarray(nima.score_distribution(params, imgs,
                                              compute_dtype="float32"))
    scores = dist @ np.arange(1.0, 11.0)
    ent = float(-(dist * np.log(np.maximum(dist, 1e-12))).sum(-1).mean())
    print(f"  scores={np.round(scores, 3)} entropy={ent:.3f} "
          f"(uniform=2.303 — trained heads are peakier)")
    if not np.all(np.isfinite(dist)) or not np.allclose(
            dist.sum(-1), 1.0, atol=1e-4):
        print("FAIL score_distribution: not a distribution")
        ok = False
    if not np.all((1.0 <= scores) & (scores <= 10.0)):
        print("FAIL scores out of [1, 10]")
        ok = False
    return ok


VERIFIERS = {"vgg19": verify_vgg, "pspnet": verify_pspnet,
             "nima": verify_nima}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("model", choices=sorted(VERIFIERS))
    ap.add_argument("bundle", help=".npz bundle path")
    args = ap.parse_args(argv)
    try:
        ok = VERIFIERS[args.model](args.bundle)
    except Exception as e:
        print(f"FAIL structural: {e}")
        return 1
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
