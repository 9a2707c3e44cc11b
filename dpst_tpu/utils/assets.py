"""Asset / weight-bundle management (SURVEY.md §2 comp.14).

The reference documents a manual download of VGG / PSPNet / NIMA
checkpoints into a weights directory; this module is the equivalent
registry: canonical bundle paths, env-var overrides, and a status report
(`python -m dpst_tpu.utils.assets`). Conversion from public checkpoints
into the `.npz` bundle layout is done offline by tools/convert_*.py
(this environment has no network — random deterministic init is the
tested fallback everywhere; SURVEY.md §7 risks).
"""
from __future__ import annotations

import os

WEIGHTS_DIR = os.environ.get(
    "DPST_WEIGHTS_DIR",
    os.path.join(os.path.dirname(__file__), "..", "..", "weights"))

BUNDLES = {
    "vgg19": ("DPST_VGG_WEIGHTS", "vgg19.npz",
              "tools/convert_vgg.py  (torchvision vgg19 .pth)"),
    "pspnet50_ade20k": ("DPST_PSPNET_WEIGHTS", "pspnet50_ade20k.npz",
                        "tools/convert_pspnet.py  (semseg pspnet50 .pth)"),
    "nima_mobilenet": ("DPST_NIMA_WEIGHTS", "nima_mobilenet.npz",
                       "tools/convert_nima.py  (idealo mobilenet_weights"
                       ".h5 or torch .pth)"),
    "similarity_matrix": ("DPST_SIMILARITY_MATRIX",
                          "similarity_matrix.npz",
                          "any 150x150 label-embedding similarity "
                          "(key 'similarity'; semantic_merge.py)"),
}


def bundle_path(name: str) -> str:
    env, fname, _ = BUNDLES[name]
    return os.environ.get(env, os.path.join(WEIGHTS_DIR, fname))


def bundle_available(name: str) -> bool:
    return os.path.exists(bundle_path(name))


def status() -> dict[str, dict]:
    out = {}
    for name, (env, fname, converter) in BUNDLES.items():
        path = bundle_path(name)
        out[name] = {
            "path": path,
            "available": os.path.exists(path),
            "env_override": env,
            "converter": converter,
        }
    return out


if __name__ == "__main__":
    for name, info in status().items():
        mark = "✓" if info["available"] else "✗ (random init fallback)"
        print(f"{name:18s} {mark}  {info['path']}")
        if not info["available"]:
            print(f"{'':18s}    drop-in: {info['converter']}, "
                  f"or ${info['env_override']}")
