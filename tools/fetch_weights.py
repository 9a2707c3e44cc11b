#!/usr/bin/env python
"""One-command weight acquisition for reference parity (VERDICT r2 #8).

This build environment has no network, so `weights/` ships empty and
every model falls back to deterministic random init (tested everywhere).
On any NETWORKED machine, this tool turns that into reference-parity
weights in one command:

    python tools/fetch_weights.py all          # download + convert + verify
    python tools/fetch_weights.py vgg19        # one asset
    python tools/fetch_weights.py --list       # show the manifest
    python tools/fetch_weights.py --verify     # re-hash existing downloads

Pipeline per asset: download → SHA256 check → tools/convert_*.py →
tools/verify_bundle.py. Every converter is validated per stage against
an independent torch build of the SAME public checkpoint layout
(tests/test_pspnet_torch.py, test_nima_torch.py, test_vgg.py,
tests/reference_layouts.py), so a checkpoint that downloads and hashes
clean converts to a bundle that reproduces the reference activations.

Hash policy (no fabricated digests): `sha256` below is pinned where the
publisher documents it (torchvision embeds the digest's first 8 hex
chars in the filename). Where the upstream publishes NO digest (Google
Drive / GitHub-release hosted files), the field is None and the tool
records the observed digest into weights/LOCK.json on first download
(trust-on-first-use); later runs verify against the lock.

Sources (the reference's documented weight workflow, SURVEY.md §2
comp.14 / L0):
  * VGG-19: torchvision's ImageNet checkpoint (the converter folds its
    RGB/std preprocessing into conv1_1 exactly — tools/convert_vgg.py).
  * PSPNet-50 ADE20K: hszhao/semseg's official release checkpoint
    (layer0..layer4/ppm/cls layout — tools/convert_pspnet.py).
  * NIMA: idealo/image-quality-assessment aesthetic MobileNet H5
    (keras.applications layer names — tools/convert_nima.py).
  * similarity_matrix: built locally from any word-embedding file via
    tools/make_similarity_matrix.py (GloVe 6B.300d documented there).
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys
import urllib.request

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
WEIGHTS = os.environ.get("DPST_WEIGHTS_DIR", os.path.join(REPO, "weights"))
DOWNLOADS = os.path.join(WEIGHTS, "downloads")
LOCK = os.path.join(WEIGHTS, "LOCK.json")

MANIFEST = {
    "vgg19": {
        "urls": ["https://download.pytorch.org/models/vgg19-dcbb9e9d.pth"],
        "filename": "vgg19-dcbb9e9d.pth",
        # torchvision convention: filename embeds sha256[:8]; the full
        # digest is verified to start with it even before any lock exists
        "sha256_prefix": "dcbb9e9d",
        "sha256": None,
        "convert": [sys.executable, os.path.join(HERE, "convert_vgg.py"),
                    "{src}", "{dst}", "--convention", "torchvision"],
        "bundle": "vgg19.npz",
        "verify": ["vgg19"],
    },
    "pspnet50_ade20k": {
        # hszhao/semseg's official ADE20K PSPNet-50 checkpoint. The
        # release is hosted on Google Drive (folder id in the semseg
        # README); gdown resolves the file by name. A torch-hub mirror
        # of the same state dict also works — any file in the
        # layer0..layer4/ppm/cls layout converts identically.
        "urls": [
            "gdrive://semseg/exp/ade20k/pspnet50/model/train_epoch_100.pth",
        ],
        "note": ("hszhao/semseg release (README 'Google Drive' link, "
                 "folder ade20k/pspnet50). With gdown installed: "
                 "gdown --folder <semseg-drive-id>; or download "
                 "train_epoch_100.pth manually into weights/downloads/. "
                 "No publisher digest exists -> TOFU lock."),
        "filename": "pspnet50_ade20k.pth",
        "sha256_prefix": None,
        "sha256": None,
        "convert": [sys.executable,
                    os.path.join(HERE, "convert_pspnet.py"),
                    "{src}", "{dst}"],
        "bundle": "pspnet50_ade20k.npz",
        "verify": ["pspnet"],
    },
    "nima_mobilenet": {
        "urls": [
            # idealo's released aesthetic-MobileNet weights (GitHub
            # release asset); titu1994's mobilenet_weights.h5 is the
            # same Keras layout and converts identically.
            "https://github.com/idealo/image-quality-assessment/raw/master/models/MobileNet/weights_mobilenet_aesthetic_0.07.hdf5",
            "https://github.com/titu1994/neural-image-assessment/releases/download/v0.1/mobilenet_weights.h5",
        ],
        "filename": "nima_mobilenet.h5",
        "sha256_prefix": None,
        "sha256": None,  # no publisher digest -> TOFU lock
        "convert": [sys.executable, os.path.join(HERE, "convert_nima.py"),
                    "{src}", "{dst}"],
        "bundle": "nima_mobilenet.npz",
        "verify": ["nima"],
    },
    "similarity_matrix": {
        # built, not downloaded: any word-embedding text file works;
        # GloVe 6B is the documented choice (make_similarity_matrix.py)
        "urls": ["https://nlp.stanford.edu/data/glove.6B.zip"],
        "filename": "glove.6B.300d.txt",
        "sha256_prefix": None,
        "sha256": None,
        "note": ("unzip glove.6B.zip; then the convert step builds the "
                 "150x150 ADE20K label-similarity matrix locally"),
        "convert": [sys.executable,
                    os.path.join(HERE, "make_similarity_matrix.py"),
                    "--embeddings", "{src}", "--out", "{dst}"],
        "bundle": "similarity_matrix.npz",
        "verify": [],
    },
}


def sha256_file(path: str, chunk=1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def load_lock() -> dict:
    if os.path.exists(LOCK):
        with open(LOCK) as f:
            return json.load(f)
    return {}


def save_lock(lock: dict) -> None:
    os.makedirs(WEIGHTS, exist_ok=True)
    with open(LOCK, "w") as f:
        json.dump(lock, f, indent=2, sort_keys=True)


def check_digest(name: str, path: str, *, update_lock: bool) -> bool:
    spec = MANIFEST[name]
    digest = sha256_file(path)
    ok = True
    if spec.get("sha256"):
        ok = digest == spec["sha256"]
    elif spec.get("sha256_prefix"):
        ok = digest.startswith(spec["sha256_prefix"])
    if not ok:
        print(f"  DIGEST MISMATCH for {name}: {digest}")
        return False
    lock = load_lock()
    pinned = lock.get(name)
    if pinned and pinned != digest:
        print(f"  LOCK MISMATCH for {name}: observed {digest}, "
              f"locked {pinned} (delete weights/LOCK.json to re-pin)")
        return False
    if not pinned and update_lock:
        lock[name] = digest
        save_lock(lock)
        print(f"  pinned sha256:{digest[:16]}… into weights/LOCK.json")
    else:
        print(f"  sha256 ok ({digest[:16]}…)")
    return True


def download(name: str) -> str | None:
    spec = MANIFEST[name]
    os.makedirs(DOWNLOADS, exist_ok=True)
    dst = os.path.join(DOWNLOADS, spec["filename"])
    if os.path.exists(dst):
        print(f"  {spec['filename']} already downloaded")
        return dst
    for url in spec["urls"]:
        if url.startswith("gdrive://"):
            print(f"  manual step needed: {spec.get('note', url)}")
            continue
        print(f"  fetching {url}")
        try:
            tmp = dst + ".part"
            urllib.request.urlretrieve(url, tmp)
            os.replace(tmp, dst)
            return dst
        except Exception as e:  # try the next mirror
            print(f"    failed: {e}")
    return None


def process(name: str, *, fetch: bool = True) -> bool:
    spec = MANIFEST[name]
    print(f"[{name}]")
    src = os.path.join(DOWNLOADS, spec["filename"])
    if not os.path.exists(src):
        if not fetch:
            print("  not downloaded")
            return False
        src = download(name)
        if src is None:
            print(f"  could not download {name}; see manifest note")
            return False
    if not check_digest(name, src, update_lock=True):
        return False
    bundle = os.path.join(WEIGHTS, spec["bundle"])
    cmd = [a.format(src=src, dst=bundle) for a in spec["convert"]]
    print("  " + " ".join(cmd))
    if subprocess.call(cmd) != 0:
        print("  conversion FAILED")
        return False
    for kind in spec["verify"]:
        vcmd = [sys.executable, os.path.join(HERE, "verify_bundle.py"),
                kind, bundle]
        print("  " + " ".join(vcmd))
        if subprocess.call(vcmd) != 0:
            print("  bundle verification FAILED")
            return False
    print(f"  ready: {bundle}")
    return True


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("assets", nargs="*",
                   help="asset names or 'all' (default: --list)")
    p.add_argument("--list", action="store_true",
                   help="print the manifest and current status")
    p.add_argument("--verify", action="store_true",
                   help="re-hash existing downloads against pins/lock "
                        "without downloading or converting")
    args = p.parse_args(argv)

    if args.list or not (args.assets or args.verify):
        lock = load_lock()
        for name, spec in MANIFEST.items():
            bundle = os.path.join(WEIGHTS, spec["bundle"])
            state = "READY" if os.path.exists(bundle) else "missing"
            pin = (spec.get("sha256") or spec.get("sha256_prefix")
                   or lock.get(name) or "TOFU (pinned on first fetch)")
            print(f"{name:18s} {state:8s} {spec['urls'][0]}")
            print(f"{'':18s} sha256: {pin}")
            if spec.get("note"):
                print(f"{'':18s} note: {spec['note']}")
        return 0

    names = (list(MANIFEST) if args.assets == ["all"] or not args.assets
             else args.assets)
    unknown = [n for n in names if n not in MANIFEST]
    if unknown:
        p.error(f"unknown asset(s) {unknown}; known: {list(MANIFEST)}")
    ok = True
    for name in names:
        if args.verify:
            src = os.path.join(DOWNLOADS, MANIFEST[name]["filename"])
            if not os.path.exists(src):
                print(f"[{name}] not downloaded")
                ok = False
                continue
            print(f"[{name}]")
            ok = check_digest(name, src, update_lock=False) and ok
        else:
            ok = process(name) and ok
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
