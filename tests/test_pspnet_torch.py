"""PSPNet-50 vs an independently-built torch semseg reference stack.

The same bar test_vgg.py sets for VGG (VERDICT r1 #2): synthesize a
checkpoint in the REAL hszhao/semseg key layout (reference_layouts.py —
independent of tools/convert_pspnet.py's key map), convert it, and
assert per-stage activations match a torch fp64 functional forward that
implements semseg's architecture from the state dict directly. This
proves the converter key map, BN folding, residual/stride/dilation
wiring, adaptive pooling, and align_corners upsampling are
checkpoint-exact before any real weights exist to drop in.
"""
import subprocess
import sys
import os

import numpy as np
import torch
import torch.nn.functional as F

from reference_layouts import PSP_BINS, PSP_STAGES, semseg_pspnet_state

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bn(x, st, p, eps=1e-5):
    g = st[f"{p}.weight"].double()
    b = st[f"{p}.bias"].double()
    m = st[f"{p}.running_mean"].double()
    v = st[f"{p}.running_var"].double()
    shape = (1, -1, 1, 1)
    return (x - m.view(shape)) / torch.sqrt(v.view(shape) + eps) \
        * g.view(shape) + b.view(shape)


def _cbr(x, st, cp, bp, stride=1, pad=1, dil=1, relu=True):
    x = F.conv2d(x, st[f"{cp}.weight"].double(), None, stride=stride,
                 padding=pad, dilation=dil)
    x = _bn(x, st, bp)
    return F.relu(x) if relu else x


def _bottleneck(x, st, t, stride, dil, proj):
    idn = x
    y = _cbr(x, st, f"{t}.conv1", f"{t}.bn1", pad=0)
    y = _cbr(y, st, f"{t}.conv2", f"{t}.bn2", stride=stride, pad=dil,
             dil=dil)
    y = _cbr(y, st, f"{t}.conv3", f"{t}.bn3", pad=0, relu=False)
    if proj:
        idn = _cbr(x, st, f"{t}.downsample.0", f"{t}.downsample.1",
                   stride=stride, pad=0, relu=False)
    return F.relu(y + idn)


def _torch_pspnet(st, img_np):
    """semseg PSPNet50 functional forward (fp64, eval-mode BN)."""
    from dpst_tpu.models.pspnet import RGB_MEAN, RGB_STD

    x = torch.from_numpy(img_np[None]).permute(0, 3, 1, 2).double()
    mean = torch.tensor(RGB_MEAN, dtype=torch.float64).view(1, 3, 1, 1)
    std = torch.tensor(RGB_STD, dtype=torch.float64).view(1, 3, 1, 1)
    x = (x - mean) / std

    x = _cbr(x, st, "layer0.0", "layer0.1", stride=2)
    x = _cbr(x, st, "layer0.3", "layer0.4")
    x = _cbr(x, st, "layer0.6", "layer0.7")
    x = F.max_pool2d(x, 3, 2, padding=1)
    taps = {"stem": x}

    for li, (blocks, _c, stride, dil) in enumerate(PSP_STAGES, start=1):
        for b in range(blocks):
            x = _bottleneck(x, st, f"layer{li}.{b}",
                            stride=stride if b == 0 else 1,
                            dil=dil, proj=(b == 0))
        taps[f"res{li + 1}"] = x

    h, w = x.shape[2:]
    pooled = [x]
    for i, bin_ in enumerate(PSP_BINS):
        p = F.adaptive_avg_pool2d(x, bin_)
        p = _cbr(p, st, f"ppm.features.{i}.1", f"ppm.features.{i}.2",
                 pad=0)
        p = F.interpolate(p, size=(h, w), mode="bilinear",
                          align_corners=True)
        pooled.append(p)
    x = torch.cat(pooled, dim=1)
    taps["ppm"] = x
    x = _cbr(x, st, "cls.0", "cls.1")
    taps["fuse"] = x
    logits = F.conv2d(x, st["cls.4.weight"].double(),
                      st["cls.4.bias"].double())
    taps["logits"] = logits
    out = F.interpolate(logits, size=img_np.shape[:2], mode="bilinear",
                        align_corners=True)
    return out, {k: v[0].permute(1, 2, 0).numpy()
                 for k, v in list(taps.items()) + [("out", out)]}


def test_pspnet_matches_torch_semseg(tmp_path):
    from dpst_tpu.models import pspnet

    st = semseg_pspnet_state(seed=11)
    src = str(tmp_path / "pspnet50_ade20k.pth")
    dst = str(tmp_path / "pspnet50_ade20k.npz")
    torch.save(st, src)
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "convert_pspnet.py"),
         src, dst],
        capture_output=True, text=True,
        env=dict(os.environ, JAX_PLATFORMS="cpu"), cwd=REPO)
    assert res.returncode == 0, res.stderr[-1500:]
    params = pspnet.load_params(dst)

    # 89 keeps every strided op's SAME padding symmetric (odd inputs) and
    # the 12x12 feature grid divisible by every PPM bin.
    r = np.random.default_rng(4)
    img = r.uniform(0, 255, (89, 89, 3)).astype(np.float32)

    _, theirs = _torch_pspnet(st, img)
    out, taps = pspnet.forward(params, img[None],
                               compute_dtype="float32", return_taps=True)
    taps = {k: np.asarray(v)[0] for k, v in taps.items()}
    taps["out"] = np.asarray(out)[0]

    for name in ("stem", "res2", "res3", "res4", "res5", "ppm", "fuse",
                 "logits", "out"):
        a, b = taps[name], theirs[name]
        assert a.shape == b.shape, (name, a.shape, b.shape)
        scale = np.abs(b).max() + 1e-6
        err = np.abs(a - b).max() / scale
        assert err < 2e-3, f"{name}: rel err {err:.2e} (scale {scale:.3g})"


def test_pspnet_segment_runs_with_converted_weights(tmp_path):
    """segment() end to end on a converted bundle (argmax map sanity)."""
    from dpst_tpu.models import pspnet
    from tools.convert_pspnet import convert_torch

    st = {k: v for k, v in semseg_pspnet_state(seed=12).items()}
    data = convert_torch({k: v.numpy() for k, v in st.items()})
    npz = str(tmp_path / "b.npz")
    np.savez(npz, **data)
    params = pspnet.load_params(npz)
    r = np.random.default_rng(5)
    img = r.uniform(0, 255, (40, 56, 3)).astype(np.float32)
    seg = np.asarray(pspnet.segment(params, img, compute_dtype="float32"))
    assert seg.shape == (40, 56)
    assert seg.min() >= 0 and seg.max() < pspnet.N_CLASSES
