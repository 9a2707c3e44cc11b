"""NIMA MobileNet vs an independently-built torch reference stack.

Synthesizes a checkpoint in the REAL public format — a Keras
save_weights H5 with keras.applications MobileNet layer names
(idealo/titu1994 `mobilenet_weights.h5`; reference_layouts.py, written
independently of tools/convert_nima.py) — converts it, and asserts the
jnp model's GAP features and score distribution match a torch fp64
functional forward implementing Keras MobileNet semantics (TF SAME
padding incl. the asymmetric strided case, ReLU6, BN eps 1e-3) from the
same arrays. VERDICT r1 #2: NIMA previously had only shape/range tests.
"""
import os
import subprocess
import sys

import numpy as np
import torch
import torch.nn.functional as F

from reference_layouts import NIMA_BLOCKS, keras_nima_arrays, \
    write_keras_h5

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bn(x, arrs, name, eps=1e-3):
    def g(w):
        return torch.from_numpy(arrs[f"{name}/{name}/{w}:0"]).double()
    shape = (1, -1, 1, 1)
    return (x - g("moving_mean").view(shape)) \
        / torch.sqrt(g("moving_variance").view(shape) + eps) \
        * g("gamma").view(shape) + g("beta").view(shape)


def _same_pad_s2(x):
    """TF SAME for stride-2 3x3 on even inputs: pad bottom/right only."""
    return F.pad(x, (0, 1, 0, 1))


def _torch_nima(arrs, img_np):
    """Keras MobileNetV1 + NIMA head, functional torch fp64 forward."""
    x = torch.from_numpy(img_np[None]).permute(0, 3, 1, 2).double()
    x = x / 127.5 - 1.0

    w = torch.from_numpy(
        arrs["conv1/conv1/kernel:0"]).permute(3, 2, 0, 1).double()
    x = F.conv2d(_same_pad_s2(x), w, None, stride=2)
    x = torch.clamp(_bn(x, arrs, "conv1_bn"), 0.0, 6.0)

    cin = 32
    for i, (stride, _cout) in enumerate(NIMA_BLOCKS, start=1):
        dw = torch.from_numpy(
            arrs[f"conv_dw_{i}/conv_dw_{i}/depthwise_kernel:0"]
        ).permute(2, 3, 0, 1).double()                   # (C,1,3,3)
        if stride == 2:
            x = F.conv2d(_same_pad_s2(x), dw, None, stride=2,
                         groups=cin)
        else:
            x = F.conv2d(x, dw, None, padding=1, groups=cin)
        x = torch.clamp(_bn(x, arrs, f"conv_dw_{i}_bn"), 0.0, 6.0)
        pw = torch.from_numpy(
            arrs[f"conv_pw_{i}/conv_pw_{i}/kernel:0"]
        ).permute(3, 2, 0, 1).double()
        x = F.conv2d(x, pw)
        x = torch.clamp(_bn(x, arrs, f"conv_pw_{i}_bn"), 0.0, 6.0)
        cin = x.shape[1]

    feat = x.mean(dim=(2, 3))                            # GAP (1, 1024)
    kernel = torch.from_numpy(arrs["dense/dense/kernel:0"]).double()
    bias = torch.from_numpy(arrs["dense/dense/bias:0"]).double()
    logits = feat @ kernel + bias
    return feat.numpy(), torch.softmax(logits, dim=-1).numpy()


def test_nima_matches_torch_keras_layout(tmp_path):
    from dpst_tpu.models import nima

    arrs = keras_nima_arrays(seed=9)
    src = str(tmp_path / "mobilenet_weights.h5")
    dst = str(tmp_path / "nima_mobilenet.npz")
    write_keras_h5(src, arrs)
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "convert_nima.py"),
         src, dst],
        capture_output=True, text=True,
        env=dict(os.environ, JAX_PLATFORMS="cpu"), cwd=REPO)
    assert res.returncode == 0, res.stderr[-1500:]
    params = nima.load_params(dst)

    r = np.random.default_rng(13)
    img = r.uniform(0, 255, (224, 224, 3)).astype(np.float32)

    feat_t, dist_t = _torch_nima(arrs, img)
    feat = np.asarray(nima.backbone_features(params, img[None],
                                             compute_dtype="float32"))
    dist = np.asarray(nima.score_distribution(params, img[None],
                                              compute_dtype="float32"))
    np.testing.assert_allclose(feat, feat_t, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(dist, dist_t, rtol=1e-3, atol=1e-5)
    assert abs(dist.sum() - 1.0) < 1e-5

    score = float(nima.nima_score(params, img, compute_dtype="float32"))
    expected = float((dist_t @ np.arange(1.0, 11.0))[0])
    assert abs(score - expected) < 5e-3


def test_nima_param_count_pin():
    """MobileNetV1(alpha=1) + 10-way head: conv/dense weight count pins
    the architecture (stem 864 + dw 9*Σcin=44,640 + pw ΣcinCout=
    3,139,584 + dense 10,240 = 3,195,328; BN folded to 21,908 affines).
    """
    from dpst_tpu.models import nima

    params = nima.init_params(seed=0)
    n_w = sum(int(np.prod(p["w"].shape)) for p in params.values())
    assert n_w == 3_195_328, n_w
    n_affine = sum(int(p["scale"].shape[0] + p["bias"].shape[0])
                   for p in params.values())
    assert n_affine == 21_908, n_affine
