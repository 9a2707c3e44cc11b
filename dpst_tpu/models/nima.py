"""NIMA aesthetic scorer: MobileNetV1 backbone + 10-way score head.

TPU-native rebuild of the reference's aesthetics model (SURVEY.md §2
comp.11; "NIMA: Neural Image Assessment", Talebi & Milanfar, 2018):
MobileNet-224 feature extractor, global average pool, dropout-free
inference head with a 10-way softmax over quality scores 1..10; the
aesthetic score is the distribution mean. Drives the style-weight
auto-tuner (comp.12).

tpu-first: functional params, one jitted static-shape program at 224²,
bf16 convs / fp32 head, batch-friendly (the Γ-sweep scores all candidate
stylizations in a single batched forward).

Weights: `weights/nima_mobilenet.npz` if present (tools/convert_nima.py
drop-in; no network in this environment), else deterministic random init.
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

EVAL_SIZE = 224
N_BINS = 10
# MobileNetV1: (stride, out_channels) per depthwise-separable block
MB_BLOCKS = ((1, 64), (2, 128), (1, 128), (2, 256), (1, 256), (2, 512),
             (1, 512), (1, 512), (1, 512), (1, 512), (1, 512), (2, 1024),
             (1, 1024))
_DN = ("NHWC", "HWIO", "NHWC")


def _specs():
    specs = [("stem", "conv", 3, 32)]             # 3×3/2 full conv
    cin = 32
    for i, (_s, cout) in enumerate(MB_BLOCKS):
        specs.append((f"dw{i}", "dw", cin, cin))   # 3×3 depthwise
        specs.append((f"pw{i}", "conv", cin, cout))  # 1×1 pointwise
        cin = cout
    specs.append(("head", "dense", 1024, N_BINS))
    return specs


SPECS = _specs()


def init_params(seed: int = 0) -> dict:
    key = jax.random.PRNGKey(seed ^ 0xA11)
    params = {}
    for name, kind, cin, cout in SPECS:
        key, k = jax.random.split(key)
        if kind == "conv":
            w = jax.random.normal(k, (3 if name == "stem" else 1,) * 2
                                  + (cin, cout), jnp.float32)
            fan = w.shape[0] * w.shape[1] * cin
        elif kind == "dw":
            w = jax.random.normal(k, (3, 3, 1, cin), jnp.float32)
            fan = 9
        else:  # dense
            w = jax.random.normal(k, (cin, cout), jnp.float32)
            fan = cin
        params[name] = {
            "w": w * jnp.sqrt(2.0 / fan),
            "scale": jnp.ones((cout if kind != "dw" else cin,),
                              jnp.float32),
            "bias": jnp.zeros((cout if kind != "dw" else cin,),
                              jnp.float32),
        }
    return params


def load_params(path: str) -> dict:
    data = np.load(path)
    params = {}
    for name, kind, cin, cout in SPECS:
        params[name] = {k: jnp.asarray(data[f"{name}_{k}"], jnp.float32)
                        for k in ("w", "scale", "bias")}
    return params


def get_params(weights_path: str | None = None, seed: int = 0) -> dict:
    if weights_path is None:
        weights_path = os.environ.get(
            "DPST_NIMA_WEIGHTS",
            os.path.join(os.path.dirname(__file__), "..", "..",
                         "weights", "nima_mobilenet.npz"))
    if weights_path and os.path.exists(weights_path):
        return load_params(weights_path)
    return init_params(seed)


def _conv(p, x, stride=1, groups=1):
    w = p["w"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, w.shape, _DN),
        feature_group_count=groups, preferred_element_type=x.dtype)
    y = y * p["scale"].astype(y.dtype) + p["bias"].astype(y.dtype)
    return jnp.minimum(jnp.maximum(y, 0.0), 6.0)   # ReLU6 (MobileNet)


@partial(jax.jit, static_argnames=("compute_dtype",))
def backbone_features(params: dict, images: jnp.ndarray,
                      compute_dtype: str = "bfloat16") -> jnp.ndarray:
    """(B, 224, 224, 3) [0,255] RGB -> (B, 1024) GAP features."""
    cdt = jnp.dtype(compute_dtype)
    x = (images / 127.5 - 1.0).astype(cdt)        # MobileNet [-1, 1]
    x = _conv(params["stem"], x, stride=2)
    cin = 32
    for i, (stride, cout) in enumerate(MB_BLOCKS):
        x = _conv(params[f"dw{i}"], x, stride=stride, groups=cin)
        x = _conv(params[f"pw{i}"], x)
        cin = cout
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2))   # GAP (B, 1024)


@partial(jax.jit, static_argnames=("compute_dtype",))
def score_distribution(params: dict, images: jnp.ndarray,
                       compute_dtype: str = "bfloat16") -> jnp.ndarray:
    """(B, 224, 224, 3) [0,255] RGB -> (B, 10) score distribution."""
    feat = backbone_features(params, images, compute_dtype)
    logits = feat @ params["head"]["w"] * params["head"]["scale"] \
        + params["head"]["bias"]
    return jax.nn.softmax(logits, axis=-1)


def nima_score(params: dict, image: jnp.ndarray,
               compute_dtype: str = "bfloat16") -> jnp.ndarray:
    """Image(s) -> scalar aesthetic score(s): mean of the 1..10
    distribution. Accepts (H, W, 3) or (B, H, W, 3) at any resolution."""
    img = jnp.asarray(image, jnp.float32)
    squeeze = img.ndim == 3
    if squeeze:
        img = img[None]
    b = img.shape[0]
    x = jax.image.resize(img, (b, EVAL_SIZE, EVAL_SIZE, 3), "bilinear")
    dist = score_distribution(params, x, compute_dtype)
    scores = dist @ jnp.arange(1.0, N_BINS + 1.0, dtype=jnp.float32)
    return scores[0] if squeeze else scores
