"""From-scratch VGG-19 feature extractor (jnp/XLA, NHWC, TPU-first).

TPU-native rebuild of the reference's VGG-19 feature tap network
(SURVEY.md §2 comp.2): forward pass to the post-ReLU activations of
conv1_1, conv2_1, conv3_1, conv4_1, conv5_1 (style) and conv4_2 (content),
with Caffe-style BGR + ImageNet-mean preprocessing.

Design notes (tpu-first, not a port):
  * pure functional params-dict + jnp ops — jit/vmap/grad compose freely;
  * convs run in a configurable compute dtype (bfloat16 by default on TPU)
    with fp32 accumulation via `preferred_element_type`, so the MXU does the
    FLOPs at full rate while feature/loss math stays fp32-accurate;
  * the stack is truncated at the deepest requested tap — conv5_2..conv5_4
    and pool5 are never built, saving ~15% of forward FLOPs;
  * weights: ImageNet `.npz` bundle if present (tools/convert_vgg.py),
    otherwise deterministic He-init from a fixed seed (documented weight-drop
    path — this environment has no network access; SURVEY.md §7 risks).
"""
from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

# VGG-19 convolutional topology: block -> (num convs, out channels).
VGG19_BLOCKS = ((2, 64), (2, 128), (4, 256), (4, 512), (4, 512))

# Canonical layer order, e.g. conv1_1, conv1_2, pool1, conv2_1, ...
LAYER_ORDER: tuple[str, ...] = tuple(
    name
    for b, (n, _) in enumerate(VGG19_BLOCKS, start=1)
    for name in [f"conv{b}_{i}" for i in range(1, n + 1)] + [f"pool{b}"]
)

CONV_SHAPES: dict[str, tuple[int, int]] = {}
_in_ch = 3
for _b, (_n, _out) in enumerate(VGG19_BLOCKS, start=1):
    for _i in range(1, _n + 1):
        CONV_SHAPES[f"conv{_b}_{_i}"] = (_in_ch, _out)
        _in_ch = _out

# Caffe/ImageNet channel means in BGR order (reference preprocessing).
BGR_MEANS = (103.939, 116.779, 123.68)

_DN = jax.lax.conv_dimension_numbers(
    (1, 8, 8, 3), (3, 3, 3, 64), ("NHWC", "HWIO", "NHWC"))


@jax.custom_vjp
def _pallas_conv(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,Cin)×(3,3,Cin,Cout) SAME conv on the Pallas kernel.

    VGG weights are constants of the image optimization, so the backward
    pass is ONLY the input gradient — the same kernel run with spatially
    flipped, in/out-transposed weights. Weight cotangents are zeros
    (DCE'd by XLA)."""
    from ..ops.conv_pallas import conv3x3_same
    return jax.vmap(conv3x3_same, in_axes=(0, None))(x, w)


def _pallas_conv_fwd(x, w):
    return _pallas_conv(x, w), w


def _pallas_conv_bwd(w, g):
    from ..ops.conv_pallas import conv3x3_same, flip_transpose_weights
    gx = jax.vmap(conv3x3_same, in_axes=(0, None))(
        g, flip_transpose_weights(w))
    return gx, jnp.zeros_like(w)


_pallas_conv.defvjp(_pallas_conv_fwd, _pallas_conv_bwd)


def _conv_raw(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=_DN,
        preferred_element_type=x.dtype)


@jax.custom_vjp
def _conv_flipvjp(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """XLA SAME 3×3 conv whose backward is ALSO a forward-form conv.

    Autodiff of `conv_general_dilated` emits a transposed-conv HLO for the
    input gradient; XLA's transposed-conv emitter measured ~32% MXU vs the
    forward emitter's ~50% at 512² (ARCHITECTURE.md round-2 profile). For a
    stride-1 SAME odd-kernel conv the input gradient is EXACTLY the same
    conv with spatially flipped, in/out-transposed weights, so routing the
    backward through the forward emitter is mathematically exact (weights
    are optimization constants — their cotangent is zero and DCE'd).

    Measured (tools/perf_lab.py, 512² full step, v5e): 114.8 vs 114.6 it/s
    — NEUTRAL. XLA already canonicalizes the transposed conv to this form;
    the bwd emitter's lower MXU% is inherent to the grad-chain's fused
    elementwise consumers, not the conv HLO. Kept opt-in for A/B use.
    """
    return _conv_raw(x, w)


def _conv_flipvjp_fwd(x, w):
    return _conv_raw(x, w), w


def _flip_transpose(w: jnp.ndarray) -> jnp.ndarray:
    """Input-gradient weights of a stride-1 SAME odd-kernel conv:
    spatially flipped, in/out channels transposed — (3,3,Cout,Cin)."""
    return w[::-1, ::-1].transpose(0, 1, 3, 2)


def _conv_flipvjp_bwd(w, g):
    return _conv_raw(g, _flip_transpose(w)), jnp.zeros_like(w)


_conv_flipvjp.defvjp(_conv_flipvjp_fwd, _conv_flipvjp_bwd)


# conv1_1's input gradient is a conv with THREE output channels (the
# image), which the TPU conv emitters run at ~1% MXU (profiler: the
# fused conv1_1-bwd op is >1 ms/step at 512² with s2b — the single
# largest op). Padding the flipped weight's out-channels to a
# lane-friendlier count trades redundant FLOPs for emitter efficiency.
_PADBWD_COUT = 16


@jax.custom_vjp
def _conv_padbwd(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    return _conv_raw(x, w)


def _conv_padbwd_fwd(x, w):
    return _conv_raw(x, w), w


def _conv_padbwd_bwd(w, g):
    gw = _flip_transpose(w)
    cin = gw.shape[3]
    pad = (-cin) % _PADBWD_COUT
    if pad:
        gw = jnp.pad(gw, ((0, 0), (0, 0), (0, 0), (0, pad)))
    gx = _conv_raw(g, gw)
    if pad:
        gx = gx[..., :cin]
    return gx, jnp.zeros_like(w)


_conv_padbwd.defvjp(_conv_padbwd_fwd, _conv_padbwd_bwd)


@jax.custom_vjp
def _conv_dotbwd(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """SAME 3×3 conv whose input gradient is ONE tall matmul.

    conv1_1's input gradient has 3 output channels — the transposed-conv
    emitter runs it at ~1% MXU (the 1.15 ms fusion.1067, the single
    largest op of the 512² step; padding channels to 16 measured
    neutral). This formulation sidesteps the conv emitters entirely:
      y(P, 27) = g(P, 64) · Wall(64, 9·3)   — M = every pixel (huge),
    K = 64, N = 27; then dx is nine shifted slice-adds of y's 3-channel
    groups (pure VPU). No transpose of the (B,H,W,64) cotangent is
    needed: P flattens its leading dims, which are already major in the
    conv layout. Weight gradient is skipped (VGG weights are frozen
    constants in style transfer — same contract as _conv_padbwd).
    """
    return _conv_raw(x, w)


def _conv_dotbwd_fwd(x, w):
    return _conv_raw(x, w), w


def _conv_dotbwd_bwd(w, g):
    b, h, wd, k = g.shape
    c = w.shape[2]
    # (K, 9·C): column block t = 3·dr+dc holds w[dr, dc]ᵀ
    wall = w.reshape(9, c, k).transpose(2, 0, 1).reshape(k, 9 * c)
    gp = jnp.pad(g, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.dot_general(
        gp.reshape(-1, k), wall, (((1,), (0,)), ((), ())),
        preferred_element_type=g.dtype)
    y = y.reshape(b, h + 2, wd + 2, 9, c)
    # dx[p, q, i] = Σ_{dr,dc} y[p+2−dr, q+2−dc, 3·dr+dc, i]
    gx = jnp.zeros((b, h, wd, c), y.dtype)
    for dr in range(3):
        for dc in range(3):
            gx = gx + y[:, 2 - dr:2 - dr + h, 2 - dc:2 - dc + wd,
                        3 * dr + dc]
    return gx, jnp.zeros_like(w)


_conv_dotbwd.defvjp(_conv_dotbwd_fwd, _conv_dotbwd_bwd)


def _resolve_conv11(conv_impl: str, x_shape) -> str:
    """How should conv1_1 lower? "" = the XLA conv emitter; "dotbwd" =
    emitter forward + tall-matmul input gradient; "dot11" = matmul both
    directions (explicit im2col forward).

    "auto" policy, from v5e full-step measurements (each repeated):
      * 512² (s2b strips, batch 8): dotbwd 142.4 vs dot11 139.8 vs
        emitter 134.4 it/s → strip-form picks "dotbwd";
      * 256² (batch 1, no strips): dot11 626.8 vs dotbwd 541.2 vs
        emitter 516.5 (+21%) → batch-1 picks "dot11";
      * 1024² strips: emitter 34.1 vs dotbwd 33.7 — the (H+2)(W+2)·27
        tap tensor's HBM traffic outgrows the emitter's inefficiency →
        ≥1024²-class pixel counts keep the emitter.
    Only conv1_1 qualifies (the narrow 3-channel end); explicit
    "dotbwd"/"dot11" override the gate."""
    b, h, w, c = x_shape
    if c >= _PADBWD_COUT:
        return ""
    if conv_impl in ("dotbwd", "dot11"):
        return conv_impl
    if conv_impl != "auto" or jax.default_backend() != "tpu":
        return ""
    if b * h * w >= 1024 * 1024:
        return ""
    return "dot11" if b == 1 else "dotbwd"


@jax.custom_vjp
def _conv_dot11(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """conv1_1 with BOTH directions as matmuls (no conv emitters).

    Forward: z(P, 64) = im2col(x)(P, 27) · w(27, 64) — the emitter runs
    the C_in=3 conv at a 27-deep contraction anyway (337 µs/step @512²,
    ~5× off memory speed-of-light); the explicit im2col keeps the same
    K but reaches it through plain slices + one tall dot. Backward: the
    _conv_dotbwd formulation. Weight gradient skipped (frozen VGG).
    """
    return _dot11_fwd_impl(x, w)


def _dot11_fwd_impl(x, w):
    b, h, wd, c = x.shape
    k = w.shape[3]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xtaps = jnp.concatenate(
        [xp[:, dr:dr + h, dc:dc + wd, :]
         for dr in range(3) for dc in range(3)], axis=-1)     # (B,H,W,9C)
    z = jax.lax.dot_general(
        xtaps.reshape(-1, 9 * c), w.reshape(9 * c, k),
        (((1,), (0,)), ((), ())), preferred_element_type=x.dtype)
    return z.reshape(b, h, wd, k)


def _conv_dot11_fwd(x, w):
    return _dot11_fwd_impl(x, w), w


_conv_dot11.defvjp(_conv_dot11_fwd, _conv_dotbwd_bwd)


def _use_pallas_conv(conv_impl: str, width: int, cin: int) -> bool:
    """"auto" resolves to XLA: the Pallas tap-matmul conv is validated
    and available (`conv_impl="pallas"`), but measured SLOWER in the full
    optimization step on v5e (86.6 it/s vs 106.5 at 512², and 84.6 when
    gated to the widest layers only) — XLA's conv algorithms beat the
    nine-tap matmul formulation even paying their relayout copies. Kept
    as an opt-in baseline for future kernel work."""
    if conv_impl == "pallas":
        return cin >= 8
    return False


def init_params(seed: int = 0, dtype=jnp.float32) -> dict:
    """Deterministic He-normal init of all 16 conv layers."""
    key = jax.random.PRNGKey(seed)
    params = {}
    for name, (cin, cout) in CONV_SHAPES.items():
        key, kw = jax.random.split(key)
        fan_in = 3 * 3 * cin
        w = jax.random.normal(kw, (3, 3, cin, cout), dtype) * jnp.sqrt(
            2.0 / fan_in)
        params[name] = {"w": w, "b": jnp.zeros((cout,), dtype)}
    return params


def load_params(path: str) -> dict:
    """Load a `.npz` weight bundle: keys `<layer>_w` (3,3,Cin,Cout) HWIO and
    `<layer>_b` (Cout,). Produced by tools/convert_vgg.py from torch/Keras
    checkpoints."""
    data = np.load(path)
    params = {}
    for name, (cin, cout) in CONV_SHAPES.items():
        w = jnp.asarray(data[f"{name}_w"], jnp.float32)
        b = jnp.asarray(data[f"{name}_b"], jnp.float32)
        if w.shape != (3, 3, cin, cout):
            raise ValueError(f"{name}: bad weight shape {w.shape}")
        params[name] = {"w": w, "b": b}
    return params


def get_params(weights_path: str | None = None, seed: int = 0) -> dict:
    """ImageNet weights if a bundle exists, else deterministic random init."""
    if weights_path is None:
        weights_path = os.environ.get(
            "DPST_VGG_WEIGHTS",
            os.path.join(os.path.dirname(__file__), "..", "..", "weights",
                         "vgg19.npz"))
    if weights_path and os.path.exists(weights_path):
        return load_params(weights_path)
    return init_params(seed)


def preprocess(image: jnp.ndarray) -> jnp.ndarray:
    """[0,255] RGB -> mean-subtracted BGR (Caffe convention)."""
    bgr = image[..., ::-1]
    return bgr - jnp.asarray(BGR_MEANS, image.dtype)


def _preprocess_noflip(image: jnp.ndarray) -> jnp.ndarray:
    """Mean subtraction only — the BGR channel flip is folded into
    conv1_1's weights inside extract_features instead.

    Why: the per-step image flip costs a lane-reversal op in BOTH the
    forward and the backward pass (~190 µs/step at 512² for the reverse
    of the image cotangent alone, profiler round 2), while flipping the
    3×3×3×64 conv1_1 weight's input channels is loop-invariant and
    hoisted out of the scan by XLA. conv over flipped weights of an
    unflipped image is exactly conv over the flipped image.
    """
    return image - jnp.asarray(BGR_MEANS[::-1], image.dtype)


def _upsample2(y: jnp.ndarray) -> jnp.ndarray:
    """2×2 nearest upsample of (B, h, w, C) -> (B, 2h, 2w, C).

    Formulated as a depthwise transposed conv (lhs_dilation=2, 2×2 ones
    kernel) rather than broadcast+reshape: on TPU the broadcast form
    materializes outside XLA's conv-emitter layouts and pays two 33 MB
    relayout copies per pool at 512² (profiler round 2: the pool-bwd
    cluster cost ~1.0 ms/step); the conv form stays inside the conv
    emitters end to end (+5 it/s on the full step). precision=HIGHEST
    keeps the single-term sums exact for fp32 inputs — default TPU fp32
    convs round through bf16 MXU passes and would corrupt the equality
    mask in the pool backward (CLAUDE.md rule 6).
    """
    b, h, w, c = y.shape
    ones = jnp.ones((2, 2, 1, c), y.dtype)
    return jax.lax.conv_general_dilated(
        y, ones, (1, 1), ((1, 1), (1, 1)), lhs_dilation=(2, 2),
        dimension_numbers=jax.lax.conv_dimension_numbers(
            y.shape, ones.shape, _DN),
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=y.dtype)


def _downsample2_sum(m: jnp.ndarray) -> jnp.ndarray:
    """Non-overlapping 2×2 window sums as a strided depthwise conv
    (same conv-emitter-layout rationale as _upsample2)."""
    b, h, w, c = m.shape
    ones = jnp.ones((2, 2, 1, c), m.dtype)
    return jax.lax.conv_general_dilated(
        m, ones, (2, 2), "VALID",
        dimension_numbers=jax.lax.conv_dimension_numbers(
            m.shape, ones.shape, _DN),
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=m.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _maxpool2(x: jnp.ndarray, pool_impl: str = "xla") -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def _maxpool2_fwd(x, pool_impl):
    y = _maxpool2(x, pool_impl)
    return y, (x, y)


def _maxpool2_bwd(pool_impl, res, g):
    """Max-pool gradient as pure elementwise math.

    XLA's native max-pool transpose lowers to `select_and_scatter`, which
    measured at ~20% of the whole optimization step on v5e. Instead:
    re-find the max by comparing the input with the upsampled output and
    split the cotangent equally among tied positions (a window of equal
    values shares the gradient — ties get g/n_ties rather than
    first-index-takes-all; total gradient mass is identical and flat
    image regions behave better numerically).

    On TPU at block-1 sizes the whole computation runs as one fused
    Pallas VPU kernel (ops/pool_pallas.py) — the XLA lowering spends
    ~1 ms/step at 512² materializing the two 2× upsample broadcasts.
    """
    from ..ops import pool_pallas

    x, y = res
    b, h2, w2, c = y.shape
    if (pool_pallas.use_pallas((1, b * x.shape[1], x.shape[2], x.shape[3]),
                               pool_impl)
            and x.shape[1] == 2 * h2 and x.shape[2] == 2 * w2):
        # batch (s2b strips) folds into rows for free: strip heights are
        # even, so 2×2 windows never straddle the fold boundary and the
        # folded call computes exactly the per-strip gradients
        gx = pool_pallas.maxpool2_bwd_pallas(
            x.reshape(1, b * 2 * h2, 2 * w2, c),
            y.reshape(1, b * h2, w2, c),
            g.reshape(1, b * h2, w2, c))
        return (gx.reshape(x.shape),)
    xc = x[:, : 2 * h2, : 2 * w2, :]
    mask = (xc == _upsample2(y)).astype(g.dtype)
    if pool_impl == "noties":
        # every tied max position receives the FULL cotangent (TF/XLA's
        # select_and_scatter instead picks the first tie; equal-split is
        # this repo's default) — drops the tie-count conv + divide on the
        # largest activation tensors; any of the three is a valid
        # subgradient of the max. Measured SLOWER despite fewer ops
        # (109.5 vs 114.6 it/s, tools/perf_lab.py): removing the conv
        # perturbs XLA's fusion/layout choices for the worse — opt-in.
        gx = mask * _upsample2(g)
    else:
        ties = _downsample2_sum(mask)
        gx = mask * _upsample2(g / jnp.maximum(ties, 1.0))
    pad_h = x.shape[1] - 2 * h2
    pad_w = x.shape[2] - 2 * w2
    if pad_h or pad_w:  # odd trailing row/col never entered the pool
        gx = jnp.pad(gx, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    return (gx,)


_maxpool2.defvjp(_maxpool2_fwd, _maxpool2_bwd)


def _pool(x: jnp.ndarray, kind: str, pool_impl: str = "xla") -> jnp.ndarray:
    if kind == "max":
        return _maxpool2(x, pool_impl)
    # average pooling (Gatys-style alternative)
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return s * 0.25


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _maxpool2_withy(x: jnp.ndarray, y: jnp.ndarray,
                    pool_impl: str = "xla") -> jnp.ndarray:
    """`_maxpool2` with the pooled value passed IN as a residual.

    Same tie-splitting backward as `_maxpool2_bwd`, but `y` arrives as
    an argument instead of being produced inside the custom-VJP fwd —
    so under a `save_only_these_names` remat policy the caller can
    checkpoint_name the (stop-gradiented) pooled value and the backward
    reads it instead of RE-RUNNING the reduce-window (17.8 ms/step of
    the 4096² streamed step's remat, round-3 trace). Callers must pass
    y == reduce_window_max(x) (see `_pool_save_y`)."""
    return y


def _maxpool2_withy_fwd(x, y, pool_impl):
    return y, (x, y)


def _maxpool2_withy_bwd(pool_impl, res, g):
    (gx,) = _maxpool2_bwd(pool_impl, res, g)
    return gx, jnp.zeros_like(res[1])


_maxpool2_withy.defvjp(_maxpool2_withy_fwd, _maxpool2_withy_bwd)


def _pool_save_y(x: jnp.ndarray, kind: str, pool_impl: str,
                 save_name: str) -> jnp.ndarray:
    """`_pool` whose max-pool RESULT is a named saveable for remat
    policies: the tie backward's `y` residual resolves to the saved
    value, so no reduce-window re-run appears in the rematted
    computation. Average pooling is linear (no residuals) — unchanged.
    Bit-identical outputs and gradients to `_pool` in every mode."""
    if kind != "max":
        return _pool(x, kind, pool_impl)
    y = jax.lax.stop_gradient(jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"))
    y = checkpoint_name(y, save_name)
    return _maxpool2_withy(x, y, pool_impl)


# Activation. jnp.maximum(x, 0)'s general VJP splits the cotangent
# across exact ties (2 compares + 2 selects + a divide fused into every
# conv backward), where jax.nn.relu's custom JVP (∇relu(0) = 0) is one
# compare+select. A same-session A/B at 512² measured them IDENTICAL
# (148.95/149.02 vs 148.94/148.92 it/s) — the extra tie ops ride free
# inside bandwidth-bound fusions on data already in registers — so the
# default keeps maximum's tie-split subgradient, the convention every
# golden/parity artifact in this repo was pinned under.
def _relu(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(x, 0.0)


# Manual space-to-batch of blocks 1-2: input halo rows per strip. 8 is
# exactly sufficient for every row consumed downstream to be computed
# from real data through conv1_1..conv2_2+pool2 (validity chain:
# conv1_1 ±1, conv1_2 ±1, pool1 ÷2, conv2_1 ±2, conv2_2 ±2, pool2 ÷2).
_S2B_HALO = 8


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _s2b_stack(x0: jnp.ndarray, strips: int) -> jnp.ndarray:
    """(H, W, C) image -> (S, hs+2·halo, W, C) overlapping row strips.

    Forward is the plain stack-of-slices of the zero-padded image (strip
    i covers padded rows [i·hs, i·hs+hs+16)). The custom VJP exists for
    the BACKWARD: autodiff of stack+slice lowers to an S-way split whose
    pad-add chain XLA turns into kLoop fusions with S separate
    (1, hs+16, W, C) outputs in the 3-lane T(4,128) layout — measured
    16.1 ms/step at 2048² (fusion.982/983, 11% of the step) for 31 MB
    of actual data. The explicit overlap-add below is bandwidth-formed:
    each padded-image row receives at most TWO contributions (one
    strip's "own" rows — a pure (S·hs, W, C) reshape — and one
    neighbor's 2·halo overlap rows — one pad + reshape + shifted add),
    and a two-term fp add is commutative, so the result is bit-identical
    to the autodiff split regardless of its accumulation order.
    """
    hs = x0.shape[0] // strips
    h0 = _S2B_HALO
    xp = jnp.pad(x0, ((h0, h0), (0, 0), (0, 0)))
    return jnp.stack([
        jax.lax.slice_in_dim(xp, i * hs, i * hs + hs + 2 * h0, axis=0)
        for i in range(strips)])


def _s2b_stack_fwd(x0, strips):
    return _s2b_stack(x0, strips), x0.shape[0]


def _s2b_stack_bwd(strips, h, dstrips):
    s, l, w, c = dstrips.shape
    h0 = _S2B_HALO
    hs = l - 2 * h0
    # "own" rows: strip i's rows [0, hs) land at padded rows
    # [i·hs, (i+1)·hs) — disjoint, tiling [0, h): a pure reshape.
    a = dstrips[:, :hs].reshape(s * hs, w, c)
    # overlap rows: strip i's rows [hs, hs+2·h0) land at padded rows
    # [(i+1)·hs, (i+1)·hs + 2·h0) — disjoint across i because
    # hs >= 4·h0 (_s2b_enabled): pad each block back to hs rows and
    # reshape; the flat tensor then covers padded rows [hs, hs+s·hs),
    # of which only [hs, h+2·h0) intersect the padded image (the rest
    # is the last block's zero padding).
    b = jnp.pad(dstrips[:, hs:],
                ((0, 0), (0, hs - 2 * h0), (0, 0), (0, 0)))
    b = b.reshape(s * hs, w, c)[:h + 2 * h0 - hs]
    dxp = (jnp.pad(a, ((0, 2 * h0), (0, 0), (0, 0)))
           + jnp.pad(b, ((hs, 0), (0, 0), (0, 0))))
    return (dxp[h0:h0 + h],)


_s2b_stack.defvjp(_s2b_stack_fwd, _s2b_stack_bwd)


@jax.tree_util.register_pytree_node_class
class StripTap:
    """A block-1/2 tap left in strip form (extract_features strip_taps).

    `data` is (S, own+2·halo, W, C); rows [halo, halo+own) of strip i are
    global rows [i·own, (i+1)·own) — `data[:, halo:halo+own].reshape` IS
    the plain tap. Keeping the strip form lets the masked-Gram consume
    the tensor without the interior-slice copy: `strip_masks` lays the
    per-class masks out in the same geometry with halo rows ZEROED, so
    halo pixels (duplicated across strips) carry zero Gram weight and
    zero cotangent — the Gram and its gradient are exactly those of the
    sliced tap.

    (halo, own) are pytree AUX data, not leaves — they are shape
    metadata and must stay concrete through jit boundaries.

    Status: validated but NOT used by the hot loop — measured 127.4 vs
    134.3 it/s on the 512² full step and 33.35 vs 33.85 at 1024² (the
    Gram contraction grows by the ~25% halo rows, which costs more than
    the interior-slice copies it removes — even at 1024² where those
    copies are ~2.8 ms/step, because the slice relayout largely fuses
    with the Gram's own (P, C) relayout). Kept as an opt-in
    (`extract_features(strip_taps=True)`) with tests, mirroring the
    other measured-negative lowerings.
    """

    def __init__(self, data: jnp.ndarray, halo: int, own: int):
        self.data = data
        self.halo = halo
        self.own = own

    def tree_flatten(self):
        return (self.data,), (self.halo, self.own)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)

    def plain(self) -> jnp.ndarray:
        """Materialize the equivalent (H, W, C) tap (tests/debug)."""
        s, _, w, c = self.data.shape
        t = self.data[:, self.halo:self.halo + self.own]
        return t.reshape(s * self.own, w, c)


def perm_flatten(tap: "StripTap") -> jnp.ndarray:
    """StripTap -> (P, C) features flattened in the conv layout's order.

    Slices the interior rows (a contiguous chunk of the major-most
    physical dim — free) and flattens pixels as (row, col, strip)
    instead of the image order (strip, row, col). On TPU the strip
    tensors live in the conv-emitter layout {3,0,2,1} (memory order
    rows, W, strips, C with the (strips, C) pair in the sublane×lane
    tile), so `transpose(1, 2, 0, 3)` is layout-order and the reshape
    to (P, C) is a pure bitcast whenever the strip count is a multiple
    of the 8-row sublane tile — the masked Gram then reads the tap with
    NO relayout copy (the image-order flatten pays two 33 MB copies per
    step at 512² block 1; ARCHITECTURE.md round 3). Pair with
    `perm_masks` — the Gram sum is pixel-permutation-invariant, so any
    consistent order is exact.
    """
    t = tap.data[:, tap.halo:tap.halo + tap.own]
    s, r, w, c = t.shape
    return t.transpose(1, 2, 0, 3).reshape(r * w * s, c)


def perm_masks(mask: jnp.ndarray, strips: int) -> jnp.ndarray:
    """(K, H, W) layer masks -> (K, P) in `perm_flatten`'s pixel order.

    Global row s·own + r maps to flat index (r·W + w)·S + s. Masks are
    loop-invariant constants, so XLA hoists this out of the
    optimization scan — the permutation costs nothing per step.
    """
    k, h, w = mask.shape
    own = h // strips
    m = mask.reshape(k, strips, own, w)
    return m.transpose(0, 2, 3, 1).reshape(k, own * w * strips)


def perm_flatten_halo(tap: "StripTap") -> jnp.ndarray:
    """`perm_flatten` WITHOUT the interior slice: the full (S, own+2h,
    W, C) strip tensor flattened in layout order — always a bitcast.

    Pair with `perm_masks_halo`, which zeroes every halo row's weight:
    halo pixels (duplicated across strips) then carry zero Gram weight
    AND zero cotangent, so the Gram is exactly the sliced tap's. The
    trade: the weighted block grows by the 2h/own halo fraction (+25%
    at 64-row strips), but the 33 MB sliced-activation materialization
    (slice.606 + its backward pad in the round-3 trace) disappears —
    both the Gram and the next conv read the ORIGINAL tensor.
    """
    s, rf, w, c = tap.data.shape
    return tap.data.transpose(1, 2, 0, 3).reshape(rf * w * s, c)


def perm_masks_halo(mask: jnp.ndarray, strips: int, halo: int
                    ) -> jnp.ndarray:
    """(K, H, W) layer masks -> (K, P) in `perm_flatten_halo`'s pixel
    order, with zeros in every halo row. Loop-invariant, hoisted."""
    k, h, w = mask.shape
    own = h // strips
    m = mask.reshape(k, strips, own, w)
    m = jnp.pad(m, ((0, 0), (0, 0), (halo, halo), (0, 0)))
    return m.transpose(0, 2, 3, 1).reshape(k, (own + 2 * halo) * w * strips)


def strip_masks(mask: jnp.ndarray, halo: int, own: int) -> jnp.ndarray:
    """(K, H, W) layer masks -> (K, S·(own+2·halo), W) strip-form masks
    with zeros in every halo row (see StripTap). Loop-invariant given
    the mask constants — XLA hoists it out of the optimization scan."""
    k, h, w = mask.shape
    s = h // own
    m = mask.reshape(k, s, own, w)
    m = jnp.pad(m, ((0, 0), (0, 0), (halo, halo), (0, 0)))
    return m.reshape(k, s * (own + 2 * halo), w)


# ---------------------------------------------------------------------------
# Space-to-depth block 1 (round-3 conv campaign #7).
#
# Block-1 convs are 64-channel 3×3s — XLA's conv emitter runs them at
# ~16% MXU (the contraction depth and the 64-of-128 output lanes both
# underfill the systolic array; round-3 trace: conv1_2 fwd+bwd ≈ 850
# µs/step of the 5.86 ms 512² step). In space-to-depth form the same
# arithmetic is a 2×2 conv over 4×-packed channels (12→256, 256→256):
# measured 46-48 useful TF/s vs 28-32 for the 3×3 forms (scan-amortized
# A/B on v5e) — the 16/9 structural-zero tap inflation is cheaper than
# the underfilled MXU. Block 2 measured the OPPOSITE (51 vs 56-64 TF/s
# at 128→512 channels), so only block 1 transforms.
#
# Grid scheme (what makes it exact with zero inter-conv relayouts): a
# stride-1 3×3 conv maps between HALF-CELL-SHIFTED s2d grids. With
# input cells holding pixel pairs {2i, 2i+1} ("aligned") and output
# slots (o, p) holding pixel 2o+p−1 ("odd", one garbage slot per edge),
# every tap of output pixel r = 2o+p−1 lies in input cells {o−1, o} —
# a 2×2 VALID conv. The same index map (dy = 2u+a−p) takes the odd grid
# back to aligned, so conv1_1 (aligned→odd) and conv1_2 (odd→aligned)
# chain directly, and pool1's 2×2 stride-2 windows coincide with the
# aligned output cells — the pool is a free max over the 4 parity
# channel groups, landing bit-in-place on the post-pool1 strip tensor
# the rest of the network already consumes.
#
# conv1_1 itself never builds the input cell grid: a 2×2 conv over
# 4×-packed pixels is arithmetically a stride-2 4×4 conv on the RAW
# image (z1[o, (p, co)] = Σ_t w3[t−p]·x[2o+t−2], t = p+d ∈ [0, 4)) —
# same 48-deep contraction, and the pixel→cell packing the emitter
# would otherwise need as an explicit op (measured 8 × 44 µs/step of
# 6-D transposes fused into the strip stack at 512²) happens inside
# its own input windowing instead (_s2d_kernel4).
# ---------------------------------------------------------------------------


def _s2d_kernel(w3: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Ci, Co) stride-1 SAME kernel -> its (2, 2, 4Ci, 4Co) s2d
    form between half-cell-shifted grids.

    Input channel (ay·2+ax)·Ci+ci holds parity (ay, ax) of the input
    cell; output channel (py·2+px)·Co+co holds output pixel parity.
    Tap (u, a, p) corresponds to original offset d = 2u+a−p; the seven
    (of sixteen) combinations with d outside [0, 2] are structural
    zeros. Loop-invariant given the weights — built once per dispatch.
    """
    ci, co = w3.shape[2], w3.shape[3]
    zero = jnp.zeros((ci, co), w3.dtype)
    cells = []
    for uy in range(2):
        for ux in range(2):
            rows = []
            for ay in range(2):
                for ax in range(2):
                    cols = []
                    for py in range(2):
                        for px in range(2):
                            dy, dx = 2 * uy + ay - py, 2 * ux + ax - px
                            cols.append(
                                w3[dy, dx]
                                if 0 <= dy <= 2 and 0 <= dx <= 2 else zero)
                    rows.append(jnp.concatenate(cols, axis=1))   # (ci, 4co)
            cells.append(jnp.concatenate(rows, axis=0))          # (4ci, 4co)
    return jnp.stack(cells).reshape(2, 2, 4 * ci, 4 * co)


def _s2d_kernel4(w3: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Ci, Co) stride-1 SAME kernel -> the (4, 4, Ci, 4Co)
    stride-2 kernel that produces the ODD s2d grid directly from the
    pixel image: z1[o, (p, co)] = Σ_d w3[d]·x[2o+p+d−2] = Σ_t
    w3[t−p]·x[2o+t−2] with t = p+d, i.e. a stride-2 VALID conv over the
    image padded by 2 on each side. Entries with t−p outside [0, 2] are
    structural zeros (7 of 16 per axis pair, same density as
    _s2d_kernel); output channel order (py·2+px)·Co+co matches the odd
    grid every downstream consumer expects."""
    ci, co = w3.shape[2], w3.shape[3]
    zero = jnp.zeros((ci, co), w3.dtype)
    rows = []
    for ty in range(4):
        cols_t = []
        for tx in range(4):
            cols = []
            for py in range(2):
                for px in range(2):
                    dy, dx = ty - py, tx - px
                    cols.append(w3[dy, dx]
                                if 0 <= dy <= 2 and 0 <= dx <= 2 else zero)
            cols_t.append(jnp.concatenate(cols, axis=1))   # (ci, 4co)
        rows.append(jnp.stack(cols_t))                      # (4, ci, 4co)
    return jnp.stack(rows)                                  # (4, 4, ci, 4co)


# conv1_1's K4 input-gradient form: matmul (_k4_conv) below this pixel
# count, the transposed-conv emitter above (same-process A/B at the
# gate decision points; see _block1_s2d)
_K4_MATMUL_BWD_MAX = 2 ** 20
# Separate crossover for dispatches INSIDE the stream12 strip scan: 0 =
# the matmul dx never wins there (round-5 chip A/B @4096², 144-row
# strips ≈ 2^19.2 px: 1.402 vs 1.419 it/s — measured-negative despite
# sitting far below the image-level crossover; see _block1_s2d). No
# measured regime where the in-scan matmul dx wins; re-A/B if the strip
# geometry regime changes (the hs=128 flip lesson — gate verdicts don't
# outlive the regime they were measured in).
_K4_MATMUL_BWD_MAX_STRIP = 0


@jax.custom_vjp
def _k4_conv(x: jnp.ndarray, k4: jnp.ndarray) -> jnp.ndarray:
    """conv1_1 in K4 form (stride-2 4×4, pixels -> odd s2d grid) whose
    input gradient avoids the transposed-conv emitter.

    The emitter's dx is a 3-output-channel transposed conv that lands in
    a batch-minor T(4,128) layout — the single largest op of the step
    (758 µs @512², 3.88 ms @1024², round-3 trace). Here instead:
      y(P, 48) = g(P, 256) · K4ᵀ(256, 48)        — one tall MXU matmul
      dcell    = Σ_{a,b∈{0,1}} y[a:, b:] · Sel_ab — four 0/1 SELECTION
                 matmuls (48 -> 12 tap-to-cell reduction fused with the
                 shifted slice; CLAUDE.md rule 9's even/odd trick)
      dx       = cell -> pixel unpack (one 6-D transpose)
    Weight gradient is skipped (frozen VGG, same contract as
    _conv_dotbwd)."""
    return jax.lax.conv_general_dilated(
        x, k4, (2, 2), ((2, 2), (2, 2)), dimension_numbers=_DN,
        preferred_element_type=x.dtype)


def _k4_conv_fwd(x, k4):
    return _k4_conv(x, k4), (k4, x.shape)


def _k4_sel(dt) -> jnp.ndarray:
    """(2, 2, 48, 12) 0/1 selection: Sel[a, b, (ty·4+tx)·3+c,
    (py·2+px)·3+c] = 1 iff ty = py + 2(1−a), tx = px + 2(1−b)."""
    s = np.zeros((2, 2, 48, 12), np.float32)
    for a in range(2):
        for b in range(2):
            for py in range(2):
                for px in range(2):
                    ty, tx = py + 2 * (1 - a), px + 2 * (1 - b)
                    for c in range(3):
                        s[a, b, (ty * 4 + tx) * 3 + c,
                          (py * 2 + px) * 3 + c] = 1.0
    return jnp.asarray(s, dt)


def _k4_conv_bwd(res, g):
    k4, x_shape = res
    sN, r_img, w_img = x_shape[0], x_shape[1], x_shape[2]
    kk = k4.shape[3]
    # (256, 48): column (ty·4+tx)·3+c holds k4[ty, tx, c]ᵀ
    wall = k4.reshape(48, kk).T
    y = jax.lax.dot_general(
        g.reshape(-1, kk), wall, (((1,), (0,)), ((), ())),
        preferred_element_type=g.dtype).reshape(g.shape[:3] + (48,))
    sel = _k4_sel(g.dtype)
    m, n = r_img // 2, w_img // 2
    dcell = None
    for a in range(2):
        for b in range(2):
            # Sel[a, b] selects ty = py + 2(1−a): ty = py reads cell
            # o = m+1 (a = 1), ty = py+2 reads o = m (a = 0) — the
            # slice offset IS a (resp. b on columns)
            t = jax.lax.dot_general(
                y[:, a:a + m, b:b + n], sel[a, b],
                (((3,), (0,)), ((), ())),
                preferred_element_type=g.dtype)
            dcell = t if dcell is None else dcell + t
    dx = (dcell.reshape(sN, m, n, 2, 2, 3)
          .transpose(0, 1, 3, 2, 4, 5).reshape(sN, r_img, w_img, 3))
    return dx, jnp.zeros_like(k4)


_k4_conv.defvjp(_k4_conv_fwd, _k4_conv_bwd)


def _s2d_cells(x: jnp.ndarray) -> jnp.ndarray:
    """(B, R, W, C) -> aligned s2d cells (B, R/2, W/2, 4C); channel
    order (py·2+px)·C+c."""
    b, r, w, c = x.shape
    return (x.reshape(b, r // 2, 2, w // 2, 2, c)
            .transpose(0, 1, 3, 2, 4, 5).reshape(b, r // 2, w // 2, 4 * c))


def _s2d_conv(x: jnp.ndarray, k: jnp.ndarray, cdt) -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "VALID", dimension_numbers=_DN,
        preferred_element_type=cdt)


def _s2d_zero_oob(t: jnp.ndarray, off: int, base, hi: int,
                  w_img: int) -> jnp.ndarray:
    """Zero slots whose pixel lies beyond the image (the s2d analogue of
    _zero_oob, plus the odd grid's garbage edge slots). Slot (o, p) on a
    grid with offset `off` holds local pixel 2o+p+off; global row =
    base[b] + local. The row/column validity masks are integer-arange
    constants XLA folds outside the scan; the two broadcasts fuse into
    the conv epilogue (no (…, 2, 2, C) reshape of the activation)."""
    s, nr, nc, c4 = t.shape
    c = c4 // 4
    lr = 2 * jnp.arange(nr)[:, None] + jnp.arange(2)[None, :] + off
    gr = jnp.asarray(base)[:, None, None] + lr[None]          # (S, nr, 2)
    okr = (gr >= 0) & (gr < hi)
    lc = 2 * jnp.arange(nc)[:, None] + jnp.arange(2)[None, :] + off
    okc = (lc >= 0) & (lc < w_img)                            # (nc, 2)
    pyc = jnp.arange(c4) // (2 * c)           # channel -> row parity
    pxc = (jnp.arange(c4) // c) % 2           # channel -> col parity
    rm = okr[:, :, pyc]                                       # (S, nr, 4C)
    cm = okc[:, pxc]                                          # (nc, 4C)
    return t * rm[:, :, None, :].astype(t.dtype) * cm[None, None].astype(
        t.dtype)


@jax.tree_util.register_pytree_node_class
class S2dTap:
    """A block-1 tap left in s2d grid form (extract_features block1_impl
    ="s2d"). `data` is (S, nr, nc, 4C); slot (o, p) of strip s holds the
    activation at local pixel 2o+p+off (off = −1 for the odd grid that
    conv1_1 produces, 0 for the aligned grid of conv1_2). Consume via
    s2d_flatten + s2d_masks (the masked Gram is pixel-permutation-
    invariant, and halo / beyond-image / garbage slots carry zero mask
    weight — so the Gram and its gradient are exactly the plain tap's).
    halo_px/own_px are strip metadata in PIXELS (0/R for a plain batch).
    """

    def __init__(self, data, off: int, halo_px: int, own_px: int,
                 w_img: int, strip: bool = True, bias=None):
        self.data = data
        self.off = off
        self.halo_px = halo_px
        self.own_px = own_px
        self.w_img = w_img
        self.strip = strip
        # RAW taps carry the conv bias and cook (bias + ReLU) at the
        # point of consumption: sharing the COOKED activation between
        # conv1_2 and the Gram made XLA place the epilogue in the
        # Gram's layout and relayout-copy it both ways, fwd and bwd
        # (~0.46 ms/step in the round-3 trace). With the raw tensor as
        # the only shared value, each consumer fuses its own epilogue
        # in its own layout. Boundary zeroing is NOT applied here: the
        # Gram's mask weights are zero at every halo/garbage/oob slot,
        # which zeroes both the contribution and the cotangent.
        self.bias = bias

    def tree_flatten(self):
        return (self.data, self.bias), (self.off, self.halo_px,
                                        self.own_px, self.w_img,
                                        self.strip)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux, bias=children[1])

    def _cooked(self) -> jnp.ndarray:
        if self.bias is None:
            return self.data
        return _relu(self.data + self.bias)

    def plain(self) -> jnp.ndarray:
        """Materialize the equivalent image-order tap: (H, W, C) for
        strip form, (B, H, W, C) for a plain batch (tests/debug).
        The interior slice keeps only globally valid pixels, so the
        cooked raw tensor needs no boundary zeroing."""
        d = self._cooked()
        s, nr, nc, c4 = d.shape
        c = c4 // 4
        t = (d.reshape(s, nr, nc, 2, 2, c)
             .transpose(0, 1, 3, 2, 4, 5).reshape(s, 2 * nr, 2 * nc, c))
        r0, c0 = self.halo_px - self.off, -self.off
        t = t[:, r0:r0 + self.own_px, c0:c0 + self.w_img]
        if self.strip:
            return t.reshape(s * self.own_px, self.w_img, c)
        return t


def s2d_flatten(tap: "S2dTap") -> jnp.ndarray:
    """S2dTap -> (P, C) rows for the fused masked Gram (losses.
    masked_grams_flat). Slices the row cells down to the smallest range
    covering the strip interior (the odd grid's interior boundary
    straddles cells, so one halo pixel per edge stays in — zero-weighted
    by s2d_masks; +3.5% block vs the exact interior, against the 25%
    the halo-keeping variants pay) and flattens (strip, row-cell,
    col-cell, parity) — a plain row-major reshape of the conv output.
    """
    d = tap._cooked()
    if tap.halo_px:
        o0 = tap.halo_px // 2
        d = d[:, o0:o0 + tap.own_px // 2 + (1 if tap.off else 0)]
    s, nr, nc, c4 = d.shape
    return d.reshape(s * nr * nc * 4, c4 // 4)


def s2d_masks(mask: jnp.ndarray, strips: int, halo_px: int,
              off: int = -1) -> jnp.ndarray:
    """(K, H, W) layer masks -> (K, P) in s2d_flatten's slot order for a
    tap on the grid with offset `off` (−1 = odd, the conv1_1 grid; 0 =
    aligned, conv1_2's), with zeros at halo, beyond-image and garbage
    slots. Loop-invariant given the mask constants — hoisted out of the
    optimization scan."""
    k, h, w = mask.shape
    own = h // strips
    m = mask.reshape(k, strips, own, w)
    # rows: cover local pixels off .. own+2·halo−1−off (halo zeros, plus
    # the odd grid's garbage row per edge); cols: pixels off .. w−1−off
    g = 1 if off else 0
    m = jnp.pad(m, ((0, 0), (0, 0), (halo_px + g, halo_px + g), (g, g)))
    r2, w2 = m.shape[2], m.shape[3]
    m = (m.reshape(k, strips, r2 // 2, 2, w2 // 2, 2)
         .transpose(0, 1, 2, 4, 3, 5))        # (K, S, ro, co, py, px)
    o0 = halo_px // 2
    m = m[:, :, o0:o0 + own // 2 + g]
    return m.reshape(k, -1)


def s2d_flatten_par(tap: "S2dTap") -> list:
    """S2dTap -> four (P, C) parity slices for the multi-part masked
    Gram (losses.masked_grams_flat_multi). Each slice is 64 lanes of
    the 4C channel dim plus a leading-dims-only collapse — no
    lane-regrouping reshape (the interleaved s2d_flatten measured
    ~0.9 ms/step of relayout copies in the round-3 trace; the parity
    slices keep the conv output's own minor dim). Pair with
    s2d_masks_par (reshaped flat); the Gram sum splits over any pixel
    partition, so the per-parity split is exact. Row cells are sliced
    to the smallest interior-covering range as in s2d_flatten. The hot
    loop instead uses s2d_slices_par + the nd Gram (even the
    leading-dims reshape here costs slice copies)."""
    d = tap.data
    if tap.halo_px:
        o0 = tap.halo_px // 2
        d = d[:, o0:o0 + tap.own_px // 2 + (1 if tap.off else 0)]
    s, nr, nc, c4 = d.shape
    c = c4 // 4
    return [d[..., i * c:(i + 1) * c].reshape(s * nr * nc, c)
            for i in range(4)]


def s2d_slices_par(tap: "S2dTap") -> list:
    """S2dTap -> four UNFLATTENED (S, nr, nc, C) parity lane-slices for
    the nd masked Gram (losses.masked_grams_nd_multi) — the dot
    contracts the pixel dims in place, so the slice fuses into the
    Gram's weighting mul instead of materializing (s2d_flatten_par's
    reshape measured ~0.5 ms/step of slice/relayout copies). Raw taps
    cook (bias + ReLU) per slice AFTER slicing — deliberately NOT the
    same subgraph as the conv1_2 input's epilogue, so CSE cannot merge
    them back into one layout-shared tensor (see S2dTap.bias)."""
    d = tap.data
    if tap.halo_px:
        o0 = tap.halo_px // 2
        d = d[:, o0:o0 + tap.own_px // 2 + (1 if tap.off else 0)]
    c = d.shape[3] // 4
    out = []
    for i in range(4):
        sl = d[..., i * c:(i + 1) * c]
        if tap.bias is not None:
            sl = _relu(sl + tap.bias[i * c:(i + 1) * c])
        out.append(sl)
    return out


def s2d_masks_par(mask: jnp.ndarray, strips: int, halo_px: int,
                  off: int = -1) -> list:
    """(K, H, W) layer masks -> four per-parity GRID masks
    (K, S, ro, co) in s2d_slices_par's slot order (halo / beyond-image
    / garbage slots zero). Loop-invariant given the mask constants —
    built outside the optimization scan (StylizeConstants.
    s2d_mask_parts; XLA's while-loop LICM won't hoist these buffers)."""
    k, h, w = mask.shape
    own = h // strips
    m = mask.reshape(k, strips, own, w)
    g = 1 if off else 0
    m = jnp.pad(m, ((0, 0), (0, 0), (halo_px + g, halo_px + g), (g, g)))
    r2, w2 = m.shape[2], m.shape[3]
    m = m.reshape(k, strips, r2 // 2, 2, w2 // 2, 2)
    o0 = halo_px // 2
    m = m[:, :, o0:o0 + own // 2 + g]
    return [m[:, :, :, py, :, px]
            for py in range(2) for px in range(2)]


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _parity_pool(x: jnp.ndarray, pool_impl: str = "xla") -> jnp.ndarray:
    """2×2 stride-2 max pool of an aligned-grid s2d tensor: the pool
    windows ARE the cells, so the pool is a max over the 4 parity
    channel groups — pure elementwise VPU work on 64-lane slices (a
    (…, 4, C) reshape instead measured ~0.26 ms/step of relayout in
    the backward; lane slices fuse)."""
    c = x.shape[3] // 4
    sl = [x[..., i * c:(i + 1) * c] for i in range(4)]
    return jnp.maximum(jnp.maximum(sl[0], sl[1]),
                       jnp.maximum(sl[2], sl[3]))


def _parity_pool_fwd(x, pool_impl):
    y = _parity_pool(x, pool_impl)
    return y, (x, y)


def _parity_pool_bwd(pool_impl, res, g):
    # same tie rule as _maxpool2_bwd: equal split among exact ties
    # ("noties": full cotangent to every tie) — the conventions every
    # golden/parity artifact is pinned under.
    x, y = res
    c = x.shape[3] // 4
    eqs = [(x[..., i * c:(i + 1) * c] == y).astype(g.dtype)
           for i in range(4)]
    if pool_impl == "noties":
        gd = g
    else:
        ties = eqs[0] + eqs[1] + eqs[2] + eqs[3]
        gd = g / jnp.maximum(ties, 1.0)
    return (jnp.concatenate([m * gd for m in eqs], axis=-1),)


_parity_pool.defvjp(_parity_pool_fwd, _parity_pool_bwd)


def _block1_s2d(params: dict, x: jnp.ndarray, layers, *, pooling: str,
                cdt, pool_impl: str, base, hi: int,
                halo_px: int, own_px: int, remat_save: tuple = (),
                k4_px: int | None = None, k4_max: int | None = None):
    """Run conv1_1 → conv1_2 → pool1 in space-to-depth form.

    x: preprocessed (S, R, W, 3), R and W even — strip form (base[s] =
    s·own−halo) or a plain batch (base = zeros, halo_px = 0, own_px = R).
    Returns ({block-1 tap: S2dTap}, pool1 output (S, R/2, W/2, 64)) with
    bias/ReLU/boundary-zeroing applied exactly as the direct path does
    (postact deferral included — the parity max commutes with the
    per-channel bias and monotone ReLU bit-exactly, same argument as
    _maxpool2's). Cites the reference VGG tap semantics via SURVEY.md
    §2 comp.2; arithmetic equivalence is pinned by tests/test_s2d.py.
    """
    w_img = x.shape[2]
    w11 = params["conv1_1"]["w"][:, :, ::-1, :]          # BGR fold
    k11 = _s2d_kernel4(w11).astype(cdt)
    k12 = _s2d_kernel(params["conv1_2"]["w"]).astype(cdt)
    b11 = jnp.tile(params["conv1_1"]["b"], 4).astype(cdt)
    b12 = params["conv1_2"]["b"].astype(cdt)

    # stride-2 4×4 conv straight off the pixel image (see _s2d_kernel4
    # — no input cell grid is ever materialized; the 2-px zero pad is
    # exactly the old path's one zero CELL per edge). Below 2^20 px the
    # input gradient goes matmul-form (_k4_conv: 172 -> 184 it/s @512²,
    # batch 162 -> 168 — the emitter's 3-channel transposed conv was
    # the step's largest op); at 1024²+ the emitter's dx wins back
    # (40.3 vs 39.7 — the (P, 48) tap tensor's HBM traffic outgrows
    # the layout tax it saves, the same crossover _resolve_conv11
    # measured for the direct dotbwd).
    # the gate unit is the PER-DISPATCH work: per image on the
    # standard/batch paths (the regime #9's crossover was measured in),
    # per strip inside the stream12 scan (k4_px/k4_max, wired at the
    # strip_fwd call site; gate exactness pinned by
    # tests/test_stream12.py::test_stream12_k4_gate_is_per_strip). The
    # scan context carries its own crossover (_K4_MATMUL_BWD_MAX_STRIP)
    # because the image-level constant's verdict does not transfer:
    # round-5 chip A/B @4096² measured the in-scan matmul dx at 1.402
    # vs 1.419 it/s for the emitter dx it replaces (0.988x, 3/3 reps,
    # same process) — the trace's 26 ms/step of emitter space-to-batch
    # dx OVERLAPS with scan compute while the (P, 48) tap tensor is
    # real new HBM traffic, the same overlap lesson as campaigns
    # #16/#19 from the other direction.
    if (k4_px if k4_px is not None else hi * w_img) < (
            k4_max if k4_max is not None else _K4_MATMUL_BWD_MAX):
        z1 = _k4_conv(x, k11)                 # odd (S, R/2+1, W/2+1, 256)
    else:
        z1 = jax.lax.conv_general_dilated(
            x, k11, (2, 2), ((2, 2), (2, 2)), dimension_numbers=_DN,
            preferred_element_type=cdt)
    if "z1" in remat_save:      # stream12_remat="b12f": save the raw
        z1 = checkpoint_name(z1, "stream12_b2")   # conv1_1 grid too
    taps = {}
    if "conv1_1" in layers:
        # RAW tap + bias: the Gram cooks its own epilogue per parity
        # slice in its own layout (see S2dTap.bias — the cooked tensor
        # shared between conv1_2 and the Gram measured ~0.46 ms/step of
        # layout ping-pong copies around the epilogue)
        taps["conv1_1"] = S2dTap(z1, -1, halo_px, own_px, w_img,
                                 bias=b11)
    y = _relu(z1 + b11)
    y = _s2d_zero_oob(y, -1, base, hi, w_img)
    y = checkpoint_name(y, "vgg_block1")

    z = _s2d_conv(y, k12, cdt)                # aligned (S, R/2, W/2, 256)
    if "z" in remat_save:       # stream12_remat="b12"/"b12f": save the
        z = checkpoint_name(z, "stream12_b2")  # raw conv1_2 grid — the
        # backward then re-runs only the (cheap) K4 conv1_1, not the
        # 256x256 2x2 conv that carries ~95% of block 1's remat FLOPs
    postact = (pool_impl in ("auto", "postact") and pooling == "max"
               and "conv1_2" not in layers)
    if postact:
        p = _parity_pool(z, pool_impl)
        p = _relu(p + b12)
        # beyond-image rows at pooled resolution (junk under postact —
        # the direct path zeroes them after the pool the same way)
        rows = p.shape[1]
        gi = jnp.asarray(base)[:, None] // 2 + jnp.arange(rows)[None, :]
        ok = (gi >= 0) & (gi < hi // 2)
        p = p * ok[:, :, None, None].astype(p.dtype)
    else:
        b12t = jnp.tile(params["conv1_2"]["b"], 4).astype(cdt)
        if "conv1_2" in layers:
            taps["conv1_2"] = S2dTap(z, 0, halo_px, own_px, w_img,
                                     bias=b12t)
        z = _relu(z + b12t)
        z = _s2d_zero_oob(z, 0, base, hi, w_img)
        z = checkpoint_name(z, "vgg_block1")
        if pooling == "max":
            p = _parity_pool(z, pool_impl)
        else:
            c = z.shape[3] // 4
            p = 0.25 * (z[..., :c] + z[..., c:2 * c]
                        + z[..., 2 * c:3 * c] + z[..., 3 * c:])
    return taps, checkpoint_name(p, "vgg_block1")


def _resolve_block1(block1_impl: str, h: int, w: int) -> bool:
    """"auto" -> s2d on TPU at >= 512²-class images; direct convs
    elsewhere. Measured on full steps (K4 + raw-tap form,
    ARCHITECTURE.md round-3 campaigns #7/#8): 163.4 -> 171.9 it/s
    @512² strips, 137.3 -> 162.2 pair-it/s @512² B=8 plain batch,
    39.4 -> 40.3 @1024² (a REGRESSION before the stride-2 K4 conv1_1
    replaced the explicit cell build), but 676.5 -> 505.8 @256² (the
    dot11 tall-matmul conv1_1 it displaces is the better lowering at
    that size) — so auto gates at h·w >= 2^18 pixels. No upper bound:
    past the fused-Gram block limit (2048²+) the nd Gram consumption is
    impossible, and optimize._s2d_gram_kernel resolves s2d_gram="auto"
    to the streamed Pallas kernel instead (campaign #12: 8.92 vs 8.58
    it/s over the standard-conv fallback at 2048²; under explicit
    s2d_gram="nd" the gate self-closes on the gram route as before).
    CPU has no MXU underfill to solve."""
    if block1_impl == "s2d":
        return True
    return (block1_impl == "auto" and jax.default_backend() == "tpu"
            and h * w >= 2 ** 18)


def _resolve_s2b(s2b_strips: int, h: int, w: int) -> int:
    """-1 = auto: 64-row strips on TPU for large images, off elsewhere.

    Measured (tools/perf_lab.py + ad-hoc sweeps, v5e full step):
      * 512²: 135.2 / 121.5 / 87.1 it/s at strip heights 64/32/128 —
        64 rows is the sweet spot, so auto uses h // 64 strips;
      * 1024²: 32.1 vs 25.8 it/s (+24%);
      * 256²: 366 vs 467 it/s — a REGRESSION: the relayout copies the
        strips displace shrink with the tensors, but the ~25% halo
        redundancy doesn't, so auto stays off below 512²-class images;
      * CPU: no space-to-batch rewrite exists to displace — off.
    """
    if s2b_strips != -1:
        return s2b_strips
    if jax.default_backend() != "tpu" or h % 64 or h * w < 512 * 512:
        return 0
    return h // 64


def s2b_active(s2b_strips: int, h: int, w: int, layers) -> bool:
    """Will `extract_features` run the strip decomposition for this
    (config, shape)? Public so `api.prepare_constants` can decide the
    Laplacian layout anchor (`optimize.lap_anchor_active`) consistently
    with the path the loss will actually take."""
    n = _resolve_s2b(s2b_strips, h, w)
    return _s2b_enabled(n, (1, h, w, 3), layers)


def _s2b_enabled(s2b_strips: int, image_shape, layers) -> bool:
    """Static gate for the manual strip decomposition of blocks 1-2.

    Why it exists (ARCHITECTURE.md layout-tax campaign): XLA rewrites
    every batch-1 VGG conv with its space-to-batch pass (W split 8× +
    halo) and re-assembles around each conv's consumers — ~2.1 ms/step
    of pure relayout `copy` ops at 512². Splitting the IMAGE into S row
    strips with an 8-px halo runs blocks 1-2 (the 33/17 MB tensors where
    the copies concentrate) at batch=S, where the conv emitters operate
    natively and the rewrite never fires. Strip interiors are exact:
    every halo-contaminated row is sliced away before use, so taps and
    pool2 output are bit-comparable to the undecomposed path; the cost
    is 25% redundant conv FLOPs in blocks 1-2 (80/64 rows per strip).
    """
    if s2b_strips <= 1:
        return False
    b, h, w, _ = image_shape
    hs = h // s2b_strips
    return (b == 1 and h % s2b_strips == 0 and hs % 4 == 0
            and hs >= 4 * _S2B_HALO
            and max(LAYER_ORDER.index(l) for l in layers)
            > LAYER_ORDER.index("pool2"))


@partial(jax.jit, static_argnames=("layers", "pooling", "compute_dtype",
                                   "conv_impl", "pool_impl", "s2b_strips",
                                   "strip_taps", "block1_impl"))
def extract_features(params: dict, image: jnp.ndarray,
                     layers: tuple[str, ...],
                     pooling: str = "max",
                     compute_dtype: str = "float32",
                     conv_impl: str = "auto",
                     pool_impl: str = "auto",
                     s2b_strips: int = 0,
                     strip_taps: bool = False,
                     block1_impl: str = "conv") -> dict:
    """Run VGG-19 up to the deepest layer in `layers`.

    Args:
      params: conv weights (see init_params).
      image: (H, W, 3) or (B, H, W, 3) float, RGB in [0, 255].
      layers: tap names, e.g. ("conv1_1", ..., "conv4_2"); post-ReLU
        activations are returned.
      pooling: "max" | "avg".
      compute_dtype: dtype convs run in; accumulation is always fp32.

    Returns: {layer: (B, H_l, W_l, C_l)} in the compute dtype; batch dim
    added if absent.
    """
    squeeze = image.ndim == 3
    if squeeze:
        image = image[None]
    cdt = jnp.dtype(compute_dtype)
    x = _preprocess_noflip(image.astype(jnp.float32)).astype(cdt)

    # manual space-to-batch of blocks 1-2 (see _s2b_enabled): S row
    # strips with 8 halo rows, batch-S convs, exact interior slicing
    strip_halo = None
    strip_own = 0
    s2b_strips = _resolve_s2b(s2b_strips, x.shape[1], x.shape[2])
    if _s2b_enabled(s2b_strips, x.shape, layers):
        hs = x.shape[1] // s2b_strips
        # custom-VJP stack: autodiff's S-way split backward costs
        # 16 ms/step at 2048² — see _s2b_stack
        x = _s2b_stack(x[0], s2b_strips)          # (S, hs+16, W, 3)
        strip_halo, strip_own = _S2B_HALO, hs

    def _interior(t):
        """Strip tensor -> the exact batch-1 tensor it decomposes."""
        s, _, w_l, c_l = t.shape
        t = t[:, strip_halo:strip_halo + strip_own]
        return t.reshape(1, s * strip_own, w_l, c_l)

    def _zero_oob(t):
        """Zero rows that lie beyond the global image.

        The undecomposed network zero-pads ACTIVATIONS at the image
        boundary (each SAME conv pads its post-ReLU input), but the edge
        strips' halo rows are zero IMAGE rows, whose activation is
        relu(bias) ≠ 0. Re-zeroing after every activation in the strip
        region restores exact equivalence; interior strips are untouched
        (their halo rows hold real data). Fuses into the epilogue."""
        s, rows = t.shape[0], t.shape[1]
        gi = (jnp.arange(s)[:, None] * strip_own
              + jnp.arange(rows)[None, :] - strip_halo)
        ok = (gi >= 0) & (gi < s * strip_own)
        return t * ok[:, :, None, None].astype(t.dtype)

    deepest = max(LAYER_ORDER.index(l) for l in layers)
    taps = {}
    start_idx = 0
    _p1 = LAYER_ORDER.index("pool1")
    if (_resolve_block1(block1_impl, image.shape[1], image.shape[2])
            and deepest > _p1
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
        # space-to-depth block 1 (see the _s2d_kernel section): conv1_1
        # and conv1_2 as full-lane 2×2 convs, pool1 as a parity max —
        # lands exactly on the post-pool1 tensor of the direct path
        if strip_halo is not None:
            base = np.arange(x.shape[0]) * strip_own - strip_halo
            hi = x.shape[0] * strip_own
            halo_px, own_px, is_strip = strip_halo, strip_own, True
        else:
            base = np.zeros(x.shape[0], np.int64)
            hi = x.shape[1]
            halo_px, own_px, is_strip = 0, x.shape[1], False
        s2d_taps, x = _block1_s2d(
            params, x, layers, pooling=pooling, cdt=cdt,
            pool_impl=pool_impl, base=base, hi=hi,
            halo_px=halo_px, own_px=own_px)
        for l, tap in s2d_taps.items():
            tap.strip = is_strip
            if strip_taps:
                taps[l] = tap
            else:
                t = tap.plain()
                if is_strip:
                    taps[l] = t if squeeze else t[None]
                else:
                    taps[l] = t[0] if squeeze else t
        if strip_halo is not None:
            strip_halo //= 2
            strip_own //= 2
        start_idx = _p1 + 1
    pending_bias = None
    for idx, name in enumerate(LAYER_ORDER):
        if idx < start_idx:
            continue
        if idx > deepest:
            break
        if name.startswith("pool"):
            x = _pool(x, pooling, pool_impl)
            if strip_halo is not None:
                strip_halo //= 2
                strip_own //= 2
            if pending_bias is not None:
                # deferred epilogue (pool_impl="postact"): per-channel
                # bias is constant within a window and ReLU is monotone,
                # so maxpool(relu(z+b)) == relu(maxpool(z)+b) BIT-exactly
                # (the max selects the same element either way); running
                # bias+ReLU after the pool does the elementwise work at
                # quarter resolution and lets the pool consume the raw
                # conv output with no elementwise island in between
                x = _relu(x + pending_bias)
                pending_bias = None
                if strip_halo is not None and name != "pool2":
                    x = _zero_oob(x)   # see _zero_oob: edge-strip halos
            if strip_halo is not None and name == "pool2":
                x = _interior(x)                 # back to batch 1
                strip_halo = None
            x = checkpoint_name(x, f"vgg_block{name[4]}")
            continue
        p = params[name]
        w = p["w"]
        if name == "conv1_1":
            # BGR flip folded into the weights (see _preprocess_noflip);
            # loop-invariant, hoisted out of the optimization scan.
            w = w[:, :, ::-1, :]
        # Uniform compute dtype end-to-end: the TPU MXU accumulates bf16
        # convs in fp32 internally regardless, and a mixed-dtype conv
        # (bf16 operands, fp32 preferred_element_type) has no transpose
        # rule in JAX — it would break the VJP the optimizer loop needs.
        if _use_pallas_conv(conv_impl, x.shape[2], x.shape[3]):
            x = _pallas_conv(x, w.astype(cdt))
        elif conv_impl == "flipvjp":
            x = _conv_flipvjp(x, w.astype(cdt))
        elif conv_impl == "padbwd" and x.shape[3] < _PADBWD_COUT:
            # only conv1_1 has a narrow input-gradient (3 channels)
            x = _conv_padbwd(x, w.astype(cdt))
        elif _resolve_conv11(conv_impl, x.shape) == "dotbwd":
            x = _conv_dotbwd(x, w.astype(cdt))
        elif _resolve_conv11(conv_impl, x.shape) == "dot11":
            x = _conv_dot11(x, w.astype(cdt))
        else:
            x = jax.lax.conv_general_dilated(
                x, w.astype(cdt), (1, 1), "SAME",
                dimension_numbers=_DN, preferred_element_type=cdt)
        # "auto" resolves to the postact structure: measured 121.6 vs
        # 114.6 it/s on the 512² full step (tools/perf_lab.py) and
        # bit-equivalent — the per-channel bias preserves each window's
        # argmax and tie pattern, so outputs AND gradients are unchanged.
        # "xla"/"pallas"/"noties" keep the classic pre-pool epilogue.
        if (pool_impl in ("auto", "postact") and pooling == "max"
                and name not in layers and idx + 1 <= deepest
                and LAYER_ORDER[idx + 1].startswith("pool")):
            pending_bias = p["b"].astype(cdt)   # applied after the pool
            continue
        x = x + p["b"].astype(cdt)
        x = _relu(x)
        if strip_halo is not None:
            x = _zero_oob(x)           # see _zero_oob: edge-strip halos
        # remat tag: under cfg.remat="blockN" policies these activations
        # are NOT saved as autodiff residuals — the backward recomputes
        # them — which drops the HBM-bound layout copies of the largest
        # (block-1/2) tensors (see optimize.make_loss_fn / perf_lab)
        x = checkpoint_name(x, f"vgg_block{name[4]}")
        if name in layers:
            # taps stay in the compute dtype: the style loss immediately
            # re-casts to it for the Gram matmuls, so fp32 taps would be
            # a pure HBM round-trip (~100 MB/step at 512²); loss math
            # accumulates in fp32 regardless.
            if strip_halo is not None and strip_taps:
                # leave the tap in strip form — the masked Gram consumes
                # it via strip_masks with no interior-slice copy
                taps[name] = StripTap(x, strip_halo, strip_own)
            else:
                t = _interior(x) if strip_halo is not None else x
                taps[name] = t[0] if squeeze else t
    return taps


def layer_downsample_factor(layer: str) -> int:
    """Spatial stride of `layer` relative to the input (for mask pyramids)."""
    block = int(layer[4])
    return 2 ** (block - 1)


# --- block-1/2 activation streaming (the ≥3072²-class single-chip path) --


def stream12_strips(stream12: int, h: int, w: int) -> int:
    """Resolve the block-1/2 streaming strip count.

    -1 = auto: stream on TPU for images ABOVE 3072²-class — the regime
    where block-1/2 activations break one chip's HBM no matter how the
    batch decomposition or remat is configured (measured at 4096²:
    19.3 G needed of 15.75 G, dominated by 8 GB batch-1 block-1 buffers
    with 4× tile-padding expansion; every batch-form variant is
    rejected at allocation. 3072² still fits the standard path at
    14.3 G — ARCHITECTURE.md round 3). 0 = off; N = strip count.

    Auto strip height: 128 rows when h allows, else 64. Measured at
    4096² AFTER the in-scan s2d lowering (campaign #17): hs=128
    1.409 it/s vs hs=64 1.370 vs hs=256 1.134 — taller strips halve
    the per-iteration fixed costs and the halo fraction (12.5% vs
    25%), until per-strip tensors outgrow the regime the conv
    emitters like (hs=256 loses 20%). Pre-#17 the verdict was the
    reverse (hs=64 1.158 vs hs=128 1.151) — the s2d form shrank the
    conv cost, so the fixed costs the strip count amortizes moved.
    """
    if stream12 != -1:
        return stream12
    if jax.default_backend() != "tpu" or h * w <= 3072 * 3072:
        return 0
    if h % 128 == 0:
        return h // 128
    return h // 64 if h % 64 == 0 else 0


def _flat_offsets(w2: int) -> tuple:
    """Row-major flat offsets of the 3×3 stencil on a width-w2 grid."""
    return tuple(ky * w2 + kx for ky in range(3) for kx in range(3))


def _offset_dot(buf: jnp.ndarray, w_flat: jnp.ndarray, offs, n: int
                ) -> jnp.ndarray:
    """y[j] = Σ_k buf[j + offs[k]] · w_k — a 3×3 conv as nine offset
    slices of ONE row-major flat buffer lane-concatenated into a single
    (n, 9·Ci) im2col block and contracted in ONE MXU dot (9·Ci deep).

    The point (campaign #19): at batch-1 strip geometry XLA's conv
    emitter repacks every block-2 conv into space-to-batch forms —
    copy/reshape/pad was 53% of the 4096² streamed scan's time
    (248 of 469 ms/step, round-3 trace). A flat row-major buffer makes
    all nine stencil taps CONTIGUOUS offset slices, so the only data
    movement left is the one im2col concatenate the MXU contraction
    needs anyway."""
    ci = buf.shape[1]
    cols = [jax.lax.slice(buf, (o, 0), (o + n, ci)) for o in offs]
    ic = jnp.concatenate(cols, axis=1)                    # (n, 9·Ci)
    return jax.lax.dot_general(
        ic, w_flat, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=buf.dtype)


@jax.custom_vjp
def _flat_conv3x3(xg: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """SAME 3×3 conv on a zero-padded flat grid, as offset-slice matmuls.

    xg: (R+2, W2, Ci) — pixel (r, c) lives at grid (r+1, c+1); row 0,
    row R+1, column 0 and columns W+1.. are zeros (the caller builds
    this with jnp.pad and re-zeroes between convs). w: (3, 3, Ci, Co)
    HWIO. Returns (R, W2, Co) in the SAME column convention — pixel c
    at column c+1; columns 0 and W+1.. hold row-wrap garbage the caller
    must mask before use. The backward is the mirrored offset-slice
    form (transposed taps at reflected offsets), NOT the emitter's
    transposed conv; weights get a zero cotangent (frozen VGG, same
    contract as _conv_dotbwd/_k4_conv)."""
    r2, w2, ci = xg.shape
    n = (r2 - 2) * w2
    flat = jnp.pad(xg.reshape(r2 * w2, ci), ((1, 7), (0, 0)))
    y = _offset_dot(flat, w.reshape(9 * ci, -1), _flat_offsets(w2), n)
    return y.reshape(r2 - 2, w2, -1)


def _flat_conv3x3_fwd(xg, w):
    return _flat_conv3x3(xg, w), (xg.shape, w)


def _flat_conv3x3_bwd(res, g):
    (r2, w2, ci), w = res
    co = w.shape[-1]
    n = (r2 - 2) * w2
    # y[j] reads X[j + o_k − 1] (o_k = ky·w2+kx over the 1-padded ext),
    # so dX[m] = Σ_k dy[m + 1 − o_k] · w_kᵀ. Pad dy by F = 2·w2+2 in
    # front: offsets q_k = F + 1 − o_k ≥ 1 stay slice-legal, and the
    # backward is the SAME offset-slice matmul shape as the forward.
    f = 2 * w2 + 2
    gy = jnp.pad(g.reshape(n, co).astype(w.dtype),
                 ((f, 2 * w2 + 8), (0, 0)))
    offs = tuple(f + 1 - o for o in _flat_offsets(w2))
    wt = w.reshape(9, ci, co).transpose(0, 2, 1).reshape(9 * co, ci)
    dx = _offset_dot(gy, wt, offs, r2 * w2)
    return dx.reshape(r2, w2, ci), jnp.zeros_like(w)


_flat_conv3x3.defvjp(_flat_conv3x3_fwd, _flat_conv3x3_bwd)


def stream12_conv2_mode(mode: str) -> str:
    """Resolve the streamed block-2 conv lowering ("auto" -> measured
    default). "conv": the generic conv_general_dilated strip loop.
    "dot": campaign #19's flat offset-slice matmul form (_flat_conv3x3)
    — block 2 stays in one row-major padded grid through conv2_1 →
    conv2_2 → pool2, Grams fed in grid layout, so the emitter's
    batch-1 space-to-batch repacks never exist. MEASURED-NEGATIVE at
    4096² (same-process A/B on v5e: 1.135 vs 1.419 it/s, 0.80×): the
    trace's 53% copy attribution on the emitter's repacks OVERLAPS
    with compute, while the im2col concatenate materializes a real
    9×-amplified (N, 576) block per conv — opt-in only."""
    if mode != "auto":
        return mode
    return "conv"


def stream12_compatible(layers, strips: int, image_shape) -> bool:
    """Streaming covers taps in blocks 1-2 ONLY as masked Grams; any
    full-tensor tap (content layer) there forces the standard path."""
    if strips <= 1 or len(image_shape) != 3:
        return False
    h, w, _ = image_shape
    hs = h // strips
    return (h % strips == 0 and hs % 4 == 0 and hs >= 4 * _S2B_HALO
            and w % 4 == 0
            and max(LAYER_ORDER.index(l) for l in layers)
            > LAYER_ORDER.index("pool2"))


_B12_ORDER = ("conv1_1", "conv1_2", "pool1", "conv2_1", "conv2_2", "pool2")


def stream12_remat_mode(mode: str) -> str:
    """Resolve the streamed blocks-1-2 remat mode ("auto" -> measured
    default). "full" remats the whole strip in the backward; "b2" saves
    the block-2 conv outputs and the pool results (~2.1 GB bf16 at
    4096², vs the ~8 GB block-1 tensors that must keep streaming) so
    the backward re-runs only block 1 — the block-2 convs (~29 of the
    65 GFLOP/strip recompute) and pool2's reduce-window re-run drop out
    of the rematted computation (campaign #18). "b12" additionally
    saves conv1_2's raw output (+2.4 GB at 4096²; only the cheap K4
    conv1_1 re-runs — the round-4 roofline put block-1 remat at
    ~2.6 TFLOP/step, 95% of it conv1_2); "b12f" saves conv1_1's grid
    too (+4.9 GB; no convs re-run).

    Round-4 chip verdicts at 4096² (same-process A/B,
    tools/r4_tpu_campaign.py): b12 is NEUTRAL (1.423 vs b2's 1.419
    it/s — dropping 95% of block-1 remat FLOPs buys nothing, the step
    is scheduler-bound, not recompute-bound) and b12f OOMs. Auto stays
    "b2": same speed, 2.4 GB less live memory."""
    if mode != "auto":
        return mode
    return "b2"


def stream12_s2d_ok(w: int, hs: int, gram_layers) -> bool:
    """Shape preconditions for ``block1_impl="s2d"`` inside the
    stream12 strip scan: even width and strip rows (the s2d parity
    split) and no conv1_2 tap (its grid-layout Gram feed is not
    built). ONE source of truth shared by the auto gate
    (optimize's block-1 route) and ``stream_block12_grams``'s
    validation so the two sites cannot drift.
    """
    return not (w % 2 or hs % 2 or "conv1_2" in gram_layers)


@partial(jax.jit, static_argnames=("strips", "gram_layers", "pooling",
                                   "compute_dtype", "pool_impl",
                                   "block1_impl", "remat_mode",
                                   "conv2_impl"))
def stream_block12_grams(params: dict, image: jnp.ndarray, masks: dict,
                         *, strips: int,
                         gram_layers: tuple[str, ...],
                         pooling: str = "max",
                         compute_dtype: str = "float32",
                         pool_impl: str = "auto",
                         block1_impl: str = "conv",
                         remat_mode: str = "full",
                         conv2_impl: str = "conv"):
    """Blocks 1-2 as a strip-streamed `lax.scan` — activations never
    materialize at full resolution.

    The loss needs blocks 1-2 only through (a) the masked Grams of their
    style taps and (b) the pool2 output that feeds block 3. Both are
    row-separable: Grams are sums over pixels, and a strip with an 8-row
    halo computes its pool2 rows exactly (same validity chain as the
    batch-form s2b decomposition — `_S2B_HALO`). So the scan body (one
    strip: conv1_1..pool2 + partial Gram contractions), wrapped in
    `jax.checkpoint`, runs S strips sequentially; the backward re-runs
    one strip at a time. Peak block-1/2 memory drops from O(H·W·64) to
    O((H/S)·W·64) — at 4096² with 64 strips: ~42 MB instead of 2.5 GB+.

    Edge semantics match the undecomposed network exactly the way the
    batch path does: activation rows beyond the global image are
    re-zeroed after every conv (the reference zero-pads ACTIVATIONS, but
    an out-of-image halo row holds relu(bias) ≠ 0); the even halo keeps
    pool windows from straddling the boundary.

    masks: {layer: (K, h_l, w_l)} content masks for `gram_layers`.
    Returns ({layer: (K, C, C) fp32 UNNORMALIZED Gram sums — divide by
    Σm² (or Σm) of the full mask}, pool2 activation (1, H/4, W/4, 128)).

    block1_impl="s2d" runs each strip's conv1_1→pool1 in space-to-depth
    form (`_block1_s2d` — the campaign-#7/#9 lowering: stride-2 4×4
    conv1_1, 2×2 conv1_2 between half-cell-shifted grids, pool1 a free
    parity max), with the conv1_1 Gram accumulated from the four parity
    lane-slices via the nd analytic-VJP Gram. Requires even strip rows
    and width and no conv1_2 tap; Gram sums match the conv form to fp
    summation order (tests/test_stream12.py).

    remat_mode="b2" (campaign #18, see `stream12_remat_mode`) saves the
    block-2 conv outputs and the pool results per strip instead of
    re-running them in the backward — program-equivalent (bit-identical
    values and gradients on CPU, tests/test_stream12.py; on TPU the
    saved vs recomputed convs get different MXU accumulation schedules,
    so values stay bit-identical but gradients match only to ~1 bf16
    ulp per element and long optimizations diverge chaotically, like
    any sub-ulp change), ~45% less remat conv work, +~2.1 GB bf16 of
    saved residuals at 4096².

    conv2_impl="dot" (campaign #19, see `stream12_conv2_mode`) runs
    conv2_1 → conv2_2 → pool2 in the flat offset-slice matmul form
    (`_flat_conv3x3`): block 2 lives in one row-major zero-padded grid,
    each conv is one im2col concatenate + one MXU dot, the epilogue
    (bias/ReLU/boundary- and garbage-column-zeroing) is a single fused
    multiply, and block-2 Grams are fed the padded grid directly with
    grid-layout masks (zeros at pads/halo) — the conv emitter's batch-1
    space-to-batch repacks (53% of the streamed scan's trace time at
    4096²) never exist. Same math; matches "conv" to fp summation
    order. MEASURED-NEGATIVE opt-in (0.80× at 4096² — the repack
    copies overlap with compute, the im2col traffic is real).
    """
    cdt = jnp.dtype(compute_dtype)
    h, w = image.shape[:2]
    hs = h // strips
    halo0 = _S2B_HALO
    p_imp = "xla" if pool_impl == "pallas" else pool_impl
    use_s2d = block1_impl == "s2d"
    # remat_mode="b2": the strip backward saves block 2 instead of
    # re-running it. Block-1 tensors (4×64-lane half-res grids, ~8 GB
    # at 4096²) MUST keep streaming, but block-2 conv outputs are 4×
    # smaller — naming them (+ the pool results, whose tie backward
    # otherwise re-runs the reduce-window) under save_only_these_names
    # drops ~45% of the remat's conv FLOPs (campaign #18).
    remat_b2 = remat_mode in ("b2", "b12", "b12f")
    # "b12": additionally save conv1_2's raw output (the conv carrying
    # ~95% of block 1's remat FLOPs; +2.4 GB bf16 at 4096²); "b12f":
    # conv1_1's raw grid too (backward re-runs NO convs; +4.9 GB)
    b1_save = {"b12": ("z",), "b12f": ("z1", "z")}.get(remat_mode, ())
    b1_conv_prefixes = {"b2": ("conv2",), "b12": ("conv2", "conv1_2"),
                        "b12f": ("conv2", "conv1")}.get(remat_mode, ())
    if use_s2d and not stream12_s2d_ok(w, hs, gram_layers):
        raise ValueError(
            "stream12 block1_impl='s2d' needs even strip rows/width and "
            "no conv1_2 tap")

    # preprocess BEFORE padding: the zero halo rows beyond the global
    # image must be zero in PREPROCESSED space (the batch s2b path pads
    # the preprocessed image too) — padding raw pixels would make them
    # -mean after per-strip preprocessing
    xp = jnp.pad(_preprocess_noflip(image.astype(jnp.float32)),
                 ((halo0, halo0), (0, 0), (0, 0)))
    xs = jnp.stack([
        jax.lax.slice_in_dim(xp, i * hs, i * hs + hs + 2 * halo0, axis=0)
        for i in range(strips)])                 # (S, hs+16, W, 3)
    use_dot2 = conv2_impl == "dot"
    mstacks = {}
    for layer in gram_layers:
        f = layer_downsample_factor(layer)
        m = jnp.asarray(masks[layer])            # (K, h/f, w/f)
        k = m.shape[0]
        if use_dot2 and layer in ("conv2_1", "conv2_2"):
            # grid-layout masks for the flat block 2: own rows placed
            # at [halo, halo+own), pixel col c at grid col c+1, zeros
            # at halo rows / pad cols — the Gram numerator is (m∘F)ᵀ
            # (m∘F), so zero mask ≡ the old interior slice
            mm = m.reshape(k, strips, hs // f, w // f).transpose(
                1, 0, 2, 3)                      # (S, K, own_l, w_l)
            mstacks[layer] = jnp.pad(
                mm, ((0, 0), (0, 0), (halo0 // f, halo0 // f), (1, 7)))
            continue
        if use_s2d and layer == "conv1_1":
            # four per-parity GRID masks in s2d_slices_par's slot order
            # (halo / beyond-image / garbage slots zero) — built once
            # outside the scan, sliced per strip: (S, 4, K, ro, co)
            mp = s2d_masks_par(m, strips, halo0, off=-1)
            mstacks[layer] = jnp.stack(
                [p.transpose(1, 0, 2, 3) for p in mp], axis=1)
            continue
        mstacks[layer] = m.reshape(
            k, strips, hs // f, w // f).transpose(1, 0, 2, 3)

    def strip_fwd(xs_i, ms_i, idx):
        # _grams_raw_* carry the one-pass analytic VJP — inside this
        # checkpointed scan the backward otherwise re-walks each
        # strip's (P, K·C) block three times
        from ..ops.losses import _grams_raw_flat, _grams_raw_nd

        def pool_strip(x):
            if remat_b2:
                return _pool_save_y(x, pooling, p_imp, "stream12_b2")
            return _pool(x, pooling, p_imp)

        x = xs_i.astype(cdt)[None]       # already preprocessed (above)
        halo, own = halo0, hs
        grams = {}
        order = _B12_ORDER
        if use_s2d:
            t1, x = _block1_s2d(
                params, x,
                ("conv1_1",) if "conv1_1" in gram_layers else (),
                pooling=pooling, cdt=cdt, pool_impl=p_imp,
                base=(idx * hs - halo0)[None], hi=h,
                halo_px=halo0, own_px=hs, remat_save=b1_save,
                # the K4 dx gate sees PER-DISPATCH work (one strip of
                # hs+2·halo rows) against the SCAN-context crossover —
                # measured 0: the emitter dx wins in-scan at every
                # probed size (see _K4_MATMUL_BWD_MAX_STRIP)
                k4_px=x.shape[1] * x.shape[2],
                k4_max=_K4_MATMUL_BWD_MAX_STRIP)
            halo, own = halo0 // 2, hs // 2
            if "conv1_1" in gram_layers:
                sls = s2d_slices_par(t1["conv1_1"])  # 4× (1, ro, co, C)
                mi = ms_i["conv1_1"]                 # (4, K, ro, co)
                c_l = sls[0].shape[-1]
                k1 = mi.shape[1]
                # this is losses.masked_grams_nd_multi's accumulation
                # minus normalization, EXCEPT the mask squares here in
                # fp32 then casts (the batch path casts then squares);
                # goldens are pinned to each order — don't "unify"
                g = None
                for i in range(4):
                    m2 = (mi[i] * mi[i]).astype(cdt)
                    gi = _grams_raw_nd(sls[i][0].astype(cdt), m2)
                    g = gi if g is None else g + gi
                grams["conv1_1"] = g.reshape(
                    c_l, k1, c_l).transpose(1, 0, 2)
            order = _B12_ORDER[3:]                   # conv2_1 onward
        for name in order:
            if name == "conv2_1" and use_dot2:
                # campaign #19: block 2 in ONE row-major padded grid
                # (see docstring / _flat_conv3x3). x here is the pool1
                # output (1, R, w_l, 64), halo/own at block-2 res.
                w_l = x.shape[2]
                okc = jnp.pad(jnp.ones((w_l,), cdt), (1, 7))
                xg = jnp.pad(x[0], ((1, 1), (1, 7), (0, 0)))
                for name2 in ("conv2_1", "conv2_2"):
                    p2 = params[name2]
                    y = _flat_conv3x3(xg, p2["w"].astype(cdt))
                    if remat_b2:
                        y = checkpoint_name(y, "stream12_b2")
                    y = _relu(y + p2["b"].astype(cdt))
                    gi = idx * own + jnp.arange(y.shape[0]) - halo
                    okr = ((gi >= 0) & (gi < own * strips)).astype(cdt)
                    # one fused multiply: beyond-image rows AND the
                    # flat form's wrap-garbage columns go to zero
                    y = y * (okr[:, None, None] * okc[None, :, None])
                    if name2 in gram_layers:
                        c_l = y.shape[-1]
                        m = ms_i[name2]          # (K, R, W2) grid
                        m2 = (m * m).astype(cdt).reshape(m.shape[0], -1)
                        g = _grams_raw_flat(y.reshape(-1, c_l), m2)
                        grams[name2] = g.reshape(
                            c_l, m.shape[0], c_l).transpose(1, 0, 2)
                    if name2 == "conv2_1":
                        xg = jnp.pad(y, ((1, 1), (0, 0), (0, 0)))
                x = y[:, 1:w_l + 1][None]        # (1, R, w_l, 128)
                x = pool_strip(x)
                halo //= 2
                own //= 2
                x = x.astype(cdt)
                break
            if name.startswith("pool"):
                x = pool_strip(x)
                halo //= 2
                own //= 2
                continue
            p = params[name]
            wgt = p["w"]
            if name == "conv1_1":
                wgt = wgt[:, :, ::-1, :]   # BGR fold (_preprocess_noflip)
            x = jax.lax.conv_general_dilated(
                x, wgt.astype(cdt), (1, 1), "SAME",
                dimension_numbers=_DN, preferred_element_type=cdt)
            if remat_b2 and name.startswith(b1_conv_prefixes):
                # save the RAW conv output: bias/ReLU/boundary-zeroing
                # (and the Gram's interior flatten) re-derive from it
                # elementwise in the backward; the conv itself doesn't
                x = checkpoint_name(x, "stream12_b2")
            x = _relu(x + p["b"].astype(cdt))
            rows = x.shape[1]
            gi = idx * own + jnp.arange(rows) - halo
            ok = ((gi >= 0) & (gi < own * strips)).astype(x.dtype)
            x = x * ok[None, :, None, None]
            if name in gram_layers:
                f = x[0, halo:halo + own]        # (own, w_l, C)
                c_l = f.shape[-1]
                f2 = f.reshape(own * f.shape[1], c_l)
                m = ms_i[name]                   # (K, own, w_l)
                # numerator is m²-weighted for BOTH norms ((m∘F)ᵀ(m∘F));
                # the norm choice only changes the external divisor
                m2 = (m * m).astype(cdt).reshape(m.shape[0], -1)
                g = _grams_raw_flat(f2, m2)
                grams[name] = g.reshape(
                    c_l, m.shape[0], c_l).transpose(1, 0, 2)
            x = x.astype(cdt)
        return grams, x[0, halo:halo + own]      # pool2 rows (hs/4,w/4,128)

    if remat_b2:
        ckpt_body = jax.checkpoint(
            strip_fwd,
            policy=jax.checkpoint_policies.save_only_these_names(
                "stream12_b2"))
    else:
        ckpt_body = jax.checkpoint(strip_fwd)

    def scan_body(carry, inp):
        xs_i, ms_i, idx = inp
        g, p2 = ckpt_body(xs_i, ms_i, idx)
        return {l: carry[l] + g[l] for l in carry}, p2

    k_by_layer = {l: jnp.shape(masks[l])[0] for l in gram_layers}
    carry0 = {l: jnp.zeros(
        (k_by_layer[l], CONV_SHAPES[l][1], CONV_SHAPES[l][1]),
        jnp.float32) for l in gram_layers}
    # DPST_STREAM12_UNROLL=N unrolls the strip scan body N-fold — a
    # perf-lab knob (round-4 roofline candidate B): a longer body gives
    # the scheduler room to overlap strip DMA with compute across strip
    # boundaries, at N× program size. Default 1 (no unroll). Measured:
    # N=2 at 4096² OOMs (two strips of remat residuals live at once) —
    # unavailable exactly where it would matter.
    unroll = int(os.environ.get("DPST_STREAM12_UNROLL", "1"))
    carry, pool2 = jax.lax.scan(
        scan_body, carry0,
        (xs, mstacks, jnp.arange(strips)), unroll=unroll)
    pool2 = pool2.reshape(1, h // 4, w // 4, pool2.shape[-1])
    return carry, pool2


@partial(jax.jit, static_argnames=("layers", "pooling", "compute_dtype",
                                   "conv_impl", "pool_impl",
                                   "start_after"))
def extract_tail(params: dict, x: jnp.ndarray, layers: tuple[str, ...],
                 pooling: str = "max", compute_dtype: str = "float32",
                 conv_impl: str = "auto", pool_impl: str = "auto",
                 start_after: str = "pool2") -> dict:
    """Run the VGG stack from the activation AFTER `start_after` to the
    deepest requested tap (the continuation of `stream_block12_grams`).

    x: (1, h, w, C) activation emitted by `start_after`. Same epilogue
    structure as extract_features (incl. the postact deferral) minus the
    strip machinery — block-3+ tensors are small enough not to need it.
    Returns {layer: (h_l, w_l, C_l)} squeezed taps.
    """
    cdt = jnp.dtype(compute_dtype)
    x = x.astype(cdt)
    start = LAYER_ORDER.index(start_after) + 1
    deepest = max(LAYER_ORDER.index(l) for l in layers)
    if min(LAYER_ORDER.index(l) for l in layers) < start:
        raise ValueError(f"extract_tail: tap before {start_after}")
    taps = {}
    pending_bias = None
    for idx in range(start, deepest + 1):
        name = LAYER_ORDER[idx]
        if name.startswith("pool"):
            x = _pool(x, pooling, pool_impl)
            if pending_bias is not None:
                x = _relu(x + pending_bias)
                pending_bias = None
            x = checkpoint_name(x, f"vgg_block{name[4]}")
            continue
        p = params[name]
        if _use_pallas_conv(conv_impl, x.shape[2], x.shape[3]):
            x = _pallas_conv(x, p["w"].astype(cdt))
        elif conv_impl == "flipvjp":
            x = _conv_flipvjp(x, p["w"].astype(cdt))
        else:
            x = jax.lax.conv_general_dilated(
                x, p["w"].astype(cdt), (1, 1), "SAME",
                dimension_numbers=_DN, preferred_element_type=cdt)
        if (pool_impl in ("auto", "postact") and pooling == "max"
                and name not in layers and idx + 1 <= deepest
                and LAYER_ORDER[idx + 1].startswith("pool")):
            pending_bias = p["b"].astype(cdt)
            continue
        x = x + p["b"].astype(cdt)
        x = _relu(x)
        x = checkpoint_name(x, f"vgg_block{name[4]}")
        if name in layers:
            taps[name] = x[0]
    return taps
