"""Fused Pallas 3×3 SAME convolution for the VGG feature stack.

XLA's conv lowering on TPU inserts layout copies around every
convolution (HLO inspection at 512²: ~2.5 ms/step of `copy` ops, ~26% of
the optimization step). This kernel keeps activations in their natural
(row, width, channel) VMEM layout — width on sublanes, channels on
lanes — and expresses the 3×3 conv as nine MXU matmuls, one per tap,
accumulated in fp32:

    y[r, x, co] = Σ_{dy,dx}  X[r+dy-1, x+dx-1, :] @ W[dy, dx, :, co]

Structure (lessons from laplacian_pallas.py apply):
  * grid over row bands; 1-row halos come from passing the input three
    times with (i, i+1, i+2) block maps over a zero-padded tile ring —
    BlockSpec pipelining only, no manual DMA (hand DMA crashed this
    environment's runtime);
  * the input is pre-padded by ONE column on each side, so all nine taps
    are STATIC sublane slices — no rotates (`pltpu.roll` cannot rotate
    bf16 data: "Rotate with non-32-bit data");
  * the weight block's index map is constant, so the pipeline fetches
    the (3, 3, Cin, Cout) tensor once and reuses it for every band;
  * per-instance body is 9 dots + adds — small enough that Mosaic
    compile stays in seconds (a >15 min compile looks exactly like a
    wedged chip through this environment's remote-compile tunnel).

Used for the interior VGG layers (Cin ≥ 64); conv1_1's Cin=3 contraction
is MXU-hostile and stays on XLA. The input-gradient pass reuses the SAME
kernel with spatially flipped, in/out-transposed weights (VGG weights
are constants of the optimization — no weight gradients exist), wired as
a `custom_vjp` in `vgg.py`.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 10 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_tile_rows(w: int, cin: int, cout: int, dtype_bytes: int) -> int:
    """Row band: 3 input block copies (double-buffered by the pipeline),
    the assembled slab, the fp32 accumulator, outputs, and weights must
    fit VMEM."""
    weight_bytes = 9 * cin * cout * dtype_bytes
    for tr in (64, 32, 16, 8):
        slab = (tr + 2) * (w + 2) * cin * dtype_bytes
        acc = tr * w * cout * 4
        out = tr * w * cout * dtype_bytes
        if 7 * slab + acc + 2 * out + weight_bytes <= _VMEM_BUDGET:
            return tr
    return 4


def _conv3x3_kernel(xp_ref, xc_ref, xn_ref, w_ref, out_ref, *, tr: int):
    """One row band: y = Σ_taps sliced(X) @ W[tap], fp32 accumulation.

    Output row r, col x sums X[r+dy-1, x+dx-1] @ W[dy, dx]. The slab
    carries ±1 halo rows (from the prev/next blocks) and ±1 halo columns
    (wrapper padding), so every tap is slab[dy:dy+TR, dx:dx+W]."""
    slab = jnp.concatenate(
        [xp_ref[-1:], xc_ref[...], xn_ref[:1]], axis=0)
    _, wp2, cin = slab.shape
    w = wp2 - 2
    cout = out_ref.shape[-1]

    acc = jnp.zeros((tr * w, cout), jnp.float32)
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            x_tap = slab[dy:dy + tr, dx:dx + w].reshape(tr * w, cin)
            acc = acc + jnp.dot(x_tap, w_ref[dy, dx],
                                preferred_element_type=jnp.float32)
    out_ref[...] = acc.reshape(tr, w, cout).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def _conv3x3_padded(xp: jnp.ndarray, w: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """Core pallas_call. xp: (Hp, W+2, Cin) with one zero pad tile of
    rows above and below the image and one pad column per side;
    w: (3, 3, Cin, Cout)."""
    hp, wp2, cin = xp.shape
    wd = wp2 - 2
    cout = w.shape[-1]
    tr = _pick_tile_rows(wd, cin, cout, xp.dtype.itemsize)
    n_tiles = hp // tr - 2

    in_spec = lambda f: pl.BlockSpec((tr, wp2, cin), f,
                                     memory_space=pltpu.VMEM)
    kernel = partial(_conv3x3_kernel, tr=tr)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((hp - 2 * tr, wd, cout),
                                       xp.dtype),
        grid=(n_tiles,),
        in_specs=[
            in_spec(lambda i: (i, 0, 0)),
            in_spec(lambda i: (i + 1, 0, 0)),
            in_spec(lambda i: (i + 2, 0, 0)),
            pl.BlockSpec((3, 3, cin, cout), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tr, wd, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(_VMEM_BUDGET * 1.6)),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * 9 * (hp - 2 * tr) * wd * cin * cout),
            transcendentals=0,
            bytes_accessed=int((hp * wd * (cin + cout)
                                + 9 * cin * cout) * xp.dtype.itemsize)),
        interpret=interpret,
    )(xp, xp, xp, w)


def conv3x3_same(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """SAME 3×3 convolution: (H, W, Cin) × (3, 3, Cin, Cout) ->
    (H, W, Cout), stride 1, zero padding. Batch-free (vmap for batches).
    """
    h, wd, cin = x.shape
    cout = w.shape[-1]
    tr = _pick_tile_rows(wd, cin, cout, x.dtype.itemsize)
    hp = _round_up(h, tr) + 2 * tr
    xp = jnp.pad(x, ((tr, hp - h - tr), (1, 1), (0, 0)))
    interpret = jax.default_backend() != "tpu"
    y = _conv3x3_padded(xp, w.astype(x.dtype), interpret)
    return y[:h]


def flip_transpose_weights(w: jnp.ndarray) -> jnp.ndarray:
    """Weights for the input-gradient conv: rotate 180° spatially and
    swap in/out channels. dL/dx = conv3x3_same(dL/dy, flip_T(w))."""
    return jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))
