"""Fused max-pool backward Pallas kernel (tie-splitting gradient).

Why (profiler, 512² step, round 2): the XLA lowering of the custom
max-pool VJP (models/vgg._maxpool2_bwd) materializes TWO 2× upsample
broadcasts of the pooled tensors plus a tie-count reduce_window —
~1.0 ms/step at 512² (vgg.py:184 [bwd] cluster), almost all of it HBM
traffic and layout copies around the 33 MB block-1 tensors. The math is
purely local to each 2×2 window, so one VPU kernel computes the whole
gradient in VMEM per tile: mask = (x == pooled max), ties = Σ mask over
the window, gx = mask · g / max(ties, 1) — identical tie-splitting
semantics, one read of x/y/g and one write of gx.

Layout strategy: W-pairs are folded into the LANE dimension outside the
kernel — x (H, W, C) viewed as (H, W/2, 2C) is a free bitcast — so every
in-kernel op is a lane slice, a major-axis reshape, or an axis-1
broadcast; no tiny (…, 2, C) minor dims (a 5-D formulation padded each
(2, C) slab to (8, 128) tiles and blew the 16 MB VMEM budget 8×). All
math stays in the pool's native dtype, matching the XLA path op-for-op.

SPMD caveat (CLAUDE.md): Pallas custom calls do not partition — the
multi-device paths force the XLA implementation (cfg.pool_impl="xla"),
exactly as for the Laplacian kernel.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Rows of the POOLED tensor per grid step; 8 divides every even VGG
# pool height ≥ 16 and keeps the fp32 working set ≤ ~6 MB of VMEM at
# W=512, C=64 (the largest pool-1 shape per 512² image).
_HT = 8

# Only worth a kernel where the XLA broadcasts are HBM-scale.
MIN_ELEMENTS = 1 << 20


def _bwd_kernel(x_ref, y_ref, g_ref, gx_ref):
    ht, w2, c = y_ref.shape                 # pooled-resolution tile
    x2 = x_ref[:]                           # (2ht, w2, 2c): col pairs in lanes
    xa, xb = x2[:, :, :c], x2[:, :, c:]     # even / odd columns
    y = y_ref[:]
    g = g_ref[:]

    def up_rows(t):                         # (ht, w2, c) -> (2ht, w2, c)
        t = jnp.broadcast_to(jnp.expand_dims(t, 1), (ht, 2, w2, c))
        return t.reshape(2 * ht, w2, c)

    y_up = up_rows(y)
    # equality in f32: Mosaic lacks bf16 cmpf on this target; widening
    # is exact, so the mask is identical to a native bf16 compare
    yf = y_up.astype(jnp.float32)
    ma = (xa.astype(jnp.float32) == yf).astype(x2.dtype)
    mb = (xb.astype(jnp.float32) == yf).astype(x2.dtype)
    trow = ma + mb                          # per-row tie counts
    ties = jnp.sum(trow.reshape(ht, 2, w2, c), axis=1)
    q_up = up_rows(g / jnp.maximum(ties, jnp.asarray(1.0, g.dtype)))
    gx_ref[:] = jnp.concatenate([ma * q_up, mb * q_up], axis=2)


def maxpool2_bwd_pallas(x: jnp.ndarray, y: jnp.ndarray, g: jnp.ndarray
                        ) -> jnp.ndarray:
    """Gradient of 2×2/2 max pool w.r.t. x ((1, H, W, C), H and W even).

    x: pool input; y: pool output (1, H/2, W/2, C); g: cotangent of y.
    Returns gx with the cotangent split equally among tied maxima.
    """
    _, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    ht = _HT if h2 % _HT == 0 else 1
    grid = (h2 // ht,)
    x2 = x.reshape(h, w2, 2 * c)            # free bitcast: W-pairs -> lanes
    gx = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((2 * ht, w2, 2 * c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ht, w2, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ht, w2, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2 * ht, w2, 2 * c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w2, 2 * c), g.dtype),
    )(x2, y[0], g[0])
    return gx.reshape(1, h, w, c)


def use_pallas(x_shape, impl: str) -> bool:
    """Static routing (mirrors laplacian.py's impl switch).

    "auto" resolves to XLA: the kernel is bit-exact vs the XLA path at
    every VGG pool shape on-chip, but measured SLOWER in the full 512²
    step (54.7 vs 106.3 it/s) — its operands live in XLA's conv-emitter
    layouts, so the custom call's standard-layout constraint inserts
    relayout copies larger than the broadcasts it removes. The same
    layout tax sank a streamed masked-Gram kernel (gram_pallas.py);
    point kernels between TPU convs only win if they accept the emitter
    layouts, which Pallas cannot express. Kept as an opt-in baseline.
    """
    if impl != "pallas":
        return False
    _, h, w, c = x_shape
    # full-width tiles: beyond W·C ≈ 512·64 the per-band working set
    # blows the 16 MB scoped-VMEM stack (observed at 1024²: Mosaic
    # rejects with a clean compile error, 19.6 M > 16 M) — the kernel
    # would need W-tiling to go wider
    return (h % 2 == 0 and w % 2 == 0 and h * w * c >= MIN_ELEMENTS
            and w * c <= 512 * 64)
