"""Fused Pallas TPU kernel for the matting-Laplacian matvec.

The XLA implementation in `laplacian.py` lowers to ~10 separate
reduce_window/elementwise HLO ops and materializes every intermediate
(s, q, t, b, α, β — ~28 HBM planes round-tripped per matvec). This kernel
fuses BOTH box-filter passes and all the pointwise 3-vector algebra into a
single VMEM-resident pipeline: HBM traffic drops to the information-
theoretic floor — read 17 planes (14 stats + 3 channels of v), write 3.

Structure (SURVEY.md §3.5):
  * data is plane-major (P, H, W) so the last dim is the image width —
    lane-aligned (128) after padding, sublanes run down image rows;
  * grid over row bands; each instance DMAs a (P, TR+4, Wp) slab (2-row
    halo per side for the two radius-1 box passes) from HBM into VMEM
    scratch and writes a halo-free (3, TR, Wp) output band;
  * box filters are built from static shifts: rows by slicing the slab,
    columns by pad+slice (no wraparound — edge neighbors read zeros,
    matching the zero-padded "SAME" convention of the XLA path);
  * all math is fp32 on the VPU: Λ entries reach ~|w|/ε ≈ 1e6, and bf16
    roundoff there provably breaks the operator's PSD property.

Stats are packed once per stylization by `pack_stats` (plane order:
img×3, μ×3, Λ-sym×6, valid, win_count).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .laplacian import WIN, LaplacianStats

N_STATS = 14  # img(3) + mu(3) + lam_sym(6) + valid(1) + win_count(1)
_LANE = 128
# target VMEM budget for the slab pipeline (bytes)
_VMEM_BUDGET = 8 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_tile_rows(wp: int) -> int:
    """Largest power-of-two row band whose working set fits the budget."""
    # ~34 live fp32 planes of (TR+4, Wp) during the per-channel loop
    for tr in (256, 128, 64, 32, 16, 8):
        if 34 * (tr + 4) * wp * 4 <= _VMEM_BUDGET:
            return tr
    return 8


def pack_stats(stats: LaplacianStats) -> jnp.ndarray:
    """LaplacianStats -> (14, H, W) fp32 plane stack (kernel layout)."""
    img = jnp.moveaxis(stats.image, -1, 0)          # (3, H, W)
    mu = jnp.moveaxis(stats.mu, -1, 0)              # (3, H, W)
    lam = stats.lam                                  # (H, W, 3, 3)
    lam6 = jnp.stack([lam[..., 0, 0], lam[..., 0, 1], lam[..., 0, 2],
                      lam[..., 1, 1], lam[..., 1, 2], lam[..., 2, 2]])
    return jnp.concatenate(
        [img, mu, lam6, stats.valid[None], stats.win_count[None]],
        axis=0).astype(jnp.float32)


def _col_ids(x):
    return jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)


def _shift_left(x):
    """out[:, j] = x[:, j+1]; rightmost column reads 0.

    Circular roll + edge mask: Mosaic lowers rolls natively, whereas the
    obvious pad+slice emits an unsupported offset-shifted concatenate.
    """
    rolled = pltpu.roll(x, x.shape[1] - 1, 1)  # shift must be non-negative
    return jnp.where(_col_ids(x) == x.shape[1] - 1, 0.0, rolled)


def _shift_right(x):
    """out[:, j] = x[:, j-1]; leftmost column reads 0."""
    rolled = pltpu.roll(x, 1, 1)
    return jnp.where(_col_ids(x) == 0, 0.0, rolled)


def _cbox(x):
    """3-tap column box sum with zero edges."""
    return x + _shift_left(x) + _shift_right(x)


def _rbox(x):
    """3-tap row box sum: input (R, W) -> output (R-2, W) at interior rows."""
    return x[:-2] + x[1:-1] + x[2:]


def _lap_matvec_kernel(stats_hbm, v_hbm, out_ref, sstats, sv, sems,
                       *, tile_rows: int):
    i = pl.program_id(0)
    r0 = i * tile_rows
    cp_s = pltpu.make_async_copy(
        stats_hbm.at[:, pl.ds(r0, tile_rows + 4), :], sstats, sems.at[0])
    cp_v = pltpu.make_async_copy(
        v_hbm.at[:, pl.ds(r0, tile_rows + 4), :], sv, sems.at[1])
    cp_s.start()
    cp_v.start()
    cp_s.wait()
    cp_v.wait()

    inv_w = np.float32(1.0 / WIN)
    img = [sstats[m] for m in range(3)]
    # center-row (1..TR+2) views of the window-center statistics
    mu_c = [sstats[3 + m][1:-1] for m in range(3)]
    lam_c = [sstats[6 + n][1:-1] for n in range(6)]
    valid_c = sstats[12][1:-1]
    nwin_o = sstats[13][2:-2]
    # symmetric 3×3 row indexing into the 6-entry packing
    sym = ((0, 1, 2), (1, 3, 4), (2, 4, 5))

    for c in range(3):
        vc = sv[c]
        s = _rbox(_cbox(vc))                       # (TR+2, Wp)
        t = [None] * 3
        for m in range(3):
            t[m] = _rbox(_cbox(img[m] * vc)) - mu_c[m] * s
        b = [None] * 3
        for m in range(3):
            b[m] = (lam_c[sym[m][0]] * t[0] + lam_c[sym[m][1]] * t[1]
                    + lam_c[sym[m][2]] * t[2])
        mub = mu_c[0] * b[0] + mu_c[1] * b[1] + mu_c[2] * b[2]
        alpha = (mub - s) * inv_w * valid_c
        y = nwin_o * vc[2:-2] + _rbox(_cbox(alpha))
        for m in range(3):
            beta_m = -inv_w * b[m] * valid_c
            y = y + img[m][2:-2] * _rbox(_cbox(beta_m))
        out_ref[c] = y


@partial(jax.jit, static_argnames=("interpret",))
def _matvec_padded(stats_packed: jnp.ndarray, v3: jnp.ndarray,
                   interpret: bool = False) -> jnp.ndarray:
    """Core pallas_call on pre-padded (14, Hp, Wp) stats / (3, Hp, Wp) v."""
    _, hp, wp = stats_packed.shape
    tr = _pick_tile_rows(wp)
    n_tiles = (hp - 4) // tr
    kernel = partial(_lap_matvec_kernel, tile_rows=tr)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((3, hp - 4, wp), jnp.float32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (3, tr, wp), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((N_STATS, tr + 4, wp), jnp.float32),
            pltpu.VMEM((3, tr + 4, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(_VMEM_BUDGET * 1.8)),
        cost_estimate=pl.CostEstimate(
            flops=int(120 * hp * wp), transcendentals=0,
            bytes_accessed=int((N_STATS + 6) * hp * wp * 4)),
        interpret=interpret,
    )(stats_packed, v3)


def _pad_planes(x: jnp.ndarray, hp: int, wp: int,
                row_off: int = 2) -> jnp.ndarray:
    """Zero-pad (P, H, W) planes to (P, hp, wp) with a `row_off` top halo."""
    p, h, w = x.shape
    return jnp.pad(x, ((0, 0), (row_off, hp - h - row_off), (0, wp - w)))


def matvec_pallas(stats: LaplacianStats, v: jnp.ndarray) -> jnp.ndarray:
    """y = L·v via the fused Pallas kernel. v: (H, W) or (H, W, C<=3)."""
    squeeze = v.ndim == 2
    if squeeze:
        v = v[..., None]
    h, w, c = v.shape
    if c > 3:
        raise ValueError(f"at most 3 channels, got {c}")

    stats_packed = pack_stats(stats)
    wp = _round_up(max(w, _LANE), _LANE)
    tr = _pick_tile_rows(wp)
    hp = _round_up(h, tr) + 4

    v3 = jnp.moveaxis(v.astype(jnp.float32), -1, 0)     # (c, H, W)
    if c < 3:
        v3 = jnp.pad(v3, ((0, 3 - c), (0, 0), (0, 0)))
    sp = _pad_planes(stats_packed, hp, wp)
    vp = _pad_planes(v3, hp, wp)
    # compiled Mosaic on TPU; interpreter elsewhere (CPU tests)
    interpret = jax.default_backend() != "tpu"
    y = _matvec_padded(sp, vp, interpret)               # (3, hp-4, wp)
    y = jnp.moveaxis(y[:c, : h, : w], 0, -1)
    return y[..., 0] if squeeze else y
