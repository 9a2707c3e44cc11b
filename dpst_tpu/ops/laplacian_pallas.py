"""Fused Pallas TPU kernel for the matting-Laplacian matvec.

The XLA implementation in `laplacian.py` lowers to ~10 separate
reduce_window/elementwise HLO ops and round-trips every intermediate
(s, q, t, b, α, β — ~28 HBM planes per matvec). This kernel fuses BOTH
box-filter passes and all the pointwise 3-vector algebra into one
VMEM-resident pipeline per row band.

Structure (SURVEY.md §3.5):
  * data is plane-major (P, H, W): width is the lane dimension (padded to
    128), image rows are sublanes, planes are the outer dim;
  * grid over row bands. Halo handling uses no manual DMA (a hand-rolled
    HBM→VMEM copy faulted this environment's TPU runtime): each input is
    passed THREE times with block index maps (i-1, i, i+1) clamped to the
    grid — the Pallas pipeline double-buffers the fetches — and the
    2-row halo slab is assembled in VMEM with boundary rows zeroed under
    `jnp.where`, matching the zero-padded "SAME" convention of the XLA
    path;
  * box filters are static shifts: rows via slab slicing, columns via
    `pltpu.roll` + edge masks (Mosaic lowers rolls natively; pad+slice
    emits an unsupported offset concatenate);
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
_VMEM_BUDGET = 10 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_tile_rows(wp: int) -> int:
    """Row band size: 3 stats copies + 3 one-plane v copies (double-
    buffered by the pipeline) + kernel temporaries, all (tr, wp) fp32."""
    for tr in (256, 128, 64, 32, 16, 8):
        if 110 * tr * wp * 4 <= _VMEM_BUDGET:
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
    """out[:, j] = x[:, j+1]; rightmost column reads 0."""
    rolled = pltpu.roll(x, x.shape[1] - 1, 1)
    return jnp.where(_col_ids(x) == x.shape[1] - 1, 0.0, rolled)


def _shift_right(x):
    """out[:, j] = x[:, j-1]; leftmost column reads 0."""
    rolled = pltpu.roll(x, 1, 1)
    return jnp.where(_col_ids(x) == 0, 0.0, rolled)


def _cbox(x):
    """3-tap column box sum with zero edges."""
    return x + _shift_left(x) + _shift_right(x)


def _rbox(x):
    """3-tap row box sum: (R, W) -> (R-2, W) at interior rows."""
    return x[:-2] + x[1:-1] + x[2:]


def _slab(top_ref, cur_ref, bot_ref, plane):
    """(TR+4, Wp) halo'd rows of one plane.

    The wrapper pads a full zero tile of rows on each side of the image,
    so halo blocks exist for every grid step (index maps are plain
    affine functions of i — no traced clamping) and boundary halos read
    zeros, matching the zero-padded "SAME" convention. Halos are fetched
    as 2-ROW blocks (not whole neighbor tiles): per band the pipeline
    moves TR+4 rows per plane instead of 3·TR — HBM traffic within ~7%
    of the information floor."""
    return jnp.concatenate(
        [top_ref[plane, -2:], cur_ref[plane], bot_ref[plane, :2]],
        axis=0)


def _lap_matvec_kernel(sp_ref, sc_ref, sn_ref, vp_ref, vc_ref, vn_ref,
                       out_ref):
    """One (row-band, channel) grid cell.

    The channel is the FASTEST grid dimension and the stats block index
    maps ignore it, so the Pallas pipeline fetches each stats slab once
    per row band and reuses it for all three channels; only the 1-plane
    v slab changes per grid step. Keeping one channel per instance also
    cuts the unrolled body (Mosaic compile time) and live VMEM ~3×.
    """
    inv_w = np.float32(1.0 / WIN)

    st = [_slab(sp_ref, sc_ref, sn_ref, m) for m in range(N_STATS)]
    img = st[0:3]
    mu_c = [st[3 + m][1:-1] for m in range(3)]     # center rows 1..TR+2
    lam_c = [st[6 + m][1:-1] for m in range(6)]
    valid_c = st[12][1:-1]
    nwin_o = st[13][2:-2]
    sym = ((0, 1, 2), (1, 3, 4), (2, 4, 5))

    vc = _slab(vp_ref, vc_ref, vn_ref, 0)
    s = _rbox(_cbox(vc))                           # (TR+2, Wp)
    t = [_rbox(_cbox(img[m] * vc)) - mu_c[m] * s for m in range(3)]
    b = [lam_c[sym[m][0]] * t[0] + lam_c[sym[m][1]] * t[1]
         + lam_c[sym[m][2]] * t[2] for m in range(3)]
    mub = mu_c[0] * b[0] + mu_c[1] * b[1] + mu_c[2] * b[2]
    alpha = (mub - s) * inv_w * valid_c
    y = nwin_o * vc[2:-2] + _rbox(_cbox(alpha))
    for m in range(3):
        beta_m = -inv_w * b[m] * valid_c
        y = y + img[m][2:-2] * _rbox(_cbox(beta_m))
    out_ref[0] = y


@partial(jax.jit, static_argnames=("interpret",))
def _matvec_padded(stats_packed: jnp.ndarray, v3: jnp.ndarray,
                   interpret: bool = False) -> jnp.ndarray:
    """Core pallas_call on padded (14, Hp, Wp) stats / (3, Hp, Wp) v."""
    _, hp, wp = stats_packed.shape           # hp includes ±1 pad tile
    tr = _pick_tile_rows(wp)
    n_tiles = hp // tr - 2                   # interior (image) tiles

    def spec(p, rows, index_fn):
        return pl.BlockSpec((p, rows, wp), index_fn,
                            memory_space=pltpu.VMEM)

    # grid = (row band, channel); channel fastest. Stats maps ignore c →
    # the pipeline re-fetches stats only when the band changes.
    # Tile i's rows live at padded rows [(i+1)·TR, (i+2)·TR). Halos come
    # from 8-ROW blocks adjacent to the band (Mosaic requires sublane
    # block sizes divisible by 8; the kernel slices the 2 rows it
    # needs), so each band moves TR+16 rows per plane instead of 3·TR.
    eighth = tr // 8
    s_top = lambda i, c: (0, (i + 1) * eighth - 1, 0)
    s_cur = lambda i, c: (0, i + 1, 0)
    s_bot = lambda i, c: (0, (i + 2) * eighth, 0)
    v_top = lambda i, c: (c, (i + 1) * eighth - 1, 0)
    v_cur = lambda i, c: (c, i + 1, 0)
    v_bot = lambda i, c: (c, (i + 2) * eighth, 0)

    return pl.pallas_call(
        _lap_matvec_kernel,
        out_shape=jax.ShapeDtypeStruct((3, hp - 2 * tr, wp),
                                       jnp.float32),
        grid=(n_tiles, 3),
        in_specs=[
            spec(N_STATS, 8, s_top), spec(N_STATS, tr, s_cur),
            spec(N_STATS, 8, s_bot),
            spec(1, 8, v_top), spec(1, tr, v_cur), spec(1, 8, v_bot),
        ],
        out_specs=spec(1, tr, lambda i, c: (c, i, 0)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(_VMEM_BUDGET * 1.6)),
        cost_estimate=pl.CostEstimate(
            flops=int(120 * hp * wp), transcendentals=0,
            bytes_accessed=int((N_STATS + 6) * hp * wp * 4)),
        interpret=interpret,
    )(stats_packed, stats_packed, stats_packed, v3, v3, v3)


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
    # one zero pad tile above and below the image rows (halo source)
    hp = _round_up(h, tr) + 2 * tr

    v3 = jnp.moveaxis(v.astype(jnp.float32), -1, 0)     # (c, H, W)
    if c < 3:
        v3 = jnp.pad(v3, ((0, 3 - c), (0, 0), (0, 0)))
    sp = jnp.pad(stats_packed,
                 ((0, 0), (tr, hp - h - tr), (0, wp - w)))
    vp = jnp.pad(v3, ((0, 0), (tr, hp - h - tr), (0, wp - w)))
    # compiled Mosaic on TPU; interpreter elsewhere (CPU tests)
    interpret = jax.default_backend() != "tpu"
    y = _matvec_padded(sp, vp, interpret)               # (3, hp-2tr, wp)
    y = jnp.moveaxis(y[:c, :h, :w], 0, -1)
    return y[..., 0] if squeeze else y
