"""Fused VGG block-1/2 Pallas kernel (round-3 conv campaign, VERDICT r2
weak #3): conv1_1→conv1_2→pool1→conv2_1→conv2_2→pool2 PLUS the masked
Gram partial sums of conv1_1/conv2_1, in ONE kernel — activations never
leave VMEM.

Why this shape can win where two previous conv-kernel campaigns lost
(ARCHITECTURE.md "layout-tax lesson"): the earlier per-op kernels sat
BETWEEN XLA conv-emitter-layout tensors and paid ~33 MB relayout copies
at every custom-call boundary. This kernel's boundary is different:
  * inputs are the (H, W, 3) image (tiny) and the (K, h, w) masks;
  * outputs are the (K, C, C) Gram sums (tiny) and the pool2 tensor
    (the ONE block-1/2 tensor that re-enters XLA convs);
so blocks 1-2's ~100 MB of per-step activation traffic and the relayout
copies around it disappear from HBM entirely. The backward (kernel B)
recomputes the block in-kernel — 3× conv FLOPs on an MXU that idles at
30-50% here anyway — and emits only the image-gradient rows.

Layout: all in-kernel activations are C-major (C, rows, W) — with W in
lanes and rows in sublanes there is ZERO tile padding at C∈{64, 128}
(the HWC strip tensors' 2-4× padding expansion is what OOMed the 4096²
batch path), and every conv tap is a clean (Cout, Cin)×(Cin, M) MXU
contraction with M = rows·W ≥ 16k.

Grid: row tiles of TB own rows with an 8-row halo, supplied by passing
the row-padded image three times with (i, i+1, i+2) block maps — the
same no-manual-DMA halo trick as the proven Laplacian kernel
(ops/laplacian_pallas.py). Gram outputs accumulate across the
sequential grid (@pl.when(i == 0) init).

Semantics match vgg.stream_block12_grams exactly: zero-padded
PREPROCESSED image rows outside the global image, activation re-zeroing
after every conv (the reference zero-pads activations), and the
tie-splitting max-pool backward.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 8                 # input rows each side (two convs+pool, twice)
_B12 = ("conv1_1", "conv1_2", "conv2_1", "conv2_2")
_CINOUT = {"conv1_1": (3, 64), "conv1_2": (64, 64),
           "conv2_1": (64, 128), "conv2_2": (128, 128)}


def _shift(x: jnp.ndarray, dr: int, dc: int) -> jnp.ndarray:
    """(C, R, W) shifted by (dr, dc) with zero fill (SAME padding)."""
    pr = (max(dr, 0), max(-dr, 0))
    pc = (max(dc, 0), max(-dc, 0))
    y = jnp.pad(x, ((0, 0), pr, pc))
    r, w = x.shape[1], x.shape[2]
    return y[:, pr[1]:pr[1] + r, pc[1]:pc[1] + w]


def _conv_bias_relu(x, w, b, rowmask, cdt, row_chunk=0):
    """SAME 3×3 conv + bias + ReLU + row re-zeroing, C-major.

    x (Cin, R, W), w (3, 3, Cin, Cout) HWIO, b (Cout,), rowmask (R,)
    fp32 → (Cout, R, W) in `cdt`. Nine (Cout, Cin)×(Cin, M) MXU taps
    accumulated in fp32; `row_chunk` bounds the fp32 accumulator's rows
    (VMEM: full-R fp32 at C=64/W=512 is 6 MB — chunking halves peak)."""
    cin, r, wd = x.shape
    cout = w.shape[3]
    # pad ONCE; every tap is then a pure slice of the padded buffer
    # (an earlier per-tap pad/shift spent more VPU time copying than
    # the MXU spent computing)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1)))
    chunk = row_chunk or r
    outs = []
    for r0 in range(0, r, chunk):
        r1 = min(r0 + chunk, r)
        rr = r1 - r0
        acc = jnp.zeros((cout, rr * wd), jnp.float32)
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                # out[t, c] += w[1+dr,1+dc]·x[t+dr, c+dc]; padded
                # coords: rows r0+1+dr .. , cols 1+dc ..
                xv = jax.lax.slice(
                    xp, (0, r0 + 1 + dr, 1 + dc),
                    (cin, r1 + 1 + dr, wd + 1 + dc)).reshape(
                    cin, rr * wd)
                acc = acc + jax.lax.dot_general(
                    w[1 + dr, 1 + dc].astype(cdt), xv,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        # bias add in 2-D: Mosaic rejects the (Cout,) -> (Cout,1,1)
        # trailing-dim shape cast a 3-D broadcast would need
        acc = acc + b.astype(jnp.float32)[:, None]
        y = acc.reshape(cout, rr, wd)
        # rowmask is (1, R, 1); slice keeps Mosaic on plain slice paths
        rm = jax.lax.slice_in_dim(rowmask, r0, r1, axis=1)
        y = jnp.maximum(y, 0.0) * rm
        outs.append(y.astype(cdt))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def _cols_pick(y: jnp.ndarray, offset: int) -> jnp.ndarray:
    """(C, R, W) -> (C, R, W/2) of columns 2j+offset.

    Mosaic's lane-dim toolbox (probed, round 3): strided slices,
    shrinking gathers, and >1-vreg same-shape gathers are all
    unsupported — but SELECTION IS LINEAR, so extract via an MXU
    matmul with a 0/1 selector (exact: one product per output)."""
    c, r, w = y.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (w, w // 2), 0)
    out = jax.lax.broadcasted_iota(jnp.int32, (w, w // 2), 1)
    sel = (row == 2 * out + offset).astype(y.dtype)
    g = jax.lax.dot_general(y.reshape(c * r, w), sel,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return g.reshape(c, r, w // 2).astype(y.dtype)


def _cols_interleave(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(C, R, W2) × 2 -> (C, R, 2·W2) with a in even, b in odd columns
    (two 0/1 placement matmuls — scatter is linear too)."""
    c, r, w2 = a.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (w2, 2 * w2), 0)
    out = jax.lax.broadcasted_iota(jnp.int32, (w2, 2 * w2), 1)
    u_e = (out == 2 * row).astype(a.dtype)
    u_o = (out == 2 * row + 1).astype(a.dtype)
    g = (jax.lax.dot_general(a.reshape(c * r, w2), u_e,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
         + jax.lax.dot_general(b.reshape(c * r, w2), u_o,
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32))
    return g.reshape(c, r, 2 * w2).astype(a.dtype)


def _rows_interleave(top: jnp.ndarray, bot: jnp.ndarray) -> jnp.ndarray:
    """(C, R2, W) × 2 -> (C, 2·R2, W), top in even rows (the
    [top|bot]-along-W concat + row-merge reshape is Mosaic-supported)."""
    c, r2, w = top.shape
    return jnp.concatenate([top, bot], axis=2).reshape(c, 2 * r2, w)


def _pool_quads(x: jnp.ndarray):
    """(C, R, W) -> the four 2×2-window corners, each (C, R/2, W/2)."""
    c, r, w = x.shape
    xr = x.reshape(c, r // 2, 2 * w)
    top, bot = xr[:, :, :w], xr[:, :, w:]      # rows 2i / 2i+1
    return (_cols_pick(top, 0), _cols_pick(top, 1),
            _cols_pick(bot, 0), _cols_pick(bot, 1))


def _pool2x2(x: jnp.ndarray, pooling: str) -> jnp.ndarray:
    """(C, R, W) -> (C, R/2, W/2)."""
    a, b, c, d = _pool_quads(x)
    if pooling == "max":
        return jnp.maximum(jnp.maximum(a, b), jnp.maximum(c, d))
    return (a + b + c + d) * 0.25


def _row_mask(i, tb: int, halo: int, h_total: int, r: int) -> jnp.ndarray:
    """(1, R, 1) fp32 mask of rows inside the global image at this
    level; tile i's local rows cover global rows
    [i·tb − halo, i·tb+tb+halo). Born 3-D (broadcasted_iota) so no
    Mosaic-unsupported trailing-dim shape casts are ever needed."""
    gi = (i * tb
          + jax.lax.broadcasted_iota(jnp.int32, (1, r, 1), 1) - halo)
    return ((gi >= 0) & (gi < h_total)).astype(jnp.float32)


def _forward_tile(x_ext, P, i, tb, h, pooling, cdt, row_chunk):
    """One tile's fwd: x_ext (3, TB+16, W) preprocessed image rows
    [i·tb − 8, i·tb + tb + 8). Returns all activations (C-major)."""
    r0 = x_ext.shape[1]
    mk = lambda lvl: _row_mask(i, tb >> lvl, HALO >> lvl, h >> lvl,
                               r0 >> lvl)
    a11 = _conv_bias_relu(x_ext.astype(cdt), P["conv1_1_w"],
                          P["conv1_1_b"], mk(0), cdt, row_chunk)
    a12 = _conv_bias_relu(a11, P["conv1_2_w"], P["conv1_2_b"], mk(0),
                          cdt, row_chunk)
    p1 = _pool2x2(a12, pooling)
    a21 = _conv_bias_relu(p1, P["conv2_1_w"], P["conv2_1_b"], mk(1),
                          cdt, row_chunk)
    a22 = _conv_bias_relu(a21, P["conv2_2_w"], P["conv2_2_b"], mk(1),
                          cdt, row_chunk)
    p2 = _pool2x2(a22, pooling)
    return {"a11": a11, "a12": a12, "p1": p1, "a21": a21, "a22": a22,
            "p2": p2}


def _partial_gram_cmajor(f, msq, cdt):
    """f (C, R, W) own rows; msq (K, R, W) squared soft mask →
    (K, C, C) fp32 partial sums G_k = f · (msq_k ∘ f)ᵀ. Per-class loop
    keeps the weighted operand at one class's VMEM footprint."""
    c = f.shape[0]
    p = f.shape[1] * f.shape[2]
    f2 = f.reshape(c, p)
    gs = []
    for k in range(msq.shape[0]):
        fw = (msq[k].astype(cdt)[None] * f).reshape(c, p)
        gs.append(jax.lax.dot_general(
            f2, fw, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))
    return jnp.stack(gs)


def _unpack_params(refs):
    P = {}
    idx = 0
    for name in _B12:
        P[name + "_w"] = refs[idx][:]
        P[name + "_b"] = refs[idx + 1][:]
        idx += 2
    return P


def _fwd_kernel(xm1, x0, xp1, m1sq, m2sq, *rest, tb, h, w, pooling,
                cdt_name, row_chunk):
    (w11, b11, w12, b12, w21, b21, w22, b22,
     g1_ref, g2_ref, p2_ref) = rest
    cdt = jnp.dtype(cdt_name)
    i = pl.program_id(0)
    P = _unpack_params((w11, b11, w12, b12, w21, b21, w22, b22))
    x_ext = jnp.concatenate(
        [xm1[:, tb - HALO:], x0[:], xp1[:, :HALO]], axis=1)
    acts = _forward_tile(x_ext, P, i, tb, h, pooling, cdt, row_chunk)
    f11 = acts["a11"][:, HALO:HALO + tb]
    f21 = acts["a21"][:, HALO // 2:HALO // 2 + tb // 2]
    g1 = _partial_gram_cmajor(f11, m1sq[:], cdt)
    g2 = _partial_gram_cmajor(f21, m2sq[:], cdt)

    @pl.when(i == 0)
    def _():
        g1_ref[:] = jnp.zeros(g1_ref.shape, g1_ref.dtype)
        g2_ref[:] = jnp.zeros(g2_ref.shape, g2_ref.dtype)

    g1_ref[:] += g1
    g2_ref[:] += g2
    p2_ref[:] = acts["p2"][:, HALO // 4:HALO // 4 + tb // 4]


def pack_weights(params, cdt, flip_conv1_1=True):
    """Flatten the four conv layers' (w, b); conv1_1's input channels
    BGR-flipped to match the preprocessed-no-flip convention."""
    out = []
    for name in _B12:
        w = params[name]["w"]
        if name == "conv1_1" and flip_conv1_1:
            w = w[:, :, ::-1, :]
        out.append(jnp.asarray(w).astype(jnp.dtype(cdt)))
        out.append(jnp.asarray(params[name]["b"]).astype(jnp.float32))
    return tuple(out)


def _specs(k, tb, w, cdt):
    xspec = lambda off: pl.BlockSpec((3, tb, w),
                                     lambda i, _o=off: (0, i + _o, 0),
                                     memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(
        shape, lambda i, _s=shape: (0,) * len(_s),
        memory_space=pltpu.VMEM)
    m1spec = pl.BlockSpec((k, tb, w), lambda i: (0, i, 0),
                          memory_space=pltpu.VMEM)
    m2spec = pl.BlockSpec((k, tb // 2, w // 2), lambda i: (0, i, 0),
                          memory_space=pltpu.VMEM)
    wspecs = []
    for name in _B12:
        cin, cout = _CINOUT[name]
        wspecs += [full((3, 3, cin, cout)), full((cout,))]
    return xspec, full, m1spec, m2spec, wspecs


def _pool2x2_sum(x: jnp.ndarray) -> jnp.ndarray:
    a, b, c, d = _pool_quads(x)
    return a + b + c + d


def _pool2x2_bwd(dp, x_pre, pooling, cdt):
    """Backward of the 2×2 pool: dp (C, R/2, W/2), x_pre (C, R, W)
    pre-pool activations -> (C, R, W) in cdt. Max uses the same
    tie-splitting semantics as vgg._maxpool2's default backward
    (equality mask in the compute dtype, grad divided by tie count).
    Computed per window CORNER at half resolution, then assembled with
    the gather-based interleaves (no upsample primitive needed)."""
    dp32 = dp.astype(jnp.float32)
    if pooling == "avg":
        q = dp32 * 0.25
        ga = gb = gc = gd = q
    else:
        # comparisons in fp32 — the v5e VPU rejects bf16 compares
        # ("Target does not support this comparison"); bf16 values are
        # exactly representable in fp32, so equality is unchanged
        a, b, c, d = [t.astype(jnp.float32) for t in _pool_quads(x_pre)]
        m = jnp.maximum(jnp.maximum(a, b), jnp.maximum(c, d))
        ea = (a == m).astype(jnp.float32)
        eb = (b == m).astype(jnp.float32)
        ec = (c == m).astype(jnp.float32)
        ed = (d == m).astype(jnp.float32)
        q = dp32 / (ea + eb + ec + ed)
        ga, gb, gc, gd = q * ea, q * eb, q * ec, q * ed
    top = _cols_interleave(ga, gb)
    bot = _cols_interleave(gc, gd)
    return _rows_interleave(top, bot).astype(cdt)


def _conv3x3_T(dz, w, cdt, row_chunk=0):
    """Input-gradient of the SAME 3×3 conv, C-major: dz (Cout, R, W),
    w (3, 3, Cin, Cout) -> dx (Cin, R, W) in cdt.
    dx[t, c] = Σ_{dr,dc} w[1+dr, 1+dc] · dz[t−dr, c−dc] (contract Cout)."""
    cout, r, wd = dz.shape
    cin = w.shape[2]
    xp = jnp.pad(dz, ((0, 0), (1, 1), (1, 1)))   # pad once, slice taps
    chunk = row_chunk or r
    outs = []
    for r0 in range(0, r, chunk):
        r1 = min(r0 + chunk, r)
        rr = r1 - r0
        acc = jnp.zeros((cin, rr * wd), jnp.float32)
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                # v[t] = dz[t − dr] → padded rows r0+1−dr..
                xv = jax.lax.slice(
                    xp, (0, r0 + 1 - dr, 1 - dc),
                    (cout, r1 + 1 - dr, wd + 1 - dc)).reshape(
                    cout, rr * wd)
                acc = acc + jax.lax.dot_general(
                    w[1 + dr, 1 + dc].astype(cdt), xv,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        outs.append(acc.reshape(cin, rr, wd))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
    return out


def _gram_df(f, msq, dg, cdt):
    """Cotangent of the Gram partial sums wrt the tap, C-major.
    G_k = f·(msq_k∘f)ᵀ  ⇒  dF = Σ_k (dG_k + dG_kᵀ)·(msq_k∘f)."""
    c, r, wd = f.shape
    out = jnp.zeros((c, r * wd), jnp.float32)
    for k in range(msq.shape[0]):
        fw = (msq[k][None].astype(cdt) * f).reshape(c, r * wd)
        s = (dg[k] + dg[k].T).astype(cdt)
        out = out + jax.lax.dot_general(
            s, fw, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return out.reshape(c, r, wd)


def _ext3(prev, cur, nxt, halo):
    """Assemble the halo-extended rows from three block passes."""
    tb = cur.shape[1]
    return jnp.concatenate(
        [prev[:, tb - halo:], cur[:], nxt[:, :halo]], axis=1)


def _bwd_deep_kernel(a21m, a21c, a21p, a22m, a22c, a22p,
                     dp2m, dp2c, dp2p, m2m, m2c, m2p,
                     dg2, w21, w22, dp1_ref, *, tb, w, pooling,
                     cdt_name, row_chunk):
    """B2: pool2/conv2_2/conv2_1 backward for one tile -> dp1 own rows.

    Every input is an EXACT residual/cotangent, so each intermediate
    cotangent is a pure local stencil of exact fields — no cross-tile
    accumulation exists; halo margins only absorb stencil shrinkage."""
    cdt = jnp.dtype(cdt_name)
    h2 = 4                                # halo at half resolution
    a21e = _ext3(a21m, a21c, a21p, h2)    # (128, tb/2+8, W/2)
    a22e = _ext3(a22m, a22c, a22p, h2)
    dp2e = _ext3(dp2m, dp2c, dp2p, h2 // 2)
    m2e = _ext3(m2m, m2c, m2p, h2)
    da22 = _pool2x2_bwd(dp2e, a22e, pooling, cdt)
    dz22 = da22 * (a22e.astype(jnp.float32) > 0).astype(cdt)
    da21 = _conv3x3_T(dz22, w22[:], cdt, row_chunk)
    da21 = da21 + _gram_df(a21e, m2e, dg2[:], cdt)
    dz21 = (da21 * (a21e.astype(jnp.float32) > 0)).astype(cdt)
    dp1 = _conv3x3_T(dz21, w21[:], cdt, row_chunk)
    dp1_ref[:] = dp1[:, h2:h2 + tb // 2].astype(cdt)


def _bwd_shallow_kernel(a11m, a11c, a11p, dp1m, dp1c, dp1p,
                        m1m, m1c, m1p, dg1, w11, w12, b12,
                        dx_ref, *, tb, h, w, pooling, cdt_name,
                        row_chunk):
    """B1: recompute conv1_2 from the a11 residual, then pool1/conv1_2/
    conv1_1 backward -> dx own rows (fp32, C-major)."""
    cdt = jnp.dtype(cdt_name)
    i = pl.program_id(0)
    h1 = HALO
    a11e = _ext3(a11m, a11c, a11p, h1)    # (64, tb+16, W)
    dp1e = _ext3(dp1m, dp1c, dp1p, h1 // 2)
    m1e = _ext3(m1m, m1c, m1p, h1)
    r0 = a11e.shape[1]
    rowmask = _row_mask(i, tb, h1, h, r0)
    a12e = _conv_bias_relu(a11e, w12[:], b12[:], rowmask, cdt,
                           row_chunk)
    da12 = _pool2x2_bwd(dp1e, a12e, pooling, cdt)
    dz12 = da12 * (a12e.astype(jnp.float32) > 0).astype(cdt)
    da11 = _conv3x3_T(dz12, w12[:], cdt, row_chunk)
    da11 = da11 + _gram_df(a11e, m1e, dg1[:], cdt)
    dz11 = (da11 * (a11e.astype(jnp.float32) > 0)).astype(cdt)
    dx = _conv3x3_T(dz11, w11[:], cdt, row_chunk)   # (3, tb+16, W) f32
    dx_ref[:] = dx[:, h1:h1 + tb]


def _pad_tiles(x, tb):
    """One zero tile on each side of the row axis (axis 1 of C-major)."""
    return jnp.pad(x, ((0, 0), (tb, tb), (0, 0)))


@partial(jax.jit, static_argnames=("tb", "pooling", "compute_dtype",
                                   "row_chunk", "interpret"))
def block12_bwd(a11, a12_unused, a21, a22, dp2, m1sq, m2sq, dg1, dg2,
                weights: tuple, *, tb: int = 32,
                pooling: str = "max", compute_dtype: str = "bfloat16",
                row_chunk: int = 0, interpret: bool = False):
    """Backward of block12_fwd wrt the preprocessed image.

    a11/a21/a22: C-major residuals from the forward; dp2: pool2
    cotangent (128, H/4, W/4) C-major; dg1/dg2: Gram-sum cotangents.
    Returns dx (3, H, W) fp32 C-major. Two kernels: B2 (deep half →
    dp1) then B1 (shallow half → dx); a12 is recomputed in-kernel from
    a11 (cheaper than reading a 2×-larger residual set)."""
    (w11, b11, w12, b12, w21, b21, w22, b22) = weights
    cdt = jnp.dtype(compute_dtype)
    c2, h2, w2 = a21.shape
    h, w = h2 * 2, w2 * 2
    k = m1sq.shape[0]
    tb2, tb4 = tb // 2, tb // 4
    n_tiles = h // tb
    full = lambda shape: pl.BlockSpec(
        shape, lambda i, _s=shape: (0,) * len(_s),
        memory_space=pltpu.VMEM)

    def three(x, tbl):
        xp = _pad_tiles(x, tbl)
        spec = lambda off: pl.BlockSpec(
            (x.shape[0], tbl, x.shape[2]),
            lambda i, _o=off: (0, i + _o, 0), memory_space=pltpu.VMEM)
        return xp, [spec(0), spec(1), spec(2)]

    a21p, s21 = three(a21, tb2)
    a22p, s22 = three(a22, tb2)
    dp2p, sdp2 = three(dp2, tb4)
    m2p, sm2 = three(m2sq.astype(jnp.float32), tb2)
    dp1 = pl.pallas_call(
        partial(_bwd_deep_kernel, tb=tb, w=w, pooling=pooling,
                cdt_name=str(cdt), row_chunk=row_chunk),
        grid=(n_tiles,),
        in_specs=s21 + s22 + sdp2 + sm2 + [
            full((k, 128, 128)),
            full((3, 3, 64, 128)), full((3, 3, 128, 128))],
        out_specs=pl.BlockSpec((64, tb2, w2), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64, h2, w2), cdt),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(a21p, a21p, a21p, a22p, a22p, a22p, dp2p, dp2p, dp2p,
      m2p, m2p, m2p, dg2.astype(jnp.float32),
      w21.astype(cdt), w22.astype(cdt))

    a11p, s11 = three(a11, tb)
    dp1p, sdp1 = three(dp1, tb2)
    m1p, sm1 = three(m1sq.astype(jnp.float32), tb)
    dx = pl.pallas_call(
        partial(_bwd_shallow_kernel, tb=tb, h=h, w=w, pooling=pooling,
                cdt_name=str(cdt), row_chunk=row_chunk),
        grid=(n_tiles,),
        in_specs=s11 + sdp1 + sm1 + [
            full((k, 64, 64)),
            full((3, 3, 3, 64)), full((3, 3, 64, 64)), full((64,))],
        out_specs=pl.BlockSpec((3, tb, w), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, h, w), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(a11p, a11p, a11p, dp1p, dp1p, dp1p, m1p, m1p, m1p,
      dg1.astype(jnp.float32), w11.astype(cdt), w12.astype(cdt),
      b12.astype(jnp.float32))
    return dx


def make_block12_fused(*, tb_f: int = 32, tb_b: int = 32,
                       pooling: str = "max",
                       compute_dtype: str = "bfloat16",
                       row_chunk: int = 24,
                       interpret: bool | None = None):
    """Build the differentiable fused block-1/2 op.

    Returns f(image_pre, m1sq, m2sq, weights) -> (g1, g2, pool2_cmajor)
    with a custom VJP wrt `image_pre` only (weights/masks are loop
    constants in this workload — their cotangents are zeros).
    `interpret=None` auto-selects interpreter mode off-TPU so the CPU
    test suite exercises the real kernel code."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    @jax.custom_vjp
    def fused(image_pre, m1sq, m2sq, weights):
        g1, g2, p2, *_ = _fwd_with_residuals(image_pre, m1sq, m2sq,
                                             weights)
        return g1, g2, p2

    def _fwd_with_residuals(image_pre, m1sq, m2sq, weights):
        return block12_fwd_res(image_pre, m1sq, m2sq, weights,
                               tb=tb_f, pooling=pooling,
                               compute_dtype=compute_dtype,
                               row_chunk=row_chunk, interpret=interpret)

    def fwd(image_pre, m1sq, m2sq, weights):
        g1, g2, p2, a11, a21, a22 = _fwd_with_residuals(
            image_pre, m1sq, m2sq, weights)
        return (g1, g2, p2), (m1sq, m2sq, weights, a11, a21, a22)

    def bwd(res, cots):
        m1sq, m2sq, weights, a11, a21, a22 = res
        dg1, dg2, dp2 = cots
        dx = block12_bwd(a11, None, a21, a22, dp2, m1sq, m2sq,
                         dg1, dg2, weights, tb=tb_b, pooling=pooling,
                         compute_dtype=compute_dtype,
                         row_chunk=row_chunk, interpret=interpret)
        dimg = dx.transpose(1, 2, 0)      # back to (H, W, 3)
        zero = lambda t: jax.tree.map(jnp.zeros_like, t)
        return dimg, zero(m1sq), zero(m2sq), zero(weights)

    fused.defvjp(fwd, bwd)
    return fused


@partial(jax.jit, static_argnames=("tb", "pooling", "compute_dtype",
                                   "row_chunk", "interpret"))
def block12_fwd_res(image_pre, m1sq, m2sq, weights: tuple, *,
                    tb: int = 32, pooling: str = "max",
                    compute_dtype: str = "bfloat16",
                    row_chunk: int = 24, interpret: bool = False):
    """block12_fwd variant that ALSO emits the a11/a21/a22 residuals the
    backward kernels need (own rows, C-major, compute dtype)."""
    h, w = image_pre.shape[:2]
    k = m1sq.shape[0]
    cdt = jnp.dtype(compute_dtype)
    n_tiles = h // tb
    x = image_pre.transpose(2, 0, 1).astype(jnp.float32)
    x = jnp.pad(x, ((0, 0), (tb, tb), (0, 0)))
    xspec, full, m1spec, m2spec, wspecs = _specs(k, tb, w, cdt)
    row_out = lambda c, tbl, wl: pl.BlockSpec(
        (c, tbl, wl), lambda i: (0, i, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        partial(_fwd_res_kernel, tb=tb, h=h, w=w, pooling=pooling,
                cdt_name=str(cdt), row_chunk=row_chunk),
        grid=(n_tiles,),
        in_specs=[xspec(0), xspec(1), xspec(2), m1spec, m2spec] + wspecs,
        out_specs=(full((k, 64, 64)), full((k, 128, 128)),
                   row_out(128, tb // 4, w // 4),
                   row_out(64, tb, w), row_out(128, tb // 2, w // 2),
                   row_out(128, tb // 2, w // 2)),
        out_shape=(jax.ShapeDtypeStruct((k, 64, 64), jnp.float32),
                   jax.ShapeDtypeStruct((k, 128, 128), jnp.float32),
                   jax.ShapeDtypeStruct((128, h // 4, w // 4), cdt),
                   jax.ShapeDtypeStruct((64, h, w), cdt),
                   jax.ShapeDtypeStruct((128, h // 2, w // 2), cdt),
                   jax.ShapeDtypeStruct((128, h // 2, w // 2), cdt)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, x, x, m1sq.astype(jnp.float32), m2sq.astype(jnp.float32),
      *weights)


def _fwd_res_kernel(xm1, x0, xp1, m1sq, m2sq, *rest, tb, h, w, pooling,
                    cdt_name, row_chunk):
    (w11, b11, w12, b12, w21, b21, w22, b22,
     g1_ref, g2_ref, p2_ref, a11_ref, a21_ref, a22_ref) = rest
    cdt = jnp.dtype(cdt_name)
    i = pl.program_id(0)
    P = _unpack_params((w11, b11, w12, b12, w21, b21, w22, b22))
    x_ext = jnp.concatenate(
        [xm1[:, tb - HALO:], x0[:], xp1[:, :HALO]], axis=1)
    acts = _forward_tile(x_ext, P, i, tb, h, pooling, cdt, row_chunk)
    f11 = acts["a11"][:, HALO:HALO + tb]
    f21 = acts["a21"][:, HALO // 2:HALO // 2 + tb // 2]
    g1 = _partial_gram_cmajor(f11, m1sq[:], cdt)
    g2 = _partial_gram_cmajor(f21, m2sq[:], cdt)

    @pl.when(i == 0)
    def _():
        g1_ref[:] = jnp.zeros(g1_ref.shape, g1_ref.dtype)
        g2_ref[:] = jnp.zeros(g2_ref.shape, g2_ref.dtype)

    g1_ref[:] += g1
    g2_ref[:] += g2
    p2_ref[:] = acts["p2"][:, HALO // 4:HALO // 4 + tb // 4]
    a11_ref[:] = f11
    a21_ref[:] = f21
    a22_ref[:] = acts["a22"][:, HALO // 2:HALO // 2 + tb // 2]


@partial(jax.jit, static_argnames=("tb", "pooling", "compute_dtype",
                                   "row_chunk", "interpret"))
def block12_fwd(image_pre: jnp.ndarray, m1sq: jnp.ndarray,
                m2sq: jnp.ndarray, weights: tuple, *, tb: int = 32,
                pooling: str = "max", compute_dtype: str = "bfloat16",
                row_chunk: int = 24, interpret: bool = False):
    """image_pre: (H, W, 3) PREPROCESSED image (_preprocess_noflip);
    m1sq/m2sq: (K, H, W) / (K, H/2, W/2) SQUARED soft masks;
    weights: `pack_weights(...)` output (conv1_1 pre-flipped).
    Returns (g1 (K,64,64) fp32 Gram SUMS, g2 (K,128,128) fp32 SUMS,
    pool2 (128, H/4, W/4) C-major in compute dtype)."""
    h, w = image_pre.shape[:2]
    k = m1sq.shape[0]
    cdt = jnp.dtype(compute_dtype)
    n_tiles = h // tb
    x = image_pre.transpose(2, 0, 1).astype(jnp.float32)
    x = jnp.pad(x, ((0, 0), (tb, tb), (0, 0)))   # zero tile ring
    xspec, full, m1spec, m2spec, wspecs = _specs(k, tb, w, cdt)

    return pl.pallas_call(
        partial(_fwd_kernel, tb=tb, h=h, w=w, pooling=pooling,
                cdt_name=str(cdt), row_chunk=row_chunk),
        grid=(n_tiles,),
        in_specs=[xspec(0), xspec(1), xspec(2), m1spec, m2spec] + wspecs,
        out_specs=(full((k, 64, 64)), full((k, 128, 128)),
                   pl.BlockSpec((128, tb // 4, w // 4),
                                lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((k, 64, 64), jnp.float32),
                   jax.ShapeDtypeStruct((k, 128, 128), jnp.float32),
                   jax.ShapeDtypeStruct((128, h // 4, w // 4), cdt)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, x, x, m1sq.astype(jnp.float32), m2sq.astype(jnp.float32),
      *weights)
