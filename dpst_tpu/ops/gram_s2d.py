"""Streamed masked-Gram Pallas kernel for the s2d block-1 tap.

Round-3 campaigns #10/#12/#13. #10 built the kernel and measured it
NEGATIVE in context at 1024² (39.7 vs 40.3 it/s) despite a standalone
win — the autopsy blamed ~530 GFLOP of selection matmuls plus layout
copies around the feed. #12 made it load-bearing anyway: past the
fused block bound (2048²-class conv1_1) the nd consumption is
impossible, and routing s2d through this kernel beats the
standard-conv fallback (whose 3-channel transposed-conv input gradient
alone was 17.7 ms/step, 15%). #13 then fixed the feed itself —
memory-order bitcast flatten + divisor band heights (see
pack_mask_consts/_pick_trw) — killing ~12 ms/step of copies at 2048²
(8.92 → 10.02 it/s) and FLIPPING the #10 verdict at every measured
shape above 512²-class (1024² K=4 44.5 vs 40.2, K=8 35.9 vs 34.3,
768² 66.9 vs 65.7; 512² stays nd at 190 vs 178). "auto" resolves
accordingly (optimize._s2d_gram_kernel: kernel at h·w ≥ 2^19 or any
non-fused route). The #10 autopsy's surviving half: the 0/1 selection
matmuls that regroup parities in-VMEM are ~530 GFLOP/step at K=4,
C=64 — as much MXU work as the Gram contraction itself — which is why
512² (where that fixed overhead is the largest fraction of the step)
still prefers the nd path. The other half — "the flatten/pad
materialize because the tap arrives in the conv emitter's layout" —
was #13's target, not an inherent cost. Full history in
ARCHITECTURE.md.

The s2d block-1 lowering (vgg._block1_s2d,
SURVEY.md §2 comp.4 style loss on the conv1_1 tap) leaves the layer in
grid form (S, nr, nc, 4C) with the four pixel parities as channel
groups. The production XLA consumption (losses.masked_grams_nd_multi
over four parity lane-slices) is exact but materializes the
(..., K·C) mask-weighted block — ~555 MB/step of HBM traffic at 1024²
(~5.7 ms standalone, round-3 scan A/B).

A first kernel draft consumed a pre-sliced, pre-biased (P, 4C) tensor
plus its transpose; the trace showed the two kernels at 1.9 ms and
**3.8 ms/step of XLA-side movement around them** (operand transpose
1.12 ms, bias-add 0.71, pad 0.65, two non-bitcast reshapes 1.15,
interior-slice + cotangent re-assembly 0.85). This version eliminates
that movement:

  * the kernel consumes the FULL grid tensor flattened to (P, 4C) —
    a layout bitcast — padded once to the band multiple (halo /
    garbage / pad rows carry zero mask weight, so both the Gram and
    its cotangent are exact without any interior slice);
  * bias + ReLU happen in-kernel (the raw tap is the only operand);
  * no transposed operand: the forward contracts over the SUBLANE dim
    (dot_general ((0,), (0,))), per class one full-width DIAG-BLOCK
    contraction (campaign #14 — no lane regrouping, full-tile ops only
    per CLAUDE.md rule 9):

      cooked = max(z + b, 0)                        (TRW, 4C)
      m256   = m2t · E2                             (TRW, K·4C)
      out_j += cookedᵀ · (cooked ∘ m256_j) [dim-0]  (4C, 4C) per class

    whose four diagonal (C, C) parity blocks the caller sums into the
    masked Gram (the cross-parity blocks are garbage it never reads);

  backward (dG_j masked to the diag blocks + symmetrized into s_j,
  stacked into `wall` = [s_0 | … | s_{K-1}], each parity-block-diag):
      t   = cooked · wall                           (TRW, K·4C)
      acc = Σ_j (t ∘ m256)[:, j-block]              (TRW, 4C)
      df  = acc ∘ relu'(z + b)                      exact = _relu's VJP
    (the two product-rule terms coincide: ((C∘M)·s) = (C·s)∘M exactly
    when s is parity-block-diagonal and M parity-constant).

E2[q, j·4C + par·C + c] = 1 iff q = par·K + j (the mask lane spread)
is the one loop-invariant 0/1 constant, packed once per run
(pack_mask_consts → StylizeConstants; XLA's while-LICM refuses to
hoist buffers this size when built in-loop).

SPMD caveat (CLAUDE.md): like every Pallas custom call this does not
partition under a sharded mesh; sharded paths keep the XLA nd Gram
(config.spmd_safe canonicalizes s2d_gram="nd").

Round 5: the production kernel is the TWO-HALF v2 form below
(_fwd_kernel2/_bwd_kernel2, s2d_gram="pallas"/auto) — same operands,
half the main-dot FLOPs; the #14 full-width form above stays as the
"pallas1" measured-history opt-in. A/Bs and the derivation live at the
v2 section comment and ARCHITECTURE.md round-5.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_VMEM_BUDGET = 48 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_trw(p: int, k: int, c4: int) -> int:
    """Band height: prefer an EXACT divisor of P (then the XLA-side
    pad-to-band-multiple and its backward slice never exist — at 2048²
    they were 4.2 ms/step of full-tensor copies, campaign #13), else
    the largest sublane-multiple whose working set fits VMEM (zp/m2t
    blocks + the f32 temps + the (TRW, K·4C) m256 and t bands).
    16-row steps keep bf16 (16, 128) tiling happy."""
    kc4 = k * c4

    def fits(trw: int) -> bool:
        work = (trw * c4 * (2 + 4 + 4)      # z, zf, cooked
                + trw * _LANE * 2           # m2t block
                + 3 * trw * kc4 * 4         # m256 + t/prod f32
                + kc4 * c4 * 4)             # out / wall
        return work <= _VMEM_BUDGET

    for trw in range(4096, 255, -16):
        if p % trw == 0 and fits(trw):
            return trw
    for trw in (4096, 2048, 1024, 512, 256, _LANE):
        if trw > max(p, _LANE):
            continue
        if fits(trw):
            return trw
    return _LANE


def _e2_const(k: int, c: int, dtype) -> jnp.ndarray:
    """The loop-invariant 0/1 mask-expansion matrix (built once per
    run): E2 (128, K·4C) with E2[q, j·4C + par·C + c1] = 1 iff
    q = par·K + j — one dot expands m2t's (parity, class) lane stack
    to per-class full-width (4C) m² rows (constant over the C channels
    of each parity group)."""
    c4 = 4 * c
    col = jnp.arange(k * c4)
    j, par = col // c4, (col % c4) // c
    qe = jnp.arange(_LANE)[:, None]
    return (qe == (par * k + j)[None, :]).astype(dtype)


def _fwd_kernel(zp_ref, m2t_ref, bias_ref, e2_ref, out_ref,
                *, k: int, c: int):
    # Campaign #14 diag-block form: per class, ONE full-width
    # contraction G256_j = cookedᵀ(cooked ∘ m256_j) — (4C, 4C) whose
    # four diagonal (C, C) parity blocks are the masked Gram (the
    # caller sums them; off-diagonal cross-parity blocks are garbage it
    # never reads). Replaces the #10 REP/E selection-matmul regrouping:
    # 2·P·4C·K·4C vs 2·P·4C·4KC·2 + 2·P·128·4KC FLOPs — 40% less MXU
    # work at K=4 despite computing 4× the needed output, because no
    # lane regrouping is ever materialized (rule 9: full-tile ops only).
    i = pl.program_id(0)
    cdt = zp_ref.dtype
    c4 = 4 * c
    # cook in f32 (no bf16 compares on TPU), round back to the compute
    # dtype at the same point the XLA nd path rounds its weighted block
    zf = zp_ref[...].astype(jnp.float32) + bias_ref[0].astype(jnp.float32)
    cooked = jnp.maximum(zf, 0.0).astype(cdt)                # (TRW, 4C)
    m256 = jnp.dot(m2t_ref[...], e2_ref[...],
                   preferred_element_type=jnp.float32)       # (TRW, K·4C)
    cf = cooked.astype(jnp.float32)
    parts = []
    for j in range(k):
        wj = (cf * m256[:, j * c4:(j + 1) * c4]).astype(cdt)
        parts.append(jax.lax.dot_general(
            cooked, wj, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))             # (4C, 4C)
    part = jnp.concatenate(parts, axis=0)                    # (K·4C, 4C)

    @pl.when(i == 0)
    def _init():
        out_ref[...] = part

    @pl.when(i > 0)
    def _acc():
        out_ref[...] += part


def _bwd_kernel(zp_ref, m2t_ref, bias_ref, wall_ref, e2_ref, df_ref,
                *, k: int, c: int):
    # dF = relu'(zf) ∘ Σ_j (cooked · s_j) ∘ m256_j with s_j the
    # symmetrized block-diagonal dG256_j (wall = [s_0 | … | s_{K-1}]).
    # The two product-rule terms collapse into one: s_j is parity-block
    # -diagonal and m256_j is constant per parity lane group, so
    # ((C∘M)·s)  =  (C·s)∘M exactly.
    zf = zp_ref[...].astype(jnp.float32) + bias_ref[0].astype(jnp.float32)
    cb = jnp.maximum(zf, 0.0).astype(zp_ref.dtype)
    t = jnp.dot(cb, wall_ref[...],
                preferred_element_type=jnp.float32)      # (TRW, K·4C)
    m256 = jnp.dot(m2t_ref[...], e2_ref[...],
                   preferred_element_type=jnp.float32)   # (TRW, K·4C)
    prod = t * m256
    c4 = 4 * c
    acc = prod[:, :c4]
    for j in range(1, k):
        acc = acc + prod[:, j * c4:(j + 1) * c4]         # full-tile slice
    # _relu (jnp.maximum) tie-split subgradient: 1 / 0.5 / 0 at >0/=0/<0
    dprime = jnp.where(zf > 0.0, 1.0, jnp.where(zf == 0.0, 0.5, 0.0))
    df_ref[...] = (acc * dprime).astype(df_ref.dtype)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# --- round-5 v2: two-half diag-block form (s2d_gram="pallas2") ---------
# The #14 diag-block contraction is FLOP-inflated: per class it computes
# a (4C, 4C) full-width product of which only the four diagonal (C, C)
# parity blocks are real — 2·P·4C·K·4C = 137 GF/step of main dots at
# 1024² K=4 against ~34 GF of useful Gram work, and the kernel measures
# FLOP-bound at ~75% of MXU peak (412 GF total / 2.8 ms — round-5
# per-block tables). Splitting the 4C=256 lanes into two FULL-TILE
# 128-lane halves (parities {0,1} and {2,3} — rule 9: 128-aligned lane
# slices are legal where 64-lane regrouping is not) halves the garbage:
# per class and half, one (128, 128) product whose TWO diagonal (C, C)
# blocks are real — 2·P·128·K·128·2 = 68.7 GF, a 2× cut on the main
# dots (the m² lane-expansion dots are output-size-bound and stay
# ~69 GF). Same math, same operands; only e2 is replaced by the
# per-half expansion constant.


def _e2h_const(k: int, c: int, dtype) -> jnp.ndarray:
    """(2, 128, K·2C) per-half mask-expansion: half h covers parities
    (2h, 2h+1) as lane groups g∈{0,1}; e2h[h, q, j·2C + g·C + c1] = 1
    iff q = (2h + g)·K + j (m2t's lane packing, unchanged)."""
    c2 = 2 * c
    col = jnp.arange(k * c2)
    j, g = col // c2, (col % c2) // c
    qe = jnp.arange(_LANE)[None, :, None]
    h = jnp.arange(2)[:, None, None]
    return (qe == ((2 * h + g[None, None, :]) * k
                   + j[None, None, :])).astype(dtype)


def _fwd_kernel2(zp_ref, m2t_ref, bias_ref, e2h_ref, out_ref,
                 *, k: int, c: int):
    i = pl.program_id(0)
    cdt = zp_ref.dtype
    kc2 = k * 2 * c
    zf = zp_ref[...].astype(jnp.float32) + bias_ref[0].astype(jnp.float32)
    cooked = jnp.maximum(zf, 0.0).astype(cdt)              # (TRW, 4C)
    parts = []
    for h in range(2):
        ch = cooked[:, h * _LANE:(h + 1) * _LANE]          # full tile
        m2h = jnp.dot(m2t_ref[...], e2h_ref[h],
                      preferred_element_type=jnp.float32)  # (TRW, K·2C)
        cfh = ch.astype(jnp.float32)
        for j in range(k):
            wj = (cfh * m2h[:, j * _LANE:(j + 1) * _LANE]).astype(cdt)
            parts.append(jax.lax.dot_general(
                ch, wj, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))       # (128, 128)
    part = jnp.concatenate(parts, axis=0)                  # (2·K·128, 128)

    @pl.when(i == 0)
    def _init():
        out_ref[...] = part

    @pl.when(i > 0)
    def _acc():
        out_ref[...] += part


def _bwd_kernel2(zp_ref, m2t_ref, bias_ref, wall_ref, e2h_ref, df_ref,
                 *, k: int, c: int):
    zf = zp_ref[...].astype(jnp.float32) + bias_ref[0].astype(jnp.float32)
    cooked = jnp.maximum(zf, 0.0).astype(zp_ref.dtype)
    accs = []
    for h in range(2):
        ch = cooked[:, h * _LANE:(h + 1) * _LANE]
        th = jnp.dot(ch, wall_ref[h],
                     preferred_element_type=jnp.float32)   # (TRW, K·2C)
        m2h = jnp.dot(m2t_ref[...], e2h_ref[h],
                      preferred_element_type=jnp.float32)
        prod = th * m2h
        acc = prod[:, :_LANE]
        for j in range(1, k):
            acc = acc + prod[:, j * _LANE:(j + 1) * _LANE]
        accs.append(acc)
    acc_full = jnp.concatenate(accs, axis=1)               # (TRW, 4C)
    dprime = jnp.where(zf > 0.0, 1.0, jnp.where(zf == 0.0, 0.5, 0.0))
    df_ref[...] = (acc_full * dprime).astype(df_ref.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _gram_s2d2_raw(zp: jnp.ndarray, bias: jnp.ndarray, m2t: jnp.ndarray,
                   e2h: jnp.ndarray, k: int, c: int) -> jnp.ndarray:
    """v2 of _gram_s2d_raw: (2·K·128, 128) f32 — half h, class j at rows
    [(h·K + j)·128, ...), whose two diagonal (C, C) lane-group blocks
    hold the parity-(2h+g) Gram contributions. Same operand contract as
    v1 (raw zp rows, zero mask weight on halo/garbage/pad)."""
    out, _ = _gram_s2d2_fwd(zp, bias, m2t, e2h, k, c)
    return out


def _gram_s2d2_fwd(zp, bias, m2t, e2h, k, c):
    p, c4 = zp.shape
    trw = _pick_trw(p, k, c4)
    assert p % trw == 0, (p, trw)
    kc2 = k * 2 * c
    out = pl.pallas_call(
        partial(_fwd_kernel2, k=k, c=c),
        grid=(p // trw,),
        in_specs=[
            pl.BlockSpec((trw, c4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((trw, _LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, c4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, _LANE, kc2), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2 * k * _LANE, _LANE),
                               lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * k * _LANE, _LANE),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(_VMEM_BUDGET * 1.8)),
        cost_estimate=pl.CostEstimate(
            flops=2 * p * _LANE * k * _LANE * 2
            + 2 * p * _LANE * kc2 * 2,
            transcendentals=0,
            bytes_accessed=(p * c4 + p * _LANE) * zp.dtype.itemsize),
        interpret=_interpret(),
    )(zp, m2t, bias, e2h)
    return out, (zp, bias, m2t, e2h)


def _gram_s2d2_bwd(k, c, res, dg):
    zp, bias, m2t, e2h = res
    p, c4 = zp.shape
    cdt = zp.dtype
    trw = _pick_trw(p, k, c4)
    # dg: (2·K·128, 128); mask to the two diagonal lane-group blocks of
    # each (half, class) row band and symmetrize — cross-group garbage
    # must never leak a cotangent (same rule as v1)
    dg = dg.astype(jnp.float32).reshape(2, k, 2 * c, 2 * c)
    dgb = jnp.stack([dg[:, :, g * c:(g + 1) * c, g * c:(g + 1) * c]
                     for g in range(2)], axis=2)       # (2, K, 2, C, C)
    s = dgb + jnp.swapaxes(dgb, 3, 4)
    # wall[h, g·C + c1, j·2C + g·C + c2] = s[h, j, g, c1, c2]
    w6 = jnp.einsum("hjgab,gq->hgajqb", s, jnp.eye(2, dtype=jnp.float32))
    wall = w6.reshape(2, 2 * c, k * 2 * c)
    df = pl.pallas_call(
        partial(_bwd_kernel2, k=k, c=c),
        grid=(p // trw,),
        in_specs=[
            pl.BlockSpec((trw, c4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((trw, _LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, c4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 2 * c, k * 2 * c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, _LANE, k * 2 * c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((trw, c4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, c4), cdt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(_VMEM_BUDGET * 1.8)),
        cost_estimate=pl.CostEstimate(
            flops=2 * p * _LANE * k * _LANE * 2
            + 2 * p * _LANE * k * 2 * c * 2,
            transcendentals=0,
            bytes_accessed=(2 * p * c4 + p * _LANE) * zp.dtype.itemsize),
        interpret=_interpret(),
    )(zp, m2t, bias, wall.astype(cdt), e2h)
    return (df, jnp.zeros_like(bias), jnp.zeros_like(m2t),
            jnp.zeros_like(e2h))


_gram_s2d2_raw.defvjp(_gram_s2d2_fwd, _gram_s2d2_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _gram_s2d_raw(zp: jnp.ndarray, bias: jnp.ndarray, m2t: jnp.ndarray,
                  e2: jnp.ndarray, k: int, c: int) -> jnp.ndarray:
    """Unnormalized per-class full-width masked Grams of the RAW
    full-grid s2d tap: (Ppad, 4C) rows (bias NOT added, halo/garbage/
    pad rows allowed — their mask weight must be zero) -> (K, 4C, 4C)
    f32 whose four diagonal (C, C) parity blocks hold the per-parity
    Gram contributions (off-diagonal cross-parity blocks are garbage
    the caller discards). m2t is the (Ppad, 128) per-(parity·K+j) m²
    column stack (lanes 4K.. zero); e2 is _e2_const. Gradient flows to
    zp only."""
    out, _ = _gram_s2d_fwd(zp, bias, m2t, e2, k, c)
    return out


def _gram_s2d_fwd(zp, bias, m2t, e2, k, c):
    p, c4 = zp.shape
    trw = _pick_trw(p, k, c4)
    assert p % trw == 0, (p, trw)
    kc4 = k * c4
    out = pl.pallas_call(
        partial(_fwd_kernel, k=k, c=c),
        grid=(p // trw,),
        in_specs=[
            pl.BlockSpec((trw, c4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((trw, _LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, c4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_LANE, kc4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kc4, c4), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kc4, c4), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(_VMEM_BUDGET * 1.8)),
        cost_estimate=pl.CostEstimate(
            flops=2 * p * kc4 * c4 + 2 * p * _LANE * kc4,
            transcendentals=0,
            bytes_accessed=(p * c4 + p * _LANE) * zp.dtype.itemsize),
        interpret=_interpret(),
    )(zp, m2t, bias, e2)
    return out.reshape(k, c4, c4), (zp, bias, m2t, e2)


def _gram_s2d_bwd(k, c, res, dg):
    zp, bias, m2t, e2 = res
    p, c4 = zp.shape
    cdt = zp.dtype
    trw = _pick_trw(p, k, c4)
    # dG arrives (K, 4C, 4C); only the diagonal parity blocks are real
    # (the caller built G from them) — mask to them before symmetrizing
    # so the forward's cross-parity garbage blocks can never leak a
    # cotangent.
    dg = dg.astype(jnp.float32)
    dgk = jnp.stack([dg[:, par * c:(par + 1) * c, par * c:(par + 1) * c]
                     for par in range(4)], axis=1)        # (K, 4, C, C)
    s = dgk + jnp.swapaxes(dgk, 2, 3)                     # (K, 4, C, C)
    # wall = [s_0 | … | s_{K-1}] (4C, K·4C), each s_j parity-block-
    # diagonal: wall[par·C + c1, j·4C + par·C + c2] = s[j, par, c1, c2].
    w5 = jnp.einsum("jpab,pq->pajqb", s, jnp.eye(4, dtype=jnp.float32))
    wall = w5.reshape(c4, k * c4)
    df = pl.pallas_call(
        partial(_bwd_kernel, k=k, c=c),
        grid=(p // trw,),
        in_specs=[
            pl.BlockSpec((trw, c4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((trw, _LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, c4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c4, k * c4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_LANE, k * c4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((trw, c4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, c4), cdt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(_VMEM_BUDGET * 1.8)),
        cost_estimate=pl.CostEstimate(
            flops=2 * p * c4 * k * c4 + 2 * p * _LANE * k * c4,
            transcendentals=0,
            bytes_accessed=(2 * p * c4 + p * _LANE) * zp.dtype.itemsize),
        interpret=_interpret(),
    )(zp, m2t, bias, wall.astype(cdt), e2)
    # bias/m2t/e2 cotangents are never requested (constants in the
    # loss graph) — the zeros are DCE'd by XLA.
    return (df, jnp.zeros_like(bias), jnp.zeros_like(m2t),
            jnp.zeros_like(e2))


_gram_s2d_raw.defvjp(_gram_s2d_fwd, _gram_s2d_bwd)


def pack_mask_consts(m_parts, nr: int, o0: int, compute_dtype,
                     norm: str = "m2"):
    """Pack the four per-parity SLICED grid masks (vgg.s2d_masks_par,
    each (K, S, ro, co) f32 — interior rows o0..o0+ro of the full
    nr-row grid) into the kernel's loop-invariant constants:

      m2t  (Ppad, 128)   m² of the FULL grid (halo rows / row padding
                         zero), lane par·K + j; P = S·nr·co
      e2   (128, K·4C)   the 0/1 mask-expansion constant (_e2_const)
                         in the compute dtype
      nvec (K,) f32      the union normalizer (Σm² / Σm per norm)

    Built OUTSIDE the optimization scan (StylizeConstants — XLA's
    while-LICM refuses to hoist buffers this size)."""
    cdt = jnp.dtype(compute_dtype)
    k, s, ro, co = m_parts[0].shape
    full = [jnp.pad(mp, ((0, 0), (0, 0), (o0, nr - o0 - ro), (0, 0)))
            for mp in m_parts]
    # pixel order (nr, co, S) — the PRODUCER's memory order: the conv
    # emitter lays the grid tensor out batch-second-minor
    # ({3,0,2,1:T(8,128)}), so the tap-side transpose(1,2,0,3)+reshape
    # is a layout BITCAST where the logical (S, nr, co) flatten was a
    # 2.1 ms relayout copy + 3.0 ms materialized reshape at 2048²
    # (campaign #13; the Gram is pixel-permutation-invariant, any
    # consistent order is exact)
    flat = jnp.stack([mp.transpose(0, 2, 3, 1).reshape(k, -1)
                      for mp in full])                     # (4, K, P)
    p = flat.shape[2]
    trw = _pick_trw(p, k, 4 * 64)
    ppad = _round_up(p, trw)
    mb = flat.astype(cdt)
    m2 = (mb * mb).reshape(4 * k, p)
    m2t = jnp.pad(m2.T, ((0, ppad - p), (0, _LANE - 4 * k)))
    m32 = flat.astype(jnp.float32)
    nvec = (jnp.sum(m32 * m32, axis=(0, 2)) if norm == "m2"
            else jnp.sum(m32, axis=(0, 2)))
    return m2t, _e2_const(k, 64, cdt), nvec


def masked_grams_s2d_tap(tap, m2t: jnp.ndarray, e2: jnp.ndarray,
                         nvec: jnp.ndarray,
                         eps: float = 1e-8,
                         v2: bool = False) -> jnp.ndarray:
    """All K masked Grams of an s2d block-1 tap via the Pallas kernel:
    S2dTap (raw, with bias) × packed mask constants -> (K, C, C),
    normalized like losses.masked_grams_nd_multi over the parity union.

    The XLA-side work is ONE flatten (a bitcast of the producer's own
    layout, campaign #13) and the (K, C, C) diagonal-block extraction
    of the kernel's (K, 4C, 4C) output — no interior slice, no bias
    materialization, no transposed operand, no relayout copies, and
    (at divisor band heights) no pad."""
    d = tap.data
    assert tap.bias is not None, "kernel path consumes RAW s2d taps"
    s, nr, nc, c4 = d.shape
    c = c4 // 4
    k = nvec.shape[0]
    p = s * nr * nc
    # memory-order flatten (see pack_mask_consts): a bitcast of the
    # emitter's batch-second-minor layout; m2t rows are packed in the
    # same (nr, nc, S) pixel order
    zp = d.transpose(1, 2, 0, 3).reshape(p, c4)
    ppad = m2t.shape[0]
    if ppad != p:
        zp = jnp.pad(zp, ((0, ppad - p), (0, 0)))
    bias8 = jnp.broadcast_to(tap.bias.reshape(1, c4), (8, c4))
    if v2:
        # two-half diag-block form (round 5): 2× less main-dot work,
        # same operands; e2h is derived, e2 unused
        e2h = _e2h_const(k, c, jnp.dtype(d.dtype))
        raw = _gram_s2d2_raw(zp, bias8, m2t, e2h, k, c)
        g4 = raw.reshape(2, k, 2 * c, 2 * c)
        g = sum(g4[h, :, gg * c:(gg + 1) * c, gg * c:(gg + 1) * c]
                for h in range(2) for gg in range(2))    # (K, C, C)
        return g / jnp.maximum(nvec, eps)[:, None, None]
    g256 = _gram_s2d_raw(zp, bias8, m2t, e2, k, c)       # (K, 4C, 4C)
    g = sum(g256[:, par * c:(par + 1) * c, par * c:(par + 1) * c]
            for par in range(4))                         # (K, C, C)
    return g / jnp.maximum(nvec, eps)[:, None, None]
