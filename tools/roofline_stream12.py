#!/usr/bin/env python
"""Bytes/FLOPs roofline of the 4096² streamed step (VERDICT r3 item 1).

Models the config6 program (bench.py: 4096², max_classes=4, bf16
compute, photorealism on, stream12 auto -> 32 strips x 128 rows + 8-row
halo, in-scan s2d block 1, remat="b2") as a per-segment table of
MANDATORY HBM traffic and MXU FLOPs, and compares the roofline sum with
the measured step time. "Mandatory" counts every inter-op tensor the
schedule must move (write once + read per consumer) and every conv/dot
contraction, but NO relayout copies — so measured/roofline > 1 is
layout/scheduling tax, and ≈ 1 means the step is traffic-bound as built.

Pass policy (what runs when, per optimizer step):
  fwd      — the forward scan: block-1/2 per strip, blocks 3-5 standard
  remat    — the backward re-running each strip body (jax.checkpoint);
             "b2" saves block-2 conv outputs + pool results, so only
             block 1 + the Gram weightings re-run
  bwd      — input gradients (frozen VGG: dx only, no dw) + Gram VJPs +
             the Laplacian matvec (shared fwd/bwd via custom_vjp) +
             Adam update

No JAX needed; shapes mirror models/vgg.py stream_block12_grams and
ops/losses.py routing (gram_route). Run: python tools/roofline_stream12.py
"""
import argparse

BF16 = 2
F32 = 4

# v5e (one chip)
HBM_GBPS = 819.0
MXU_TFLOPS = 197.0   # bf16


def conv_cost(p_out, cin, cout, k2):
    return 2.0 * p_out * cin * cout * k2


class Tally:
    def __init__(self):
        self.rows = []

    def add(self, seg, gflop=0.0, gb=0.0, note=""):
        self.rows.append([seg, gflop, gb, note])

    def table(self, measured_ms=None):
        out = ["| segment | GFLOP | GB | ms@MXU | ms@HBM | bound |",
               "|---|---|---|---|---|---|"]
        tf = tb = 0.0
        t_crit = 0.0
        for seg, gflop, gb, note in self.rows:
            ms_f = gflop / MXU_TFLOPS
            ms_b = gb / HBM_GBPS * 1000.0
            tf += gflop
            tb += gb
            t_crit += max(ms_f, ms_b)
            bound = "MXU" if ms_f > ms_b else "HBM"
            out.append(f"| {seg}{' — ' + note if note else ''} | "
                       f"{gflop:.0f} | {gb:.2f} | {ms_f:.1f} | "
                       f"{ms_b:.1f} | {bound} |")
        ms_f = tf / MXU_TFLOPS
        ms_b = tb / HBM_GBPS * 1000.0
        out.append(f"| **total** | {tf:.0f} | {tb:.2f} | {ms_f:.1f} | "
                   f"{ms_b:.1f} | crit-path {t_crit:.1f} ms |")
        if measured_ms:
            out.append(
                f"\nmeasured {measured_ms:.0f} ms/step -> "
                f"{tf / measured_ms:.1f} TF/s eff "
                f"({100 * tf / measured_ms / MXU_TFLOPS:.0f}% MXU), "
                f"{tb / measured_ms * 1000:.0f} GB/s eff "
                f"({100 * tb / measured_ms * 1000 / HBM_GBPS:.0f}% HBM); "
                f"measured / max-overlap roofline = "
                f"{measured_ms / max(ms_f, ms_b):.2f}x, "
                f"/ no-overlap roofline = {measured_ms / t_crit:.2f}x")
        return "\n".join(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=4096)
    ap.add_argument("--strips", type=int, default=32)
    ap.add_argument("--halo", type=int, default=8)
    ap.add_argument("--k", type=int, default=4, help="mask classes")
    ap.add_argument("--measured-ms", type=float, default=704.0,
                    help="measured step time (1.42 it/s -> 704 ms)")
    ap.add_argument("--remat", default="b2", choices=["b2", "full"])
    args = ap.parse_args()

    H = W = args.size
    S, halo, K = args.strips, args.halo, args.k
    hs = H // S
    R = hs + 2 * halo                       # strip rows incl halo
    t = Tally()

    # --- image-level tensors (fp32, once per step) -----------------------
    img = H * W * 3 * F32 / 1e9
    # xs build: read padded image, write the (S, R, W, 3) strip stack;
    # the scan reads it in fwd AND in the remat backward
    xs = S * R * W * 3 * F32 / 1e9
    t.add("xs strip stack (build + fwd read + remat read)",
          gb=img + 3 * xs)

    # --- block 1 (s2d form) per strip, x S ------------------------------
    # conv1_1: stride-2 4x4 on pixels -> (R/2, W/2+1, 256) grid; conv1_2:
    # 2x2 between half-cell-shifted grids; pool1: free parity max
    ro, co = R // 2 + 1, W // 2 + 1
    g1 = ro * co * 256 * BF16 / 1e9          # conv1_1 grid (bf16)
    g2 = (R // 2) * (W // 2) * 256 * BF16 / 1e9   # conv1_2 grid
    p1 = (R // 2) * (W // 2) * 64 * BF16 / 1e9    # pool1 (parity max view)
    f_c11 = conv_cost(ro * co, 3, 256, 16) / 1e9          # K4 form
    f_c12 = conv_cost((R // 2) * (W // 2), 256, 256, 4) / 1e9
    # fwd + remat recompute (block 1 always re-runs)
    for tag in ("fwd", "remat"):
        t.add(f"block1 s2d convs x{S} ({tag})",
              gflop=S * (f_c11 + f_c12),
              gb=S * (R * W * 3 * BF16 / 1e9    # strip read (bf16 cast)
                      + g1 * 2                  # write + conv1_2 read
                      + g2 + p1))               # write grid2, write pool1
    # conv1_1 Gram: 4 parity slices, each (K, ro, co, 64) weighted block
    gblk1 = 4 * K * ro * co * 64 * BF16 / 1e9
    f_g1 = 4 * 2.0 * (ro * co) * 64 * K * 64 / 1e9
    t.add(f"conv1_1 gram feed+dot x{S} (fwd+remat)",
          gflop=2 * S * f_g1, gb=2 * S * (gblk1 * 2 + g1))
    # gram VJP (backward): dF = FW . wall — re-reads the block once
    t.add(f"conv1_1 gram VJP x{S}", gflop=S * f_g1,
          gb=S * (gblk1 + g1))
    # block-1 backward dx: conv1_2 dx + conv1_1 dx (matmul K4 form),
    # cotangents ~ activation sizes
    t.add(f"block1 dx x{S}", gflop=S * (f_c11 + f_c12),
          gb=S * (g1 + g2 + p1 + R * W * 3 * F32 / 1e9))

    # --- block 2 per strip, x S ------------------------------------------
    r2, w2 = R // 2, W // 2
    a2 = r2 * w2 * 128 * BF16 / 1e9          # conv2_x output
    p2 = (hs // 4) * (W // 4) * 128 * BF16 / 1e9   # pool2 own rows
    f_c21 = conv_cost(r2 * w2, 64, 128, 9) / 1e9
    f_c22 = conv_cost(r2 * w2, 128, 128, 9) / 1e9
    t.add(f"block2 convs x{S} (fwd)", gflop=S * (f_c21 + f_c22),
          gb=S * (p1 + 2 * a2 + a2 + p2))    # read pool1, write 2 convs,
    #                                          pool reads conv2_2, write p2
    if args.remat == "b2":
        # residuals saved: conv2_1 + conv2_2 raw outputs (+ pool y) —
        # written in fwd (counted above), READ in the backward instead
        # of re-running the convs
        t.add(f"b2 residual re-read x{S}", gb=S * 2 * a2)
    else:
        t.add(f"block2 convs x{S} (remat)", gflop=S * (f_c21 + f_c22),
              gb=S * (p1 + 3 * a2 + p2))
    # conv2_1 gram: weighted block (P2, K*128)
    gblk2 = K * r2 * w2 * 128 * BF16 / 1e9
    f_g2 = 2.0 * (r2 * w2) * 128 * K * 128 / 1e9
    passes = 2 if args.remat == "full" else 2  # fwd + (remat or read)
    t.add(f"conv2_1 gram feed+dot x{S} (fwd+bwd-side)",
          gflop=passes * S * f_g2, gb=passes * S * (gblk2 * 2 + a2))
    t.add(f"conv2_1 gram VJP x{S}", gflop=S * f_g2,
          gb=S * (gblk2 + a2))
    t.add(f"block2 dx x{S}", gflop=S * (f_c21 + f_c22),
          gb=S * (2 * a2 + p1))

    # --- pool2 stack + blocks 3-5 (standard path, batch 1) ---------------
    h4, w4 = H // 4, W // 4
    p2full = h4 * w4 * 128 * BF16 / 1e9
    t.add("pool2 stack (scan write + b3 read + bwd grad w/r)",
          gb=3 * p2full)
    specs = [  # (name, h, cin, cout, taps)
        ("conv3_1", h4, 128, 256, 9), ("conv3_2", h4, 256, 256, 9),
        ("conv3_3", h4, 256, 256, 9), ("conv3_4", h4, 256, 256, 9),
        ("conv4_1", h4 // 2, 256, 512, 9), ("conv4_2", h4 // 2, 512, 512, 9),
        ("conv4_3", h4 // 2, 512, 512, 9), ("conv4_4", h4 // 2, 512, 512, 9),
        ("conv5_1", h4 // 4, 512, 512, 9),
    ]
    fl = bt = 0.0
    for name, hh, cin, cout, k2 in specs:
        ww = hh
        fl += conv_cost(hh * ww, cin, cout, k2) / 1e9
        bt += hh * ww * cout * BF16 / 1e9 * 2      # write + next read
    t.add("blocks 3-5 convs (fwd)", gflop=fl, gb=bt)
    t.add("blocks 3-5 dx (bwd)", gflop=fl, gb=bt)
    # deep grams: conv3_1 (stream route), conv4_1 (stream), conv5_1 (fused)
    for name, hh, c in (("conv3_1", h4, 256), ("conv4_1", h4 // 2, 512),
                        ("conv5_1", h4 // 4, 512)):
        p = hh * hh
        f_g = 2.0 * p * c * K * c / 1e9
        blk = K * p * c * BF16 / 1e9
        # stream kernel: no materialized block (band-resident) — read tap
        # + masks; fused: block write+read. VJP reads tap again.
        elems = p * K * c
        fused = elems <= 3 * 2 ** 27
        feed = (blk * 2 if fused else 0.0) + p * c * BF16 / 1e9
        t.add(f"{name} gram ({'fused' if fused else 'stream'}) fwd+VJP",
              gflop=2 * f_g, gb=2 * feed)
    # content loss at conv4_2: elementwise, rides the tensors above

    # --- Laplacian matvec (fused Pallas kernel, fwd shared with bwd) -----
    lap_stats = H * W * 14 * F32 / 1e9
    t.add("laplacian matvec (stats + 3ch in/out)",
          gb=lap_stats + 2 * H * W * 3 * F32 / 1e9)

    # --- Adam update ------------------------------------------------------
    t.add("adam (grad, mu, nu, image rw)", gb=7 * img)

    print(t.table(measured_ms=args.measured_ms))


if __name__ == "__main__":
    main()
