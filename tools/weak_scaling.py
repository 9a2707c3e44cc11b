"""DP weak-scaling curve for the sharded batch path (VERDICT r2 weak #6).

BASELINE config5 is "8 pairs on a v5e-8"; this environment has ONE chip,
so the cross-chip claim rests on the virtual-mesh equivalence tests. This
tool adds the missing *throughput* datum: for each device count n it
spawns a subprocess pinned to the CPU platform with n virtual XLA host
devices, runs `stylize_batch` with B=n pairs (one pair per device — weak
scaling), and reports per-device pair-iters/sec. Under data parallelism
the per-pair program is replicated with zero cross-device collectives in
the hot loop (gradients are per-pair; there is no parameter all-reduce in
style transfer), so the per-device rate should stay ~flat as n grows —
modulo host-CPU core contention, which is why the parent also prints the
core count and the curve rather than asserting a threshold.

Usage: python tools/weak_scaling.py [--devices 1,2,4,8] [--size 96]
       [--iters 30]
Child:  python tools/weak_scaling.py --child N --size S --iters I
        (internal; prints one JSON line)
"""
from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(n: int, size: int, iters: int) -> None:
    import jax

    assert (jax.config.jax_platforms or "") == "cpu", "child must be CPU"
    import numpy as np

    import dpst_tpu
    from dpst_tpu.parallel import batch as pbatch
    from dpst_tpu.parallel import mesh as mesh_lib

    devs = jax.devices()
    assert len(devs) >= n, (len(devs), n)
    mesh = mesh_lib.make_mesh(n)
    r = np.random.default_rng(0)
    contents = r.uniform(0, 255, (n, size, size, 3)).astype(np.float32)
    styles = r.uniform(0, 255, (n, size, size, 3)).astype(np.float32)
    masks = np.ones((n, 1, size, size), np.float32)
    cfg = dpst_tpu.StylizeConfig(
        use_segmentation=True, use_photorealism=True, max_classes=1,
        iterations=iters, compute_dtype="float32")
    # warm: compile + first run
    out, _ = pbatch.stylize_batch(contents, styles, masks, masks.copy(),
                                  cfg=cfg, mesh=mesh)
    np.asarray(out)
    t0 = time.perf_counter()
    out, _ = pbatch.stylize_batch(contents, styles, masks, masks.copy(),
                                  cfg=cfg, mesh=mesh)
    np.asarray(out)          # device->host fetch = completion barrier
    dt = time.perf_counter() - t0
    print(json.dumps({"n": n, "pair_iters_per_s": n * iters / dt,
                      "per_device": iters / dt * 1.0,
                      "wall_s": dt}))


def parent(device_counts, size: int, iters: int) -> list[dict]:
    rows = []
    for n in device_counts:
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                       env.get("XLA_FLAGS", ""))
        env["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}").strip()
        env.pop("JAX_COMPILATION_CACHE_DIR", None)
        env["JAX_ENABLE_COMPILATION_CACHE"] = "false"
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(n),
             "--size", str(size), "--iters", str(iters)],
            env=env, cwd=REPO, capture_output=True, text=True,
            timeout=1800)
        if proc.returncode != 0:
            raise RuntimeError(
                f"weak-scaling child n={n} failed:\n"
                + (proc.stdout + proc.stderr)[-3000:])
        rows.append(json.loads(proc.stdout.strip().splitlines()[-1]))
    return rows


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--size", type=int, default=96)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--child", type=int, default=0)
    args = ap.parse_args(argv)
    if args.child:
        import jax

        jax.config.update("jax_platforms", "cpu")
        child(args.child, args.size, args.iters)
        return
    counts = [int(x) for x in args.devices.split(",")]
    rows = parent(counts, args.size, args.iters)
    print(f"# host cores: {os.cpu_count()}  size={args.size}² "
          f"iters={args.iters}  (B = n pairs, one per device)")
    base = rows[0]["per_device"]
    print(f"{'n':>3} {'pair-it/s':>10} {'per-device':>11} {'vs n=1':>7}")
    for r in rows:
        print(f"{r['n']:>3} {r['pair_iters_per_s']:>10.2f} "
              f"{r['per_device']:>11.2f} {r['per_device'] / base:>6.2f}x")
    print(json.dumps({"metric": "dp_weak_scaling",
                      "rows": rows, "cores": os.cpu_count()}))


if __name__ == "__main__":
    main()
