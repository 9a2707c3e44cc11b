"""Profile the config3 512² hot loop and print a per-op time report.

Runs one warm `run_segment`, traces a second one with jax.profiler, then
parses the perfetto trace (plugins/profile/*/\\*.trace.json.gz) and
aggregates device-lane op durations. This is the measurement behind the
step-time attributions in ARCHITECTURE.md's performance section.

Usage: python tools/trace_report.py [steps] [outdir]
"""
import collections
import glob
import gzip
import json
import os
import sys


def run_traced(steps: int, outdir: str) -> None:
    from dpst_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    import dpst_tpu
    from bench import _masks, _pair
    from dpst_tpu import optimize, prepare_constants
    from dpst_tpu.models import vgg

    # config overrides via env, e.g. DPST_TRACE_KW='{"use_photorealism":
    # false}' traces the config2 (no-Laplacian) program instead;
    # DPST_TRACE_SIZE=1024 traces that square resolution.
    kw = json.loads(os.environ.get("DPST_TRACE_KW", "{}"))
    size = int(os.environ.get("DPST_TRACE_SIZE", "512"))
    base = dict(use_segmentation=True, use_photorealism=True,
                max_classes=4, iterations=500, compute_dtype="bfloat16")
    base.update(kw)
    cfg = dpst_tpu.StylizeConfig(**base)
    content, style = _pair(size, size)
    cmask = _masks(4, size, size)
    vgg_params = vgg.get_params(seed=0)
    weights = optimize.LossWeights.from_config(cfg)
    loop_cfg = cfg.loop_config()
    opt = optimize.make_optimizer(loop_cfg)
    consts = prepare_constants(
        jnp.asarray(content), jnp.asarray(style), jnp.asarray(cmask),
        jnp.asarray(cmask.copy()), cfg, vgg_params)
    image = optimize.init_image(cfg, jnp.asarray(content))
    opt_state = optimize.init_opt_state(opt, loop_cfg, image)
    image, opt_state, hist = optimize.run_segment(      # warm
        image, opt_state, consts, weights, vgg_params,
        n_steps=steps, cfg=loop_cfg)
    np.asarray(hist)
    with jax.profiler.trace(outdir):
        image, opt_state, hist = optimize.run_segment(
            image, opt_state, consts, weights, vgg_params,
            n_steps=steps, cfg=loop_cfg)
        np.asarray(hist)                                # fetch = barrier


def report(outdir: str, steps: int, top: int = 40) -> None:
    paths = sorted(glob.glob(
        os.path.join(outdir, "plugins", "profile", "*", "*.trace.json.gz")),
        key=os.path.getmtime)
    if not paths:
        sys.exit(f"no trace.json.gz under {outdir}")
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device lanes: pid metadata names look like "/device:TPU:0 ..." or
    # "TPU:0"; host python lanes are excluded.
    pid_name = {}
    tid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_name.items()
                   if "TPU" in n or "device" in n.lower()}
    op_lanes = {k for k, n in tid_name.items()
                if k[0] in device_pids and "XLA Ops" in n}
    if not op_lanes:                        # fall back to leaf filtering
        op_lanes = {k for k in tid_name if k[0] in device_pids}

    def category(name: str) -> str:
        base = name.split("(")[0].split(".")[0]
        for tag in ("convolution", "copy", "fusion", "dot", "reshape",
                    "pad", "transpose", "custom-call", "reduce",
                    "select-and-scatter", "bitcast", "broadcast",
                    "dynamic-update-slice", "dynamic-slice", "scatter",
                    "all-reduce", "rev", "iota", "slice", "concatenate"):
            if tag in base:
                return tag
        return base

    per_op = collections.Counter()
    per_cat = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if (e.get("pid"), e.get("tid")) not in op_lanes:
            continue
        name = e.get("name", "?")
        if name.startswith("jit_") or name.startswith("while"):
            continue                         # container lanes
        dur = e.get("dur", 0) / 1e3          # us -> ms
        per_op[name] += dur
        per_cat[category(name)] += dur
        total += dur
    print(f"device op total {total:.2f} ms over {steps} steps "
          f"({total / steps * 1e3:.0f} us/step)")
    print("\n-- by category --")
    for name, dur in per_cat.most_common():
        print(f"{dur / steps * 1e3:9.1f} us/step  {100 * dur / total:5.1f}%"
              f"  {name}")
    print("\n-- top ops --")
    for name, dur in per_op.most_common(top):
        print(f"{dur / steps * 1e3:9.1f} us/step  {100 * dur / total:5.1f}%"
              f"  {name[:110]}")


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/dpst_trace"
    if os.environ.get("TRACE_REPORT_ONLY") != "1":
        run_traced(steps, outdir)
    report(outdir, steps)
