#!/usr/bin/env python
"""Round-4 TPU campaign A: 4096² stream12 remat-mode A/B + precompute
attribution (VERDICT r3 items 1 and 7).

One serialized chip process (CLAUDE.md rule 8). Phases, each flushed as
its own JSON line so a wedge loses nothing earlier:

  1. prepare_constants at 4096² (config6's exact program) — timed warm,
     then captured under jax.profiler for offline attribution of the
     11.4 s (trace dir printed).
  2. stream12_remat in {b2, b12, b12f}: warm + two timed 10-step
     run_segment windows each, SAME process, prepare shared. b2 is the
     round-3 default; b12/b12f are the roofline's top-ranked harvests
     (save conv1_2 / conv1_1 raw strips, drop block-1 remat FLOPs).
  3. scan unroll=2 on the best mode (DPST_STREAM12_UNROLL is read at
     trace time, not in the jit key — jax.clear_caches() forces the
     retrace; the new HLO misses the persistent cache so this is a
     cold compile).

All timed windows close with a device→host fetch (rule 2). Every
variant's program is bit-identical to what bench.py config6 would run
with that config, so the winner's compile warms the driver's cache.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    from dpst_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    import bench
    import dpst_tpu
    from dpst_tpu import optimize, prepare_constants
    from dpst_tpu.models import vgg

    emit(phase="start", backend=jax.default_backend(),
         devices=len(jax.devices()))

    H = 4096
    content, style = bench._pair(H, H)
    cmask = bench._masks(4, H, H)
    vgg_params = vgg.get_params(seed=0)

    def cfg_mode(mode):
        return dpst_tpu.StylizeConfig(
            use_segmentation=True, use_photorealism=True, max_classes=4,
            iterations=500, compute_dtype="bfloat16",
            stream12_remat=mode)

    cfg = cfg_mode("auto")
    ca, sa, ma = (jnp.asarray(content), jnp.asarray(style),
                  jnp.asarray(cmask))

    # ---- phase 1: prepare (compile, warm-time, trace) ------------------
    t0 = time.perf_counter()
    consts = prepare_constants(ca, sa, ma, ma, cfg, vgg_params)
    np.asarray(consts.coverage)
    emit(phase="prepare_compile", secs=round(time.perf_counter() - t0, 2))

    t0 = time.perf_counter()
    consts = prepare_constants(ca, sa, ma, ma, cfg, vgg_params)
    np.asarray(consts.coverage)
    emit(phase="prepare_warm", secs=round(time.perf_counter() - t0, 2))

    trace_dir = "/tmp/r4_prep4096_trace"
    with jax.profiler.trace(trace_dir):
        consts = prepare_constants(ca, sa, ma, ma, cfg, vgg_params)
        np.asarray(consts.coverage)
    emit(phase="prepare_trace", dir=trace_dir)

    # ---- phase 2: remat-mode A/B ---------------------------------------
    TIMED = 10
    results = {}
    for mode in ("b2", "b12", "b12f"):
        try:
            c = cfg_mode(mode)
            loop_cfg = c.loop_config()
            weights = optimize.LossWeights.from_config(c)
            opt = optimize.make_optimizer(loop_cfg)
            image = optimize.init_image(c, ca)
            opt_state = optimize.init_opt_state(opt, loop_cfg, image)
            t0 = time.perf_counter()
            image, opt_state, hist = optimize.run_segment(
                image, opt_state, consts, weights, vgg_params,
                n_steps=TIMED, cfg=loop_cfg)
            np.asarray(hist)
            t_compile = time.perf_counter() - t0
            ips = []
            for _ in range(2):
                t0 = time.perf_counter()
                image, opt_state, hist = optimize.run_segment(
                    image, opt_state, consts, weights, vgg_params,
                    n_steps=TIMED, cfg=loop_cfg)
                hist = np.asarray(hist)
                ips.append(TIMED / (time.perf_counter() - t0))
            assert np.all(np.isfinite(hist)), f"non-finite ({mode})"
            results[mode] = max(ips)
            emit(phase="remat_ab", mode=mode,
                 ips=[round(x, 3) for x in ips],
                 compile_s=round(t_compile, 1),
                 final_loss=float(hist[-1, 0]))
        except Exception as e:
            emit(phase="remat_ab", mode=mode, error=str(e)[:300])

    if not results:
        emit(phase="done", error="no remat mode ran")
        return
    best = max(results, key=results.get)
    emit(phase="best", mode=best, ips=round(results[best], 3))

    # ---- phase 3: unroll=2 on the best mode ----------------------------
    try:
        os.environ["DPST_STREAM12_UNROLL"] = "2"
        jax.clear_caches()
        c = cfg_mode(best)
        loop_cfg = c.loop_config()
        weights = optimize.LossWeights.from_config(c)
        opt = optimize.make_optimizer(loop_cfg)
        image = optimize.init_image(c, ca)
        opt_state = optimize.init_opt_state(opt, loop_cfg, image)
        t0 = time.perf_counter()
        image, opt_state, hist = optimize.run_segment(
            image, opt_state, consts, weights, vgg_params,
            n_steps=TIMED, cfg=loop_cfg)
        np.asarray(hist)
        t_compile = time.perf_counter() - t0
        ips = []
        for _ in range(2):
            t0 = time.perf_counter()
            image, opt_state, hist = optimize.run_segment(
                image, opt_state, consts, weights, vgg_params,
                n_steps=TIMED, cfg=loop_cfg)
            hist = np.asarray(hist)
            ips.append(TIMED / (time.perf_counter() - t0))
        emit(phase="unroll2", mode=best, ips=[round(x, 3) for x in ips],
             compile_s=round(t_compile, 1))
        # re-pin the un-unrolled best in THIS process state for a clean
        # same-process comparison (persistent cache makes the recompile
        # cheap; the retrace is forced the same way)
        del os.environ["DPST_STREAM12_UNROLL"]
        jax.clear_caches()
        image = optimize.init_image(c, ca)
        opt_state = optimize.init_opt_state(opt, loop_cfg, image)
        image, opt_state, hist = optimize.run_segment(
            image, opt_state, consts, weights, vgg_params,
            n_steps=TIMED, cfg=loop_cfg)
        np.asarray(hist)
        ips = []
        for _ in range(2):
            t0 = time.perf_counter()
            image, opt_state, hist = optimize.run_segment(
                image, opt_state, consts, weights, vgg_params,
                n_steps=TIMED, cfg=loop_cfg)
            hist = np.asarray(hist)
            ips.append(TIMED / (time.perf_counter() - t0))
        emit(phase="unroll1_repin", mode=best,
             ips=[round(x, 3) for x in ips])
    except Exception as e:
        emit(phase="unroll2", error=str(e)[:300])

    emit(phase="done", results={k: round(v, 3) for k, v in results.items()})


if __name__ == "__main__":
    main()
