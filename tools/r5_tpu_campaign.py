#!/usr/bin/env python
"""Round-5 TPU campaign: (a) the k4_px strip-gate A/B at 4096² (VERDICT
r4 item 2 — the gate is now wired at the stream12 call site), and (b)
re-capture of the per-block attribution traces (VERDICT r4 item 1, two
rounds overdue) — this time written INSIDE the repo so the analysis
artifacts survive the round.

One serialized chip process (CLAUDE.md rule 8). Artifacts:

  traces/r5_trace{512,1024,2048,4096}/    profiler traces
  traces/r5_trace_b8/                     config5 B=8 batch loop
  traces/r5_hlo{...}.txt                  the SAME executables' HLO

Offline afterward (no chip): tools/block_attrib.py TRACE HLO STEPS SIZE
produces the per-block tables for ARCHITECTURE.md.

Every timed window closes with a device→host fetch (rule 2); A/B reps
are same-process (rule 8).
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def emit(**kw):
    print(json.dumps(kw), flush=True)


def _setup(size, s2b=None):
    import jax.numpy as jnp

    import dpst_tpu
    from bench import _masks, _pair
    from dpst_tpu import optimize, prepare_constants
    from dpst_tpu.models import vgg

    kw = {} if s2b is None else {"s2b_strips": s2b}
    cfg = dpst_tpu.StylizeConfig(
        use_segmentation=True, use_photorealism=True, max_classes=4,
        iterations=500, compute_dtype="bfloat16", **kw)
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
    return (image, opt_state, consts, weights, vgg_params, loop_cfg)


def _timed_reps(state, steps, reps):
    from dpst_tpu import optimize
    image, opt_state, consts, weights, vgg_params, loop_cfg = state
    t0 = time.perf_counter()
    image, opt_state, hist = optimize.run_segment(   # compile+warm
        image, opt_state, consts, weights, vgg_params,
        n_steps=steps, cfg=loop_cfg)
    np.asarray(hist)
    t_compile = time.perf_counter() - t0
    ips = []
    for _ in range(reps):
        t0 = time.perf_counter()
        image, opt_state, hist = optimize.run_segment(
            image, opt_state, consts, weights, vgg_params,
            n_steps=steps, cfg=loop_cfg)
        np.asarray(hist)
        ips.append(round(steps / (time.perf_counter() - t0), 3))
    return t_compile, ips, (image, opt_state, consts, weights,
                            vgg_params, loop_cfg)


def _trace_and_hlo(state, steps, trace_dir, hlo_path):
    import jax

    from dpst_tpu import optimize
    image, opt_state, consts, weights, vgg_params, loop_cfg = state
    with jax.profiler.trace(trace_dir):
        image, opt_state, hist = optimize.run_segment(
            image, opt_state, consts, weights, vgg_params,
            n_steps=steps, cfg=loop_cfg)
        np.asarray(hist)
    text = optimize.run_segment.lower(
        image, opt_state, consts, weights, vgg_params,
        n_steps=steps, cfg=loop_cfg).compile().as_text()
    with open(hlo_path, "w") as f:
        f.write(text)


def phase_k4_ab(reps=3):
    """config6 @4096²: wired per-strip K4 gate (matmul-form conv1_1 dx
    inside the stream12 scan) vs the old full-image gate (emitter dx —
    force by zeroing the crossover). Same process; variant B's program
    is byte-identical to round 4's, so its compile is a persistent-cache
    hit."""
    import jax

    from dpst_tpu.models import vgg

    state = _setup(4096)
    t_c, ips_wired, state = _timed_reps(state, 10, reps)
    emit(phase="k4_ab", variant="wired_per_strip_gate",
         ips=ips_wired, compile_s=round(t_c, 1))
    _trace_and_hlo(state, 10, f"{REPO}/traces/r5_trace4096",
                   f"{REPO}/traces/r5_hlo4096.txt")
    emit(phase="trace4096", ok=True)

    old = vgg._K4_MATMUL_BWD_MAX
    try:
        vgg._K4_MATMUL_BWD_MAX = 0          # force the emitter dx path
        jax.clear_caches()                  # constant isn't in the jit key
        t_c, ips_emitter, _ = _timed_reps(state, 10, reps)
        emit(phase="k4_ab", variant="forced_emitter_dx",
             ips=ips_emitter, compile_s=round(t_c, 1))
    finally:
        vgg._K4_MATMUL_BWD_MAX = old
        jax.clear_caches()
    emit(phase="k4_ab_verdict",
         wired=max(ips_wired), emitter=max(ips_emitter),
         speedup=round(max(ips_wired) / max(ips_emitter), 4))


def phase_trace(size, steps, reps=2):
    state = _setup(size)
    t_c, ips, state = _timed_reps(state, steps, reps)
    emit(phase=f"single{size}", ips=ips, compile_s=round(t_c, 1))
    _trace_and_hlo(state, steps, f"{REPO}/traces/r5_trace{size}",
                   f"{REPO}/traces/r5_hlo{size}.txt")
    emit(phase=f"trace{size}", ok=True)


def phase_batch(size=512, B=8, steps=100, reps=2):
    import jax
    import jax.numpy as jnp

    import dpst_tpu
    from bench import _masks, _pair
    from dpst_tpu import optimize
    from dpst_tpu.models import vgg as vgg_mod
    from dpst_tpu.parallel import mesh as mesh_lib
    from dpst_tpu.parallel.batch import prepare_batch_stage, run_batch

    c1, s1 = _pair(size, size)
    contents = np.stack([c1] * B)
    styles = np.stack([s1] * B)
    bm = np.broadcast_to(_masks(4, size, size), (B, 4, size, size)).copy()
    cfg = dpst_tpu.StylizeConfig(
        use_segmentation=True, use_photorealism=True, max_classes=4,
        iterations=100, compute_dtype="bfloat16", s2b_strips=0)
    vgg_params = vgg_mod.get_params(seed=cfg.seed)
    mesh = mesh_lib.make_mesh()
    weights = mesh_lib.replicate(optimize.LossWeights.from_config(cfg),
                                 mesh)
    params = mesh_lib.replicate(vgg_params, mesh)
    s_img, s_mask = (mesh_lib.image_sharding(mesh),
                     mesh_lib.mask_sharding(mesh))
    b = (jax.device_put(jnp.asarray(contents, jnp.float32), s_img),
         jax.device_put(jnp.asarray(styles, jnp.float32), s_img),
         jax.device_put(jnp.asarray(bm, jnp.float32), s_mask),
         jax.device_put(jnp.asarray(bm, jnp.float32), s_mask))
    consts, contents_s, style_means = prepare_batch_stage(
        *b, params, (size, size), cfg.prepare_config())
    np.asarray(consts.coverage)
    images = jax.vmap(lambda c, m: optimize.init_image(cfg, c, m))(
        contents_s, style_means)
    lc = cfg.loop_config()
    t0 = time.perf_counter()
    images, hist = run_batch(images, consts, weights, params, lc, steps)
    np.asarray(hist)
    t_compile = time.perf_counter() - t0
    pips = []
    for _ in range(reps):
        t0 = time.perf_counter()
        images, hist = run_batch(images, consts, weights, params, lc,
                                 steps)
        np.asarray(hist)
        pips.append(round(B * steps / (time.perf_counter() - t0), 2))
    emit(phase=f"batch{B}x{size}", pair_ips=pips,
         compile_s=round(t_compile, 1))
    with jax.profiler.trace(f"{REPO}/traces/r5_trace_b8"):
        images, hist = run_batch(images, consts, weights, params, lc,
                                 steps)
        np.asarray(hist)
    text = run_batch.lower(images, consts, weights, params, lc,
                           steps).compile().as_text()
    with open(f"{REPO}/traces/r5_hlo_b8.txt", "w") as f:
        f.write(text)
    emit(phase="trace_b8", ok=True)


def main():
    os.makedirs(f"{REPO}/traces", exist_ok=True)
    from dpst_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    import jax
    emit(phase="start", backend=jax.default_backend())
    phases = sys.argv[1:] or ["k4", "512", "1024", "2048", "b8"]
    for p in phases:
        try:
            t0 = time.perf_counter()
            if p == "k4":
                phase_k4_ab()
            elif p == "b8":
                phase_batch()
            else:
                size = int(p)
                # steps match bench.py's timed windows so compiles warm
                # the driver's persistent cache for the exact programs
                phase_trace(size, {512: 100, 1024: 100, 2048: 40,
                                   4096: 10}[size])
            emit(phase=p, wall_s=round(time.perf_counter() - t0, 1))
        except Exception as e:
            emit(phase=p, error=str(e)[:400])
    emit(phase="done")


if __name__ == "__main__":
    main()
