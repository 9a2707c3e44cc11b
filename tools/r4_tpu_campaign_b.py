#!/usr/bin/env python
"""Round-4 TPU campaign B: per-block attribution traces + config5 batch
autopsy (VERDICT r3 items 3 and 4).

One serialized chip process (rule 8). Produces, for offline analysis by
tools/block_attrib.py (no chip needed):

  /tmp/r4_trace512/   profiler trace of config3 @512², 100 steps
  /tmp/r4_hlo512.txt  the SAME executable's optimized HLO text
  /tmp/r4_trace1024/  config3 program @1024² (config8), 50 steps
  /tmp/r4_hlo1024.txt
  /tmp/r4_trace_b8/   config5 B=8 batch loop @512², 50 steps
  /tmp/r4_hlo_b8.txt

plus timed same-process it/s lines for each so the traces are anchored
to wall-clock (every window closes with a device→host fetch, rule 2).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def emit(**kw):
    print(json.dumps(kw), flush=True)


def single(size, steps, trace_dir, hlo_path):
    import jax
    import jax.numpy as jnp

    import dpst_tpu
    from bench import _masks, _pair
    from dpst_tpu import optimize, prepare_constants
    from dpst_tpu.models import vgg

    cfg = dpst_tpu.StylizeConfig(
        use_segmentation=True, use_photorealism=True, max_classes=4,
        iterations=500, compute_dtype="bfloat16")
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
    t0 = time.perf_counter()
    image, opt_state, hist = optimize.run_segment(      # compile+warm
        image, opt_state, consts, weights, vgg_params,
        n_steps=steps, cfg=loop_cfg)
    np.asarray(hist)
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    image, opt_state, hist = optimize.run_segment(
        image, opt_state, consts, weights, vgg_params,
        n_steps=steps, cfg=loop_cfg)
    np.asarray(hist)
    ips = steps / (time.perf_counter() - t0)
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
    emit(phase=f"single{size}", ips=round(ips, 2),
         compile_s=round(t_compile, 1), trace=trace_dir, hlo=hlo_path)


def batch(size, B, steps, trace_dir, hlo_path):
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
    weights = mesh_lib.replicate(
        optimize.LossWeights.from_config(cfg), mesh)
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
    t0 = time.perf_counter()
    images, hist = run_batch(images, consts, weights, params,
                             cfg.loop_config(), steps)      # compile+warm
    np.asarray(hist)
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    images, hist = run_batch(images, consts, weights, params,
                             cfg.loop_config(), steps)
    np.asarray(hist)
    pips = B * steps / (time.perf_counter() - t0)
    with jax.profiler.trace(trace_dir):
        images, hist = run_batch(images, consts, weights, params,
                                 cfg.loop_config(), steps)
        np.asarray(hist)
    text = run_batch.lower(images, consts, weights, params,
                           cfg.loop_config(), steps).compile().as_text()
    with open(hlo_path, "w") as f:
        f.write(text)
    emit(phase=f"batch{B}x{size}", pair_ips=round(pips, 2),
         compile_s=round(t_compile, 1), trace=trace_dir, hlo=hlo_path)


def h2d_4096():
    """Pin campaign A's prepare finding: config6's 11.4 s 'precompute'
    is host->device transfer of the 4096² inputs through the axon
    tunnel (prepare itself is 0.4 s warm with device-resident args)."""
    import jax
    import jax.numpy as jnp

    from bench import _masks, _pair
    content, style = _pair(4096, 4096)
    cmask = _masks(4, 4096, 4096)
    nbytes = content.nbytes + style.nbytes + 2 * cmask.nbytes
    t0 = time.perf_counter()
    dev = [jax.device_put(x) for x in (content, style, cmask, cmask)]
    for d in dev:
        d.block_until_ready()
    np.asarray(dev[0][0, 0])                 # fetch barrier (rule 2)
    dt = time.perf_counter() - t0
    emit(phase="h2d_4096", mb=round(nbytes / 1e6, 1), secs=round(dt, 2),
         mb_per_s=round(nbytes / 1e6 / dt, 1))


def main():
    from dpst_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    import jax
    emit(phase="start", backend=jax.default_backend())
    h2d_4096()
    # step counts match bench.py's timed windows (config3/config8
    # timed=100, config5 N5=100) so these compiles warm the driver's
    # persistent cache for the exact programs bench runs.
    single(512, 100, "/tmp/r4_trace512", "/tmp/r4_hlo512.txt")
    single(1024, 100, "/tmp/r4_trace1024", "/tmp/r4_hlo1024.txt")
    batch(512, 8, 100, "/tmp/r4_trace_b8", "/tmp/r4_hlo_b8.txt")
    # config6's program: campaign A showed the remat harvests are
    # FLOP-neutral, so the 704-275 ms roofline gap must be located
    # per-op — this trace is the evidence (steps=10 matches bench's
    # timed window, so the compile is a persistent-cache hit).
    single(4096, 10, "/tmp/r4_trace4096", "/tmp/r4_hlo4096.txt")
    emit(phase="done")


if __name__ == "__main__":
    main()
