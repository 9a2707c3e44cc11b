#!/usr/bin/env python
"""Round-5 config5 campaign (VERDICT r4 item 3): the B=8 batch loop's
per-pair gap vs config3 (5.96 vs 5.41 ms) attributes ENTIRELY to the
masked-Gram path under vmap (1864 vs 865 us/pair — docs/attrib/r5_b8.txt
vs r5_512.txt; deeper blocks batch BETTER). A/B the existing lowering
switches for the batch regime, re-verifying the round-3 #8 gate under
the post-#13/#14 kernel regime (the hs=128 flip lesson):

  base    s2b_strips=0, block1 auto->s2d  (bench config5 as shipped)
  strips  s2b_strips=8 under vmap         (#8 measured-negative then)
  conv    block1_impl="conv", s2b=0       (fused flat gram, no parity nd)
  convs8  block1_impl="conv", s2b=8       (the pre-#7 single-pair route)

Same process, one prepare shared (prepare_config pins s2b/block1 so the
constants are identical); every window closes with a fetch (rule 2).
"""
import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    from dpst_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    import dpst_tpu
    from bench import _masks, _pair
    from dpst_tpu import optimize
    from dpst_tpu.models import vgg as vgg_mod
    from dpst_tpu.parallel import mesh as mesh_lib
    from dpst_tpu.parallel.batch import prepare_batch_stage, run_batch

    emit(phase="start", backend=jax.default_backend())
    size, B, steps, reps = 512, 8, 100, 3
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
    images0 = jax.vmap(lambda c, m: optimize.init_image(cfg, c, m))(
        contents_s, style_means)

    variants = [
        ("base", {}),
        ("strips", {"s2b_strips": 8}),
        ("conv", {"block1_impl": "conv"}),
        ("convs8", {"block1_impl": "conv", "s2b_strips": 8}),
    ]
    for name, kw in variants:
        try:
            c = dataclasses.replace(cfg, **kw)
            lc = c.loop_config()
            t0 = time.perf_counter()
            images, hist = run_batch(images0, consts, weights, params,
                                     lc, steps)
            np.asarray(hist)
            t_compile = time.perf_counter() - t0
            pips = []
            for _ in range(reps):
                t0 = time.perf_counter()
                images, hist = run_batch(images0, consts, weights,
                                         params, lc, steps)
                np.asarray(hist)
                pips.append(round(B * steps / (time.perf_counter() - t0),
                                  2))
            emit(phase=name, pair_ips=pips,
                 compile_s=round(t_compile, 1),
                 final_loss=float(np.asarray(hist)[0, -1, 0]))
        except Exception as e:
            emit(phase=name, error=str(e)[:300])
    emit(phase="done")


if __name__ == "__main__":
    main()
