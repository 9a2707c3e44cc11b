"""Benchmark: all five BASELINE.md configs on one TPU chip.

Emits ONE JSON line PER CONFIG (VERDICT r1 #6), headline last:

  config1  256² content + Gram style only (CPU-runnable slice), it/s
  config2  512² segmentation-masked per-class style, it/s
  config4  1024² multi-scale coarse-to-fine, warm wall-clock
  config5  8-pair batch on this chip (B=1-equivalent throughput; DP
           scaling itself is cross-chip and exercised on the virtual
           mesh — parallel/batch.py)
  config6  4096² full deep-photo via block-1/2 activation STREAMING
           (vgg.stream_block12_grams) — the resolution that exceeds one
           chip on any batch-form path (VERDICT r2 #1)
  config7  2048² full deep-photo, standard (un-streamed) path — the
           round-3 high-res campaign series datum
  config8  1024² full deep-photo, single scale (config4's resolution
           without the multi-scale schedule)
  config9  2048² convergence wall-clock: multi-scale (512-1024-2048,
           100 it/scale) vs single-scale 300 iters, final losses
           reported for both (VERDICT r3 item 2)
  config3  512² FULL deep-photo (content + masked style + Laplacian) —
           the tracked headline metric, printed LAST so drivers that
           parse the final line keep the round-over-round series.

vs_baseline: north-star is <30 s for the 500-iteration 512² full run on
one v5e chip (BASELINE.json:5); each line reports 30 / its projected
500-iteration (or measured total) wall-clock, so >1.0 beats the target.
The reference publishes no numbers (BASELINE.md) — the target is the bar.

Timing discipline (CLAUDE.md rule 2): on the axon remote-TPU backend
`block_until_ready` can return before results materialize, so every
timed window closes with a device→host fetch.
"""
import json
import signal
import sys
import time

import numpy as np

# generous: a fully cold compilation cache through the remote-compile
# tunnel costs minutes; the watchdog exists for WEDGED workers (hours),
# not slow compiles — a false trip would record a bogus 0 for the round
WATCHDOG_SECS = 3000   # raised for config6's cold 4096² compiles


def _watchdog(signum, frame):
    # The axon TPU worker can wedge (observed after Pallas kernel faults);
    # emit a parseable failure line instead of hanging the driver.
    print(json.dumps({
        "metric": "iters/sec @ 512x512 full deep-photo (1 chip)",
        "value": 0.0, "unit": "iters/sec", "vs_baseline": 0.0,
        "error": f"bench watchdog fired after {WATCHDOG_SECS}s "
                 "(TPU worker unresponsive)"}), flush=True)
    sys.exit(2)


def _pair(h, w, seed=0):
    """Structured content (smooth regions + edges — realistic Laplacian
    sparsity), textured style."""
    r = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    content = np.stack([
        120 + 80 * yy / h, 90 + 60 * xx / w, 200 - 120 * yy / h], axis=-1)
    content[h // 2:, :] = [70, 120, 60]
    content[h // 4:3 * h // 4, w // 3:w // 2] = [120, 110, 100]
    content += r.normal(0, 3, content.shape)
    content = np.clip(content, 0, 255).astype(np.float32)
    style = np.clip(
        r.uniform(0, 255, (h, w, 3)) * 0.5 + content[::-1, ::-1] * 0.5,
        0, 255).astype(np.float32)
    return content, style


def _masks(k, h, w):
    if k == 1:
        return np.ones((1, h, w), np.float32)
    m = np.zeros((k, h, w), np.float32)
    m[0, : h // 2] = 1.0
    m[1, h // 2:] = 1.0
    return m


def _timed_staged_run(content, style, cmask, smask, cfg):
    """One chunked `stylize` run (cfg.intermediate_interval-step
    segments): (total wall s, records, history) where records =
    [(global_step, cumulative_wall_s, loss_at_step)] at every segment
    boundary. Each record closes with a history fetch (CLAUDE.md rule 2
    barrier), so the cumulative walls are real device completion times;
    records[i] therefore measures the wall-clock of the truncated
    schedule that stops at that boundary (determinism: the truncated
    run's steps are bit-identical to this run's prefix —
    tests/test_bench_config9.py pins both properties)."""
    import dpst_tpu

    records = []
    t0 = time.perf_counter()

    def cb(step, image, hist):
        loss = float(np.asarray(hist)[-1, 0])        # fetch barrier
        records.append((step, time.perf_counter() - t0, loss))

    out, hist = dpst_tpu.stylize(
        content, style, cfg, content_masks=cmask, style_masks=smask,
        callback=cb, return_history=True)
    np.asarray(out)
    return time.perf_counter() - t0, records, np.asarray(hist)


def _iso_cross(records, coarse_steps, target):
    """First segment boundary past the coarse stages whose loss <=
    target -> (final_stage_iters, cumulative_wall_s); None if the run
    never reaches the target loss."""
    for step, wall, loss in records:
        if step > coarse_steps and loss <= target:
            return step - coarse_steps, wall
    return None


def _loop_rate(cfg, h, w, timed=100):
    """(it/s, marginal precompute s, one-time setup s) for one config's
    hot loop at (h, w) — prepare, warm, then one timed scan segment."""
    import jax.numpy as jnp

    from dpst_tpu import optimize, prepare_constants
    from dpst_tpu.models import vgg

    content, style = _pair(h, w)
    k = max(cfg.max_classes, 1)
    cmask = _masks(k, h, w)
    smask = cmask.copy()
    vgg_params = vgg.get_params(seed=0)
    weights = optimize.LossWeights.from_config(cfg)
    loop_cfg = cfg.loop_config()
    opt = optimize.make_optimizer(loop_cfg)

    t_setup0 = time.perf_counter()
    consts = prepare_constants(
        jnp.asarray(content), jnp.asarray(style), jnp.asarray(cmask),
        jnp.asarray(smask), cfg, vgg_params)
    np.asarray(consts.coverage)              # completion barrier
    t_setup = time.perf_counter() - t_setup0

    t_pre0 = time.perf_counter()
    consts = prepare_constants(
        jnp.asarray(content), jnp.asarray(style), jnp.asarray(cmask),
        jnp.asarray(smask), cfg, vgg_params)
    np.asarray(consts.coverage)
    image = optimize.init_image(cfg, jnp.asarray(content))
    opt_state = optimize.init_opt_state(opt, loop_cfg, image)
    t_pre = time.perf_counter() - t_pre0

    image, opt_state, hist = optimize.run_segment(     # warm/compile
        image, opt_state, consts, weights, vgg_params,
        n_steps=timed, cfg=loop_cfg)
    np.asarray(hist)

    t0 = time.perf_counter()
    image, opt_state, hist = optimize.run_segment(
        image, opt_state, consts, weights, vgg_params,
        n_steps=timed, cfg=loop_cfg)
    hist = np.asarray(hist)                  # fetch closes the timing
    dt = time.perf_counter() - t0
    assert np.all(np.isfinite(hist)), "non-finite losses in bench"
    return timed / dt, t_pre, t_setup


def _emit(name, metric, value, unit, wall_s, **extra):
    line = {"metric": metric, "value": round(value, 2), "unit": unit,
            "vs_baseline": round(30.0 / wall_s, 3) if wall_s else 0.0,
            "config": name}
    line.update({k: (round(v, 2) if isinstance(v, float) else v)
                 for k, v in extra.items()})
    print(json.dumps(line), flush=True)


def main():
    signal.signal(signal.SIGALRM, _watchdog)
    signal.alarm(WATCHDOG_SECS)
    from dpst_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    import jax

    import dpst_tpu

    backend = jax.default_backend()

    # --- config 1: 256² content + plain Gram style -----------------------
    cfg1 = dpst_tpu.StylizeConfig(
        use_segmentation=False, use_photorealism=False, max_classes=1,
        iterations=500, compute_dtype="bfloat16")
    ips, t_pre, _ = _loop_rate(cfg1, 256, 256)
    _emit("config1", "iters/sec @ 256x256 content+gram (1 chip)",
          ips, "iters/sec", 500.0 / ips + t_pre, precompute_s=t_pre,
          backend=backend)

    # --- config 2: 512² masked per-class style (no Laplacian) ------------
    cfg2 = dpst_tpu.StylizeConfig(
        use_segmentation=True, use_photorealism=False, max_classes=4,
        iterations=500, compute_dtype="bfloat16")
    ips, t_pre, _ = _loop_rate(cfg2, 512, 512)
    _emit("config2", "iters/sec @ 512x512 masked style (1 chip)",
          ips, "iters/sec", 500.0 / ips + t_pre, precompute_s=t_pre,
          backend=backend)

    # --- config 4: 1024² multi-scale coarse-to-fine -----------------------
    content, style = _pair(1024, 1024)
    cfg4 = dpst_tpu.StylizeConfig(
        use_segmentation=True, use_photorealism=True, max_classes=4,
        iterations=100, scales=(256, 512, 1024), compute_dtype="bfloat16")
    cm = _masks(4, 1024, 1024)
    out = dpst_tpu.stylize(content, style, cfg4, content_masks=cm,
                           style_masks=cm.copy())          # warm/compile
    np.asarray(out)
    t0 = time.perf_counter()
    out = dpst_tpu.stylize(content, style, cfg4, content_masks=cm,
                           style_masks=cm.copy())
    np.asarray(out)
    dt4 = time.perf_counter() - t0
    _emit("config4",
          "wall-clock @ 1024x1024 multi-scale (256-512-1024, 100 it/scale)",
          dt4, "seconds", dt4, backend=backend)

    # --- config 5: 8-pair batch (B=1-equivalent throughput on 1 chip) ----
    # Loop-rate protocol, same as configs 1-3 (_loop_rate): batched
    # prepare once (timed separately), warm one run_batch segment, time
    # a second. The public one-call API is parallel.batch.stylize_batch;
    # this inlines its stages exactly like _loop_rate inlines stylize's.
    from dpst_tpu import optimize
    from dpst_tpu.models import vgg as vgg_mod
    from dpst_tpu.parallel import mesh as mesh_lib
    from dpst_tpu.parallel.batch import prepare_batch_stage, run_batch
    B, HB = 8, 512
    c1, s1 = _pair(HB, HB)
    contents = np.stack([c1] * B)
    styles = np.stack([s1] * B)
    bm = np.broadcast_to(_masks(4, HB, HB), (B, 4, HB, HB)).copy()
    cfg5 = dpst_tpu.StylizeConfig(
        use_segmentation=True, use_photorealism=True, max_classes=4,
        iterations=100, compute_dtype="bfloat16", s2b_strips=0,
        # batch-regime resolution (round 5): the vmapped nd Gram
        # materializes monolithic weighted blocks (2.2× config3's
        # per-pair gram cost); the streamed Pallas kernel vmaps as an
        # extra grid dim — 175.0 vs 167.7 pair-it/s B=8, then 180.9
        # with the two-half v2 form (same resolution
        # stylize_batch/autotune apply on 1-device meshes)
        s2d_gram="pallas")
    vgg_params5 = vgg_mod.get_params(seed=cfg5.seed)
    mesh5 = mesh_lib.make_mesh()
    weights5 = mesh_lib.replicate(
        optimize.LossWeights.from_config(cfg5), mesh5)
    params5 = mesh_lib.replicate(vgg_params5, mesh5)
    s_img, s_mask = (mesh_lib.image_sharding(mesh5),
                     mesh_lib.mask_sharding(mesh5))
    import jax.numpy as jnp
    batch5 = (jax.device_put(jnp.asarray(contents, jnp.float32), s_img),
              jax.device_put(jnp.asarray(styles, jnp.float32), s_img),
              jax.device_put(jnp.asarray(bm, jnp.float32), s_mask),
              jax.device_put(jnp.asarray(bm, jnp.float32), s_mask))
    consts5, contents_s, style_means = prepare_batch_stage(     # warm
        *batch5, params5, (HB, HB), cfg5.prepare_config())
    np.asarray(consts5.coverage)
    t0 = time.perf_counter()
    consts5, contents_s, style_means = prepare_batch_stage(
        *batch5, params5, (HB, HB), cfg5.prepare_config())
    np.asarray(consts5.coverage)
    t_pre5 = time.perf_counter() - t0
    images5 = jax.vmap(lambda c, m: optimize.init_image(cfg5, c, m))(
        contents_s, style_means)
    N5 = 100
    images5, hist = run_batch(images5, consts5, weights5, params5,
                              cfg5.loop_config(), N5)       # warm
    np.asarray(hist)
    t0 = time.perf_counter()
    images5, hist = run_batch(images5, consts5, weights5, params5,
                              cfg5.loop_config(), N5)
    np.asarray(hist)
    dt5 = time.perf_counter() - t0
    assert np.all(np.isfinite(np.asarray(hist))), "non-finite in config5"
    pair_ips = B * N5 / dt5
    _emit("config5",
          "pair-iters/sec @ 512x512 full, 8-pair batch (1 chip)",
          pair_ips, "pair-iters/sec",
          500.0 / pair_ips + t_pre5 / B,  # amortized 500-iter wall-clock
          precompute_s=t_pre5,
          note="single-chip B=8; DP scaling is cross-chip "
               "(parallel/batch.py, virtual-mesh tested)",
          backend=backend)

    # --- config 6: 4096² full deep-photo, block-1/2 streaming -------------
    # the max-single-chip-resolution datum (VERDICT r2 #1): the standard
    # path is rejected at allocation above 3072² (19.3 G needed of
    # 15.75 G); the streamed loop compiles at ~8.7 G and runs.
    try:
        cfg6 = dpst_tpu.StylizeConfig(
            use_segmentation=True, use_photorealism=True, max_classes=4,
            iterations=500, compute_dtype="bfloat16")
        ips, t_pre, _ = _loop_rate(cfg6, 4096, 4096, timed=10)
        _emit("config6",
              "iters/sec @ 4096x4096 full deep-photo, streamed blocks "
              "1-2 (1 chip)", ips, "iters/sec", 500.0 / ips + t_pre,
              precompute_s=t_pre, backend=backend,
              note="128-row-strip lax.scan streaming "
                   "(vgg.stream_block12_grams); standard path OOMs; "
                   "precompute is ~95% host->device transfer of the "
                   "~670 MB of 4096^2 inputs through the axon tunnel "
                   "(warm prepare itself is 0.4 s device-resident)")
    except Exception as e:  # never lose the headline line to config6
        print(json.dumps({"metric": "config6 4096x4096 streamed",
                          "value": 0.0, "unit": "iters/sec",
                          "vs_baseline": 0.0, "config": "config6",
                          "error": str(e)[:300]}), flush=True)

    # --- config 7: 2048² full deep-photo (single chip, standard path) -----
    # the round-3 high-res campaign series (#11a/#11b/#12/#13/#14:
    # 6.92 -> 10.4 it/s) lands here — the largest resolution the
    # UN-streamed path runs at, exercising s2b strips + s2d block 1 +
    # the streamed s2d-Gram Pallas kernel (auto at h·w >= 2^19).
    try:
        cfg7 = dpst_tpu.StylizeConfig(
            use_segmentation=True, use_photorealism=True, max_classes=4,
            iterations=500, compute_dtype="bfloat16")
        ips, t_pre, _ = _loop_rate(cfg7, 2048, 2048, timed=40)
        _emit("config7",
              "iters/sec @ 2048x2048 full deep-photo (1 chip)",
              ips, "iters/sec", 500.0 / ips + t_pre,
              precompute_s=t_pre, backend=backend,
              note="s2b strips + s2d block 1 + streamed s2d-Gram "
                   "kernel (gram_s2d, auto)")
    except Exception as e:  # never lose the headline line to config7
        print(json.dumps({"metric": "config7 2048x2048 full",
                          "value": 0.0, "unit": "iters/sec",
                          "vs_baseline": 0.0, "config": "config7",
                          "error": str(e)[:300]}), flush=True)

    # --- config 8: 1024² full deep-photo, single scale (1 chip) -----------
    # config4 covers 1024² via the multi-scale schedule; this is the
    # single-scale step rate the round-3 kernel campaigns moved
    # (40.2 -> 46.35 it/s, #13/#14).
    try:
        cfg8 = dpst_tpu.StylizeConfig(
            use_segmentation=True, use_photorealism=True, max_classes=4,
            iterations=500, compute_dtype="bfloat16")
        ips, t_pre, _ = _loop_rate(cfg8, 1024, 1024, timed=100)
        _emit("config8",
              "iters/sec @ 1024x1024 full deep-photo (1 chip)",
              ips, "iters/sec", 500.0 / ips + t_pre,
              precompute_s=t_pre, backend=backend,
              note="single scale; s2d block 1 + streamed s2d-Gram "
                   "kernel (auto at h*w >= 2^19)")
    except Exception as e:  # never lose the headline line to config8
        print(json.dumps({"metric": "config8 1024x1024 full",
                          "value": 0.0, "unit": "iters/sec",
                          "vs_baseline": 0.0, "config": "config8",
                          "error": str(e)[:300]}), flush=True)

    # --- config 9: 2048² convergence wall-clock, multi-scale vs single ----
    # VERDICT r3 item 2 / r4 weak #4: the number a user of high-res deep
    # photo style transfer actually feels — wall-clock for the
    # multi-scale schedule (512-1024 coarse stages, 100 it each) to
    # REACH the single-scale 300-iter run's final loss at 2048² (the
    # iso-loss crossing, measured at 50-iter segment boundaries; both
    # arms run the same chunked protocol). Multi-scale wins iff
    # value < ss_wall_s AND iso_loss_reached — the line's numbers
    # satisfy its own criterion by construction or say so honestly.
    try:
        content9, style9 = _pair(2048, 2048)
        cm9 = _masks(4, 2048, 2048)
        base9 = dict(use_segmentation=True, use_photorealism=True,
                     max_classes=4, compute_dtype="bfloat16",
                     intermediate_interval=50)
        cfg_ss = dpst_tpu.StylizeConfig(iterations=300, **base9)
        cfg_ms = dpst_tpu.StylizeConfig(
            iterations=300, scales=(512, 1024, 2048),
            scale_iters=(100, 100, 300), **base9)
        for c in (cfg_ss, cfg_ms):                 # warm/compile pass
            _timed_staged_run(content9, style9, cm9, cm9.copy(), c)
        ss_wall, _, hist_ss = _timed_staged_run(
            content9, style9, cm9, cm9.copy(), cfg_ss)
        ss_final = float(hist_ss[-1, 0])
        ms_wall, recs, hist_ms = _timed_staged_run(
            content9, style9, cm9, cm9.copy(), cfg_ms)
        cross = _iso_cross(recs, 200, ss_final)
        if cross is not None:
            k_final, iso_wall = cross
            value, reached = iso_wall, True
            ms_loss = next(l for s, _, l in recs if s == 200 + k_final)
        else:
            k_final, value, reached = 300, ms_wall, False
            ms_loss = float(hist_ms[-1, 0])
        _emit("config9",
              "wall-clock @ 2048x2048 to the single-scale final loss, "
              "multi-scale (512-1024 coarse, iso-loss-truncated final)",
              value, "seconds", value,
              iso_loss_reached=reached, ms_final_scale_iters=k_final,
              ms_loss_at_value=ms_loss, ms_extended_wall_s=ms_wall,
              ss_wall_s=ss_wall, ss_final_loss=ss_final,
              backend=backend,
              note="value = wall-clock for the multi-scale schedule "
                   "(100 it @512, 100 it @1024, final stage truncated "
                   "at the first 50-iter boundary whose 2048² loss <= "
                   "the single-scale 300-iter final loss). Criterion: "
                   "multi-scale wins iff iso_loss_reached and value < "
                   "ss_wall_s. Protocol pinned by "
                   "tests/test_bench_config9.py")
    except Exception as e:  # never lose the headline line to config9
        print(json.dumps({"metric": "config9 2048x2048 multi-scale",
                          "value": 0.0, "unit": "seconds",
                          "vs_baseline": 0.0, "config": "config9",
                          "error": str(e)[:300]}), flush=True)

    # --- config 3 (headline, LAST): 512² full deep-photo ------------------
    cfg3 = dpst_tpu.StylizeConfig(
        use_segmentation=True, use_photorealism=True, max_classes=4,
        iterations=500, compute_dtype="bfloat16")
    ips, t_pre, t_setup = _loop_rate(cfg3, 512, 512)
    signal.alarm(0)
    wall_500 = 500.0 / ips + t_pre
    print(json.dumps({
        "metric": "iters/sec @ 512x512 full deep-photo (1 chip)",
        "value": round(ips, 2),
        "unit": "iters/sec",
        "vs_baseline": round(30.0 / wall_500, 3),
        "projected_500iter_wall_clock_s": round(wall_500, 2),
        "precompute_s": round(t_pre, 2),
        "one_time_setup_s": round(t_setup, 2),
        "config": "config3",
        "backend": backend,
    }), flush=True)


if __name__ == "__main__":
    sys.exit(main())
