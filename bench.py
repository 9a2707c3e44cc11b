"""Benchmark: 512² full deep-photo stylization on one TPU chip.

Measures the BASELINE.md tracked metric — optimization iters/sec at
512×512 with ALL loss terms active (content + segmentation-masked Gram
style + matting-Laplacian photorealism), i.e. BASELINE config 3 — and
projects wall-clock for the 500-iteration north-star run.

vs_baseline: north-star target is <30 s to convergence (500 iters) on one
v5e chip (BASELINE.json:5); reported as 30 / projected_seconds, so >1.0
beats the target. The reference publishes no numbers (BASELINE.md) — the
north-star target is the bar.

Prints ONE JSON line.
"""
import json
import signal
import sys
import time

import numpy as np

# generous: a fully cold compilation cache through the remote-compile
# tunnel costs minutes; the watchdog exists for WEDGED workers (hours),
# not slow compiles — a false trip would record a bogus 0 for the round
WATCHDOG_SECS = 1500


def _watchdog(signum, frame):
    # The axon TPU worker can wedge (observed after Pallas kernel faults);
    # emit a parseable failure line instead of hanging the driver.
    print(json.dumps({
        "metric": "iters/sec @ 512x512 full deep-photo (1 chip)",
        "value": 0.0, "unit": "iters/sec", "vs_baseline": 0.0,
        "error": f"bench watchdog fired after {WATCHDOG_SECS}s "
                 "(TPU worker unresponsive)"}), flush=True)
    sys.exit(2)


def main():
    signal.signal(signal.SIGALRM, _watchdog)
    signal.alarm(WATCHDOG_SECS)
    from dpst_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    import dpst_tpu
    from dpst_tpu import optimize, prepare_constants
    from dpst_tpu.models import vgg

    H = W = 512
    ITERS_TARGET = 500           # the north-star convergence run length
    TIMED = 100                  # steps in the timed window

    r = np.random.default_rng(0)
    # structured content (smooth regions + edges — realistic Laplacian
    # sparsity pattern), textured style
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    content = np.stack([
        120 + 80 * yy / H, 90 + 60 * xx / W, 200 - 120 * yy / H], axis=-1)
    content[H // 2:, :] = [70, 120, 60]
    content[H // 4:3 * H // 4, W // 3:W // 2] = [120, 110, 100]
    content += r.normal(0, 3, content.shape)
    content = np.clip(content, 0, 255).astype(np.float32)
    style = np.clip(
        r.uniform(0, 255, (H, W, 3)) * 0.5 + content[::-1, ::-1] * 0.5,
        0, 255).astype(np.float32)

    K = 4
    cmask = np.zeros((K, H, W), np.float32)
    cmask[0, : H // 2] = 1.0
    cmask[1, H // 2:] = 1.0
    smask = cmask.copy()

    cfg = dpst_tpu.StylizeConfig(
        use_segmentation=True, use_photorealism=True, max_classes=K,
        iterations=ITERS_TARGET, compute_dtype="bfloat16")

    vgg_params = vgg.get_params(seed=0)
    weights = optimize.LossWeights.from_config(cfg)
    loop_cfg = cfg.loop_config()
    opt = optimize.make_optimizer(loop_cfg)

    # one-time per-process setup: params upload + executable (cache) loads
    t_setup0 = time.perf_counter()
    consts = prepare_constants(
        jnp.asarray(content), jnp.asarray(style), jnp.asarray(cmask),
        jnp.asarray(smask), cfg, vgg_params)
    np.asarray(consts.coverage)  # completion barrier (see NOTE below)
    t_setup = time.perf_counter() - t_setup0

    # marginal per-pair precompute (what each additional pair pays)
    t_pre0 = time.perf_counter()
    consts = prepare_constants(
        jnp.asarray(content), jnp.asarray(style), jnp.asarray(cmask),
        jnp.asarray(smask), cfg, vgg_params)
    np.asarray(consts.coverage)
    image = optimize.init_image(cfg, jnp.asarray(content))
    opt_state = opt.init(image)
    t_pre = time.perf_counter() - t_pre0

    # warmup: compile the scan'd segment (cached across bench runs).
    # NOTE: on the axon remote-TPU backend, block_until_ready can return
    # before results are actually materialized; a host fetch of an output
    # is the only reliable completion barrier — so every timing below
    # closes with a small device->host transfer.
    image, opt_state, hist = optimize.run_segment(
        image, opt_state, consts, weights, vgg_params,
        n_steps=TIMED, cfg=loop_cfg)
    np.asarray(hist)

    t0 = time.perf_counter()
    image, opt_state, hist = optimize.run_segment(
        image, opt_state, consts, weights, vgg_params,
        n_steps=TIMED, cfg=loop_cfg)
    hist = np.asarray(hist)
    dt = time.perf_counter() - t0

    signal.alarm(0)
    assert np.all(np.isfinite(hist)), "non-finite losses in bench"
    ips = TIMED / dt
    wall_500 = ITERS_TARGET / ips + t_pre
    print(json.dumps({
        "metric": "iters/sec @ 512x512 full deep-photo (1 chip)",
        "value": round(ips, 2),
        "unit": "iters/sec",
        "vs_baseline": round(30.0 / wall_500, 3),
        "projected_500iter_wall_clock_s": round(wall_500, 2),
        "precompute_s": round(t_pre, 2),
        "one_time_setup_s": round(t_setup, 2),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    sys.exit(main())
