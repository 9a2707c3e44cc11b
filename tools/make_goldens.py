#!/usr/bin/env python
"""(Re)generate the pinned golden artifacts in tests/golden/.

Run ONLY after a deliberate, understood numerical change (see CLAUDE.md:
goldens must be regenerated under the same environment the tests run in —
CPU backend with 8 virtual devices):

    python tools/make_goldens.py

Each entry mirrors its test in tests/test_golden.py EXACTLY (same seeds,
configs, iteration counts); drift between this script and the tests
defeats the pinning, so change them together.
"""
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from dpst_tpu import StylizeConfig, stylize  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden")


def _pair():
    r = np.random.default_rng(1234)
    content = r.uniform(0, 255, (48, 48, 3)).astype(np.float32)
    style = r.uniform(0, 255, (48, 48, 3)).astype(np.float32)
    return content, style


def save(name, out, hist):
    np.save(os.path.join(GOLDEN_DIR, f"{name}.npy"),
            np.asarray(out, np.float32))
    np.save(os.path.join(GOLDEN_DIR, f"{name}_loss.npy"),
            np.asarray(hist[:, 0], np.float32))
    print(f"{name}: loss {hist[0, 0]:.6g} -> {hist[-1, 0]:.6g} "
          f"({len(hist)} steps)")


def main():
    content, style = _pair()

    cfg3 = StylizeConfig(use_segmentation=False, use_photorealism=True,
                         laplacian_impl="xla", compute_dtype="float32",
                         iterations=60, regularization_weight=100.0)
    out, hist = stylize(content, style, cfg3, return_history=True)
    save("config3_48px", out, hist)

    r = np.random.default_rng(4321)
    content2 = r.uniform(0, 255, (48, 48, 3)).astype(np.float32)
    style2 = r.uniform(0, 255, (48, 48, 3)).astype(np.float32)
    cmask = np.zeros((3, 48, 48), np.float32)
    cmask[0, :16] = 1
    cmask[1, 16:32] = 1
    cmask[2, 32:] = 1
    smask = np.zeros((3, 48, 48), np.float32)
    smask[0, :, :16] = 1
    smask[1, :, 16:32] = 1
    smask[2, :, 32:] = 1
    cfg2 = StylizeConfig(use_segmentation=True, use_photorealism=True,
                         laplacian_impl="xla", compute_dtype="float32",
                         iterations=50, max_classes=3,
                         regularization_weight=100.0)
    out, hist = stylize(content2, style2, cfg2, content_masks=cmask,
                        style_masks=smask, return_history=True)
    save("config2_masked_48px", out, hist)

    cfgl = StylizeConfig(use_segmentation=False, use_photorealism=True,
                         laplacian_impl="xla", compute_dtype="float32",
                         iterations=40, optimizer="lbfgs",
                         regularization_weight=100.0)
    out, hist = stylize(content, style, cfgl, return_history=True)
    save("lbfgs_config3_48px", out, hist)

    # linesearch eval-count trajectory (tests/test_golden.py::
    # test_golden_lbfgs_eval_counts — mirror that test exactly)
    import jax.numpy as jnp

    from dpst_tpu import optimize, prepare_constants, segmentation
    from dpst_tpu.models import vgg

    params = vgg.init_params(seed=0)
    mask = segmentation.uniform_masks((48, 48))
    consts = prepare_constants(
        jnp.asarray(content), jnp.asarray(style), jnp.asarray(mask),
        jnp.asarray(mask), cfgl, params)
    loop_cfg = cfgl.loop_config()
    opt = optimize.make_optimizer(loop_cfg)
    img0 = optimize.init_image(cfgl, jnp.asarray(content))
    st = optimize.init_opt_state(opt, loop_cfg, img0)
    _, evals = optimize.lbfgs_eval_trajectory(
        img0, st, consts, optimize.LossWeights.from_config(cfgl), params,
        n_steps=40, cfg=loop_cfg)
    evals = np.asarray(evals)
    np.save(os.path.join(GOLDEN_DIR, "lbfgs_config3_48px_evals.npy"),
            evals)
    print(f"lbfgs evals: total {int(evals.sum())} over {len(evals)} "
          f"steps (max {int(evals.max())})")

    cfg4 = StylizeConfig(use_segmentation=False, use_photorealism=True,
                         laplacian_impl="xla", compute_dtype="float32",
                         iterations=30, scales=(16, 32, 48),
                         regularization_weight=100.0)
    out, hist = stylize(content, style, cfg4, return_history=True)
    save("config4_multiscale_48px", out, hist)


if __name__ == "__main__":
    main()
