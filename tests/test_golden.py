"""Golden-output regression (SURVEY.md §4 integration tests): the full
config-3 pipeline (content + Gram style + Laplacian photorealism, fp32,
fixed seeds) must keep producing the committed golden image within a
tight SSIM bound, and its loss trajectory must stay on the committed
curve. Guards against silent behavioral drift of any loss term,
the optimizer loop, or the Laplacian operator across refactors."""
import os

import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _pair():
    r = np.random.default_rng(1234)
    content = r.uniform(0, 255, (48, 48, 3)).astype(np.float32)
    style = r.uniform(0, 255, (48, 48, 3)).astype(np.float32)
    return content, style


def test_golden_config3():
    from dpst_tpu import StylizeConfig, stylize
    from dpst_tpu.ops.metrics import ssim

    content, style = _pair()
    cfg = StylizeConfig(use_segmentation=False, use_photorealism=True,
                        laplacian_impl="xla", compute_dtype="float32",
                        iterations=60, regularization_weight=100.0)
    out, hist = stylize(content, style, cfg, return_history=True)

    golden = np.load(os.path.join(GOLDEN_DIR, "config3_48px.npy"))
    s = float(ssim(out, golden))
    assert s >= 0.98, f"SSIM vs golden = {s}"

    golden_loss = np.load(
        os.path.join(GOLDEN_DIR, "config3_48px_loss.npy"))
    np.testing.assert_allclose(np.asarray(hist[:, 0]), golden_loss,
                               rtol=5e-3)
    # convergence quality: ~11x loss reduction on the golden run
    assert hist[0, 0] / hist[-1, 0] > 8.0


def test_golden_config2_masked():
    """Masked multi-class path golden: pins the per-class masked-Gram
    math, coverage weighting, and mask pyramids end to end."""
    from dpst_tpu import StylizeConfig, stylize
    from dpst_tpu.ops.metrics import ssim

    r = np.random.default_rng(4321)
    content = r.uniform(0, 255, (48, 48, 3)).astype(np.float32)
    style = r.uniform(0, 255, (48, 48, 3)).astype(np.float32)
    cmask = np.zeros((3, 48, 48), np.float32)
    cmask[0, :16] = 1
    cmask[1, 16:32] = 1
    cmask[2, 32:] = 1
    smask = np.zeros((3, 48, 48), np.float32)
    smask[0, :, :16] = 1
    smask[1, :, 16:32] = 1
    smask[2, :, 32:] = 1
    cfg = StylizeConfig(use_segmentation=True, use_photorealism=True,
                        laplacian_impl="xla", compute_dtype="float32",
                        iterations=50, max_classes=3,
                        regularization_weight=100.0)
    out, hist = stylize(content, style, cfg, content_masks=cmask,
                        style_masks=smask, return_history=True)

    golden = np.load(os.path.join(GOLDEN_DIR,
                                  "config2_masked_48px.npy"))
    s = float(ssim(out, golden))
    assert s >= 0.98, f"SSIM vs masked golden = {s}"
    golden_loss = np.load(
        os.path.join(GOLDEN_DIR, "config2_masked_48px_loss.npy"))
    np.testing.assert_allclose(np.asarray(hist[:, 0]), golden_loss,
                               rtol=5e-3)


def test_golden_lbfgs_config3():
    """L-BFGS golden (VERDICT r1 #4): the constrained (sigmoid-boxed)
    L-BFGS trajectory on the full config-3 objective is pinned the same
    way the Adam path is — image via SSIM, loss curve via allclose."""
    from dpst_tpu import StylizeConfig, stylize
    from dpst_tpu.ops.metrics import ssim

    content, style = _pair()
    cfg = StylizeConfig(use_segmentation=False, use_photorealism=True,
                        laplacian_impl="xla", compute_dtype="float32",
                        iterations=40, optimizer="lbfgs",
                        regularization_weight=100.0)
    out, hist = stylize(content, style, cfg, return_history=True)

    golden = np.load(os.path.join(GOLDEN_DIR, "lbfgs_config3_48px.npy"))
    s = float(ssim(out, golden))
    assert s >= 0.98, f"SSIM vs L-BFGS golden = {s}"
    golden_loss = np.load(
        os.path.join(GOLDEN_DIR, "lbfgs_config3_48px_loss.npy"))
    # looser than the Adam goldens: the Wolfe linesearch's accept/reject
    # branches amplify sub-ulp environment differences into a few
    # percent of curve wobble (the image itself stays SSIM-pinned)
    np.testing.assert_allclose(np.asarray(hist[:, 0]), golden_loss,
                               rtol=8e-2)
    # ...but the FIRST steps precede the branch divergence: a tight pin
    # there catches systematic drift the 8% bound would pass
    # (VERDICT r3 item 6)
    np.testing.assert_allclose(np.asarray(hist[:10, 0]),
                               golden_loss[:10], rtol=1e-2)
    # linesearch quality: ~16x loss reduction in 40 steps on this run
    assert hist[0, 0] / hist[-1, 0] > 10.0


def test_golden_lbfgs_eval_counts():
    """Pin the zoom linesearch's per-step evaluation counts (VERDICT r3
    item 6): a systematic linesearch regression (e.g. a broken cache
    forcing re-evaluations, or Wolfe parameters drifting) can stay
    inside the loss curve's 8% tolerance while multiplying the real cost
    per step — the eval trajectory is where it must show."""
    import jax.numpy as jnp

    from dpst_tpu import (StylizeConfig, optimize, prepare_constants,
                          segmentation)
    from dpst_tpu.models import vgg

    content, style = _pair()
    cfg = StylizeConfig(use_segmentation=False, use_photorealism=True,
                        laplacian_impl="xla", compute_dtype="float32",
                        iterations=40, optimizer="lbfgs",
                        regularization_weight=100.0)
    params = vgg.init_params(seed=0)
    mask = segmentation.uniform_masks((48, 48))
    consts = prepare_constants(
        jnp.asarray(content), jnp.asarray(style), jnp.asarray(mask),
        jnp.asarray(mask), cfg, params)
    loop_cfg = cfg.loop_config()
    opt = optimize.make_optimizer(loop_cfg)
    img0 = optimize.init_image(cfg, jnp.asarray(content))
    st = optimize.init_opt_state(opt, loop_cfg, img0)
    hist, evals = optimize.lbfgs_eval_trajectory(
        img0, st, consts, optimize.LossWeights.from_config(cfg), params,
        n_steps=40, cfg=loop_cfg)

    # shared-step sanity: identical trajectory to the production loop
    golden_loss = np.load(
        os.path.join(GOLDEN_DIR, "lbfgs_config3_48px_loss.npy"))
    np.testing.assert_allclose(np.asarray(hist[:, 0]), golden_loss,
                               rtol=8e-2)

    golden_evals = np.load(
        os.path.join(GOLDEN_DIR, "lbfgs_config3_48px_evals.npy"))
    evals = np.asarray(evals)
    # per-step: a branch flip from sub-ulp env drift moves a count by
    # ±1-2; a systematic regression adds evals across MANY steps — so
    # pin the per-step deviation loosely and the TOTAL tightly
    assert np.abs(evals - golden_evals).max() <= 2, (
        evals.tolist(), golden_evals.tolist())
    assert abs(int(evals.sum()) - int(golden_evals.sum())) <= 4, (
        int(evals.sum()), int(golden_evals.sum()))


def test_golden_config4_multiscale():
    """Config-4 (multi-scale coarse-to-fine) golden: pins the schedule
    clamping, inter-stage image carry, and per-stage constants. Loss
    magnitudes are NOT comparable across stages (different resolutions),
    so convergence is asserted per stage."""
    from dpst_tpu import StylizeConfig, stylize
    from dpst_tpu.ops.metrics import ssim

    content, style = _pair()
    cfg = StylizeConfig(use_segmentation=False, use_photorealism=True,
                        laplacian_impl="xla", compute_dtype="float32",
                        iterations=30, scales=(16, 32, 48),
                        regularization_weight=100.0)
    out, hist = stylize(content, style, cfg, return_history=True)
    assert out.shape == content.shape

    golden = np.load(os.path.join(GOLDEN_DIR,
                                  "config4_multiscale_48px.npy"))
    s = float(ssim(out, golden))
    assert s >= 0.98, f"SSIM vs config4 golden = {s}"
    golden_loss = np.load(
        os.path.join(GOLDEN_DIR, "config4_multiscale_48px_loss.npy"))
    np.testing.assert_allclose(np.asarray(hist[:, 0]), golden_loss,
                               rtol=5e-3)
    for a, b in ((0, 30), (30, 60), (60, 90)):     # per-stage descent
        assert hist[b - 1, 0] < 0.2 * hist[a, 0]
