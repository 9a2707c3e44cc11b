"""Realistic-weights end-to-end pipeline (VERDICT r3 item 5 — missing
#1's buildable slice): checkpoints synthesized in the REAL public
layouts (torchvision VGG .pth, hszhao/semseg PSPNet .pth, idealo
Keras-H5 NIMA) run through the REAL tools/convert_*.py converters into
a weights directory, and the full flow — env-var weight discovery →
automatic_masks → stylize (full losses) → nima_score → autotune — runs
as ONE pipeline. The day real checkpoints drop into `weights/`, nothing
but the numbers changes (README "weights" section points here)."""
import os

import numpy as np
import pytest
import torch

from reference_layouts import (keras_nima_arrays, semseg_pspnet_state,
                               write_keras_h5)
from test_tools import _run, _synth_vgg_state


@pytest.fixture(scope="module")
def bundles(tmp_path_factory):
    """Convert synthesized real-layout checkpoints with the real
    converters into one weights directory."""
    wdir = tmp_path_factory.mktemp("weights")

    vgg_pth = str(wdir / "vgg19.pth")
    torch.save(_synth_vgg_state(seed=5), vgg_pth)
    vgg_npz = str(wdir / "vgg19.npz")
    res = _run("convert_vgg.py", vgg_pth, vgg_npz,
               "--convention", "torchvision")
    assert res.returncode == 0, res.stderr[-1500:]

    psp_pth = str(wdir / "pspnet50.pth")
    torch.save(semseg_pspnet_state(seed=5), psp_pth)
    psp_npz = str(wdir / "pspnet50_ade20k.npz")
    res = _run("convert_pspnet.py", psp_pth, psp_npz)
    assert res.returncode == 0, res.stderr[-1500:]

    nima_h5 = str(wdir / "nima.h5")
    write_keras_h5(nima_h5, keras_nima_arrays(seed=5))
    nima_npz = str(wdir / "nima_mobilenet.npz")
    res = _run("convert_nima.py", nima_h5, nima_npz)
    assert res.returncode == 0, res.stderr[-1500:]

    return dict(vgg=vgg_npz, pspnet=psp_npz, nima=nima_npz)


@pytest.fixture()
def env_weights(bundles, monkeypatch):
    """Point the per-bundle env overrides at the converted bundles —
    the documented drop-in mechanism (utils/assets.py)."""
    monkeypatch.setenv("DPST_VGG_WEIGHTS", bundles["vgg"])
    monkeypatch.setenv("DPST_PSPNET_WEIGHTS", bundles["pspnet"])
    monkeypatch.setenv("DPST_NIMA_WEIGHTS", bundles["nima"])
    return bundles


def test_env_discovery_loads_converted_bundles(env_weights):
    """get_params() with no arguments must pick up the converted bundles
    via the env overrides (not the random-init fallback)."""
    from dpst_tpu.models import nima, pspnet, vgg
    from dpst_tpu.utils import assets

    for name in ("vgg19", "pspnet50_ade20k", "nima_mobilenet"):
        assert assets.bundle_available(name), name

    vp = vgg.get_params()
    # conv1_2 converts as a pure OIHW->HWIO transpose — compare against
    # the synthesized checkpoint directly (conv1_1 absorbs the
    # preprocessing fold)
    src = _synth_vgg_state(seed=5)["features.2.weight"].numpy()
    np.testing.assert_array_equal(np.asarray(vp["conv1_2"]["w"]),
                                  src.transpose(2, 3, 1, 0))
    rand = vgg.init_params(seed=0)
    assert not np.allclose(np.asarray(vp["conv1_2"]["w"]),
                           np.asarray(rand["conv1_2"]["w"]))
    # PSPNet/NIMA: loaded trees differ from the random init
    pp, npar = pspnet.get_params(), nima.get_params()
    assert not np.allclose(
        np.asarray(pp["stem1"]["w"]),
        np.asarray(pspnet.init_params(seed=0)["stem1"]["w"]))
    assert npar is not None


def test_full_pipeline_on_converted_weights(env_weights):
    """automatic_masks → stylize (full deep-photo losses) → nima_score
    → autotune, all on converter-produced weights, one flow: shapes,
    finiteness, loss decrease, determinism."""
    import jax.numpy as jnp

    import dpst_tpu
    from dpst_tpu import StylizeConfig, segmentation, stylize
    from dpst_tpu.models import nima, pspnet, vgg

    r = np.random.default_rng(11)
    # structured content so segmentation sees distinct regions
    content = np.zeros((64, 48, 3), np.float32)
    content[:32] = r.uniform(100, 255, (32, 48, 3))
    content[32:] = r.uniform(0, 100, (32, 48, 3))
    style = r.uniform(0, 255, (64, 48, 3)).astype(np.float32)

    cfg = StylizeConfig(use_segmentation=True, use_photorealism=True,
                        laplacian_impl="xla", compute_dtype="float32",
                        max_classes=4, iterations=6)
    seg_params = pspnet.get_params()
    vgg_params = vgg.get_params()

    mc, ms, ids = segmentation.automatic_masks(content, style, cfg,
                                               seg_params)
    assert mc.shape == (4, 64, 48) and ms.shape == (4, 64, 48)
    assert np.all(np.isfinite(mc)) and np.all(np.isfinite(ms))
    # masks stay a partition of unity where any class is present
    np.testing.assert_allclose(mc.sum(0), np.ones((64, 48)), atol=1e-5)

    out, hist = stylize(content, style, cfg, content_masks=mc,
                        style_masks=ms, vgg_params=vgg_params,
                        return_history=True)
    assert out.shape == content.shape and np.all(np.isfinite(out))
    assert hist[-1, 0] < hist[0, 0]
    # determinism: the same converted weights give a bit-identical run
    out2, hist2 = stylize(content, style, cfg, content_masks=mc,
                          style_masks=ms, vgg_params=vgg_params,
                          return_history=True)
    np.testing.assert_array_equal(hist, hist2)
    np.testing.assert_array_equal(out, out2)

    score = float(nima.nima_score(nima.get_params(),
                                  jnp.asarray(out)))
    assert np.isfinite(score) and 1.0 <= score <= 10.0

    # the integrated path (stylize discovers seg weights itself)
    out3 = stylize(content, style, cfg, vgg_params=vgg_params,
                   seg_params=seg_params)
    assert np.all(np.isfinite(out3))

    # Γ-autotune over the same machinery (2 candidates, tiny budget)
    res = dpst_tpu.autotune(
        content, style,
        StylizeConfig(use_segmentation=True, use_photorealism=False,
                      compute_dtype="float32", iterations=3),
        gammas=(10.0, 1000.0), seg_params=seg_params,
        vgg_params=vgg_params)
    assert np.all(np.isfinite(np.asarray(res.scores)))
    assert res.best_gamma in (10.0, 1000.0)
    assert np.all(np.isfinite(np.asarray(res.best_image)))
