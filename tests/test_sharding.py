"""Sharded batched stylization on the 8-virtual-device CPU mesh
(SURVEY.md §4 device tests: sharded batch ≡ sequential runs)."""
import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def toy_batch():
    r = np.random.default_rng(31)
    B, H, W, K = 4, 24, 24, 2
    contents = r.uniform(0, 255, (B, H, W, 3)).astype(np.float32)
    styles = r.uniform(0, 255, (B, H, W, 3)).astype(np.float32)
    cmasks = np.zeros((B, K, H, W), np.float32)
    smasks = np.zeros((B, K, H, W), np.float32)
    cmasks[:, 0, :12] = 1.0
    cmasks[:, 1, 12:] = 1.0
    smasks[:, 0, :, :12] = 1.0
    smasks[:, 1, :, 12:] = 1.0
    return contents, styles, cmasks, smasks


def _cfg(**kw):
    from dpst_tpu import StylizeConfig
    base = dict(use_segmentation=True, use_photorealism=True,
                laplacian_impl="xla", compute_dtype="float32",
                max_classes=2, iterations=8)
    base.update(kw)
    return StylizeConfig(**base)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8, jax.devices()


def test_batch_matches_sequential(toy_batch):
    """Sharded 4-pair run ≡ 4 independent single-pair runs."""
    import jax.numpy as jnp
    from dpst_tpu import optimize, prepare_constants
    from dpst_tpu.models import vgg
    from dpst_tpu.parallel import batch as pbatch
    from dpst_tpu.parallel import mesh as mesh_lib

    contents, styles, cmasks, smasks = toy_batch
    cfg = _cfg()
    params = vgg.init_params(seed=0)

    mesh = mesh_lib.make_mesh(4)
    images_b, hist_b = pbatch.stylize_batch(
        contents, styles, cmasks, smasks, cfg=cfg, vgg_params=params,
        mesh=mesh)
    images_b = np.asarray(images_b)

    weights = optimize.LossWeights.from_config(cfg)
    for i in range(contents.shape[0]):
        consts = prepare_constants(
            jnp.asarray(contents[i]), jnp.asarray(styles[i]),
            jnp.asarray(cmasks[i]), jnp.asarray(smasks[i]), cfg, params)
        img0 = optimize.init_image(cfg, jnp.asarray(contents[i]))
        img, hist = optimize.run(img0, consts, weights, params, cfg)
        # vmapped and single-pair XLA programs fuse fp32 math differently;
        # pixels must agree to accumulated roundoff on the [0,255] scale
        np.testing.assert_allclose(
            images_b[i], np.asarray(img), rtol=1e-2, atol=0.25,
            err_msg=f"pair {i}")
        np.testing.assert_allclose(
            np.asarray(hist_b)[i, :, 0], np.asarray(hist)[:, 0],
            rtol=1e-3, err_msg=f"pair {i} history")


def test_per_pair_weights(toy_batch):
    """Γ-sweep substrate: per-pair style weights change per-pair results."""
    from dpst_tpu import optimize
    from dpst_tpu.parallel import batch as pbatch
    from dpst_tpu.parallel import mesh as mesh_lib
    import jax.numpy as jnp

    contents, styles, cmasks, smasks = toy_batch
    cfg = _cfg(use_photorealism=False, iterations=5)
    mesh = mesh_lib.make_mesh(4)
    gammas = jnp.asarray([0.0, 10.0, 100.0, 1000.0], jnp.float32)
    weights = optimize.LossWeights(
        content=jnp.ones(4), style=gammas,
        reg=jnp.zeros(4), tv=jnp.zeros(4))
    images, hist = pbatch.stylize_batch(
        contents, styles, cmasks, smasks, cfg=cfg, mesh=mesh,
        weights=weights, per_pair_weights=True)
    hist = np.asarray(hist)
    # zero style weight → zero style contribution to total at every step
    np.testing.assert_allclose(hist[0, :, 0],
                               hist[0, :, 1], rtol=1e-5)
    # larger Γ → strictly larger total loss at step 0
    totals0 = hist[:, 0, 0]
    assert np.all(np.diff(totals0) > 0), totals0


def test_graft_entry_contract():
    """The driver contract file: entry() compiles, dryrun executes."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert np.all(np.isfinite(np.asarray(out[2])))

    mod.dryrun_multichip(8)


def test_batch_multidev_forces_xla_laplacian(toy_batch):
    """laplacian_impl='pallas' on a multi-device mesh must transparently
    run (the XLA stencil substitutes — Pallas custom calls don't
    SPMD-partition)."""
    from dpst_tpu.parallel import batch as pbatch
    from dpst_tpu.parallel import mesh as mesh_lib

    contents, styles, cmasks, smasks = toy_batch
    cfg = _cfg(laplacian_impl="pallas", iterations=3)
    mesh = mesh_lib.make_mesh(4)
    images, hist = pbatch.stylize_batch(
        contents, styles, cmasks, smasks, cfg=cfg, mesh=mesh)
    assert np.all(np.isfinite(np.asarray(images)))
    assert np.all(np.asarray(hist)[:, :, 3] >= -1e-3)  # photoreal active


def test_batch_2d_mesh_matches_1d(toy_batch):
    """stylize_batch on a 2-D (pairs × rows) mesh ≡ the 1-D DP mesh run
    (XLA inserts the spatial halo exchanges; same math)."""
    from dpst_tpu.parallel import batch as pbatch
    from dpst_tpu.parallel import mesh as mesh_lib
    from dpst_tpu.models import vgg

    contents, styles, cmasks, smasks = toy_batch
    cfg = _cfg(iterations=5)
    params = vgg.init_params(seed=0)

    imgs_1d, hist_1d = pbatch.stylize_batch(
        contents, styles, cmasks, smasks, cfg=cfg, vgg_params=params,
        mesh=mesh_lib.make_mesh(4))
    imgs_2d, hist_2d = pbatch.stylize_batch(
        contents, styles, cmasks, smasks, cfg=cfg, vgg_params=params,
        mesh=mesh_lib.make_mesh_2d(4, 2))

    np.testing.assert_allclose(np.asarray(hist_2d)[:, :, 0],
                               np.asarray(hist_1d)[:, :, 0], rtol=1e-3)
    np.testing.assert_allclose(np.asarray(imgs_2d), np.asarray(imgs_1d),
                               rtol=5e-2, atol=2.0)
    # the image really is sharded along both axes
    shards = {s.data.shape for s in imgs_2d.addressable_shards}
    assert shards == {(1, 12, 24, 3)}, shards


def test_batch_multiscale_matches_sequential(toy_batch):
    """cfg.scales through the batch path ≡ N sequential stylize() runs
    (VERDICT r2 missing #3: the schedule used to be silently dropped)."""
    from dpst_tpu import api
    from dpst_tpu.models import vgg
    from dpst_tpu.parallel import batch as pbatch
    from dpst_tpu.parallel import mesh as mesh_lib

    contents, styles, cmasks, smasks = toy_batch
    cfg = _cfg(iterations=5, scales=(12, 24))
    params = vgg.init_params(seed=0)
    imgs_b, hist_b = pbatch.stylize_batch(
        contents, styles, cmasks, smasks, cfg=cfg, vgg_params=params,
        mesh=mesh_lib.make_mesh(4))
    imgs_b, hist_b = np.asarray(imgs_b), np.asarray(hist_b)
    assert imgs_b.shape == contents.shape        # final stage is native
    assert hist_b.shape[1] == 10                 # 5 iters x 2 stages
    for i in range(contents.shape[0]):
        out, hist = api.stylize(
            contents[i], styles[i], cfg, content_masks=cmasks[i],
            style_masks=smasks[i], vgg_params=params,
            return_history=True)
        np.testing.assert_allclose(hist_b[i, :, 0], hist[:, 0],
                                   rtol=1e-3, err_msg=f"pair {i}")
        np.testing.assert_allclose(imgs_b[i], out, rtol=1e-2, atol=0.5,
                                   err_msg=f"pair {i}")


def test_batch_2d_mesh_indivisible_raises(toy_batch):
    from dpst_tpu.parallel import batch as pbatch
    from dpst_tpu.parallel import mesh as mesh_lib
    contents, styles, cmasks, smasks = toy_batch
    with pytest.raises(ValueError, match="does not divide"):
        pbatch.stylize_batch(contents[:3], styles[:3], cmasks[:3],
                             smasks[:3], cfg=_cfg(),
                             mesh=mesh_lib.make_mesh_2d(4, 2))


def test_batch_gram_kernel_matches_nd():
    """Round-5 batch-regime resolution: on a 1-device mesh the vmapped
    s2d-Gram PALLAS kernel (an extra grid dim per pair) replaces the nd
    path, whose monolithic weighted-block materialization measured 2.2×
    config3's per-pair gram cost (175.0 vs 167.7 pair-it/s B=8 @512² on
    chip). Same math: the batched kernel's loss trajectory must match
    the nd path to fp summation order."""
    import dataclasses

    import jax.numpy as jnp

    from dpst_tpu import optimize
    from dpst_tpu.models import vgg
    from dpst_tpu.parallel import batch as pbatch
    from dpst_tpu.parallel import mesh as mesh_lib

    r = np.random.default_rng(7)
    B, size = 2, 128
    contents = r.uniform(0, 255, (B, size, size, 3)).astype(np.float32)
    styles = r.uniform(0, 255, (B, size, size, 3)).astype(np.float32)
    bm = np.zeros((B, 2, size, size), np.float32)
    bm[:, 0, :64] = 1.0
    bm[:, 1, 64:] = 1.0
    # block1_impl="s2d" forced: the CPU auto gate is TPU-only, but the
    # kernel-vs-nd routing only matters where s2d taps exist
    cfg = _cfg(s2b_strips=0, block1_impl="s2d", iterations=3)
    params = vgg.get_params(seed=0)
    mesh = mesh_lib.make_mesh(1)
    weights = mesh_lib.replicate(
        optimize.LossWeights.from_config(cfg), mesh)
    p = mesh_lib.replicate(params, mesh)
    b = (jax.device_put(jnp.asarray(contents),
                        mesh_lib.image_sharding(mesh)),
         jax.device_put(jnp.asarray(styles),
                        mesh_lib.image_sharding(mesh)),
         jax.device_put(jnp.asarray(bm), mesh_lib.mask_sharding(mesh)),
         jax.device_put(jnp.asarray(bm), mesh_lib.mask_sharding(mesh)))
    consts, cs, sm = pbatch.prepare_batch_stage(
        *b, p, (size, size), cfg.prepare_config())
    images = jax.vmap(lambda c, m: optimize.init_image(cfg, c, m))(cs, sm)
    hists = {}
    for name in ("nd", "pallas"):
        c = dataclasses.replace(cfg, s2d_gram=name)
        _, hist = pbatch.run_batch(images, consts, weights, p,
                                   c.loop_config(), 3)
        hists[name] = np.asarray(hist)
    np.testing.assert_allclose(hists["pallas"], hists["nd"], rtol=2e-5)


def test_batch_s2d_gram_routing():
    """stylize_batch resolves s2d_gram="auto" -> "pallas" on a 1-device
    mesh (the measured batch-regime winner) and -> "nd" on multi-device
    meshes (spmd_safe: custom calls don't partition). Pin the routing by
    capturing the cfg run_batch receives."""
    import dpst_tpu
    from dpst_tpu.parallel import batch as pbatch
    from dpst_tpu.parallel import mesh as mesh_lib

    r = np.random.default_rng(5)
    B, size = 2, 24
    contents = r.uniform(0, 255, (B, size, size, 3)).astype(np.float32)
    styles = r.uniform(0, 255, (B, size, size, 3)).astype(np.float32)
    bm = np.ones((B, 1, size, size), np.float32)
    seen = {}
    real = pbatch.run_batch

    def spy(*args, **kw):
        seen["s2d_gram"] = args[4].s2d_gram
        return real(*args, **kw)

    cfg = _cfg(max_classes=1, iterations=2)
    try:
        pbatch.run_batch = spy
        pbatch.stylize_batch(contents, styles, bm, bm, cfg=cfg,
                             mesh=mesh_lib.make_mesh(1))
        assert seen["s2d_gram"] == "pallas"
        pbatch.stylize_batch(contents, styles, bm, bm, cfg=cfg,
                             mesh=mesh_lib.make_mesh(2))
        assert seen["s2d_gram"] == "nd"
    finally:
        pbatch.run_batch = real
