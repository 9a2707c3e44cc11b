"""SPMD (shard_map + halo exchange) Laplacian matvec vs the single-device
reference paths, on the virtual 8-device CPU mesh (conftest forces
jax_platforms=cpu with xla_force_host_platform_device_count=8; the Pallas
kernel runs interpret-mode off-TPU).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dpst_tpu.ops import laplacian as lap
from dpst_tpu.ops.laplacian_spmd import matvec_spmd


def _mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("rows",))


def _stats_and_v(h, w, seed=0):
    r = np.random.default_rng(seed)
    img = jnp.asarray(r.uniform(0, 1, size=(h, w, 3)), jnp.float32)
    v = jnp.asarray(r.normal(size=(h, w, 3)), jnp.float32)
    return lap.precompute_stats(img), v


@pytest.mark.parametrize("n", [2, 4, 8])
def test_spmd_matvec_matches_xla(n):
    h, w = 32, 24
    stats, v = _stats_and_v(h, w)
    ref = lap.matvec_xla(stats, v)
    mesh = _mesh(n)
    row = lambda nd: NamedSharding(mesh, P(*(("rows",) + (None,) * (nd - 1))))
    stats_s = lap.LaplacianStats(
        *(jax.device_put(f, row(f.ndim)) for f in stats))
    v_s = jax.device_put(v, row(v.ndim))
    with jax.set_mesh(mesh):
        y = matvec_spmd(stats_s, v_s, mesh=mesh)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_spmd_matvec_2d_channel_input():
    """(H, W) single-channel v and the XLA per-shard fallback."""
    h, w = 16, 16
    stats, v = _stats_and_v(h, w, seed=1)
    mesh = _mesh(4)
    with jax.set_mesh(mesh):
        y = matvec_spmd(stats, v[..., 0], mesh=mesh, use_pallas=False)
    ref = lap.matvec_xla(stats, v[..., 0])
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_spmd_photoreal_loss_and_grad():
    """impl="spmd" through the photoreal custom_vjp under an ambient mesh:
    loss and gradient match the single-device XLA implementation."""
    h, w = 32, 16
    r = np.random.default_rng(2)
    img01 = jnp.asarray(r.uniform(0, 1, size=(h, w, 3)), jnp.float32)
    stats = lap.precompute_stats(img01)
    img255 = jnp.asarray(r.uniform(0, 255, size=(h, w, 3)), jnp.float32)

    ref_l, ref_g = jax.value_and_grad(
        lambda x: lap.photoreal_loss(stats, x, impl="xla"))(img255)

    mesh = _mesh(8)
    with jax.set_mesh(mesh):
        l, g = jax.jit(jax.value_and_grad(
            lambda x: lap.photoreal_loss(stats, x, impl="spmd")))(img255)
    np.testing.assert_allclose(float(l), float(ref_l), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref_g),
                               rtol=1e-5, atol=1e-5)


def test_spmd_requires_mesh():
    stats, v = _stats_and_v(8, 8)
    with pytest.raises(ValueError, match="ambient mesh"):
        matvec_spmd(stats, v)


def test_spmd_safe_canonicalization():
    from dpst_tpu import StylizeConfig
    cfg = StylizeConfig(laplacian_impl="pallas", conv_impl="pallas",
                        gram_impl="stream", pool_impl="pallas",
                        s2b_strips=8)
    safe = cfg.spmd_safe()
    assert safe.laplacian_impl == "spmd"
    assert safe.conv_impl == "xla"       # Pallas conv can't partition
    assert safe.gram_impl == "xla"
    assert safe.pool_impl == "xla"
    assert safe.s2b_strips == 0
    # plain-XLA lowerings survive untouched
    cfg2 = StylizeConfig(pool_impl="postact", gram_impl="dotg",
                         conv_impl="flipvjp", laplacian_impl="xla")
    safe2 = cfg2.spmd_safe()
    assert (safe2.pool_impl, safe2.gram_impl, safe2.conv_impl) == \
        ("postact", "dotg", "flipvjp")


def test_batch_single_device_spmd_falls_back():
    """A cfg carrying laplacian_impl='spmd' (e.g. reused from a spatial
    run) must not crash stylize_batch on a 1-device mesh — it falls back
    to the XLA stencil."""
    import dataclasses

    from dpst_tpu import StylizeConfig
    from dpst_tpu.parallel import mesh as mesh_lib
    from dpst_tpu.parallel.batch import stylize_batch

    r = np.random.default_rng(0)
    c = r.uniform(0, 255, (2, 32, 32, 3)).astype(np.float32)
    s = r.uniform(0, 255, (2, 32, 32, 3)).astype(np.float32)
    m = np.ones((2, 1, 32, 32), np.float32)
    cfg = StylizeConfig(use_segmentation=True, use_photorealism=True,
                        max_classes=1, iterations=2,
                        compute_dtype="float32", laplacian_impl="spmd")
    imgs, hist = stylize_batch(c, s, m, m.copy(), cfg=cfg,
                               mesh=mesh_lib.make_mesh(1))
    assert np.isfinite(np.asarray(hist)).all()
