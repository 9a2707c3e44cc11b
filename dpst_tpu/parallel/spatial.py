"""Spatial (resolution) sharding: one huge image across the whole slice.

SURVEY.md §2 "Parallelism strategies" notes this workload has no
sequences — its analogue of long-context/sequence parallelism is HIGH
RESOLUTION. This module shards the image's ROW axis over the device mesh
and runs the unmodified optimization loop under SPMD: XLA inserts the
halo exchanges (collective-permutes over ICI) that the VGG convs,
pooling, and the Laplacian's 3×3 box-filter stencils need at shard
boundaries — the TPU-native equivalent of hand-written halo-exchange
comm code, with zero changes to the compute path.

Use when a single stylization exceeds one chip's HBM (≥4k² with VGG
activations) or to cut wall-clock for one pair on an idle slice.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import optimize
from ..api import prepare_constants
from ..config import StylizeConfig

ROW_AXIS = "rows"


def make_spatial_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (ROW_AXIS,))


def _row_sharding(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    spec = [None] * ndim
    spec[axis] = ROW_AXIS
    return NamedSharding(mesh, P(*spec))


def _row_spec(x, mesh: Mesh, axis: int) -> NamedSharding:
    """Row sharding on `axis`, falling back to replication only when the
    axis does not divide the mesh (deep VGG layers at small sizes)."""
    if x.shape[axis] % mesh.devices.size == 0:
        return _row_sharding(mesh, len(x.shape), axis)
    return NamedSharding(mesh, P())


def spatial_shardings(consts: optimize.StylizeConstants, image,
                      mesh: Mesh):
    """The placement policy of `shard_spatial` as a NamedSharding tree.

    Works on concrete arrays OR `jax.ShapeDtypeStruct` trees (only
    `.shape` is read), so compile-time memory analysis of huge-image
    programs (8192²-class) can attach placements without ever
    materializing the data (tests/test_spatial.py)."""
    repl = NamedSharding(mesh, P())
    sh_consts = optimize.StylizeConstants(
        content_feats={k: _row_spec(v, mesh, 0)
                       for k, v in consts.content_feats.items()},
        style_grams=jax.tree.map(lambda x: repl, consts.style_grams),
        masks={k: _row_spec(v, mesh, 1)
               for k, v in consts.masks.items()},
        coverage=repl,
        lap_stats=None if consts.lap_stats is None else jax.tree.map(
            lambda x: _row_spec(x, mesh, 0), consts.lap_stats),
    )
    return sh_consts, _row_sharding(mesh, len(image.shape), 0)


def shard_spatial(consts: optimize.StylizeConstants, image: jnp.ndarray,
                  mesh: Mesh):
    """Explicit per-field layout for the loop constants (VERDICT r1 #7):

      content_feats {layer: (h, w, C)}  → rows (axis 0) sharded
      masks         {layer: (K, h, w)}  → rows (axis 1) sharded
      lap_stats     (all (H, W, ...))   → rows (axis 0) sharded
      style_grams   {layer: (K, C, C)}  → REPLICATED
      coverage      (K,)                → REPLICATED

    Field identity decides placement — never shape divisibility — so a
    (K, C, C) Gram whose K happens to divide the mesh can never be
    mis-sharded along a non-spatial axis. Row sharding falls back to
    replication per-leaf only when the spatial axis does not divide the
    mesh (deep pyramid levels). XLA propagates from there.
    """
    sh_consts, sh_image = spatial_shardings(consts, image, mesh)
    consts = jax.tree.map(
        lambda x, s: jax.device_put(jnp.asarray(x), s), consts, sh_consts)
    image = jax.device_put(jnp.asarray(image), sh_image)
    return consts, image


def stylize_spatial(content, style, content_masks, style_masks,
                    cfg: StylizeConfig | None = None,
                    vgg_params: dict | None = None,
                    mesh: Mesh | None = None):
    """Stylize ONE pair with the image row-sharded over the mesh.

    content/style: (H, W, 3) [0,255]; masks: (K, H, W). H (the native
    size) must divide by the mesh size. With `cfg.scales` set, coarse
    stages run single-device and the final native-size stage runs
    sharded (coarse resolutions need not divide the mesh). Returns
    (image, history) exactly like optimize.run — same math, different
    layout.
    """
    cfg = (cfg or StylizeConfig()).spmd_safe()
    # spmd_safe: Pallas custom calls don't partition under automatic
    # SPMD, so the Gram/pool kernels fall back to their XLA lowerings
    # (which XLA partitions with its own halo exchanges) while
    # laplacian_impl="pallas" is rewritten to the shard_map + explicit
    # halo-exchange path (ops/laplacian_spmd.py) that keeps the kernel.
    if vgg_params is None:
        from ..models import vgg
        vgg_params = vgg.get_params(seed=cfg.seed)
    if mesh is None:
        mesh = make_spatial_mesh()
    n = mesh.devices.size
    content = jnp.asarray(content, jnp.float32)
    style = jnp.asarray(style, jnp.float32)
    cmasks = jnp.asarray(content_masks, jnp.float32)
    smasks = jnp.asarray(style_masks, jnp.float32)
    h, w = content.shape[:2]
    if h % n:
        raise ValueError(f"image rows {h} not divisible by mesh size {n}")
    weights = optimize.LossWeights.from_config(cfg)

    # Multi-scale composes naturally with row sharding (VERDICT r3 item
    # 8): coarse stages run single-device via the ordinary api stage
    # machinery (their resolutions generally don't divide the mesh, and
    # at coarse sizes one device is the right placement anyway); only
    # the FINAL, native-size stage — the one row sharding exists for —
    # runs sharded. The carried image upsamples between stages exactly
    # as in api.stylize.
    from ..api import _carry_image, _prepare_stage, _scale_schedule
    stages = _scale_schedule(cfg, (h, w))
    image = None
    history = []
    for sh, sw, iters in stages[:-1]:
        consts, content_s, style_mean = _prepare_stage(
            content, style, cmasks, smasks, vgg_params, (sh, sw), cfg)
        image = (optimize.init_image(cfg, content_s, style_mean)
                 if image is None else _carry_image(image, (sh, sw)))
        image, hist = optimize.run(image, consts, weights, vgg_params,
                                   cfg, iterations=iters)
        history.append(np.asarray(hist))

    fh, fw, fiters = stages[-1]
    with jax.set_mesh(mesh):
        consts = prepare_constants(content, style, cmasks, smasks, cfg,
                                   vgg_params)
        image0 = (optimize.init_image(cfg, content) if image is None
                  else _carry_image(jnp.asarray(image), (fh, fw)))
        consts, image0 = shard_spatial(consts, image0, mesh)
        image, hist = optimize.run(image0, consts, weights, vgg_params,
                                   cfg, iterations=fiters)
    if not history:
        return image, hist
    history.append(np.asarray(hist))
    return image, np.concatenate(history)
