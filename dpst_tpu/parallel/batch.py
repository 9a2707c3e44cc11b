"""Batched / sharded stylization: K image pairs across a TPU slice.

BASELINE config 5 (8 pairs on a v5e-8) and the substrate for autotune's
Γ-sweep (SURVEY.md §2 comps. 10, 12): the whole per-pair pipeline —
constants precompute, VGG forward, losses, Laplacian matvec, Adam update —
is `vmap`ped over the pair axis and jitted with the batch axis sharded
over a 1-D mesh. Each chip then runs an independent stylization; there is
no cross-pair math, so XLA emits zero inter-chip collectives in the hot
loop — perfect weak scaling by construction.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from .. import optimize
from ..api import _scale_schedule, prepare_constants
from ..config import StylizeConfig
from ..ops.resize import resize_image
from . import mesh as mesh_lib


def _prepare_one(content, style, cmask, smask, *, cfg, vgg_params):
    return prepare_constants(content, style, cmask, smask, cfg, vgg_params)


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=())
def prepare_batch(contents, styles, cmasks, smasks, vgg_params,
                  cfg: StylizeConfig):
    """vmapped constants precompute: (B, ...) stacks in, batched
    StylizeConstants out. Sharding propagates from the inputs."""
    f = partial(_prepare_one, cfg=cfg, vgg_params=vgg_params)
    return jax.vmap(f)(contents, styles, cmasks, smasks)


@partial(jax.jit, static_argnames=("hw", "cfg"))
def prepare_batch_stage(contents, styles, cmasks, smasks, vgg_params,
                        hw: tuple, cfg: StylizeConfig):
    """One multi-scale stage's batched precompute (api._prepare_stage,
    vmapped): resize every pair to the stage resolution and build its
    loop constants in a single XLA program. Returns
    (batched consts, stage contents (B, h, w, 3), style means (B, 1, 1, 3)).
    """
    def one(c, s, cm, sm):
        if tuple(c.shape[:2]) != hw:
            c = resize_image(c, hw)
            s = resize_image(s, hw)
            cm = jnp.clip(resize_image(cm[..., None], hw)[..., 0],
                          0.0, 1.0)
            sm = jnp.clip(resize_image(sm[..., None], hw)[..., 0],
                          0.0, 1.0)
        consts = prepare_constants(c, s, cm, sm, cfg, vgg_params)
        return consts, c, jnp.mean(s, axis=(0, 1), keepdims=True)
    return jax.vmap(one)(contents, styles, cmasks, smasks)


@partial(jax.jit, static_argnames=("hw",))
def _carry_batch(images, hw: tuple):
    """Upsample every pair's running output between scales."""
    return jnp.clip(jax.vmap(lambda im: resize_image(im, hw))(images),
                    0.0, 255.0)


@partial(jax.jit, static_argnames=("cfg", "n_steps", "per_pair_weights"))
def run_batch(images, consts, weights, vgg_params, cfg: StylizeConfig,
              n_steps: int, per_pair_weights: bool = False):
    """One jitted dispatch: `n_steps` Adam steps for every pair.

    images: (B, H, W, 3); consts: batched StylizeConstants;
    weights: LossWeights of scalars (shared) or (B,) arrays when
    `per_pair_weights` (the Γ-sweep case).
    Returns (images, history (B, n_steps, 5)).
    """
    loop_cfg = cfg.loop_config()
    opt = optimize.make_optimizer(loop_cfg)

    def run_one(image, consts_one, weights_one):
        opt_state = optimize.init_opt_state(opt, loop_cfg, image)
        img, _, hist = optimize.run_segment(
            image, opt_state, consts_one, weights_one, vgg_params,
            n_steps=n_steps, cfg=loop_cfg)
        return img, hist

    w_axes = optimize.LossWeights(0, 0, 0, 0) if per_pair_weights else None
    return jax.vmap(run_one, in_axes=(0, 0, w_axes))(
        images, consts, weights)


def stylize_batch(contents, styles, cmasks, smasks,
                  cfg: StylizeConfig | None = None,
                  vgg_params: dict | None = None,
                  mesh: Mesh | None = None,
                  weights: optimize.LossWeights | None = None,
                  per_pair_weights: bool = False):
    """Stylize B image pairs, sharded over all available chips.

    contents/styles: (B, H, W, 3) float [0,255]; cmasks/smasks:
    (B, K, H, W) soft masks (use segmentation.uniform_masks per pair for
    the unmasked case). `cfg.scales` runs the same multi-scale
    coarse-to-fine schedule as `stylize()` (per-stage batched precompute,
    outputs upsampled between stages). Returns
    (images (B, H, W, 3), history (B, total_iters, 5)).
    """
    cfg = cfg or StylizeConfig()
    if cfg.s2b_strips:
        # the strip decomposition exists to manufacture batch for XLA's
        # conv emitters; a vmapped B-pair run already has it (measured:
        # B=8 @512², 96.4 -> 86.6 pair-it/s with strips — pure halo
        # redundancy). The gate can't see the vmapped axis, so off here.
        import dataclasses
        cfg = dataclasses.replace(cfg, s2b_strips=0)
    if cfg.s2d_gram == "auto":
        # batch regime: the vmapped nd Gram materializes MONOLITHIC
        # weighted blocks (B, ro, co, K·C) in poor layouts — the
        # per-pair gram cost measured 2.2× config3's (1864 vs 865
        # us/pair, docs/attrib/r5_b8.txt). The streamed Pallas kernel
        # vmaps as an extra grid dim and never materializes the block:
        # round-5 chip A/B B=8 @512²: 175.0 vs 167.7 pair-it/s (3/3
        # reps). On >1-device meshes spmd_safe() below downgrades to
        # "nd" (custom calls don't partition) — the win is the
        # single-chip vmapped loop's.
        import dataclasses
        cfg = dataclasses.replace(cfg, s2d_gram="pallas")
    if vgg_params is None:
        from ..models import vgg
        vgg_params = vgg.get_params(seed=cfg.seed)
    b = int(np.asarray(contents).shape[0])
    if mesh is None:
        mesh = mesh_lib.make_mesh()
    n_batch_dev = dict(zip(mesh.axis_names,
                           mesh.devices.shape))[mesh_lib.BATCH_AXIS]
    if b % n_batch_dev:
        if mesh_lib.has_row_axis(mesh):
            raise ValueError(
                f"batch {b} does not divide the mesh's {n_batch_dev}-way "
                "batch axis")
        # 1-D mesh: shrink to the largest device count the batch divides
        # (same policy as autotune's Γ axis)
        n = max(k for k in range(1, min(n_batch_dev, b) + 1)
                if b % k == 0)
        mesh = mesh_lib.make_mesh(n)
    import dataclasses
    if mesh.devices.size > 1:
        # Pallas custom calls don't partition under SPMD; on a real
        # multi-chip mesh the sharded operands would be all-gathered.
        # The XLA paths partition cleanly — same math (tested).
        cfg = cfg.spmd_safe()
    if cfg.laplacian_impl == "spmd":
        # the per-pair loop runs under vmap, where the shard_map
        # halo-exchange Laplacian can't be used (and on a 1-device mesh
        # no ambient row axis exists at all) — always the XLA stencil
        cfg = dataclasses.replace(cfg, laplacian_impl="xla")
    if weights is None:
        weights = optimize.LossWeights.from_config(cfg)

    s_img = mesh_lib.image_sharding(mesh)
    s_mask = mesh_lib.mask_sharding(mesh)
    batch = (jax.device_put(jnp.asarray(contents, jnp.float32), s_img),
             jax.device_put(jnp.asarray(styles, jnp.float32), s_img),
             jax.device_put(jnp.asarray(cmasks, jnp.float32), s_mask),
             jax.device_put(jnp.asarray(smasks, jnp.float32), s_mask))
    params_r = mesh_lib.replicate(vgg_params, mesh)
    weights_r = (mesh_lib.shard_batch(weights, mesh) if per_pair_weights
                 else mesh_lib.replicate(weights, mesh))

    # Multi-scale coarse-to-fine, same schedule as api.stylize
    # (VERDICT r2 missing #3: cfg.scales used to be silently dropped
    # here). Single-stage schedules reduce to the old direct path.
    hw = tuple(np.asarray(contents).shape[1:3])
    stages = _scale_schedule(cfg, hw)
    images = None
    hists = []
    for h, w, iters in stages:
        # canonicalized static keys (CLAUDE.md rule 7): precompute and
        # loop each compile once across runs differing in non-read fields
        consts, contents_s, style_means = prepare_batch_stage(
            *batch, params_r, (h, w), cfg.prepare_config())
        if images is None:
            images = jax.vmap(
                lambda c, m: optimize.init_image(cfg, c, m))(
                contents_s, style_means)
        else:
            images = _carry_batch(images, (h, w))
        images, hist = run_batch(
            images, consts, weights_r, params_r, cfg.loop_config(),
            iters, per_pair_weights)
        hists.append(hist)
    history = (jnp.concatenate(hists, axis=1) if len(hists) > 1
               else hists[0])
    return images, history
