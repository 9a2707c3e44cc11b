"""Command-line driver: `python -m dpst_tpu --content C --style S`.

The parity surface of the reference CLI (SURVEY.md §2 comp.1, §5 config
system): flat flags with the reference's semantics — content/style paths,
iteration count, the three loss weights (α content, Γ style, λ
regularization), similarity metric + threshold, intermediate interval,
init mode — plus the TPU-native extras (multi-scale schedule, profiler,
NaN debugging, orbax resume, NIMA auto-tuning, Laplacian impl choice).
"""
from __future__ import annotations

import argparse
import os
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="dpst_tpu",
        description="TPU-native automated deep photo style transfer")
    p.add_argument("--content", help="content image path")
    p.add_argument("--content-dir", default=None,
                   help="stylize EVERY image in this directory against "
                        "--style, batched and sharded over all devices")
    p.add_argument("--style", required=True, help="style image path")
    p.add_argument("--output", default="result.png",
                   help="output image path (with --content-dir: an "
                        "output directory)")
    p.add_argument("--size", type=int, default=512,
                   help="working resolution (longest side; 0 = native)")
    p.add_argument("--preset", choices=("config1", "config2", "config3",
                                        "config4", "config5"),
                   default=None,
                   help="start from a BASELINE.md preset; explicitly "
                        "passed flags still override")

    g = p.add_argument_group("loss weights")
    g.add_argument("--content-weight", type=float, default=1.0)
    g.add_argument("--style-weight", type=float, default=100.0,
                   help="Γ; ignored when --autotune is set")
    g.add_argument("--regularization-weight", type=float, default=1e4,
                   help="λ on the matting-Laplacian photorealism term")
    g.add_argument("--tv-weight", type=float, default=0.0)
    g.add_argument("--style-norm", choices=("gatys", "paper"),
                   default="gatys",
                   help="style-loss normalization: 'paper' = reference-"
                        "exact 1/(2N²) per-class scale (docs/PARITY.md)")

    g = p.add_argument_group("optimization")
    g.add_argument("--iterations", type=int, default=500)
    g.add_argument("--optimizer", choices=("adam", "lbfgs"),
                   default="adam")
    g.add_argument("--lr", type=float, default=2.0)
    g.add_argument("--init", choices=("content", "noise", "style_mean"),
                   default="content")
    g.add_argument("--scales", type=int, nargs="*", default=None,
                   help="multi-scale schedule, e.g. --scales 256 512 1024")
    g.add_argument("--seed", type=int, default=0)

    g = p.add_argument_group("segmentation")
    g.add_argument("--no-segmentation", action="store_true",
                   help="disable automatic masks (plain Gram style loss)")
    g.add_argument("--similarity-metric",
                   choices=("grouped", "token", "combined", "embedding"),
                   default="grouped",
                   help="'embedding' uses a precomputed 150x150 matrix "
                        "asset ($DPST_SIMILARITY_MATRIX)")
    g.add_argument("--similarity-threshold", type=float, default=0.25)
    g.add_argument("--max-classes", type=int, default=8)
    g.add_argument("--seg-protocol", choices=("resize", "sliding"),
                   default="resize",
                   help="PSPNet inference protocol: 'sliding' = the "
                        "semseg-lineage eval (aspect-preserving + 473^2 "
                        "sliding windows + mirror; best mask quality "
                        "with real weights), 'resize' = one 473^2 "
                        "squash (fastest)")
    g.add_argument("--seg-scales", type=float, nargs="*", default=None,
                   help="multi-scale ensemble for --seg-protocol "
                        "sliding, e.g. --seg-scales 0.75 1.0 1.25")
    g.add_argument("--content-masks", default=None,
                   help=".npy (K,H,W) mask stack overriding segmentation")
    g.add_argument("--style-masks", default=None)

    g = p.add_argument_group("photorealism")
    g.add_argument("--no-photorealism", action="store_true")
    g.add_argument("--matting-epsilon", type=float, default=1e-5)
    g.add_argument("--laplacian-impl",
                   choices=("auto", "pallas", "xla", "spmd"),
                   default="auto")
    g.add_argument("--post-smooth", type=int, default=0, metavar="RADIUS",
                   help="smooth-local-affine post-process window radius "
                        "(guided filter; 0 = off)")
    g.add_argument("--post-smooth-eps", type=float, default=1e-4)

    g = p.add_argument_group("parallelism")
    g.add_argument("--spatial", type=int, default=0, metavar="N",
                   help="row-shard the single image over the first N "
                        "devices (parallel/spatial.py; the high-"
                        "resolution regime where one chip's HBM is not "
                        "enough). Image rows must divide N.")

    g = p.add_argument_group("auto-tuning (NIMA)")
    g.add_argument("--autotune", action="store_true",
                   help="choose Γ by maximizing the NIMA score")
    g.add_argument("--gamma-candidates", type=float, nargs="*",
                   default=None)
    g.add_argument("--tune-rounds", type=int, default=1)

    g = p.add_argument_group("observability / state")
    g.add_argument("--intermediate-interval", type=int, default=100)
    g.add_argument("--intermediate-dir", default=None,
                   help="save in-progress images here every interval")
    g.add_argument("--loss-csv", default=None,
                   help="write the per-step loss history as CSV")
    g.add_argument("--history-terms", choices=("auto", "full", "total"),
                   default="auto",
                   help="per-step loss detail; with lbfgs, 'full' costs "
                        "one extra VGG forward per step (auto = full "
                        "for adam, total for lbfgs)")
    g.add_argument("--metrics", action="store_true",
                   help="report SSIM/PSNR of the result vs the content "
                        "photo (structure-preservation proxy - the DPST "
                        "papers' photorealism axis)")
    g.add_argument("--checkpoint-dir", default=None)
    g.add_argument("--resume", action="store_true")
    g.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of the run")
    g.add_argument("--debug-nans", action="store_true")
    g.add_argument("--dtype", choices=("bfloat16", "float32"),
                   default="bfloat16", help="conv/Gram compute dtype")
    g.add_argument("--conv-impl",
                   choices=("auto", "pallas", "xla", "flipvjp", "padbwd",
                            "dotbwd", "dot11"),
                   default="auto", help="VGG conv kernel backend")
    g.add_argument("--gram-impl",
                   choices=("auto", "pallas", "xla", "dotg", "stream",
                            "hybrid"),
                   default="auto", help="masked-Gram kernel backend")
    g.add_argument("--s2b-strips", type=int, default=-1,
                   help="manual space-to-batch of VGG blocks 1-2: -1 "
                        "auto (64-row strips on TPU at >=512^2 images), "
                        "0 off, N strips")
    g.add_argument("--stream12", type=int, default=-1,
                   help="stream VGG blocks 1-2 strip-by-strip (the "
                        ">=3072^2 single-chip memory path): -1 auto, "
                        "0 off, N strips")
    g.add_argument("--pool-impl",
                   choices=("auto", "pallas", "xla", "noties", "postact"),
                   default="auto", help="max-pool backward backend")
    g.add_argument("--block1-impl",
                   choices=("auto", "s2d", "conv"),
                   default="auto",
                   help="VGG block-1 lowering: auto = space-to-depth "
                        "2x2 convs on TPU for 512^2-class images, s2d "
                        "forces it, conv keeps the direct 3x3 emitters")
    g.add_argument("--s2d-gram",
                   choices=("auto", "nd", "pallas"),
                   default="auto",
                   help="masked-Gram consumption of active s2d block-1 "
                        "taps: nd (= auto) is the XLA parity-slice "
                        "path; pallas opts into the streamed kernel "
                        "(measured-slower in the full step)")
    g.add_argument("--remat",
                   choices=("none", "full", "block1", "block12"),
                   default="none",
                   help="rematerialize (all | block-1 | block-1+2) VGG "
                        "activations in the backward instead of storing "
                        "them")
    g.add_argument("--pooling", choices=("max", "avg"), default="max")
    g.add_argument("--no-compile-cache", action="store_true")
    g.add_argument("--device", type=int, default=None,
                   help="device index to run on (the reference's GPU-id "
                        "flag analog); default: JAX's first device")
    return p


def _explicit_dests(argv) -> set:
    """Dest names of flags literally present on the command line.

    A second parser with argparse.SUPPRESS defaults: absent flags leave
    no attribute, so a flag explicitly passed AT its default value is
    still detected (ADVICE r1: value-comparison could not distinguish
    `--preset config1 --dtype bfloat16` from the flag being absent)."""
    p = build_parser()
    for a in p._actions:
        a.default = argparse.SUPPRESS
        a.required = False
    ns, _ = p.parse_known_args(argv)
    return set(vars(ns))


def config_from_args(args, argv=None) -> "StylizeConfig":
    import dataclasses

    from .config import PRESETS, StylizeConfig

    if args.preset:
        # preset as base; only explicitly-typed flags override it
        base = PRESETS[args.preset]
        if argv is not None:
            explicit = _explicit_dests(argv)

            def was_set(flag):
                return flag in explicit
        else:
            # no argv available (programmatic call): fall back to
            # comparing against parser defaults — cannot detect a flag
            # explicitly passed at its default value
            defaults = build_parser().parse_args(
                ["--content", args.content, "--style", args.style])

            def was_set(flag):
                return getattr(args, flag) != getattr(defaults, flag)
        overrides = {}
        flag_to_field = {
            "content_weight": "content_weight",
            "style_weight": "style_weight",
            "regularization_weight": "regularization_weight",
            "tv_weight": "tv_weight", "style_norm": "style_norm",
            "iterations": "iterations",
            "optimizer": "optimizer", "lr": "learning_rate",
            "init": "init_mode", "seed": "seed",
            "similarity_metric": "similarity_metric",
            "similarity_threshold": "similarity_threshold",
            "max_classes": "max_classes",
            "seg_protocol": "seg_protocol",
            "matting_epsilon": "matting_epsilon",
            "laplacian_impl": "laplacian_impl",
            "post_smooth": "post_smooth",
            "post_smooth_eps": "post_smooth_eps",
            "intermediate_interval": "intermediate_interval",
            "dtype": "compute_dtype", "pooling": "pooling",
            "conv_impl": "conv_impl", "gram_impl": "gram_impl",
            "pool_impl": "pool_impl", "remat": "remat",
            "s2b_strips": "s2b_strips",
            "stream12": "stream12",
            "block1_impl": "block1_impl",
            "s2d_gram": "s2d_gram",
            "history_terms": "history_terms",
        }
        for flag, field in flag_to_field.items():
            if was_set(flag):
                overrides[field] = getattr(args, flag)
        if args.scales is not None:
            overrides["scales"] = tuple(args.scales)
        if args.seg_scales is not None:
            overrides["seg_scales"] = tuple(args.seg_scales)
        if args.no_segmentation:
            overrides["use_segmentation"] = False
        if args.no_photorealism:
            overrides["use_photorealism"] = False
        for field, attr in (("checkpoint_dir", "checkpoint_dir"),
                            ("profile_dir", "profile_dir")):
            if getattr(args, attr):
                overrides[field] = getattr(args, attr)
        if args.debug_nans:
            overrides["debug_nans"] = True
        return dataclasses.replace(base, **overrides)

    return StylizeConfig(
        content_weight=args.content_weight,
        style_weight=args.style_weight,
        regularization_weight=args.regularization_weight,
        tv_weight=args.tv_weight,
        style_norm=args.style_norm,
        iterations=args.iterations,
        optimizer=args.optimizer,
        learning_rate=args.lr,
        init_mode=args.init,
        seed=args.seed,
        scales=tuple(args.scales) if args.scales else (),
        use_segmentation=not args.no_segmentation,
        similarity_metric=args.similarity_metric,
        similarity_threshold=args.similarity_threshold,
        max_classes=args.max_classes,
        seg_protocol=args.seg_protocol,
        seg_scales=(tuple(args.seg_scales) if args.seg_scales
                    else (1.0,)),
        use_photorealism=not args.no_photorealism,
        matting_epsilon=args.matting_epsilon,
        laplacian_impl=args.laplacian_impl,
        post_smooth=args.post_smooth,
        post_smooth_eps=args.post_smooth_eps,
        intermediate_interval=args.intermediate_interval,
        checkpoint_dir=args.checkpoint_dir or "",
        profile_dir=args.profile_dir or "",
        debug_nans=args.debug_nans,
        compute_dtype=args.dtype,
        pooling=args.pooling,
        conv_impl=args.conv_impl,
        gram_impl=args.gram_impl,
        pool_impl=args.pool_impl,
        s2b_strips=args.s2b_strips,
        stream12=args.stream12,
        block1_impl=args.block1_impl,
        s2d_gram=args.s2d_gram,
        remat=args.remat,
        history_terms=args.history_terms,
    )


def _load_pair_and_masks(args, cfg, size):
    """Shared single-pair input path: images at the working resolution
    plus aligned (K, H, W) mask stacks (external .npy overrides, else
    automatic segmentation, else uniform)."""
    import numpy as np

    from .api import _fit_masks
    from .segmentation import uniform_masks
    from .utils import io

    content = io.load_image(args.content, size)
    hw = content.shape[:2]
    style = io.load_image(args.style, hw)
    if args.content_masks or args.style_masks:
        if not (args.content_masks and args.style_masks):
            raise SystemExit("--content-masks and --style-masks must be "
                             "given together (aligned class channels)")
        cmask = _fit_masks(np.load(args.content_masks).astype(np.float32),
                           hw)
        smask = _fit_masks(np.load(args.style_masks).astype(np.float32),
                           style.shape[:2])
    elif cfg.use_segmentation:
        from . import segmentation
        cmask, smask, _ = segmentation.automatic_masks(content, style, cfg)
    else:
        cmask = uniform_masks(hw)
        smask = uniform_masks(style.shape[:2])
    return content, style, cmask, smask


def _run_spatial(args, cfg, size):
    """--spatial N: one pair with the image row-sharded over N devices
    (the high-resolution regime — SURVEY.md §5 long-context analogue)."""
    import jax
    import numpy as np

    from .ops import metrics
    from .parallel.spatial import make_spatial_mesh, stylize_spatial
    from .utils import io

    n = args.spatial
    avail = len(jax.devices())
    if n > avail:
        raise SystemExit(
            f"--spatial {n}: only {avail} device(s) available")
    content, style, cmask, smask = _load_pair_and_masks(args, cfg, size)
    if content.shape[0] % n:
        raise SystemExit(
            f"--spatial {n}: image rows {content.shape[0]} must divide "
            f"the mesh (pick --size accordingly)")
    mesh = make_spatial_mesh(n)
    t0 = time.perf_counter()
    out, history = stylize_spatial(content, style, cmask, smask,
                                   cfg=cfg, mesh=mesh)
    out = np.asarray(out)
    dt = time.perf_counter() - t0
    io.save_image(out, args.output)
    print(f"wrote {args.output}  ({out.shape[1]}x{out.shape[0]}, "
          f"{dt:.1f}s, {n}-way row-sharded)")
    if args.metrics:
        print(f"vs content: SSIM={float(metrics.ssim(out, content)):.4f} "
              f"PSNR={float(metrics.psnr(out, content)):.2f} dB")
    history = np.asarray(history)
    if len(history):
        print(f"final losses: total={history[-1, 0]:.4g} "
              f"content={history[-1, 1]:.4g} style={history[-1, 2]:.4g} "
              f"photoreal={history[-1, 3]:.4g}")
        if args.loss_csv:
            np.savetxt(args.loss_csv, history, delimiter=",",
                       header="total,content,style,photoreal,tv",
                       comments="")
            print(f"wrote {args.loss_csv}")
    return 0


def _run_batch_dir(args, cfg, size):
    """--content-dir mode: all images in a directory vs one style, as ONE
    sharded batched dispatch (BASELINE config 5 through the CLI)."""
    import glob

    import numpy as np

    from .parallel.batch import stylize_batch
    from .segmentation import uniform_masks
    from .utils import io

    exts = ("*.png", "*.jpg", "*.jpeg", "*.bmp", "*.webp")
    paths = sorted(p for e in exts
                   for p in glob.glob(os.path.join(args.content_dir, e)))
    if not paths:
        raise SystemExit(f"no images found in {args.content_dir}")
    hw = None
    contents = []
    for p in paths:
        img = io.load_image(p, size if size else 512)
        if hw is None:
            hw = img.shape[:2]
        elif img.shape[:2] != hw:
            img = io.load_image(p, hw)  # batch needs uniform shapes
        contents.append(img)
    contents = np.stack(contents)
    style = io.load_image(args.style, hw)
    styles = np.broadcast_to(style, contents.shape).copy()

    if cfg.use_segmentation:
        from . import segmentation
        from .models import pspnet
        seg_params = pspnet.get_params()
        # one batched PSPNet dispatch for all contents + one for the
        # style (vs 2N dispatch-bound calls — segmentation.automatic_
        # masks_batch)
        cmasks, smasks = segmentation.automatic_masks_batch(
            contents, style, cfg, seg_params)
    else:
        ones = uniform_masks(hw)
        cmasks = np.broadcast_to(ones, (len(paths),) + ones.shape).copy()
        smasks = cmasks

    t0 = time.perf_counter()
    images, history = stylize_batch(contents, styles, cmasks, smasks,
                                    cfg=cfg)
    images = np.asarray(images)
    dt = time.perf_counter() - t0
    os.makedirs(args.output, exist_ok=True)
    for p, img, content in zip(paths, images, contents):
        out_path = os.path.join(args.output, os.path.basename(p))
        io.save_image(img, out_path)
        if args.metrics:
            from .ops import metrics
            print(f"{os.path.basename(p)}: "
                  f"SSIM={float(metrics.ssim(img, content)):.4f} "
                  f"PSNR={float(metrics.psnr(img, content)):.2f} dB "
                  "(vs content)")
    print(f"stylized {len(paths)} images in {dt:.1f}s "
          f"({dt / len(paths):.1f}s/image) -> {args.output}/")
    return 0


def main(argv=None) -> int:
    if argv is None:
        argv = sys.argv[1:]
    args = build_parser().parse_args(argv)
    if not args.content and not args.content_dir:
        build_parser().error("one of --content / --content-dir is required")
    if args.laplacian_impl == "spmd" and not args.spatial:
        # without a row-sharded mesh the shard_map Laplacian fails at
        # trace time with an opaque 'no ambient mesh' error (ADVICE r2)
        build_parser().error(
            "--laplacian-impl spmd needs a row-sharded mesh: use it "
            "with --spatial N (library path: parallel/spatial.py)")
    if args.spatial and (args.content_dir or args.autotune):
        build_parser().error(
            "--spatial shards ONE image over devices; it composes with "
            "neither --content-dir nor --autotune (those shard over the "
            "pair/candidate axis instead)")
    if args.content_dir:
        args.content = args.content_dir  # placate preset parsing

    from .utils import runtime
    if not args.no_compile_cache:
        runtime.enable_compilation_cache()
    if args.debug_nans:
        runtime.enable_debug_nans()
    if args.device is not None:
        import jax
        devices = jax.devices()
        if not 0 <= args.device < len(devices):
            raise SystemExit(
                f"--device {args.device} out of range: "
                f"{len(devices)} device(s) available")
        jax.config.update("jax_default_device", devices[args.device])

    import numpy as np

    from . import api, autotune as autotune_mod
    from .utils import io

    cfg = config_from_args(args, argv)
    size = args.size if args.size > 0 else None

    if args.spatial:
        return _run_spatial(args, cfg, size)

    if args.content_dir:
        if args.autotune:
            raise SystemExit(
                "--autotune tunes one pair; use it with --content, "
                "not --content-dir")
        return _run_batch_dir(args, cfg, size)

    masks = {}
    if args.content_masks:
        masks["content_masks"] = np.load(args.content_masks)
    if args.style_masks:
        masks["style_masks"] = np.load(args.style_masks)

    callback = None
    if args.intermediate_dir:
        os.makedirs(args.intermediate_dir, exist_ok=True)

        def callback(step, image, hist):
            path = os.path.join(args.intermediate_dir,
                                f"iter_{step:05d}.png")
            io.save_image(np.asarray(image), path)
            terms = np.asarray(hist)[-1]
            if np.any(terms[1:]):
                print(f"  step {step}: total={terms[0]:.4g} "
                      f"content={terms[1]:.4g} style={terms[2]:.4g} "
                      f"photoreal={terms[3]:.4g}", flush=True)
            else:
                print(f"  step {step}: total={terms[0]:.4g}", flush=True)

    t0 = time.perf_counter()
    with runtime.maybe_profile(args.profile_dir or ""):
        if args.autotune:
            res = autotune_mod.autotune(
                args.content, args.style, cfg, size=size,
                gammas=args.gamma_candidates, rounds=args.tune_rounds,
                **masks)
            out, history = res.best_image, None
            print(f"autotune: best Γ = {res.best_gamma:g} "
                  f"(NIMA {res.scores.max():.3f}); candidates: "
                  + ", ".join(f"{g:g}:{s:.3f}" for g, s in
                              zip(res.gammas, res.scores)))
        else:
            out, history = api.stylize(
                args.content, args.style, cfg, size=size,
                callback=callback, resume=args.resume,
                return_history=True, **masks)
    dt = time.perf_counter() - t0

    io.save_image(out, args.output)
    print(f"wrote {args.output}  ({out.shape[1]}x{out.shape[0]}, "
          f"{dt:.1f}s)")
    if args.metrics:
        from .ops import metrics
        content_ref = io.load_image(args.content, out.shape[:2])
        s_val = float(metrics.ssim(np.asarray(out), content_ref))
        p_val = float(metrics.psnr(np.asarray(out), content_ref))
        print(f"vs content: SSIM={s_val:.4f} PSNR={p_val:.2f} dB "
              "(structure preservation; style transfer lowers these "
              "by design - compare across runs, not to 1.0)")
    # --resume with a checkpoint already at/past the requested iteration
    # count yields an empty (0, 5) history — nothing to print or dump.
    if history is not None and len(history):
        if np.any(history[:, 1:]):
            print(f"final losses: total={history[-1, 0]:.4g} "
                  f"content={history[-1, 1]:.4g} "
                  f"style={history[-1, 2]:.4g} "
                  f"photoreal={history[-1, 3]:.4g} "
                  f"tv={history[-1, 4]:.4g}")
        else:
            # L-BFGS with history_terms="auto" logs totals-only (the
            # per-term row costs an extra forward per step); opt back
            # in with --history-terms full
            print(f"final loss: total={history[-1, 0]:.4g} "
                  "(per-term history off; --history-terms full)")
        if args.loss_csv:
            np.savetxt(
                args.loss_csv, np.asarray(history), delimiter=",",
                header="total,content,style,photoreal,tv", comments="")
            print(f"wrote {args.loss_csv}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
