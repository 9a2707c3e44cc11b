"""Perf lab: time full-step impl variants on the real chip.

Not part of bench.py — this is the measurement harness behind the
impl-switch decisions recorded in ARCHITECTURE.md ("Pallas kernel
status" / layout-tax sections). Each variant is one (conv_impl,
pool_impl, gram_impl) combination of the config3 512² hot loop; timing
follows the bench discipline (device→host fetch closes every window —
CLAUDE.md rule 2).

Usage:  python tools/perf_lab.py [variant ...]   (default: all)
"""
import json
import sys

VARIANTS = {
    "baseline": {},
    "flipvjp": {"conv_impl": "flipvjp"},
    "noties": {"pool_impl": "noties"},
    "dotg": {"gram_impl": "dotg"},
    "flipvjp+noties": {"conv_impl": "flipvjp", "pool_impl": "noties"},
    "all": {"conv_impl": "flipvjp", "pool_impl": "noties",
            "gram_impl": "dotg"},
    "remat": {"remat": "full"},
    "remat+noties": {"remat": "full", "pool_impl": "noties"},
    "remat-block1": {"remat": "block1"},
    "remat-block12": {"remat": "block12"},
    "postact": {"pool_impl": "postact"},
    "streamgram": {"gram_impl": "stream"},
    "xlagram": {"gram_impl": "xla"},
    "s2b8": {"s2b_strips": 8},
    "s2b4": {"s2b_strips": 4},
    "s2b16": {"s2b_strips": 16},
    "s2b8+flipvjp": {"s2b_strips": 8, "conv_impl": "flipvjp"},
    "s2b8+noties": {"s2b_strips": 8, "pool_impl": "noties"},
    "s2b8+padbwd": {"s2b_strips": 8, "conv_impl": "padbwd"},
    "s2b8+dotbwd": {"s2b_strips": 8, "conv_impl": "dotbwd"},
    "s2b8+dotg": {"s2b_strips": 8, "gram_impl": "dotg"},
    "s2b8+hybridgram": {"s2b_strips": 8, "gram_impl": "hybrid"},
    "s2b8+rblock1": {"s2b_strips": 8, "remat": "block1"},
    "s2b8+avg": {"s2b_strips": 8, "pooling": "avg"},
    "s2b8+permgram": {"s2b_strips": 8, "strip_gram": "perm"},
    "s2b8+permhgram": {"s2b_strips": 8, "strip_gram": "permh"},
}

# XLA compiler-option variants: the axon remote-compile service accepts
# the FULL libtpu DebugOptions set via jit(compiler_options=...) even
# though local XLA_FLAGS parsing only knows the OSS subset (probed: a
# bogus option 500s, xla_tpu_scoped_vmem_limit_kib compiles).
XLA_VARIANTS = {
    "vmem32": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
    "vmem64": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem96": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    "lhs": {"xla_tpu_enable_latency_hiding_scheduler": "true"},
    # speculative copy/fusion knobs — unknown names 500 harmlessly;
    # all measured neutral-or-worse vs the 134.3 default (licm2 134.5,
    # retilic 134.2, noallswap 134.3, nocopyfuse 128.4)
    "licm2": {"xla_tpu_licm_size_inflation_ratio": "2.0"},
    "nocopyfuse": {"xla_tpu_copy_fusion_pad_unpad_ratio": "0"},
    "retilic": {"xla_tpu_enable_aggressive_loop_fusion_layout_opt":
                "true"},
    "noallswap": {"xla_tpu_enable_dot_strength_reduction": "false"},
}


def _with_compiler_options(opts):
    """Re-jit optimize.run_segment with extra XLA compiler options."""
    import jax

    from dpst_tpu import optimize
    raw = optimize.run_segment.__wrapped__
    return jax.jit(raw, static_argnames=("n_steps", "cfg"),
                   compiler_options=opts)


def main(argv):
    names = argv or list(VARIANTS)
    unknown = [n for n in names if n not in VARIANTS
               and n not in XLA_VARIANTS]
    if unknown:  # fail before any work, not mid-sweep (ADVICE r2)
        raise SystemExit(
            f"unknown variant(s) {unknown}; known: "
            + " ".join(sorted(list(VARIANTS) + list(XLA_VARIANTS))))
    from dpst_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    import dpst_tpu
    from bench import _loop_rate

    from dpst_tpu import optimize
    orig_run_segment = optimize.run_segment
    try:
        for name in names:
            if name in XLA_VARIANTS:
                optimize.run_segment = _with_compiler_options(
                    XLA_VARIANTS[name])
                kw = {}
            else:
                optimize.run_segment = orig_run_segment
                kw = VARIANTS[name]
            cfg = dpst_tpu.StylizeConfig(
                use_segmentation=True, use_photorealism=True,
                max_classes=4, iterations=500,
                compute_dtype="bfloat16", **kw)
            try:
                ips, t_pre, _ = _loop_rate(cfg, 512, 512)
            except Exception as e:  # a rejected option shouldn't end the sweep
                print(json.dumps({"variant": name, "error": str(e)[:200]}),
                      flush=True)
                continue
            print(json.dumps({"variant": name, "ips": round(ips, 2),
                              "precompute_s": round(t_pre, 2)}),
                  flush=True)
    finally:
        # restore even on an uncaught mid-sweep exception — a leaked
        # monkeypatch would silently affect later work in this process
        optimize.run_segment = orig_run_segment


if __name__ == "__main__":
    main(sys.argv[1:])
