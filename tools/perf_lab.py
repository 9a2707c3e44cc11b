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
}


def main(argv):
    names = argv or list(VARIANTS)
    from dpst_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    import dpst_tpu
    from bench import _loop_rate

    for name in names:
        kw = VARIANTS[name]
        cfg = dpst_tpu.StylizeConfig(
            use_segmentation=True, use_photorealism=True, max_classes=4,
            iterations=500, compute_dtype="bfloat16", **kw)
        ips, t_pre, _ = _loop_rate(cfg, 512, 512)
        print(json.dumps({"variant": name, "ips": round(ips, 2),
                          "precompute_s": round(t_pre, 2)}), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
