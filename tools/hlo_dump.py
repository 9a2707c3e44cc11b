"""Dump the optimized HLO of the config3 512² hot loop and attribute ops.

Complements tools/trace_report.py: the trace gives per-op durations by
HLO name (fusion.1005, copy.1424, …); this dumps the optimized module so
those names can be joined with `metadata={source_file/source_line}` and
the fused computation bodies. This is the per-source-line half of the
measurement loop described in ARCHITECTURE.md.

Usage:
  python tools/hlo_dump.py [outfile]            # dump full module text
  python tools/hlo_dump.py --ops fusion.1005 copy.1424 [...]
      # print each op's root instruction line(s) + fused-computation body

Config overrides via DPST_TRACE_KW, same as trace_report.py.
"""
import json
import os
import re
import sys


def build_text() -> str:
    from dpst_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp

    import dpst_tpu
    from bench import _masks, _pair
    from dpst_tpu import optimize, prepare_constants
    from dpst_tpu.models import vgg

    kw = json.loads(os.environ.get("DPST_TRACE_KW", "{}"))
    size = int(os.environ.get("DPST_TRACE_SIZE", "512"))
    base = dict(use_segmentation=True, use_photorealism=True,
                max_classes=4, iterations=500, compute_dtype="bfloat16")
    base.update(kw)
    cfg = dpst_tpu.StylizeConfig(**base)
    content, style = _pair(size, size)
    cmask = _masks(4, size, size)
    vgg_params = vgg.get_params(seed=0)
    weights = optimize.LossWeights.from_config(cfg)
    loop_cfg = cfg.loop_config()
    opt = optimize.make_optimizer(loop_cfg)
    consts = prepare_constants(
        jnp.asarray(content), jnp.asarray(style), jnp.asarray(cmask),
        jnp.asarray(cmask.copy()), cfg, vgg_params)
    image = optimize.init_image(cfg, jnp.asarray(content))
    opt_state = optimize.init_opt_state(opt, loop_cfg, image)
    # match trace_report's n_steps so the compiled program (and its
    # fusion numbering) is the SAME executable the trace measured —
    # and a compilation-cache hit instead of a fresh remote compile.
    n_steps = int(os.environ.get("DPST_TRACE_STEPS", "100"))
    lowered = optimize.run_segment.lower(
        image, opt_state, consts, weights, vgg_params,
        n_steps=n_steps, cfg=loop_cfg)
    return lowered.compile().as_text()


def attribute(text: str, ops: list) -> None:
    lines = text.splitlines()
    # index: computation name -> (start, end) and instruction name -> line no
    inst_line = {}
    for i, ln in enumerate(lines):
        m = re.match(r"\s*(?:ROOT )?%?([\w.-]+) = ", ln)
        if m:
            inst_line.setdefault(m.group(1), []).append(i)
    for op in ops:
        print(f"\n=== {op} ===")
        for i in inst_line.get(op, []):
            ln = lines[i].strip()
            print(ln[:400])
            # fused computation body: find calls= or to_apply= target
            m = re.search(r"(?:calls|to_apply)=%?([\w.-]+)", ln)
            if m:
                body = m.group(1)
                # print the body's instructions w/ source metadata
                start = None
                for j, bl in enumerate(lines):
                    if re.match(rf"%?{re.escape(body)} ", bl.strip()):
                        start = j
                        break
                if start is not None:
                    depth = 0
                    for j in range(start, min(start + 400, len(lines))):
                        bl = lines[j]
                        meta = re.search(
                            r"metadata=\{[^}]*op_name=\"([^\"]*)\"[^}]*"
                            r"source_file=\"([^\"]*)\"[^}]*"
                            r"source_line=(\d+)", bl)
                        shape = re.match(r"\s*(?:ROOT )?%?[\w.-]+ = (\S+)",
                                         bl)
                        kind = re.search(r"= \S+ ([\w-]+)\(", bl)
                        if meta:
                            print(f"  {kind.group(1) if kind else '?':<22}"
                                  f" {shape.group(1) if shape else '?':<40}"
                                  f" {os.path.basename(meta.group(2))}:"
                                  f"{meta.group(3)}  {meta.group(1)[:80]}")
                        depth += bl.count("{") - bl.count("}")
                        if j > start and depth <= 0:
                            break


if __name__ == "__main__":
    if "--ops" in sys.argv:
        idx = sys.argv.index("--ops")
        ops = sys.argv[idx + 1:]
        cache = os.environ.get("HLO_CACHE", "/tmp/dpst_hlo.txt")
        if os.path.exists(cache) and os.environ.get("HLO_REBUILD") != "1":
            text = open(cache).read()
        else:
            text = build_text()
            with open(cache, "w") as f:
                f.write(text)
        attribute(text, ops)
    else:
        out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dpst_hlo.txt"
        text = build_text()
        with open(out, "w") as f:
            f.write(text)
        print(f"wrote {len(text.splitlines())} lines to {out}")
