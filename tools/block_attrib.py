#!/usr/bin/env python
"""Per-VGG-block step-time attribution: join a profiler trace with the
same executable's optimized HLO (VERDICT r3 item 3).

trace_report.py aggregates by HLO op name (fusion.1005, …); this tool
goes one level further, with two classifiers joined per op:

1. SOURCE classifier (primary, round 5): the optimized HLO carries
   metadata={source_file, source_line} per instruction. The tool parses
   the repo's own sources with `ast` to recover function line spans and
   maps each op's (file, line) to the function that emitted it — which
   names the pipeline stage exactly even where shapes are ambiguous
   (the stream12 scan's strip tensors used to land in "block3" by
   shape). Run it from the same checkout that built the HLO.
2. SHAPE classifier (fallback): each op's result shape — and for
   fusions the shapes inside the fused computation body — against each
   block's canonical (spatial, channels) signature at the given input
   size. Still used for the standard-path conv loop, where one source
   line serves all five blocks.

MXU time = convolution/dot opcodes (root or fused body). No chip
needed: pure trace+text parsing.

Usage: python tools/block_attrib.py TRACE_DIR HLO_TXT STEPS SIZE [BATCH]
"""
import ast
import collections
import functools
import glob
import gzip
import json
import os
import re
import sys

_SHAPE = re.compile(r"(?:bf16|f32|f16|s32|u32|s8|u8|pred|s64|u64)"
                    r"\[([0-9,]*)\]")
_INST = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.-]+) = ")
_OPCODE = re.compile(r"= (?:\([^)]*\)|[^ ]+) ([a-z][\w-]*)")
_CALLS = re.compile(r"(?:calls|to_apply)=%?([\w.-]+)")
_COMP = re.compile(r"^%?([\w.-]+)\s+(?:\([^)]*\))?.*\{\s*$")
_META = re.compile(r'source_file="([^"]+)" source_line=(\d+)')

MXU_OPS = {"convolution", "dot"}

# --- source classifier (primary): (file, line) -> pipeline segment ------
# vgg.py functions whose ops are unambiguous regardless of shape; the
# extract_features/extract_tail conv loops stay with the shape
# classifier (one source line serves all five blocks there).
_VGG_FUNC_SEG = {
    "_block1_s2d": "block1", "_k4_conv": "block1",
    "_k4_conv_fwd": "block1", "_k4_conv_bwd": "block1",
    "_s2d_conv": "block1", "_parity_pool": "block1",
    "_parity_pool_fwd": "block1", "_parity_pool_bwd": "block1",
    "_s2d_zero_oob": "block1", "s2d_slices_par": "block1",
    "s2d_masks_par": "block1", "_flat_conv3x3": "scan:block2+feeds",
    "strip_fwd": "scan:block2+feeds",
    "pool_strip": "scan:block2+feeds",
    # the checkpointed strip body's REMAT re-run collapses every op onto
    # the ckpt_body call line inside scan_body — those ops are split by
    # the strip-geometry shape classifier instead (see _scan_strip)
    "scan_body": "?remat", "stream_block12_grams": "scan:stage",
}

# (hs, halo) of the stream12 strip scan, set from argv when analyzing a
# streamed program: enables strip-geometry shape signatures for the
# remat blob whose ops all share the scan_body source line.
_scan_strip = None


def classify_strip(dims, size):
    """Strip-geometry shape classifier for ops inside the remat blob."""
    import math
    hs, halo = _scan_strip
    if not dims or len(dims) < 2:
        return "scan:bwd:other"
    c = dims[-1]
    n = 1
    for x in dims[:-1]:
        n *= x
    if n <= 0:
        return "scan:bwd:other"
    if c <= 4:
        return "scan:bwd:input"
    r_half = hs // 2 + halo
    CAND = [("scan:bwd:block1", (r_half + 1) * (size + 2) / 2, 256),
            ("scan:bwd:block1", r_half * size / 2, 256),
            ("scan:bwd:block1", r_half * size / 2, 64),
            ("scan:bwd:block2", r_half * size / 2, 128),
            ("scan:bwd:block2", (r_half // 2) * size / 4, 128)]
    best, best_s = "scan:bwd:other", 1e9
    for seg, n_c, c_c in CAND:
        score = (abs(math.log(n / n_c))
                 + 0.7 * abs(math.log(max(c, 1) / c_c)))
        if score < best_s:
            best, best_s = seg, score
    return best if best_s < math.log(2.5) else "scan:bwd:other"


@functools.lru_cache(maxsize=None)
def _func_spans(path):
    """((start, end, name) ...) for every def in PATH, innermost-first."""
    try:
        with open(path) as f:
            tree = ast.parse(f.read())
    except (OSError, SyntaxError):
        return ()
    spans = [(n.lineno, n.end_lineno or n.lineno, n.name)
             for n in ast.walk(tree)
             if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))]
    spans.sort(key=lambda s: s[1] - s[0])
    return tuple(spans)


def seg_from_src(src):
    """Pipeline segment for one op's metadata source, or None to fall
    back to the shape classifier. Requires running from the checkout
    that built the HLO (line spans come from the current sources)."""
    if not src:
        return None
    path, line = src
    base = os.path.basename(path)
    if "optax" in path:
        return "optimizer/image"
    if not path.startswith("/root/repo"):
        return None
    if base == "vgg.py":
        fn = next((name for a, b, name in _func_spans(path)
                   if a <= line <= b), None)
        return _VGG_FUNC_SEG.get(fn)
    if base in ("losses.py", "gram_stream.py"):
        return "gram/loss"
    if base == "gram_s2d.py":
        return "gram_s2d"
    if base.startswith("laplacian"):
        return "laplacian"
    if base in ("optimize.py",):
        return "optimizer/image"
    if base in ("resize.py", "segmentation.py"):
        return "mask/resize"
    return None


def parse_hlo(path):
    """name -> dict(opcode, shapes (list of dim tuples), body (comp name));
    plus comp name -> list of instruction line indices."""
    with open(path) as f:
        lines = f.read().splitlines()
    insts = {}
    comp_of_line = {}
    comp = None
    comp_insts = collections.defaultdict(list)
    for i, ln in enumerate(lines):
        mc = re.match(r"^(?:ENTRY\s+)?%?([\w.-]+)\s.*\{\s*$", ln)
        if mc and "=" not in ln.split("{")[0]:
            comp = mc.group(1)
            continue
        m = _INST.match(ln)
        if not m:
            continue
        name = m.group(1)
        op = _OPCODE.search(ln)
        shapes = [tuple(int(d) for d in s.split(",") if d)
                  for s in _SHAPE.findall(ln.split(" metadata=")[0])]
        body = _CALLS.search(ln)
        meta = _META.search(ln)
        info = {"opcode": op.group(1) if op else "?",
                "shapes": shapes,
                "src": (meta.group(1), int(meta.group(2))) if meta
                else None,
                "body": body.group(1) if body else None}
        if info["opcode"] == "custom-call":
            mt = re.search(r'custom_call_target="([^"]*)"', ln)
            # Mosaic kernels carry the pallas_call name inside the
            # backend_config/kernel_name — keep the whole line so the
            # classifier can substring-match the kernel identity
            info["cc_target"] = mt.group(1) if mt else ""
            info["cc_line"] = ln
        insts[name] = info
        if comp:
            comp_insts[comp].append(name)
    return insts, comp_insts


def classify(dims, size):
    """One tensor -> segment label, by (channels, sqrt(total elements))
    against each block's canonical (spatial, channels) signatures at
    input SIZE. Width alone misclassifies XLA's space-to-batch conv
    tiles (e.g. bf16[64,1,8,10,512] is block4's dx, not a 10-px-wide
    block5 tensor) — the element count survives the tiling."""
    import math
    if not dims:
        return None
    if len(dims) < 2:
        return "scalar/loss"
    c = dims[-1]
    if len(dims) == 2 or (len(dims) == 3 and dims[-1] == dims[-2]
                          and c in (64, 128, 256, 512)):
        return "gram/loss"
    n = 1
    for x in dims[:-1]:
        n *= x
    if n <= 0:
        return None
    sp = math.sqrt(n)
    if c <= 4:
        return "image/laplacian" if sp >= size / 2 else "scalar/loss"
    # (spatial, channels) signatures: convs, pools, s2d parity grids
    CAND = [("block1", size, 64), ("block1", size / 2, 256),
            ("block1", size / 2, 64),
            ("block2", size / 2, 128), ("block2", size / 4, 128),
            ("block3", size / 4, 256), ("block3", size / 8, 256),
            ("block4", size / 8, 512),
            ("block5", size / 16, 512)]
    best, best_s = None, 1e9
    for seg, sp_c, c_c in CAND:
        score = (abs(math.log(sp / sp_c))
                 + 0.5 * abs(math.log(max(c, 1) / c_c)))
        if score < best_s:
            best, best_s = seg, score
    return best if best_s < math.log(1.8) else None


def op_segment(name, insts, comp_insts, size):
    """Segment + is_mxu for one HLO op, fused bodies included: the
    segment of the LARGEST tensor touched (traffic-dominant)."""
    info = insts.get(name)
    if info is None:
        return "unmapped", False
    shapes = list(info["shapes"])
    mxu = info["opcode"] in MXU_OPS
    # source candidates: the MXU op inside a fused body is the most
    # representative emitter op; the root's metadata is the fallback
    src = info["src"]
    if info["body"]:
        for sub in comp_insts.get(info["body"], []):
            si = insts.get(sub)
            if not si:
                continue
            shapes.extend(si["shapes"])
            if si["opcode"] in MXU_OPS:
                mxu = True
                if si["src"]:
                    src = si["src"]
    best = seg_from_src(src)
    if best == "?remat":
        # the remat blob: one source line for everything — classify by
        # the dominant tensor's strip-geometry signature when known
        if _scan_strip:
            bn = -1
            best = "scan:bwd:other"
            for d in shapes:
                n = 1
                for x in d:
                    n *= x
                if n > bn:
                    best, bn = classify_strip(d, size), n
        else:
            best = "scan:remat+bwd"
    best_n = -1
    if best is None:
        for d in shapes:
            n = 1
            for x in d:
                n *= x
            seg = classify(d, size)
            if seg and n > best_n:
                best, best_n = seg, n
    if info["opcode"] == "custom-call":
        # two Pallas kernels exist in this program family: the Laplacian
        # matvec and the gram_s2d diag-block kernel. Match each by its
        # kernel identity (pallas_call name survives in the op name or
        # the custom-call line); anything unrecognized — XLA-internal
        # custom calls, future kernels — buckets as 'other' rather than
        # being silently counted as gram MXU time (ADVICE r4).
        hint = name + info.get("cc_target", "") + info.get("cc_line", "")
        if "matvec" in hint or "laplacian" in hint:
            best, mxu = "laplacian(pallas)", False
        elif "gram" in hint:
            # the gram kernel is band MXU dots
            best, mxu = "gram_s2d(pallas)", True
        else:
            best, mxu = "custom-call(other)", False
    return best or "other", mxu


def trace_durations(trace_dir):
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz")),
        key=os.path.getmtime)
    if not paths:
        sys.exit(f"no trace under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_name, tid_name = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_name.items()
                   if "TPU" in n or "device" in n.lower()}
    lanes = {k for k, n in tid_name.items()
             if k[0] in device_pids and "XLA Ops" in n}
    if not lanes:
        # no 'XLA Ops' lane: summing ALL device lanes would double-count
        # (step/module lanes span whole steps) — take only the single
        # busiest device lane and say so (ADVICE r4)
        busy = collections.Counter()
        for e in events:
            k = (e.get("pid"), e.get("tid"))
            if e.get("ph") == "X" and k[0] in device_pids:
                busy[k] += e.get("dur", 0)
        if not busy:
            sys.exit("no device op events in trace")
        lane, lane_us = busy.most_common(1)[0]
        print(f"WARNING: no 'XLA Ops' thread; using busiest device lane "
              f"{tid_name.get(lane, lane)} ({lane_us / 1e6:.1f} s) — "
              "attribution may include non-op events", file=sys.stderr)
        lanes = {lane}
    per_op = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in lanes:
            continue
        name = e.get("name", "?")
        if name.startswith("jit_") or name.startswith("while"):
            continue
        per_op[name] += e.get("dur", 0) / 1e3
    return per_op


def main():
    global _scan_strip
    argv = list(sys.argv[1:])
    for i, a in enumerate(argv):
        # --scan HS HALO: streamed program — enable strip-geometry
        # signatures for the remat blob (e.g. --scan 128 8 at 4096²)
        if a == "--scan":
            _scan_strip = (int(argv[i + 1]), int(argv[i + 2]))
            argv = argv[:i] + argv[i + 3:]
            break
    sys.argv = [sys.argv[0]] + argv
    trace_dir, hlo_path = sys.argv[1], sys.argv[2]
    steps, size = int(sys.argv[3]), int(sys.argv[4])
    # optional 5th arg: batch size B of a vmapped batch-path trace —
    # tensor element counts carry the B factor, so the spatial estimate
    # divides it out (per-pair segment times: pass steps*B as STEPS)
    batch = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    if batch > 1:
        import math
        global classify
        _orig = classify

        def classify_b(dims, size, _orig=_orig, batch=batch):
            if len(dims) >= 3 and dims[0] == batch:
                dims = (1,) + tuple(dims[1:])
            return _orig(dims, size)

        classify = classify_b
    insts, comp_insts = parse_hlo(hlo_path)
    per_op = trace_durations(trace_dir)
    seg_total = collections.Counter()
    seg_mxu = collections.Counter()
    seg_ops = collections.defaultdict(collections.Counter)
    unmapped = collections.Counter()
    total = 0.0
    for name, dur in per_op.items():
        base = name.split("(")[0]
        seg, mxu = op_segment(base, insts, comp_insts, size)
        seg_total[seg] += dur
        if mxu:
            seg_mxu[seg] += dur
        seg_ops[seg][base] += dur
        if seg in ("unmapped", "other"):
            unmapped[base] += dur
        total += dur
    print(f"device total {total / steps * 1e3:.0f} us/step "
          f"({steps} steps, size {size})")
    print("\n| segment | us/step | % | MXU us/step | MXU share |")
    print("|---|---|---|---|---|")
    for seg, dur in seg_total.most_common():
        m = seg_mxu[seg]
        print(f"| {seg} | {dur / steps * 1e3:.0f} | "
              f"{100 * dur / total:.1f}% | {m / steps * 1e3:.0f} | "
              f"{100 * m / max(dur, 1e-9):.0f}% |")
    print("\n-- top ops per segment --")
    for seg, _ in seg_total.most_common():
        tops = ", ".join(f"{o}:{d / steps * 1e3:.0f}us"
                         for o, d in seg_ops[seg].most_common(4))
        print(f"{seg}: {tops}")
    if unmapped:
        print("\n-- largest unmapped --")
        for o, d in unmapped.most_common(8):
            print(f"  {o}: {d / steps * 1e3:.0f} us/step")


if __name__ == "__main__":
    main()
