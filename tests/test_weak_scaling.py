"""The DP weak-scaling tool runs end to end on virtual CPU meshes.

Timing on a shared 1-core host is noise; this pins the *machinery*: the
child subprocess pins the CPU platform with n virtual devices, runs the
sharded `stylize_batch` at B=n, and reports positive throughput for every
device count. The cross-device *math* equivalence is pinned separately in
tests/test_sharding.py; the real-hardware throughput claim lives in
BENCH config5 + this tool's curve (see ARCHITECTURE.md).
"""
import sys


def test_weak_scaling_tool_runs():
    sys.path.insert(0, "tools")
    try:
        from weak_scaling import parent
    finally:
        sys.path.pop(0)
    rows = parent([1, 2], size=48, iters=4)
    assert [r["n"] for r in rows] == [1, 2]
    for r in rows:
        assert r["pair_iters_per_s"] > 0
        assert r["wall_s"] > 0
