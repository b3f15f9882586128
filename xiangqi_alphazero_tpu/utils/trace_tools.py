"""Device-trace aggregation: the fastest way to see where a program's time
goes on this infrastructure (TensorBoard is not always available; the
trace JSON is).

    python -m xiangqi_alphazero_tpu.utils.benchmark --profile standard --trace /tmp/t
    python -m xiangqi_alphazero_tpu.utils.trace_tools /tmp/t --top 25

Sums per-op durations on the device stream of a jax.profiler trace — the
method that found the three backup-pipeline wins in docs/PERF_NOTES.md
("Where the standard-config move time goes"): whole-array layout copies,
the zeros-init sunk into the loop, and the f32 contraction operands.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
from typing import Dict, List, Tuple


def load_trace_events(trace_dir: str) -> List[dict]:
    """Read the chrome-trace JSON of the newest capture under trace_dir."""
    pats = [
        os.path.join(trace_dir, "plugins", "profile", "*", "*.trace.json.gz"),
        os.path.join(trace_dir, "*.trace.json.gz"),
    ]
    paths = sorted(p for pat in pats for p in glob.glob(pat))
    if not paths:
        raise FileNotFoundError(f"no *.trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        return json.load(f)["traceEvents"]


def aggregate_device_ops(
    events: List[dict],
) -> List[Tuple[str, float, int]]:
    """[(op name, total_ms, count)] over the device (TPU/GPU) streams,
    sorted by total duration descending."""
    pids: Dict[int, str] = {
        e["pid"]: str(e.get("args", {}).get("name"))
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dur: collections.Counter = collections.Counter()
    cnt: collections.Counter = collections.Counter()
    for e in events:
        proc = pids.get(e.get("pid"), "")
        if e.get("ph") == "X" and ("TPU" in proc or "GPU" in proc):
            dur[e.get("name", "")] += e.get("dur", 0)
            cnt[e.get("name", "")] += 1
    return [(n, d / 1e3, cnt[n]) for n, d in dur.most_common()]


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description="aggregate a jax.profiler trace")
    p.add_argument("trace_dir")
    p.add_argument("--top", type=int, default=25)
    args = p.parse_args(argv)

    rows = aggregate_device_ops(load_trace_events(args.trace_dir))
    if not rows:
        print("no device events found")
        return 1
    # the outermost program/while rows double-count their children — use
    # the largest single event as the wall-clock reference
    total = rows[0][1] or 1e-9
    print(f"device total (outermost op): {total:.2f} ms")
    for name, ms, n in rows[: args.top]:
        print(f"{ms:9.2f} ms {100 * ms / total:5.1f}% x{n:<6d} {name[:90]}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
