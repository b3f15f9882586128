"""Run ALL on-chip correctness guards and emit ONE JSON status line.

The four guards (tpu_step_parity, tpu_mask_parity, tpu_search_parity,
tpu_gumbel_check) exist because the tunneled TPU backend has silently
MISCOMPILED vmapped chained scatters (docs/PERF_NOTES.md 5c) — CPU tests
cannot catch that class of bug. Each is a bounded (<60 s device
wall-clock) asserting program; this runner executes them as subprocesses
with hard timeouts and aggregates:

    python scripts/run_guards.py            # prints one JSON line
    python scripts/run_guards.py --out GUARDS_r03.json

bench.py also invokes this (gated by XQAZ_BENCH_GUARDS=0) so every
driver-recorded BENCH_r{N}.json carries the guards' pass/fail alongside
the perf numbers — a silent miscompile regression between rounds surfaces
as guards_ok=false, not as mystery bench numbers.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

GUARDS = (
    "tpu_step_parity",
    "tpu_mask_parity",
    "tpu_search_parity",
    "tpu_gumbel_check",
)
_HERE = os.path.dirname(os.path.abspath(__file__))


def run_guards(timeout_per_guard: int = 900) -> dict:
    """Run each guard in a fresh interpreter (bounded); returns a summary
    dict. A guard that hangs past its timeout is reported as 'timeout'
    (the tunneled backend's device-init hang is uninterruptible in-process,
    so the subprocess boundary is the only reliable bound)."""
    results = {}
    for name in GUARDS:
        path = os.path.join(_HERE, f"{name}.py")
        t0 = time.perf_counter()
        try:
            proc = subprocess.run(
                [sys.executable, path],
                capture_output=True,
                text=True,
                timeout=timeout_per_guard,
            )
            status = "ok" if proc.returncode == 0 else "fail"
            detail = "" if proc.returncode == 0 else (
                (proc.stderr or proc.stdout)[-400:]
            )
        except subprocess.TimeoutExpired:
            status, detail = "timeout", ""
        results[name] = {
            "status": status,
            "seconds": round(time.perf_counter() - t0, 1),
            **({"detail": detail} if detail else {}),
        }
    return {
        "ok": all(r["status"] == "ok" for r in results.values()),
        "guards": results,
    }


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description="on-chip correctness guards")
    p.add_argument("--out", help="also write the JSON summary to this file")
    p.add_argument("--timeout", type=int, default=900,
                   help="per-guard subprocess timeout (seconds; compile "
                        "dominates — the search guard takes ~7 min cold "
                        "under host-CPU contention)")
    args = p.parse_args(argv)
    summary = run_guards(args.timeout)
    line = json.dumps(summary)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0 if summary["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
