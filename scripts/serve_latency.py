"""Serving-latency benchmark: p50/p95 AI-move latency vs simulation budget
and vs session-coalescing width.

The reference publishes its serving economics (reference:
GPU_INFERENCE_FIX_SUMMARY.md:71-73 — requests/s and mean batch of its
socket inference server); this is the equivalent table for the TPU serving
layer: concurrent sessions coalesced by ``serve.sessions.BatchedSearcher``
into fused device searches (the same code path ``serve.api`` drives), with
per-request wall-clock measured end to end at the searcher boundary.

Bounded by design: every (sims, concurrency) cell issues a fixed number of
requests over random midgame positions, all program shapes are warmed
first, and each search is one bounded device program (serving depths stay
far under the tunnel's ~60 s watchdog).

Usage:  python scripts/serve_latency.py [--model models/pretrained/best_model]
            [--sims 100,500,2000] [--conc 1,4,8] [--requests 24]
Prints a markdown table (for docs/DEMO.md) plus one JSON line.
"""

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _midgame_positions(n: int, seed: int = 3):
    """Random legal midgame positions via oracle self-play (host-side)."""
    from xiangqi_alphazero_tpu.engine.oracle import Position

    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        pos = Position()
        for _ in range(int(rng.integers(6, 24))):
            acts = pos.legal_actions()
            if not acts or pos.result() is not None:
                break
            pos = pos.play(int(rng.choice(acts)))
        out.append(pos)
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="models/pretrained/best_model")
    p.add_argument("--sims", default="100,500,2000")
    p.add_argument("--conc", default="1,4,8")
    p.add_argument("--requests", type=int, default=24)
    p.add_argument("--algo", default="puct", choices=["puct", "gumbel"])
    args = p.parse_args()

    from xiangqi_alphazero_tpu.serve.predictor import Predictor
    from xiangqi_alphazero_tpu.serve.sessions import BatchedSearcher
    from xiangqi_alphazero_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    sims_list = [int(s) for s in args.sims.split(",")]
    conc_list = [int(c) for c in args.conc.split(",")]
    positions = _midgame_positions(max(args.requests, 32))

    rows, cells = [], {}
    for sims in sims_list:
        pred = Predictor.load(args.model, num_simulations=sims,
                              algo=args.algo)
        searcher = BatchedSearcher(pred, max_batch=max(conc_list))
        print(f"[warmup] sims={sims} (compiles every bucket)...",
              file=sys.stderr, flush=True)
        searcher.warmup(buckets=sorted(set(conc_list)))
        for conc in conc_list:
            lat, lock = [], threading.Lock()
            per_thread = max(1, args.requests // conc)

            def client(tid: int):
                for j in range(per_thread):
                    pos = positions[(tid * per_thread + j) % len(positions)]
                    t0 = time.perf_counter()
                    searcher.search(pos)
                    dt = time.perf_counter() - t0
                    with lock:
                        lat.append(dt)

            threads = [
                threading.Thread(target=client, args=(t,))
                for t in range(conc)
            ]
            t_all = time.perf_counter()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            wall = time.perf_counter() - t_all
            ms = np.asarray(sorted(lat)) * 1e3
            p50 = float(np.percentile(ms, 50))
            p95 = float(np.percentile(ms, 95))
            thr = len(lat) / wall
            rows.append((sims, conc, p50, p95, thr))
            cells[f"s{sims}_c{conc}"] = {
                "p50_ms": round(p50, 1), "p95_ms": round(p95, 1),
                "moves_per_s": round(thr, 2),
            }
            print(f"sims={sims} conc={conc}: p50={p50:.0f} ms "
                  f"p95={p95:.0f} ms {thr:.2f} moves/s",
                  file=sys.stderr, flush=True)
        searcher.stop()

    print("\n| sims | concurrent sessions | p50 | p95 | moves/s |")
    print("|---|---|---|---|---|")
    for sims, conc, p50, p95, thr in rows:
        print(f"| {sims} | {conc} | {p50:,.0f} ms | {p95:,.0f} ms "
              f"| {thr:.2f} |")
    print(json.dumps({"ok": True, "algo": args.algo, "cells": cells}))


if __name__ == "__main__":
    main()
