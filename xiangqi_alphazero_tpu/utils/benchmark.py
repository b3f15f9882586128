"""Search/engine profiling harness (CLI).

The reference ships a profiler that manually unrolls MCTS.search and times
11 phases with perf_counter (reference: training/benchmark.py). The TPU
equivalent can't bracket phases inside one fused program, so this harness
times each subsystem as its own jitted program — env stepping, legal-mask
computation, feature extraction, network forward, full MCTS — and reports
per-phase throughput plus the same style of summary table. Pass
--trace DIR to additionally capture a jax.profiler trace for op-level
analysis.

Usage:  python -m xiangqi_alphazero_tpu.utils.benchmark \
            [--batch 256] [--sims 64] [--channels 64] [--blocks 3]
        (two preset profiles mirror reference benchmark.py:282-285:
         --profile quick = 64ch/3res/80sims, --profile standard =
         128ch/6res/200sims)
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from ..engine import env as E
from ..models import init_net
from ..search import MCTSConfig, run_mcts, sample_actions
from .profiling import phase_profile


def _time(fn, *args, iters: int = 10, warmup: int = 2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--sims", type=int, default=64)
    p.add_argument("--channels", type=int, default=64)
    p.add_argument("--blocks", type=int, default=3)
    p.add_argument("--profile", choices=["quick", "standard"], default=None)
    p.add_argument("--trace", type=str, default=None)
    p.add_argument("--gumbel-sims", type=int, default=0,
                   help="also time a gumbel full-move search at this "
                        "budget (moves/s — the strength-per-wall-clock "
                        "comparison against the PUCT rows)")
    args = p.parse_args(argv)

    if args.profile == "quick":
        args.channels, args.blocks, args.sims = 64, 3, 80
    elif args.profile == "standard":
        args.channels, args.blocks, args.sims = 128, 6, 200

    B = args.batch
    dev = jax.devices()[0]
    print(f"device: {dev.platform} ({dev.device_kind}), batch={B}, "
          f"net={args.channels}ch/{args.blocks}res, sims={args.sims}")

    net, variables = init_net(
        jax.random.key(0), channels=args.channels, blocks=args.blocks,
        dtype=jnp.bfloat16,
    )

    def eval_fn(feats):
        logits, value = net.apply(variables, feats, train=False)
        return jax.nn.softmax(logits, axis=-1), value.squeeze(-1)

    states = jax.jit(E.reset_batch, static_argnums=0)(B)
    acts = jnp.full((B,), 44, jnp.int32)
    feats = E.v_features(states.board, states.side)

    step_j = jax.jit(E.v_step)
    legal_j = jax.jit(E.v_legal_mask)
    feats_j = jax.jit(E.v_features)
    net_j = jax.jit(eval_fn)
    cfg = MCTSConfig(num_simulations=args.sims)

    @jax.jit
    def search_j(s, k):
        return run_mcts(eval_fn, s, k, cfg, add_noise=True)

    @jax.jit
    def move_j(s, k):
        k1, k2 = jax.random.split(k)
        res = run_mcts(eval_fn, s, k1, cfg, add_noise=True)
        return E.v_step(s, sample_actions(res, jnp.ones(B), k2))

    rows = []
    with phase_profile(args.trace):
        t = _time(step_j, states, acts)
        rows.append(("env.step (incl. legal mask)", t, B / t, "boards/s"))
        t = _time(legal_j, states.board, states.side)
        rows.append(("legal_mask alone", t, B / t, "boards/s"))
        t = _time(feats_j, states.board, states.side)
        rows.append(("features", t, B / t, "boards/s"))
        t = _time(net_j, feats)
        rows.append(("network forward", t, B / t, "evals/s"))
        t = _time(search_j, states, jax.random.key(1), iters=3, warmup=1)
        t_search = t
        rows.append(("MCTS search (full move)", t, B * args.sims / t, "sims/s"))
        t = _time(move_j, states, jax.random.key(2), iters=3, warmup=1)
        rows.append(("search + play", t, B * args.sims / t, "sims/s"))
        if args.gumbel_sims:
            from ..search import GumbelConfig, run_gumbel_mcts

            gcfg = GumbelConfig(num_simulations=args.gumbel_sims)

            @jax.jit
            def gumbel_j(s, k):
                return run_gumbel_mcts(eval_fn, s, k, gcfg)

            t = _time(gumbel_j, states, jax.random.key(3), iters=3, warmup=1)
            rows.append((
                f"gumbel search ({args.gumbel_sims} sims, full move)",
                t, B / t, "moves/s",
            ))

    width = max(len(r[0]) for r in rows)
    print(f"\n{'phase':<{width}}  {'ms/call':>10}  {'throughput':>14}")
    for name, t, thr, unit in rows:
        print(f"{name:<{width}}  {t * 1e3:>10.3f}  {thr:>14,.0f} {unit}")
    per_sim = t_search / args.sims * 1e3
    print(f"\nper-simulation latency: {per_sim:.3f} ms "
          f"(batch-amortized: {per_sim / B * 1e3:.2f} us/game-sim)")


if __name__ == "__main__":
    main()
