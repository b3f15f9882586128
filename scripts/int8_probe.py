"""On-chip w8a8 int8 inference probe (round-5 perf spike, VERDICT item 6).

Three measurements on the real TPU, one JSON line each:
 1. forward-only: bf16 net.apply vs int8_forward at standard config
    (128ch/6res, batch 1024) — isolates the NN kernel speedup.
 2. end-to-end search: 200-sim PUCT sims/s with each forward — the
    number that would move BENCH if the spike wins.
 3. strength: 64-game arena, SAME shipped weights, bf16 side vs int8
    side at 40-sim temp 0.2 — quantization must be strength-neutral
    (score ~0.5) to be usable for self-play/eval.

Usage: python scripts/int8_probe.py [--skip-arena]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--skip-arena", action="store_true")
    p.add_argument("--model", default="models/pretrained/best_model")
    p.add_argument("--games", type=int, default=64)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from xiangqi_alphazero_tpu.engine import env as E
    from xiangqi_alphazero_tpu.models import quant as Q
    from xiangqi_alphazero_tpu.search import MCTSConfig, run_mcts
    from xiangqi_alphazero_tpu.serve.predictor import Predictor
    from xiangqi_alphazero_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    pred = Predictor.load(args.model, num_simulations=4)
    net, variables = pred.net, pred.variables
    # bf16 compute twin of the shipped weights (the serving default)
    import flax.linen as nn  # noqa: F401
    from xiangqi_alphazero_tpu.models.resnet import XiangqiNet

    net16 = XiangqiNet(channels=net.channels, blocks=net.blocks,
                       dtype=jnp.bfloat16)
    qn = Q.quantize_net(variables)

    batch = 1024
    states = jax.jit(E.reset_batch, static_argnums=0)(batch)
    k = jax.random.key(0)
    step = jax.jit(E.v_step)
    for _ in range(10):
        k, k2 = jax.random.split(k)
        g = jax.random.gumbel(k2, states.legal.shape)
        act = jnp.argmax(jnp.where(states.legal, g, -jnp.inf), -1)
        states = step(states, act.astype(jnp.int32))
    feats = E.v_features(states.board, states.side)
    np.asarray(feats)

    # ---- 1. forward-only ------------------------------------------------
    fwd16 = jax.jit(lambda v, x: net16.apply(v, x, train=False))
    fwd8 = jax.jit(Q.int8_forward)
    np.asarray(fwd16(variables, feats)[0])  # compile
    np.asarray(fwd8(qn, feats)[0])

    def best_of(fn, n=3, reps=20):
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn()
            np.asarray(out[0])
            best = min(best, (time.perf_counter() - t0) / reps)
        return best

    t16 = best_of(lambda: fwd16(variables, feats))
    t8 = best_of(lambda: fwd8(qn, feats))
    print(json.dumps({
        "probe": "forward_only", "batch": batch,
        "bf16_ms": round(t16 * 1e3, 3), "int8_ms": round(t8 * 1e3, 3),
        "speedup": round(t16 / t8, 3),
    }), flush=True)

    # ---- 2. end-to-end 200-sim search ----------------------------------
    cfg = MCTSConfig(num_simulations=200)

    @jax.jit
    def search16(v, st, rng):
        def ev(f):
            lo, va = net16.apply(v, f, train=False)
            return lo, va.squeeze(-1)
        return run_mcts(ev, st, rng, cfg, add_noise=True,
                        logits_eval=True).visits[0, 0]

    @jax.jit
    def search8(q, st, rng):
        return run_mcts(Q.int8_logits_fn(q), st, rng, cfg, add_noise=True,
                        logits_eval=True).visits[0, 0]

    k1 = jax.random.key(1)
    np.asarray(search16(variables, states, k1))
    np.asarray(search8(qn, states, k1))

    def search_window(fn, carry_args, n=3, reps=2):
        best = float("inf")
        kk = jax.random.key(2)
        for _ in range(n):
            t0 = time.perf_counter()
            for _ in range(reps):
                kk, k2 = jax.random.split(kk)
                r = fn(*carry_args, k2)
            np.asarray(r)
            best = min(best, (time.perf_counter() - t0) / reps)
        return best

    s16 = search_window(search16, (variables, states))
    s8 = search_window(search8, (qn, states))
    print(json.dumps({
        "probe": "search_200sim", "batch": batch,
        "bf16_sims_per_sec": round(batch * 200 / s16, 1),
        "int8_sims_per_sec": round(batch * 200 / s8, 1),
        "speedup": round(s16 / s8, 3),
    }), flush=True)

    # ---- 3. strength neutrality arena ----------------------------------
    if not args.skip_arena:
        from xiangqi_alphazero_tpu.models.quant import int8_forward
        from xiangqi_alphazero_tpu.train.arena import (
            ArenaSettings,
            make_hosted_arena,
        )

        class _QNetShim:
            def apply(self, qn_tree, feats, train=False):
                return int8_forward(qn_tree, feats)

        s = ArenaSettings(num_simulations=40, temperature=0.2)
        run = make_hosted_arena(net, _QNetShim(), args.games, s)
        t0 = time.perf_counter()
        out = run(variables, qn, jax.random.key(7))
        out.update(probe="arena_bf16_vs_int8", sims=40, temperature=0.2,
                   wall_s=round(time.perf_counter() - t0, 1))
        print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
