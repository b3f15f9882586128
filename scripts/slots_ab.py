"""A/B the _legal_slots_priors layout variants on-chip (bit-exact; see
search/mcts.py _SLOTS_VARIANT). Compiles every variant's standard-config
search program in ONE process, then times them in interleaved rounds
(variant 0 = HEAD is re-timed in every round — the contemporaneous control
the time-shared tunnel requires, docs/PERF_NOTES.md measurement protocol).
Prints per-variant best-of-N ms/move and the speedup vs the SAME-round
HEAD.

  python scripts/slots_ab.py [--batch 1024] [--sims 200] [--rounds 3]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--sims", type=int, default=200)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--variants", type=int, nargs="+", default=[0, 1, 2, 3])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from xiangqi_alphazero_tpu.engine import env as E
    from xiangqi_alphazero_tpu.models import init_net
    from xiangqi_alphazero_tpu.search import MCTSConfig
    from xiangqi_alphazero_tpu.search import mcts as M
    from xiangqi_alphazero_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    net, variables = init_net(
        jax.random.key(3), channels=128, blocks=6, dtype=jnp.bfloat16
    )

    def eval_std(feats):
        logits, value = net.apply(variables, feats, train=False)
        return logits, value.squeeze(-1)

    cfg = MCTSConfig(num_simulations=args.sims)
    states = jax.jit(E.reset_batch, static_argnums=0)(args.batch)
    key = jax.random.key(4)

    progs = {}
    for v in args.variants:
        M._SLOTS_VARIANT = v

        @jax.jit
        def search(states, rng):
            res = M.run_mcts(eval_std, states, rng, cfg, add_noise=True,
                             logits_eval=True)
            return res.visits[0, 0]

        t0 = time.perf_counter()
        np.asarray(search(states, key))  # compile + run once
        print(f"variant {v}: compiled in {time.perf_counter()-t0:.0f}s",
              flush=True)
        progs[v] = search

    best = {v: float("inf") for v in args.variants}
    for rnd in range(args.rounds):
        for v in args.variants:
            key, k2 = jax.random.split(key)
            t0 = time.perf_counter()
            for _ in range(2):
                key, k3 = jax.random.split(key)
                r = progs[v](states, k3)
            np.asarray(r)
            dt = (time.perf_counter() - t0) / 2
            best[v] = min(best[v], dt)
            print(f"round {rnd} v{v}: {dt*1000:.1f} ms/move", flush=True)

    head = best[0]
    out = {
        f"v{v}": {
            "best_ms_per_move": round(best[v] * 1e3, 1),
            "sims_per_sec": round(args.batch * args.sims / best[v], 0),
            "speedup_vs_head": round(head / best[v], 4),
        }
        for v in args.variants
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
