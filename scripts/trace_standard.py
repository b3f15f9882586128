"""Capture a device trace of the EXACT bench.py standard-config search
(batch 1024, 128ch/6res, 200 sims, logits_eval) and aggregate the device
stream — the workflow behind every PERF_NOTES finding. Usage:

  python scripts/trace_standard.py [--dir /tmp/trace_std] [--batch 1024]
  python -m xiangqi_alphazero_tpu.utils.trace_tools /tmp/trace_std
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--dir", default="/tmp/trace_std")
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--sims", type=int, default=200)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from xiangqi_alphazero_tpu.engine import env as E
    from xiangqi_alphazero_tpu.models import init_net
    from xiangqi_alphazero_tpu.search import MCTSConfig, run_mcts
    from xiangqi_alphazero_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    net, variables = init_net(
        jax.random.key(3), channels=128, blocks=6, dtype=jnp.bfloat16
    )

    def eval_std(feats):
        logits, value = net.apply(variables, feats, train=False)
        return logits, value.squeeze(-1)

    cfg = MCTSConfig(num_simulations=args.sims)

    @jax.jit
    def search_std(states, rng):
        res = run_mcts(eval_std, states, rng, cfg, add_noise=True,
                       logits_eval=True)
        return res.visits[0, 0]

    states = jax.jit(E.reset_batch, static_argnums=0)(args.batch)
    k = jax.random.key(4)
    np.asarray(search_std(states, k))  # compile + warmup
    t0 = time.perf_counter()
    with jax.profiler.trace(args.dir):
        k, k2 = jax.random.split(k)
        r = search_std(states, k2)
        np.asarray(r)
    dt = time.perf_counter() - t0
    print(f"traced 1 search: {dt*1000:.1f} ms/move = "
          f"{args.batch*args.sims/dt:.0f} sims/s -> {args.dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
