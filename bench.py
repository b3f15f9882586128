"""Headline benchmark: batched MCTS simulation throughput on one chip.

Measures end-to-end searched simulations per second — env stepping, legal
masking, tree ops and network evals included — on the quick-preset network
(64ch/3res, the reference's quick training net, reference: train.py:654-657).

Baseline: the reference's published quick-config sample run sustains
~0.116 games/s with 4 worker processes + batch inference server at 20
sims/move and ~60 plies/game (reference: models/training_stats.json:4-16),
i.e. ~139 NN-evaluated simulations/second. vs_baseline = ours / 139.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp

BASELINE_SIMS_PER_SEC = 139.0


def main() -> None:
    from xiangqi_alphazero_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from xiangqi_alphazero_tpu.engine import env as E
    from xiangqi_alphazero_tpu.models import init_net
    from xiangqi_alphazero_tpu.search import MCTSConfig, run_mcts

    batch = 2048
    sims = 64
    net, variables = init_net(
        jax.random.key(0), channels=64, blocks=3, dtype=jnp.bfloat16
    )

    def eval_fn(feats):
        logits, value = net.apply(variables, feats, train=False)
        return logits, value.squeeze(-1)

    cfg = MCTSConfig(num_simulations=sims)

    @jax.jit
    def search_and_step(states, rng):
        k1, k2 = jax.random.split(rng)
        res = run_mcts(eval_fn, states, k1, cfg, add_noise=True, logits_eval=True)
        from xiangqi_alphazero_tpu.search import sample_actions

        act = sample_actions(res, jnp.ones(batch), k2)
        return E.v_step(states, act)

    states = jax.jit(E.reset_batch, static_argnums=0)(batch)
    rng = jax.random.key(1)

    # compile + warmup
    rng, k = jax.random.split(rng)
    states = search_and_step(states, k)
    jax.block_until_ready(states.board)

    n_rounds = 8
    t0 = time.perf_counter()
    for _ in range(n_rounds):
        rng, k = jax.random.split(rng)
        states = search_and_step(states, k)
    jax.block_until_ready(states.board)
    dt = time.perf_counter() - t0

    sims_per_sec = batch * sims * n_rounds / dt
    print(
        json.dumps(
            {
                "metric": "mcts_sims_per_sec",
                "value": round(sims_per_sec, 1),
                "unit": f"simulations/s (batch={batch} games, 64 sims/move, 64ch/3res net, 1 chip)",
                "vs_baseline": round(sims_per_sec / BASELINE_SIMS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
