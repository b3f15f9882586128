"""On-chip probe for the eval-shape staging gap (search/mcts.py notes).

Gated eval searches half-batches of eval_games/2 = 32 at the tpu preset —
below _STAGE_MIN_BATCH=64, so the search runs UNSTAGED with the full node
budget's HBM traffic from simulation 0. At batch 32 the ew array is only
~6.6 MB (32 x 2 x 201 x 128 x 4B), so whether staging pays at that shape
is an empirical question this script answers: it times the exact eval
search shape (batch 32, 200 sims, 128ch/6res) unstaged vs force-staged
(_STAGE_MIN_BATCH lowered to 32) and prints one JSON line.

Bounded: two compiles + best-of-3 timed windows of 2 searches each.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _time_search(batch: int, sims: int, label: str) -> float:
    from xiangqi_alphazero_tpu.engine import env as E
    from xiangqi_alphazero_tpu.models import init_net
    from xiangqi_alphazero_tpu.search import MCTSConfig, run_mcts

    net, variables = init_net(
        jax.random.key(3), channels=128, blocks=6, dtype=jnp.bfloat16
    )

    def eval_fn(feats):
        logits, value = net.apply(variables, feats, train=False)
        return logits, value.squeeze(-1)

    cfg = MCTSConfig(num_simulations=sims)

    @jax.jit
    def search(states, rng):
        res = run_mcts(eval_fn, states, rng, cfg, add_noise=False,
                       logits_eval=True)
        return res.visits[0, 0]

    states = jax.jit(E.reset_batch, static_argnums=0)(batch)
    k = jax.random.key(5)
    np.asarray(search(states, k))  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(2):
            k, k2 = jax.random.split(k)
            r = search(states, k2)
        np.asarray(r)
        best = min(best, time.perf_counter() - t0)
    print(f"[{label}] {best / 2 * 1e3:.1f} ms/search", file=sys.stderr,
          flush=True)
    return best / 2


def main() -> None:
    from xiangqi_alphazero_tpu.search import mcts as M
    from xiangqi_alphazero_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    batch, sims = 32, 200
    t_unstaged = _time_search(batch, sims, "unstaged (current)")
    M._STAGE_MIN_BATCH = batch  # force the 4-stage plan at the eval shape
    t_staged = _time_search(batch, sims, "staged (forced)")
    print(json.dumps({
        "batch": batch, "sims": sims,
        "unstaged_ms": round(t_unstaged * 1e3, 1),
        "staged_ms": round(t_staged * 1e3, 1),
        "staged_speedup": round(t_unstaged / t_staged, 3),
    }))


if __name__ == "__main__":
    main()
