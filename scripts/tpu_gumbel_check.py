"""On-chip Gumbel-search invariants check (bounded, <60 s device time).

The PUCT guard (tpu_search_parity.py) gets bit-exact host parity from
dyadic-rational arithmetic; the Gumbel search cannot (jax.random.gumbel is
transcendental, so candidate scores differ across backends in ULPs and
near-ties may resolve differently). This guard instead asserts the
invariants that every miscompile class seen on this backend breaks
(PERF_NOTES 5c — silently wrong boards, corrupted scatter writes):

- visit counts sum exactly to the simulation budget per live game;
- visits land on at most max_considered root candidates;
- every visited slot and the acted move are LEGAL per the host oracle;
- the improved policy is a distribution supported on legal moves only.

    python scripts/tpu_gumbel_check.py
"""

import sys

import numpy as np


def main() -> int:
    repo = __file__.rsplit("/", 2)[0]
    sys.path.insert(0, repo)
    import jax
    import jax.numpy as jnp

    from tests.test_mcts import _advance_random
    from xiangqi_alphazero_tpu.engine import env as E
    from xiangqi_alphazero_tpu.search import GumbelConfig, run_gumbel_mcts

    def eval_fn(feats):
        b = feats.shape[0]
        probs = jnp.full((b, 8100), 1.0 / 8100, jnp.float32)
        own = jnp.sum(feats[..., :7], axis=(1, 2, 3))
        opp = jnp.sum(feats[..., 7:14], axis=(1, 2, 3))
        return probs, (own - opp) / 8.0

    cfg = GumbelConfig(num_simulations=48, max_considered=8)
    cases = [_advance_random(p, s) for p, s in
             [(0, 0), (5, 1), (11, 2), (19, 3), (30, 4), (41, 5)]]
    states = [
        E.state_from_numpy(np.asarray(p.board, np.int8), p.side)
        for p in cases
    ]
    roots = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    res = jax.jit(
        lambda r, k: run_gumbel_mcts(eval_fn, r, k, cfg)
    )(roots, jax.random.key(0))

    visits = np.asarray(res.visits)
    actions = np.asarray(res.actions)
    chosen = np.asarray(res.chosen)
    pi = np.asarray(res.pi_improved)

    bad = 0
    for i, pos in enumerate(cases):
        legal = set(pos.legal_actions())
        v = visits[i]
        checks = {
            "visit budget": v.sum() == cfg.num_simulations,
            "candidate cap": (v > 0).sum() <= cfg.max_considered,
            "visited slots legal": set(
                actions[i][v > 0].tolist()
            ) <= legal,
            "chosen legal": int(chosen[i]) in legal,
            "chosen visited": v[
                int(np.flatnonzero(actions[i] == chosen[i])[0])
            ] > 0,
            "pi normalized": abs(pi[i].sum() - 1.0) < 1e-4,
            "pi on legal only": set(
                actions[i][pi[i] > 0].tolist()
            ) <= legal,
        }
        for name, ok in checks.items():
            if not ok:
                bad += 1
                print(f"case {i}: FAIL {name}")
    print(
        f"GUMBEL CHECK {'OK' if bad == 0 else 'FAIL'}: "
        f"{len(cases)} positions x {cfg.num_simulations} sims, m=8"
    )
    assert bad == 0
    return 0


if __name__ == "__main__":
    sys.exit(main())
