"""On-chip batched-MCTS parity vs the host reference mirror.

Runs the compiled search (Pallas mask + array tree + dense backup) on the
REAL TPU and asserts EXACT root-visit-count equality against the pure-
Python mirror of the reference semantics (tests/test_mcts.py) — guarding
the compiled TPU program (scatter lowering, bf16 kernel, fori/while
loops).

Exactness across backends is engineered: the mock network here uses only
DYADIC-RATIONAL arithmetic — uniform 1/64 raw priors (slot sums and the
normalizing division are exact in f32 in any summation order) and a
linear value (own-opp)/8 (integer counts, exact dyadic divide). No
transcendentals, so host numpy and the TPU produce bit-identical UCBs and
the tie-break semantics decide every selection identically.

    python scripts/tpu_search_parity.py
"""

import sys

import numpy as np


def main() -> int:
    repo = __file__.rsplit("/", 2)[0]
    sys.path.insert(0, repo)
    import jax
    import jax.numpy as jnp

    from tests.test_mcts import _advance_random, _py_mcts
    from xiangqi_alphazero_tpu.engine import env as E
    from xiangqi_alphazero_tpu.search import MCTSConfig, run_mcts

    uniform_raw = np.full(8100, 1.0 / 64.0, np.float32)

    def exact_value_np(feats: np.ndarray) -> float:
        own = float(feats[..., :7].sum())
        opp = float(feats[..., 7:14].sum())
        return (own - opp) / 8.0

    def exact_eval_jax(feats):
        probs = jnp.broadcast_to(
            jnp.asarray(uniform_raw), (feats.shape[0], 8100)
        )
        own = jnp.sum(feats[..., :7], axis=(1, 2, 3))
        opp = jnp.sum(feats[..., 7:14], axis=(1, 2, 3))
        return probs, (own - opp) / 8.0

    # 64 sims crosses the staged-node-budget threshold (mcts._STAGE_AT_2);
    # the batch gate is lowered so the 6-position batch stages too. Both
    # staged program shapes production compiles are exercised on chip: the
    # 2-stage plan (default thresholds) and the 4-stage plan that
    # standard/full/tpu presets run at 200+ sims (forced here by lowering
    # _STAGE_AT_4 — the ceil-8 intermediate budgets differ per plan, which
    # is exactly the shape-dependent class PERF_NOTES 5c miscompiles).
    from xiangqi_alphazero_tpu.search import mcts as _m

    _m._STAGE_MIN_BATCH = 1
    cfg = MCTSConfig(num_simulations=64)
    cases = [_advance_random(p, s) for p, s in
             [(0, 0), (3, 1), (8, 2), (15, 3), (26, 4), (37, 5)]]
    states = [
        E.state_from_numpy(np.asarray(p.board, np.int8), p.side)
        for p in cases
    ]
    roots = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    want = [
        _py_mcts(
            pos, cfg.num_simulations,
            raw_probs=uniform_raw, value_fn=exact_value_np,
        )
        for pos in cases
    ]

    bad = 0
    for tag, stage_at_4 in (("2-stage", _m._STAGE_AT_4), ("4-stage", 64)):
        _m._STAGE_AT_4 = stage_at_4
        n_seg = len(_m._stage_plan(cfg.num_simulations, batch=len(cases)))
        assert n_seg == int(tag[0]), (tag, n_seg)
        res = jax.jit(
            lambda r, k: run_mcts(exact_eval_jax, r, k, cfg, add_noise=False)
        )(roots, jax.random.key(0))
        acts = np.asarray(res.actions)
        vis = np.asarray(res.visits)
        plan_bad = 0
        for i in range(len(cases)):
            got = {int(a): int(n) for a, n in zip(acts[i], vis[i]) if n > 0}
            if got != want[i]:
                plan_bad += 1
                print(
                    f"{tag} case {i}: MISMATCH\n"
                    f"  tpu   ={got}\n  mirror={want[i]}"
                )
        bad += plan_bad
        print(
            f"  {tag}: {len(cases)} positions x {cfg.num_simulations} sims "
            f"{'ok' if plan_bad == 0 else 'FAIL'}"
        )
    print(f"SEARCH PARITY {'OK' if bad == 0 else 'FAIL'}")
    assert bad == 0
    return 0


if __name__ == "__main__":
    sys.exit(main())
