"""Batched MCTS tests.

The key tests are exact equivalence against a host-side mirror of the
reference search (training/mcts.py semantics: the children dict preserves
MOVE-GENERATION insertion order — priors built by iterating
get_legal_actions() — and both the strict-'>' UCB select and the temp-0
max() keep the FIRST max, so exact ties resolve to the earliest move in
generator order, NOT the lowest action number) driven by the same
deterministic mock network — the batched array tree and the object tree
must produce identical root visit counts with noise off. The batched
implementation stores children in a per-piece slot layout and reproduces
the reference tie-break via a movegen-precedence key packed into the slot
values (search.movegen_precedence, validated directly against the
reference engine's enumeration in test_reference_differential); parity is
asserted on the opening position AND on randomly advanced midgame
positions.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from xiangqi_alphazero_tpu.engine import env as E
from xiangqi_alphazero_tpu.engine.oracle import NSQ, Position
from xiangqi_alphazero_tpu.search import (
    MCTSConfig,
    action_probs_dense,
    greedy_slots as M_greedy,
    run_mcts,
    sample_actions,
)

# ---------------------------------------------------------------- mock net

_RNG = np.random.default_rng(7)
_FIXED_LOGITS = _RNG.standard_normal(8100).astype(np.float32)
_FIXED_PROBS = np.exp(_FIXED_LOGITS - _FIXED_LOGITS.max())
_FIXED_PROBS /= _FIXED_PROBS.sum()


def _mock_value_from_feats(feats: np.ndarray) -> float:
    # own piece count minus opponent piece count, squashed (float32 math)
    own = np.float32(feats[..., :7].sum())
    opp = np.float32(feats[..., 7:14].sum())
    return float(np.tanh(np.float32(own - opp) / np.float32(8.0)))


def _jax_eval(feats):
    probs = jnp.broadcast_to(
        jnp.asarray(_FIXED_PROBS), (feats.shape[0], 8100)
    )
    own = jnp.sum(feats[..., :7], axis=(1, 2, 3))
    opp = jnp.sum(feats[..., 7:14], axis=(1, 2, 3))
    value = jnp.tanh((own - opp) / 8.0)
    return probs, value


# ------------------------------------------------- host mirror of reference


class _Node:
    __slots__ = ("n", "w", "p", "kids")

    def __init__(self, prior=0.0):
        self.n = 0
        self.w = 0.0
        self.p = prior
        self.kids = {}  # action -> _Node, inserted in MOVEGEN order


def _ref_order(pos: Position, acts):
    """Actions in the reference engine's enumeration order (the oracle
    returns them ascending; the reference's dict order is movegen order)."""
    from xiangqi_alphazero_tpu.search import movegen_precedence

    return sorted(acts, key=lambda a: movegen_precedence(a, abs(pos.board[a // 90])))


def _priors(pos: Position, raw=None):
    raw = _FIXED_PROBS if raw is None else raw
    acts = _ref_order(pos, pos.legal_actions())
    mass = np.float32(sum(np.float32(raw[a]) for a in acts))
    if mass > 0:
        return {a: np.float32(raw[a]) / mass for a in acts}
    return {a: np.float32(1.0 / len(acts)) for a in acts}


def _py_mcts(pos: Position, sims: int, c_puct=1.5, raw_probs=None,
             value_fn=None):
    """Reference-semantics MCTS (training/mcts.py:94-155) with children in
    movegen insertion order and float32 UCB, matching the batched
    implementation's deterministic tie-breaks. ``raw_probs``/``value_fn``
    override the mock network (used by scripts/tpu_search_parity.py with
    exact-dyadic arithmetic so TPU-vs-host parity is bit-exact)."""
    if value_fn is None:
        value_fn = _mock_value_from_feats
    root = _Node()
    for a, p in _priors(pos, raw_probs).items():
        root.kids[a] = _Node(p)
    root_n = 0

    for _ in range(sims):
        node, path = root, []
        sim = pos.copy()
        n_parent = root_n
        while node.kids:
            best, best_u = None, -math.inf
            for a, ch in node.kids.items():
                q = np.float32(ch.w / ch.n) if ch.n else np.float32(0.0)
                u = np.float32(
                    q
                    + np.float32(c_puct)
                    * ch.p
                    * np.float32(math.sqrt(n_parent))
                    / np.float32(1 + ch.n)
                )
                if u > best_u:
                    best, best_u = a, u
            path.append(node.kids[best])
            n_parent = node.kids[best].n
            node = node.kids[best]
            sim.apply(best)

        done, winner = sim.result()
        if done:
            v = 0.0 if winner == 0 else 1.0
        else:
            feats = sim.features().transpose(1, 2, 0)
            v = value_fn(feats)
            for a, p in _priors(sim, raw_probs).items():
                node.kids[a] = _Node(p)
            v = -v

        for nd in reversed(path):
            nd.n += 1
            nd.w += v
            v = -v
        root_n += 1

    return {a: ch.n for a, ch in root.kids.items() if ch.n > 0}


# ----------------------------------------------------------------- tests


def test_visits_sum_and_legality():
    cfg = MCTSConfig(num_simulations=30)
    roots = E.reset_batch_jit(4)
    run = jax.jit(
        lambda r, k: run_mcts(_jax_eval, r, k, cfg, add_noise=True)
    )
    res = run(roots, jax.random.key(0))
    visits = np.asarray(res.visits)
    actions = np.asarray(res.actions)
    legal = set(np.nonzero(np.asarray(roots.legal[0]))[0].tolist())
    assert visits.sum(axis=1).tolist() == [30, 30, 30, 30]
    for j in range(actions.shape[1]):
        if visits[0, j] > 0:
            assert actions[0, j] in legal


def test_exact_match_vs_reference_mirror():
    cfg = MCTSConfig(num_simulations=40)
    roots = E.reset_batch_jit(2)
    run = jax.jit(
        lambda r, k: run_mcts(_jax_eval, r, k, cfg, add_noise=False)
    )
    res = run(roots, jax.random.key(0))
    got = {
        int(a): int(n)
        for a, n in zip(np.asarray(res.actions[0]), np.asarray(res.visits[0]))
        if n > 0
    }
    want = _py_mcts(Position(), 40)
    assert got == want, f"batched={got}\nmirror={want}"


def _advance_random(plies: int, seed: int) -> Position:
    """Roll the oracle forward by random legal moves, then strip history so
    the position matches a fresh ``state_from_numpy`` env state."""
    rng = np.random.default_rng(seed)
    pos = Position()
    for _ in range(plies):
        acts = pos.legal_actions()
        done, _ = pos.result()
        if done or not acts:
            break
        pos.apply(int(rng.choice(acts)))
    fresh = Position()
    fresh.board = list(pos.board)
    fresh.side = pos.side
    fresh._legal_cache = None
    return fresh


def test_exact_match_vs_mirror_random_positions():
    """Mirror parity on midgame positions where the per-piece slot order
    differs from the reference's movegen order — guards the tie-break
    semantics (every search's first simulation is an exact all-way UCB
    tie, resolved to the first move in generator order)."""
    cfg = MCTSConfig(num_simulations=36)
    cases = [_advance_random(plies, seed) for plies, seed in
             [(2, 0), (5, 1), (9, 2), (14, 3), (23, 4), (40, 5)]]
    states = [
        E.state_from_numpy(np.asarray(p.board, np.int8), p.side)
        for p in cases
    ]
    roots = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    run = jax.jit(
        lambda r, k: run_mcts(_jax_eval, r, k, cfg, add_noise=False)
    )
    res = run(roots, jax.random.key(0))
    greedy = np.asarray(jax.jit(M_greedy)(res))
    acts_np = np.asarray(res.actions)
    for i, pos in enumerate(cases):
        got = {
            int(a): int(n)
            for a, n in zip(
                np.asarray(res.actions[i]), np.asarray(res.visits[i])
            )
            if n > 0
        }
        want = _py_mcts(pos, 36)
        assert got == want, f"case {i}: batched={got}\nmirror={want}"
        # temp-0 pick: the reference's max() keeps the FIRST max-visit child
        # in the insertion-ordered dict (mcts.py:198); greedy_slots must
        # agree on every position, including visit-count ties
        best_n = max(want.values())
        mirror_pick = next(a for a, n in want.items() if n == best_n)
        assert int(acts_np[i, greedy[i]]) == mirror_pick, f"case {i}"


def test_stage_plan_invariants():
    """For every sim count: segments tile [0, total) exactly, node budgets
    cover the rows each segment's sims write (n >= hi+1), path capacity
    never binds (d >= hi+2), budgets are monotone, and the final budget is
    exactly total+1 (same array sizes as the unstaged tree)."""
    from xiangqi_alphazero_tpu.search.mcts import _stage_plan

    for total in list(range(0, 32)) + [48, 63, 64, 65, 100, 159, 160, 161,
                                       170, 200, 400, 500, 800]:
        plan = _stage_plan(total)
        assert plan[0][0] == 0 and plan[-1][1] == total
        prev_hi, prev_n = 0, 0
        for lo, hi, n_seg, d_seg in plan:
            assert lo == prev_hi and hi >= lo
            assert n_seg >= hi + 1, (total, plan)
            assert d_seg >= hi + 2, (total, plan)
            assert n_seg >= prev_n
            prev_hi, prev_n = hi, n_seg
        assert plan[-1][2] == total + 1
        # batch gate: tiny batches never stage
        assert len(_stage_plan(total, batch=1)) == 1


def test_staged_node_budget_bit_exact(monkeypatch):
    """The staged node-budget plan (run_mcts re-running its sim loop over
    segments with a growing static tree, mcts._stage_plan) must be
    invisible: bit-identical visits/actions vs the single-stage loop, and
    exact mirror parity through the staged path. Thresholds are patched so
    staging engages at test-scale sim counts."""
    from xiangqi_alphazero_tpu.search import mcts as M

    cfg = MCTSConfig(num_simulations=40)
    roots = E.reset_batch_jit(2)

    assert M._stage_plan(40) == [(0, 40, 41, 42)]
    assert M._stage_plan(200, batch=2) == [(0, 200, 201, 202)]  # batch gate
    res_one = jax.jit(
        lambda r, k: run_mcts(_jax_eval, r, k, cfg, add_noise=True)
    )(roots, jax.random.key(7))

    monkeypatch.setattr(M, "_STAGE_AT_2", 8)
    monkeypatch.setattr(M, "_STAGE_AT_4", 32)
    monkeypatch.setattr(M, "_STAGE_MIN_BATCH", 1)
    plan = M._stage_plan(40)
    assert len(plan) == 4
    assert plan[-1][1] == 40 and plan[-1][2] == 41
    for lo, hi, n_seg, d_seg in plan:
        assert n_seg >= hi + 1 and d_seg >= hi + 2
    res_4 = jax.jit(
        lambda r, k: run_mcts(_jax_eval, r, k, cfg, add_noise=True)
    )(roots, jax.random.key(7))
    np.testing.assert_array_equal(
        np.asarray(res_one.visits), np.asarray(res_4.visits)
    )
    np.testing.assert_array_equal(
        np.asarray(res_one.actions), np.asarray(res_4.actions)
    )
    np.testing.assert_allclose(
        np.asarray(res_one.root_value), np.asarray(res_4.root_value),
        atol=1e-6,
    )

    # mirror parity through the staged path (no noise, deterministic)
    res = jax.jit(
        lambda r, k: run_mcts(_jax_eval, r, k, cfg, add_noise=False)
    )(roots, jax.random.key(0))
    got = {
        int(a): int(n)
        for a, n in zip(np.asarray(res.actions[0]), np.asarray(res.visits[0]))
        if n > 0
    }
    want = _py_mcts(Position(), 40)
    assert got == want


def test_finds_immediate_king_capture():
    # Red rook can capture the black king outright; with a value-blind net
    # the +1 terminal reward must dominate the visit distribution.
    board = np.zeros(NSQ, np.int8)
    board[0 * 9 + 3] = 1     # red king d0
    board[5 * 9 + 4] = 5     # red rook e5
    board[9 * 9 + 4] = -1    # black king e9
    s1 = E.state_from_numpy(board, 1)
    roots = jax.tree.map(lambda x: jnp.stack([x, x]), s1)
    cfg = MCTSConfig(num_simulations=60)

    def uniform_eval(feats):
        probs = jnp.full((feats.shape[0], 8100), 1.0 / 8100)
        return probs, jnp.zeros(feats.shape[0])

    res = jax.jit(
        lambda r, k: run_mcts(uniform_eval, r, k, cfg, add_noise=False)
    )(roots, jax.random.key(1))
    visits = np.asarray(res.visits[0])
    actions = np.asarray(res.actions[0])
    win = (5 * 9 + 4) * 90 + (9 * 9 + 4)  # rook e5 x king e9
    assert actions[visits.argmax()] == win


def test_temperature_pi_semantics():
    cfg = MCTSConfig(num_simulations=25)
    roots = E.reset_batch_jit(2)
    res = jax.jit(
        lambda r, k: run_mcts(_jax_eval, r, k, cfg, add_noise=True)
    )(roots, jax.random.key(2))

    pi_greedy = np.asarray(
        jax.jit(action_probs_dense)(res, jnp.zeros(2))
    )
    assert np.allclose(pi_greedy.sum(axis=1), 1.0)
    assert (pi_greedy > 0).sum(axis=1).tolist() == [1, 1]

    pi_t1 = np.asarray(jax.jit(action_probs_dense)(res, jnp.ones(2)))
    visits = np.asarray(res.visits[0]).astype(np.float64)
    acts = np.asarray(res.actions[0])
    expect = visits / visits.sum()
    for j in np.nonzero(visits)[0]:
        assert abs(pi_t1[0, acts[j]] - expect[j]) < 1e-5

    a = np.asarray(
        jax.jit(sample_actions)(res, jnp.zeros(2), jax.random.key(3))
    )
    assert pi_greedy[0, a[0]] == 1.0


def test_logits_eval_matches_probs_eval():
    """run_mcts(logits_eval=True) computes softmax values only at the legal
    slots; the search must match the probs-mode search on a real network."""
    from xiangqi_alphazero_tpu.models import (
        init_net,
        policy_logits_fn,
        policy_value_fn,
    )

    net, variables = init_net(jax.random.key(3), channels=16, blocks=2)
    cfg = MCTSConfig(num_simulations=30)
    roots = jax.jit(E.reset_batch, static_argnums=0)(4)
    rng = jax.random.key(11)

    f_probs = jax.jit(
        lambda s, k: run_mcts(
            policy_value_fn(net, variables), s, k, cfg, add_noise=True
        )
    )
    f_logits = jax.jit(
        lambda s, k: run_mcts(
            policy_logits_fn(net, variables), s, k, cfg, add_noise=True,
            logits_eval=True,
        )
    )
    a = f_probs(roots, rng)
    b = f_logits(roots, rng)
    np.testing.assert_array_equal(np.asarray(a.actions), np.asarray(b.actions))
    np.testing.assert_array_equal(np.asarray(a.visits), np.asarray(b.visits))
    np.testing.assert_allclose(
        np.asarray(a.root_value), np.asarray(b.root_value), atol=1e-6
    )
