"""Multi-session serving: coalesced batched search correctness + the
session API surface.

The reference serves one global game (reference: demo/app.py:40-48) and
coalesces NN evals in a socket server (inference_server.py:163-249); the
session layer coalesces WHOLE searches. These tests pin the two contracts
that make that sound: (1) a coalesced lane returns exactly the solo batch-1
search (lane independence), and (2) concurrent sessions progress
independently and actually share device batches.
"""

import random
import threading

import numpy as np
import pytest

import jax

from xiangqi_alphazero_tpu.engine.oracle import Position
from xiangqi_alphazero_tpu.models import init_net
from xiangqi_alphazero_tpu.serve.api import GameService
from xiangqi_alphazero_tpu.serve.predictor import Predictor
from xiangqi_alphazero_tpu.serve.sessions import (
    BatchedSearcher,
    SessionManager,
    _bucket,
)


@pytest.fixture(scope="module")
def tiny_predictor():
    net, variables = init_net(jax.random.key(0), channels=8, blocks=1)
    return Predictor(net, variables, num_simulations=12)


def _advanced(seed: int, plies: int) -> Position:
    p = Position()
    rng = random.Random(seed)
    for _ in range(plies):
        acts = p.legal_actions()
        if not acts:
            break
        p.apply(rng.choice(acts))
    return p


def test_bucket_rounding():
    assert [_bucket(n, 8) for n in (1, 2, 3, 4, 5, 8, 9)] == [
        1, 2, 4, 4, 8, 8, 8,
    ]


def test_search_batch_lane_equals_solo(tiny_predictor):
    """A lane of a coalesced (padded) batch must be bit-identical to the
    solo batch-1 search of the same position — the correctness contract
    that lets the session server batch independent games."""
    positions = [_advanced(s, p) for s, p in ((0, 0), (1, 4), (2, 9))]
    batched = tiny_predictor.search_batch(positions, pad_to=4)
    for pos, (acts, vis, order) in zip(positions, batched):
        a1, v1, o1 = tiny_predictor.search_position(pos)
        np.testing.assert_array_equal(acts, a1)
        np.testing.assert_array_equal(vis, v1)
        np.testing.assert_array_equal(order, o1)


def test_batched_searcher_coalesces_and_matches(tiny_predictor):
    searcher = BatchedSearcher(tiny_predictor, max_batch=4, window_ms=150.0)
    try:
        positions = [_advanced(s, p) for s, p in ((3, 2), (4, 6), (5, 11))]
        solo = [tiny_predictor.search_position(p) for p in positions]

        results = [None] * len(positions)

        def worker(i):
            results[i] = searcher.search(positions[i])

        threads = [
            threading.Thread(target=worker, args=(i,))
            for i in range(len(positions))
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        for got, want, pos in zip(results, solo, positions):
            assert got is not None and len(got) == 5
            for g, w in zip(got[:3], want):
                np.testing.assert_array_equal(g, w)
            # the coalesced raw forward matches the solo single-state one
            rp, rv = tiny_predictor.raw_predict(pos)
            np.testing.assert_allclose(got[3], rp, atol=1e-6)
            assert abs(got[4] - rv) < 1e-6
        st = searcher.stats()
        assert st["requests"] == 3
        # the 150 ms window must have coalesced at least two of the three
        # concurrent requests into one device batch
        assert st["batches"] < 3, st
    finally:
        searcher.stop()


def test_batched_searcher_stop_rejects_new(tiny_predictor):
    searcher = BatchedSearcher(tiny_predictor, max_batch=2, window_ms=1.0)
    searcher.stop()
    with pytest.raises(RuntimeError):
        searcher.search(Position())


def test_session_move_rolls_back_on_search_failure(tiny_predictor):
    """A failed AI reply must not strand the session with the human's move
    applied (side-to-move stuck at the AI forever) — the move rolls back,
    the client gets a JSON 503, and the game stays playable."""
    svc = GameService(model_dirs=[])
    svc.predictor = tiny_predictor
    svc.searcher = BatchedSearcher(tiny_predictor, max_batch=2, window_ms=1.0)
    code, g = svc.session_new({"human_side": "red"})
    assert code == 200
    sid = g["session_id"]
    svc.searcher.stop()  # every subsequent search raises
    code, out = svc.session_move(
        {"session_id": sid, "from_row": 3, "from_col": 0,
         "to_row": 4, "to_col": 0}
    )
    assert code == 503 and "error" in out
    s = svc.sessions.get(sid)
    assert s.pos.ply == 0 and s.pos.side == 1  # human move rolled back
    # recovery: a working searcher accepts the same move again
    svc.searcher = BatchedSearcher(tiny_predictor, max_batch=2, window_ms=1.0)
    try:
        code, out = svc.session_move(
            {"session_id": sid, "from_row": 3, "from_col": 0,
             "to_row": 4, "to_col": 0}
        )
        assert code == 200 and out["move_count"] == 2
    finally:
        svc.searcher.stop()


def test_global_new_game_depth_change_leaves_sessions_alone(tiny_predictor):
    """The global new_game re-depths only its own predictor clone: the
    session searcher keeps the predictor (and compiled programs) it was
    built with."""
    svc = GameService(model_dirs=[])
    svc.predictor = tiny_predictor
    svc.searcher = BatchedSearcher(tiny_predictor, max_batch=2, window_ms=1.0)
    try:
        code, _ = svc.new_game({"human_side": "red", "num_simulations": 24})
        assert code == 200
        assert svc.predictor is not tiny_predictor
        assert svc.predictor.num_simulations == 24
        assert svc.searcher.predictor is tiny_predictor
        assert svc.searcher.predictor.num_simulations == 12
        # the depth clone shares the params and the compiled forward
        assert svc.predictor.variables is tiny_predictor.variables
    finally:
        svc.searcher.stop()


def test_session_manager_ttl_and_eviction():
    mgr = SessionManager(max_sessions=2, ttl_s=1000.0)
    a = mgr.create(1)
    b = mgr.create(1)
    assert mgr.get(a.sid) is a and mgr.get(b.sid) is b
    a.last_active -= 2000.0  # expire a
    assert mgr.get(a.sid) is None
    c = mgr.create(-1)
    d = mgr.create(1)  # evicts the least-recently-active (b or c)
    assert mgr.count() == 2 and mgr.get(d.sid) is d
    assert mgr.close(d.sid) and not mgr.close(d.sid)


def test_session_api_flow(tiny_predictor):
    svc = GameService(model_dirs=[])
    svc.predictor = tiny_predictor
    svc.searcher = BatchedSearcher(tiny_predictor, max_batch=4, window_ms=2.0)
    try:
        # two independent games
        code, g1 = svc.session_new({"human_side": "red"})
        assert code == 200 and g1["current_player"] == 1
        code, g2 = svc.session_new({"human_side": "black"})
        # black human: server opens with an AI (red) move
        assert code == 200 and g2["ai_move"] is not None
        assert g2["current_player"] == -1

        sid1 = g1["session_id"]
        code, lm = svc.session_legal_moves(
            {"session_id": sid1, "row": 3, "col": 0}
        )
        assert code == 200 and {"to_row": 4, "to_col": 0} in lm["moves"]

        code, mv = svc.session_move(
            {"session_id": sid1, "from_row": 3, "from_col": 0,
             "to_row": 4, "to_col": 0}
        )
        assert code == 200 and mv["ai_move"] is not None
        assert mv["move_count"] == 2  # human ply + AI reply
        assert mv["ai_analysis"]["num_simulations"] == 12
        # game 2 untouched by game 1's move
        code, st2 = svc.session_state({"session_id": g2["session_id"]})
        assert code == 200 and st2["move_count"] == 1

        # error paths: wrong turn, illegal move, unknown session
        code, _ = svc.session_move(
            {"session_id": g2["session_id"], "from_row": 3, "from_col": 0,
             "to_row": 4, "to_col": 0}
        )  # red pawn but human is black
        assert code == 400
        code, _ = svc.session_move(
            {"session_id": sid1, "from_row": 0, "from_col": 0,
             "to_row": 5, "to_col": 5}
        )
        assert code == 400
        code, _ = svc.session_state({"session_id": "nope"})
        assert code == 404

        code, _ = svc.session_close({"session_id": sid1})
        assert code == 200
        code, _ = svc.session_state({"session_id": sid1})
        assert code == 404
    finally:
        svc.searcher.stop()


def test_concurrent_session_moves_coalesce(tiny_predictor):
    """N sessions moving simultaneously must all get correct replies AND
    share device batches (the whole point of the session layer)."""
    svc = GameService(model_dirs=[])
    svc.predictor = tiny_predictor
    svc.searcher = BatchedSearcher(
        tiny_predictor, max_batch=4, window_ms=150.0
    )
    try:
        sids = []
        for _ in range(4):
            code, g = svc.session_new({"human_side": "red"})
            assert code == 200
            sids.append(g["session_id"])

        outs = [None] * len(sids)

        def play(i):
            outs[i] = svc.session_move(
                {"session_id": sids[i], "from_row": 3, "from_col": 0,
                 "to_row": 4, "to_col": 0}
            )

        threads = [
            threading.Thread(target=play, args=(i,)) for i in range(len(sids))
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=180)
        for code, payload in outs:
            assert code == 200 and payload["ai_move"] is not None
            assert payload["move_count"] == 2
        st = svc.searcher.stats()
        assert st["requests"] == 4
        assert st["batches"] < 4, st  # coalescing actually happened
        # all four identical positions must get the identical greedy reply
        replies = {tuple(o[1]["ai_move"]["from"] + o[1]["ai_move"]["to"])
                   for o in outs}
        assert len(replies) == 1
    finally:
        svc.searcher.stop()


def test_session_flow_with_gumbel_predictor(tiny_predictor):
    """Sessions serve the gumbel search end-to-end: the AI reply is the
    halving winner, the analysis payload is intact, and coalescing still
    batches the searches."""
    gp = tiny_predictor.with_simulations(8)
    gp.algo = "gumbel"
    gp.__dict__.pop("_search", None)
    svc = GameService(model_dirs=[])
    svc.predictor = gp
    svc.searcher = BatchedSearcher(gp, max_batch=2, window_ms=60.0)
    try:
        code, g = svc.session_new({"human_side": "red"})
        assert code == 200
        code, mv = svc.session_move(
            {"session_id": g["session_id"], "from_row": 3, "from_col": 0,
             "to_row": 4, "to_col": 0}
        )
        assert code == 200 and mv["ai_move"] is not None
        an = mv["ai_analysis"]
        sel = [m for m in an["top_moves"] if m["selected"]]
        assert len(sel) == 1 and sel[0]["legal"]
        assert sel[0]["action"] == mv["ai_move"]["action"]
        assert svc.searcher.stats()["requests"] == 1
    finally:
        svc.searcher.stop()


def test_searcher_backpressure(tiny_predictor):
    """Past max_pending queued requests, new ones fail fast instead of
    piling up blocked threads (surfaces as the session 503 path)."""
    searcher = BatchedSearcher(
        tiny_predictor, max_batch=1, window_ms=1.0, max_pending=1
    )
    try:
        # saturate: stuff the queue directly while holding the condition
        # (deterministic, no timing dependence)
        with searcher._cv:
            from xiangqi_alphazero_tpu.serve.sessions import _Request

            searcher._queue.append(_Request(Position()))
        with pytest.raises(RuntimeError, match="overloaded"):
            searcher.search(Position())
    finally:
        searcher.stop()
