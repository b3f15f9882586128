"""Serving-layer tests: predictor analysis payload, GameService API flow,
and export round-trips (npz / reference-layout torch checkpoint)."""

import numpy as np
import pytest

import jax

from xiangqi_alphazero_tpu.engine.oracle import Position
from xiangqi_alphazero_tpu.models import init_net
from xiangqi_alphazero_tpu.serve.api import GameService
from xiangqi_alphazero_tpu.serve.predictor import Predictor, state_from_position
from xiangqi_alphazero_tpu.train import checkpoint as ckpt


@pytest.fixture(scope="module")
def tiny_predictor():
    net, variables = init_net(jax.random.key(0), channels=8, blocks=1)
    return Predictor(net, variables, num_simulations=12)


def test_state_from_position_matches_oracle():
    import random

    p = Position()
    rng = random.Random(5)
    for _ in range(15):
        p.apply(rng.choice(p.legal_actions()))
    s = state_from_position(p)
    got = set(np.nonzero(np.asarray(s.legal))[0].tolist())
    assert got == set(p.legal_actions())
    assert int(s.ply) == p.ply and int(s.quiet) == p.quiet


def test_ai_move_payload(tiny_predictor):
    pos = Position()
    res = tiny_predictor.ai_move(pos)
    assert set(res) >= {
        "board", "current_player", "game_over", "winner", "ai_move",
        "ai_analysis",
    }
    assert res["current_player"] == -1  # red (AI) just moved
    an = res["ai_analysis"]
    assert an["num_simulations"] == 12
    assert -1.0 <= an["value_score"] <= 1.0
    assert 1 <= len(an["top_moves"]) <= 15
    sel = [m for m in an["top_moves"] if m["selected"]]
    assert len(sel) == 1 and sel[0]["legal"]
    assert sel[0]["action"] == res["ai_move"]["action"]
    probs = sum(m["prob"] for m in an["top_moves"])
    assert probs <= 1.0 + 1e-6


def test_ai_move_tiebreak_is_movegen_order(tiny_predictor):
    """The temp-0 pick must be the FIRST max-visit child in the reference's
    movegen enumeration order (its max() over the insertion-ordered children
    dict, mcts.py:198) — not the first slot by layout index."""
    pos = Position()
    actions, visits, order = tiny_predictor.search_position(pos)
    tied = np.flatnonzero((actions >= 0) & (visits == visits.max()))
    want = int(actions[tied[np.argmin(order[tied])]])
    res = tiny_predictor.ai_move(Position())
    assert res["ai_move"]["action"] == want


def test_game_service_flow(tiny_predictor, tmp_path):
    svc = GameService(model_dirs=[str(tmp_path)])
    svc.predictor = tiny_predictor
    svc.model_name = "tiny"

    code, res = svc.new_game({"human_side": "red", "num_simulations": 12})
    assert code == 200 and res["current_player"] == 1

    # ask for legal moves of the central red cannon (2,1)
    code, res = svc.get_legal_moves({"row": 2, "col": 1})
    assert code == 200 and len(res["moves"]) > 0

    mv = res["moves"][0]
    code, res = svc.human_move(
        {"from_row": 2, "from_col": 1, "to_row": mv["to_row"], "to_col": mv["to_col"]}
    )
    assert code == 200
    assert res["ai_analysis"] is not None  # AI replied
    assert res["current_player"] == 1      # back to human

    code, res = svc.human_move(
        {"from_row": 0, "from_col": 0, "to_row": 5, "to_col": 5}
    )
    assert code == 400  # illegal

    code, res = svc.game_state()
    assert code == 200 and res["active"] and res["move_count"] == 2


def test_export_npz_and_torch_roundtrip(tmp_path, tiny_predictor):
    torch = pytest.importorskip("torch")  # noqa: F841
    from xiangqi_alphazero_tpu.serve.export import (
        export_npz,
        export_torch_checkpoint,
    )

    params = tiny_predictor.variables["params"]
    stats = tiny_predictor.variables["batch_stats"]
    mc = {"num_channels": 8, "num_res_blocks": 1}

    npz_path = str(tmp_path / "model.npz")
    export_npz(npz_path, params, stats, mc)
    arrs = np.load(npz_path)
    assert any(k.startswith("params/") for k in arrs.files)
    assert (tmp_path / "model.manifest.json").exists()

    pt_path = str(tmp_path / "model.pt")
    export_torch_checkpoint(pt_path, params, stats, mc)

    # round-trip: the exported reference-layout .pt loads back through the
    # torch importer and predicts identically
    pred2 = Predictor.load(pt_path, num_simulations=12)
    pos = Position()
    p1, v1 = tiny_predictor.raw_predict(pos)
    p2, v2 = pred2.raw_predict(pos)
    np.testing.assert_allclose(p1, p2, rtol=1e-4, atol=1e-6)
    assert abs(v1 - v2) < 1e-4


def test_load_model_hot_swap_changes_policy(tmp_path):
    """Behavioral port of the reference's model-update test
    (test_gpu_server.py:213-262): after swapping in a model with different
    weights, the served raw policy must change."""
    pytest.importorskip("torch")
    from xiangqi_alphazero_tpu.serve.export import export_torch_checkpoint

    for name, seed in (("net_a.pt", 11), ("net_b.pt", 22)):
        net, variables = init_net(jax.random.key(seed), channels=8, blocks=1)
        export_torch_checkpoint(
            str(tmp_path / name), variables["params"], variables["batch_stats"],
            {"num_channels": 8, "num_res_blocks": 1},
        )
    svc = GameService(model_dirs=[str(tmp_path)])
    code, res = svc.models()
    assert code == 200
    assert {m["name"] for m in res["models"]} >= {"net_a.pt", "net_b.pt"}

    code, _ = svc.load_model({"model_name": "net_a.pt", "num_simulations": 4})
    assert code == 200
    p1, _ = svc.predictor.raw_predict(Position())
    code, _ = svc.load_model({"model_name": "net_b.pt", "num_simulations": 4})
    assert code == 200
    p2, _ = svc.predictor.raw_predict(Position())
    assert not np.allclose(p1, p2)

    code, _ = svc.load_model({"model_name": "nope"})
    assert code == 404


def test_predictor_load_orbax(tmp_path):
    net, variables = init_net(jax.random.key(3), channels=8, blocks=1)
    ckpt.save_best_model(
        str(tmp_path), 7, variables["params"], variables["batch_stats"],
        {"num_channels": 8, "num_res_blocks": 1},
    )
    pred = Predictor.load(str(tmp_path / "best_model"), num_simulations=4)
    probs, value = pred.raw_predict(Position())
    assert probs.shape == (8100,) and -1 <= value <= 1
