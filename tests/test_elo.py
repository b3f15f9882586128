"""Elo ladder: the Bradley-Terry fit must recover known ratings from
synthetic results, and the round-robin driver must produce a consistent
ladder from real (tiny-net) arena matches."""

import numpy as np

import jax

from xiangqi_alphazero_tpu.train.elo import (
    expected_score,
    fit_elo,
    round_robin,
)


def _synthetic_results(true_elo, games, rng):
    """Binomial game outcomes from true Elo gaps (no draws)."""
    out = []
    n = len(true_elo)
    for i in range(n):
        for j in range(i + 1, n):
            p = expected_score(true_elo[i], true_elo[j])
            wins = rng.binomial(games, p)
            out.append((i, j, float(wins), games))
    return out


def test_fit_recovers_synthetic_ratings():
    true = [0.0, 120.0, 260.0, -80.0]
    rng = np.random.default_rng(0)
    results = _synthetic_results(true, games=400, rng=rng)
    got = fit_elo(results, len(true))
    assert got[0] == 0.0  # anchor
    # ordering matches and gaps are within sampling noise of 400 games
    assert list(np.argsort(got)) == list(np.argsort(true))
    for g, t in zip(got, true):
        assert abs(g - t) < 40.0, (got, true)


def test_fit_handles_draws_and_sweeps():
    # i beats j every game -> large positive gap, finite (no blowup)
    results = [(0, 1, 32.0, 32), (1, 2, 16.0, 32)]  # 1-2 all draws
    r = fit_elo(results, 3)
    assert r[0] > r[1] and abs(r[1] - r[2]) < 1.0
    assert np.isfinite(r).all()


def test_expected_score_basics():
    assert abs(expected_score(0, 0) - 0.5) < 1e-12
    assert abs(expected_score(400, 0) - 10 / 11) < 1e-9
    assert expected_score(0, 400) + expected_score(400, 0) == 1.0


def test_round_robin_ladder_runs(tmp_path):
    """Three tiny models through the real arena: full pair coverage,
    consistent counts, ratings for every entrant, anchor at 0."""
    from xiangqi_alphazero_tpu.models import init_net
    from xiangqi_alphazero_tpu.train import checkpoint as ckpt

    paths = []
    for i in range(3):
        net, variables = init_net(jax.random.key(i), channels=8, blocks=1)
        d = tmp_path / f"m{i}"
        d.mkdir()
        ckpt.save_best_model(
            str(d), i, variables["params"], variables["batch_stats"],
            {"num_channels": 8, "num_res_blocks": 1},
        )
        paths.append(str(d / "best_model"))

    out = round_robin(paths, games=4, sims=2, max_game_length=12, seed=1)
    assert len(out["pairs"]) == 3
    for pr in out["pairs"]:
        assert pr["a_wins"] + pr["b_wins"] + pr["draws"] == 4
    assert set(out["ratings"]) == set(paths)
    assert out["ratings"][paths[0]] == 0.0
