"""Unit tests for the h2h experiment driver's resilience helpers
(scripts/h2h_gumbel_puct.py): stats-derived walls, arm completion
detection, and the fail-early path for --skip-train with a missing
checkpoint (the round-3 advisor finding)."""

import importlib.util
import json
import os
import sys

import pytest

_SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts", "h2h_gumbel_puct.py",
)
spec = importlib.util.spec_from_file_location("h2h_script", _SCRIPT)
h2h = importlib.util.module_from_spec(spec)
spec.loader.exec_module(h2h)


def _write_stats(d, times):
    os.makedirs(d, exist_ok=True)
    stats = [{"iteration": i + 1, "time": t} for i, t in enumerate(times)]
    with open(os.path.join(d, "training_stats.json"), "w") as f:
        json.dump(stats, f)


def test_stats_walls_steady_excludes_first_iteration(tmp_path):
    d = str(tmp_path / "arm")
    _write_stats(d, [800.0, 100.0, 120.0, 110.0])
    total, steady = h2h._stats_walls(d, 4)
    assert total == 1130.0
    assert steady == pytest.approx(110.0)


def test_stats_walls_truncates_to_requested_iters(tmp_path):
    d = str(tmp_path / "arm")
    _write_stats(d, [800.0, 100.0, 120.0, 110.0])
    total, _ = h2h._stats_walls(d, 2)
    assert total == 900.0


def test_stats_walls_missing_file(tmp_path):
    assert h2h._stats_walls(str(tmp_path / "none"), 3) == (None, None)


def test_arm_complete(tmp_path):
    d = str(tmp_path / "arm")
    os.makedirs(os.path.join(d, "checkpoint_iter5"))
    assert h2h._arm_complete(d, 5)
    assert not h2h._arm_complete(d, 6)


def test_skip_train_fails_early_on_missing_checkpoint(tmp_path, monkeypatch):
    g = tmp_path / "out" / "gumbel"
    os.makedirs(g / "checkpoint_iter3")
    _write_stats(str(g), [10.0, 10.0, 10.0])
    monkeypatch.setattr(
        sys, "argv",
        ["h2h", "--skip-train", "--gumbel-iters", "3", "--puct-iters", "5",
         "--out", str(tmp_path / "out")],
    )
    with pytest.raises(SystemExit) as exc:
        h2h.main()
    assert "checkpoint_iter5" in str(exc.value)
