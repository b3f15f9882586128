"""Training-layer tests: replay buffer semantics, learner step, a tiny
end-to-end iteration (self-play -> train -> eval -> checkpoint -> resume) —
the JAX equivalent of the reference's test_gpu_train.py smoke run."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xiangqi_alphazero_tpu.engine import tables as T
from xiangqi_alphazero_tpu.train import ReplayBuffer, TrainingConfig
from xiangqi_alphazero_tpu.train.learner import (
    make_optimizer,
    set_learning_rate,
    train_step,
)
from xiangqi_alphazero_tpu.models import init_net


def _tiny_cfg(tmp_path) -> TrainingConfig:
    return TrainingConfig(
        num_channels=16,
        num_res_blocks=1,
        num_simulations=8,
        num_games_per_iter=4,
        max_game_length=24,
        temperature_threshold=6,
        random_opening_moves=2,
        enable_resign=True,
        resign_threshold=-0.95,
        resign_check_steps=3,
        num_iterations=1,
        batch_size=32,
        num_epochs=1,
        min_buffer_size=8,
        eval_games=2,
        eval_simulations=4,
        eval_interval=1,
        save_interval=1,
        checkpoint_dir=str(tmp_path / "ckpt"),
        dtype="float32",
        max_buffer_size=4096,
    )


def test_replay_buffer_mirror_augmentation():
    buf = ReplayBuffer(100, max_children=4)
    board = T.tables()["INIT_BOARD"][None, :]
    acts = np.array([[44, 100, -1, -1]], np.int32)
    probs = np.array([[0.7, 0.3, 0.0, 0.0]], np.float32)
    n = buf.add_games(board, np.array([1], np.int8), acts, probs,
                      np.array([1.0], np.float32))
    assert n == 2 and len(buf) == 2
    t = T.tables()
    assert np.array_equal(buf.boards[1], board[0][t["MIRROR_SQ"]])
    assert buf.pi_actions[1, 0] == t["MIRROR_ACT"][44]
    assert buf.pi_actions[1, 2] == -1  # padding survives the mirror


def test_replay_epoch_covers_all_and_pads():
    buf = ReplayBuffer(100, max_children=4)
    boards = np.zeros((10, 90), np.int8)
    boards[:, 0] = np.arange(10)
    buf.add_games(boards, np.ones(10, np.int8),
                  np.full((10, 4), -1, np.int32),
                  np.zeros((10, 4), np.float32),
                  np.zeros(10, np.float32), augment=False)
    seen, total_w = set(), 0.0
    for b, s, a, p, v, w in buf.epoch_batches(4, np.random.default_rng(0)):
        assert b.shape == (4, 90)
        seen.update(b[w > 0, 0].tolist())
        total_w += w.sum()
    assert total_w == 10.0 and len(seen) == 10


def _fill(buf, n, seed, start=0):
    rng = np.random.default_rng(seed)
    boards = np.zeros((n, 90), np.int8)
    boards[:, 0] = np.arange(start, start + n) % 120
    buf.add_games(boards, np.ones(n, np.int8),
                  rng.integers(0, 8100, (n, buf.k)).astype(np.int32),
                  np.full((n, buf.k), 1.0 / buf.k, np.float32),
                  rng.random(n).astype(np.float32), augment=False)


def test_replay_state_roundtrip_and_resize():
    buf = ReplayBuffer(8, max_children=4)
    _fill(buf, 10, seed=0)  # wrapped: pos=2, newest rows 2..9
    st = buf.state_dict()

    same = ReplayBuffer(8, max_children=4)
    same.load_state(st)
    assert len(same) == 8 and same._pos == buf._pos
    for a, b in zip(same.arrays(), buf.arrays()):
        np.testing.assert_array_equal(a, b)

    # shrink: keeps exactly the NEWEST 4 samples, oldest-first order
    small = ReplayBuffer(4, max_children=4)
    small.load_state(st)
    assert len(small) == 4
    assert sorted(small.boards[:, 0].tolist()) == [6, 7, 8, 9]

    # grow: all 8 survivors, ring cursor ready to append after them
    big = ReplayBuffer(16, max_children=4)
    big.load_state(st)
    assert len(big) == 8 and big._pos == 8
    assert sorted(big.boards[:8, 0].tolist()) == list(range(2, 10))

    # slot-width change is a config error, not silent corruption
    with pytest.raises(ValueError):
        ReplayBuffer(8, max_children=6).load_state(st)


def test_train_step_reduces_loss_and_updates():
    net, variables = init_net(jax.random.key(0), channels=8, blocks=1)
    tx = make_optimizer(1e-2, 1e-4)
    params, stats = variables["params"], variables["batch_stats"]
    opt_state = tx.init(params)
    opt_state = set_learning_rate(opt_state, 1e-2)

    rng = np.random.default_rng(0)
    b = 16
    boards = np.zeros((b, 90), np.int8)
    boards[:, :32] = rng.integers(-7, 8, (b, 32), dtype=np.int8)
    sides = np.where(rng.random(b) < 0.5, 1, -1).astype(np.int8)
    acts = rng.integers(0, 8100, (b, 8), dtype=np.int32)
    probs = rng.random((b, 8)).astype(np.float32)
    probs /= probs.sum(1, keepdims=True)
    z = np.where(rng.random(b) < 0.5, 1.0, -1.0).astype(np.float32)
    w = np.ones(b, np.float32)

    losses = []
    args = [jnp.asarray(x) for x in (boards, sides, acts, probs, z, w)]
    for _ in range(12):
        params, stats, opt_state, m = train_step(
            net, tx, params, stats, opt_state, *args
        )
        losses.append(float(m.total_loss))
    assert losses[-1] < losses[0], losses


def test_end_to_end_iteration(tmp_path):
    from xiangqi_alphazero_tpu.train import AlphaZeroTrainer

    cfg = _tiny_cfg(tmp_path)
    tr = AlphaZeroTrainer(cfg)
    stats = tr.run_iteration()

    sp = stats["self_play"]
    assert sp["games"] == 4
    assert sp["new_samples"] > 0
    assert sp["new_samples"] == 2 * sum(
        1 for _ in range(0)
    ) + sp["new_samples"]  # trivially true; structure check below
    assert len(tr.buffer) == sp["new_samples"]
    assert "policy_loss" in stats["training"]
    assert stats["evaluation"], "eval should run at iteration 1 (interval=1)"
    assert (tmp_path / "ckpt" / "checkpoint_iter1").exists()
    assert (tmp_path / "ckpt" / "training_stats.json").exists()

    # every recorded sample's policy target sums to ~1 over valid slots
    pi = tr.buffer.pi_probs[: len(tr.buffer)]
    np.testing.assert_allclose(pi.sum(1), 1.0, rtol=1e-4)

    # resume round-trip: params AND the replay ring come back bit-exact
    assert (tmp_path / "ckpt" / "checkpoint_iter1.replay.npz").exists()
    tr2 = AlphaZeroTrainer(cfg)
    tr2.restore(str(tmp_path / "ckpt" / "checkpoint_iter1"))
    assert tr2.iteration == 1
    a = jax.tree.leaves(tr.params)[0]
    b2 = jax.tree.leaves(tr2.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b2))
    assert len(tr2.buffer) == len(tr.buffer)
    for x, y in zip(tr.buffer.arrays(), tr2.buffer.arrays()):
        np.testing.assert_array_equal(x, y)

    # full-fidelity resume: iteration 2 continued in-process and iteration 2
    # resumed from the checkpoint must be IDENTICAL (rng streams, replay
    # ring, and counters are all checkpointed — the reference can't do this,
    # its deque restarts cold on resume)
    s1 = tr.run_iteration()
    s2 = tr2.run_iteration()
    assert s1["self_play"]["new_samples"] == s2["self_play"]["new_samples"]
    for key in ("policy_loss", "value_loss", "batches"):
        assert s1["training"][key] == s2["training"][key], key
    for x, y in zip(
        jax.tree.leaves(tr.params), jax.tree.leaves(tr2.params)
    ):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_train_segmentation_bit_identical(tmp_path):
    """`train_segment_batches` chunks the epoch scan into watchdog-bounded
    device programs; the (params, opt_state) carry chains across the chunks
    so the result must be BIT-identical to the single fused scan (the knob
    exists for 256ch-class nets whose full-buffer scan would exceed the
    tunneled-TPU ~60 s program watchdog, docs/PERF_NOTES.md)."""
    from xiangqi_alphazero_tpu.train import AlphaZeroTrainer

    def run(seg):
        cfg = _tiny_cfg(tmp_path / f"seg{seg}")
        cfg.checkpoint_dir = str(tmp_path / f"seg{seg}" / "ckpt")
        cfg.num_epochs = 2
        cfg.train_segment_batches = seg
        tr = AlphaZeroTrainer(cfg)
        s1 = tr.run_iteration()
        s2 = tr.run_iteration()
        return s1, s2, tr

    a1, a2, ta = run(0)
    b1, b2, tb = run(3)  # forces several chunks incl. a ragged tail
    for sa, sb in ((a1, b1), (a2, b2)):
        for key in ("policy_loss", "value_loss", "batches"):
            assert sa["training"][key] == sb["training"][key], key
    for x, y in zip(jax.tree.leaves(ta.params), jax.tree.leaves(tb.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_lr_schedule_multistep():
    cfg = TrainingConfig(learning_rate=0.002, lr_milestones=(50, 80), lr_gamma=0.1)
    assert cfg.lr_at(1) == pytest.approx(0.002)
    assert cfg.lr_at(50) == pytest.approx(0.0002)
    assert cfg.lr_at(80) == pytest.approx(0.00002)


def test_hosted_selfplay_matches_oneshot():
    """The segmented host-driven driver must reproduce the one-shot program
    exactly (same rng stream, same body sequence)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from xiangqi_alphazero_tpu.models import init_net, policy_logits_fn
    from xiangqi_alphazero_tpu.train.selfplay import (
        SelfPlaySettings,
        make_hosted_selfplay,
        selfplay_games,
    )

    net, variables = init_net(jax.random.key(0), channels=8, blocks=1)
    s = SelfPlaySettings(
        num_simulations=4,
        max_game_length=12,
        temperature_threshold=4,
        random_opening_moves=2,
        enable_resign=True,
        resign_check_steps=2,
    )
    rng = jax.random.key(5)
    one = jax.jit(
        lambda v, k: selfplay_games(
            policy_logits_fn(net, v), 4, k, s, logits_eval=True
        )
    )(variables, rng)
    hosted = make_hosted_selfplay(net, 4, s, plies_per_segment=5)(
        variables, rng
    )
    for a, b, name in zip(one, hosted, one._fields):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=name
        )


def test_hosted_eval_matches_oneshot():
    """The segmented eval driver must reproduce the one-shot program."""
    import jax
    import numpy as np

    from xiangqi_alphazero_tpu.models import init_net, policy_logits_fn
    from xiangqi_alphazero_tpu.train.evaluate import (
        EvalSettings,
        evaluate_pair,
        make_hosted_eval,
    )

    net, v1 = init_net(jax.random.key(0), channels=8, blocks=1)
    _, v2 = init_net(jax.random.key(1), channels=8, blocks=1)
    s = EvalSettings(num_simulations=4, max_game_length=10)
    rng = jax.random.key(5)
    one = jax.jit(
        lambda a, b, k: evaluate_pair(
            policy_logits_fn(net, a), policy_logits_fn(net, b), 4, k, s,
            logits_eval=True,
        )
    )(v1, v2, rng)
    hosted = make_hosted_eval(net, 4, s, plies_per_segment=3)(v1, v2, rng)
    for a, b, name in zip(one, hosted, one._fields):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=name
        )


def test_epoch_plan_matches_epoch_batches():
    """The on-device scan's index plan must enumerate exactly the batches
    the host-loop iterator would produce from the same RNG state."""
    import numpy as np

    from xiangqi_alphazero_tpu.train.replay import ReplayBuffer

    buf = ReplayBuffer(512, 8)
    rng = np.random.default_rng(3)
    n = 100
    buf.add_games(
        rng.integers(-7, 8, (n, 90)).astype(np.int8),
        np.ones(n, np.int8),
        rng.integers(0, 8100, (n, 8)).astype(np.int32),
        np.full((n, 8), 1 / 8, np.float32),
        np.zeros(n, np.float32),
        augment=False,
    )
    r1 = np.random.default_rng(11)
    r2 = np.random.default_rng(11)
    perm, wmask, steps = buf.epoch_plan(32, 2, r1)
    assert perm.shape[0] == -(-buf.capacity // 32) * 2  # capacity-derived
    it = list(buf.epoch_batches(32, r2)) + list(buf.epoch_batches(32, r2))
    assert steps == len(it)
    for i, batch in enumerate(it):
        boards, _, _, _, _, w = batch
        np.testing.assert_array_equal(w, wmask[i])
        np.testing.assert_array_equal(boards, buf.boards[perm[i]])
    assert not wmask[steps:].any()


def test_auto_restart_supervisor(tmp_path):
    """--auto-restart relaunches a crashed run from the latest checkpoint:
    an injected fault kills the first process at iteration 2; the
    supervisor restarts from checkpoint_iter1 and the run completes. This
    is the recovery path for the non-recoverable device failures the
    tunneled TPU actually produces (dead backend -> fresh process)."""
    import subprocess
    import sys

    ckpt = tmp_path / "ckpt"
    marker = tmp_path / "fault_fired"
    env = dict(os.environ, XQAZ_FAULT_ITER=f"2:{marker}")
    cmd = [
        sys.executable, "-m", "xiangqi_alphazero_tpu.train",
        "--platform", "cpu", "--mode", "quick",
        "--iterations", "2", "--games", "2", "--simulations", "4",
        "--eval-games", "2", "--eval-interval", "10", "--epochs", "1",
        "--save-interval", "1", "--min-buffer", "1",
        "--checkpoint-dir", str(ckpt), "--seed", "11",
        "--auto-restart", "2",
    ]
    proc = subprocess.run(
        cmd, env=env, capture_output=True, text=True, timeout=1500,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert marker.exists()  # the fault really fired once
    assert "[supervisor] training exited" in proc.stdout
    assert (ckpt / "checkpoint_iter2").is_dir()
    with open(ckpt / "training_stats.json") as f:
        stats = json.load(f)
    assert stats[-1]["iteration"] == 2


def test_stall_watchdog_kills_hung_child(tmp_path):
    """A child that makes no checkpoint-dir progress past the stall
    timeout is killed by its own process group and reported with the
    stall sentinel rc — the supervisor's defense against a mid-run
    tunnel drop leaving training hung in an uninterruptible device call."""
    import sys
    import time

    from xiangqi_alphazero_tpu.train.__main__ import _run_with_stall_watchdog

    t0 = time.monotonic()
    rc = _run_with_stall_watchdog(
        [sys.executable, "-c", "import time; time.sleep(600)"],
        str(tmp_path), stall_timeout_s=5,
    )
    assert rc == 98
    assert time.monotonic() - t0 < 120  # killed, did not sit out the sleep


def test_stall_watchdog_passes_through_clean_exit(tmp_path):
    import sys

    from xiangqi_alphazero_tpu.train.__main__ import _run_with_stall_watchdog

    rc = _run_with_stall_watchdog(
        [sys.executable, "-c", "raise SystemExit(7)"],
        str(tmp_path), stall_timeout_s=600,
    )
    assert rc == 7


def test_np_rng_pack_roundtrip_preserves_halfdraw_buffer():
    """PCG64 keeps a buffered 32-bit half-draw (has_uint32/uinteger) that
    np.permutation leaves pending about half the time; the checkpoint
    pack must carry it or a resumed run's next training permutation
    diverges from the uninterrupted one (the pod-restart parity failure
    this reproduces at unit scale)."""
    from xiangqi_alphazero_tpu.train.trainer import AlphaZeroTrainer as T

    for warm in range(1, 8):
        gen = np.random.default_rng(42)
        for _ in range(warm):
            gen.permutation(2528)
        packed = T._pack_np_rng(gen)
        assert packed.shape == (6,)
        restored = T._unpack_np_rng(packed)
        np.testing.assert_array_equal(
            gen.permutation(2528), restored.permutation(2528)
        )


def test_np_rng_unpack_accepts_legacy_4_word_state():
    from xiangqi_alphazero_tpu.train.trainer import AlphaZeroTrainer as T

    gen = np.random.default_rng(11)
    gen.permutation(100)
    legacy = T._pack_np_rng(gen)[:4]
    restored = T._unpack_np_rng(legacy)
    st = restored.bit_generator.state
    assert st["state"] == gen.bit_generator.state["state"]
