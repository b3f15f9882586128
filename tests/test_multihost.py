"""Multi-host (multi-process SPMD) training tests on a fake 2-host pod.

Two fresh CPU processes x 4 virtual devices join an 8-device global mesh
over jax.distributed + gloo — the same global device count the rest of the
suite uses single-process, so the GSPMD partitioning is identical and the
2-process run must reproduce the single-process run at equal global batch:

- self-play is batch-parallel with no cross-device float reductions, so its
  stats (games/winners/plies/samples) must match EXACTLY;
- the learner's gradient all-reduce may reduce in a different order across
  process boundaries, so losses and final params match within fp tolerance;
- gated evaluation with identical candidate/incumbent params is fully
  deterministic and must match exactly.

This is the TPU-native counterpart of the reference's multi-process layer
test (reference: training/test_gpu_train.py:25 runs the full GPU-server
training path with device='cpu').
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from tests._multihost_worker import TINY

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_pod(mode: str, outdir: str, timeout: int = 900) -> None:
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)  # worker forces cpu in-process
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, mode, str(pid), str(port), outdir],
            env=env,
            cwd=REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"worker {pid} failed (rc={p.returncode}):\n{out[-4000:]}"
        )


def _single_process_reference(ckpt_dir: str):
    """The same tiny iteration, single-process on the suite's 8 CPU devices
    (identical config construction path: the CLI's own parser)."""
    from xiangqi_alphazero_tpu.train.config import (
        build_argparser,
        config_from_args,
    )
    from xiangqi_alphazero_tpu.train.trainer import AlphaZeroTrainer

    args = build_argparser().parse_args(
        [*TINY, "--checkpoint-dir", ckpt_dir]
    )
    cfg, _ = config_from_args(args)
    trainer = AlphaZeroTrainer(cfg)
    stats = trainer.run_iteration()
    return trainer, stats


def test_two_process_training_matches_single_process(tmp_path):
    import jax

    if len(jax.devices()) != 8:
        pytest.skip("needs the suite's 8-device CPU mesh")

    pod_dir = str(tmp_path / "pod")
    os.makedirs(pod_dir)
    _run_pod("train", pod_dir)

    ref_dir = str(tmp_path / "single")
    trainer, ref_stats = _single_process_reference(ref_dir)

    # --- self-play stats: exact ------------------------------------------
    with open(os.path.join(pod_dir, "ckpt", "training_stats.json")) as f:
        pod_stats = json.load(f)[0]
    sp_pod = {k: v for k, v in pod_stats["self_play"].items() if k != "time"}
    sp_ref = {k: v for k, v in ref_stats["self_play"].items() if k != "time"}
    assert sp_pod == sp_ref

    # --- losses: fp tolerance (cross-process psum order) ------------------
    tr_pod, tr_ref = pod_stats["training"], ref_stats["training"]
    for k in ("policy_loss", "value_loss"):
        assert tr_pod[k] == pytest.approx(tr_ref[k], rel=1e-3, abs=1e-5)
    assert tr_pod["batches"] == tr_ref["batches"]

    # --- trained params: fp tolerance -------------------------------------
    from xiangqi_alphazero_tpu.train import checkpoint as ckpt

    restored = ckpt.load_checkpoint(
        os.path.join(pod_dir, "ckpt", "checkpoint_iter1")
    )
    ref_params = jax.tree.map(np.asarray, trainer.params)
    pod_params = restored["params"]
    flat_ref = jax.tree.leaves(ref_params)
    flat_pod = jax.tree.leaves(pod_params)
    assert len(flat_ref) == len(flat_pod)
    for a, b in zip(flat_ref, flat_pod):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-2, atol=1e-3
        )


def test_two_process_eval_matches_single_process(tmp_path):
    import jax

    if len(jax.devices()) != 8:
        pytest.skip("needs the suite's 8-device CPU mesh")

    pod_dir = str(tmp_path / "pod")
    os.makedirs(pod_dir)
    _run_pod("eval", pod_dir)
    with open(os.path.join(pod_dir, "eval.json")) as f:
        pod_eval = json.load(f)

    from xiangqi_alphazero_tpu.train.config import (
        build_argparser,
        config_from_args,
    )
    from xiangqi_alphazero_tpu.train.trainer import AlphaZeroTrainer

    args = build_argparser().parse_args(
        [*TINY, "--checkpoint-dir", str(tmp_path / "single")]
    )
    cfg, _ = config_from_args(args)
    trainer = AlphaZeroTrainer(cfg)
    ref_eval = trainer.evaluate()
    ref_eval.pop("time", None)
    assert pod_eval == ref_eval
