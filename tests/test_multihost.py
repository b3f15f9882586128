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


def _run_pod(
    mode: str,
    outdir: str,
    timeout: int = 900,
    nprocs: int = 2,
    devs_per_proc: int = 4,
    _retry: bool = True,
) -> None:
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devs_per_proc}"
    )
    env.pop("JAX_PLATFORMS", None)  # worker forces cpu in-process
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, mode, str(pid), str(port), outdir,
             str(nprocs)],
            env=env,
            cwd=REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(nprocs)
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
    if _retry and any(p.returncode != 0 for p in procs) and any(
        "GetKeyValue() timed out" in out for out in outs
    ):
        # gloo's collective-context rendezvous has a HARDCODED 30 s store
        # deadline (not settable from Python); under heavy external CPU
        # load, per-process compile skew can exceed it and kill the pod
        # spuriously. One retry (compiles now warm in the persistent
        # cache -> skew collapses) distinguishes that infra flake from a
        # real failure. Correctness is unaffected: a timed-out pod
        # produces no result at all, never a wrong one. The retry starts
        # from a CLEAN outdir — partial checkpoints or fault markers from
        # the dead attempt would change the retry's semantics.
        import shutil

        for name in os.listdir(outdir):
            path = os.path.join(outdir, name)
            shutil.rmtree(path) if os.path.isdir(path) else os.remove(path)
        return _run_pod(mode, outdir, timeout, nprocs, devs_per_proc,
                        _retry=False)
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


def test_four_process_training_matches_single_process(tmp_path):
    """4 hosts x 2 devices: same 8-device global mesh, so the GSPMD
    partitioning — and therefore the results — must be identical."""
    import jax

    if len(jax.devices()) != 8:
        pytest.skip("needs the suite's 8-device CPU mesh")

    pod_dir = str(tmp_path / "pod4")
    os.makedirs(pod_dir)
    _run_pod("train", pod_dir, nprocs=4, devs_per_proc=2)

    ref_dir = str(tmp_path / "single")
    trainer, ref_stats = _single_process_reference(ref_dir)

    with open(os.path.join(pod_dir, "ckpt", "training_stats.json")) as f:
        pod_stats = json.load(f)[0]
    sp_pod = {k: v for k, v in pod_stats["self_play"].items() if k != "time"}
    sp_ref = {k: v for k, v in ref_stats["self_play"].items() if k != "time"}
    assert sp_pod == sp_ref
    tr_pod, tr_ref = pod_stats["training"], ref_stats["training"]
    for k in ("policy_loss", "value_loss"):
        assert tr_pod[k] == pytest.approx(tr_ref[k], rel=1e-3, abs=1e-5)


def test_two_process_tensor_parallel_matches_single_process(tmp_path):
    """2 hosts x 4 devices with model_parallel=2: the ('data','model')
    mesh spans processes on the data axis; the multi-controller TP
    placement (sharding.tp_place) must reproduce the single-process TP
    run at equal global batch."""
    import jax

    if len(jax.devices()) != 8:
        pytest.skip("needs the suite's 8-device CPU mesh")

    pod_dir = str(tmp_path / "pod_tp")
    os.makedirs(pod_dir)
    _run_pod("train_tp", pod_dir)

    # single-process TP reference on the same 8 devices (4 data x 2 model)
    from xiangqi_alphazero_tpu.train.config import (
        build_argparser,
        config_from_args,
    )
    from xiangqi_alphazero_tpu.train.trainer import AlphaZeroTrainer

    ref_dir = str(tmp_path / "single_tp")
    args = build_argparser().parse_args(
        [*TINY, "--model-parallel", "2", "--checkpoint-dir", ref_dir]
    )
    cfg, _ = config_from_args(args)
    trainer = AlphaZeroTrainer(cfg)
    ref_stats = trainer.run_iteration()

    with open(os.path.join(pod_dir, "ckpt", "training_stats.json")) as f:
        pod_stats = json.load(f)[0]
    sp_pod = {k: v for k, v in pod_stats["self_play"].items() if k != "time"}
    sp_ref = {k: v for k, v in ref_stats["self_play"].items() if k != "time"}
    assert sp_pod == sp_ref

    tr_pod, tr_ref = pod_stats["training"], ref_stats["training"]
    for k in ("policy_loss", "value_loss"):
        assert tr_pod[k] == pytest.approx(tr_ref[k], rel=1e-3, abs=1e-5)

    # trained params: the pod checkpoint (saved replicated) must match the
    # single-process TP run's params
    from xiangqi_alphazero_tpu.train import checkpoint as ckpt

    restored = ckpt.load_checkpoint(
        os.path.join(pod_dir, "ckpt", "checkpoint_iter1")
    )
    flat_ref = jax.tree.leaves(jax.tree.map(np.asarray, trainer.params))
    flat_pod = jax.tree.leaves(restored["params"])
    assert len(flat_ref) == len(flat_pod)
    for a, b in zip(flat_ref, flat_pod):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-2, atol=1e-3
        )


def _strip_times(stats: dict) -> dict:
    return {
        phase: (
            {k: v for k, v in d.items() if k != "time"}
            if isinstance(d, dict)
            else d
        )
        for phase, d in stats.items()
        if phase != "time"
    }


def test_pod_restart_resumes_and_matches_uninterrupted(tmp_path):
    """Injected fault at iteration 2 on EVERY process under --auto-restart:
    the per-process supervisors relaunch, the pod re-rendezvouses, resumes
    from the iteration-1 checkpoint (replay ring + RNG streams included),
    and the result — including the iteration-2 gated eval, run after the
    restart — must be BIT-IDENTICAL to an uninterrupted pod run (same
    mesh, same partitioning, full-fidelity resume)."""
    import jax

    if len(jax.devices()) != 8:
        pytest.skip("needs the suite's 8-device CPU mesh")

    pod_dir = str(tmp_path / "pod_restart")
    os.makedirs(pod_dir)
    # two sequential pod attempts + recompiles; slow under a
    # contended CPU (measured ~20 min standalone)
    _run_pod("train_restart", pod_dir, timeout=2700)
    # both processes actually faulted once
    assert os.path.exists(os.path.join(pod_dir, "fault_p0"))
    assert os.path.exists(os.path.join(pod_dir, "fault_p1"))

    ref_dir = str(tmp_path / "pod_plain")
    os.makedirs(ref_dir)
    _run_pod("train2", ref_dir, timeout=2700)

    with open(os.path.join(pod_dir, "ckpt", "training_stats.json")) as f:
        pod = json.load(f)
    with open(os.path.join(ref_dir, "ckpt", "training_stats.json")) as f:
        ref = json.load(f)
    # restore() reloads prior stats, so the restarted run's file is the
    # full cumulative history — both iterations, exactly equal
    assert [s["iteration"] for s in pod] == [1, 2]
    assert [s["iteration"] for s in ref] == [1, 2]
    for got, want in zip(pod, ref):
        assert _strip_times(got) == _strip_times(want)
    assert pod[1]["evaluation"], "iteration-2 gated eval must have run"


def test_replay_ring_mismatch_guard(tmp_path):
    """The cross-host replay-ring consistency guard
    (trainer.restore): a checkpoint whose .replay.npz exists on some
    hosts but not all must raise on EVERY process."""
    import jax

    if len(jax.devices()) != 8:
        pytest.skip("needs the suite's 8-device CPU mesh")

    import shutil

    from xiangqi_alphazero_tpu.train.config import (
        build_argparser,
        config_from_args,
    )
    from xiangqi_alphazero_tpu.train.trainer import AlphaZeroTrainer

    src = str(tmp_path / "src")
    args = build_argparser().parse_args([*TINY, "--checkpoint-dir", src])
    cfg, _ = config_from_args(args)
    trainer = AlphaZeroTrainer(cfg)
    trainer.save()  # checkpoint_iter0 + replay ring (empty is fine)

    for pid in (0, 1):
        dst = str(tmp_path / f"ckpt_p{pid}")
        os.makedirs(dst)
        shutil.copytree(
            os.path.join(src, "checkpoint_iter0"),
            os.path.join(dst, "checkpoint_iter0"),
        )
        if pid == 0:  # only process 0's copy has the ring
            shutil.copy(
                os.path.join(src, "checkpoint_iter0.replay.npz"),
                os.path.join(dst, "checkpoint_iter0.replay.npz"),
            )
    _run_pod("resume_mismatch", str(tmp_path))


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
