"""CLI entry: python -m xiangqi_alphazero_tpu.train --mode quick|standard|full|tpu

Mirrors the reference CLI (training/train.py:707-764), plus multi-host
bring-up: run the SAME command on every host with its own --process-id
(controller-less SPMD; replaces the reference's process-pool + Unix-socket
IPC layer, reference: training/parallel_selfplay.py:337-474,
training/inference_server.py).

Order matters: --platform / jax.distributed.initialize must happen BEFORE
any module that touches the backend is imported (engine.env materializes
device constants at import), so the trainer import is deferred.
"""

import logging
import os
import re
import subprocess
import sys

from .config import build_argparser, config_from_args


def _latest_checkpoint(ckpt_dir: str):
    """Newest checkpoint_iterN directory, or None."""
    best, best_n = None, -1
    if not os.path.isdir(ckpt_dir):
        return None
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"checkpoint_iter(\d+)", name)
        if m and int(m.group(1)) > best_n:
            best_n = int(m.group(1))
            best = os.path.join(ckpt_dir, name)
    return best


def _backend_alive(timeout_s: int = 120) -> bool:
    """Probe the accelerator backend in a THROWAWAY subprocess: when the
    tunneled TPU is down, device init hangs in C (uninterruptible — signal
    handlers never run), so the probe must be a process we can kill."""
    try:
        subprocess.run(
            [sys.executable, "-c",
             "import jax, numpy as np, jax.numpy as jnp;"
             "assert np.asarray(jnp.ones((8,8)) @ jnp.ones((8,8)))[0,0]"
             " == 8.0"],
            timeout=timeout_s, check=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        return True
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
        return False


def _wait_for_backend(max_wait_s: int) -> bool:
    """Block (bounded) until the backend answers; True if it came up."""
    import time

    deadline = time.monotonic() + max_wait_s
    while True:
        if _backend_alive():
            return True
        if time.monotonic() >= deadline:
            return False
        print("[supervisor] backend unreachable; retrying in 60 s "
              f"({int(deadline - time.monotonic())} s of patience left)",
              flush=True)
        time.sleep(60)


def _run_with_stall_watchdog(cmd, ckpt_dir: str, stall_timeout_s: int) -> int:
    """Run the training child in its own process group; if it makes no
    filesystem progress under ckpt_dir for stall_timeout_s, kill the GROUP
    (a mid-run tunnel drop can leave the child hung in an uninterruptible
    device call forever — observed: a bench run hung >20 min after a
    flap). Only the group we created is ever signalled. The trainer
    touches <ckpt_dir>/.heartbeat at every phase boundary (self-play /
    train segments / eval — trainer._heartbeat), so healthy iterations
    much longer than the timeout still register progress; the timeout
    therefore bounds a single silent PHASE, not an iteration."""
    import signal
    import time

    def _progress_mtime() -> float:
        newest = 0.0
        if os.path.isdir(ckpt_dir):
            for name in os.listdir(ckpt_dir):
                try:
                    newest = max(
                        newest, os.path.getmtime(os.path.join(ckpt_dir, name))
                    )
                except OSError:
                    pass
        return newest

    proc = subprocess.Popen(cmd, start_new_session=True)
    last_progress = time.monotonic()
    last_mtime = _progress_mtime()
    while True:
        try:
            return proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            pass
        m = _progress_mtime()
        if m > last_mtime:
            last_mtime = m
            last_progress = time.monotonic()
        elif time.monotonic() - last_progress > stall_timeout_s:
            print(
                f"[supervisor] no checkpoint-dir progress for "
                f"{stall_timeout_s} s; killing hung child pgid {proc.pid}",
                flush=True,
            )
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
            proc.wait()
            return 98  # sentinel: stalled, not a clean failure


def _supervise(argv, attempts: int, ckpt_dir: str) -> int:
    """Relaunch the training process from the latest checkpoint on failure.

    A dead accelerator backend (the tunneled-TPU watchdog killing the
    worker, a dropped tunnel) is NOT recoverable in-process — every
    subsequent device call fails — so recovery means a FRESH process
    resuming from the last checkpoint. Checkpoints carry full fidelity
    (params, optimizer, RNG streams, replay ring), so the restarted run
    continues bit-identically from the last save. The reference's failure
    posture is drop-and-continue (worker games silently lost,
    parallel_selfplay.py:385-386); this supervises the whole run instead.

    Tunnel-outage hardening (the round-3 h2h postmortem): before each
    (re)launch the backend is probed in a killable subprocess and the
    supervisor WAITS — up to XQAZ_RESTART_MAX_WAIT_S, default 3600 s,
    without burning attempts — for it to come back; and a child that makes
    no checkpoint-dir progress for XQAZ_STALL_TIMEOUT_S (default 1800 s)
    is presumed hung in an uninterruptible device call and killed by its
    own process group."""
    base = []
    skip = False
    for a in argv:
        if skip:
            skip = False
            continue
        if a == "--auto-restart":
            skip = True
            continue
        if a.startswith("--auto-restart="):
            continue
        base.append(a)
    on_cpu = any(
        base[i] == "--platform" and i + 1 < len(base) and base[i + 1] == "cpu"
        or base[i] == "--platform=cpu"
        for i in range(len(base))
    )
    max_wait = int(os.environ.get("XQAZ_RESTART_MAX_WAIT_S", "3600"))
    stall_timeout = int(os.environ.get("XQAZ_STALL_TIMEOUT_S", "1800"))
    rc = 1
    for attempt in range(attempts + 1):
        if not on_cpu and not _wait_for_backend(max_wait):
            print("[supervisor] backend never came back; giving up",
                  flush=True)
            return 97
        child = list(base)
        latest = _latest_checkpoint(ckpt_dir)
        if latest is not None:
            # resume from the newest checkpoint, overriding any --resume
            cleaned, skip = [], False
            for a in child:
                if skip:
                    skip = False
                    continue
                if a == "--resume":
                    skip = True
                    continue
                if a.startswith("--resume="):
                    continue
                cleaned.append(a)
            child = cleaned + ["--resume", latest]
        rc = _run_with_stall_watchdog(
            [sys.executable, "-m", "xiangqi_alphazero_tpu.train", *child],
            ckpt_dir, stall_timeout,
        )
        if rc == 0:
            return 0
        if attempt < attempts:
            print(
                f"[supervisor] training exited rc={rc}; restarting "
                f"({attempts - attempt} attempts left, "
                f"resume={_latest_checkpoint(ckpt_dir)})",
                flush=True,
            )
    return rc


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    cfg, resume = config_from_args(args)

    if args.auto_restart:
        return _supervise(
            argv if argv is not None else sys.argv[1:],
            args.auto_restart, cfg.checkpoint_dir,
        )

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if cfg.num_processes > 1:
        from ..distributed import distributed_init

        distributed_init(
            coordinator_address=cfg.coordinator_address,
            num_processes=cfg.num_processes,
            process_id=cfg.process_id,
        )
        # Establish the collective context while processes are still in
        # lockstep (couple of seconds of skew at most). Heavy imports and
        # first compiles below can skew processes by minutes, and the
        # context rendezvous has a ~30s deadline (gloo GetKeyValue).
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("xaz_cli_start")

    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from .trainer import AlphaZeroTrainer

    is_main = jax.process_index() == 0
    os.makedirs(cfg.checkpoint_dir, exist_ok=True)
    handlers = [logging.StreamHandler()]
    if is_main:  # one log-file writer per shared checkpoint dir
        handlers.append(
            logging.FileHandler(os.path.join(cfg.checkpoint_dir, "training.log"))
        )
    logging.basicConfig(
        level=logging.INFO,
        format=(
            "%(asctime)s [%(levelname)s] %(message)s"
            if cfg.num_processes == 1
            else f"%(asctime)s [%(levelname)s] [p{cfg.process_id}] %(message)s"
        ),
        handlers=handlers,
        # jax configures root logging at import; without force the config
        # above is silently ignored
        force=True,
    )
    trainer = AlphaZeroTrainer(cfg)
    trainer.train(resume=resume, init_from=args.init_from)
    return 0


if __name__ == "__main__":
    sys.exit(main())
