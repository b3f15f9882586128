"""AlphaZero training orchestration: self-play -> train -> gated eval loop.

Reference parity (training/train.py:168-638): two model copies (current +
best), self-play always uses the best model, evaluation every
eval_interval iterations promotes the candidate at win_rate >= threshold or
resets it to the incumbent, checkpoints every save_interval, and a
training_stats.json is rewritten each iteration.

TPU-native: the whole self-play iteration and the whole eval match batch are
single fused device programs (see selfplay.py / evaluate.py); the learner
consumes compact host samples and rebuilds features on device. Parameters
are passed as traced arguments so weight updates never trigger recompiles —
the reference's stop-the-world inference-server restart on update_model
(inference_server.py:479-496) has no equivalent here; the new weights are
just the next call's arguments.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import count_parameters, init_net
from . import checkpoint as ckpt
from .config import TrainingConfig
from .evaluate import EvalOut, EvalSettings, make_hosted_eval
from .learner import (
    make_optimizer,
    make_train_epochs,
    set_learning_rate,
)
from .replay import ReplayBuffer
from .selfplay import SelfPlaySettings, make_hosted_selfplay

logger = logging.getLogger("xiangqi_az_tpu")

# Deep-copy a param tree without aliasing (donation safety). Must run under
# jit: eager jnp.copy on a multi-host global array is not addressable.
_copy_tree = jax.jit(lambda t: jax.tree.map(jnp.copy, t))


class AlphaZeroTrainer:
    def __init__(self, cfg: TrainingConfig):
        self.cfg = cfg
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        self.net, variables = init_net(
            jax.random.key(cfg.seed),
            channels=cfg.num_channels,
            blocks=cfg.num_res_blocks,
            dtype=dtype,
        )
        self.params = variables["params"]
        self.batch_stats = variables["batch_stats"]
        self.best_params = _copy_tree(self.params)
        self.best_stats = _copy_tree(self.batch_stats)

        self.tx = make_optimizer(cfg.learning_rate, cfg.weight_decay)
        # opt_state is initialized after the (optional) TP placement below so
        # the Adam moments are allocated once, in their final layout

        self.buffer = ReplayBuffer(cfg.max_buffer_size, cfg.max_children)
        self.iteration = 0
        self.total_games = 0
        self.training_stats = []
        self.rng = jax.random.key(cfg.seed + 1)
        self.np_rng = np.random.default_rng(cfg.seed + 2)

        self.sp_settings = SelfPlaySettings(
            num_simulations=cfg.num_simulations,
            c_puct=cfg.c_puct,
            max_children=cfg.max_children,
            max_game_length=cfg.max_game_length,
            temperature_threshold=cfg.temperature_threshold,
            temperature_schedule=cfg.temperature_schedule,
            random_opening_moves=cfg.random_opening_moves,
            enable_resign=cfg.enable_resign,
            resign_threshold=cfg.resign_threshold,
            resign_check_steps=cfg.resign_check_steps,
            search_algo=cfg.search_algo,
            max_considered=cfg.max_considered,
            playout_cap_prob=cfg.playout_cap_prob,
            playout_cap_sims=cfg.playout_cap_sims,
        )
        self.eval_settings = EvalSettings(
            num_simulations=cfg.eval_simulations,
            c_puct=cfg.c_puct,
            max_children=cfg.max_children,
            max_game_length=cfg.max_game_length,
        )

        # Auto data-parallel over ALL global devices (every process's chips
        # under multi-controller SPMD); batch axes that don't divide the
        # device count are PADDED up to divisibility — pad games are played
        # and dropped on the host, pad train columns carry zero weight.
        from ..parallel import sharding as SH

        self.mesh = None
        n_dev = len(jax.devices())
        n_proc = jax.process_count()
        self.is_main = jax.process_index() == 0
        if cfg.mesh_mode == "auto" and (n_dev > 1 or n_proc > 1):
            if cfg.model_parallel > 1:
                self.mesh = SH.make_tp_mesh(cfg.model_parallel)
                logger.info(
                    "data x model parallel over %d devices (%d x %d)",
                    n_dev, n_dev // cfg.model_parallel, cfg.model_parallel,
                )
            else:
                self.mesh = SH.make_mesh(axis_name=cfg.mesh_axis)
                if self.is_main:
                    logger.info(
                        "data-parallel over %d devices / %d processes (%s)",
                        n_dev, n_proc, cfg.mesh_axis,
                    )
        # Tensor parallelism (learner side): the candidate's params and Adam
        # moments live Megatron-sharded over 'model' (the policy FC is ~80%
        # of the params); the actors' (best) params stay replicated. Jits
        # here have no pinned param in_shardings, so the committed layout
        # flows through train_network as-is; evaluate/selfplay boundaries
        # reshard explicitly via _as_replicated/_as_tp.
        if cfg.model_parallel > 1 and self.mesh is None:
            raise ValueError(
                "model_parallel > 1 needs mesh_mode='auto' and more than one "
                f"visible device (have {n_dev}, mesh_mode={cfg.mesh_mode!r})"
            )
        self._tp = self.mesh is not None and cfg.model_parallel > 1
        if self._tp:
            self.params = SH.tp_place(self.mesh, self.params)
            # layout-converting COPIES (plain device_put aliases leaves whose
            # sharding doesn't change, which breaks under later donation)
            self._to_repl = jax.jit(
                lambda t: jax.tree.map(jnp.copy, t),
                out_shardings=SH.replicated(self.mesh),
            )
            self._to_tp = jax.jit(
                lambda t: jax.tree.map(jnp.copy, t),
                out_shardings=SH.tp_param_shardings(self.mesh, self.params),
            )
        # Adam moments zeros_like the params, inheriting their final layout
        self.opt_state = self.tx.init(self.params)
        # multi-host: every jit input must be a global jax.Array; host state
        # (replay buffer, np rng) is replicated by construction — every
        # process computes identical values, so replicated device_put of
        # host values is the whole data plane (see parallel/sharding.py)
        self._repl = (
            SH.replicated(self.mesh)
            if (self.mesh is not None and n_proc > 1)
            else None
        )
        if self._repl is not None:
            # Establish the cross-process collective context NOW with a tiny
            # barrier program: the context rendezvous has a short timeout,
            # and the first heavy program's compile time can skew processes
            # past it (observed with gloo's 30s GetKeyValue deadline).
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("xaz_trainer_init")

        def _pad_to(n: int, d: int) -> int:
            return -(-n // d) * d

        # batch axes shard over the mesh's first ('data') axis only
        align = self.mesh.devices.shape[0] if self.mesh is not None else 1
        self._sp_batch = _pad_to(cfg.num_games_per_iter, align)
        self._eval_batch = _pad_to(cfg.eval_games, align * 2 if align % 2 else align)
        self._train_cols = _pad_to(cfg.batch_size, align)

        sharding = SH.batch_sharded(self.mesh) if self.mesh is not None else None
        # hosted drivers: bounded device programs (segments), carry stays
        # on device — long single programs exceed accelerator wall clocks
        self._selfplay_run = make_hosted_selfplay(
            self.net, self._sp_batch, self.sp_settings,
            batch_sharding=sharding,
        )
        self._eval_run = make_hosted_eval(
            self.net, self._eval_batch, self.eval_settings,
            batch_sharding=sharding,
        )
        self._train_epochs = make_train_epochs(self.net, self.tx, sharding)

        os.makedirs(cfg.checkpoint_dir, exist_ok=True)
        logger.info(
            "model: %d channels x %d blocks, %s params",
            cfg.num_channels,
            cfg.num_res_blocks,
            f"{count_parameters(self.params):,}",
        )

    # ------------------------------------------------------------ phases
    def _heartbeat(self) -> None:
        """Touch <checkpoint_dir>/.heartbeat so the --auto-restart stall
        watchdog (train/__main__.py, which watches checkpoint-dir mtimes)
        sees progress at every PHASE boundary, not just once per iteration
        — without this, any healthy iteration longer than
        XQAZ_STALL_TIMEOUT_S (big nets, cold XLA compiles) would be
        SIGKILLed as a presumed hang (advisor round-4 finding)."""
        if not self.is_main:
            return
        try:
            with open(
                os.path.join(self.cfg.checkpoint_dir, ".heartbeat"), "w"
            ) as f:
                f.write(f"{self.iteration} {time.time():.0f}\n")
        except OSError:
            pass

    def _next_key(self):
        self.rng, k = jax.random.split(self.rng)
        return k

    def _as_replicated(self, tree):
        """TP learner params -> replicated COPY (actor/eval layout)."""
        return self._to_repl(tree) if self._tp else tree

    def _as_tp(self, tree):
        """Replicated params -> a COPY in the learner's TP layout. Under
        multi-controller, host/process-local values (checkpoint restores)
        can't enter the jitted copy — commit them via tp_place, which
        assembles the global arrays from per-process shards."""
        if not self._tp:
            return tree
        if jax.process_count() > 1 and any(
            not (isinstance(x, jax.Array) and not x.is_fully_addressable)
            for x in jax.tree.leaves(tree)
        ):
            from ..parallel import sharding as SH

            return SH.tp_place(self.mesh, tree)
        return self._to_tp(tree)

    def _dev(self, tree):
        """Host values -> jit inputs. Multi-host: replicated global arrays
        (every process holds identical host values); single-host: as-is."""
        if self._repl is None:
            return tree
        from ..parallel.sharding import put_replicated

        return jax.tree.map(
            lambda x: x
            if (isinstance(x, jax.Array) and not x.is_fully_addressable)
            else put_replicated(self.mesh, x),
            tree,
        )

    def self_play(self) -> Dict:
        t0 = time.time()
        self._heartbeat()
        best_vars = {"params": self.best_params, "batch_stats": self.best_stats}
        out = self._selfplay_run(self._dev(best_vars), self._dev(self._next_key()))
        out = jax.tree.map(np.asarray, out)
        g = self.cfg.num_games_per_iter  # drop mesh-padding games
        out = out._replace(
            boards=out.boards[:, :g],
            sides=out.sides[:, :g],
            pi_actions=out.pi_actions[:, :g],
            pi_probs=out.pi_probs[:, :g],
            values=out.values[:, :g],
            rec=out.rec[:, :g],
            winners=out.winners[:g],
            plies=out.plies[:g],
            total_moves=out.total_moves[:g],
        )
        rec = out.rec.reshape(-1)
        n_new = self.buffer.add_games(
            out.boards.reshape(-1, 90)[rec],
            out.sides.reshape(-1)[rec],
            out.pi_actions.reshape(-1, self.cfg.max_children)[rec],
            out.pi_probs.reshape(-1, self.cfg.max_children)[rec],
            out.values.reshape(-1)[rec],
        )
        winners = out.winners
        self.total_games += len(winners)
        stats = {
            "games": int(len(winners)),
            "red_wins": int((winners == 1).sum()),
            "black_wins": int((winners == -1).sum()),
            "draws": int((winners == 0).sum()),
            "avg_steps": float(out.plies.mean()),
            "new_samples": int(n_new),
            "buffer_size": len(self.buffer),
            "time": time.time() - t0,
        }
        logger.info("self-play: %s", stats)
        return stats

    def train_network(self) -> Dict:
        if len(self.buffer) < self.cfg.min_buffer_size:
            logger.info(
                "buffer %d < min %d, skipping training",
                len(self.buffer),
                self.cfg.min_buffer_size,
            )
            return {}
        t0 = time.time()
        self._heartbeat()
        lr = self.cfg.lr_at(self.iteration)
        self.opt_state = set_learning_rate(self.opt_state, lr)
        # all epochs' batches run as ONE on-device scan (the reference's
        # per-batch host loop is dispatch-bound, train.py:384-432)
        perm, wmask, n_batches = self.buffer.epoch_plan(
            self.cfg.batch_size, self.cfg.num_epochs, self.np_rng
        )
        if self._train_cols > self.cfg.batch_size:
            # mesh-divisibility padding: extra columns carry zero weight, so
            # the update math is identical to the unpadded batch
            pad = self._train_cols - self.cfg.batch_size
            perm = np.pad(perm, ((0, 0), (0, pad)))
            wmask = np.pad(wmask, ((0, 0), (0, pad)))
        bufs = self._dev(tuple(jnp.asarray(x) for x in self.buffer.arrays()))
        seg = self.cfg.train_segment_batches
        if seg and seg < n_batches:
            # watchdog-bounded segments: chain the (params, stats, opt)
            # carry through fixed-shape [seg, b] scan calls — identical
            # math to the single scan (zero-weight rows pad the tail, and
            # the scan skips them). One compile serves every segment.
            n_seg = -(-n_batches // seg)
            rows = n_seg * seg
            perm = np.pad(perm[:rows], ((0, max(0, rows - perm.shape[0])), (0, 0)))
            wmask = np.pad(wmask[:rows], ((0, max(0, rows - wmask.shape[0])), (0, 0)))
            loss_parts = []
            for s in range(n_seg):
                self._heartbeat()
                sl = slice(s * seg, (s + 1) * seg)
                (
                    self.params,
                    self.batch_stats,
                    self.opt_state,
                    part,
                ) = self._train_epochs(
                    *self._dev((self.params, self.batch_stats, self.opt_state)),
                    *bufs,
                    *self._dev((jnp.asarray(perm[sl]), jnp.asarray(wmask[sl]))),
                )
                loss_parts.append(np.asarray(part))
            losses = np.concatenate(loss_parts)[:n_batches]
        else:
            (
                self.params,
                self.batch_stats,
                self.opt_state,
                losses,
            ) = self._train_epochs(
                *self._dev((self.params, self.batch_stats, self.opt_state)),
                *bufs, *self._dev((jnp.asarray(perm), jnp.asarray(wmask))),
            )
            losses = np.asarray(losses)[:n_batches]
        tot_p = float(losses[:, 0].sum())
        tot_v = float(losses[:, 1].sum())
        stats = {
            "policy_loss": tot_p / max(n_batches, 1),
            "value_loss": tot_v / max(n_batches, 1),
            "total_loss": (tot_p + tot_v) / max(n_batches, 1),
            "learning_rate": lr,
            "batches": n_batches,
            "time": time.time() - t0,
        }
        logger.info("train: %s", stats)
        return stats

    def evaluate(self) -> Dict:
        t0 = time.time()
        self._heartbeat()
        vars_new = {
            "params": self._as_replicated(self.params),
            "batch_stats": self.batch_stats,
        }
        vars_old = {"params": self.best_params, "batch_stats": self.best_stats}
        out: EvalOut = self._eval_run(
            self._dev(vars_new), self._dev(vars_old), self._dev(self._next_key())
        )
        # count on host over the UNPADDED games only: the candidate is red in
        # the first ceil(G/2) games of the red half, black in the first
        # floor(G/2) of the black half (mesh-padding games are discarded)
        winners = np.asarray(out.winners)
        new_is_red = np.asarray(out.new_is_red)
        g = self.cfg.eval_games
        half = self._eval_batch // 2
        sel = np.zeros(self._eval_batch, bool)
        sel[: (g + 1) // 2] = True
        sel[half : half + g // 2] = True
        w, red = winners[sel], new_is_red[sel]
        new_wins = int(((w == 1) & red).sum() + ((w == -1) & ~red).sum())
        old_wins = int(((w == -1) & red).sum() + ((w == 1) & ~red).sum())
        draws = int((w == 0).sum())
        win_rate = (new_wins + 0.5 * draws) / max(self.cfg.eval_games, 1)
        updated = win_rate >= self.cfg.eval_win_rate
        if updated:
            # _as_replicated / _as_tp are jitted copies, donation-safe;
            # under TP (single-process, so _dev is identity) the replicated
            # copy made for vars_new above is still live — reuse it
            self.best_params = (
                vars_new["params"] if self._tp
                else _copy_tree(self.params)
            )
            self.best_stats = _copy_tree(self.batch_stats)
            logger.info(">>> best model updated (win_rate %.2f) <<<", win_rate)
        else:
            # candidate failed the gate: reset to incumbent (train.py:532)
            self.params = (
                self._as_tp(self.best_params) if self._tp
                else _copy_tree(self.best_params)
            )
            self.batch_stats = _copy_tree(self.best_stats)
            logger.info("candidate rejected (win_rate %.2f)", win_rate)
        return {
            "new_wins": new_wins,
            "old_wins": old_wins,
            "draws": draws,
            "win_rate": win_rate,
            "model_updated": updated,
            "time": time.time() - t0,
        }

    # -------------------------------------------------------- lifecycle
    @staticmethod
    def _pack_np_rng(gen: np.random.Generator) -> np.ndarray:
        """FULL PCG64 state as 6x uint64 for orbax: the two 128-bit ints
        PLUS has_uint32/uinteger — the buffered half of a 64-bit draw that
        32-bit consumers (np.permutation et al.) leave pending. Dropping
        the buffer made a resumed run's NEXT training permutation diverge
        from the uninterrupted run whenever the checkpoint landed with a
        half-draw pending (~50% of iteration counts) — self-play and eval
        (jax-key streams) stayed identical, so only the training losses
        moved. Caught by test_pod_restart_resumes_and_matches_uninterrupted."""
        full = gen.bit_generator.state
        st = full["state"]
        mask = (1 << 64) - 1
        return np.array(
            [st["state"] & mask, st["state"] >> 64,
             st["inc"] & mask, st["inc"] >> 64,
             int(full.get("has_uint32", 0)), int(full.get("uinteger", 0))],
            dtype=np.uint64,
        )

    @staticmethod
    def _unpack_np_rng(arr: np.ndarray) -> np.random.Generator:
        a = np.asarray(arr, dtype=np.uint64)
        gen = np.random.default_rng(0)
        state = {
            **gen.bit_generator.state,
            "state": {
                "state": int(a[0]) | (int(a[1]) << 64),
                "inc": int(a[2]) | (int(a[3]) << 64),
            },
        }
        if a.shape[0] >= 6:  # 4-word legacy checkpoints: buffer unknown,
            state["has_uint32"] = int(a[4])  # treated as empty (pre-fix
            state["uinteger"] = int(a[5])    # behavior)
        gen.bit_generator.state = state
        return gen

    def save(self, is_best: bool = False) -> str:
        # TP learner state is 'model'-sharded; checkpoints store the
        # replicated layout (np.asarray of a sharded non-addressable array
        # is rejected under multi-controller, and replicated checkpoints
        # stay loadable at any future mesh shape)
        params = self._as_replicated(self.params) if self._tp else self.params
        opt_state = (
            self._to_repl(self.opt_state) if self._tp else self.opt_state
        )
        payload = {
            "iteration": self.iteration,
            "rng_key": jax.random.key_data(self.rng),
            "np_rng": self._pack_np_rng(self.np_rng),
            "params": params,
            "batch_stats": self.batch_stats,
            "best_params": self.best_params,
            "best_batch_stats": self.best_stats,
            "opt_state": opt_state,
            "total_games": self.total_games,
            "config": {
                "num_channels": self.cfg.num_channels,
                "num_res_blocks": self.cfg.num_res_blocks,
            },
        }
        path = ckpt.save_checkpoint(self.cfg.checkpoint_dir, self.iteration, payload)
        if self.cfg.checkpoint_replay and jax.process_index() == 0:
            # the ring is replicated across hosts by construction (every
            # process plays the identical lockstep fleet), so one writer
            # suffices; plain npz — host numpy, no device arrays
            np.savez(path + ".replay.npz", **self.buffer.state_dict())
        if is_best:
            ckpt.save_best_model(
                self.cfg.checkpoint_dir,
                self.iteration,
                self.best_params,
                self.best_stats,
                {
                    "num_channels": self.cfg.num_channels,
                    "num_res_blocks": self.cfg.num_res_blocks,
                },
            )
        logger.info("checkpoint saved: %s", path)
        return path

    def restore(self, path: str) -> None:
        target = {
            "iteration": 0,
            "rng_key": jax.random.key_data(self.rng),
            "np_rng": self._pack_np_rng(self.np_rng),
            "params": self.params,
            "batch_stats": self.batch_stats,
            "best_params": self.best_params,
            "best_batch_stats": self.best_stats,
            "opt_state": self.opt_state,
            "total_games": 0,
            "config": {
                "num_channels": self.cfg.num_channels,
                "num_res_blocks": self.cfg.num_res_blocks,
            },
        }
        try:
            restored = ckpt.load_checkpoint(path, target)
        except (ValueError, KeyError):
            try:
                # 4-word np_rng checkpoints (pre half-draw-buffer fix):
                # keep full-fidelity restore of both streams
                target["np_rng"] = np.zeros(4, np.uint64)
                restored = ckpt.load_checkpoint(path, target)
            except (ValueError, KeyError):
                # older checkpoints predate the RNG-state fields entirely
                target.pop("rng_key", None)
                target.pop("np_rng", None)
                restored = ckpt.load_checkpoint(path, target)
        self.params = self._as_tp(
            jax.tree.map(jnp.asarray, restored["params"])
        )
        self.batch_stats = jax.tree.map(jnp.asarray, restored["batch_stats"])
        self.best_params = jax.tree.map(jnp.asarray, restored["best_params"])
        self.best_stats = jax.tree.map(jnp.asarray, restored["best_batch_stats"])
        # Adam moments come back replicated; the first train step's outputs
        # re-commit them to the TP layout (GSPMD resharding, one-time cost)
        self.opt_state = jax.tree.map(jnp.asarray, restored["opt_state"])
        self.iteration = int(restored["iteration"])
        self.total_games = int(restored["total_games"])
        if "rng_key" in restored:  # full-fidelity resume incl. RNG streams
            self.rng = jax.random.wrap_key_data(
                jnp.asarray(restored["rng_key"])
            )
            self.np_rng = self._unpack_np_rng(np.asarray(restored["np_rng"]))
        replay_path = os.path.abspath(path).rstrip("/") + ".replay.npz"
        if self.cfg.checkpoint_replay:
            has = os.path.exists(replay_path)
            if jax.process_count() > 1:
                # every process must restore the SAME ring (the fleet is
                # lockstep-replicated); a host missing the file would
                # silently feed different batches into the collectives
                from jax.experimental import multihost_utils

                flags = multihost_utils.process_allgather(
                    np.asarray([has])
                ).ravel()
                if flags.any() and not flags.all():
                    raise ValueError(
                        f"{replay_path} exists on some hosts but not all "
                        "(it is written by process 0 only) — copy it to "
                        "every host, or set --checkpoint-replay 0"
                    )
            if has:
                with np.load(replay_path) as z:
                    self.buffer.load_state({k: z[k] for k in z.files})
                logger.info(
                    "replay ring restored: %d samples", len(self.buffer)
                )
            else:
                logger.warning(
                    "replay ring %s not found: resuming with a COLD "
                    "buffer — NOT the bit-exact resume this checkpoint "
                    "was written for (copy the .replay.npz next to the "
                    "checkpoint, or silence with --checkpoint-replay 0)",
                    replay_path,
                )
        # reload prior iterations' stats so a supervisor-restarted run
        # keeps writing ONE cumulative training_stats.json (the reference
        # loses pre-resume stats the same way this used to,
        # reference: train.py:619-634 rewrites from an in-memory list)
        stats_path = os.path.join(
            self.cfg.checkpoint_dir, "training_stats.json"
        )
        if os.path.exists(stats_path):
            try:
                with open(stats_path) as f:
                    prior = json.load(f)
                self.training_stats = [
                    s for s in prior
                    if int(s.get("iteration", 0)) <= self.iteration
                ]
            except (json.JSONDecodeError, OSError):
                pass  # corrupt/partial stats file: start a fresh list
        logger.info("restored %s at iteration %d", path, self.iteration)

    def run_iteration(self) -> Dict:
        self.iteration += 1
        self._maybe_inject_fault()
        t0 = time.time()
        sp_stats = self.self_play()
        train_stats = self.train_network()
        eval_stats = {}
        if (
            self.iteration % self.cfg.eval_interval == 0
            and len(self.buffer) >= self.cfg.min_buffer_size
        ):
            eval_stats = self.evaluate()
        if self.iteration % self.cfg.save_interval == 0:
            self.save(is_best=True)
        stats = {
            "iteration": self.iteration,
            "time": time.time() - t0,
            "self_play": sp_stats,
            "training": train_stats,
            "evaluation": eval_stats,
        }
        self.training_stats.append(stats)
        if self.is_main:  # one writer per shared checkpoint dir
            with open(
                os.path.join(self.cfg.checkpoint_dir, "training_stats.json"), "w"
            ) as f:
                json.dump(self.training_stats, f, indent=2, default=str)
        logger.info("iteration %d done in %.1fs", self.iteration, stats["time"])
        return stats

    def warm_start(self, best_model_path: str) -> None:
        """Initialize current AND best weights from a slim ``best_model``
        export (params + batch stats only) — continue training a published
        model when its full checkpoint (optimizer state, RNG) was pruned.
        The iteration counter and optimizer start fresh; this is a NEW run
        seeded with trained weights, not a resume."""
        target = {
            "params": self.params,
            "batch_stats": self.batch_stats,
            "iteration": 0,
        }
        restored = ckpt.load_checkpoint(best_model_path, target)
        self.params = self._as_tp(
            jax.tree.map(jnp.asarray, restored["params"])
        )
        self.batch_stats = jax.tree.map(jnp.asarray, restored["batch_stats"])
        self.best_params = (
            self._as_replicated(self.params) if self._tp
            else _copy_tree(self.params)
        )
        self.best_stats = _copy_tree(self.batch_stats)
        self.opt_state = self.tx.init(self.params)
        logger.info(
            "warm start from %s (exported at iteration %d)",
            best_model_path, int(restored["iteration"]),
        )

    def _maybe_inject_fault(self) -> None:
        """Fault injection for exercising the --auto-restart supervisor
        (the reference has no fault injection at all, SURVEY §5):
        XQAZ_FAULT_ITER="N:/marker/path" raises at iteration N unless the
        marker file exists (the raise creates it, so exactly one process
        crash per marker)."""
        spec = os.environ.get("XQAZ_FAULT_ITER")
        if not spec:
            return
        n, marker = spec.split(":", 1)
        if self.iteration == int(n) and not os.path.exists(marker):
            with open(marker, "w"):
                pass
            raise RuntimeError(
                f"injected fault at iteration {n} (XQAZ_FAULT_ITER)"
            )

    def train(
        self, resume: Optional[str] = None, init_from: Optional[str] = None
    ) -> None:
        if resume:
            self.restore(resume)
        elif init_from:
            self.warm_start(init_from)
        while self.iteration < self.cfg.num_iterations:
            self.run_iteration()
        self.save(is_best=True)
        logger.info("training complete: %d iterations", self.iteration)
