"""Serving predictor: checkpoint loading, single-game search, analysis.

Replaces the model/MCTS plumbing of the reference demo backend
(reference: demo/app.py:50-98, 322-387). Loads models from:
- orbax ``best_model`` exports / full training checkpoints (this framework),
- reference PyTorch ``.pt`` checkpoints via the weight importer — a user of
  the reference can point this server at their existing models.

Search runs the batched device MCTS with batch=1; raw policy/value come from
a jitted single-state forward. The human-facing game state is the host
oracle Position (exact rules, no device round-trip for legality checks).
"""

from __future__ import annotations

import functools
import json
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..engine import env as E
from ..engine.oracle import PIECE_NAMES, Position, decode_action
from ..models import XiangqiNet
from ..search import GumbelConfig, MCTSConfig, run_gumbel_mcts, run_mcts
from ..train import checkpoint as ckpt


def state_from_position(pos: Position) -> E.EnvState:
    """EnvState mirroring an oracle Position, including the repetition ring."""
    hist = np.zeros((E.HIST_LEN, 90), np.int8)
    recent = pos.history[-E.HIST_LEN :]
    for i, h in enumerate(recent):
        idx = (pos.ply - len(recent) + i) % E.HIST_LEN
        hist[idx] = np.frombuffer(h, np.uint8).astype(np.int8)
    return E.state_from_numpy(pos.board_array(), pos.side, pos.ply, pos.quiet, hist)


def format_move(action: int, pos: Position) -> str:
    """Human-readable move label (reference: demo/app.py:118-128)."""
    fr, fc, tr, tc = decode_action(action)
    piece = pos.at(fr, fc)
    captured = pos.at(tr, tc)
    s = f"{PIECE_NAMES.get(piece, '?')}({fr},{fc})→({tr},{tc})"
    if captured != 0:
        s += f" 吃{PIECE_NAMES.get(captured, '')}"
    return s


def find_models(search_dirs: List[str]) -> List[Dict]:
    """Discover loadable models (reference: demo/app.py:50-74)."""
    out = []
    for d in search_dirs:
        if not os.path.isdir(d):
            continue
        for name in sorted(os.listdir(d)):
            path = os.path.join(d, name)
            if name.endswith(".pt"):
                out.append({"name": name, "path": path, "format": "torch"})
            elif os.path.isdir(path) and (
                name == "best_model" or name.startswith("checkpoint_iter")
            ):
                out.append({"name": name, "path": path, "format": "orbax"})
    return out


class Predictor:
    def __init__(
        self,
        net: XiangqiNet,
        variables: Dict,
        num_simulations: int = 500,
        c_puct: float = 1.5,
        algo: str = "puct",
    ):
        if algo not in ("puct", "gumbel"):
            raise ValueError(f"unknown search algo {algo!r}")
        self.net = net
        self.variables = variables
        self.num_simulations = int(num_simulations)
        self.c_puct = float(c_puct)
        # "puct" = the reference's search semantics (mcts.py:94-155);
        # "gumbel" = the sequential-halving root (search/gumbel.py) — far
        # stronger per simulation, so low-latency serving can run a
        # fraction of the sims for the same strength
        self.algo = algo

    # ------------------------------------------------------------- loading
    @classmethod
    def load(cls, path: str, num_simulations: int = 500,
             algo: str = "puct") -> "Predictor":
        if path.endswith(".pt"):
            return cls._load_torch(path, num_simulations, algo)
        return cls._load_orbax(path, num_simulations, algo)

    @classmethod
    def _load_orbax(cls, path: str, num_simulations: int,
                    algo: str = "puct") -> "Predictor":
        restored = ckpt.load_checkpoint(path)
        cfg_path = os.path.join(os.path.dirname(path), "best_model_config.json")
        if "config" in restored:
            mc = restored["config"]
        elif os.path.exists(cfg_path):
            with open(cfg_path) as f:
                mc = json.load(f)
        else:
            raise ValueError(f"no model topology recorded for {path}")
        net = XiangqiNet(
            channels=int(mc["num_channels"]), blocks=int(mc["num_res_blocks"])
        )
        if "best_params" in restored:  # full training checkpoint
            variables = {
                "params": restored["best_params"],
                "batch_stats": restored["best_batch_stats"],
            }
        else:  # slim best_model export
            variables = {
                "params": restored["params"],
                "batch_stats": restored["batch_stats"],
            }
        variables = jax.tree.map(jnp.asarray, variables)
        return cls(net, variables, num_simulations, algo=algo)

    @classmethod
    def _load_torch(cls, path: str, num_simulations: int,
                    algo: str = "puct") -> "Predictor":
        import torch

        from ..models.torch_import import convert_state_dict

        payload = torch.load(path, map_location="cpu", weights_only=False)
        sd = payload.get("model_state_dict", payload)
        mc = payload.get("config", {})
        channels = int(mc.get("num_channels", 128))
        blocks = int(mc.get("num_res_blocks", 6))
        variables = convert_state_dict(
            {k: v.numpy() for k, v in sd.items()}, channels, blocks
        )
        variables = jax.tree.map(jnp.asarray, variables)
        net = XiangqiNet(channels=channels, blocks=blocks)
        return cls(net, variables, num_simulations, algo=algo)

    def with_simulations(self, num_simulations: int) -> "Predictor":
        """Shallow clone sharing the network/params (and the already-
        compiled forward) but with its own search depth and jit cache — so
        the global game can change depth without re-jitting or re-depthing
        the session searcher's programs out from under live sessions."""
        p = Predictor(
            self.net, self.variables, num_simulations, self.c_puct,
            algo=self.algo,
        )
        if "_forward" in self.__dict__:  # depth-independent: share it
            p.__dict__["_forward"] = self._forward
        return p

    # ----------------------------------------------------------- inference
    @functools.cached_property
    def _forward(self):
        net = self.net

        @jax.jit
        def f(variables, feats):
            logits, value = net.apply(variables, feats, train=False)
            return jax.nn.softmax(logits, axis=-1), value.squeeze(-1)

        return f

    @functools.cached_property
    def _search(self):
        net = self.net

        if self.algo == "gumbel":
            gcfg = GumbelConfig(
                num_simulations=self.num_simulations,
                max_considered=min(16, max(1, self.num_simulations)),
            )

            @jax.jit
            def f(variables, state_b, rng):
                def eval_fn(feats):
                    logits, value = net.apply(variables, feats, train=False)
                    return jax.nn.softmax(logits, -1), value.squeeze(-1)

                return run_gumbel_mcts(eval_fn, state_b, rng, gcfg)

            return f

        cfg = MCTSConfig(
            num_simulations=self.num_simulations, c_puct=self.c_puct
        )

        @jax.jit
        def f(variables, state_b, rng):
            def eval_fn(feats):
                logits, value = net.apply(variables, feats, train=False)
                return jax.nn.softmax(logits, axis=-1), value.squeeze(-1)

            return run_mcts(eval_fn, state_b, rng, cfg, add_noise=False)

        return f

    def warmup(self) -> None:
        """Compile the forward + search programs now so the first
        human_move doesn't pay 1-2 min of XLA compile latency (the
        reference server warms up the same way at startup,
        inference_server.py:101-107)."""
        from ..engine.oracle import Position as _P

        pos = _P()
        self.raw_predict(pos)
        self.search_position(pos)

    def raw_predict(self, pos: Position) -> Tuple[np.ndarray, float]:
        """(softmax policy[8100], value) for a single position — the
        reference's model.predict (model.py:109-124)."""
        feats = E.features(
            jnp.asarray(pos.board_array()), jnp.int8(pos.side)
        )[None]
        probs, value = self._forward(self.variables, feats)
        return np.asarray(probs[0]), float(value[0])

    def raw_predict_batch(
        self, positions: List[Position], pad_to: Optional[int] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(policy[n, 8100], value[n]) for several positions in ONE fused
        forward — the session collector pairs this with ``search_batch`` so
        a coalesced batch costs two device programs total instead of one
        search plus n single-state forwards."""
        n = len(positions)
        width = max(pad_to or n, n)
        padded = positions + [positions[0]] * (width - n)
        feats = jnp.stack([
            E.features(jnp.asarray(p.board_array()), jnp.int8(p.side))
            for p in padded
        ])
        probs, value = self._forward(self.variables, feats)
        return np.asarray(probs[:n]), np.asarray(value[:n])

    def search_position(
        self, pos: Position, rng: Optional[jax.Array] = None
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Run MCTS (no noise, greedy analysis). Returns (actions, visits,
        order) — ``order`` is the movegen-precedence key per slot (ascending
        == the reference engine's enumeration order; -1 pads)."""
        state = state_from_position(pos)
        state_b = jax.tree.map(lambda x: x[None], state)
        res = self._search(
            self.variables, state_b, rng if rng is not None else jax.random.key(0)
        )
        out = (
            np.asarray(res.actions[0]),
            np.asarray(res.visits[0]),
            np.asarray(res.order[0]),
        )
        if hasattr(res, "chosen"):  # gumbel: the halving winner acts
            out += (int(res.chosen[0]),)
        return out

    def search_batch(
        self, positions: List[Position], pad_to: Optional[int] = None
    ) -> List[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """One fused device search over several independent positions.

        Every search lane is numerically independent (no cross-lane
        reductions; batch-norm runs on frozen inference statistics). With
        the default PUCT search (deterministic, no noise at temp 0) each
        lane's (actions, visits) is IDENTICAL to what a batch-1
        ``search_position`` on that position returns — pinned by
        tests/test_sessions.py. With algo='gumbel' the search is stochastic
        by design: lane i draws its own Gumbel noise from key-split index i
        (batch-width-independent, but a game's reply still depends on which
        queue slot it landed in). ``pad_to`` fixes the compiled program
        shape (pad lanes replay positions[0] and are dropped); without it
        the jit cache keys on len(positions)."""
        n = len(positions)
        width = max(pad_to or n, n)
        padded = positions + [positions[0]] * (width - n)
        states = [state_from_position(p) for p in padded]
        state_b = jax.tree.map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *states
        )
        res = self._search(self.variables, state_b, jax.random.key(0))
        actions = np.asarray(res.actions)
        visits = np.asarray(res.visits)
        order = np.asarray(res.order)
        if hasattr(res, "chosen"):
            chosen = np.asarray(res.chosen)
            return [
                (actions[i], visits[i], order[i], int(chosen[i]))
                for i in range(n)
            ]
        return [(actions[i], visits[i], order[i]) for i in range(n)]

    # ------------------------------------------------------------ analysis
    def ai_move(self, pos: Position) -> Dict:
        """Pick the greedy move and produce the analysis payload
        (reference: demo/app.py:322-387)."""
        return self.ai_move_from_search(pos, self.search_position(pos))

    def ai_move_from_search(
        self,
        pos: Position,
        search: Tuple[np.ndarray, np.ndarray, np.ndarray],
        raw: Optional[Tuple[np.ndarray, float]] = None,
    ) -> Dict:
        """Analysis payload from an already-run search — lets the session
        server coalesce many games' searches into one device program and
        build each game's payload from its lane. ``raw`` optionally supplies
        the (policy, value) forward for the position (coalesced upstream);
        without it a single-state forward runs here. Deviation from the
        reference: 'prob' is the visit-proportional search distribution
        rather than the reference's temp-0 one-hot, so top_moves is
        informative; fields and structure are identical."""
        actions, visits, mg_order = search[:3]
        raw_policy, value_score = raw if raw is not None else self.raw_predict(pos)
        value_score = float(value_score)
        legal = set(pos.legal_actions())

        total = max(visits.sum(), 1)
        order = np.argsort(visits)[::-1][:15]
        if len(search) > 3 and search[3] >= 0:
            # gumbel: the acted move is the halving winner by
            # g + logits + sigma(q̂), not the max-visit child
            selected = int(search[3])
        else:
            # temp-0 pick: first max-visit child in the reference's movegen
            # order (its max() over the insertion-ordered dict, mcts.py:198)
            tied = np.flatnonzero((actions >= 0) & (visits == visits.max()))
            sel_slot = int(tied[np.argmin(mg_order[tied])])
            selected = int(actions[sel_slot])

        top_moves = []
        for j in order:
            if visits[j] <= 0 or actions[j] < 0:
                continue
            a = int(actions[j])
            fr, fc, tr, tc = decode_action(a)
            top_moves.append(
                {
                    "action": a,
                    "from": [fr, fc],
                    "to": [tr, tc],
                    "prob": round(float(visits[j] / total), 4),
                    "raw_prob": round(float(raw_policy[a]), 6),
                    "legal": a in legal,
                    "selected": a == selected,
                    "label": format_move(a, pos),
                }
            )

        label = format_move(selected, pos)
        fr, fc, tr, tc = decode_action(selected)
        pos.apply(selected)
        done, winner = pos.result()
        return {
            "board": pos.board_array().reshape(10, 9).tolist(),
            "current_player": pos.side,
            "game_over": done,
            "winner": int(winner) if winner else None,
            "ai_move": {
                "from": [fr, fc],
                "to": [tr, tc],
                "action": selected,
                "label": label,
            },
            "ai_analysis": {
                "value_score": round(value_score, 4),
                "top_moves": top_moves,
                "num_simulations": self.num_simulations,
            },
        }
