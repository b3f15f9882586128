"""Vectorized self-play: whole iterations of games as fused device programs.

TPU-native replacement for the reference's process-parallel workers
(reference: training/parallel_selfplay.py:42-134, 337-474): instead of N
processes each playing games serially with per-simulation socket round-trips,
the full batch of games plays in lockstep under jit — search, stepping,
recording, resign and adjudication all on-device.

Two drivers over the same loop body:

- ``selfplay_games``: the whole iteration as ONE jittable program (tests,
  dry-runs, small workloads);
- ``make_hosted_selfplay``: a host loop over BOUNDED device programs of
  ``plies_per_segment`` plies each, with the carry (env states + recorded
  samples) living on device between segments. Long-running accelerator
  runtimes kill single programs after a wall-clock budget (~60 s observed
  on the tunneled v5e used for development), and bounded segments are also
  interruptible and report progress.

Semantics preserved from the reference worker loop (parallel_selfplay.py):
- random opening: uniform random legal moves, count ~ randint(0, N)
  inclusive; a game that ends during the opening restarts fresh (:60-69);
- material adjudication when move_count >= max_game_length (:76-86);
- binary temperature schedule: 1.0 below temperature_threshold plies,
  then 0.3 (:89-92);
- recorded policy target = the temperature-exponentiated search
  distribution (:93-96);
- resign: after >10 recorded plies, resign_check_steps consecutive
  post-move values below resign_threshold end the game, the mover wins
  (:106-117);
- z labels: +1/-1/0 vs the recorded player (:120-129).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as PSpec

from ..engine import env as E
from ..search import mcts as M


class SelfPlaySettings(NamedTuple):
    """Static (hashable) settings baked into the jitted program."""

    num_simulations: int = 80
    c_puct: float = 1.5
    max_children: int = 128
    max_game_length: int = 200
    temperature_threshold: int = 15
    # The schedule selects WHICH reference game loop is replicated, as a
    # coherent whole (the two loops differ in more than temperature):
    # "binary" = the parallel worker loop (parallel_selfplay.py:74-121):
    #   temp 1.0 below the threshold then 0.3, clocked by TOTAL move count
    #   (openings included, :91); material adjudication at the move cap
    #   (:79-89); resign gated on >10 recorded samples and checked on the
    #   post-move state with NO terminal check in between, so a resign can
    #   overwrite the verdict of a move that just ended the game (:109-121).
    # "anneal" = the serial loop (train.py:248-301): temp 1.0 then linear
    #   1.0 -> 0.1 over the 10 RECORDED steps after the threshold (openings
    #   excluded, :249-255); the step cap ends the game as a plain draw
    #   (no adjudication, :286-289); resign gated on step > 40 and only
    #   checked when the game is NOT already over (:271-284).
    # Deliberate deviation (both modes): a game that ends DURING the random
    #   opening restarts fresh. The parallel loop does the same (:69-71);
    #   the serial make_random_opening (train.py:154-165) instead keeps the
    #   terminal game, which would crash its own move sampling on the zero
    #   pi the search returns for positions with no legal actions — a
    #   latent reference bug on an astronomically rare path, not a
    #   semantic to replicate.
    temperature_schedule: str = "binary"
    random_opening_moves: int = 4
    enable_resign: bool = True
    resign_threshold: float = -0.85
    resign_check_steps: int = 3
    # "puct" = the reference loops above, exactly. "gumbel" = the
    # sequential-halving root search (search/gumbel.py, beyond the
    # reference): the acted move is the halving winner (the Gumbel sample
    # IS the exploration — no Dirichlet noise, no temperature sampling;
    # temperature_threshold/schedule are ignored) and the recorded policy
    # target is the improved policy softmax(logits + sigma(completedQ))
    # over ALL legal moves, per the paper. Strong at 16-64 sims/move,
    # several times cheaper per iteration than PUCT at reference depths.
    search_algo: str = "puct"
    max_considered: int = 16  # gumbel root candidate count m
    # Playout-cap randomization (KataGo, arXiv:1902.10565 §3.1, beyond the
    # reference): a move is a full search with probability
    # playout_cap_prob, else a cheap playout_cap_sims search (run
    # noiseless, per KataGo). Cheap moves record NO policy target
    # (all-zero pi row -> zero CE, the learner normalizes policy loss over
    # target-carrying rows) but still produce value samples and game flow
    # — most of the value-data volume at a fraction of the search cost.
    # Two coin granularities:
    # - per_game=False (default): ONE coin per PLY for the whole lockstep
    #   fleet. This is the COMPUTE lever: expected search cost is
    #   p*full + (1-p)*cheap. Marginally each (game, move) is still
    #   Bernoulli(p); the deviation from KataGo is only the cross-game
    #   correlation at equal ply (asserted in test_playout_cap.py).
    # - per_game=True: independent coin per (game, move), KataGo's exact
    #   semantics, via per-game simulation budgets inside ONE search
    #   program (search/mcts.py sim_budget). The lockstep batch still
    #   executes full-search compute every ply — this is the FIDELITY
    #   lever, not a compute saving. PUCT only (the gumbel search's
    #   halving schedule is static).
    # playout_cap_prob=1.0 (default) = off = reference behavior.
    playout_cap_prob: float = 1.0
    playout_cap_sims: int = 0
    playout_cap_per_game: bool = False


class SelfPlayOut(NamedTuple):
    boards: jax.Array      # int8[T, B, 90]
    sides: jax.Array       # int8[T, B]
    pi_actions: jax.Array  # int32[T, B, K]
    pi_probs: jax.Array    # f32[T, B, K]
    values: jax.Array      # f32[T, B]  (z labels)
    rec: jax.Array         # bool[T, B] sample validity
    winners: jax.Array     # int8[B]
    plies: jax.Array       # int32[B] recorded plies per game
    total_moves: jax.Array  # int32[B] final move_count per game


class SPCarry(NamedTuple):
    """Loop state between plies (device-resident across hosted segments)."""

    states: E.EnvState
    forced: jax.Array         # bool[B] resign/adjudication ended
    forced_winner: jax.Array  # int8[B]
    resign_run: jax.Array     # int32[B]
    n_rec: jax.Array          # int32[B]
    t: jax.Array
    rng: jax.Array
    boards: jax.Array
    sides: jax.Array
    pi_actions: jax.Array
    pi_probs: jax.Array
    rec: jax.Array


def temperature_at(t: jax.Array, s: SelfPlaySettings) -> jax.Array:
    """Per-game sampling temperature at time base ``t`` (f32, arrays OK).

    ``t`` is the schedule's clock and differs between the two reference
    loops: binary (parallel_selfplay.py:91) counts TOTAL moves incl.
    random openings (game.move_count); anneal (train.py:249-255) counts
    RECORDED steps only (the serial loop's ``step`` starts at 0 after the
    opening). Callers pass states.ply or n_rec accordingly."""
    thr = s.temperature_threshold
    if s.temperature_schedule == "anneal":
        frac = (t - thr).astype(jnp.float32) / 10.0
        return jnp.where(
            t < thr,
            1.0,
            jnp.where(t < thr + 10, 1.0 - 0.9 * frac, 0.1),
        ).astype(jnp.float32)
    return jnp.where(t < thr, 1.0, 0.3).astype(jnp.float32)


def _uniform_legal_action(legal: jax.Array, rng: jax.Array) -> jax.Array:
    """Uniform sample over an 8100-wide legal mask (== random.choice)."""
    g = jax.random.gumbel(rng, legal.shape)
    return jnp.argmax(jnp.where(legal, g, -jnp.inf), axis=-1).astype(jnp.int32)


def _adjudicate(board: jax.Array) -> jax.Array:
    """Material adjudication winner (reference: parallel_selfplay.py:77-86)."""
    diff = E.material(board, jnp.int8(1)) - E.material(board, jnp.int8(-1))
    return jnp.where(diff > 30, 1, jnp.where(diff < -30, -1, 0)).astype(jnp.int8)


def _alive(c: SPCarry) -> jax.Array:
    return ~c.states.done & ~c.forced


def _is_serial(s: SelfPlaySettings) -> bool:
    """Whether the SERIAL reference loop's cap/resign semantics apply.
    Gumbel mode always uses the parallel loop's (adjudication at the move
    cap, resign gate >10 recorded plies): temperature_schedule only picks
    a TEMPERATURE clock there, and gumbel has no temperature at all."""
    return s.temperature_schedule == "anneal" and s.search_algo != "gumbel"


def _init_carry(
    batch: int, rng: jax.Array, s: SelfPlaySettings, batch_sharding=None
) -> SPCarry:
    """Fresh games + random openings (reference: parallel_selfplay.py:60-69)."""
    T, K = s.max_game_length, s.max_children
    fresh = E.reset_batch(batch)
    if batch_sharding is not None:
        fresh = jax.lax.with_sharding_constraint(fresh, batch_sharding)
    states = fresh

    rng, k0 = jax.random.split(rng)
    n_rand = jax.random.randint(k0, (batch,), 0, s.random_opening_moves + 1)
    aborted = jnp.zeros(batch, bool)
    for r in range(s.random_opening_moves):
        rng, kr = jax.random.split(rng)
        active = (r < n_rand) & ~aborted & ~states.done
        act = jax.vmap(_uniform_legal_action)(
            states.legal, jax.random.split(kr, batch)
        )
        nxt = E.v_step(states, act)
        states = jax.tree.map(
            lambda n, o: jnp.where(
                active.reshape((batch,) + (1,) * (n.ndim - 1)), n, o
            ),
            nxt,
            states,
        )
        ended = active & states.done
        states = jax.tree.map(
            lambda f, st: jnp.where(
                ended.reshape((batch,) + (1,) * (f.ndim - 1)), f, st
            ),
            fresh,
            states,
        )
        aborted = aborted | ended

    return SPCarry(
        states=states,
        forced=jnp.zeros(batch, bool),
        forced_winner=jnp.zeros(batch, jnp.int8),
        resign_run=jnp.zeros(batch, jnp.int32),
        n_rec=jnp.zeros(batch, jnp.int32),
        t=jnp.int32(0),
        rng=rng,
        boards=jnp.zeros((T, batch, 90), jnp.int8),
        sides=jnp.zeros((T, batch), jnp.int8),
        pi_actions=jnp.full((T, batch, K), -1, jnp.int32),
        pi_probs=jnp.zeros((T, batch, K), jnp.float32),
        rec=jnp.zeros((T, batch), bool),
    )


def _make_body(
    eval_fn: Callable, batch: int, s: SelfPlaySettings, logits_eval: bool
) -> Callable[[SPCarry], SPCarry]:
    gumbel = s.search_algo == "gumbel"
    capped = 0.0 < s.playout_cap_prob < 1.0 and s.playout_cap_sims > 0
    per_game = capped and s.playout_cap_per_game
    if per_game and gumbel:
        raise ValueError(
            "playout_cap_per_game needs search_algo='puct' (the gumbel "
            "halving schedule is static; use the batch-global coin)"
        )

    def _search_fn(sims: int, add_noise: bool = True):
        if gumbel:
            from ..search import gumbel as G

            gcfg = G.GumbelConfig(
                num_simulations=sims,
                max_considered=min(s.max_considered, s.max_children),
                max_children=s.max_children,
            )
            return lambda states, k: G.run_gumbel_mcts(
                eval_fn, states, k, gcfg, logits_eval=logits_eval
            )
        mcfg = M.MCTSConfig(
            num_simulations=sims,
            c_puct=s.c_puct,
            max_children=s.max_children,
        )
        return lambda states, k: M.run_mcts(
            eval_fn, states, k, mcfg, add_noise=add_noise,
            logits_eval=logits_eval,
        )

    full_search = _search_fn(s.num_simulations)
    # cheap searches run noiseless (KataGo §3.1: exploration settings off
    # on fast searches — their job is value data, not policy targets)
    cheap_search = (
        _search_fn(s.playout_cap_sims, add_noise=False) if capped else None
    )

    if per_game:
        _mcfg = M.MCTSConfig(
            num_simulations=s.num_simulations,
            c_puct=s.c_puct,
            max_children=s.max_children,
        )

        def budget_search(states, k, budget, coins):
            return M.run_mcts(
                eval_fn, states, k, _mcfg, add_noise=True,
                logits_eval=logits_eval, sim_budget=budget,
                noise_mask=coins,
            )

    serial = _is_serial(s)  # see SelfPlaySettings / _is_serial

    def body(c: SPCarry) -> SPCarry:
        alive = _alive(c)
        if not serial:
            # parallel loop: material adjudication at the TOTAL-move cap,
            # checked at loop top (parallel_selfplay.py:79-89). The serial
            # loop has no adjudication — its step cap is a plain draw,
            # handled by _finalize on the games still alive at T.
            adj = alive & (c.states.ply >= s.max_game_length)
            forced = c.forced | adj
            forced_winner = jnp.where(
                adj, jax.vmap(_adjudicate)(c.states.board), c.forced_winner
            )
            alive = alive & ~adj
        else:
            forced, forced_winner = c.forced, c.forced_winner

        rng, k_search, k_act, k_cap = jax.random.split(c.rng, 4)
        if per_game:
            # independent coin per (game, move) — KataGo's exact
            # semantics, one search program with per-game sim budgets
            coins = jax.random.bernoulli(
                k_cap, s.playout_cap_prob, (batch,)
            )
            budget = jnp.where(
                coins, s.num_simulations, s.playout_cap_sims
            ).astype(jnp.int32)
            res = budget_search(c.states, k_search, budget, coins)
            is_full = coins  # [B]
        elif capped:
            # batch-global coin per ply: full vs cheap search program
            # (both branches return identical [B, K] result shapes)
            is_full = jax.random.bernoulli(
                k_cap, s.playout_cap_prob
            )
            res = jax.lax.cond(is_full, full_search, cheap_search,
                               c.states, k_search)
        else:
            is_full = jnp.bool_(True)
            res = full_search(c.states, k_search)

        if gumbel:
            # paper semantics: train on the improved policy, act the
            # halving winner (the Gumbel sample is the exploration)
            pi = jnp.where(res.valid, res.pi_improved, 0.0)
            act = res.chosen
        else:
            # schedule clock: total moves (parallel) vs recorded (serial)
            temp = temperature_at(c.n_rec if serial else c.states.ply, s)
            pi = M.action_probs_slots(res, temp)
            act = M.sample_actions(res, temp, k_act)
        if capped:
            # cheap searches carry NO policy target: an all-zero pi row is
            # a value-only sample (zero CE; learner normalizes over
            # target-carrying rows). is_full is scalar (global coin) or
            # [B] (per-game coins).
            mask = is_full if jnp.ndim(is_full) == 0 else is_full[:, None]
            pi = jnp.where(mask, pi, jnp.zeros_like(pi))

        boards = c.boards.at[c.t].set(c.states.board)
        sides = c.sides.at[c.t].set(c.states.side)
        pi_actions = c.pi_actions.at[c.t].set(res.actions)
        pi_probs = c.pi_probs.at[c.t].set(pi)
        rec = c.rec.at[c.t].set(alive)

        nxt = E.v_step(c.states, act)
        states = jax.tree.map(
            lambda n, o: jnp.where(
                alive.reshape((batch,) + (1,) * (n.ndim - 1)), n, o
            ),
            nxt,
            c.states,
        )
        n_rec = c.n_rec + alive.astype(jnp.int32)

        # resign: the parallel loop (parallel_selfplay.py:109-121) checks
        # the post-move state with NO terminal check in between — a resign
        # that fires on the ending move OVERWRITES its verdict (forced wins
        # over states.winner in _finalize). The serial loop (train.py:
        # 271-284) breaks on game-over BEFORE the resign check and gates on
        # step > 40 instead of >10 recorded samples.
        if s.enable_resign:
            feats = E.v_features(states.board, states.side)
            _, val = eval_fn(feats)
            gate = alive & (n_rec > (40 if serial else 10))
            if serial:
                gate = gate & ~states.done
            resign_run = jnp.where(
                gate & (val < s.resign_threshold),
                c.resign_run + 1,
                jnp.where(gate, 0, c.resign_run),
            )
            trigger = gate & (resign_run >= s.resign_check_steps)
            forced = forced | trigger
            forced_winner = jnp.where(
                trigger, (-states.side).astype(jnp.int8), forced_winner
            )
        else:
            resign_run = c.resign_run

        return SPCarry(
            states=states,
            forced=forced,
            forced_winner=forced_winner,
            resign_run=resign_run,
            n_rec=n_rec,
            t=c.t + 1,
            rng=rng,
            boards=boards,
            sides=sides,
            pi_actions=pi_actions,
            pi_probs=pi_probs,
            rec=rec,
        )

    return body


def _finalize(out: SPCarry, s: SelfPlaySettings) -> SelfPlayOut:
    # games still alive after T loop iterations hit the move cap:
    # material adjudication in the parallel loop (parallel_selfplay.py:
    # 79-89), a plain draw in the serial loop (train.py:286-289)
    leftover = _alive(out)
    if _is_serial(s):
        cap_verdict = jnp.zeros_like(out.forced_winner)
    else:
        cap_verdict = jax.vmap(_adjudicate)(out.states.board)
    forced_winner = jnp.where(leftover, cap_verdict, out.forced_winner)
    # forced verdicts take precedence over the board's own: the parallel
    # loop's post-move resign check can overwrite the verdict of a move
    # that just ended the game (no terminal check between make_action and
    # the resign break, parallel_selfplay.py:107-121)
    winners = jnp.where(
        out.forced | leftover,
        forced_winner,
        jnp.where(out.states.done, out.states.winner, 0),
    ).astype(jnp.int8)

    # z labels vs recorded player (reference: parallel_selfplay.py:120-129)
    w = winners[None, :].astype(jnp.int32)
    sd = out.sides.astype(jnp.int32)
    z = jnp.where(
        w == 0, 0.0, jnp.where(sd == w, 1.0, -1.0)
    ).astype(jnp.float32)
    z = jnp.where(out.rec, z, 0.0)

    return SelfPlayOut(
        boards=out.boards,
        sides=out.sides,
        pi_actions=out.pi_actions,
        pi_probs=out.pi_probs,
        values=z,
        rec=out.rec,
        winners=winners,
        plies=out.n_rec,
        total_moves=out.states.ply,
    )


def selfplay_games(
    eval_fn: Callable[[jax.Array], Tuple[jax.Array, jax.Array]],
    batch: int,
    rng: jax.Array,
    s: SelfPlaySettings,
    logits_eval: bool = False,
    batch_sharding=None,
) -> SelfPlayOut:
    """Play ``batch`` games to completion as ONE program. Jit with batch and
    s static. ``logits_eval=True``: eval_fn returns raw logits (see
    run_mcts). ``batch_sharding``: optional NamedSharding pinning the game
    batch onto a mesh axis (GSPMD does not otherwise know to shard the
    internally created fleet).

    NOTE: at production sizes one program can exceed accelerator runtime
    wall-clock budgets — use ``make_hosted_selfplay`` for those."""
    body = _make_body(eval_fn, batch, s, logits_eval)

    def cond(c: SPCarry):
        return (c.t < s.max_game_length) & jnp.any(_alive(c))

    init = _init_carry(batch, rng, s, batch_sharding)
    out = jax.lax.while_loop(cond, body, init)
    return _finalize(out, s)


def make_hosted_selfplay(
    net,
    batch: int,
    s: SelfPlaySettings,
    batch_sharding=None,
    plies_per_segment: int = 16,
):
    """Host-driven self-play: returns ``run(variables, rng) -> SelfPlayOut``.

    Each device program advances at most ``plies_per_segment`` plies (its
    internal while_loop still stops early when every game is finished); the
    carry stays on device and is donated between segments. ``variables`` are
    traced arguments, so weight updates never recompile.

    Multi-host (jax.process_count() > 1, batch_sharding over a global mesh):
    every process runs this same host loop in lockstep (SPMD multi-
    controller). The liveness check and the final outputs are forced to
    replicated shardings so every host can read them as plain numpy — the
    sample tensors are small (int8 boards + sparse pi slots), so the
    one-per-iteration all-gather over DCN is noise."""
    from ..models import policy_logits_fn

    multihost = jax.process_count() > 1
    repl = (
        NamedSharding(batch_sharding.mesh, PSpec())
        if (multihost and batch_sharding is not None)
        else None
    )
    if multihost and repl is None:
        raise ValueError("multi-host hosted self-play requires batch_sharding")

    init_j = jax.jit(
        functools.partial(_init_carry, batch, s=s, batch_sharding=batch_sharding)
    )
    alive_j = jax.jit(
        lambda c: jnp.any(_alive(c)), out_shardings=repl
    )

    @functools.partial(jax.jit, donate_argnums=(1,))
    def segment(variables, carry: SPCarry) -> SPCarry:
        body = _make_body(
            policy_logits_fn(net, variables), batch, s, logits_eval=True
        )
        t_end = jnp.minimum(
            carry.t + plies_per_segment, jnp.int32(s.max_game_length)
        )

        def cond(c: SPCarry):
            return (c.t < t_end) & jnp.any(_alive(c))

        return jax.lax.while_loop(cond, body, carry)

    fin_j = jax.jit(functools.partial(_finalize, s=s), out_shardings=repl)

    def run(variables, rng) -> SelfPlayOut:
        if repl is not None:
            from ..parallel.sharding import put_replicated

            rng = put_replicated(batch_sharding.mesh, rng)
        carry = init_j(rng)
        for _ in range(-(-s.max_game_length // plies_per_segment)):
            if not bool(np.asarray(alive_j(carry))):
                break
            carry = segment(variables, carry)
        return fin_j(carry)

    return run
