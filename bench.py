"""Headline benchmark: batched MCTS simulation throughput on one chip.

Measures end-to-end searched simulations per second — env stepping, legal
masking, tree ops and network evals included — on the quick-preset network
(64ch/3res, the reference's quick training net, reference: train.py:654-657),
plus the two BASELINE.md north-star numbers as extra keys on the same JSON
line: raw env-step throughput (boards/s through step_batch at batch 8192)
and the search loop's model FLOP utilization (network FLOPs dispatched /
bf16 peak).

Baseline: the reference's published quick-config sample run sustains
~0.116 games/s with 4 worker processes + batch inference server at 20
sims/move and ~60 plies/game (reference: models/training_stats.json:4-16),
i.e. ~139 NN-evaluated simulations/second. vs_baseline = ours / 139.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "mfu",
"env_steps_per_sec", "standard_sims_per_sec"} — the last is the same
search on the production 128ch/6res net (the driver-tracked waterline for
the standard preset).
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_SIMS_PER_SEC = 139.0
BF16_PEAK_FLOPS = 197e12  # v5e chip peak (bf16)


def main() -> None:
    # Fail fast if the tunneled backend is unreachable: device init HANGS
    # in C (uninterruptible — SIGALRM handlers never run) when the tunnel
    # is down, which would wedge the driver forever. Probe in a subprocess
    # with a hard timeout before this process touches the backend.
    import subprocess
    import sys as _sys

    last_good = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".bench_last_good.json"
    )

    def _probe() -> bool:
        try:
            subprocess.run(
                [_sys.executable, "-c",
                 "import jax, numpy as np, jax.numpy as jnp;"
                 "assert np.asarray(jnp.ones((8,8)) @ jnp.ones((8,8)))[0,0]"
                 " == 8.0"],
                timeout=180, check=True,
            )
            return True
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            return False

    # Bounded retry: a transient tunnel outage (the round-3 capture died on
    # one) gets three chances over ~5 minutes before we degrade.
    for attempt in range(3):
        if _probe():
            break
        if attempt < 2:
            print(f"bench: backend probe failed (attempt {attempt + 1}/3), "
                  "retrying in 60 s", file=_sys.stderr, flush=True)
            time.sleep(60)
    else:
        # Degrade to the last successful capture, clearly labeled stale,
        # rather than recording nothing (ONE JSON line either way). The
        # top-level metric fields are NULLED so a key-based consumer can
        # never mistake a months-old capture for a fresh one (advisor
        # round-4 finding); the cached numbers move under "last_good".
        if os.path.exists(last_good):
            with open(last_good) as f:
                cached = json.load(f)
            stale = {
                "metric": cached.get("metric", "mcts_sims_per_sec"),
                "value": None,
                "unit": cached.get("unit"),
                "vs_baseline": None,
                "mfu": None,
                "env_steps_per_sec": None,
                "standard_sims_per_sec": None,
                "standard_mfu": None,
                "guards_ok": None,
                "stale": True,
                "stale_reason": "TPU backend unreachable at capture",
                "last_good": cached,
            }
            print(json.dumps(stale))
            return
        raise SystemExit(
            "bench: TPU backend unreachable (device init exceeded 180 s "
            "— tunnel down?) and no cached last-good result"
        )

    from xiangqi_alphazero_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from xiangqi_alphazero_tpu.engine import env as E
    from xiangqi_alphazero_tpu.models import init_net
    from xiangqi_alphazero_tpu.search import MCTSConfig, run_mcts

    batch = 2048
    sims = 64
    net, variables = init_net(
        jax.random.key(0), channels=64, blocks=3, dtype=jnp.bfloat16
    )

    def eval_fn(feats):
        logits, value = net.apply(variables, feats, train=False)
        return logits, value.squeeze(-1)

    cfg = MCTSConfig(num_simulations=sims)

    @jax.jit
    def search_and_step(states, rng):
        k1, k2 = jax.random.split(rng)
        res = run_mcts(eval_fn, states, k1, cfg, add_noise=True, logits_eval=True)
        from xiangqi_alphazero_tpu.search import sample_actions

        act = sample_actions(res, jnp.ones(batch), k2)
        return E.v_step(states, act)

    states = jax.jit(E.reset_batch, static_argnums=0)(batch)
    rng = jax.random.key(1)

    # compile + warmup
    rng, k = jax.random.split(rng)
    states = search_and_step(states, k)
    np.asarray(states.ply)  # block (plain block_until_ready may not, here)

    # Best of 3 windows: the tunneled chip is time-shared and its effective
    # throughput has been observed to swing ~5x between minutes (an
    # interleaved HEAD-control experiment measured the SAME program at 860
    # and 4412 ms/move half an hour apart). The max window is the machine's
    # actual capability; a single window samples the neighbours' load.
    n_rounds = 4
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_rounds):
            rng, k = jax.random.split(rng)
            states = search_and_step(states, k)
        np.asarray(states.ply)
        best_dt = min(best_dt, time.perf_counter() - t0)
    dt = best_dt
    sims_per_sec = batch * sims * n_rounds / dt

    # --- MFU: network FLOPs dispatched by the search / chip bf16 peak -----
    # One forward per simulation plus the root eval, each over the full
    # game batch (XLA's own cost model for the compiled forward).
    fwd = jax.jit(lambda x: net.apply(variables, x, train=False))
    cost = fwd.lower(jnp.zeros((batch, 10, 9, 15), jnp.float32)).compile()
    flops_fwd = float(cost.cost_analysis()["flops"])
    evals_per_round = sims + 1
    mfu = (flops_fwd * evals_per_round * n_rounds / dt) / BF16_PEAK_FLOPS

    # --- raw env-step throughput (BASELINE.md: >=1M boards/s/chip) --------
    # Donated carry (as the self-play loop holds it) and a large batch so
    # the tunnel's ~1-2 ms dispatch overhead amortizes into the ~15 ms
    # device program; full outputs (legal mask included) are materialized.
    eb = 16384
    estates = jax.jit(E.reset_batch, static_argnums=0)(eb)
    step_warm = jax.jit(E.v_step)
    k = jax.random.key(2)
    for _ in range(6):  # advance to realistic midgame occupancy
        k, k2 = jax.random.split(k)
        g = jax.random.gumbel(k2, estates.legal.shape)
        act = jnp.argmax(
            jnp.where(estates.legal, g, -jnp.inf), -1
        ).astype(jnp.int32)
        estates = step_warm(estates, act)
    np.asarray(estates.ply)
    acts = []
    for _ in range(13):
        k, k2 = jax.random.split(k)
        g = jax.random.gumbel(k2, estates.legal.shape)
        acts.append(
            jnp.argmax(jnp.where(estates.legal, g, -jnp.inf), -1).astype(
                jnp.int32
            )
        )
    step_j = jax.jit(E.v_step, donate_argnums=0)
    estates = step_j(estates, acts[0])  # compile donated variant
    np.asarray(estates.ply)
    env_dt = float("inf")
    for _ in range(3):  # best of 3 windows (time-shared tunnel, see above)
        t0 = time.perf_counter()
        for a in acts[1:]:
            estates = step_j(estates, a)
        np.asarray(estates.ply)
        env_dt = min(env_dt, time.perf_counter() - t0)
    env_steps_per_sec = eb * (len(acts) - 1) / env_dt

    # --- standard-config search (the production 128ch/6res net) ----------
    std_batch, std_sims = 1024, 200
    net_s, vars_s = init_net(
        jax.random.key(3), channels=128, blocks=6, dtype=jnp.bfloat16
    )

    def eval_std(feats):
        logits, value = net_s.apply(vars_s, feats, train=False)
        return logits, value.squeeze(-1)

    cfg_s = MCTSConfig(num_simulations=std_sims)

    @jax.jit
    def search_std(states, rng):
        res = run_mcts(
            eval_std, states, rng, cfg_s, add_noise=True, logits_eval=True
        )
        return res.visits[0, 0]

    sstates = jax.jit(E.reset_batch, static_argnums=0)(std_batch)
    k = jax.random.key(4)
    np.asarray(search_std(sstates, k))  # compile
    std_dt = float("inf")
    for _ in range(3):  # best of 3 windows (time-shared tunnel, see above)
        t0 = time.perf_counter()
        for i in range(2):
            k, k2 = jax.random.split(k)
            r = search_std(sstates, k2)
        np.asarray(r)
        std_dt = min(std_dt, time.perf_counter() - t0)
    std_sims_per_sec = std_batch * std_sims * 2 / std_dt

    # standard-config MFU on the same measured window (network FLOPs
    # dispatched by the 128ch/6res search / chip bf16 peak)
    fwd_s = jax.jit(lambda x: net_s.apply(vars_s, x, train=False))
    cost_s = fwd_s.lower(
        jnp.zeros((std_batch, 10, 9, 15), jnp.float32)
    ).compile()
    flops_fwd_s = float(cost_s.cost_analysis()["flops"])
    standard_mfu = (
        flops_fwd_s * (std_sims + 1) * 2 / std_dt
    ) / BF16_PEAK_FLOPS

    # --- on-chip correctness guards (bounded subprocesses) ----------------
    # recorded alongside the perf numbers so a silent-miscompile regression
    # (the class PERF_NOTES 5c documents) is driver-visible per round;
    # disable with XQAZ_BENCH_GUARDS=0
    guards_ok = None
    if os.environ.get("XQAZ_BENCH_GUARDS", "1") != "0":
        runner = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "scripts", "run_guards.py",
        )
        try:
            out = subprocess.run(
                [_sys.executable, runner],
                capture_output=True, text=True, timeout=1800,
            )
            guards_ok = bool(
                json.loads(out.stdout.strip().splitlines()[-1])["ok"]
            )
        except Exception:
            guards_ok = False

    result = {
        "metric": "mcts_sims_per_sec",
        "value": round(sims_per_sec, 1),
        "unit": f"simulations/s (batch={batch} games, 64 sims/move, 64ch/3res net, 1 chip)",
        "vs_baseline": round(sims_per_sec / BASELINE_SIMS_PER_SEC, 2),
        "mfu": round(mfu, 4),
        "env_steps_per_sec": round(env_steps_per_sec, 1),
        "standard_sims_per_sec": round(std_sims_per_sec, 1),
        "standard_mfu": round(standard_mfu, 4),
        "guards_ok": guards_ok,
    }
    try:  # cache for the stale-fallback path above
        with open(last_good, "w") as f:
            json.dump({**result, "recorded_at": time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime())}, f)
    except OSError:
        pass
    print(json.dumps(result))


if __name__ == "__main__":
    main()
