"""Device mesh / pjit utilities: the distributed backend.

Replaces the reference's entire IPC stack — spawn process pools, Unix-socket
pickle RPC and temp-file weight hand-off (reference:
training/parallel_selfplay.py:337-474, training/inference_server.py) — with
SPMD JAX over a device mesh:

- self-play/search: the game batch is sharded over the 'data' mesh axis;
  every env step, legal-mask computation and network call runs on all chips
  with zero explicit communication (purely batch-parallel);
- learner: data-parallel train step — batch sharded, params replicated;
  XLA inserts the gradient all-reduce over ICI automatically from the
  output sharding constraint (replicated params);
- multi-host: ``distributed_init`` + ``host_local_batch`` place per-host
  env shards into one global array over DCN
  (jax.make_array_from_process_local_data).

Weight distribution is implicit: actors' params ARE the learner's params
(same replicated arrays) — the reference's stop-the-world server restart
(inference_server.py:479-496) has no analogue.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train import learner as L
from ..train.evaluate import EvalSettings, evaluate_pair
from ..train.selfplay import SelfPlaySettings, selfplay_games
from ..models import policy_logits_fn


def make_mesh(num_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(mesh.axis_names[0]))


# ------------------------------------------------------------------ learner

def make_sharded_train_step(net, tx, mesh: Mesh):
    """Data-parallel train step: batch sharded over the mesh, params/opt
    state replicated; the gradient psum is inserted by XLA (ICI)."""
    repl, data = replicated(mesh), batch_sharded(mesh)
    return jax.jit(
        functools.partial(L.train_step_impl, net, tx),
        in_shardings=(repl, repl, repl, data, data, data, data, data, data),
        out_shardings=(repl, repl, repl, repl),
        donate_argnums=(0, 2),
    )


# ---------------------------------------------------------------- self-play

def make_sharded_selfplay(net, batch: int, settings: SelfPlaySettings, mesh: Mesh):
    """Self-play with the game batch sharded over the mesh: an env/search
    fleet. Params replicated; no collectives on the hot path."""
    repl = replicated(mesh)

    def run(variables, rng):
        return selfplay_games(
            policy_logits_fn(net, variables), batch, rng, settings,
            logits_eval=True, batch_sharding=batch_sharded(mesh),
        )

    return jax.jit(run, in_shardings=(repl, repl))


def make_sharded_eval(net, batch: int, settings: EvalSettings, mesh: Mesh):
    repl = replicated(mesh)

    def run(vars_new, vars_old, rng):
        return evaluate_pair(
            policy_logits_fn(net, vars_new),
            policy_logits_fn(net, vars_old),
            batch,
            rng,
            settings,
            logits_eval=True,
            batch_sharding=batch_sharded(mesh),
        )

    return jax.jit(run, in_shardings=(repl, repl, repl))


# ---------------------------------------------------------- tensor parallel
#
# Megatron-style sharding of the network's head Dense layers over a second
# mesh axis. The policy FC (2880 -> 8100) alone holds ~80% of the standard
# net's parameters (23.3M of ~29M), so column-sharding its kernel over
# 'model' splits both the dominant weight matrix and its optimizer moments
# across chips; the value head's two Dense layers form the classic
# column-then-row pair. Everything else (conv tower, batch norms) is
# replicated. XLA/GSPMD inserts the collectives: the loss's log_softmax over
# the 8100-sharded logits axis becomes a psum over 'model', and the
# row-parallel value output psums its partial products — no hand-written
# collectives (reference has no model parallelism at all; SURVEY §2.2).

# Dimensions the TP specs shard: policy FC out (8100) and value hidden FC
# out (128) — models/resnet.py. gcd = 4, so model_parallel must be 2 or 4.
_TP_SHARDED_DIMS = (8100, 128)


def make_tp_mesh(n_model: int, num_devices: Optional[int] = None) -> Mesh:
    """2-D ('data','model') mesh: batch over 'data', heads over 'model'."""
    bad = [d for d in _TP_SHARDED_DIMS if d % n_model]
    if bad:
        raise ValueError(
            f"model_parallel={n_model} must divide the sharded head dims "
            f"{_TP_SHARDED_DIMS} (valid values: 2 or 4)"
        )
    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    n = len(devs)
    if n % n_model != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={n_model}")
    return Mesh(np.asarray(devs).reshape(n // n_model, n_model), ("data", "model"))


def _tp_spec(path) -> P:
    # XiangqiNet param naming (models/resnet.py): Dense_0 = policy logits FC,
    # Dense_1 = value hidden FC, Dense_2 = value output FC.
    keys = [str(getattr(k, "key", k)) for k in path]
    module = next((k for k in keys if k.startswith("Dense_")), None)
    leaf = keys[-1] if keys else ""
    if module in ("Dense_0", "Dense_1"):
        # column-parallel: output features sharded
        return P(None, "model") if leaf == "kernel" else P("model")
    if module == "Dense_2" and leaf == "kernel":
        # row-parallel: consumes the 'model'-sharded hidden activations
        return P("model", None)
    return P()


def tp_param_shardings(mesh: Mesh, params):
    """Pytree of NamedShardings for the net's params under head-TP."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: NamedSharding(mesh, _tp_spec(path)), params
    )


def tp_place(mesh: Mesh, params):
    """Commit a param tree to its tensor-parallel layout.

    Single-process: plain device_put. Multi-controller: device_put cannot
    build non-addressable global arrays, so each process materializes the
    host value (identical on every process by construction — same init
    seed / same restored checkpoint) and contributes its own devices'
    shards via make_array_from_callback."""
    shardings = tp_param_shardings(mesh, params)
    if jax.process_count() == 1:
        return jax.tree.map(jax.device_put, params, shardings)

    def place(x, s):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return x  # already a committed global array
        host = np.asarray(x)
        return jax.make_array_from_callback(
            host.shape, s, lambda idx, h=host: h[idx]
        )

    return jax.tree.map(place, params, shardings)


def make_tp_train_step(net, tx, mesh: Mesh):
    """Tensor+data-parallel train step on a ('data','model') mesh: batch
    sharded over 'data', head Dense params (and, by propagation, their Adam
    moments and gradients) sharded over 'model'. Constraints pin the layout
    inside the trace so callers may pass params in any placement."""
    data = NamedSharding(mesh, P("data"))

    def step(params, batch_stats, opt_state, *batch):
        shardings = tp_param_shardings(mesh, params)
        params = jax.tree.map(
            jax.lax.with_sharding_constraint, params, shardings
        )
        batch = tuple(
            jax.lax.with_sharding_constraint(x, data) for x in batch
        )
        p2, s2, o2, m = L.train_step_impl(
            net, tx, params, batch_stats, opt_state, *batch
        )
        p2 = jax.tree.map(jax.lax.with_sharding_constraint, p2, shardings)
        return p2, s2, o2, m

    return jax.jit(step, donate_argnums=(0, 2))


# --------------------------------------------------------------- multi-host

# Re-export: the REAL entry point lives in the leaf module
# xiangqi_alphazero_tpu.distributed (importing THIS module already touches
# the backend via the train/engine imports above, which is too late for
# jax.distributed.initialize — the train CLI imports the leaf directly).
from ..distributed import distributed_init  # noqa: E402, F401


def put_replicated(mesh: Mesh, tree):
    """Host values (identical on every process) -> replicated global device
    arrays. Under multi-controller jit, plain numpy/single-device inputs are
    rejected, and device_put to a non-addressable sharding is unsupported —
    so each process places the value on its OWN devices and the global
    array is assembled from the per-process local buffers (works for typed
    PRNG key arrays too)."""
    s = replicated(mesh)
    import jax.numpy as jnp

    def put(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return x  # already a global array
        bufs = [jax.device_put(x, d) for d in mesh.local_devices]
        return jax.make_array_from_single_device_arrays(jnp.shape(x), s, bufs)

    return jax.tree.map(put, tree)


def host_local_batch(mesh: Mesh, per_host_arrays):
    """Assemble per-host numpy shards into global device arrays sharded on
    the mesh's batch axis (DCN boundary between hosts, ICI within). Each
    host passes ONLY its own rows; globally the batch is the concatenation
    in process order."""
    spec = P(mesh.axis_names[0])
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), np.asarray(x)
        ),
        per_host_arrays,
    )
