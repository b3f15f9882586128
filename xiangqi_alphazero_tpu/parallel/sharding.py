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
