"""Policy-value ResNet for Xiangqi, flax/linen, NHWC, bf16-friendly.

Same topology as the reference network (reference: training/model.py:39-107):
input conv 15->C (3x3) + BN + ReLU, C-channel residual tower xN (two 3x3
convs with BN, identity add, ReLU), policy head conv1x1->32 + BN + ReLU +
dense to 8100 logits, value head conv1x1->4 + BN + ReLU + dense 128 + ReLU +
dense 1 + tanh. Defaults C=128, N=6 (reference: model.py:48).

TPU-first choices: NHWC layout (XLA's native conv layout on TPU), optional
bfloat16 compute with float32 params and float32 head outputs, and a
``predict`` that is batch-only — single-state convenience wrappers live in
the serving layer; inside search every NN call is fused across the whole
game batch.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

ACTION_SPACE = 8100
ROWS, COLS, PLANES = 10, 9, 15


class ResBlock(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        y = nn.Conv(
            self.channels, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype
        )(x)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype,
        )(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.channels, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype
        )(y)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype,
        )(y)
        return nn.relu(y + x)


class XiangqiNet(nn.Module):
    """Policy-value net. Input NHWC float [B, 10, 9, 15]."""

    channels: int = 128
    blocks: int = 6
    dtype: Any = jnp.float32  # compute dtype; params stay float32

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False
    ) -> Tuple[jax.Array, jax.Array]:
        x = x.astype(self.dtype)
        x = nn.Conv(
            self.channels, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype,
        )(x)
        x = nn.relu(x)

        for _ in range(self.blocks):
            x = ResBlock(self.channels, dtype=self.dtype)(x, train)

        p = nn.Conv(32, (1, 1), use_bias=False, dtype=self.dtype)(x)
        p = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype,
        )(p)
        p = nn.relu(p)
        p = p.reshape(p.shape[0], -1)
        logits = nn.Dense(ACTION_SPACE, dtype=self.dtype)(p).astype(jnp.float32)

        v = nn.Conv(4, (1, 1), use_bias=False, dtype=self.dtype)(x)
        v = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype,
        )(v)
        v = nn.relu(v)
        v = v.reshape(v.shape[0], -1)
        v = nn.relu(nn.Dense(128, dtype=self.dtype)(v))
        value = jnp.tanh(nn.Dense(1, dtype=self.dtype)(v)).astype(jnp.float32)
        return logits, value


def init_net(
    rng: jax.Array, channels: int = 128, blocks: int = 6, dtype: Any = jnp.float32
):
    """Returns (net, variables) with variables = {'params', 'batch_stats'}."""
    net = XiangqiNet(channels=channels, blocks=blocks, dtype=dtype)
    dummy = jnp.zeros((1, ROWS, COLS, PLANES), jnp.float32)
    variables = net.init(rng, dummy, train=False)
    return net, variables


def count_parameters(params) -> int:
    """Total trainable parameter count (reference: model.py:127-129)."""
    return sum(x.size for x in jax.tree.leaves(params))


def policy_value_fn(net: XiangqiNet, variables):
    """(features[B,10,9,15]) -> (softmax policy[B,8100], value[B]) with
    ``variables`` traced (weight updates never recompile callers)."""

    def f(feats):
        logits, value = net.apply(variables, feats, train=False)
        return jax.nn.softmax(logits, axis=-1), value.squeeze(-1)

    return f


def policy_logits_fn(net: XiangqiNet, variables):
    """(features[B,10,9,15]) -> (raw logits[B,8100], value[B]) — for
    ``run_mcts(..., logits_eval=True)``, which computes the exact softmax
    values only at the legal slots instead of materializing the full
    probability tensor."""

    def f(feats):
        logits, value = net.apply(variables, feats, train=False)
        return logits, value.squeeze(-1)

    return f
