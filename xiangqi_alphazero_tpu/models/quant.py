"""w8a8 int8 inference path for the policy-value ResNet (perf spike).

Why: the self-play/eval forward runs at ~94% of the chip's bf16 matmul
peak (docs/PERF_NOTES.md round-4 trace) — the only remaining headroom on
the NN, which is 45-77% of move time, is the MXU's 2x int8 rate. This
module builds an inference-only int8 twin of ``XiangqiNet``
(reference topology: training/model.py:39-107):

- BatchNorm FOLDED into each conv (inference uses running stats, so
  conv+BN is an affine map: W' = W * gamma/sqrt(var+eps) per out-channel,
  b' = beta - gamma*mean/sqrt(var+eps)).
- Every 3x3 conv lowered to an im2col matmul ([B*90, 9*C] @ [9*C, C']):
  on a 10x9 board the patch tensor is tiny and the matmul shape is
  exactly what the MXU wants; int8 x int8 -> int32 via lax.dot_general
  ``preferred_element_type=int32`` engages the double-rate path.
- Weights: per-output-channel symmetric int8 (scale = max|W'|/127).
- Activations: dynamic per-tensor symmetric int8 (scale computed from the
  live batch max — one cheap VPU reduction per layer).
- Residual adds, ReLUs, and the value head's small denses stay f32; the
  8100-wide policy dense (80% of params) is quantized the same way.

This is an inference-only twin: training/gating keep the bf16/f32 path.
Accuracy and strength-neutrality are measured, not assumed — see
tests/test_quant.py (logit agreement + argmax agreement on random
boards) and docs/PERF_NOTES.md round-5 for the on-chip sims/s and arena
results.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

ROWS, COLS = 10, 9
_EPS = 1e-5


class QConv(NamedTuple):
    w_q: jax.Array      # int8 [K*K*Cin, Cout] (im2col layout)
    w_scale: jax.Array  # f32 [Cout]
    bias: jax.Array     # f32 [Cout] (folded BN shift)


class QDense(NamedTuple):
    w_q: jax.Array      # int8 [In, Out]
    w_scale: jax.Array  # f32 [Out]
    bias: jax.Array     # f32 [Out]


class QuantNet(NamedTuple):
    stem: QConv
    blocks: Tuple[Tuple[QConv, QConv], ...]
    policy_conv: QConv
    policy_dense: QDense
    value_conv: QConv
    value_d1: Tuple[jax.Array, jax.Array]  # f32 kernel/bias (tiny)
    value_d2: Tuple[jax.Array, jax.Array]


def _fold_bn(kernel: np.ndarray, bn_p, bn_s) -> Tuple[np.ndarray, np.ndarray]:
    """conv kernel [kh, kw, cin, cout] + BN(params, stats) ->
    (folded kernel, bias)."""
    gamma = np.asarray(bn_p["scale"], np.float32)
    beta = np.asarray(bn_p["bias"], np.float32)
    mean = np.asarray(bn_s["mean"], np.float32)
    var = np.asarray(bn_s["var"], np.float32)
    s = gamma / np.sqrt(var + _EPS)
    return np.asarray(kernel, np.float32) * s, beta - mean * s


def _quant_w(w2d: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """[In, Out] f32 -> (int8, per-out-channel scale)."""
    amax = np.abs(w2d).max(axis=0)
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(w2d / scale), -127, 127).astype(np.int8)
    return q, scale


def _qconv(kernel, bn_p, bn_s) -> QConv:
    k, b = _fold_bn(np.asarray(kernel), bn_p, bn_s)
    kh, kw, cin, cout = k.shape
    q, s = _quant_w(k.reshape(kh * kw * cin, cout))
    return QConv(jnp.asarray(q), jnp.asarray(s), jnp.asarray(b))


def quantize_net(variables) -> QuantNet:
    """Fold + quantize a trained ``{'params','batch_stats'}`` tree
    (host-side numpy; call once per weight update)."""
    p, st = variables["params"], variables["batch_stats"]
    blocks = []
    i = 0
    while f"ResBlock_{i}" in p:
        bp, bs = p[f"ResBlock_{i}"], st[f"ResBlock_{i}"]
        blocks.append((
            _qconv(bp["Conv_0"]["kernel"], bp["BatchNorm_0"], bs["BatchNorm_0"]),
            _qconv(bp["Conv_1"]["kernel"], bp["BatchNorm_1"], bs["BatchNorm_1"]),
        ))
        i += 1
    dq, ds = _quant_w(np.asarray(p["Dense_0"]["kernel"], np.float32))
    return QuantNet(
        stem=_qconv(p["Conv_0"]["kernel"], p["BatchNorm_0"], st["BatchNorm_0"]),
        blocks=tuple(blocks),
        policy_conv=_qconv(p["Conv_1"]["kernel"], p["BatchNorm_1"], st["BatchNorm_1"]),
        policy_dense=QDense(
            jnp.asarray(dq), jnp.asarray(ds),
            jnp.asarray(np.asarray(p["Dense_0"]["bias"], np.float32)),
        ),
        value_conv=_qconv(p["Conv_2"]["kernel"], p["BatchNorm_2"], st["BatchNorm_2"]),
        value_d1=(
            jnp.asarray(np.asarray(p["Dense_1"]["kernel"], np.float32)),
            jnp.asarray(np.asarray(p["Dense_1"]["bias"], np.float32)),
        ),
        value_d2=(
            jnp.asarray(np.asarray(p["Dense_2"]["kernel"], np.float32)),
            jnp.asarray(np.asarray(p["Dense_2"]["bias"], np.float32)),
        ),
    )


def _quant_act(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """f32 [M, K] -> (int8 [M, K], scale f32 [M]). Dynamic symmetric
    PER-ROW scales (per board-cell for conv patches, per sample for the
    policy dense): one VPU reduction along the contracted axis, and the
    matmul's scale correction stays rank-1 (a_scale[m] * w_scale[n]) —
    measurably tighter than one per-tensor scale (argmax agreement 50/64
    -> 64/64 on trained weights, see tests/test_quant.py)."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale[..., 0]


def _im2col(x: jax.Array) -> jax.Array:
    """[B, 10, 9, C] -> [B, 10, 9, 9C] SAME-padded 3x3 patches."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [
        xp[:, dr:dr + h, dc:dc + w, :] for dr in range(3) for dc in range(3)
    ]
    return jnp.concatenate(cols, axis=-1)


def _int8_matmul(q_x: jax.Array, qc_w: jax.Array) -> jax.Array:
    """int8 [M, K] @ int8 [K, N] -> int32 [M, N] on the MXU's 2x path."""
    return jax.lax.dot_general(
        q_x, qc_w, (((q_x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def _conv(x: jax.Array, qc: QConv, relu: bool = True,
          ksize: int = 3) -> jax.Array:
    """Quantized conv (+folded BN) on NHWC f32 input; f32 out. ``ksize``
    is STATIC (python int) — the caller knows which convs are 3x3
    (stem/tower) vs 1x1 (heads); a pytree field would become a tracer
    inside scan/while bodies."""
    b = x.shape[0]
    patches = _im2col(x) if ksize == 3 else x
    q_x, a_scale = _quant_act(patches.reshape(b * ROWS * COLS, -1))
    acc = _int8_matmul(q_x, qc.w_q)
    y = (
        acc.astype(jnp.float32)
        * a_scale[:, None] * qc.w_scale[None, :]
        + qc.bias
    )
    y = y.reshape(b, ROWS, COLS, -1)
    return jax.nn.relu(y) if relu else y


def int8_forward(qn: QuantNet, feats: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """[B, 10, 9, 15] features -> (logits[B, 8100], value[B, 1]); same
    contract as ``net.apply(variables, x, train=False)``."""
    x = _conv(feats.astype(jnp.float32), qn.stem)
    for c1, c2 in qn.blocks:
        y = _conv(x, c1)
        y = _conv(y, c2, relu=False)
        x = jax.nn.relu(y + x)

    p = _conv(x, qn.policy_conv, ksize=1)
    p = p.reshape(p.shape[0], -1)
    q_p, p_scale = _quant_act(p)
    logits = (
        _int8_matmul(q_p, qn.policy_dense.w_q).astype(jnp.float32)
        * p_scale[:, None] * qn.policy_dense.w_scale[None, :]
        + qn.policy_dense.bias
    )

    v = _conv(x, qn.value_conv, ksize=1)
    v = v.reshape(v.shape[0], -1)
    v = jax.nn.relu(v @ qn.value_d1[0] + qn.value_d1[1])
    value = jnp.tanh(v @ qn.value_d2[0] + qn.value_d2[1])
    return logits, value


def int8_logits_fn(qn: QuantNet):
    """Drop-in for ``policy_logits_fn``: (feats) -> (logits, value[B])."""

    def f(feats):
        logits, value = int8_forward(qn, feats)
        return logits, value.squeeze(-1)

    return f
