"""Import reference PyTorch checkpoints into flax parameter pytrees.

Layout mapping (reference: training/model.py — NCHW torch, vs our NHWC flax):
- Conv2d weight [out, in, kh, kw]  ->  flax Conv kernel [kh, kw, in, out]
- BatchNorm weight/bias -> scale/bias; running_mean/var -> batch_stats
- Linear after Flatten: torch flattens NCHW (C, H, W); flax flattens NHWC
  (H, W, C) — the dense kernel's input dim must be permuted accordingly.

Lets users of the reference bring trained checkpoints across, and powers the
numerical-parity test (same weights -> same logits within fp tolerance).
"""

from __future__ import annotations

import numpy as np


def _conv(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _dense_after_flatten(w, c: int, h: int = 10, wd: int = 9) -> np.ndarray:
    """torch Linear weight [out, c*h*w] -> flax Dense kernel [h*w*c, out]."""
    w = np.asarray(w)  # [out, c*h*w]
    out = w.shape[0]
    w = w.reshape(out, c, h, wd).transpose(2, 3, 1, 0).reshape(h * wd * c, out)
    return w


def convert_state_dict(sd: dict, channels: int, blocks: int) -> dict:
    """Reference XiangqiNet state_dict -> flax variables dict.

    Reference module paths (training/model.py:55-85): input_conv.{0,1},
    res_blocks.{i}.{conv1,bn1,conv2,bn2}, policy_head.{0,1,4},
    value_head.{0,1,4,6}.
    """
    g = lambda k: np.asarray(sd[k])  # noqa: E731

    params: dict = {}
    stats: dict = {}

    def bn(dst: str, src: str) -> None:
        params[dst] = {"scale": g(f"{src}.weight"), "bias": g(f"{src}.bias")}
        stats[dst] = {
            "mean": g(f"{src}.running_mean"),
            "var": g(f"{src}.running_var"),
        }

    params["Conv_0"] = {"kernel": _conv(g("input_conv.0.weight"))}
    bn("BatchNorm_0", "input_conv.1")

    for i in range(blocks):
        blk_p: dict = {}
        blk_s: dict = {}
        blk_p["Conv_0"] = {"kernel": _conv(g(f"res_blocks.{i}.conv1.weight"))}
        blk_p["Conv_1"] = {"kernel": _conv(g(f"res_blocks.{i}.conv2.weight"))}
        for j, bn_name in enumerate(("bn1", "bn2")):
            blk_p[f"BatchNorm_{j}"] = {
                "scale": g(f"res_blocks.{i}.{bn_name}.weight"),
                "bias": g(f"res_blocks.{i}.{bn_name}.bias"),
            }
            blk_s[f"BatchNorm_{j}"] = {
                "mean": g(f"res_blocks.{i}.{bn_name}.running_mean"),
                "var": g(f"res_blocks.{i}.{bn_name}.running_var"),
            }
        params[f"ResBlock_{i}"] = blk_p
        stats[f"ResBlock_{i}"] = blk_s

    params["Conv_1"] = {"kernel": _conv(g("policy_head.0.weight"))}
    bn("BatchNorm_1", "policy_head.1")
    params["Dense_0"] = {
        "kernel": _dense_after_flatten(g("policy_head.4.weight"), 32),
        "bias": g("policy_head.4.bias"),
    }

    params["Conv_2"] = {"kernel": _conv(g("value_head.0.weight"))}
    bn("BatchNorm_2", "value_head.1")
    params["Dense_1"] = {
        "kernel": _dense_after_flatten(g("value_head.4.weight"), 4),
        "bias": g("value_head.4.bias"),
    }
    params["Dense_2"] = {
        "kernel": np.asarray(sd["value_head.6.weight"]).T,
        "bias": g("value_head.6.bias"),
    }

    return {"params": params, "batch_stats": stats}
