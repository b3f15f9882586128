"""Model export (reference: training/export_model.py).

The reference exports ONNX (opset 13, dynamic batch, inputs 'state',
outputs 'policy'/'value') and TorchScript. TPU-native equivalents:

- ``export_npz``: portable numpy archive of params + batch stats + a JSON
  architecture manifest — the framework's stable serialized format, loadable
  anywhere without JAX.
- ``export_torch_state_dict``: reverse of models/torch_import.py — writes a
  ``.pt`` checkpoint in the REFERENCE's own layout, so reference users can
  run their existing export_model.py (ONNX / TorchScript), demo apps, and
  evaluation tooling on models trained here.
- ``export_onnx``: ONNX export — via torch.onnx when the ``onnx`` package
  is present, else the dependency-free protobuf writer in ``onnx_lite``
  (same opset-13 graph). Verification likewise runs under onnxruntime when
  available, else the onnx_lite numpy walker — the ONNX leg always
  executes (reference: export_model.py:57-67).
"""

from __future__ import annotations

import json
import os
from typing import Dict

import jax
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def export_npz(path: str, params, batch_stats, model_config: Dict) -> str:
    """Portable archive: flattened arrays + architecture manifest."""
    arrays = {f"params/{k}": v for k, v in _flatten(params).items()}
    arrays.update(
        {f"batch_stats/{k}": v for k, v in _flatten(batch_stats).items()}
    )
    np.savez_compressed(path, **arrays)
    manifest = {
        "format": "xiangqi_alphazero_tpu.npz.v1",
        "model": model_config,
        "arrays": sorted(arrays),
        "input": {"name": "state", "shape": [None, 10, 9, 15], "layout": "NHWC"},
        "outputs": [
            {"name": "policy", "shape": [None, 8100]},
            {"name": "value", "shape": [None, 1]},
        ],
    }
    mpath = os.path.splitext(path)[0] + ".manifest.json"
    with open(mpath, "w") as f:
        json.dump(manifest, f, indent=2)
    return path


def to_torch_state_dict(params, batch_stats, blocks: int) -> Dict[str, "object"]:
    """flax variables -> reference-layout torch state_dict
    (inverse of models/torch_import.convert_state_dict)."""
    import torch

    p = jax.tree.map(np.asarray, params)
    s = jax.tree.map(np.asarray, batch_stats)
    sd: Dict[str, object] = {}

    def conv(dst, kernel):
        sd[f"{dst}.weight"] = torch.from_numpy(
            np.ascontiguousarray(np.copy(np.transpose(kernel, (3, 2, 0, 1))))
        )

    def bn(dst, pp, ss):
        sd[f"{dst}.weight"] = torch.from_numpy(np.copy(pp["scale"]))
        sd[f"{dst}.bias"] = torch.from_numpy(np.copy(pp["bias"]))
        sd[f"{dst}.running_mean"] = torch.from_numpy(np.copy(ss["mean"]))
        sd[f"{dst}.running_var"] = torch.from_numpy(np.copy(ss["var"]))
        sd[f"{dst}.num_batches_tracked"] = torch.zeros((), dtype=torch.long)

    def dense_pre_flatten(dst, kernel, bias, c, h=10, w=9):
        k = kernel.reshape(h, w, c, -1).transpose(3, 2, 0, 1).reshape(-1, c * h * w)
        sd[f"{dst}.weight"] = torch.from_numpy(np.ascontiguousarray(np.copy(k)))
        sd[f"{dst}.bias"] = torch.from_numpy(np.copy(bias))

    conv("input_conv.0", p["Conv_0"]["kernel"])
    bn("input_conv.1", p["BatchNorm_0"], s["BatchNorm_0"])
    for i in range(blocks):
        bp, bs = p[f"ResBlock_{i}"], s[f"ResBlock_{i}"]
        conv(f"res_blocks.{i}.conv1", bp["Conv_0"]["kernel"])
        conv(f"res_blocks.{i}.conv2", bp["Conv_1"]["kernel"])
        bn(f"res_blocks.{i}.bn1", bp["BatchNorm_0"], bs["BatchNorm_0"])
        bn(f"res_blocks.{i}.bn2", bp["BatchNorm_1"], bs["BatchNorm_1"])
    conv("policy_head.0", p["Conv_1"]["kernel"])
    bn("policy_head.1", p["BatchNorm_1"], s["BatchNorm_1"])
    dense_pre_flatten(
        "policy_head.4", p["Dense_0"]["kernel"], p["Dense_0"]["bias"], 32
    )
    conv("value_head.0", p["Conv_2"]["kernel"])
    bn("value_head.1", p["BatchNorm_2"], s["BatchNorm_2"])
    dense_pre_flatten(
        "value_head.4", p["Dense_1"]["kernel"], p["Dense_1"]["bias"], 4
    )
    sd["value_head.6.weight"] = torch.from_numpy(
        np.ascontiguousarray(np.copy(p["Dense_2"]["kernel"].T))
    )
    sd["value_head.6.bias"] = torch.from_numpy(np.copy(p["Dense_2"]["bias"]))
    return sd


def export_torch_checkpoint(
    path: str, params, batch_stats, model_config: Dict, iteration: int = 0
) -> str:
    """Write a reference-compatible .pt (loadable by the reference demo and
    its export_model.py for ONNX/TorchScript)."""
    import torch

    sd = to_torch_state_dict(params, batch_stats, int(model_config["num_res_blocks"]))
    torch.save(
        {
            "model_state_dict": sd,
            "config": dict(model_config),
            "iteration": iteration,
        },
        path,
    )
    return path


def build_torch_net(channels: int, blocks: int):
    """Reference-topology torch module (training/model.py:39-107), used as
    the serialization vehicle for .pt / TorchScript / ONNX export."""
    import torch
    import torch.nn as nn

    class Block(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.conv1 = nn.Conv2d(c, c, 3, padding=1, bias=False)
            self.bn1 = nn.BatchNorm2d(c)
            self.conv2 = nn.Conv2d(c, c, 3, padding=1, bias=False)
            self.bn2 = nn.BatchNorm2d(c)

        def forward(self, x):
            y = torch.relu(self.bn1(self.conv1(x)))
            return torch.relu(self.bn2(self.conv2(y)) + x)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.input_conv = nn.Sequential(
                nn.Conv2d(15, channels, 3, padding=1, bias=False),
                nn.BatchNorm2d(channels),
                nn.ReLU(),
            )
            self.res_blocks = nn.ModuleList(Block(channels) for _ in range(blocks))
            self.policy_head = nn.Sequential(
                nn.Conv2d(channels, 32, 1, bias=False),
                nn.BatchNorm2d(32),
                nn.ReLU(),
                nn.Flatten(),
                nn.Linear(32 * 90, 8100),
            )
            self.value_head = nn.Sequential(
                nn.Conv2d(channels, 4, 1, bias=False),
                nn.BatchNorm2d(4),
                nn.ReLU(),
                nn.Flatten(),
                nn.Linear(4 * 90, 128),
                nn.ReLU(),
                nn.Linear(128, 1),
                nn.Tanh(),
            )

        def forward(self, x):
            y = self.input_conv(x)
            for b in self.res_blocks:
                y = b(y)
            return self.policy_head(y), self.value_head(y)

    return Net()


def _torch_net_with_weights(params, batch_stats, model_config: Dict):
    net = build_torch_net(
        int(model_config["num_channels"]), int(model_config["num_res_blocks"])
    )
    sd = to_torch_state_dict(
        params, batch_stats, int(model_config["num_res_blocks"])
    )
    net.load_state_dict(sd)
    net.eval()
    return net


def export_torchscript(
    path: str, params, batch_stats, model_config: Dict
) -> str:
    """TorchScript trace (reference: export_model.py:71-87) with our
    weights."""
    import torch

    net = _torch_net_with_weights(params, batch_stats, model_config)
    example = torch.zeros(1, 15, 10, 9)
    traced = torch.jit.trace(net, example)
    traced.save(path)
    return path


def _jax_reference_forward(params, batch_stats, model_config: Dict, x_nchw):
    """f32 JAX forward of the SAME weights (the export ground truth).

    Pinned to HIGHEST matmul precision: on a TPU-default host (the
    serving CLI under the tunneled chip) f32 convs otherwise run as bf16
    MXU passes, and with trained weights the "ground truth" drifted ~1%
    from the true-f32 walker/onnxruntime result — max|dlogits| 1.31 on
    logits of scale ~106, failing verification of a CORRECT artifact.
    On CPU this is a no-op, so the test suite was blind to it."""
    import jax.numpy as jnp

    from ..models import XiangqiNet

    net = XiangqiNet(
        channels=int(model_config["num_channels"]),
        blocks=int(model_config["num_res_blocks"]),
        dtype=jnp.float32,
    )
    x = jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))  # NCHW -> NHWC
    with jax.default_matmul_precision("highest"):
        logits, value = jax.jit(
            lambda v, x: net.apply(v, x, train=False)
        )({"params": params, "batch_stats": batch_stats}, x)
    return np.asarray(logits), np.asarray(value).reshape(-1)


def verify_export(
    fmt: str, path: str, params, batch_stats, model_config: Dict,
    atol: float = 2e-3,
) -> Dict[str, float]:
    """Numerically verify an exported artifact against the JAX forward on
    fixed random inputs (reference: export_model.py:57-67 smoke-verifies
    its ONNX with onnxruntime). Loads the artifact BACK from disk and runs
    it; raises AssertionError on divergence. Returns the max abs diffs.

    fmt: 'torch' | 'torchscript' | 'onnx' | 'npz'. ONNX runs under
    onnxruntime when installed, else under the onnx_lite numpy walker.
    """
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 15, 10, 9)).astype(np.float32)
    want_logits, want_value = _jax_reference_forward(
        params, batch_stats, model_config, x
    )

    if fmt == "npz":
        import jax.numpy as jnp

        data = np.load(path)
        tree: Dict[str, object] = {"params": {}, "batch_stats": {}}
        for key in data.files:
            node = tree
            parts = key.split("/")
            for part in parts[:-1]:
                node = node.setdefault(part, {})
            node[parts[-1]] = jnp.asarray(data[key])
        got_logits, got_value = _jax_reference_forward(
            tree["params"], tree["batch_stats"], model_config, x
        )
    elif fmt in ("torch", "torchscript"):
        import torch

        if fmt == "torch":
            ck = torch.load(path, map_location="cpu", weights_only=True)
            net = build_torch_net(
                int(ck["config"]["num_channels"]),
                int(ck["config"]["num_res_blocks"]),
            )
            net.load_state_dict(ck["model_state_dict"])
            net.eval()
        else:
            net = torch.jit.load(path, map_location="cpu")
            net.eval()
        with torch.no_grad():
            pol, val = net(torch.from_numpy(x))
        got_logits = pol.numpy()
        got_value = val.numpy().reshape(-1)
    elif fmt == "onnx":
        try:
            import onnxruntime as ort

            sess = ort.InferenceSession(path, providers=["CPUExecutionProvider"])
            pol, val = sess.run(["policy", "value"], {"state": x})
        except ImportError:
            # onnxruntime isn't baked into this image: execute the graph
            # with the dependency-free numpy walker instead (parses the
            # protobuf and runs the node list — same artifact, independent
            # executor), so the ONNX leg is verified rather than skipped.
            from . import onnx_lite

            out = onnx_lite.run_file(path, {"state": x})
            pol, val = out["policy"], out["value"]
        got_logits, got_value = pol, np.asarray(val).reshape(-1)
    else:
        raise ValueError(f"unknown export format {fmt!r}")

    diff_logits = float(np.max(np.abs(got_logits - want_logits)))
    diff_value = float(np.max(np.abs(got_value - want_value)))
    assert diff_logits <= atol and diff_value <= atol, (
        f"{fmt} export diverges from the JAX forward: "
        f"max|dlogits|={diff_logits:.2e} max|dvalue|={diff_value:.2e}"
    )
    return {"max_abs_dlogits": diff_logits, "max_abs_dvalue": diff_value}


def export_onnx(path: str, params, batch_stats, model_config: Dict) -> str:
    """ONNX export (reference: export_model.py:35-49): opset 13, dynamic
    batch axis, input 'state', outputs 'policy'/'value'. Uses the legacy
    TorchScript exporter when the `onnx` package is present (the
    reference's own path; the torch>=2.9 dynamo default needs onnxscript);
    otherwise falls back to the dependency-free protobuf writer in
    onnx_lite, which emits the same opset-13 graph for this fixed
    topology."""
    import torch

    try:
        import onnx  # noqa: F401 - serialization backend of the exporter
    except ImportError:
        from . import onnx_lite

        sd = to_torch_state_dict(
            params, batch_stats, int(model_config["num_res_blocks"])
        )
        np_sd = {
            k: v.numpy() for k, v in sd.items() if "num_batches" not in k
        }
        return onnx_lite.write_model(
            path,
            np_sd,
            int(model_config["num_channels"]),
            int(model_config["num_res_blocks"]),
        )

    net = _torch_net_with_weights(params, batch_stats, model_config)
    example = torch.zeros(1, 15, 10, 9)
    torch.onnx.export(
        net,
        (example,),
        path,
        input_names=["state"],
        output_names=["policy", "value"],
        dynamic_axes={
            "state": {0: "batch"},
            "policy": {0: "batch"},
            "value": {0: "batch"},
        },
        opset_version=13,
        dynamo=False,
    )
    return path
