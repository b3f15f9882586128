"""Numeric export verification: each exported artifact is loaded back and
its forward compared to the JAX forward (reference: export_model.py:57-67
smoke-verifies its ONNX the same way)."""

import numpy as np
import pytest

import jax

from xiangqi_alphazero_tpu.models import init_net
from xiangqi_alphazero_tpu.serve.export import (
    export_npz,
    export_onnx,
    export_torch_checkpoint,
    export_torchscript,
    verify_export,
)

MC = {"num_channels": 16, "num_res_blocks": 2}


@pytest.fixture(scope="module")
def small_model():
    net, variables = init_net(jax.random.key(5), channels=16, blocks=2)
    return variables["params"], variables["batch_stats"]


def test_npz_roundtrip(tmp_path, small_model):
    params, stats = small_model
    path = str(tmp_path / "m.npz")
    export_npz(path, params, stats, MC)
    diffs = verify_export("npz", path, params, stats, MC, atol=1e-6)
    assert diffs["max_abs_dlogits"] == 0.0  # same arrays, same program
    assert (tmp_path / "m.manifest.json").exists()


def test_torch_checkpoint_forward_matches(tmp_path, small_model):
    params, stats = small_model
    path = str(tmp_path / "m.pt")
    export_torch_checkpoint(path, params, stats, MC)
    diffs = verify_export("torch", path, params, stats, MC)
    assert diffs["max_abs_dlogits"] < 2e-3


def test_torchscript_forward_matches(tmp_path, small_model):
    params, stats = small_model
    path = str(tmp_path / "m.ts")
    export_torchscript(path, params, stats, MC)
    diffs = verify_export("torchscript", path, params, stats, MC)
    assert diffs["max_abs_dlogits"] < 2e-3


def test_onnx_forward_matches_when_runtime_available(tmp_path, small_model):
    params, stats = small_model
    pytest.importorskip("onnx")
    path = str(tmp_path / "m.onnx")
    export_onnx(path, params, stats, MC)
    try:
        verify_export("onnx", path, params, stats, MC)
    except RuntimeError as e:
        pytest.skip(str(e))  # onnxruntime not in this image


def test_verify_catches_corruption(tmp_path, small_model):
    params, stats = small_model
    path = str(tmp_path / "bad.pt")
    import torch

    export_torch_checkpoint(path, params, stats, MC)
    ck = torch.load(path, map_location="cpu", weights_only=True)
    ck["model_state_dict"]["policy_head.4.bias"] += 1.0
    torch.save(ck, path)
    with pytest.raises(AssertionError):
        verify_export("torch", path, params, stats, MC)
