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


def test_onnx_forward_matches(tmp_path, small_model):
    """The ONNX leg always executes: torch.onnx + onnxruntime when those
    packages exist, else the onnx_lite protobuf writer + numpy walker."""
    params, stats = small_model
    path = str(tmp_path / "m.onnx")
    export_onnx(path, params, stats, MC)
    diffs = verify_export("onnx", path, params, stats, MC)
    assert diffs["max_abs_dlogits"] < 2e-3


def test_onnx_lite_walker_matches_torch_forward(tmp_path, small_model):
    """Writer + walker vs the torch net on the same weights: three
    implementations (JAX, torch, onnx_lite) of one graph must agree."""
    import torch

    from xiangqi_alphazero_tpu.serve import onnx_lite
    from xiangqi_alphazero_tpu.serve.export import (
        build_torch_net,
        to_torch_state_dict,
    )

    params, stats = small_model
    sd = to_torch_state_dict(params, stats, MC["num_res_blocks"])
    np_sd = {k: v.numpy() for k, v in sd.items() if "num_batches" not in k}
    path = str(tmp_path / "m.onnx")
    onnx_lite.write_model(
        path, np_sd, MC["num_channels"], MC["num_res_blocks"]
    )
    x = np.random.default_rng(3).standard_normal((4, 15, 10, 9))
    x = x.astype(np.float32)
    out = onnx_lite.run_file(path, {"state": x})
    net = build_torch_net(MC["num_channels"], MC["num_res_blocks"])
    net.load_state_dict(sd)
    net.eval()
    with torch.no_grad():
        pol, val = net(torch.from_numpy(x))
    assert np.abs(out["policy"] - pol.numpy()).max() < 1e-4
    assert np.abs(out["value"] - val.numpy()).max() < 1e-5


def test_onnx_lite_graph_structure(tmp_path, small_model):
    """The emitted protobuf parses back with the expected graph shape."""
    from xiangqi_alphazero_tpu.serve import onnx_lite
    from xiangqi_alphazero_tpu.serve.export import to_torch_state_dict

    params, stats = small_model
    sd = to_torch_state_dict(params, stats, MC["num_res_blocks"])
    np_sd = {k: v.numpy() for k, v in sd.items() if "num_batches" not in k}
    path = str(tmp_path / "m.onnx")
    onnx_lite.write_model(
        path, np_sd, MC["num_channels"], MC["num_res_blocks"]
    )
    g = onnx_lite.load_model(path)
    assert g["inputs"] == ["state"]
    assert g["outputs"] == ["policy", "value"]
    ops = [n["op"] for n in g["nodes"]]
    # 2 res blocks: trunk conv+bn+relu, per block 2x(conv+bn)+add+2 relu,
    # heads: 2 conv+bn+relu, 2 flatten, 3 gemm, 1 extra relu, tanh
    assert ops.count("Conv") == 1 + 2 * MC["num_res_blocks"] + 2
    assert ops.count("BatchNormalization") == ops.count("Conv")
    assert ops.count("Add") == MC["num_res_blocks"]
    assert ops.count("Gemm") == 3 and ops.count("Tanh") == 1
    # every initializer round-trips exactly
    for k, v in np_sd.items():
        assert np.array_equal(g["initializers"][k], v), k


def test_onnx_verify_catches_corruption(tmp_path, small_model):
    from xiangqi_alphazero_tpu.serve import onnx_lite
    from xiangqi_alphazero_tpu.serve.export import to_torch_state_dict

    params, stats = small_model
    sd = to_torch_state_dict(params, stats, MC["num_res_blocks"])
    np_sd = {k: v.numpy() for k, v in sd.items() if "num_batches" not in k}
    np_sd["policy_head.4.bias"] = np_sd["policy_head.4.bias"] + 1.0
    path = str(tmp_path / "bad.onnx")
    onnx_lite.write_model(
        path, np_sd, MC["num_channels"], MC["num_res_blocks"]
    )
    with pytest.raises(AssertionError):
        verify_export("onnx", path, params, stats, MC)


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
