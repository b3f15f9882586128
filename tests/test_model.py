"""Model tests: shapes, param count, and numerical parity with a
reference-topology PyTorch net through the weight importer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xiangqi_alphazero_tpu.models import XiangqiNet, count_parameters, init_net


def test_forward_shapes():
    net, variables = init_net(jax.random.key(0), channels=32, blocks=2)
    x = jnp.zeros((4, 10, 9, 15), jnp.float32)
    logits, value = net.apply(variables, x, train=False)
    assert logits.shape == (4, 8100)
    assert value.shape == (4, 1)
    assert float(jnp.abs(value).max()) <= 1.0


def test_train_mode_updates_batch_stats():
    net, variables = init_net(jax.random.key(0), channels=16, blocks=1)
    x = jax.random.normal(jax.random.key(1), (8, 10, 9, 15))
    (_, _), mutated = net.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    assert any(
        not np.allclose(np.asarray(b), np.asarray(a)) for b, a in zip(before, after)
    )


def test_torch_weight_import_parity():
    torch = pytest.importorskip("torch")
    import torch.nn as tnn

    channels, blocks = 16, 2

    # Reference-topology torch net (training/model.py:39-107), built here
    # independently for the parity check.
    class TBlock(tnn.Module):
        def __init__(self, c):
            super().__init__()
            self.conv1 = tnn.Conv2d(c, c, 3, padding=1, bias=False)
            self.bn1 = tnn.BatchNorm2d(c)
            self.conv2 = tnn.Conv2d(c, c, 3, padding=1, bias=False)
            self.bn2 = tnn.BatchNorm2d(c)

        def forward(self, x):
            y = torch.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return torch.relu(y + x)

    class TNet(tnn.Module):
        def __init__(self):
            super().__init__()
            self.input_conv = tnn.Sequential(
                tnn.Conv2d(15, channels, 3, padding=1, bias=False),
                tnn.BatchNorm2d(channels),
                tnn.ReLU(),
            )
            self.res_blocks = tnn.ModuleList(TBlock(channels) for _ in range(blocks))
            self.policy_head = tnn.Sequential(
                tnn.Conv2d(channels, 32, 1, bias=False),
                tnn.BatchNorm2d(32),
                tnn.ReLU(),
                tnn.Flatten(),
                tnn.Linear(32 * 90, 8100),
            )
            self.value_head = tnn.Sequential(
                tnn.Conv2d(channels, 4, 1, bias=False),
                tnn.BatchNorm2d(4),
                tnn.ReLU(),
                tnn.Flatten(),
                tnn.Linear(4 * 90, 128),
                tnn.ReLU(),
                tnn.Linear(128, 1),
                tnn.Tanh(),
            )

        def forward(self, x):
            y = self.input_conv(x)
            for b in self.res_blocks:
                y = b(y)
            return self.policy_head(y), self.value_head(y)

    torch.manual_seed(0)
    tnet = TNet().eval()
    # randomize running stats so the BN import path is actually exercised
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)

    from xiangqi_alphazero_tpu.models.torch_import import convert_state_dict

    variables = convert_state_dict(
        {k: v.numpy() for k, v in tnet.state_dict().items()}, channels, blocks
    )
    variables = jax.tree.map(jnp.asarray, variables)
    net = XiangqiNet(channels=channels, blocks=blocks)

    x = np.random.default_rng(0).standard_normal((3, 15, 10, 9)).astype(np.float32)
    with torch.no_grad():
        t_logits, t_value = tnet(torch.from_numpy(x))
    j_logits, j_value = net.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))

    np.testing.assert_allclose(
        np.asarray(j_logits), t_logits.numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(j_value), t_value.numpy(), rtol=1e-4, atol=1e-4
    )


def test_param_count_formula():
    _, variables = init_net(jax.random.key(0), channels=32, blocks=2)
    n = count_parameters(variables["params"])
    assert n > 100_000  # sanity: dense policy head dominates (2880*8100)
