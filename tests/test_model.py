"""Model parity tests: our scanned JAX model vs an equivalently-weighted
PyTorch stack (executable spec of the rnn_train.py architecture), plus
streaming-vs-batch equivalence and loss behavior."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from percepnet_tpu import constants as C
from percepnet_tpu.models import (
    forward, forward_stream, init_model_state, init_params, param_count)
from percepnet_tpu.train.loss import percepnet_loss


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(0))


def test_param_count(params):
    # ~7.96 M params (SURVEY.md: rnn_train.py:111-121)
    n = param_count(params)
    assert 7.8e6 < n < 8.1e6


def _torch_model_from_params(p):
    """Build the reference architecture in torch and load our params into it.

    This is the executable spec: Linear/Conv1d/GRU wired per
    rnn_train.py:105-145, weights copied through the documented layout
    mapping (io/torch_import.py inverted).
    """
    import torch
    import torch.nn as nn

    class TorchPercepNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.fc = nn.Sequential(nn.Linear(70, 128), nn.ReLU())
            self.conv1 = nn.Sequential(nn.Conv1d(128, 512, 5, padding=4), nn.ReLU())
            self.conv2 = nn.Sequential(nn.Conv1d(512, 512, 3, padding=2), nn.Tanh())
            self.gru1 = nn.GRU(512, 512, batch_first=True)
            self.gru2 = nn.GRU(512, 512, batch_first=True)
            self.gru3 = nn.GRU(512, 512, batch_first=True)
            self.gru_gb = nn.GRU(512, 512, batch_first=True)
            self.gru_rb = nn.GRU(1024, 128, batch_first=True)
            self.fc_gb = nn.Sequential(nn.Linear(2560, 34), nn.Sigmoid())
            self.fc_rb = nn.Sequential(nn.Linear(128, 34), nn.Sigmoid())

        def forward(self, x):
            x = self.fc(x).permute(0, 2, 1)
            x = self.conv1(x)[:, :, :-4]
            conv = self.conv2(x)[:, :, :-2].permute(0, 2, 1)
            g1, _ = self.gru1(conv)
            g2, _ = self.gru2(g1)
            g3, _ = self.gru3(g2)
            ggb, _ = self.gru_gb(g3)
            gb = self.fc_gb(torch.cat((conv, g1, g2, g3, ggb), -1))
            grb, _ = self.gru_rb(torch.cat((g3, conv), -1))
            rb = self.fc_rb(grb)
            return gb, rb

    m = TorchPercepNet()
    sd = {}
    for name in ["fc", "fc_gb", "fc_rb"]:
        layer = getattr(p, name)
        sd[f"{name}.0.weight"] = torch.tensor(np.asarray(layer["w"]).T)
        sd[f"{name}.0.bias"] = torch.tensor(np.asarray(layer["b"]))
    for name in ["conv1", "conv2"]:
        layer = getattr(p, name)
        sd[f"{name}.0.weight"] = torch.tensor(
            np.asarray(layer["w"]).transpose(2, 1, 0))
        sd[f"{name}.0.bias"] = torch.tensor(np.asarray(layer["b"]))
    for name in ["gru1", "gru2", "gru3", "gru_gb", "gru_rb"]:
        layer = getattr(p, name)
        sd[f"{name}.weight_ih_l0"] = torch.tensor(np.asarray(layer["wi"]).T)
        sd[f"{name}.weight_hh_l0"] = torch.tensor(np.asarray(layer["wh"]).T)
        sd[f"{name}.bias_ih_l0"] = torch.tensor(np.asarray(layer["bi"]))
        sd[f"{name}.bias_hh_l0"] = torch.tensor(np.asarray(layer["bh"]))
    m.load_state_dict(sd)
    m.eval()
    return m


def test_forward_matches_torch(params):
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(1)
    x = rng.randn(2, 17, 70).astype(np.float32)
    g, r, _ = forward(params, jnp.asarray(x))
    m = _torch_model_from_params(params)
    with torch.no_grad():
        tg, tr = m(torch.tensor(x))
    # First timestep: almost no rounding accumulation -> tight
    np.testing.assert_allclose(np.asarray(g)[:, 0], tg.numpy()[:, 0], atol=5e-5)
    np.testing.assert_allclose(np.asarray(r)[:, 0], tr.numpy()[:, 0], atol=5e-5)
    # Full sequence: f32 rounding compounds through 17 steps of 5 recurrent
    # layers (per-stage diffs are ~1e-7, see history); allow 5e-4.
    np.testing.assert_allclose(np.asarray(g), tg.numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(r), tr.numpy(), atol=5e-4)


def test_streaming_matches_batch(params):
    rng = np.random.RandomState(2)
    x = rng.randn(1, 9, 70).astype(np.float32)
    g_b, r_b, _ = forward(params, jnp.asarray(x))
    st = init_model_state(1)
    gs, rs = [], []
    for t in range(9):
        g, r, st = forward_stream(params, jnp.asarray(x[:, t]), st)
        gs.append(np.asarray(g))
        rs.append(np.asarray(r))
    # per-step matmul tiling differs between T=1 and T=9 shapes; rounding
    # compounds through the recurrence exactly as in the torch comparison
    np.testing.assert_allclose(np.stack(gs, 1), np.asarray(g_b), atol=5e-4)
    np.testing.assert_allclose(np.stack(rs, 1), np.asarray(r_b), atol=5e-4)


def test_roundtrip_through_torch_import(params):
    torch = pytest.importorskip("torch")
    from percepnet_tpu.io.torch_import import params_from_state_dict
    m = _torch_model_from_params(params)
    p2 = params_from_state_dict(m.state_dict())
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_nnet_data_cpp_roundtrip(params, tmp_path):
    from percepnet_tpu.io.nnet_data import (
        emit_nnet_data_cpp, params_from_nnet_data_cpp)
    path = str(tmp_path / "nnet_data.cpp")
    emit_nnet_data_cpp(params, path)
    p2 = params_from_nnet_data_cpp(path)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_allclose(
            np.asarray(a).reshape(-1), np.asarray(b).reshape(-1), atol=0)


def test_loss_matches_reference_formula():
    rng = np.random.RandomState(3)
    out = rng.rand(2, 5, 68).astype(np.float32)
    tgt = rng.rand(2, 5, 68).astype(np.float32)
    got = float(percepnet_loss(jnp.asarray(out), jnp.asarray(tgt), grad_eps=0.0))
    g_hat, r_hat = out[..., :34], out[..., 34:]
    g, r = tgt[..., :34], tgt[..., 34:]
    dg = np.sqrt(g) - np.sqrt(g_hat)
    dr = np.sqrt(1 - r) - np.sqrt(1 - r_hat)
    want = (dg ** 2).mean() + 10 * (dg ** 4).mean() + (dr ** 2).mean()
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_loss_gradient_finite_at_zero():
    out = jnp.zeros((1, 2, 68))
    tgt = jnp.zeros((1, 2, 68))
    grads = jax.grad(lambda o: percepnet_loss(o, tgt))(out)
    assert bool(jnp.all(jnp.isfinite(grads)))


def test_bf16_serving_close_to_f32():
    """bf16 compute_dtype: runs, outputs finite/in-range, and g/r stay
    near the f32 path (bf16 recurrence drift is bounded over short
    sequences; the end-to-end quality gate lives in tools/quality_gate.py)."""
    import jax.numpy as jnp
    from percepnet_tpu.models import percepnet as M
    params = M.init_params(jax.random.PRNGKey(3))
    feats = jax.random.uniform(jax.random.PRNGKey(4), (2, 50, 70)) * 2.0
    g32, r32, _ = M.forward(params, feats)
    g16, r16, st16 = M.forward(params, feats,
                               compute_dtype=jnp.bfloat16)
    assert g16.dtype == jnp.float32 and r16.dtype == jnp.float32
    assert st16.h1.dtype == jnp.bfloat16
    assert np.all(np.isfinite(np.asarray(g16)))
    assert float(np.mean(np.abs(np.asarray(g16) - np.asarray(g32)))) < 0.03
    assert float(np.mean(np.abs(np.asarray(r16) - np.asarray(r32)))) < 0.03

    # streaming continuation with a bf16 state pytree
    g2, r2, st2 = M.forward(params, feats[:, :1], st16,
                            compute_dtype=jnp.bfloat16)
    assert st2.h1.dtype == jnp.bfloat16
