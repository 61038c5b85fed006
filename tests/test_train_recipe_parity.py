"""Training-recipe parity vs the reference rnn_train.py, using torch as the
oracle.

Builds the reference's exact training setup from its spec (architecture
rnn_train.py:105-145, CustomLoss rnn_train.py:153-176, Adam lr=1e-4
rnn_train.py:576) in PyTorch, copies the SAME initial weights into our JAX
model via io.torch_import, steps both on the SAME golden-record batches, and
compares the loss trajectories.  This is the "reproduce rnn_train.py
training loss" gate of the north star.

f32 note: forward losses match to ~1e-6 at step 0; optimizer updates
amplify framework rounding differences over steps, so later steps are
compared relatively.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

from percepnet_tpu.io.torch_import import params_from_state_dict  # noqa: E402
from percepnet_tpu.train import datasets, state as ts  # noqa: E402

SEQ, STEPS = 100, 8


class TorchPercepNet(torch.nn.Module):
    """The reference architecture (rnn_train.py:105-145), rebuilt from spec."""

    def __init__(self):
        super().__init__()
        # Sequential wrappers match the reference state_dict key layout
        # ("fc.0.weight", ...), which io.torch_import expects.
        self.fc = torch.nn.Sequential(torch.nn.Linear(70, 128))
        self.conv1 = torch.nn.Sequential(torch.nn.Conv1d(128, 512, 5,
                                                         padding=4))
        self.conv2 = torch.nn.Sequential(torch.nn.Conv1d(512, 512, 3,
                                                         padding=2))
        self.gru1 = torch.nn.GRU(512, 512, batch_first=True)
        self.gru2 = torch.nn.GRU(512, 512, batch_first=True)
        self.gru3 = torch.nn.GRU(512, 512, batch_first=True)
        self.gru_gb = torch.nn.GRU(512, 512, batch_first=True)
        self.gru_rb = torch.nn.GRU(1024, 128, batch_first=True)
        self.fc_gb = torch.nn.Sequential(torch.nn.Linear(2560, 34))
        self.fc_rb = torch.nn.Sequential(torch.nn.Linear(128, 34))

    def forward(self, x):
        x = torch.relu(self.fc(x))
        x = x.permute(0, 2, 1)
        # causal convs: left-pad by k-1, trim the right overhang
        x = torch.relu(self.conv1(x)[:, :, : x.shape[2]])
        conv_out = torch.tanh(self.conv2(x)[:, :, : x.shape[2]])
        c = conv_out.permute(0, 2, 1)
        g1, _ = self.gru1(c)
        g2, _ = self.gru2(g1)
        g3, _ = self.gru3(g2)
        gb, _ = self.gru_gb(g3)
        rb, _ = self.gru_rb(torch.cat([g3, c], -1))
        gains = torch.sigmoid(self.fc_gb(torch.cat([c, g1, g2, g3, gb], -1)))
        strengths = torch.sigmoid(self.fc_rb(rb))
        return torch.cat([gains, strengths], -1)


def torch_loss(out, tgt, eps=1e-10):
    """CustomLoss (rnn_train.py:153-176) with the same grad_eps guard."""
    g_hat, r_hat = out[..., :34], out[..., 34:]
    g, r = tgt[..., :34], tgt[..., 34:]
    dg = torch.sqrt(g + eps) - torch.sqrt(g_hat + eps)
    dr = torch.sqrt(1 - r + eps) - torch.sqrt(1 - r_hat + eps)
    return (dg * dg).mean() + 10.0 * (dg ** 4).mean() + (dr * dr).mean()


@pytest.fixture(scope="module")
def batches(featgen_goldens):
    rec = featgen_goldens["records"].astype(np.float32).copy()
    rec[:, :68] *= 30.0
    rec[:, 70:] = np.clip(rec[:, 70:], 0.0, 1.0)
    x, y = datasets.split_xy(rec[None])
    return [(x[:, i * SEQ : (i + 1) * SEQ], y[:, i * SEQ : (i + 1) * SEQ])
            for i in [0, 1]] * (STEPS // 2)


def test_loss_curve_matches_torch_recipe(batches):
    torch.manual_seed(0)
    tm = TorchPercepNet()
    opt = torch.optim.Adam(tm.parameters(), lr=1e-4)

    params = params_from_state_dict(tm.state_dict())
    tx = ts.make_optimizer(1e-4)
    state = ts.TrainState(params, tx.init(params),
                          jax.numpy.asarray(0, jax.numpy.int32))
    step, _ = ts.make_jitted_steps(tx)

    torch_losses, jax_losses = [], []
    for x, y in batches:
        out = tm(torch.from_numpy(np.asarray(x)))
        tl = torch_loss(out, torch.from_numpy(np.asarray(y)))
        opt.zero_grad()
        tl.backward()
        opt.step()
        torch_losses.append(float(tl))

        state, jl = step(state, x, y)
        jax_losses.append(float(jl))

    torch_losses = np.array(torch_losses)
    jax_losses = np.array(jax_losses)
    # Identical initial weights, but the GRU recurrence amplifies f32
    # reassociation between frameworks to ~1e-3 in g/r by frame ~20 (same
    # saturated drift measured vs the C runtime — see test_nn_parity), so
    # the loss agrees to ~2e-3 rather than 1e-6.
    rel = np.abs(torch_losses - jax_losses) / torch_losses
    assert rel[0] < 2e-3, f"initial loss mismatch: {rel[0]}"
    # trajectories track each other as both optimize
    assert rel.max() < 2e-2, f"loss curves diverged: {rel}"
    # and training actually learns
    assert jax_losses[-1] < jax_losses[0]
