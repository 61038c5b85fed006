"""Training subsystem tests: loss golden, step math, sharding, checkpoint.

Runs on the 8-device virtual CPU mesh from conftest.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from percepnet_tpu.parallel import mesh as pm
from percepnet_tpu.train import checkpoint as ckpt
from percepnet_tpu.train import datasets, state as ts
from percepnet_tpu.models import percepnet
from percepnet_tpu.train.loss import percepnet_loss


def test_loss_matches_reference_formula():
    """Value parity with CustomLoss (rnn_train.py:153-176) at grad_eps=0."""
    rng = np.random.default_rng(0)
    out = rng.uniform(0.01, 0.99, (4, 7, 68)).astype(np.float32)
    tgt = rng.uniform(0.01, 0.99, (4, 7, 68)).astype(np.float32)
    g_hat, r_hat = out[..., :34], out[..., 34:]
    g, r = tgt[..., :34], tgt[..., 34:]
    dg = np.sqrt(g) - np.sqrt(g_hat)
    dr = np.sqrt(1 - r) - np.sqrt(1 - r_hat)
    want = (dg ** 2).mean() + 10.0 * (dg ** 4).mean() + (dr ** 2).mean()
    got = percepnet_loss(jnp.asarray(out), jnp.asarray(tgt), grad_eps=0.0)
    assert abs(float(got) - want) < 1e-6

    # optional linear-domain gain term: exact additive delta, and the
    # default (0.0) stays reference-faithful
    lin = ((g - g_hat) ** 2).mean()
    got_w = percepnet_loss(jnp.asarray(out), jnp.asarray(tgt), grad_eps=0.0,
                           gain_mse_weight=0.5)
    assert abs(float(got_w) - (want + 0.5 * lin)) < 1e-6


@pytest.fixture(scope="module")
def tiny_batch():
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (8, 6, 70)).astype(np.float32)
    y = rng.uniform(0.05, 0.95, (8, 6, 68)).astype(np.float32)
    return x, y


def test_train_step_decreases_loss(tiny_batch):
    x, y = tiny_batch
    tx = ts.make_optimizer(1e-3)
    state = ts.init_train_state(jax.random.PRNGKey(0), tx)
    step, ev = ts.make_jitted_steps(tx)
    first = float(ev(state, x, y))
    for _ in range(5):
        state, loss = step(state, x, y)
    assert float(ev(state, x, y)) < first
    assert int(state.step) == 5


def test_sharded_step_matches_single_device(tiny_batch):
    """DP over the 8-device mesh must be numerically equivalent."""
    x, y = tiny_batch
    tx = ts.make_optimizer(1e-4)

    s1 = ts.init_train_state(jax.random.PRNGKey(0), tx)
    step1, _ = ts.make_jitted_steps(tx)
    s1, loss1 = step1(s1, x, y)

    mesh = pm.make_mesh()
    s8 = pm.replicate(mesh, ts.init_train_state(jax.random.PRNGKey(0), tx))
    step8, _ = ts.make_jitted_steps(tx, mesh)
    xs, ys = pm.shard_batch(mesh, (x, y))
    s8, loss8 = step8(s8, xs, ys)

    assert np.isclose(float(loss1), float(loss8), atol=1e-6)
    a = jax.device_get(s1.params.fc["w"])
    b = jax.device_get(s8.params.fc["w"])
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_checkpoint_roundtrip(tmp_path, tiny_batch):
    x, y = tiny_batch
    tx = ts.make_optimizer(1e-4)
    state = ts.init_train_state(jax.random.PRNGKey(2), tx)
    step, ev = ts.make_jitted_steps(tx)
    state, _ = step(state, x, y)

    path = str(tmp_path / "checkpoint-1.npz")
    ckpt.save_checkpoint(path, jax.device_get(state))
    template = ts.init_train_state(jax.random.PRNGKey(3), tx)
    restored = ckpt.load_checkpoint(path, template)

    assert int(restored.step) == 1
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert ckpt.latest_checkpoint(str(tmp_path)) == path


def test_record_dataset_roundtrip(tmp_path):
    """RecordListDataset applies the x30 quirk and chunks correctly."""
    rng = np.random.default_rng(3)
    rec = rng.uniform(0, 1, (25, 138)).astype(np.float32)
    p = tmp_path / "a.out"
    rec.tofile(p)
    dset = datasets.RecordListDataset([str(p)], seq_len=10)
    assert len(dset) == 2
    got = dset[0]
    np.testing.assert_allclose(got[:, :68], rec[:10, :68] * 30.0, rtol=1e-6)
    np.testing.assert_allclose(got[:, 68:], rec[:10, 68:], rtol=1e-6)
    x, yv = datasets.split_xy(got[None])
    assert x.shape == (1, 10, 70) and yv.shape == (1, 10, 68)


def test_batch_iterator_shards():
    class Rng:
        def __len__(self):
            return 10
        def __getitem__(self, i):
            return np.full((3, 138), i, np.float32)
    it = datasets.batch_iterator(Rng(), 4, seed=0, epochs=2)
    batches = list(it)
    assert len(batches) == 4  # 2 epochs x floor(10/4)
    assert batches[0].shape == (4, 3, 138)


def test_trainer_loop_and_observability(tmp_path):
    """Trainer end-to-end: intervals, history.jsonl, checkpoint, resume."""
    from percepnet_tpu.train.trainer import Trainer, TrainConfig

    rng = np.random.default_rng(7)
    rec = rng.uniform(0.05, 0.95, (2, 6, 138)).astype(np.float32)

    def it():
        while True:
            yield rec

    cfg = TrainConfig(batch_size=2, seq_len=6, train_max_steps=3,
                      log_interval_steps=1, eval_interval_steps=2,
                      save_interval_steps=2, out_dir=str(tmp_path))
    tr = Trainer(cfg, it(), dev_batches=[rec], tensorboard=False)
    tr.run()

    assert (tmp_path / "history.jsonl").exists()
    lines = (tmp_path / "history.jsonl").read_text().strip().splitlines()
    assert len(lines) >= 3  # 3 loss logs + 1 eval
    assert any("eval_loss" in ln for ln in lines)
    assert (tmp_path / "checkpoint-3.npz").exists()

    # resume picks up the newest checkpoint
    tr2 = Trainer(cfg, it(), tensorboard=False)
    assert tr2.restore()
    assert int(jax.device_get(tr2.state.step)) == 3


def test_trainer_restore_across_optimizer_layout_change(tmp_path):
    """A checkpoint whose opt_state pytree doesn't match the current
    optimizer config (e.g. saved before the apply_if_finite wrapper) must
    still restore params+step, reinitializing the optimizer state, instead
    of dying with a raw KeyError."""
    from percepnet_tpu.train import state as ts
    from percepnet_tpu.train.trainer import Trainer, TrainConfig

    rng = np.random.default_rng(9)
    rec = rng.uniform(0.05, 0.95, (2, 6, 138)).astype(np.float32)

    def it():
        while True:
            yield rec

    # save a checkpoint under a DIFFERENT opt_state layout (no
    # apply_if_finite wrapper -> no notfinite_count keys)
    tx_old = ts.make_optimizer(1e-4, skip_nonfinite=False)
    old = ts.init_train_state(jax.random.PRNGKey(0), tx_old)
    old = old._replace(step=jnp.asarray(7, jnp.int32))
    ckpt.save_checkpoint(str(tmp_path / "checkpoint-7.npz"),
                         jax.device_get(old))

    cfg = TrainConfig(batch_size=2, seq_len=6, train_max_steps=8,
                      log_interval_steps=100, eval_interval_steps=100,
                      save_interval_steps=100, out_dir=str(tmp_path))
    tr = Trainer(cfg, it(), tensorboard=False)
    assert tr.restore()
    assert int(jax.device_get(tr.state.step)) == 7
    for a, b in zip(jax.tree.leaves(jax.device_get(tr.state.params)),
                    jax.tree.leaves(jax.device_get(old.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    tr.run()  # training continues from step 7
    assert int(jax.device_get(tr.state.step)) == 8


def test_h5_datasets(tmp_path):
    """H5Dataset (window slicing, no x30 — the reference quirk) and
    H5DirDataset."""
    h5py = pytest.importorskip("h5py")
    rng = np.random.default_rng(11)
    data = rng.uniform(0, 1, (23, 138)).astype(np.float32)
    p = tmp_path / "data.h5"
    with h5py.File(p, "w") as f:
        f.create_dataset("data", data=data)

    dset = datasets.H5Dataset(str(p), window_size=10)
    assert len(dset) == 2
    np.testing.assert_allclose(dset[1], data[10:20])  # NO x30

    d2 = tmp_path / "dir"
    d2.mkdir()
    for i in range(3):
        with h5py.File(d2 / f"u{i}.h5", "w") as f:
            f.create_dataset("data", data=np.full((4, 138), i, np.float32))
    dd = datasets.H5DirDataset(str(d2))
    assert len(dd) == 3
    assert float(dd[2][0, 0]) == 2.0


def test_trainer_preemption_checkpoint(tmp_path):
    """SIGTERM mid-run checkpoints at the step boundary; resume continues."""
    import os
    import signal

    from percepnet_tpu.train.trainer import Trainer, TrainConfig

    rng = np.random.default_rng(8)
    rec = rng.uniform(0.05, 0.95, (2, 6, 138)).astype(np.float32)
    fired = {"done": False}

    def it():
        while True:
            if not fired["done"]:
                fired["done"] = True
                os.kill(os.getpid(), signal.SIGTERM)
            yield rec

    cfg = TrainConfig(batch_size=2, seq_len=6, train_max_steps=50,
                      log_interval_steps=100, eval_interval_steps=100,
                      save_interval_steps=100, out_dir=str(tmp_path))
    tr = Trainer(cfg, it(), tensorboard=False)
    tr.run()  # should stop early via the signal, not run 50 steps

    step = int(jax.device_get(tr.state.step))
    assert 1 <= step < 50
    assert (tmp_path / f"checkpoint-{step}.npz").exists()

    tr2 = Trainer(cfg, it(), tensorboard=False)
    assert tr2.restore()
    assert int(jax.device_get(tr2.state.step)) == step


def test_device_resident_mode_matches_loader_mode(tmp_path):
    """Device-resident corpus (index-only steps) must reproduce the
    host-batch path exactly: index_iterator shares batch_iterator's
    seeded stream, and the on-device gather feeds identical batches."""
    from percepnet_tpu.train import datasets
    from percepnet_tpu.train.trainer import Trainer, TrainConfig

    rng = np.random.default_rng(11)
    recs = rng.uniform(0.05, 0.95, (6, 5, 138)).astype(np.float32)

    class ArrayDataset:
        def __len__(self):
            return len(recs)
        def __getitem__(self, i):
            return recs[i]

    ds = ArrayDataset()
    kw = dict(batch_size=2, seq_len=5, train_max_steps=4,
              log_interval_steps=100, eval_interval_steps=100,
              save_interval_steps=100)

    cfg_a = TrainConfig(out_dir=str(tmp_path / "a"), **kw)
    tr_a = Trainer(cfg_a, datasets.batch_iterator(ds, 2, seed=3),
                   tensorboard=False)
    tr_a.run()

    cfg_b = TrainConfig(out_dir=str(tmp_path / "b"), **kw)
    tr_b = Trainer(cfg_b, datasets.index_iterator(len(ds), 2, seed=3),
                   tensorboard=False,
                   device_data=datasets.load_all_chunks(ds))
    tr_b.run()

    pa = jax.device_get(tr_a.state.params)
    pb = jax.device_get(tr_b.state.params)
    for a, b in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_iterators_raise_instead_of_hanging_on_tiny_dataset():
    """An infinite iterator over fewer chunks than batch_size would never
    yield (next() hangs); it must raise at construction instead."""
    import pytest
    from percepnet_tpu.train import datasets

    class Tiny:
        def __len__(self):
            return 2
        def __getitem__(self, i):
            return np.zeros((4, 138), np.float32)

    with pytest.raises(ValueError, match="never yield"):
        next(datasets.batch_iterator(Tiny(), 8))
    with pytest.raises(ValueError, match="never yield"):
        next(datasets.index_iterator(2, 8))
    # finite-epoch iterators may legitimately yield nothing
    assert list(datasets.batch_iterator(Tiny(), 8, epochs=1)) == []


def test_remat_gradients_match_no_remat():
    """jax.checkpoint on the GRU scan must not change loss or gradients
    (it only changes what backward stores vs recomputes)."""
    import jax.numpy as jnp
    from percepnet_tpu.models import percepnet as M
    from percepnet_tpu.train.loss import percepnet_loss

    params = M.init_params(jax.random.PRNGKey(5))
    x = jax.random.uniform(jax.random.PRNGKey(6), (2, 12, 70))
    y = jax.random.uniform(jax.random.PRNGKey(7), (2, 12, 68)) * 0.9

    def loss(p, remat):
        g, r, _ = M.forward(p, x, remat=remat)
        return percepnet_loss(jnp.concatenate([g, r], -1), y)

    l0, g0 = jax.value_and_grad(lambda p: loss(p, False))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(p, True))(params)
    assert abs(float(l0) - float(l1)) < 1e-7
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_log1p_unsaturates_input_stack():
    """Features at raw featgen scale (energies ~1e8) saturate conv2's tanh:
    fc/conv1/conv2 get EXACTLY zero gradient (the reference recipe's
    pathology, shared by rnn_train.py).  log1p_features restores flow."""
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 3e8, (2, 8, 70)).astype(np.float32)
    x[..., 68:] = rng.uniform(0, 1, (2, 8, 2))
    y = rng.uniform(0.05, 0.95, (2, 8, 68)).astype(np.float32)
    params = percepnet.init_params(jax.random.PRNGKey(0))

    def stack_grad(log1p):
        g = jax.grad(ts.loss_fn)(params, jnp.asarray(x), jnp.asarray(y),
                                 0.0, log1p)
        leaves = jax.tree.leaves((g.fc, g.conv1, g.conv2))
        return max(float(jnp.abs(v).max()) for v in leaves)

    assert stack_grad(False) == 0.0
    assert stack_grad(True) > 0.0
