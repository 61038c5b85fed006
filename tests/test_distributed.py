"""Multi-process distributed training: 2 real jax.distributed processes.

The reference's only distribution is dead NCCL code (rnn_train.py:549-623).
Here two OS processes (2 virtual CPU devices each -> a 4-device global
mesh) run the actual training CLI with host-sharded data and gloo
cross-process collectives, and the result is checked for exact-ish
gradient equivalence against a single-process run over the identical
global batch stream.  This is the CPU stand-in for a 2-host TPU slice
(recipes/multihost_v5e16.sh); the sharding/collective layout is the same,
only ICI/DCN replaces gloo.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "distributed_worker.py")


def _make_record_files(tmp_path, n_files=4, frames=8):
    from percepnet_tpu import constants as C
    rng = np.random.default_rng(42)
    files = []
    for i in range(n_files):
        rec = rng.uniform(0.0, 0.9, (frames, C.RECORD_DIM)).astype(np.float32)
        p = tmp_path / f"rec{i}.f32"
        rec.tofile(p)
        files.append(str(p))
    return files


def test_two_process_train_matches_single_process(tmp_path):
    from percepnet_tpu.io import native

    files = _make_record_files(tmp_path)
    filelist = tmp_path / "train.lst"
    filelist.write_text("\n".join(files) + "\n")
    out_dir = tmp_path / "exp"

    seq_len, per_proc_batch, steps, seed = 8, 2, 3, 0
    port = 29531
    common = ["--train-filelist", str(filelist), "--out-dir", str(out_dir),
              "--batch-size", str(per_proc_batch), "--seq-len", str(seq_len),
              "--max-steps", str(steps), "--log-interval", "1",
              "--no-tensorboard", "--distributed",
              "--coordinator", f"localhost:{port}", "--num-processes", "2"]
    env = dict(os.environ,
               PYTHONPATH=REPO,
               XLA_FLAGS="--xla_force_host_platform_device_count=2",
               JAX_PLATFORMS="cpu")
    procs = [subprocess.Popen(
        [sys.executable, WORKER] + common + ["--process-id", str(i)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    ckpt_path = out_dir / f"checkpoint-{steps}.npz"
    assert ckpt_path.exists()

    # --- single-process reference over the SAME global batch stream ------
    # process p's loader is NativeBatchLoader(files, shard p of 2); the
    # global batch is the concat over processes (shard_batch's
    # make_array_from_process_local_data contract), so rebuild it here.
    import jax
    from percepnet_tpu.parallel import mesh as pm
    from percepnet_tpu.train import Trainer, TrainConfig

    if not native.available():
        pytest.skip("native loader unavailable; CLI used python fallback")

    loaders = [native.NativeBatchLoader(
        files, seq_len, per_proc_batch, shard_id=i, num_shards=2, seed=seed)
        for i in range(2)]

    def combined():
        while True:
            yield np.concatenate([next(loaders[0]), next(loaders[1])])

    cfg = TrainConfig(batch_size=2 * per_proc_batch, seq_len=seq_len,
                      train_max_steps=steps, save_interval_steps=steps,
                      eval_interval_steps=10**9, log_interval_steps=1,
                      seed=seed, out_dir=str(tmp_path / "exp_single"))
    mesh = pm.make_mesh(jax.devices()[:4])
    tr = Trainer(cfg, combined(), mesh=mesh, tensorboard=False)
    tr.run()
    for ld in loaders:
        ld.close()

    ref = np.load(tmp_path / "exp_single" / f"checkpoint-{steps}.npz")
    got = np.load(ckpt_path)
    assert set(ref.files) == set(got.files)
    assert int(got["step"]) == steps
    for k in ref.files:
        np.testing.assert_allclose(
            got[k], ref[k], rtol=2e-5, atol=2e-6,
            err_msg=f"mismatch in {k} between 2-process and single-process")

    # loss trajectories logged by process 0 match the single-process run
    hist = [json.loads(ln) for ln in
            (out_dir / "history.jsonl").read_text().splitlines()]
    hist_ref = [json.loads(ln) for ln in
                (tmp_path / "exp_single" / "history.jsonl")
                .read_text().splitlines()]
    losses = {r["step"]: r["loss"] for r in hist if "loss" in r}
    losses_ref = {r["step"]: r["loss"] for r in hist_ref if "loss" in r}
    assert losses.keys() == losses_ref.keys() and len(losses) == steps
    for s in losses:
        assert abs(losses[s] - losses_ref[s]) < 1e-5
