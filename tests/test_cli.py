"""Fast CLI-layer tests (no accelerator work beyond tiny shapes)."""

import numpy as np

from percepnet_tpu import constants as C


def test_split_dataset_cli(tmp_path):
    from percepnet_tpu.cli.data import split_main
    feats = tmp_path / "feats"
    feats.mkdir()
    for i in range(5):
        (feats / f"f{i}.f32").write_bytes(b"\0" * 16)
    split_main([str(feats), "--out-dir", str(tmp_path), "--frac", "0.6"])
    train = (tmp_path / "train_filelist.txt").read_text().splitlines()
    dev = (tmp_path / "dev_filelist.txt").read_text().splitlines()
    assert len(train) == 3 and len(dev) == 2
    assert not set(train) & set(dev)


def test_bin2h5_cli(tmp_path):
    import pytest
    pytest.importorskip("h5py")
    import h5py
    from percepnet_tpu.cli.data import bin2h5_main
    rec = np.arange(3 * C.RECORD_DIM, dtype=np.float32)
    src = tmp_path / "r.f32"
    rec.tofile(src)
    dst = tmp_path / "r.h5"
    bin2h5_main([str(src), str(dst)])
    with h5py.File(dst) as f:
        np.testing.assert_array_equal(np.asarray(f["data"]),
                                      rec.reshape(3, C.RECORD_DIM))


def test_evaluate_pair(tmp_path):
    from percepnet_tpu.cli.evaluate import evaluate_pair
    from percepnet_tpu.io.pcm import write_pcm16
    rng = np.random.default_rng(0)
    t = np.arange(2 * 48000) / 48000
    clean = 0.3 * np.sin(2 * np.pi * np.cumsum(200 + 50 * np.sin(2 * np.pi * t)) / 48000)
    noisy = clean + 0.05 * rng.normal(size=len(clean))
    cp, ep = str(tmp_path / "c.pcm"), str(tmp_path / "e.pcm")
    write_pcm16(cp, clean, scale=32768.0)
    write_pcm16(ep, noisy, scale=32768.0)
    m = evaluate_pair(cp, ep, align=False)
    assert 10 < m["si_sdr_db"] < 30
    assert 0 < m["stoi"] <= 1.0
    # identical files: near-perfect
    m2 = evaluate_pair(cp, cp, align=False)
    assert m2["si_sdr_db"] > 40


def test_enhance_load_params_roundtrip(tmp_path):
    import jax
    from percepnet_tpu.cli.enhance import load_params
    from percepnet_tpu.models.percepnet import init_params
    from percepnet_tpu.train.checkpoint import save_params_npz
    params = init_params(jax.random.PRNGKey(0))
    p = str(tmp_path / "w.npz")
    save_params_npz(p, params)
    loaded = load_params(p)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_enhance_load_params_from_trainstate_with_clipping(tmp_path):
    """A checkpoint trained with grad clipping has a different opt_state
    tree; loading for inference must not depend on reconstructing it."""
    import jax
    from percepnet_tpu.cli.enhance import load_params
    from percepnet_tpu.train import checkpoint as ckpt
    from percepnet_tpu.train.state import init_train_state, make_optimizer
    tx = make_optimizer(1e-4, clip_norm=5.0)  # non-default opt_state tree
    st = init_train_state(jax.random.PRNGKey(1), tx)
    p = str(tmp_path / "checkpoint-0.npz")
    ckpt.save_checkpoint(p, jax.device_get(st))
    loaded = load_params(p)
    for a, b in zip(jax.tree.leaves(st.params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_enhance_cli_dump_gr_matches_reference(tmp_path, featgen_goldens):
    """--dump-gr reproduces percepNet_run's feature_test.raw side channel
    (denoise.cpp:533-534): 34 g + 34 r float32 per input frame."""
    import os
    import numpy as np
    from percepnet_tpu.cli import enhance as cli

    nn = np.load(os.path.join(os.path.dirname(__file__), "goldens",
                              "nn.npz"))
    w = str(tmp_path / "w.npz")
    np.savez(w, **{k: nn[k] for k in nn.files if k.startswith("params/")})
    noisy = str(tmp_path / "noisy.pcm")
    featgen_goldens["noisy16"].astype("<i2").tofile(noisy)
    out = str(tmp_path / "out.pcm")
    gr_path = str(tmp_path / "feature_test.raw")
    cli.main([noisy, out, "--weights", w, "--compat",
              "--batch-frames", "200", "--dump-gr", gr_path])
    gr = np.fromfile(gr_path, "<f4").reshape(-1, 68)
    ref = nn["gr"]
    assert gr.shape == ref.shape
    np.testing.assert_allclose(gr, ref, atol=1e-5)


def test_featgen_batch_matches_single(tmp_path):
    """Batched featgen (one jitted pass over many pairs) must reproduce
    the per-pair path row for row."""
    from percepnet_tpu.cli.featgen import generate_batch, generate_pair
    rng = np.random.default_rng(12)
    count = 30
    n = count * C.FRAME_SIZE
    cleans = [(rng.normal(0, 3000, n)).astype(np.float32) for _ in range(3)]
    noisys = [c + rng.normal(0, 1000, n).astype(np.float32) for c in cleans]
    batch = generate_batch(cleans, noisys, count)
    assert batch.shape == (3, count, 138)
    for i in range(3):
        single, _ = generate_pair(cleans[i], noisys[i], count)
        np.testing.assert_allclose(batch[i], single, rtol=2e-5, atol=2e-5)


def test_evaluate_pair_aligns_lagging_output(tmp_path):
    """The enhancer's output LAGS the input by FRAME_LOOKAHEAD frames;
    alignment must drop leading samples from the ENHANCED side.  (A
    wrong-direction alignment scored a perfect-but-delayed output at
    -40 dB SI-SDR.)"""
    from percepnet_tpu.cli.evaluate import evaluate_pair
    from percepnet_tpu.io.pcm import write_pcm16
    rng = np.random.default_rng(13)
    t = np.arange(2 * 48000) / 48000
    phase = np.cumsum(180 + 40 * np.sin(2 * np.pi * t)) / 48000
    # broadband harmonic stack (covers the STOI third-octave bands)
    clean = 0.05 * sum(np.sin(2 * np.pi * h * phase) / np.sqrt(h)
                       for h in range(1, 30))
    d = C.FRAME_LOOKAHEAD * C.FRAME_SIZE
    enh = np.concatenate([np.zeros(d), clean])[: len(clean)]
    enh = enh + 1e-4 * rng.normal(size=len(enh))
    cp, ep = str(tmp_path / "c.pcm"), str(tmp_path / "e.pcm")
    write_pcm16(cp, clean, scale=32768.0)
    write_pcm16(ep, enh, scale=32768.0)
    m = evaluate_pair(cp, ep)
    assert m["si_sdr_db"] > 30
    assert m["stoi"] > 0.99


def test_host_cpu_tag_keys_on_model_identity(tmp_path, monkeypatch):
    """The compile-cache tag must change when the CPU MODEL changes even if
    the feature flags are identical: LLVM derives tuning pseudo-features
    (prefer-no-gather/scatter, the Downfall mitigation) from the model, and
    flags-identical hosts produced incompatible AOT entries after a live
    migration (enhance output collapsed to ~0 — see utils/cache.py)."""
    import builtins

    from percepnet_tpu.utils import cache

    real_open = builtins.open

    def fake_cpuinfo(text):
        def _open(path, *a, **k):
            if path == "/proc/cpuinfo":
                p = tmp_path / "cpuinfo"
                p.write_text(text)
                return real_open(p, *a, **k)
            return real_open(path, *a, **k)
        return _open

    flags = "flags\t: fpu vme avx avx2 avx512f\n"
    host_a = ("vendor_id\t: GenuineIntel\nmodel\t\t: 143\n"
              "model name\t: Intel(R) Xeon(R) Platinum 8481C\n"
              "stepping\t: 8\n" + flags)
    host_b = ("vendor_id\t: GenuineIntel\nmodel\t\t: 207\n"
              "model name\t: Intel(R) Xeon(R) Platinum 8581C\n"
              "stepping\t: 2\n" + flags)

    monkeypatch.setattr(builtins, "open", fake_cpuinfo(host_a))
    tag_a = cache.host_cpu_tag()
    tag_a2 = cache.host_cpu_tag()
    monkeypatch.setattr(builtins, "open", fake_cpuinfo(host_b))
    tag_b = cache.host_cpu_tag()
    assert tag_a == tag_a2          # stable on one host
    assert tag_a != tag_b           # model change -> new cache dir
    assert cache.cache_dir("cpu").endswith(tag_b)
    assert cache.cache_dir(None) == "/tmp/jax_cache_tpu"  # TPU unkeyed
