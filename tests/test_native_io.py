"""Native C++ IO library: PCM codec parity + batch loader semantics.

Skipped when no C++ toolchain is available (the library builds on demand).
"""

import numpy as np
import pytest

from percepnet_tpu.io import native, pcm
from percepnet_tpu import constants as C

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native IO library unavailable")


def test_pcm_roundtrip_matches_python(tmp_path):
    rng = np.random.default_rng(0)
    x = (rng.uniform(-1.3, 1.3, 10_000) * 32768.0).astype(np.float32)
    p_native = str(tmp_path / "n.pcm")
    p_py = str(tmp_path / "p.pcm")
    native.write_pcm16(p_native, x)
    pcm.write_pcm16(p_py, x)
    a = np.fromfile(p_native, "<i2")
    b = np.fromfile(p_py, "<i2")
    np.testing.assert_array_equal(a, b)  # incl. clamp + truncation cases

    ya = native.read_pcm16(p_native, normalize=True)
    yb = pcm.read_pcm16(p_py, normalize=True)
    np.testing.assert_allclose(ya, yb, atol=1e-7)


def test_loader_yields_scaled_chunks(tmp_path):
    rng = np.random.default_rng(1)
    files = []
    for i in range(3):
        rec = rng.uniform(0, 1, (25, C.RECORD_DIM)).astype(np.float32)
        p = tmp_path / f"f{i}.f32"
        rec.tofile(p)
        files.append(str(p))

    ld = native.NativeBatchLoader(files, seq_len=10, batch=2, seed=0,
                                  n_threads=2)
    assert ld.num_chunks() == 6  # 3 files x floor(25/10)
    seen = []
    for _ in range(4):
        b = next(ld)
        assert b.shape == (2, 10, C.RECORD_DIM)
        seen.append(b)
    ld.close()

    # every yielded chunk must be an original chunk with x30 on cols 0:68
    originals = []
    for p in files:
        r = np.fromfile(p, np.float32).reshape(25, C.RECORD_DIM)
        for c in range(2):
            chunk = r[c * 10 : (c + 1) * 10].copy()
            chunk[:, :68] *= 30.0
            originals.append(chunk)
    for b in seen:
        for row in b:
            assert any(np.allclose(row, o, rtol=1e-6) for o in originals)


def test_loader_order_deterministic_across_thread_counts(tmp_path):
    """Batch delivery order must be a pure function of the seed — the
    reorder buffer sequences worker output by stream position, so resume
    reproducibility holds for any n_threads."""
    rng = np.random.default_rng(3)
    files = []
    for i in range(4):
        rec = rng.uniform(0, 1, (40, C.RECORD_DIM)).astype(np.float32)
        p = tmp_path / f"d{i}.f32"
        rec.tofile(p)
        files.append(str(p))

    def stream(n_threads, n_batches=10):
        ld = native.NativeBatchLoader(files, seq_len=10, batch=3, seed=7,
                                      n_threads=n_threads, queue_cap=2)
        out = [next(ld).copy() for _ in range(n_batches)]
        ld.close()
        return out

    a, b, c = stream(1), stream(2), stream(4)
    for x, y, z in zip(a, b, c):
        np.testing.assert_array_equal(x, y)
        np.testing.assert_array_equal(x, z)


def test_loader_tight_queue_cap_no_deadlock(tmp_path):
    """queue_cap is a hard memory bound counting in-flight claims; a cap
    smaller than n_threads must idle the excess workers, not deadlock
    the in-order reorder buffer, and the stream stays seed-deterministic."""
    rng = np.random.default_rng(5)
    files = []
    for i in range(3):
        rec = rng.uniform(0, 1, (40, C.RECORD_DIM)).astype(np.float32)
        p = tmp_path / f"q{i}.f32"
        rec.tofile(p)
        files.append(str(p))

    def stream(queue_cap, n_batches=12):
        ld = native.NativeBatchLoader(files, seq_len=10, batch=3, seed=11,
                                      n_threads=4, queue_cap=queue_cap)
        out = [next(ld).copy() for _ in range(n_batches)]
        ld.close()
        return out

    tight, roomy = stream(1), stream(8)
    for x, y in zip(tight, roomy):
        np.testing.assert_array_equal(x, y)


def test_loader_empty_index_raises(tmp_path):
    """All files shorter than seq_len -> construction fails loudly
    instead of Next() blocking forever."""
    p = tmp_path / "short.f32"
    np.zeros((3, C.RECORD_DIM), np.float32).tofile(p)
    with pytest.raises(ValueError, match="no training chunks"):
        native.NativeBatchLoader([str(p)], seq_len=10, batch=1)


def test_loader_counts_failed_reads(tmp_path):
    """A file deleted mid-training is zero-filled AND counted."""
    keep = tmp_path / "keep.f32"
    gone = tmp_path / "gone.f32"
    np.ones((10, C.RECORD_DIM), np.float32).tofile(keep)
    np.ones((10, C.RECORD_DIM), np.float32).tofile(gone)
    import os
    ld = native.NativeBatchLoader([str(keep), str(gone)], seq_len=10,
                                  batch=2, scale=False, n_threads=1,
                                  queue_cap=1)
    os.unlink(gone)
    # drain a few batches; eventually a read of `gone` fails
    failed = 0
    for _ in range(6):
        next(ld)
        failed = ld.failed_reads()
        if failed:
            break
    ld.close()
    assert failed > 0


def test_loader_sharding_partitions_files(tmp_path):
    rng = np.random.default_rng(2)
    files = []
    for i in range(4):
        rec = np.full((10, C.RECORD_DIM), i, np.float32)
        p = tmp_path / f"s{i}.f32"
        rec.tofile(p)
        files.append(str(p))
    l0 = native.NativeBatchLoader(files, seq_len=10, batch=1, shard_id=0,
                                  num_shards=2, scale=False, n_threads=1)
    l1 = native.NativeBatchLoader(files, seq_len=10, batch=1, shard_id=1,
                                  num_shards=2, scale=False, n_threads=1)
    ids0 = {int(next(l0)[0, 0, 0]) for _ in range(6)}
    ids1 = {int(next(l1)[0, 0, 0]) for _ in range(6)}
    l0.close(); l1.close()
    assert ids0 == {0, 2} and ids1 == {1, 3}
