"""ctypes bindings for the native host-IO library (cpp/percepnet_io.cpp).

Provides:
  * NativeBatchLoader — multithreaded prefetching record-batch loader (the
    training input pipeline; replaces DataLoader workers and the run.sh
    process fan-out).
  * read_pcm16 / write_pcm16 — native PCM codec with reference semantics.

The library is built on demand with `make -C cpp` (g++, no external deps).
Everything here degrades gracefully: `available()` is False when no
compiler/library exists, and callers fall back to the pure-Python
implementations in io.pcm / train.datasets.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Sequence

import numpy as np

from percepnet_tpu import constants as C

_CPP_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "cpp")
_LIB_PATH = os.path.join(_CPP_DIR, "libpercepnet_io.so")
_lib = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _CPP_DIR, "-s"], check=True,
                       capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.pn_loader_create.restype = ctypes.c_void_p
    lib.pn_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_uint32, ctypes.c_int, ctypes.c_float, ctypes.c_int,
        ctypes.c_int]
    lib.pn_loader_num_chunks.restype = ctypes.c_int64
    lib.pn_loader_num_chunks.argtypes = [ctypes.c_void_p]
    lib.pn_loader_failed_reads.restype = ctypes.c_int64
    lib.pn_loader_failed_reads.argtypes = [ctypes.c_void_p]
    lib.pn_loader_next.restype = ctypes.c_int
    lib.pn_loader_next.argtypes = [ctypes.c_void_p,
                                   ctypes.POINTER(ctypes.c_float)]
    lib.pn_loader_destroy.argtypes = [ctypes.c_void_p]
    lib.pn_pcm_read.restype = ctypes.c_int64
    lib.pn_pcm_read.argtypes = [ctypes.c_char_p,
                                ctypes.POINTER(ctypes.c_float),
                                ctypes.c_int64, ctypes.c_float]
    lib.pn_pcm_write.restype = ctypes.c_int
    lib.pn_pcm_write.argtypes = [ctypes.c_char_p,
                                 ctypes.POINTER(ctypes.c_float),
                                 ctypes.c_int64, ctypes.c_float]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


class NativeBatchLoader:
    """Infinite prefetching iterator of [B, T, 138] float32 batches.

    Same stream semantics as train.datasets.batch_iterator: fixed-length
    chunks, per-epoch reshuffle (seeded), host sharding — but the file IO,
    x30 scaling, and batch assembly run on C++ threads that stay ahead of
    the accelerator.
    """

    def __init__(self, files: Sequence[str], seq_len: int, batch: int, *,
                 record_dim: int = C.RECORD_DIM, shard_id: int = 0,
                 num_shards: int = 1, seed: int = 0,
                 scale: bool = True, n_threads: int = 4,
                 queue_cap: int = 4):
        lib = _load()
        if lib is None:
            raise RuntimeError("native IO library unavailable; "
                               "use train.datasets instead")
        self._lib = lib
        arr = (ctypes.c_char_p * len(files))(
            *[f.encode() for f in files])
        self._h = lib.pn_loader_create(
            arr, len(files), seq_len, batch, record_dim, shard_id,
            num_shards, seed, 2 * C.NB_BANDS if scale else 0,
            float(C.FEATURE_SCALE), n_threads, queue_cap)
        self._shape = (batch, seq_len, record_dim)
        self._warned_failures = 0
        if self.num_chunks() == 0:
            self.close()
            raise ValueError(
                "no training chunks: every listed file is unreadable or "
                f"shorter than seq_len={seq_len} records")

    def num_chunks(self) -> int:
        return int(self._lib.pn_loader_num_chunks(self._h))

    def failed_reads(self) -> int:
        """Chunk reads that failed mid-training (file deleted/truncated)
        and were zero-filled; surfaced so corruption is never silent."""
        return int(self._lib.pn_loader_failed_reads(self._h))

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        out = np.empty(self._shape, np.float32)
        rc = self._lib.pn_loader_next(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if rc != 0:
            raise StopIteration
        failed = self.failed_reads()
        if failed > self._warned_failures:
            import logging
            logging.getLogger("percepnet_tpu.io").warning(
                "native loader: %d chunk read(s) failed and were "
                "zero-filled (deleted/truncated file?)", failed)
            self._warned_failures = failed
        return out

    def close(self) -> None:
        if self._h:
            self._lib.pn_loader_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def read_pcm16(path: str, normalize: bool = False) -> np.ndarray:
    """Native PCM read; same signature/semantics as io.pcm.read_pcm16."""
    lib = _load()
    n = os.path.getsize(path) // 2
    out = np.empty(n, np.float32)
    got = lib.pn_pcm_read(path.encode(),
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                          n, 1.0 / 32768.0 if normalize else 1.0)
    return out[:max(got, 0)]


def write_pcm16(path: str, x: np.ndarray, scale: float = 1.0) -> None:
    """Native PCM write with C truncation semantics (io.pcm.write_pcm16)."""
    lib = _load()
    x = np.ascontiguousarray(x, np.float32)
    rc = lib.pn_pcm_write(path.encode(),
                          x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                          x.shape[0], scale)
    if rc != 0:
        raise IOError(f"pcm write failed: {path}")
