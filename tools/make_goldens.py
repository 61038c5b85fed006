#!/usr/bin/env python3
"""Build the reference PercepNet out-of-tree and generate golden test vectors.

Outputs (checked into tests/goldens/):
  unit.npz     — per-op goldens (FFT, band ops, pitch stack, LPC)
  featgen.npz  — full feature/label records + oracle-enhanced PCM from the
                 reference TRAINING binary on synthetic speech+noise
  (weights + end-to-end NN goldens are produced by tools/make_nn_goldens.py)

Run from the repo root:  python3 tools/make_goldens.py
"""
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/src"
BUILD = "/tmp/refbuild"
GOLD = os.path.join(REPO, "tests", "goldens")

REF_SOURCES = [
    f"{REF}/denoise.cpp", f"{REF}/kiss_fft.cpp", f"{REF}/pitch.cpp",
    f"{REF}/celt_lpc.cpp", f"{REF}/nnet.cpp", f"{REF}/rnn.cpp",
]


def sh(cmd, **kw):
    print("+", " ".join(cmd))
    subprocess.run(cmd, check=True, **kw)


def build():
    os.makedirs(BUILD, exist_ok=True)
    sh(["g++", "-O2", "-w", "-DTRAINING=1", f"-I{REF}",
        *REF_SOURCES, f"{REF}/main.cpp", "-o", f"{BUILD}/percepNet"])
    sh(["g++", "-O2", "-w", "-DTRAINING=1", f"-I{REF}",
        *REF_SOURCES, os.path.join(REPO, "tools", "gen_unit_goldens.cpp"),
        "-o", f"{BUILD}/gen_unit_goldens"])


def synth_audio(n_frames=200, seed=0):
    """Synthetic 'speech' (harmonic sweep) and 'noisy' (speech+noise) PCM."""
    rng = np.random.RandomState(seed)
    n = n_frames * 480
    t = np.arange(n) / 48000.0
    f0 = 150.0 + 60.0 * np.sin(2 * np.pi * 0.7 * t)  # pitch vibrato
    phase = 2 * np.pi * np.cumsum(f0) / 48000.0
    speech = np.zeros(n)
    for h, a in [(1, 1.0), (2, 0.6), (3, 0.4), (4, 0.25), (5, 0.15)]:
        speech += a * np.sin(h * phase)
    env = 0.5 * (1 + np.sin(2 * np.pi * 1.3 * t - np.pi / 2))  # syllabic envelope
    speech *= env * 6000.0
    noise = rng.randn(n) * 900.0
    noisy = speech + noise
    clean16 = np.clip(speech, -32768, 32767).astype("<i2")
    noisy16 = np.clip(noisy, -32768, 32767).astype("<i2")
    return clean16, noisy16


def run_featgen(n_frames=200):
    clean16, noisy16 = synth_audio(n_frames)
    clean_p = f"{BUILD}/clean.pcm"
    noisy_p = f"{BUILD}/noisy.pcm"
    clean16.tofile(clean_p)
    noisy16.tofile(noisy_p)
    out_p = f"{BUILD}/features.out"
    # percepNet writes test_output.pcm / test_input.pcm into the CWD
    sh([f"{BUILD}/percepNet", clean_p, noisy_p, str(n_frames), out_p], cwd=BUILD)
    records = np.fromfile(out_p, "<f4").reshape(n_frames, 138)
    oracle = np.fromfile(f"{BUILD}/test_output.pcm", "<i2")
    test_input = np.fromfile(f"{BUILD}/test_input.pcm", "<i2")
    np.savez_compressed(
        os.path.join(GOLD, "featgen.npz"),
        clean16=clean16, noisy16=noisy16, records=records,
        oracle_pcm=oracle, test_input_pcm=test_input)
    print("featgen.npz:", records.shape, "records")


def run_unit():
    outdir = f"{BUILD}/unit"
    os.makedirs(outdir, exist_ok=True)
    sh([f"{BUILD}/gen_unit_goldens", outdir])
    data = {}
    for fn in os.listdir(outdir):
        path = os.path.join(outdir, fn)
        key, kind = fn.rsplit(".", 1)
        data[key] = np.fromfile(path, "<i4" if kind == "i32" else "<f4")
    np.savez_compressed(os.path.join(GOLD, "unit.npz"), **data)
    print("unit.npz keys:", sorted(data))


if __name__ == "__main__":
    os.makedirs(GOLD, exist_ok=True)
    build()
    run_unit()
    run_featgen(int(sys.argv[1]) if len(sys.argv) > 1 else 200)
