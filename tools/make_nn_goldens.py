#!/usr/bin/env python3
"""End-to-end NN goldens: emit random weights as nnet_data.cpp, build the
reference `percepNet_run`, run it on the synthetic noisy PCM, and record its
enhanced output + per-frame g/r dumps (feature_test.raw, main.cpp:29).

Output: tests/goldens/nn.npz with
  params_*   — the flattened random params (float32)
  out_pcm    — reference-enhanced int16 PCM (first frame dropped, main.cpp:37)
  gr         — [T, 68] g,r dumped per frame by rnnoise_process_frame

Run from repo root after tools/make_goldens.py:
  JAX_PLATFORMS=cpu PYTHONPATH=. python3 tools/make_nn_goldens.py
"""
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/src"
BUILD = "/tmp/refbuild"
GOLD = os.path.join(REPO, "tests", "goldens")

REF_SOURCES = [
    f"{REF}/denoise.cpp", f"{REF}/kiss_fft.cpp", f"{REF}/pitch.cpp",
    f"{REF}/celt_lpc.cpp", f"{REF}/nnet.cpp", f"{REF}/rnn.cpp",
    f"{REF}/main.cpp",
]


def main():
    import jax
    from percepnet_tpu.models import init_params
    from percepnet_tpu.io.nnet_data import emit_nnet_data_cpp

    params = init_params(jax.random.PRNGKey(42))
    nnet_cpp = f"{BUILD}/nnet_data.cpp"
    emit_nnet_data_cpp(params, nnet_cpp)

    subprocess.run(
        ["g++", "-O2", "-w", "-DTRAINING=0", f"-I{REF}",
         *REF_SOURCES, nnet_cpp, "-o", f"{BUILD}/percepNet_run"],
        check=True)

    noisy = f"{BUILD}/noisy.pcm"
    out = f"{BUILD}/nn_out.pcm"
    subprocess.run([f"{BUILD}/percepNet_run", noisy, out],
                   check=True, cwd=BUILD)

    out_pcm = np.fromfile(out, "<i2")
    gr = np.fromfile(f"{BUILD}/feature_test.raw", "<f4").reshape(-1, 68)

    flat, _ = jax.tree.flatten_with_path(params)
    data = {"out_pcm": out_pcm, "gr": gr}
    for path, leaf in flat:
        key = "params/" + "/".join(
            getattr(p, "name", getattr(p, "key", str(p))) for p in path)
        data[key] = np.asarray(leaf)
    np.savez_compressed(os.path.join(GOLD, "nn.npz"), **data)
    print("nn.npz:", out_pcm.shape, gr.shape)


if __name__ == "__main__":
    main()
