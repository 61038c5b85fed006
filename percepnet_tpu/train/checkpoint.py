"""Checkpointing: FULL train state (params + optimizer + step).

The reference saves only `model.state_dict()` and silently restarts the
optimizer schedule on resume (rnn_train.py:320-333).  Here the whole
TrainState pytree round-trips, so resume is exact.  Format: a single .npz
of flat string-keyed arrays — host-portable, no framework pickle.

Orbax is available in the image; this hand-rolled format is kept because
the state is ~64 MB and a flat npz doubles as the weight-exchange format
(io.flat_npz) used by the C++-deployment bridge (io.nnet_data).
"""

from __future__ import annotations

import os
import re
import tempfile

import jax
import numpy as np

from percepnet_tpu.io import flat_npz


def _path_key(path) -> str:
    return "/".join(
        str(getattr(q, "name", getattr(q, "key", getattr(q, "idx", q))))
        for q in path)


def save_checkpoint(path: str, state) -> None:
    """Atomic write of a TrainState (or any pytree) to .npz."""
    flat, _ = jax.tree.flatten_with_path(state)
    out = {}
    for p, leaf in flat:
        out[_path_key(p)] = np.asarray(leaf)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".",
                               suffix=".tmp")
    with os.fdopen(fd, "wb") as f:
        np.savez(f, **out)
    os.replace(tmp, path)


def _restore_tree(template, mapping, prefix: str = ""):
    flat, treedef = jax.tree.flatten_with_path(template)
    leaves = []
    for p, leaf in flat:
        arr = mapping[prefix + _path_key(p)]
        leaves.append(arr.astype(np.asarray(leaf).dtype).reshape(
            np.asarray(leaf).shape))
    return jax.tree.unflatten(treedef, leaves)


def load_checkpoint(path: str, template):
    """Restore a pytree shaped like `template` from .npz."""
    with np.load(path) as z:
        mapping = {k: z[k] for k in z.files}
    return _restore_tree(template, mapping)


def load_params_from_checkpoint(path: str, params_template):
    """Pull just the params subtree out of a full TrainState checkpoint
    (keys 'params/...'), without reconstructing the optimizer state — so
    a checkpoint trained with any optimizer config (e.g. grad clipping,
    whose opt_state tree differs) loads for inference."""
    with np.load(path) as z:
        mapping = {k: z[k] for k in z.files if k.startswith("params/")}
    return _restore_tree(params_template, mapping, prefix="params/")


def save_params_npz(path: str, params) -> None:
    """Params-only export (the deployment artifact)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat_npz.params_to_flat(params))


def load_params_npz(path: str, template):
    with np.load(path) as z:
        mapping = {k: z[k] for k in z.files}
    return flat_npz.params_from_flat(template, mapping)


_STEP_RE = re.compile(r"checkpoint-(\d+)\.npz$")


def latest_checkpoint(ckpt_dir: str) -> str | None:
    """Newest checkpoint-{step}.npz in a directory, or None."""
    if not os.path.isdir(ckpt_dir):
        return None
    best, best_step = None, -1
    for f in os.listdir(ckpt_dir):
        m = _STEP_RE.search(f)
        if m and int(m.group(1)) > best_step:
            best, best_step = os.path.join(ckpt_dir, f), int(m.group(1))
    return best
