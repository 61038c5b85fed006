"""Training loop: interval-driven train/eval/save, data-parallel over a mesh.

Mirrors the reference Trainer's behavior (rnn_train.py:261-489): step loop
to train_max_steps with eval / save / log intervals — but as one jitted
SPMD step over a jax.sharding mesh instead of a single-device torch loop,
and with full-state checkpoints (see train.checkpoint).

Config keys and defaults follow utils/DNS_Challenge.yaml.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from typing import Any, Iterator

import jax
import numpy as np

from percepnet_tpu.parallel import mesh as pm
from percepnet_tpu.train import checkpoint as ckpt
from percepnet_tpu.train import datasets
from percepnet_tpu.train import state as ts

log = logging.getLogger("percepnet_tpu.train")


@dataclasses.dataclass
class TrainConfig:
    """utils/DNS_Challenge.yaml defaults + rnn_train.py argparse defaults."""
    batch_size: int = 64
    seq_len: int = 2000                  # --train_length_size
    learning_rate: float = 1e-4          # rnn_train.py:576
    train_max_steps: int = 100_000
    save_interval_steps: int = 1_000
    eval_interval_steps: int = 1_000
    log_interval_steps: int = 1_000
    grad_clip_norm: float | None = None  # reference does not clip
    seed: int = 0
    out_dir: str = "exp"

    @classmethod
    def from_yaml(cls, path: str, **overrides) -> "TrainConfig":
        import yaml
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in raw.items() if k in known}
        kw.update(overrides)
        return cls(**kw)

    def dump(self, path: str) -> None:
        import yaml
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            yaml.safe_dump(dataclasses.asdict(self), f)


class Trainer:
    """Step-driven trainer; resumable from full-state checkpoints."""

    def __init__(self, config: TrainConfig,
                 train_iter: Iterator[np.ndarray],
                 dev_batches: list[np.ndarray] | None = None,
                 mesh=None):
        self.config = config
        self.train_iter = train_iter
        self.dev_batches = dev_batches or []
        self.mesh = mesh if mesh is not None else pm.make_mesh()
        self.tx = ts.make_optimizer(config.learning_rate,
                                    config.grad_clip_norm)
        self.state = pm.replicate(
            self.mesh,
            ts.init_train_state(jax.random.PRNGKey(config.seed), self.tx))
        self._train_step, self._eval_step = ts.make_jitted_steps(
            self.tx, self.mesh)
        self.history: list[dict[str, Any]] = []

    # --- checkpointing ----------------------------------------------------
    def save(self) -> str:
        step = int(jax.device_get(self.state.step))
        path = os.path.join(self.config.out_dir, f"checkpoint-{step}.npz")
        ckpt.save_checkpoint(path, jax.device_get(self.state))
        log.info("saved %s", path)
        return path

    def restore(self, path: str | None = None) -> bool:
        path = path or ckpt.latest_checkpoint(self.config.out_dir)
        if not path:
            return False
        self.state = pm.replicate(
            self.mesh, ckpt.load_checkpoint(path, jax.device_get(self.state)))
        log.info("restored %s (step %d)", path, int(self.state.step))
        return True

    def load_pretrained(self, params_npz: str) -> None:
        """Warm-start params only (the reference's --pretrain path)."""
        params = ckpt.load_params_npz(
            params_npz, jax.device_get(self.state.params))
        self.state = self.state._replace(params=pm.replicate(self.mesh,
                                                             params))

    # --- loops --------------------------------------------------------------
    def _device_batch(self, batch: np.ndarray):
        x, y = datasets.split_xy(batch)
        return pm.shard_batch(self.mesh, (np.ascontiguousarray(x),
                                          np.ascontiguousarray(y)))

    def evaluate(self) -> float:
        if not self.dev_batches:
            return float("nan")
        losses = []
        for b in self.dev_batches:
            x, y = self._device_batch(b)
            losses.append(float(self._eval_step(self.state, x, y)))
        return float(np.mean(losses))

    def run(self) -> None:
        cfg = self.config
        cfg.dump(os.path.join(cfg.out_dir, "config.yml"))
        step = int(jax.device_get(self.state.step))
        t0, steps0 = time.time(), step
        try:
            while step < cfg.train_max_steps:
                batch = next(self.train_iter)
                x, y = self._device_batch(batch)
                self.state, loss = self._train_step(self.state, x, y)
                step += 1
                if step % cfg.log_interval_steps == 0:
                    dt = time.time() - t0
                    sps = (step - steps0) / max(dt, 1e-9)
                    rec = {"step": step, "loss": float(loss),
                           "steps_per_s": round(sps, 3)}
                    self.history.append(rec)
                    log.info("%s", rec)
                if step % cfg.eval_interval_steps == 0 and self.dev_batches:
                    ev = self.evaluate()
                    self.history.append({"step": step, "eval_loss": ev})
                    log.info("eval step %d loss %.6f", step, ev)
                if step % cfg.save_interval_steps == 0:
                    self.save()
        finally:
            # always save a final checkpoint (rnn_train.py:644-650)
            self.save()
