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
    gain_mse_weight: float = 0.0         # extra linear-domain gain MSE
                                         # term (see loss.percepnet_loss);
                                         # 0.0 = reference-faithful loss
    log1p_features: bool = False         # compress energy features at the
                                         # model boundary (fixes the
                                         # reference's saturated input
                                         # stack; see models.percepnet.
                                         # compress_features).  Enhance
                                         # with the same flag; not
                                         # exportable to the C++ runtime
    seed: int = 0
    out_dir: str = "exp"
    watchdog_secs: float | None = None   # hang detection (see run())

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
                 mesh=None, tensorboard: bool = True,
                 device_data: np.ndarray | None = None,
                 device_dev: np.ndarray | None = None):
        """device_data/device_dev: optional [N, T, 138] record arrays kept
        resident on the accelerator (datasets.load_all_chunks).  With
        device_data set, `train_iter` must yield int32 INDEX batches
        (datasets.index_iterator) and `dev_batches` index batches into
        device_dev — only indices cross the host link per step.
        Single-process only (per-process-different arrays would break
        SPMD); the loader path stays the multi-host mode."""
        self.config = config
        self.train_iter = train_iter
        self.dev_batches = dev_batches or []
        if device_data is not None and jax.process_count() > 1:
            raise ValueError("device-resident data is single-process only")
        if mesh is None:
            # the GLOBAL batch (per-process batch x process count) is
            # sharded over the mesh, so the device count must divide it;
            # use the largest prefix of devices that does
            devs = jax.devices()
            global_batch = config.batch_size * jax.process_count()
            n = len(devs)
            while global_batch % n:
                n -= 1
            if n < len(devs):
                if jax.process_count() > 1:
                    raise ValueError(
                        f"global batch {global_batch} not divisible by "
                        f"{len(devs)} devices; a partial mesh cannot span "
                        "processes — adjust batch_size")
                log.warning("batch_size %d not divisible by %d devices; "
                            "using %d", config.batch_size, len(devs), n)
            mesh = pm.make_mesh(devs[:n])
        self.mesh = mesh
        self.tx = ts.make_optimizer(config.learning_rate,
                                    config.grad_clip_norm)
        self.state = pm.replicate(
            self.mesh,
            ts.init_train_state(jax.random.PRNGKey(config.seed), self.tx))
        self._device_mode = device_data is not None
        if self._device_mode:
            def put(rec):
                x, y = datasets.split_xy(rec)
                return (pm.replicate(self.mesh, jax.numpy.asarray(x)),
                        pm.replicate(self.mesh, jax.numpy.asarray(y)))
            self._xa, self._ya = put(device_data)
            self._dev_xa, self._dev_ya = (put(device_dev)
                                          if device_dev is not None
                                          else (None, None))
            self._train_step, self._eval_step = ts.make_jitted_index_steps(
                self.tx, self.mesh,
                gain_mse_weight=config.gain_mse_weight,
                log1p_features=config.log1p_features)
        else:
            self._train_step, self._eval_step = ts.make_jitted_steps(
                self.tx, self.mesh,
                gain_mse_weight=config.gain_mse_weight,
                log1p_features=config.log1p_features)
        self.history: list[dict[str, Any]] = []
        # TensorBoard scalars + intermediate-result heatmaps, like the
        # reference (rnn_train.py:431-462); optional dependency.
        self._tb = None
        if tensorboard and jax.process_index() == 0:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(
                    os.path.join(config.out_dir, "tb"))
            except Exception:
                pass

    def _record(self, rec: dict[str, Any]) -> None:
        self.history.append(rec)
        if jax.process_index() != 0:
            return
        path = os.path.join(self.config.out_dir, "history.jsonl")
        os.makedirs(self.config.out_dir, exist_ok=True)
        with open(path, "a") as f:
            import json
            f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            step = rec.get("step", 0)
            for k, v in rec.items():
                if k != "step" and isinstance(v, (int, float)):
                    self._tb.add_scalar(k, v, step)

    def _log_heatmaps(self, step: int) -> None:
        """Predicted vs target g/r heatmaps on the first dev batch
        (the reference's intermediate-result images, rnn_train.py:431-457)."""
        if self._tb is None or not self.dev_batches:
            return
        import jax.numpy as jnp
        from percepnet_tpu.models import percepnet as model
        if self._device_mode:
            idx = jnp.asarray(self.dev_batches[0][:1])
            x = jax.device_get(jnp.take(self._dev_xa, idx, axis=0))
            y = jax.device_get(jnp.take(self._dev_ya, idx, axis=0))
        else:
            x, y = datasets.split_xy(self.dev_batches[0][:1])
        g, r, _ = model.forward(jax.device_get(self.state.params),
                                jnp.asarray(x))
        for name, pred, tgt in [("g", g[0], y[0, :, :34]),
                                ("r", r[0], y[0, :, 34:])]:
            self._tb.add_image(f"eval/{name}_predicted",
                               np.asarray(pred).T[None], step)
            self._tb.add_image(f"eval/{name}_target",
                               np.asarray(tgt).T[None], step)

    # --- checkpointing ----------------------------------------------------
    def save(self) -> str:
        step = int(jax.device_get(self.state.step))
        path = os.path.join(self.config.out_dir, f"checkpoint-{step}.npz")
        # state is replicated, so only process 0 writes (multi-host runs
        # share out_dir on a common filesystem)
        if jax.process_index() == 0:
            ckpt.save_checkpoint(path, jax.device_get(self.state))
            log.info("saved %s", path)
        return path

    def restore(self, path: str | None = None) -> bool:
        path = path or ckpt.latest_checkpoint(self.config.out_dir)
        if not path:
            return False
        template = jax.device_get(self.state)
        try:
            restored = ckpt.load_checkpoint(path, template)
        except KeyError as e:
            # The opt_state pytree layout depends on the optimizer config
            # (e.g. the apply_if_finite wrapper added keys like
            # 'opt_state/.../notfinite_count'); a checkpoint written under a
            # different config would otherwise fail with a raw KeyError.
            # Degrade gracefully: keep params + step, restart the optimizer.
            log.warning(
                "checkpoint %s has a different opt_state layout than the "
                "current optimizer config (missing %s) — restoring params "
                "and step, REINITIALIZING optimizer state (Adam moments "
                "restart; brief loss bump possible)", path, e)
            params = ckpt.load_params_from_checkpoint(path, template.params)
            with np.load(path) as z:
                step = np.asarray(z["step"])
            restored = ts.TrainState(
                params, jax.device_get(self.tx.init(params)),
                step.astype(np.int32))
        self.state = pm.replicate(self.mesh, restored)
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
        import jax.numpy as jnp
        losses = []
        for b in self.dev_batches:
            if self._device_mode:
                losses.append(float(self._eval_step(
                    self.state, self._dev_xa, self._dev_ya, jnp.asarray(b))))
            else:
                x, y = self._device_batch(b)
                losses.append(float(self._eval_step(self.state, x, y)))
        return float(np.mean(losses))

    def run(self) -> None:
        cfg = self.config
        if jax.process_index() == 0:
            cfg.dump(os.path.join(cfg.out_dir, "config.yml"))
        step = int(jax.device_get(self.state.step))
        t0, steps0 = time.time(), step

        # Preemption safety (the reference loses progress since the last
        # interval save): SIGTERM/SIGINT request a checkpoint-and-exit at
        # the next step boundary; resume picks it up exactly.
        stop = {"now": False}

        def _on_signal(signum, frame):
            del frame
            log.warning("signal %d: checkpointing and stopping", signum)
            stop["now"] = True

        import signal
        old_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                old_handlers[sig] = signal.signal(sig, _on_signal)
            except ValueError:       # non-main thread
                pass

        # Hang detection: a wedged device/tunnel can block a step forever
        # (observed in the field: remote-TPU tunnel glitch left
        # block_until_ready hung with the client pinning the chip).  A
        # stuck device op cannot be cancelled in-process, so the watchdog
        # hard-exits; a supervisor loop restarts the job and it resumes
        # exactly from the last interval checkpoint.
        # Armed from loop entry: a tunnel hang DURING step 1 is the very
        # failure mode observed in the field, so it must be caught too.
        # The first step gets a generous deadline (cold-cache compiles
        # take 10-20 min through the remote-TPU tunnel, PLUS device-
        # resident corpus staging); the normal watchdog_secs applies once
        # the first step completes and resets the heartbeat.  Scaled off
        # watchdog_secs (x4) so a slow environment can extend step-1
        # tolerance without also blunting steady-state hang detection;
        # the recipe supervisor's outer `timeout` remains the backstop.
        first_step_deadline = max(4 * (cfg.watchdog_secs or 0.0), 3600.0)
        heartbeat = {"t": time.time(), "first": True}
        if cfg.watchdog_secs:
            import threading

            def _watch():
                while not stop["now"]:
                    time.sleep(min(cfg.watchdog_secs / 4, 30.0))
                    limit = (first_step_deadline if heartbeat["first"]
                             else cfg.watchdog_secs)
                    stale = time.time() - heartbeat["t"]
                    if stale > limit:
                        log.error(
                            "watchdog: no step completed in %.0f s "
                            "(device hang?) — exiting for supervised "
                            "restart+resume", stale)
                        os._exit(17)

            threading.Thread(target=_watch, daemon=True).start()
        try:
            while step < cfg.train_max_steps and not stop["now"]:
                batch = next(self.train_iter)
                if self._device_mode:
                    import jax.numpy as jnp
                    self.state, loss = self._train_step(
                        self.state, self._xa, self._ya, jnp.asarray(batch))
                else:
                    x, y = self._device_batch(batch)
                    self.state, loss = self._train_step(self.state, x, y)
                step += 1
                # the heartbeat must track COMPLETED device work, not
                # dispatches — a wedged device happily accepts hundreds of
                # async steps (observed) and would keep a dispatch-side
                # heartbeat fresh.  The periodic sync also bounds how far
                # the loop runs ahead.  Step 1 syncs unconditionally: its
                # completion drops the watchdog from the generous
                # first-step deadline to the steady-state one.
                if (step == steps0 + 1
                        or step % min(50, cfg.log_interval_steps) == 0):
                    jax.block_until_ready(loss)
                    heartbeat["t"] = time.time()
                    heartbeat["first"] = False
                if step % cfg.log_interval_steps == 0:
                    dt = time.time() - t0
                    sps = (step - steps0) / max(dt, 1e-9)
                    # global batch: cfg.batch_size is per-process
                    audio_s = (sps * cfg.batch_size * jax.process_count()
                               * cfg.seq_len * 480 / 48_000)
                    rec = {"step": step, "loss": float(loss),
                           "steps_per_s": round(sps, 3),
                           "train_audio_s_per_s": round(audio_s, 1)}
                    self._record(rec)
                    log.info("%s", rec)
                if step % cfg.eval_interval_steps == 0 and self.dev_batches:
                    ev = self.evaluate()
                    self._record({"step": step, "eval_loss": ev})
                    self._log_heatmaps(step)
                    log.info("eval step %d loss %.6f", step, ev)
                if step % cfg.save_interval_steps == 0:
                    self.save()
        finally:
            stop["now"] = True           # stand down the watchdog
            # always save a final checkpoint (rnn_train.py:644-650)
            self.save()
            if self._tb is not None:
                self._tb.flush()
            for sig, h in old_handlers.items():
                signal.signal(sig, h)
