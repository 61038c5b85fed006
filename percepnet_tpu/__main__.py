"""Command dispatcher: python -m percepnet_tpu <command> [args...]."""

from __future__ import annotations

import sys

COMMANDS = {
    "enhance": ("percepnet_tpu.cli.enhance", "main"),
    "evaluate": ("percepnet_tpu.cli.evaluate", "main"),
    "featgen": ("percepnet_tpu.cli.featgen", "main"),
    "train": ("percepnet_tpu.cli.train", "main"),
    "export": ("percepnet_tpu.cli.export", "main"),
    "split-dataset": ("percepnet_tpu.cli.data", "split_main"),
    "bin2h5": ("percepnet_tpu.cli.data", "bin2h5_main"),
    "bench": ("bench", "main"),
}


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print("usage: python -m percepnet_tpu <command> [args...]\n"
              "commands: " + " ".join(sorted(COMMANDS)))
        raise SystemExit(0 if len(sys.argv) >= 2 else 2)
    cmd = sys.argv[1]
    if cmd not in COMMANDS:
        print(f"unknown command {cmd!r}; commands: "
              + " ".join(sorted(COMMANDS)))
        raise SystemExit(2)
    mod_name, fn_name = COMMANDS[cmd]
    _configure_jax()
    import importlib
    fn = getattr(importlib.import_module(mod_name), fn_name)
    fn(sys.argv[2:])


def _configure_jax() -> None:
    """Per-process jax config for every CLI entry.

    - Persistent XLA compile cache: the batched pipeline graphs take
      minutes to compile through a remote-TPU tunnel, and CLI
      invocations are short-lived processes.
    - PERCEPNET_PLATFORM=cpu (or any jax platform string) overrides the
      device selection BEFORE first backend use.  Plain JAX_PLATFORMS
      does not work here: the axon TPU shim rewrites jax_platforms at
      import time, and with the TPU tunnel down the default backend
      init blocks forever — this is the CLI's escape hatch.
    """
    import os
    try:
        import jax

        from percepnet_tpu.utils.cache import cache_dir
        platform = os.environ.get("PERCEPNET_PLATFORM")
        if platform:
            jax.config.update("jax_platforms", platform)
        # CPU cache dirs are keyed by host-CPU features (see utils/cache.py:
        # VM live-migration otherwise loads stale AOT code that shifts
        # numerics); the TPU dir is host-independent.
        jax.config.update("jax_compilation_cache_dir", cache_dir(platform))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


if __name__ == "__main__":
    main()
