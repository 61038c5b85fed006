"""Subprocess entry for the 2-process jax.distributed CPU test.

Forces the CPU platform (the axon TPU shim rewrites jax_platforms at
import, so the config update must happen after `import jax`), enables the
gloo cross-process CPU collectives, then runs the real training CLI
(`percepnet_tpu.cli.train`) with the argv passed through — exercising
--distributed, host-sharded loaders, and the global-batch assembly in
parallel.mesh.shard_batch with genuinely different per-process data.

Usage (spawned by tests/test_distributed.py, one per process):
  python tests/distributed_worker.py --distributed \
      --coordinator localhost:PORT --num-processes 2 --process-id I ...
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from percepnet_tpu.cli.train import main  # noqa: E402

main(sys.argv[1:])
