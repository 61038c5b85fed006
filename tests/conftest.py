"""Test configuration: force an 8-device virtual CPU mesh.

Tests run on CPU so they are hermetic and so multi-chip sharding logic can
be exercised without TPU hardware (the driver separately dry-runs the real
multi-chip path).
"""
import os

# Force the hermetic 8-device virtual CPU mesh.  The environment ships an
# axon TPU shim that rewrites jax_platforms to "axon,cpu" at import time —
# env vars (even explicit JAX_PLATFORMS=cpu) do NOT win; the config must be
# updated after `import jax`, before first backend use.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent compile cache: the frontend takes minutes to compile on CPU;
# cache hits make test re-runs fast.  The dir is keyed by host-CPU features
# (utils/cache.py): a VM live-migration changes the host CPU, and XLA loads
# the stale AOT entries anyway with SHIFTED numerics — a migration must
# start a fresh cache, not silently break 1e-6 parity asserts.
from percepnet_tpu.utils.cache import cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", cache_dir("cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


@pytest.fixture(scope="session")
def unit_goldens():
    return np.load(os.path.join(GOLDENS, "unit.npz"))


@pytest.fixture(scope="session")
def featgen_goldens():
    return np.load(os.path.join(GOLDENS, "featgen.npz"))
