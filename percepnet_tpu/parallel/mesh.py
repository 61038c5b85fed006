"""Device mesh + sharding layer.

The reference's only distribution story is dead NCCL/DistributedSampler code
(rnn_train.py:549-623) and 8-way shell fan-out (utils/run.sh:98-122).  The
TPU-native replacement is the standard JAX SPMD recipe: one `Mesh` over all
chips, batch-dimension `NamedSharding` on data, replicated params, and
`jit`-inserted collectives (gradient all-reduce rides ICI).

PercepNet is ~8 M params, so pure data parallelism over utterances is the
right decomposition at any scale; the mesh still exposes a (dp,) axis name
so multi-host DCN+ICI layouts come for free from jax.distributed.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "dp"


def make_mesh(devices=None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch / utterance) axis across the mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Put a host batch pytree on the mesh with the leading axis sharded.

    Single-process: a plain device_put against the NamedSharding.
    Multi-process (jax.distributed): each process passes its OWN local
    batch and the global array is assembled from the per-process shards
    (global batch = local batch x process_count).  device_put would be
    wrong there — it assumes every process holds the same global array,
    silently mixing/dropping most of each host's data.
    """
    s = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                s, np.asarray(x)), batch)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    """Device-put a pytree fully replicated across the mesh."""
    s = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
