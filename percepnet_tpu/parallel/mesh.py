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
    """Device-put a host batch pytree with the leading axis sharded."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    """Device-put a pytree fully replicated across the mesh."""
    s = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
