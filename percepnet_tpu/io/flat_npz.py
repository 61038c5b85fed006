"""Flatten/unflatten a params pytree to string-keyed arrays (npz-friendly)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _key(path) -> str:
    return "params/" + "/".join(
        getattr(p, "name", getattr(p, "key", str(p))) for p in path)


def params_to_flat(params) -> dict[str, np.ndarray]:
    flat, _ = jax.tree.flatten_with_path(params)
    return {_key(path): np.asarray(leaf) for path, leaf in flat}


def params_from_flat(template, mapping) -> object:
    """Rebuild a pytree shaped like `template` from a flat key->array map."""
    flat, treedef = jax.tree.flatten_with_path(template)
    leaves = [jnp.asarray(mapping[_key(path)]) for path, _ in flat]
    return jax.tree.unflatten(treedef, leaves)
