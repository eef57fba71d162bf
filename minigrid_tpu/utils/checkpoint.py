"""Checkpoint / resume for env state and trainer state.

The reference has no checkpointing subsystem; its envs are merely picklable
(tests/test_envs.py:168-183) and expose a state digest ``env.hash()``
(minigrid_env.py:166-176).  Here the entire episode state is an explicit
pytree (SURVEY.md §5), so checkpointing is exact by construction:

    save(path, state)                 # any pytree: EnvState batch, PPO runner
    state = load(path, template)      # template supplies treedef + shapes

Two on-disk layouts, selected automatically:

* **Single-process** (``jax.process_count() == 1``): one file at ``path``
  holding the whole tree in flax's msgpack serialization (stable across
  hosts and JAX versions).
* **Multi-process**: each process writes only its *addressable* shards to
  ``path.procN`` (so no process ever materializes a non-fully-addressable
  global array — ``jax.device_get`` on one would raise).  ``load``
  reassembles the global arrays from all shard files (which therefore must
  be visible to every process — shared filesystem or pre-gathered) and
  re-places them onto the template's shardings via
  ``jax.make_array_from_callback``.  Replicated leaves are deduplicated by
  ``replica_id == 0``.

Both paths write to a temp name and ``os.replace`` so a crash never leaves
a torn checkpoint; the multi-process path ends with a cross-host barrier so
no process can read a checkpoint another process has not finished writing.
"""

from __future__ import annotations

import glob
import hashlib
import os
import pickle
from typing import Any

import jax
import numpy as np
from flax import serialization


def save(path: str, tree: Any) -> None:
    """Serialize a pytree of (possibly sharded) arrays to ``path``."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if jax.process_count() == 1:
        host_tree = jax.tree_util.tree_map(np.asarray, jax.device_get(tree))
        data = serialization.to_bytes(host_tree)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)  # atomic: a crash never leaves a torn checkpoint
        return
    save_process_shards(path, tree)
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("minigrid_tpu.checkpoint.save:" + path)


def save_process_shards(path: str, tree: Any) -> None:
    """Write this process's addressable shards of ``tree`` to ``path.procN``.

    Used by :func:`save` when ``jax.process_count() > 1``; exposed separately
    so the shard-file round-trip is testable without a pod.  Host-local
    (fully addressable) leaves are written by process 0 only.
    """
    leaves, _ = jax.tree_util.tree_flatten(tree)
    payload = []
    for leaf in leaves:
        if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
            shards = [
                (s.index, np.asarray(s.data))
                for s in leaf.addressable_shards
                if s.replica_id == 0
            ]
            payload.append(
                ("shards", tuple(leaf.shape), np.dtype(leaf.dtype).str, shards)
            )
        elif jax.process_index() == 0:
            payload.append(("full", None, None, np.asarray(jax.device_get(leaf))))
        else:
            payload.append(("skip", None, None, None))
    tmp = f"{path}.proc{jax.process_index()}.tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, f"{path}.proc{jax.process_index()}")


def load(path: str, template: Any) -> Any:
    """Restore a pytree saved by :func:`save`.

    ``template`` is a pytree with the same structure (e.g. a freshly built
    runner/state); arrays are restored with the template's shardings when the
    template's leaves carry them (jax.Array), else as host numpy.
    """
    if os.path.exists(path):
        with open(path, "rb") as f:
            data = f.read()
        host_tree = serialization.from_bytes(template, data)

        def place(t, x):
            if isinstance(t, jax.Array) and hasattr(t, "sharding"):
                return jax.device_put(x, t.sharding)
            return x

        return jax.tree_util.tree_map(place, template, host_tree)
    return load_process_shards(path, template)


def load_process_shards(path: str, template: Any) -> Any:
    """Reassemble a sharded checkpoint from ``path.proc*`` files.

    Every process reads *all* shard files (shared filesystem), rebuilds each
    global array host-side, and re-shards it onto the template leaf's
    sharding — device_put only actually transfers this process's addressable
    slices."""
    # Exclude '*.tmp' leftovers from a crash mid-save: the atomic os.replace
    # protocol means a torn payload only ever exists under the .tmp suffix.
    files = sorted(f for f in glob.glob(path + ".proc*")
                   if not f.endswith(".tmp"))
    if not files:
        raise FileNotFoundError(path)
    payloads = []
    for fname in files:
        with open(fname, "rb") as f:
            payloads.append(pickle.load(f))
    n_leaves = len(payloads[0])
    leaves_t, treedef = jax.tree_util.tree_flatten(template)
    if len(leaves_t) != n_leaves:
        raise ValueError(
            f"template has {len(leaves_t)} leaves, checkpoint {n_leaves}"
        )
    out = []
    for i, t in enumerate(leaves_t):
        kind = next(p[i][0] for p in payloads if p[i][0] != "skip")
        if kind == "full":
            full = next(p[i][3] for p in payloads if p[i][0] == "full")
        else:
            shape = next(p[i][1] for p in payloads if p[i][0] == "shards")
            dtype = next(p[i][2] for p in payloads if p[i][0] == "shards")
            full = np.empty(shape, np.dtype(dtype))
            filled = np.zeros(shape, bool)
            for p in payloads:
                if p[i][0] != "shards":
                    continue
                for index, arr in p[i][3]:
                    full[index] = arr
                    filled[index] = True
            if not filled.all():
                raise ValueError(
                    f"leaf {i}: checkpoint shard files do not cover the "
                    f"full array (missing a process's file?)"
                )
        if isinstance(t, jax.Array) and hasattr(t, "sharding"):
            out.append(
                jax.make_array_from_callback(
                    full.shape, t.sharding, lambda idx, a=full: a[idx]
                )
            )
        else:
            out.append(np.asarray(full, getattr(t, "dtype", None)))
    return jax.tree_util.tree_unflatten(treedef, out)


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
