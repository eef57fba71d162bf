"""On-device sampling helpers shared by the env generators.

The reference samples objects with Python rejection loops over
``COLOR_NAMES``/type lists (e.g. distinct (type, color) draws in
gotoobject.py:58-64, putnear.py:126-131).  Here the same distributions are
produced with fixed-shape primitives: distinct draws come from one
permutation over the type×color product space (sequential
rejection-until-new is distributionally identical to taking a random
permutation prefix).
"""

from __future__ import annotations

import jax
import numpy as np

import jax.numpy as jnp

from minigrid_tpu.core import constants as C

# Color ids in COLOR_NAMES (sorted) order — the reference's _rand_color space
# (minigrid_env.py:293-298 samples from the sorted name list).
SORTED_COLOR_IDS = np.asarray(
    [C.COLOR_TO_IDX[n] for n in C.COLOR_NAMES], dtype=jnp.int32
)
NUM_COLOR_NAMES = len(C.COLOR_NAMES)  # 10


def rand_color(key: jnp.ndarray) -> jnp.ndarray:
    """Uniform color id (the _rand_color analogue).  Masked reduce, not a
    dynamic gather — a vmapped one-element gather serializes
    (grid_ops.take1)."""
    i = jax.random.randint(key, (), 0, NUM_COLOR_NAMES)
    return jnp.sum(jnp.where(jnp.arange(NUM_COLOR_NAMES) == i,
                             jnp.asarray(SORTED_COLOR_IDS), 0))


def rand_type_color(key: jnp.ndarray, type_ids: jnp.ndarray) -> jnp.ndarray:
    """One uniform (type, color) draw (duplicates allowed, fetch.py:120-122)."""
    from minigrid_tpu.core.grid_ops import take1

    k1, k2 = jax.random.split(key)
    type_ids = jnp.asarray(type_ids)
    t = take1(type_ids, jax.random.randint(k1, (), 0, type_ids.shape[0]))
    return jnp.stack([t, rand_color(k2)]).astype(jnp.int32)


def distinct_type_colors(
    key: jnp.ndarray, n: int, type_ids: jnp.ndarray
) -> jnp.ndarray:
    """n distinct (type, color) pairs, uniform without replacement over the
    |types|×10 product (the rejection loop of gotoobject.py:58-64)."""
    type_ids = jnp.asarray(type_ids)
    num_types = type_ids.shape[0]
    total = num_types * NUM_COLOR_NAMES
    assert n <= total
    from minigrid_tpu.core.grid_ops import take_vec

    perm = jax.random.permutation(key, total)[:n]
    t = take_vec(type_ids, perm // NUM_COLOR_NAMES)
    c = take_vec(jnp.asarray(SORTED_COLOR_IDS), perm % NUM_COLOR_NAMES)
    return jnp.stack([t, c], axis=1).astype(jnp.int32)  # (n, 2)
