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
    """Uniform color id (the _rand_color analogue)."""
    i = jax.random.randint(key, (), 0, NUM_COLOR_NAMES)
    return jnp.asarray(SORTED_COLOR_IDS)[i]


def rand_type_color(key: jnp.ndarray, type_ids: jnp.ndarray) -> jnp.ndarray:
    """One uniform (type, color) draw (duplicates allowed, fetch.py:120-122)."""
    k1, k2 = jax.random.split(key)
    type_ids = jnp.asarray(type_ids)
    t = type_ids[jax.random.randint(k1, (), 0, type_ids.shape[0])]
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
    perm = jax.random.permutation(key, total)[:n]
    t = type_ids[perm // NUM_COLOR_NAMES]
    c = jnp.asarray(SORTED_COLOR_IDS)[perm % NUM_COLOR_NAMES]
    return jnp.stack([t, c], axis=1).astype(jnp.int32)  # (n, 2)
