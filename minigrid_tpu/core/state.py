"""Environment state as an explicit JAX pytree.

The reference keeps world state in a Python object graph
(``Grid`` of ``WorldObj`` instances, ``minigrid/core/grid.py:35``;
agent fields on the env, ``minigrid/minigrid_env.py:117-123``).  Here the
*entire* episode state is one flat pytree of fixed-shape arrays, so
``reset``/``step`` are pure functions that ``vmap`` over thousands of envs and
shard over device meshes; checkpointing an env == saving the pytree.

The grid tensor uses the reference's own encode format — ``(type, color,
state)`` uint8 per cell, indexed ``grid[x, y]`` (reference
``grid.py:244-268``) — so ``FullyObs`` / symbolic wrappers are identity-cheap
and cross-implementation parity checks compare arrays directly.

``Box.contains`` is the only per-cell state the 3-int encoding cannot carry
(reference ``world_object.py:423-443``): it lives in a parallel
``box_contains`` plane, and a matching ``carrying_contains`` triple follows a
carried box through pickup/drop (reference tracks this implicitly via object
identity).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct

from minigrid_tpu.core.constants import EMPTY_TRIPLE


@struct.dataclass
class EnvState:
    """Complete per-env episode state; one pytree, all static shapes."""

    grid: jnp.ndarray  # uint32[W, H] — packed (type | color<<8 | state<<16)
    box_contains: jnp.ndarray  # uint32[W, H] — packed contents plane for boxes
    agent_pos: jnp.ndarray  # int32[2] — (x, y)
    agent_dir: jnp.ndarray  # int32 — 0 east / 1 south / 2 west / 3 north
    carrying: jnp.ndarray  # uint8[3] — carried triple; type==empty => hands free
    carrying_contains: jnp.ndarray  # uint8[3] — contents of a carried box
    step_count: jnp.ndarray  # int32
    terminated: jnp.ndarray  # bool
    truncated: jnp.ndarray  # bool
    rng: jnp.ndarray  # PRNG key consumed by stochastic transitions
    mission: jnp.ndarray  # int32[K] — packed mission code (template + slots)
    # Per-episode step limit override; 0 means "use params.max_steps".
    # BabyAI recomputes the limit from the sampled instruction each episode
    # (roomgrid_level.py:76-83), so it must be state, not config.
    max_steps: jnp.ndarray = None  # int32
    extra: Any = None  # env-family-specific pytree (targets, obstacles, ...)


@struct.dataclass
class EnvParams:
    """Static episode configuration (the reference's constructor kwargs,
    minigrid_env.py:50-63).  Fields here are Python ints/bools captured as
    jit-static via closure; per-id presets live in the registry."""

    width: int = struct.field(pytree_node=False, default=8)
    height: int = struct.field(pytree_node=False, default=8)
    max_steps: int = struct.field(pytree_node=False, default=100)
    agent_view_size: int = struct.field(pytree_node=False, default=7)
    see_through_walls: bool = struct.field(pytree_node=False, default=False)
    # BabyAI only: the reference's BABYAI_DONE_ACTIONS env var
    # (envs/babyai/core/verifier.py:25) as a proper static config flag —
    # clauses succeed/fail only via an explicit `done` action.
    babyai_done_actions: bool = struct.field(pytree_node=False, default=False)


def empty_grid(width: int, height: int) -> jnp.ndarray:
    """A W×H PACKED grid of 'empty' cells (the tensor analogue of
    Grid.__init__'s all-None list, reference grid.py:35).  Packed layout:
    uint32 per cell, type | color<<8 | state<<16 — see
    :mod:`minigrid_tpu.core.grid_ops`."""
    empty_word = int(EMPTY_TRIPLE[0]) | (int(EMPTY_TRIPLE[1]) << 8) | (
        int(EMPTY_TRIPLE[2]) << 16)
    return jnp.full((width, height), empty_word, dtype=jnp.uint32)


def no_object() -> jnp.ndarray:
    """Triple meaning 'no object' (hands free / box empty)."""
    return jnp.asarray(EMPTY_TRIPLE, dtype=jnp.uint8)


def base_state(
    grid: jnp.ndarray,
    agent_pos: jnp.ndarray,
    agent_dir: jnp.ndarray,
    rng: jnp.ndarray,
    mission: jnp.ndarray | None = None,
    box_contains: jnp.ndarray | None = None,
    extra: Any = None,
    max_steps=0,
    has_boxes: bool = True,
) -> EnvState:
    """Assemble a fresh EnvState at step 0 (the tail of reference reset,
    minigrid_env.py:152-156).

    ``has_boxes=False`` (env families whose cells can never hold a Box)
    drops the ``box_contains``/``carrying_contains`` planes from the pytree
    entirely — the transition skips the box logic statically and the
    auto-reset lane stops moving a dead W×H×3 plane every step."""
    w, h = grid.shape[:2]
    if box_contains is None and has_boxes:
        box_contains = empty_grid(w, h)
    if mission is None:
        mission = jnp.zeros((4,), dtype=jnp.int32)
    return EnvState(
        grid=grid,
        box_contains=box_contains,
        agent_pos=jnp.asarray(agent_pos, dtype=jnp.int32),
        agent_dir=jnp.asarray(agent_dir, dtype=jnp.int32),
        carrying=no_object(),
        carrying_contains=no_object() if has_boxes else None,
        step_count=jnp.asarray(0, dtype=jnp.int32),
        terminated=jnp.asarray(False),
        truncated=jnp.asarray(False),
        rng=rng,
        mission=jnp.asarray(mission, dtype=jnp.int32),
        max_steps=jnp.asarray(max_steps, dtype=jnp.int32),
        extra=extra,
    )
