"""Bridging helpers between reference Gymnasium envs and EnvState pytrees.

Used by the cross-implementation parity suite: a reference env's object graph
is lowered to the dense tensor state (the reference's own ``Grid.encode``
format, grid.py:244-268, plus the box-contents side plane), after which the
TPU step/obs kernels must reproduce the reference trajectories bit-for-bit.

These helpers intentionally run host-side on numpy; they are test scaffolding,
not a hot path.
"""

from __future__ import annotations

import numpy as np

from minigrid_tpu.core import constants as C
from minigrid_tpu.core.state import EnvState


def encode_obj(obj) -> np.ndarray:
    """WorldObj -> (type, color, state) uint8 triple; None -> empty (1,0,0)."""
    if obj is None:
        return np.asarray(C.EMPTY_TRIPLE)
    return np.asarray(obj.encode(), dtype=np.uint8)


def from_reference(ref_env, rng=None) -> EnvState:
    """Lower a live reference MiniGridEnv to an EnvState pytree."""
    import jax
    import jax.numpy as jnp

    w, h = ref_env.grid.width, ref_env.grid.height
    grid = np.asarray(ref_env.grid.encode(), dtype=np.uint8)
    box_contains = np.broadcast_to(np.asarray(C.EMPTY_TRIPLE), (w, h, 3)).copy()
    for j in range(h):
        for i in range(w):
            cell = ref_env.grid.get(i, j)
            if cell is not None and getattr(cell, "contains", None) is not None:
                box_contains[i, j] = encode_obj(cell.contains)

    carrying = encode_obj(ref_env.carrying)
    carrying_contains = encode_obj(getattr(ref_env.carrying, "contains", None))

    from minigrid_tpu.core.grid_ops import pack_np

    return EnvState(
        grid=jnp.asarray(pack_np(grid)),
        box_contains=jnp.asarray(pack_np(box_contains)),
        agent_pos=jnp.asarray(np.asarray(ref_env.agent_pos), dtype=jnp.int32),
        agent_dir=jnp.asarray(ref_env.agent_dir, dtype=jnp.int32),
        carrying=jnp.asarray(carrying),
        carrying_contains=jnp.asarray(carrying_contains),
        step_count=jnp.asarray(ref_env.step_count, dtype=jnp.int32),
        terminated=jnp.asarray(False),
        truncated=jnp.asarray(False),
        rng=rng if rng is not None else jax.random.PRNGKey(0),
        mission=jnp.zeros((4,), dtype=jnp.int32),
        max_steps=jnp.asarray(0, dtype=jnp.int32),
    )


def state_equals_reference(state: EnvState, ref_env) -> bool:
    """Full world-state comparison (grid triples + agent pose + carrying)."""
    from minigrid_tpu.core.grid_ops import unpack_np

    ref_grid = np.asarray(ref_env.grid.encode(), dtype=np.uint8)
    return (
        np.array_equal(unpack_np(np.asarray(state.grid)), ref_grid)
        and np.array_equal(np.asarray(state.agent_pos), np.asarray(ref_env.agent_pos))
        and int(state.agent_dir) == int(ref_env.agent_dir)
        and np.array_equal(np.asarray(state.carrying), encode_obj(ref_env.carrying))
    )
