"""Fused Pallas transition kernel: lockstep parity with the XLA engine,
regeneration validity (runs under the Pallas interpreter on CPU)."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import minigrid_tpu
from minigrid_tpu.core import constants as C
from minigrid_tpu.ops.fused_step import FusedVectorEnv
from minigrid_tpu.parallel.vector import VectorEnv


@pytest.mark.parametrize("env_id", ["MiniGrid-DoorKey-8x8-v0",
                                    "MiniGrid-Empty-8x8-v0"])
def test_fused_lockstep_parity(env_id):
    """Same state, same action stream -> bit-identical obs/reward/term/trunc
    vs the XLA path, for every lane until its first episode end."""
    env = minigrid_tpu.make(env_id)
    n = 8
    fv = FusedVectorEnv(env, n, block=8)
    xv = VectorEnv(env, n, env.default_params, auto_reset=False)

    key = jax.random.PRNGKey(0)
    fobs, fs = fv.reset(key)
    xobs, xs = xv.reset(key)
    np.testing.assert_array_equal(np.asarray(fobs["image"]),
                                  np.asarray(xobs["image"]))

    rng = np.random.default_rng(0)
    alive = np.ones(n, bool)
    for t in range(80):
        a = jnp.asarray(rng.integers(0, 8, n), jnp.int32)
        fobs, fs, fr, fte, ftr, _ = fv.step(fs, a)
        xobs, xs, xr, xte, xtr, _ = xv.step(xs, a)
        done_now = np.asarray(xte | xtr)
        live = alive & ~done_now
        np.testing.assert_array_equal(np.asarray(fobs["image"])[live],
                                      np.asarray(xobs["image"])[live])
        assert np.allclose(np.asarray(fr)[alive], np.asarray(xr)[alive])
        assert np.array_equal(np.asarray(fte)[alive], np.asarray(xte)[alive])
        assert np.array_equal(np.asarray(ftr)[alive], np.asarray(xtr)[alive])
        alive &= ~done_now
        if not alive.any():
            break


def test_fused_regeneration_layouts_valid():
    """Auto-reset inside the kernel produces structurally valid DoorKey
    levels and zeroed step counters."""
    env = minigrid_tpu.make("MiniGrid-DoorKey-8x8-v0", max_steps=10)
    n = 8
    fv = FusedVectorEnv(env, n, block=8)
    _, fs = fv.reset(jax.random.PRNGKey(0))
    for _ in range(12):
        _, fs, _, _, tr, _ = fv.step(fs, jnp.full((n,), 6, jnp.int32))
    states = fv.to_env_states(fs)
    typ = np.asarray(states.grid & 0xFF)
    for i in range(n):
        g = typ[i]
        assert (g[:, 0] == C.OBJECT_TO_IDX["wall"]).all()
        assert g[6, 6] == C.OBJECT_TO_IDX["goal"]
        assert (g == C.OBJECT_TO_IDX["door"]).sum() == 1
        assert (g == C.OBJECT_TO_IDX["key"]).sum() == 1
        assert int(states.step_count[i]) <= 2


def test_fused_unsupported_env_raises():
    env = minigrid_tpu.make("MiniGrid-FourRooms-v0")
    with pytest.raises(NotImplementedError):
        FusedVectorEnv(env, 8, block=8)
