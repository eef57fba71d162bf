"""Cross-implementation parity: TPU kernels vs the reference object engine.

The contract (SURVEY.md §4, BASELINE config[0]): given the same world state
and action stream, obs/reward/terminated/truncated must match the reference
bit-for-bit.  Reference envs are lowered to EnvState via
``minigrid_tpu.utils.convert.from_reference`` and then both implementations
are stepped in lockstep under a seeded random policy over all 8 actions.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from minigrid_tpu.utils.convert import from_reference, state_equals_reference
from tests.conftest import requires_reference


def _lockstep(ref_env, env, seed: int, num_steps: int = 150, actions_high: int = 8):
    """Drive both implementations with one action stream; assert bitwise parity."""
    params = env.default_params
    obs_ref, _ = ref_env.reset(seed=seed)
    state = from_reference(ref_env)
    obs = env.observation(state, params)
    np.testing.assert_array_equal(obs_ref["image"], np.asarray(obs["image"]))
    assert obs_ref["direction"] == int(obs["direction"])

    step = jax.jit(lambda s, a: env.step(s, a, params))
    rng = np.random.default_rng(seed)
    for t in range(num_steps):
        a = int(rng.integers(0, actions_high))
        o_r, r_r, term_r, trunc_r, _ = ref_env.step(a)
        o, state, r, term, trunc, _ = step(state, jnp.int32(a))
        assert np.array_equal(o_r["image"], np.asarray(o["image"])), f"t={t} a={a}"
        assert o_r["direction"] == int(o["direction"]), f"t={t}"
        assert abs(r_r - float(r)) < 1e-6, f"t={t}: {r_r} vs {float(r)}"
        assert term_r == bool(term) and trunc_r == bool(trunc), f"t={t}"
        assert state_equals_reference(state, ref_env), f"t={t}"
        if term_r or trunc_r:
            break


@requires_reference
@pytest.mark.parametrize("seed", range(4))
def test_empty_parity(seed):
    from minigrid.envs.empty import EmptyEnv as RefEmpty

    from minigrid_tpu.envs.empty import EmptyEnv

    _lockstep(RefEmpty(size=5), EmptyEnv(size=5), seed)


@requires_reference
@pytest.mark.parametrize("seed", range(4))
def test_doorkey_parity(seed):
    from minigrid.envs.doorkey import DoorKeyEnv as RefDoorKey

    from minigrid_tpu.envs.doorkey import DoorKeyEnv

    _lockstep(RefDoorKey(size=8), DoorKeyEnv(size=8), seed)


@requires_reference
def test_empty_reset_obs_matches_reference():
    """Fixed-start Empty generation is deterministic -> reset obs must match."""
    from minigrid.envs.empty import EmptyEnv as RefEmpty

    from minigrid_tpu.envs.empty import EmptyEnv

    ref = RefEmpty(size=5)
    obs_ref, _ = ref.reset(seed=0)
    env = EmptyEnv(size=5)
    obs, _ = env.reset(jax.random.PRNGKey(0), env.default_params)
    np.testing.assert_array_equal(obs_ref["image"], np.asarray(obs["image"]))
