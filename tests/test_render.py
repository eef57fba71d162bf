"""RGB rendering: pixel-exact parity with the reference rasterizer."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import minigrid_tpu
from minigrid_tpu.ops.render import get_atlas, get_frame
from minigrid_tpu.utils.convert import from_reference
from minigrid_tpu.wrappers import RGBImgObsWrapper, RGBImgPartialObsWrapper
from tests.conftest import requires_reference


@pytest.fixture(scope="module")
def atlas8():
    return get_atlas(8)


@requires_reference
@pytest.mark.parametrize("mode", ["full_highlight", "full", "pov"])
def test_frame_pixel_parity(mode):
    """Full/highlighted/POV frames match the reference bit-for-bit."""
    from minigrid.envs.doorkey import DoorKeyEnv as RefDoorKey

    ref = RefDoorKey(size=8)
    ref.reset(seed=3)
    env = minigrid_tpu.make("MiniGrid-DoorKey-8x8-v0")
    params = env.default_params
    state = from_reference(ref)

    kwargs = {
        "full_highlight": dict(highlight=True),
        "full": dict(highlight=False),
        "pov": dict(agent_pov=True),
    }[mode]
    ref_img = ref.get_frame(tile_size=8, **kwargs)
    my_img = np.asarray(get_frame(state, params, tile_size=8, **kwargs))
    np.testing.assert_array_equal(ref_img, my_img)


@requires_reference
def test_frame_parity_with_carried_object_and_open_door():
    """Render after pickup/toggle (exercises agent-on-cell compositing)."""
    from minigrid.envs.doorkey import DoorKeyEnv as RefDoorKey

    import jax.numpy as jnp

    ref = RefDoorKey(size=5)
    ref.reset(seed=0)
    env = minigrid_tpu.make("MiniGrid-DoorKey-5x5-v0")
    params = env.default_params
    state = from_reference(ref)
    rng = np.random.default_rng(0)
    step = jax.jit(lambda s, a: env.step(s, a, params))
    for _ in range(40):
        a = int(rng.integers(0, 6))
        ref.step(a)
        _, state, *_ = step(state, jnp.int32(a))
    ref_img = ref.get_frame(tile_size=8, highlight=True)
    my_img = np.asarray(get_frame(state, params, tile_size=8, highlight=True))
    np.testing.assert_array_equal(ref_img, my_img)


def test_rgb_wrappers(atlas8):
    env = RGBImgObsWrapper(minigrid_tpu.make("MiniGrid-Empty-5x5-v0"),
                           tile_size=8)
    params = env.default_params
    obs, state = env.reset(jax.random.PRNGKey(0), params)
    assert obs["image"].shape == (5 * 8, 5 * 8, 3)

    env2 = RGBImgPartialObsWrapper(minigrid_tpu.make("MiniGrid-Empty-5x5-v0"),
                                   tile_size=8)
    obs2, _ = env2.reset(jax.random.PRNGKey(0), params)
    assert obs2["image"].shape == (7 * 8, 7 * 8, 3)


def test_rgb_wrapper_under_jit_and_vmap(atlas8):
    import jax.numpy as jnp

    from minigrid_tpu.parallel.vector import VectorEnv

    env = RGBImgPartialObsWrapper(minigrid_tpu.make("MiniGrid-DoorKey-5x5-v0"),
                                  tile_size=8)
    venv = VectorEnv(env, num_envs=4)
    obs, state = venv.reset(jax.random.PRNGKey(0))
    assert obs["image"].shape == (4, 56, 56, 3)
    obs, state, r, te, tr, _ = venv.step(state, jnp.zeros((4,), jnp.int32))
    assert obs["image"].dtype == np.uint8


def test_pov_render_batch_pixel_exact():
    """The batched POV renderer (one flat atlas gather for the whole batch,
    ops/render.py::pov_render_batch) is pixel-identical to the per-env
    pov_render under vmap — the path the RGB battery row times."""
    import minigrid_tpu
    from minigrid_tpu.ops.render import get_atlas, pov_render, pov_render_batch

    env = minigrid_tpu.make("MiniGrid-DoorKey-8x8-v0")
    params = env.default_params
    keys = jax.random.split(jax.random.PRNGKey(0), 16)
    states = jax.vmap(lambda k: env.generate(k, params))(keys)
    for t in range(5):
        a = jax.random.randint(jax.random.PRNGKey(t), (16,), 0,
                               env.num_actions, jnp.int32)
        states = jax.vmap(
            lambda s, aa: env.step_state(s, aa, params)[0])(states, a)
    atlas = get_atlas(8)
    ref = jax.vmap(lambda s: pov_render(s, params, atlas))(states)
    got = pov_render_batch(states, params, atlas)
    assert np.array_equal(np.asarray(ref), np.asarray(got))


def test_rgb_partial_wrapper_batched_matches_per_env():
    """RGBImgPartialObsWrapper.observation_batch (the VectorEnv hot path)
    equals vmapping its per-env observation."""
    import minigrid_tpu
    from minigrid_tpu.wrappers import RGBImgPartialObsWrapper

    env = RGBImgPartialObsWrapper(
        minigrid_tpu.make("MiniGrid-Empty-8x8-v0"), tile_size=8)
    params = env.default_params
    keys = jax.random.split(jax.random.PRNGKey(2), 8)
    states = jax.vmap(lambda k: env.generate(k, params))(keys)
    got = env.observation_batch(states, params)
    ref = jax.vmap(lambda s: env.observation(s, params))(states)
    for k in ref:
        assert np.array_equal(np.asarray(got[k]), np.asarray(ref[k])), k
