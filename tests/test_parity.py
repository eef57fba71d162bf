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


def _fetch_extra(ref):
    import jax.numpy as jnp

    from minigrid_tpu.core import constants as C

    return jnp.asarray(
        [C.OBJECT_TO_IDX[ref.targetType], C.COLOR_TO_IDX[ref.targetColor]],
        dtype=jnp.int32,
    )


def _gotodoor_extra(ref):
    import jax.numpy as jnp

    return jnp.asarray(ref.target_pos, dtype=jnp.int32)


def _gotoobject_extra(ref):
    import jax.numpy as jnp

    return jnp.asarray(ref.target_pos, dtype=jnp.int32)


def _putnear_extra(ref):
    import jax.numpy as jnp

    from minigrid_tpu.core import constants as C

    return {
        "move": jnp.asarray(
            [C.OBJECT_TO_IDX[ref.move_type], C.COLOR_TO_IDX[ref.moveColor]],
            dtype=jnp.int32,
        ),
        "target_pos": jnp.asarray(ref.target_pos, dtype=jnp.int32),
    }


def _redblue_extra(ref):
    import numpy as np

    import jax.numpy as jnp

    from minigrid_tpu.core import constants as C

    enc = np.asarray(ref.grid.encode())
    doors = np.argwhere(enc[..., 0] == C.OBJECT_TO_IDX["door"])
    red = [p for p in doors if enc[p[0], p[1], 1] == C.COLOR_TO_IDX["red"]][0]
    blue = [p for p in doors if enc[p[0], p[1], 1] == C.COLOR_TO_IDX["blue"]][0]
    return {
        "red_pos": jnp.asarray(red, dtype=jnp.int32),
        "blue_pos": jnp.asarray(blue, dtype=jnp.int32),
    }


def _memory_extra(ref):
    import jax.numpy as jnp

    return {
        "success_pos": jnp.asarray(ref.success_pos, dtype=jnp.int32),
        "failure_pos": jnp.asarray(ref.failure_pos, dtype=jnp.int32),
    }


def _task_env_cases():
    """(ref_env_factory, tpu_env_factory, extra_builder) triples."""
    import minigrid.envs as R

    import minigrid_tpu.envs as E

    return {
        "fetch": (lambda: R.FetchEnv(size=8, numObjs=3),
                  lambda: E.FetchEnv(size=8, numObjs=3), _fetch_extra),
        "gotodoor": (lambda: R.GoToDoorEnv(size=6),
                     lambda: E.GoToDoorEnv(size=6), _gotodoor_extra),
        "gotoobject": (lambda: R.GoToObjectEnv(size=8, numObjs=2),
                       lambda: E.GoToObjectEnv(size=8, numObjs=2),
                       _gotoobject_extra),
        "putnear": (lambda: R.PutNearEnv(size=8, numObjs=3),
                    lambda: E.PutNearEnv(size=8, numObjs=3), _putnear_extra),
        "redblue": (lambda: R.RedBlueDoorEnv(size=6),
                    lambda: E.RedBlueDoorEnv(size=6), _redblue_extra),
        "memory": (lambda: R.MemoryEnv(size=9),
                   lambda: E.MemoryEnv(size=9), _memory_extra),
    }


@requires_reference
@pytest.mark.parametrize("case", ["fetch", "gotodoor", "gotoobject", "putnear",
                                  "redblue", "memory"])
@pytest.mark.parametrize("seed", range(3))
def test_task_env_parity(case, seed):
    """Behavior parity for task-reward envs: lower the reference episode to an
    EnvState (plus task extras) and lockstep-step both over random actions."""
    ref_f, env_f, extra_b = _task_env_cases()[case]
    ref = ref_f()
    env = env_f()
    params = env.default_params
    obs_ref, _ = ref.reset(seed=seed)
    state = from_reference(ref).replace(extra=extra_b(ref))
    obs = env.observation(state, params)
    np.testing.assert_array_equal(obs_ref["image"], np.asarray(obs["image"]))

    step = jax.jit(lambda s, a: env.step(s, a, params))
    rng = np.random.default_rng(seed)
    episodes = 0
    for t in range(300):
        a = int(rng.integers(0, 8))
        o_r, r_r, term_r, trunc_r, _ = ref.step(a)
        o, state, r, term, trunc, _ = step(state, jnp.int32(a))
        assert np.array_equal(o_r["image"], np.asarray(o["image"])), (case, t, a)
        assert abs(r_r - float(r)) < 1e-6, (case, t, a, r_r, float(r))
        assert term_r == bool(term) and trunc_r == bool(trunc), (case, t, a)
        if term_r or trunc_r:
            episodes += 1
            if episodes >= 3:
                break
            obs_ref, _ = ref.reset(seed=seed + 1000 * episodes)
            state = from_reference(ref).replace(extra=extra_b(ref))
    # memory's T-maze and redblue's 720-step ordering task rarely end under a
    # random policy within 300 steps; the per-step parity asserts above are
    # the contract that matters there.
    if case not in ("memory", "redblue"):
        assert episodes >= 1


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


@requires_reference
@pytest.mark.parametrize("case", ["lavagap", "distshift", "fourrooms",
                                  "crossing_lava", "crossing_wall",
                                  "multiroom", "lockedroom"])
@pytest.mark.parametrize("seed", range(2))
def test_base_dynamics_env_parity(case, seed):
    """Families whose step is exactly the base transition: lower the
    reference episode and lockstep both over random actions."""
    import minigrid.envs as R

    import minigrid_tpu.envs as E

    cases = {
        "lavagap": (lambda: R.LavaGapEnv(size=7), lambda: E.LavaGapEnv(size=7)),
        "distshift": (lambda: R.DistShiftEnv(), lambda: E.DistShiftEnv()),
        "fourrooms": (lambda: R.FourRoomsEnv(), lambda: E.FourRoomsEnv()),
        "crossing_lava": (lambda: R.CrossingEnv(size=9, num_crossings=2),
                          lambda: E.CrossingEnv(size=9, num_crossings=2)),
        "crossing_wall": (
            lambda: R.CrossingEnv(size=9, num_crossings=1,
                                  obstacle_type=__import__(
                                      "minigrid.core.world_object",
                                      fromlist=["Wall"]).Wall),
            lambda: E.CrossingEnv(size=9, num_crossings=1,
                                  obstacle_type="wall")),
        "multiroom": (lambda: R.MultiRoomEnv(minNumRooms=2, maxNumRooms=3),
                      lambda: E.MultiRoomEnv(minNumRooms=2, maxNumRooms=3)),
        "lockedroom": (lambda: R.LockedRoomEnv(size=19),
                       lambda: E.LockedRoomEnv(size=19)),
    }
    ref_f, env_f = cases[case]
    _lockstep(ref_f(), env_f(), seed, num_steps=120)


# ---------------------------------------------------------------------------
# RoomGrid-family step overrides + DynamicObstacles (VERDICT r1 missing #3)
# ---------------------------------------------------------------------------


def _find_cells(ref, type_name):
    from minigrid_tpu.core import constants as C

    enc = np.asarray(ref.grid.encode())
    return np.argwhere(enc[..., 0] == C.OBJECT_TO_IDX[type_name])


def _obj_extra(ref):
    """[type, color] of the tracked target object (carrying == self.obj
    lowers to a triple match: the target is the unique object of its
    (type, color) in these levels)."""
    from minigrid_tpu.core import constants as C

    return jnp.asarray(
        [C.OBJECT_TO_IDX[ref.obj.type], C.COLOR_TO_IDX[ref.obj.color]],
        dtype=jnp.int32,
    )


def _door_pos_extra(ref):
    doors = _find_cells(ref, "door")
    assert len(doors) == 1
    return jnp.asarray(doors[0], dtype=jnp.int32)


def _roomgrid_cases():
    import minigrid.envs as R

    import minigrid_tpu.envs as E

    return {
        "keycorridor": (lambda: R.KeyCorridorEnv(room_size=3, num_rows=3),
                        lambda: E.KeyCorridorEnv(room_size=3, num_rows=3),
                        _obj_extra),
        "unlock": (lambda: R.UnlockEnv(), lambda: E.UnlockEnv(),
                   _door_pos_extra),
        "unlockpickup": (lambda: R.UnlockPickupEnv(),
                         lambda: E.UnlockPickupEnv(), _obj_extra),
        "blockedunlockpickup": (lambda: R.BlockedUnlockPickupEnv(),
                                lambda: E.BlockedUnlockPickupEnv(),
                                _obj_extra),
        "obstructedmaze_1dlhb": (lambda: R.ObstructedMaze_1Dlhb(),
                                 lambda: E.ObstructedMaze_1Dlhb(),
                                 _obj_extra),
        "obstructedmaze_full": (lambda: R.ObstructedMaze_Full(),
                                lambda: E.ObstructedMaze_Full(),
                                _obj_extra),
    }


@requires_reference
@pytest.mark.parametrize("case", ["keycorridor", "unlock", "unlockpickup",
                                  "blockedunlockpickup",
                                  "obstructedmaze_1dlhb",
                                  "obstructedmaze_full"])
@pytest.mark.parametrize("seed", range(2))
def test_roomgrid_step_override_parity(case, seed):
    """Lockstep random-action parity for the RoomGrid task envs
    (keycorridor.py:129-137, unlock.py:89-97, unlockpickup.py:98-106,
    blockedunlockpickup.py:108-116, obstructedmaze.py:119-127)."""
    ref_f, env_f, extra_b = _roomgrid_cases()[case]
    ref = ref_f()
    env = env_f()
    params = env.default_params
    obs_ref, _ = ref.reset(seed=seed)
    state = from_reference(ref).replace(extra=extra_b(ref))
    obs = env.observation(state, params)
    np.testing.assert_array_equal(obs_ref["image"], np.asarray(obs["image"]))

    step = jax.jit(lambda s, a: env.step(s, a, params))
    rng = np.random.default_rng(seed)
    for t in range(150):
        a = int(rng.integers(0, 8))
        o_r, r_r, term_r, trunc_r, _ = ref.step(a)
        o, state, r, term, trunc, _ = step(state, jnp.int32(a))
        assert np.array_equal(o_r["image"], np.asarray(o["image"])), (case, t, a)
        assert abs(r_r - float(r)) < 1e-6, (case, t, a, r_r, float(r))
        assert term_r == bool(term) and trunc_r == bool(trunc), (case, t, a)
        if term_r or trunc_r:
            break


@requires_reference
@pytest.mark.parametrize("case", ["keycorridor", "unlockpickup",
                                  "blockedunlockpickup",
                                  "obstructedmaze_1dlhb"])
def test_roomgrid_success_branch_parity(case):
    """Success-path parity: teleport the reference agent in front of its
    target object, lower the state, and verify the pickup-terminates rule
    fires identically (reward and termination) on both sides."""
    from minigrid_tpu.core import constants as C
    from minigrid_tpu.core.step import PICKUP, TOGGLE

    ref_f, env_f, extra_b = _roomgrid_cases()[case]
    ref = ref_f()
    env = env_f()
    params = env.default_params
    ref.reset(seed=1)

    # Put the agent directly west of the target, facing east, hands free.
    tx, ty = ref.obj.cur_pos
    ref.grid.set(tx - 1, ty, None)
    ref.agent_pos = (tx - 1, ty)
    ref.agent_dir = 0
    ref.carrying = None

    state = from_reference(ref).replace(extra=extra_b(ref))
    step = jax.jit(lambda s, a: env.step(s, a, params))

    # ObstructedMaze/UnlockPickup targets may sit inside boxes? No: obj is a
    # plain ball/box on the grid — a single PICKUP must end the episode.
    o_r, r_r, term_r, trunc_r, _ = ref.step(PICKUP)
    o, s2, r, term, trunc, _ = step(state, jnp.int32(PICKUP))
    assert term_r and bool(term), (case, r_r, float(r))
    assert abs(r_r - float(r)) < 1e-6, (case, r_r, float(r))
    assert r_r > 0


@requires_reference
def test_unlock_success_branch_parity():
    """Unlock's toggle-open success (unlock.py:89-97): give both agents the
    key in front of the locked door; one toggle unlocks+opens and ends the
    episode with identical reward."""
    import minigrid.envs as R
    from minigrid.core.world_object import Key

    import minigrid_tpu.envs as E
    from minigrid_tpu.core.step import TOGGLE

    ref = R.UnlockEnv()
    env = E.UnlockEnv()
    params = env.default_params
    ref.reset(seed=2)
    doors = _find_cells(ref, "door")
    dx, dy = doors[0]
    door = ref.grid.get(dx, dy)
    # clear approach cell, hand the agent the matching key
    keys = _find_cells(ref, "key")
    ref.grid.set(*keys[0], None)
    ref.grid.set(dx - 1, dy, None)
    ref.agent_pos = (dx - 1, dy)
    ref.agent_dir = 0
    ref.carrying = Key(door.color)

    state = from_reference(ref).replace(extra=_door_pos_extra(ref))
    step = jax.jit(lambda s, a: env.step(s, a, params))
    o_r, r_r, term_r, _, _ = ref.step(TOGGLE)
    o, s2, r, term, _, _ = step(state, jnp.int32(TOGGLE))
    assert term_r and bool(term)
    assert abs(r_r - float(r)) < 1e-6, (r_r, float(r))
    assert r_r > 0
    np.testing.assert_array_equal(o_r["image"], np.asarray(o["image"]))


@requires_reference
@pytest.mark.parametrize("seed", range(3))
def test_dynamicobstacles_parity_injected_motion(seed):
    """DynamicObstacles lockstep with the reference's obstacle-motion stream
    injected into the TPU env (dynamicobstacles.py:142-165): steps the
    reference first, reads where its obstacles actually moved, and replays
    exactly those moves through the tensor transition.  Verifies the
    pre-move collision rule, motion grid updates, and base dynamics."""
    from minigrid.envs.dynamicobstacles import DynamicObstaclesEnv as RefDyn

    from minigrid_tpu.envs.dynamicobstacles import DynamicObstaclesEnv

    class InjectedMotion(DynamicObstaclesEnv):
        scripted: list  # [(new_pos(2,), ok)] per obstacle, set per step

        def propose_move(self, i, key, grid, old, agent_pos, xs, ys):
            pos, ok = self.scripted[i]
            return jnp.asarray(pos, jnp.int32), jnp.asarray(ok)

    ref = RefDyn(size=8, n_obstacles=4)
    env = InjectedMotion(size=8, n_obstacles=4)
    params = env.default_params

    obs_ref, _ = ref.reset(seed=seed)
    state = from_reference(ref)
    positions = np.asarray([o.cur_pos for o in ref.obstacles], dtype=np.int32)
    state = state.replace(extra=jnp.asarray(positions))
    obs = env.observation(state, params)
    np.testing.assert_array_equal(obs_ref["image"], np.asarray(obs["image"]))

    rng = np.random.default_rng(seed)
    for t in range(80):
        a = int(rng.integers(0, 3))
        old_poss = [tuple(o.cur_pos) for o in ref.obstacles]
        o_r, r_r, term_r, trunc_r, _ = ref.step(a)
        new_poss = [tuple(o.cur_pos) for o in ref.obstacles]
        env.scripted = [
            (np_, old != np_)
            for old, np_ in zip(old_poss, new_poss)
        ]
        # eager step (scripted positions change every call)
        o, state, r, term, trunc, _ = env.step(state, jnp.int32(a), params)
        assert np.array_equal(o_r["image"], np.asarray(o["image"])), (t, a)
        assert abs(r_r - float(r)) < 1e-6, (t, a, r_r, float(r))
        assert term_r == bool(term) and trunc_r == bool(trunc), (t, a)
        if term_r or trunc_r:
            break


# ---------------------------------------------------------------------------
# fork dataset envs (VERDICT r1 missing #6)
# ---------------------------------------------------------------------------


@requires_reference
@pytest.mark.parametrize("seed", range(3))
def test_negated_reward_parity(seed):
    """NegatedEnv's ±1 pickup reward (negated_goals.py:217-229): lower the
    reference episode (+ its target) and lockstep both until the episode
    ends by pickup.  (The reference also hardwires truncated=False — a
    latent API bug in the SURVEY §2.7 family that we do not replicate; the
    lockstep window stays below max_steps so it never matters here.)"""
    from minigrid.envs.negated_goals import NegatedSimple as RefNegated

    from minigrid_tpu.core import constants as C
    from minigrid_tpu.envs.negated_goals import NegatedSimple

    ref = RefNegated()
    env = NegatedSimple()
    params = env.default_params
    obs_ref, _ = ref.reset(seed=seed)
    state = from_reference(ref).replace(
        extra={
            "target": jnp.asarray(
                [C.OBJECT_TO_IDX[ref.target_type],
                 C.COLOR_TO_IDX[ref.target_color]], jnp.int32),
        }
    )
    step = jax.jit(lambda s, a: env.step(s, a, params))
    rng = np.random.default_rng(seed)
    ended = False
    for t in range(min(int(params.max_steps) - 1, 60)):
        a = int(rng.integers(0, 6))
        o_r, r_r, term_r, trunc_r, _ = ref.step(a)
        o, state, r, term, trunc, _ = step(state, jnp.int32(a))
        assert np.array_equal(o_r["image"], np.asarray(o["image"])), (seed, t)
        assert abs(r_r - float(r)) < 1e-6, (seed, t, a, r_r, float(r))
        assert term_r == bool(term), (seed, t, a)
        if term_r:
            ended = True
            assert abs(float(r)) == 1.0  # the ±1 fork reward
            break
    # the ±1 branch itself: teleport in front of an object and pick it up
    if not ended:
        enc = np.asarray(ref.grid.encode())
        from minigrid_tpu.core import constants as C2

        objs = np.argwhere(
            ~np.isin(enc[..., 0],
                     [C2.OBJECT_TO_IDX["wall"], C2.OBJECT_TO_IDX["empty"]])
        )
        ox, oy = objs[0]
        ref.grid.set(ox - 1, oy, None)
        ref.agent_pos = (ox - 1, oy)
        ref.agent_dir = 0
        ref.carrying = None
        state = from_reference(ref).replace(
            extra=state.extra, step_count=state.step_count)
        o_r, r_r, term_r, _, _ = ref.step(3)  # pickup
        o, state, r, term, _, _ = step(state, jnp.int32(3))
        assert term_r and bool(term)
        assert abs(r_r - float(r)) < 1e-6 and abs(r_r) == 1.0


@requires_reference
@pytest.mark.parametrize("seed", range(3))
def test_blocks_gripper_move_parity(seed):
    """BlocksDataset stack-moving mechanics (blocks_dataset.py:148-183):
    mirror our initial block layout onto a reference env, replay our
    scripted moves through its base_step ([start, grab, end, letgo]
    sequence, :230-232), and require identical grids after every move."""
    from minigrid.core.world_object import Block
    from minigrid.envs.blocks_dataset import BlocksDataset as RefBlocks

    import minigrid_tpu
    from minigrid_tpu.core import constants as C
    from minigrid_tpu.core.grid_ops import unpack_np

    env = minigrid_tpu.make("BlocksDataset-v0", max_actions=4)
    params = env.default_params
    _, state = env.reset(jax.random.PRNGKey(seed), params)
    colors = np.asarray(state.extra["colors"])
    names = [C.IDX_TO_COLOR[int(c)] for c in colors]

    ref = RefBlocks(max_actions=4)
    ref.render_mode = None  # the fork hardwires "human"
    ref.reset(seed=0)  # builds the walls; interior overwritten below
    for x in range(1, ref.size - 1):
        for y in range(1, ref.size - 1):
            ref.grid.set(x, y, None)
    ref.block_pos = {}
    for i, nm in enumerate(names):
        ref.grid.set(i + 1, ref.size - 2, Block(nm))
        ref.block_pos[nm] = (i + 1, ref.size - 2)
    ref.starting_blocks = names
    ref.is_grabbing_block = False
    ref.curr_gripper_pos = (0, 0)
    np.testing.assert_array_equal(np.asarray(ref.grid.encode()),
                                  unpack_np(np.asarray(state.grid)))

    step = jax.jit(lambda s, a: env.step(s, a, params))
    for t in range(4):
        prev = int(state.extra["curr"])
        _, state, r, te, tr, _ = step(state, jnp.int32(0))
        bi, end_col = (int(v) for v in np.asarray(state.extra["trace"])[prev])
        start_pos = ref.block_pos[names[bi]]
        for row in range(ref.size - 2, -1, -1):
            if not isinstance(ref.grid.get(end_col, row), Block):
                end_row = row
                break
        for a in [tuple(start_pos), "grab", (end_col, end_row), "letgo"]:
            ref.base_step(a)
        np.testing.assert_array_equal(np.asarray(ref.grid.encode()),
                                      unpack_np(np.asarray(state.grid)),
                                      err_msg=f"seed {seed} move {t}")
        if bool(te):
            break
