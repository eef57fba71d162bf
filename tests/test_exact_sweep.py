"""Full-registry seed-exact sweep.

For EVERY registered id (minus the four dataset envs, which are not
seed-deterministic upstream), construct the REFERENCE env from the same
class name + preset kwargs and assert `reset_exact(make(id), seed)`
reproduces `ref.reset(seed=seed)`'s grid, agent pose, and mission surface
bit-for-bit.  This is the total version of tests/test_exact.py's
per-family cases: every preset (sizes, quarters, door counts, obstacle
types) goes through the host replay path.
"""

from __future__ import annotations

import contextlib
import io

import numpy as np

from minigrid_tpu.core.grid_ops import unpack_np
import pytest

from minigrid_tpu.utils.exact import reset_exact, supported
from tests.conftest import requires_reference

_DATASET_IDS = {
    "BlocksDataset-v0",
    "ContrastiveDataset-v0",
    "ContrastiveTrajectoryDataset-v0",
    "DirectionsDataset-v0",
}

# our class name -> (reference class, extra kwargs); defaults to same name
_CLS_ALIASES = {
    "GoToDoorBabyAI": ("GoToDoor", {}),
    "OpenDoorColor": ("OpenDoor", {"select_by": "color"}),
    "OpenDoorLoc": ("OpenDoor", {"select_by": "loc"}),
    "PickupDistDebug": ("PickupDist", {"debug": True}),
}


def _ref_class(name: str, babyai: bool):
    """BabyAI class names shadow MiniGrid families (Unlock, KeyCorridor,
    GoToDoor...), so resolution is scoped to the right module tree."""
    import minigrid.envs as R
    import minigrid.envs.babyai as RB

    name, extra = _CLS_ALIASES.get(name, (name, {}))
    if babyai:
        return getattr(RB, name), extra
    if hasattr(R, name):
        return getattr(R, name), extra
    if hasattr(R, name + "Env"):
        return getattr(R, name + "Env"), extra
    # not re-exported from minigrid.envs (ObstructedMaze presets, fork envs)
    import importlib

    for mod_name in ("obstructedmaze", "negated_goals", "playground"):
        mod = importlib.import_module(f"minigrid.envs.{mod_name}")
        if hasattr(mod, name):
            return getattr(mod, name), extra
    raise AttributeError(name)


def _ref_kwargs(kwargs: dict):
    """Translate our registry kwargs to the reference's constructor."""
    out = dict(kwargs)
    if "obstacle_type" in out:
        from minigrid.core.world_object import Lava, Wall

        out["obstacle_type"] = {"lava": Lava, "wall": Wall}[out["obstacle_type"]]
    return out


def _ids():
    import minigrid_tpu

    return [i for i in minigrid_tpu.registered_ids() if i not in _DATASET_IDS]


@requires_reference
@pytest.mark.parametrize("env_id", _ids())
def test_exact_sweep(env_id):
    import minigrid_tpu
    from minigrid_tpu.registry import spec

    from minigrid_tpu.babyai.level import BabyAILevel

    s = spec(env_id)
    env = minigrid_tpu.make(env_id)
    assert supported(env), env_id
    ref_cls, extra = _ref_class(type(env).__name__,
                                isinstance(env, BabyAILevel))
    ref = ref_cls(**_ref_kwargs(s.kwargs), **extra)
    unseeded_mission = "Negated" in type(env).__name__  # global-random coin
    for seed in (0, 3):
        with contextlib.redirect_stdout(io.StringIO()):
            obs_ref, _ = ref.reset(seed=seed)
        if getattr(env, "start_carrying", False):
            # reference quirk: PutNext(start_carrying).reset removes the
            # carried object from the grid AFTER computing the returned
            # obs (putnext.py:84-93) — the first obs is stale.  Compare
            # against the reference's CURRENT state instead.
            obs_ref = ref.gen_obs()
        obs, state = reset_exact(env, seed)
        np.testing.assert_array_equal(
            np.asarray(ref.grid.encode(), np.uint8),
            unpack_np(np.asarray(state.grid)),
            err_msg=f"{env_id} seed {seed}")
        assert tuple(np.asarray(state.agent_pos)) == tuple(ref.agent_pos), (
            env_id, seed)
        assert int(state.agent_dir) == ref.agent_dir, (env_id, seed)
        np.testing.assert_array_equal(obs_ref["image"], np.asarray(obs["image"]),
                                      err_msg=f"{env_id} seed {seed}")
        ours = env.mission_text(np.asarray(state.mission))
        if ref.mission and not unseeded_mission:  # Playground's mission is ""
            assert ours == ref.mission, (env_id, seed, ours, ref.mission)
