"""BabyAI suite tests: scripted task solves + reference lockstep parity."""

from __future__ import annotations

from collections import deque

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import minigrid_tpu
from minigrid_tpu.core.grid_ops import unpack_np
from minigrid_tpu.babyai import verifier as V
from minigrid_tpu.core import constants as C
from tests.conftest import requires_reference

T = C.OBJECT_TO_IDX
LEFT, RIGHT, FWD, PICKUP, DROP, TOGGLE = 0, 1, 2, 3, 4, 5


def nav_actions(grid: np.ndarray, start, start_dir, target) -> list[int] | None:
    """Host BFS over (pos, dir) emitting turn/forward actions that put the
    agent AT `target`'s 4-neighbor facing it."""
    w, h, _ = grid.shape
    passable = np.isin(grid[..., 0], [T["empty"], T["goal"], T["floor"]])
    passable |= (grid[..., 0] == T["door"]) & (grid[..., 2] == 0)
    dirs = [(1, 0), (0, 1), (-1, 0), (0, -1)]
    q = deque([(tuple(start), int(start_dir), [])])
    seen = {(tuple(start), int(start_dir))}
    while q:
        pos, d, acts = q.popleft()
        fwd = (pos[0] + dirs[d][0], pos[1] + dirs[d][1])
        if fwd == tuple(target):
            return acts
        if len(acts) > 200:
            continue
        cand = [((pos, (d + 3) % 4), LEFT), ((pos, (d + 1) % 4), RIGHT)]
        if 0 <= fwd[0] < w and 0 <= fwd[1] < h and passable[fwd[0], fwd[1]]:
            cand.append(((fwd, d), FWD))
        for (np_, nd), a in cand:
            if (np_, nd) not in seen:
                seen.add((np_, nd))
                q.append((np_, nd, acts + [a]))
    return None


def drive(env, state, params, actions):
    step = jax.jit(lambda s, a: env.step(s, a, params))
    r = te = tr = None
    for a in actions:
        obs, state, r, te, tr, _ = step(state, jnp.int32(a))
    return state, float(r), bool(te), bool(tr)


def test_goto_scripted_success():
    env = minigrid_tpu.make("BabyAI-GoToRedBall-v0")
    params = env.default_params
    _, state = env.reset(jax.random.PRNGKey(0), params)
    g = unpack_np(np.asarray(state.grid))
    target = np.argwhere((g[..., 0] == T["ball"])
                         & (g[..., 1] == C.COLOR_TO_IDX["red"]))[0]
    acts = nav_actions(g, np.asarray(state.agent_pos), int(state.agent_dir),
                       target)
    assert acts is not None
    state, r, te, tr = drive(env, state, params, acts)
    assert te and r > 0


def test_pickup_scripted_success():
    env = minigrid_tpu.make("BabyAI-OneRoomS8-v0")
    params = env.default_params
    _, state = env.reset(jax.random.PRNGKey(1), params)
    g = unpack_np(np.asarray(state.grid))
    target = np.argwhere(g[..., 0] == T["ball"])[0]
    acts = nav_actions(g, np.asarray(state.agent_pos), int(state.agent_dir),
                       target)
    state, r, te, tr = drive(env, state, params, acts + [PICKUP])
    assert te and r > 0


def test_goto_wrong_object_no_success():
    env = minigrid_tpu.make("BabyAI-GoToRedBall-v0")
    params = env.default_params
    _, state = env.reset(jax.random.PRNGKey(0), params)
    g = unpack_np(np.asarray(state.grid))
    # find some non-red-ball object
    others = np.argwhere(
        np.isin(g[..., 0], [T["ball"], T["box"], T["key"]])
        & ~((g[..., 0] == T["ball"]) & (g[..., 1] == C.COLOR_TO_IDX["red"]))
    )
    if len(others) == 0:
        pytest.skip("level has no distractors this seed")
    acts = nav_actions(g, np.asarray(state.agent_pos), int(state.agent_dir),
                       others[0])
    if acts is None:
        pytest.skip("distractor unreachable")
    state, r, te, tr = drive(env, state, params, acts)
    assert not te


def test_open_two_doors_order():
    """Second door first -> continue; first then second -> success
    (verifier.py:449-487)."""
    env = minigrid_tpu.make("BabyAI-OpenTwoDoors-v0")
    params = env.default_params
    _, state = env.reset(jax.random.PRNGKey(3), params)
    mission = np.asarray(state.mission)
    c1 = mission[7 + 1]  # d1[0] color
    c2 = mission[7 + 2 * 3 + 1]  # d1[2] color (operand b clause)
    g = unpack_np(np.asarray(state.grid))
    doors = {int(g[x, y, 1]): (x, y) for x, y in np.argwhere(g[..., 0] == T["door"])}
    d1_pos, d2_pos = doors[int(c1)], doors[int(c2)]

    # open door2 first
    acts = nav_actions(g, np.asarray(state.agent_pos), int(state.agent_dir),
                       d2_pos)
    state2, r, te, tr = drive(env, state, params, acts + [TOGGLE])
    assert not te  # b succeeded but a hasn't -> continue (before semantics)

    # now open door1 then door2 (door2 is currently open; close it first? the
    # instruction only requires door2 open AFTER door1 — reopen sequence)
    g2 = unpack_np(np.asarray(state2.grid))
    acts1 = nav_actions(g2, np.asarray(state2.agent_pos),
                        int(state2.agent_dir), d1_pos)
    state3, r, te, tr = drive(env, state2, params, acts1 + [TOGGLE])
    assert not te
    g3 = unpack_np(np.asarray(state3.grid))
    acts2 = nav_actions(g3, np.asarray(state3.agent_pos),
                        int(state3.agent_dir), d2_pos)
    # door2 is open; toggling closes it, then toggle again opens -> success
    state4, r, te, tr = drive(env, state3, params, acts2 + [TOGGLE, TOGGLE])
    assert te and r > 0


def test_putnext_scripted():
    env = minigrid_tpu.make("BabyAI-PutNextS5N1-v0")
    params = env.default_params
    _, state = env.reset(jax.random.PRNGKey(2), params)
    mission = np.asarray(state.mission)
    g = unpack_np(np.asarray(state.grid))
    # move object = d1[0]; fixed = d2[0]
    mt, mc = mission[7], mission[8]
    ft, fc = mission[19], mission[20]
    type_map = {1: T["box"], 2: T["ball"], 3: T["key"], 4: T["door"]}
    mv = np.argwhere((g[..., 0] == type_map[int(mt)]) & (g[..., 1] == mc))[0]
    fx = np.argwhere((g[..., 0] == type_map[int(ft)]) & (g[..., 1] == fc))[0]

    acts = nav_actions(g, np.asarray(state.agent_pos), int(state.agent_dir), mv)
    state, r, te, tr = drive(env, state, params, acts + [PICKUP])
    assert not te
    # navigate to a cell adjacent to fixed object and drop
    g2 = unpack_np(np.asarray(state.grid))
    w, h, _ = g2.shape
    for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        cell = (fx[0] + dx, fx[1] + dy)
        if not (0 <= cell[0] < w and 0 <= cell[1] < h):
            continue
        if g2[cell[0], cell[1], 0] != T["empty"]:
            continue
        acts2 = nav_actions(g2, np.asarray(state.agent_pos),
                            int(state.agent_dir), cell)
        if acts2 is not None:
            state, r, te, tr = drive(env, state, params, acts2 + [DROP])
            break
    assert te and r > 0


def test_putnext_relocated_fixed_object():
    """Relocating the FIXED object before completing PutNext must still
    allow success at its NEW position: the reference re-finds desc_fixed
    members on the grid after every drop action (verifier.py:205-212 via
    roomgrid_level.py:89-91), so the packed tracked2 plane must follow
    pickup/drop moves of desc2 objects (carry2 flag), not lose them."""
    env = minigrid_tpu.make("BabyAI-PutNextS5N1-v0")
    params = env.default_params
    state = mission = None
    for seed in range(16):
        _, s = env.reset(jax.random.PRNGKey(seed), params)
        m = np.asarray(s.mission)
        # distinct (type, color) for move vs fixed so the desc planes are
        # disjoint and the test unambiguously tracks the fixed object
        if (int(m[7]), int(m[8])) != (int(m[19]), int(m[20])):
            state, mission = s, m
            break
    assert state is not None
    type_map = {1: T["box"], 2: T["ball"], 3: T["key"]}
    mt, mc = int(mission[7]), int(mission[8])
    ft, fc = int(mission[19]), int(mission[20])
    g = unpack_np(np.asarray(state.grid))
    w, h, _ = g.shape
    fx = np.argwhere((g[..., 0] == type_map[ft]) & (g[..., 1] == fc))[0]

    # 1. pick up the FIXED object
    acts = nav_actions(g, np.asarray(state.agent_pos), int(state.agent_dir), fx)
    assert acts is not None
    state, r, te, tr = drive(env, state, params, acts + [PICKUP])
    assert not te

    # 2. relocate it: drop at an empty cell far (L1 >= 4) from its old cell,
    # so no cell adjacent to the new position is adjacent to the old one
    g2 = unpack_np(np.asarray(state.grid))
    new_pos = None
    for cell in np.argwhere(g2[..., 0] == T["empty"]):
        if abs(cell[0] - fx[0]) + abs(cell[1] - fx[1]) < 4:
            continue
        acts2 = nav_actions(g2, np.asarray(state.agent_pos),
                            int(state.agent_dir), cell)
        if acts2 is not None:
            state, r, te, tr = drive(env, state, params, acts2 + [DROP])
            new_pos = cell
            break
    assert new_pos is not None and not te

    # 3. pick up the MOVE object
    g3 = unpack_np(np.asarray(state.grid))
    mv = np.argwhere((g3[..., 0] == type_map[mt]) & (g3[..., 1] == mc))[0]
    acts3 = nav_actions(g3, np.asarray(state.agent_pos), int(state.agent_dir),
                        mv)
    assert acts3 is not None
    state, r, te, tr = drive(env, state, params, acts3 + [PICKUP])
    assert not te

    # 4. drop it 4-adjacent to the fixed object's NEW position -> success
    g4 = unpack_np(np.asarray(state.grid))
    done = False
    for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        cell = (new_pos[0] + dx, new_pos[1] + dy)
        if not (0 <= cell[0] < w and 0 <= cell[1] < h):
            continue
        if g4[cell[0], cell[1], 0] != T["empty"]:
            continue
        acts4 = nav_actions(g4, np.asarray(state.agent_pos),
                            int(state.agent_dir), cell)
        if acts4 is not None:
            state, r, te, tr = drive(env, state, params, acts4 + [DROP])
            done = True
            break
    assert done
    assert te and r > 0, (r, te)


def test_goto_stale_position_quirk():
    """Reference quirk (roomgrid_level.py:89-91): object positions visible to
    the verifier refresh only on DROP, so a picked-up object keeps
    satisfying GoTo at its *vacated* cell.

    Observable via a BEFORE sequence "pick up the red ball, then go to the
    red ball": on the pickup step, clause A succeeds and BeforeInstr
    immediately verifies clause B on the same action
    (verifier.py:474-480) — which succeeds ONLY because the ball's tracked
    position is stale (the front cell is empty; no red ball remains on the
    grid).  An implementation without stale tracking can never finish this
    instruction."""
    from minigrid_tpu.babyai.level import flatten_instr

    env = minigrid_tpu.make("BabyAI-GoToRedBallNoDists-v0")
    params = env.default_params
    _, state = env.reset(jax.random.PRNGKey(0), params)
    g = unpack_np(np.asarray(state.grid))
    target = np.argwhere((g[..., 0] == T["ball"])
                         & (g[..., 1] == C.COLOR_TO_IDX["red"]))[0]

    # Override the episode's instruction: BEFORE(Pickup(red ball),
    # GoTo(red ball)).
    ball = V.OBJ_TYPES.index("ball") + 1
    red = C.COLOR_TO_IDX["red"]
    instr = V.seq_instr(
        V.S_BEFORE,
        V.single_clause(V.K_PICKUP, V.desc(ball, red)),
        V.single_clause(V.K_GOTO, V.desc(ball, red)),
    )
    room_mask = env.agent_room_mask({"agent_pos": state.agent_pos}, params)
    vs = V.init_verifier_state(state.grid, instr, state.agent_pos,
                               state.agent_dir, room_mask)
    state = state.replace(
        extra={"instr": instr, "vs": vs},
        mission=flatten_instr(instr, jnp.zeros(8, jnp.int32)),
    )

    acts = nav_actions(g, np.asarray(state.agent_pos), int(state.agent_dir),
                       target)
    assert acts is not None
    step = jax.jit(lambda s, a: env.step(s, a, params))
    for a in acts:
        _, state, r, te, tr, _ = step(state, jnp.int32(a))
        # facing the ball does NOT succeed: clause A (pickup) is incomplete
        assert not bool(te) and not bool(tr)
    # Pickup: A completes; B (GoTo) succeeds the same step purely via the
    # stale position of the now-carried ball.
    _, state, r, te, tr, _ = step(state, jnp.int32(PICKUP))
    assert bool(te) and float(r) > 0, (float(r), bool(te))
    # Sanity: pickup removed the only red ball from the grid, so clause B's
    # success can only have come from the stale tracked position.
    g_end = unpack_np(np.asarray(state.grid))
    assert ((g_end[..., 0] == T["ball"])
            & (g_end[..., 1] == C.COLOR_TO_IDX["red"])).sum() == 0
    assert int(state.carrying[0]) == T["ball"]


@requires_reference
@pytest.mark.parametrize("eid,seeds", [
    ("BabyAI-GoToRedBallNoDists-v0", 3),
    ("BabyAI-OneRoomS8-v0", 3),
    ("BabyAI-PutNextLocalS5N3-v0", 2),
    ("BabyAI-OpenRedDoor-v0", 2),
])
def test_babyai_lockstep_parity(eid, seeds):
    """Lower a reference BabyAI episode to an EnvState + InstrCode and assert
    identical rewards/terminations under a shared action stream."""
    import minigrid.envs.babyai as RB
    from minigrid.envs.babyai.core import verifier as RefV

    from minigrid_tpu.babyai.level import BabyAILevel
    from minigrid_tpu.utils.convert import from_reference

    ref_cls = {
        "BabyAI-GoToRedBallNoDists-v0": RB.GoToRedBallNoDists,
        "BabyAI-OneRoomS8-v0": RB.OneRoomS8,
        "BabyAI-PutNextLocalS5N3-v0": lambda: RB.PutNextLocal(room_size=5,
                                                              num_objs=3),
        "BabyAI-OpenRedDoor-v0": RB.OpenRedDoor,
    }[eid]

    def conv_desc(d):
        tl = {None: 0, "box": 1, "ball": 2, "key": 3, "door": 4}[d.type]
        c = C.COLOR_TO_IDX[d.color] if d.color else 0
        loc = ([None, "left", "right", "front", "behind"].index(d.loc)
               if d.loc else 0)
        return np.asarray([tl, c, loc], np.int32)

    def conv_instr(instr):
        if isinstance(instr, RefV.GoToInstr):
            return V.single_clause(V.K_GOTO, conv_desc(instr.desc))
        if isinstance(instr, RefV.PickupInstr):
            return V.single_clause(V.K_PICKUP, conv_desc(instr.desc),
                                   strict=instr.strict)
        if isinstance(instr, RefV.OpenInstr):
            return V.single_clause(V.K_OPEN, conv_desc(instr.desc),
                                   strict=instr.strict)
        if isinstance(instr, RefV.PutNextInstr):
            return V.single_clause(V.K_PUTNEXT, conv_desc(instr.desc_move),
                                   conv_desc(instr.desc_fixed),
                                   strict=instr.strict)
        if isinstance(instr, RefV.AndInstr):
            return V.and_instr(conv_instr(instr.instr_a),
                               conv_instr(instr.instr_b))
        if isinstance(instr, RefV.BeforeInstr):
            return V.seq_instr(V.S_BEFORE, conv_instr(instr.instr_a),
                               conv_instr(instr.instr_b))
        if isinstance(instr, RefV.AfterInstr):
            return V.seq_instr(V.S_AFTER, conv_instr(instr.instr_a),
                               conv_instr(instr.instr_b))
        raise TypeError(instr)

    env = minigrid_tpu.make(eid)
    assert isinstance(env, BabyAILevel)
    params = env.default_params

    for seed in range(seeds):
        ref = ref_cls()
        ref.reset(seed=seed)
        state = from_reference(ref)
        instr = conv_instr(ref.instrs)
        room_mask = env.room_rect_mask(
            params,
            jnp.asarray(ref.agent_pos[0] // (env.room_size - 1)),
            jnp.asarray(ref.agent_pos[1] // (env.room_size - 1)),
        )
        vs = V.init_verifier_state(state.grid, instr, state.agent_pos,
                                   state.agent_dir, room_mask)
        state = state.replace(
            extra={"instr": instr, "vs": vs},
            max_steps=jnp.asarray(ref.max_steps, jnp.int32),
        )
        step = jax.jit(lambda s, a: env.step(s, a, params))
        rng = np.random.default_rng(seed)
        for t in range(min(ref.max_steps, 250)):
            a = int(rng.integers(0, 6))
            o_r, r_r, te_r, tr_r, _ = ref.step(a)
            o, state, r, te, tr, _ = step(state, jnp.int32(a))
            assert np.array_equal(o_r["image"], np.asarray(o["image"])), (eid, seed, t)
            assert abs(r_r - float(r)) < 1e-6, (eid, seed, t, a, r_r, float(r))
            assert te_r == bool(te) and tr_r == bool(tr), (eid, seed, t, a)
            if te_r or tr_r:
                break


@requires_reference
def test_babyai_done_actions_mode_parity():
    """BABYAI_DONE_ACTIONS verifier mode (verifier.py:25, 227-243) as
    EnvParams.babyai_done_actions: lockstep vs a reference process started
    with the env var set (it latches at import time, hence the subprocess)."""
    import os
    import subprocess
    import sys

    worker = os.path.join(os.path.dirname(__file__), "done_actions_worker.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    proc = subprocess.run(
        [sys.executable, worker], env=env, capture_output=True, text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "DONE-ACTIONS-OK" in proc.stdout


def test_packed_plane_roundtrip():
    """VerifierState planes are bit-packed uint32[K, W] (bit y of word
    [k, x] = cell (x, y)); pack/unpack must be exact inverses on a
    non-square plane, and the packer must be the same layout
    init_verifier_state stores (a GoTo instr's tracked1 plane equals the
    packed desc-match mask)."""
    import numpy as np

    key = jax.random.PRNGKey(7)
    m = jax.random.bernoulli(key, 0.3, (4, 11, 25))  # W=11, H=25
    p = V.pack_planes(m)
    assert p.dtype == jnp.uint32 and p.shape == (4, 11)
    assert bool(jnp.all(V.unpack_planes(p, 25) == m))
    # bit y of word x is cell (x, y)
    mn = np.asarray(m)
    pn = np.asarray(p)
    assert ((pn[2, 5] >> 13) & 1) == int(mn[2, 5, 13])
