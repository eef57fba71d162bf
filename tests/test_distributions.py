"""Generator distribution-equivalence vs the reference (VERDICT r1 task 2).

The on-device generators are jax.random rewrites — closed forms, masked
one-shot draws, permutation prefixes — of the reference's Python rejection
loops.  Individual seeds cannot match (different RNG streams by design; see
utils/exact.py for the seed-exact mode); what must match is the *layout
distribution*.  For each family this suite draws N seeds from both
implementations and compares matched layout statistics with two-sample
chi-squared homogeneity tests: wall/door/key positions for DoorKey, river
sets and openings for Crossing, gap positions for FourRooms, the
connect_all door graph for RoomGrid (the closed-form permutation-prefix +
reachability replacement of roomgrid.py:336-394), the room chain for
MultiRoom, and target/distractor/mission statistics for BabyAI levels.

A systematically skewed generator fails these tests; sampling noise does
not (alpha = 1e-4 per statistic, N = 1500-2000 per side).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pytest
from scipy import stats as sps

import jax
import jax.numpy as jnp

import minigrid_tpu
from minigrid_tpu.core.grid_ops import unpack_np
from minigrid_tpu.core import constants as C
from tests.conftest import requires_reference

T = C.OBJECT_TO_IDX
ALPHA = 1e-4


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------


def chi2_same(obs_a, obs_b, label: str, alpha: float = ALPHA) -> None:
    """Two-sample chi-squared homogeneity test over hashable observations.
    Rare categories (expected < 5) are pooled so the test stays valid."""
    ca, cb = Counter(obs_a), Counter(obs_b)
    cats = sorted(set(ca) | set(cb), key=lambda c: -(ca[c] + cb[c]))
    na, nb = sum(ca.values()), sum(cb.values())
    rows_a, rows_b, pool_a, pool_b = [], [], 0, 0
    for c in cats:
        tot = ca[c] + cb[c]
        exp_min = tot * min(na, nb) / (na + nb)
        if exp_min >= 5:
            rows_a.append(ca[c])
            rows_b.append(cb[c])
        else:
            pool_a += ca[c]
            pool_b += cb[c]
    if pool_a + pool_b >= 10:
        rows_a.append(pool_a)
        rows_b.append(pool_b)
    if len(rows_a) < 2:
        return  # degenerate statistic (single category): nothing to test
    chi2, p, dof, _ = sps.chi2_contingency([rows_a, rows_b])
    assert p > alpha, (
        f"{label}: distributions differ (chi2={chi2:.1f}, dof={dof}, p={p:.2e})"
    )


def ref_samples(make_ref, extract, n: int):
    env = make_ref()
    out = []
    for seed in range(n):
        env.reset(seed=seed)
        g = np.asarray(env.grid.encode(), np.uint8)
        out.append(extract(g, np.asarray(env.agent_pos), int(env.agent_dir),
                           env))
    return out


def tpu_samples(env_id_or_env, extract, n: int, batch: int = 250):
    env = (minigrid_tpu.make(env_id_or_env)
           if isinstance(env_id_or_env, str) else env_id_or_env)
    params = env.default_params
    reset = jax.jit(jax.vmap(lambda k: env.reset(k, params)))
    out = []
    for i in range(0, n, batch):
        keys = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(99), i),
                                min(batch, n - i))
        obs, state = reset(keys)
        grids = unpack_np(np.asarray(state.grid))
        poss = np.asarray(state.agent_pos)
        dirs = np.asarray(state.agent_dir)
        for j in range(grids.shape[0]):
            out.append(extract(grids[j], poss[j], int(dirs[j]), env))
    return out


def compare(make_ref, env_id, extract_keys, n=2000, ref_n=None):
    """Collect both sides once, then chi2-compare every named statistic."""
    extract = lambda g, p, d, e: {k: f(g, p, d, e)
                                  for k, f in extract_keys.items()}
    a = ref_samples(make_ref, extract, ref_n or n)
    b = tpu_samples(env_id, extract, n)
    for k in extract_keys:
        chi2_same([s[k] for s in a], [s[k] for s in b], f"{env_id}:{k}")


# -- shared extractors -------------------------------------------------------


def cells_of(g, t):
    return np.argwhere(g[..., 0] == t)


def agent_cell(g, pos, d, env):
    return (int(pos[0]), int(pos[1]))


def agent_dir_stat(g, pos, d, env):
    return d


# ---------------------------------------------------------------------------
# families
# ---------------------------------------------------------------------------


@requires_reference
def test_doorkey_distribution():
    """Wall split, door slot, key cell, agent pose (doorkey.py:76-99)."""
    from minigrid.envs.doorkey import DoorKeyEnv

    def split_col(g, pos, d, env):
        door = cells_of(g, T["door"])[0]
        return int(door[0])

    def door_y(g, pos, d, env):
        return int(cells_of(g, T["door"])[0][1])

    def key_cell(g, pos, d, env):
        k = cells_of(g, T["key"])[0]
        return (int(k[0]), int(k[1]))

    compare(
        lambda: DoorKeyEnv(size=8),
        "MiniGrid-DoorKey-8x8-v0",
        {"split": split_col, "door_y": door_y, "key": key_cell,
         "agent": agent_cell, "dir": agent_dir_stat,
         "joint": lambda g, p, d, e: (split_col(g, p, d, e),
                                      door_y(g, p, d, e))},
    )


@requires_reference
def test_crossing_distribution():
    """River set + carved openings (crossing.py:139-178)."""
    from minigrid.envs.crossing import CrossingEnv

    def rivers(g, pos, d, env):
        size = g.shape[0]
        cols = tuple(x for x in range(2, size - 2, 2)
                     if (g[x, 1:size - 1, 0] == T["lava"]).sum() == size - 3)
        rows = tuple(y for y in range(2, size - 2, 2)
                     if (g[1:size - 1, y, 0] == T["lava"]).sum() == size - 3)
        return (cols, rows)

    def openings(g, pos, d, env):
        cols, rows = rivers(g, pos, d, env)
        out = []
        for x in cols:
            ys = [y for y in range(1, g.shape[1] - 1)
                  if g[x, y, 0] != T["lava"]]
            out.extend((x, y) for y in ys if y not in rows)
        for y in rows:
            xs = [x for x in range(1, g.shape[0] - 1)
                  if g[x, y, 0] != T["lava"]]
            out.extend((x, y) for x in xs if x not in cols)
        return tuple(sorted(out))

    compare(
        lambda: CrossingEnv(size=9, num_crossings=2),
        "MiniGrid-LavaCrossingS9N2-v0",
        {"rivers": rivers, "openings": openings},
    )


@requires_reference
def test_fourrooms_distribution():
    """Gap positions + agent/goal placement (fourrooms.py:79-128)."""
    from minigrid.envs.fourrooms import FourRoomsEnv

    def gaps(g, pos, d, env):
        # a gap is any non-wall cell on the two dividing lines; extraction is
        # identical on both sides, so goal/agent coincidence is harmless
        size = g.shape[0]
        mid = size // 2
        out = [(mid, y) for y in range(1, size - 1)
               if g[mid, y, 0] != T["wall"]]
        out += [(x, mid) for x in range(1, size - 1)
                if g[x, mid, 0] != T["wall"]]
        return tuple(sorted(set(out)))

    def goal_cell(g, pos, d, env):
        go = cells_of(g, T["goal"])
        return (int(go[0][0]), int(go[0][1])) if len(go) else None

    compare(
        lambda: FourRoomsEnv(),
        "MiniGrid-FourRooms-v0",
        {"gaps": gaps, "goal": goal_cell, "agent": agent_cell,
         "dir": agent_dir_stat},
        n=1500, ref_n=1500,
    )


@requires_reference
def test_lavagap_distribution():
    from minigrid.envs.lavagap import LavaGapEnv

    def gap(g, pos, d, env):
        size = g.shape[0]
        col = [x for x in range(2, size - 2)
               if (g[x, 1:size - 1, 0] == T["lava"]).sum() >= size - 3][0]
        y = [y for y in range(1, size - 1) if g[col, y, 0] != T["lava"]][0]
        return (col, y)

    compare(lambda: LavaGapEnv(size=7), "MiniGrid-LavaGapS7-v0",
            {"gap": gap})


@requires_reference
def test_keycorridor_connect_all_distribution():
    """The connect_all closed form (core/roomgrid.py vs reference
    roomgrid.py:336-394): compares the full door-cell graph, the locked-door
    room, key room, per-level door count, and target/agent placement."""
    from minigrid.envs.keycorridor import KeyCorridorEnv

    def door_cells(g, pos, d, env):
        return tuple(sorted((int(x), int(y))
                            for x, y in cells_of(g, T["door"])))

    def num_doors(g, pos, d, env):
        return len(cells_of(g, T["door"]))

    def locked_room(g, pos, d, env):
        locked = [(x, y) for x, y in cells_of(g, T["door"])
                  if g[x, y, 2] == C.STATE_TO_IDX["locked"]]
        (x, y) = locked[0]
        return int(y) // 2  # room row of the locked door (room_size 3)

    def key_cell(g, pos, d, env):
        k = cells_of(g, T["key"])[0]
        return (int(k[0]), int(k[1]))

    def target_cell(g, pos, d, env):
        b = cells_of(g, T["ball"])
        return (int(b[0][0]), int(b[0][1])) if len(b) else None

    compare(
        lambda: KeyCorridorEnv(room_size=3, num_rows=3),
        minigrid_tpu.make("MiniGrid-KeyCorridorS3R3-v0"),
        {"doors": door_cells, "num_doors": num_doors,
         "locked_room": locked_room, "key": key_cell,
         "target": target_cell, "agent": agent_cell},
        n=1500, ref_n=1500,
    )


@requires_reference
def test_multiroom_chain_distribution():
    """Room-chain builder vs multiroom.py:187-281: door cells/colors, goal,
    agent, wall mass."""
    from minigrid.envs.multiroom import MultiRoomEnv

    def doors(g, pos, d, env):
        return tuple(sorted((int(x), int(y), int(g[x, y, 1]))
                            for x, y in cells_of(g, T["door"])))

    def num_walls(g, pos, d, env):
        return int((g[..., 0] == T["wall"]).sum())

    def goal_cell(g, pos, d, env):
        go = cells_of(g, T["goal"])
        return (int(go[0][0]), int(go[0][1]))

    def door_colors(g, pos, d, env):
        return tuple(sorted(int(g[x, y, 1])
                            for x, y in cells_of(g, T["door"])))

    import minigrid_tpu.envs as E

    compare(
        lambda: MultiRoomEnv(minNumRooms=2, maxNumRooms=3),
        E.MultiRoomEnv(minNumRooms=2, maxNumRooms=3),
        {"doors": doors, "walls": num_walls, "goal": goal_cell,
         "colors": door_colors, "agent": agent_cell},
        n=1500, ref_n=1500,
    )


@requires_reference
def test_fetch_object_sampling_distribution():
    """Distinct (type, color) object draws (fetch.py:103-127) vs the
    permutation-prefix rewrite (core/sampling.py)."""
    from minigrid.envs.fetch import FetchEnv

    def objs(g, pos, d, env):
        out = []
        for t in ("key", "ball"):
            for x, y in cells_of(g, T[t]):
                out.append((t, int(g[x, y, 1])))
        return tuple(sorted(out))

    compare(
        lambda: FetchEnv(size=8, numObjs=3),
        "MiniGrid-Fetch-8x8-N3-v0",
        {"objs": objs},
    )


@requires_reference
def test_babyai_gotolocal_distribution():
    """BabyAI level sampling (goto.py GoToLocal): distractor multiset,
    target desc, agent pose, mission surface."""
    from minigrid.envs.babyai.goto import GoToLocal

    def obj_multiset(g, pos, d, env):
        out = []
        for t in ("key", "ball", "box"):
            for x, y in cells_of(g, T[t]):
                out.append((t, int(g[x, y, 1])))
        return tuple(sorted(out))

    # mission surfaces need env-side state; compared separately below.
    compare(
        lambda: GoToLocal(),
        "BabyAI-GoToLocal-v0",
        {"objs": obj_multiset, "agent": agent_cell, "dir": agent_dir_stat},
        n=1500, ref_n=1500,
    )


@requires_reference
def test_babyai_gotolocal_mission_distribution():
    """Mission-string distribution for GoToLocal (levelgen target choice)."""
    from minigrid.envs.babyai.goto import GoToLocal

    ref = GoToLocal()
    a = []
    for seed in range(1500):
        ref.reset(seed=seed)
        a.append(ref.instrs.surface(ref))

    env = minigrid_tpu.make("BabyAI-GoToLocal-v0")
    params = env.default_params
    reset = jax.jit(jax.vmap(lambda k: env.reset(k, params)))
    b = []
    for i in range(0, 1500, 250):
        keys = jax.random.split(
            jax.random.fold_in(jax.random.PRNGKey(123), i), 250)
        obs, state = reset(keys)
        ms = np.asarray(obs["mission"])
        for j in range(ms.shape[0]):
            b.append(env.mission_text(ms[j]))
    chi2_same(a, b, "GoToLocal:mission")


def test_harness_detects_bias():
    """Power check: the chi2 harness must FAIL on a genuinely skewed
    generator at these sample sizes (guards against a vacuously-passing
    suite)."""
    rng = np.random.default_rng(0)
    uniform = list(rng.integers(0, 6, 2000))
    skewed = list(rng.choice(6, 2000, p=[0.25, 0.19, 0.14, 0.14, 0.14, 0.14]))
    with pytest.raises(AssertionError):
        chi2_same(uniform, skewed, "power-check")
    # and a same-distribution draw passes
    chi2_same(list(rng.integers(0, 6, 2000)),
              list(rng.integers(0, 6, 2000)), "null-check")


# ---------------------------------------------------------------------------
# exact-oracle comparisons (VERDICT r3 task 6)
#
# utils/exact.py replays the reference's np_random call order host-side, so
# its layouts ARE the reference distribution — comparing the production
# jax.random generators against reset_exact closes the distribution gap for
# every family without importing the reference at all.
# ---------------------------------------------------------------------------


def exact_samples(env, extract, n: int):
    from minigrid_tpu.utils.exact import reset_exact

    params = env.default_params
    out = []
    for seed in range(n):
        obs, state = reset_exact(env, seed, params)
        host = jax.tree_util.tree_map(np.asarray, state)
        out.append(extract(host, np.asarray(obs["mission"]), env))
    return out


def prod_samples(env, extract, n: int, batch: int = 250):
    params = env.default_params
    reset = jax.jit(jax.vmap(lambda k: env.reset(k, params)))
    out = []
    for i in range(0, n, batch):
        keys = jax.random.split(
            jax.random.fold_in(jax.random.PRNGKey(77), i), min(batch, n - i))
        obs, state = reset(keys)
        host = jax.tree_util.tree_map(np.asarray, state)
        ms = np.asarray(obs["mission"])
        for j in range(keys.shape[0]):
            s_j = jax.tree_util.tree_map(lambda x: x[j], host)
            out.append(extract(s_j, ms[j], env))
    return out


def compare_vs_exact(env_id, extract_keys, n=1500, exact_n=None):
    """Chi2-compare production jax generator stats vs reset_exact stats.

    extract fns take (state_slice, mission_codes, env) with numpy leaves."""
    env = minigrid_tpu.make(env_id)
    extract = lambda s, m, e: {k: f(s, m, e) for k, f in extract_keys.items()}
    a = exact_samples(env, extract, exact_n or n)
    b = prod_samples(env, extract, n)
    for k in extract_keys:
        chi2_same([s[k] for s in a], [s[k] for s in b], f"{env_id}:{k}")


def _g3(s):
    return unpack_np(s.grid)


def _cells(s, t):
    return np.argwhere(_g3(s)[..., 0] == T[t])


def _typed_multiset(s, types=("key", "ball", "box")):
    out = []
    for t in types:
        for x, y in _cells(s, t):
            out.append((t, int(_g3(s)[x, y, 1]), int(x), int(y)))
    return tuple(sorted(out))


def _agent(s, m, e):
    return (int(s.agent_pos[0]), int(s.agent_pos[1]))


def _dir(s, m, e):
    return int(s.agent_dir)


def _doors(s, m, e):
    return tuple(sorted(
        (int(x), int(y), int(_g3(s)[x, y, 1]), int(_g3(s)[x, y, 2]))
        for x, y in _cells(s, "door")))


def _mission_text(s, m, e):
    return e.mission_text(m)


def test_redbluedoors_distribution():
    """Red/blue door slots + agent pose (redbluedoors.py:69-93)."""

    def red_y(s, m, e):
        d = [p for p in _cells(s, "door")
             if _g3(s)[p[0], p[1], 1] == C.COLOR_TO_IDX["red"]][0]
        return (int(d[0]), int(d[1]))

    def blue_y(s, m, e):
        d = [p for p in _cells(s, "door")
             if _g3(s)[p[0], p[1], 1] == C.COLOR_TO_IDX["blue"]][0]
        return (int(d[0]), int(d[1]))

    compare_vs_exact(
        "MiniGrid-RedBlueDoors-6x6-v0",
        {"red": red_y, "blue": blue_y, "agent": _agent, "dir": _dir},
    )


def test_memory_distribution():
    """Start object draw + upper/lower match assignment (memory.py:77-149)."""

    def layout(s, m, e):
        return _typed_multiset(s, ("key", "ball"))

    compare_vs_exact(
        "MiniGrid-MemoryS7-v0",
        {"layout": layout, "agent": _agent},
    )


def test_memory_random_length_distribution():
    """Random hallway length variant (memory.py:106-109)."""

    def hallway_len(s, m, e):
        # rightmost non-wall column in the center row marks the hallway end
        row = _g3(s)[:, s.grid.shape[1] // 2, 0]
        return int(np.max(np.nonzero(row != T["wall"])[0]))

    def layout(s, m, e):
        return _typed_multiset(s, ("key", "ball"))

    compare_vs_exact(
        "MiniGrid-MemoryS13Random-v0",
        {"hallway": hallway_len, "layout": layout, "agent": _agent},
        n=1000,
    )


def test_lockedroom_distribution():
    """Locked/key room draws + colors (lockedroom.py:90-140)."""

    def locked_door(s, m, e):
        d = [p for p in _cells(s, "door")
             if _g3(s)[p[0], p[1], 2] == C.STATE_TO_IDX["locked"]][0]
        return (int(d[0]), int(d[1]), int(_g3(s)[d[0], d[1], 1]))

    def key(s, m, e):
        k = _cells(s, "key")[0]
        return (int(k[0]), int(k[1]), int(_g3(s)[k[0], k[1], 1]))

    def goal(s, m, e):
        g = _cells(s, "goal")[0]
        return (int(g[0]), int(g[1]))

    compare_vs_exact(
        "MiniGrid-LockedRoom-v0",
        {"locked": locked_door, "key": key, "goal": goal,
         "doors": _doors, "agent": _agent},
        n=1000,
    )


def test_obstructedmaze_1dlhb_distribution():
    """Door slot, blocking ball, hidden-key box + its contents
    (obstructedmaze.py:59-101, 129-160)."""

    def hidden_key(s, m, e):
        b = _cells(s, "box")[0]
        c = unpack_np(s.box_contains)[b[0], b[1]]
        return (int(b[0]), int(b[1]), int(c[0]), int(c[1]))

    def balls(s, m, e):
        return tuple(sorted((int(x), int(y), int(_g3(s)[x, y, 1]))
                            for x, y in _cells(s, "ball")))

    compare_vs_exact(
        "MiniGrid-ObstructedMaze-1Dlhb-v0",
        {"doors": _doors, "balls": balls, "hidden_key": hidden_key,
         "agent": _agent},
        n=1000,
    )


def test_obstructedmaze_full_distribution():
    """Full maze: door graph, ball/box placement aggregate
    (obstructedmaze.py:176-230)."""

    def boxes(s, m, e):
        return _typed_multiset(s, ("box",))

    def balls(s, m, e):
        return _typed_multiset(s, ("ball",))

    compare_vs_exact(
        "MiniGrid-ObstructedMaze-Full-v0",
        {"doors": _doors, "boxes": boxes, "balls": balls, "agent": _agent},
        n=800,
    )


def test_babyai_open_distribution():
    """Open family (open.py Open): door layout + mission surface."""
    compare_vs_exact(
        "BabyAI-Open-v0",
        {"doors": _doors, "agent": _agent, "mission": _mission_text},
        n=1000,
    )


def test_babyai_pickuploc_distribution():
    """PickupLoc (pickup.py): object multiset + loc-predicate missions."""

    def objs(s, m, e):
        return _typed_multiset(s)

    compare_vs_exact(
        "BabyAI-PickupLoc-v0",
        {"objs": objs, "agent": _agent, "mission": _mission_text},
        n=1000,
    )


def test_babyai_putnextlocal_distribution():
    """PutNextLocal (putnext.py): object multiset + a/b descriptor draw."""

    def objs(s, m, e):
        return _typed_multiset(s)

    compare_vs_exact(
        "BabyAI-PutNextLocal-v0",
        {"objs": objs, "agent": _agent, "mission": _mission_text},
        n=1000,
    )


def test_babyai_unlock_distribution():
    """Unlock (unlock.py): locked door draw, key room, distractors."""

    def key(s, m, e):
        ks = _cells(s, "key")
        return tuple(sorted((int(x), int(y), int(_g3(s)[x, y, 1]))
                            for x, y in ks))

    compare_vs_exact(
        "BabyAI-UnlockLocal-v0",
        {"doors": _doors, "key": key, "agent": _agent,
         "mission": _mission_text},
        n=1000,
    )
