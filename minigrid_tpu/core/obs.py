"""Egocentric partial-observation kernel.

The reference pipeline (``minigrid/minigrid_env.py:594-651``) is
slice -> rotate_left x (dir+1) -> process_vis -> carried-object overlay ->
encode.  Slice and rotation (grid.py:110-143) collapse here into ONE fused
gather: for view cell (vi, vj) the world coordinate is

    world = agent_pos + f_vec * (V-1-vj) + r_vec * (vi - V//2)

(the inverse of ``get_view_coords``, minigrid_env.py:425-450), with
out-of-bounds cells reading as grey walls (grid.py:139).  The shadow-casting
occlusion sweep ``process_vis`` (grid.py:291-328) is a short unrolled scanline
program over the static V×V view — all tensor ops, so the whole obs pipeline
vmaps over the env batch and fuses under jit.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core.grid_ops import pack_cells, unpack_cells
from minigrid_tpu.core.state import EnvParams, EnvState
from minigrid_tpu.core.step import _table_ranges, dir_to_vec, in_table

_SEE_BEHIND_RANGES = _table_ranges(C.SEE_BEHIND)
_WALL = np.asarray(C.WALL_TRIPLE)
# Grids are PACKED uint32 cell words (grid_ops.py); the whole obs pipeline
# — gather, rotation, occlusion, overlay — stays in the packed layout and
# unpacks only at the final encode, because the unpacked uint8[..., 3]
# layout pads its 3-wide minor dim onto 128-lane vector tiles (measured
# +23 us/step at batch 4096 just for rotating unpacked — PERF.md round 4).
# np scalar, NOT jnp: a module-level jnp constant would initialize the XLA
# backend at import time, breaking jax.distributed.initialize() ordering.
_WALL_PACKED = np.uint32(
    int(C.WALL_TRIPLE[0]) | (int(C.WALL_TRIPLE[1]) << 8)
    | (int(C.WALL_TRIPLE[2]) << 16))
_EMPTY = np.asarray(C.EMPTY_TRIPLE)
_DOOR = C.OBJECT_TO_IDX["door"]
_EMPTY_T = C.OBJECT_TO_IDX["empty"]


def view_world_coords(
    agent_pos: jnp.ndarray, agent_dir: jnp.ndarray, view_size: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """World (x, y) for every view cell; shapes (V, V) each, indexed [vi, vj].

    The agent sits at view cell (V//2, V-1) facing 'up' the view
    (minigrid_env.py:615, 623)."""
    v = view_size
    f0, f1 = dir_to_vec(agent_dir)  # forward (selects, not a table gather)
    r0, r1 = -f1, f0  # right (minigrid_env.py:409-415)
    vi = jnp.arange(v, dtype=jnp.int32)[:, None]  # (V, 1)
    vj = jnp.arange(v, dtype=jnp.int32)[None, :]  # (1, V)
    wx = agent_pos[0] + f0 * (v - 1 - vj) + r0 * (vi - v // 2)
    wy = agent_pos[1] + f1 * (v - 1 - vj) + r1 * (vi - v // 2)
    return wx, wy


# How the egocentric window is extracted.  'onehot' evaluates the window
# as a one-hot masked reduction (pure elementwise VPU work); 'matmul'
# evaluates the same two reductions as int8 dot_generals (exact — cell
# codes are < 127 — and eligible for the MXU's int8 path); 'gather' is
# the naive dynamic gather.  A batched TPU gather with per-env indices
# lowers to a serialized element-fetch kernel: measured 2.0 ms/step at
# batch 4096 on v5e — 40x the REST of the whole step program — while the
# one-hot reduction fuses with its consumers.  All impls are asserted
# equal over every direction × pose in
# tests/test_core.py::test_gather_impls_agree_all_dirs_all_poses and the
# bench smoke gate (tools/smoke.py).  MINIGRID_TPU_GATHER overrides.
import os as _os

GATHER_IMPL = _os.environ.get("MINIGRID_TPU_GATHER", "onehot")


def _view_exts(agent_pos, agent_dir, view_size: int):
    """Top-left world corner (topX, topY) of the UNROTATED view rectangle
    per facing direction (minigrid_env.py:452-483)."""
    half = view_size // 2
    px = agent_pos[0]
    py = agent_pos[1]
    d = agent_dir
    top_x = jnp.where(
        d == 0, px, jnp.where(
            d == 2, px - view_size + 1, px - half))
    top_y = jnp.where(
        d == 1, py, jnp.where(
            d == 3, py - view_size + 1, py - half))
    return top_x, top_y


def gather_view_onehot(
    grid: jnp.ndarray,
    agent_pos: jnp.ndarray,
    agent_dir: jnp.ndarray,
    view_size: int,
) -> jnp.ndarray:
    """One-hot separable window extraction + static rotation select, on
    PACKED uint32 cells: uint32[W, H] -> uint32[V, V].

    Per facing direction the view is an axis-aligned W-rect sliced at
    (topX, topY) then rotated (dir+1) times (grid.py:110-143); the rotation
    of a static V×V block is free (transpose/reverse fuse into layout), so
    the only dynamic work is the slice — evaluated as two one-hot masked
    reductions (rows then columns), which stay on the VPU and fuse, instead
    of a per-env gather (see GATHER_IMPL).  Out-of-bounds rows/columns have
    all-zero one-hot weights; the oob mask then stamps grey walls
    (grid.py:139)."""
    w, h = grid.shape
    v = view_size
    top_x, top_y = _view_exts(agent_pos, agent_dir, v)
    ar = jnp.arange(v, dtype=jnp.int32)
    xs = top_x + ar  # [V] world rows of the unrotated rect
    ys = top_y + ar  # [V] world cols
    # rect1[i,h] = grid[xs[i], h] as a masked reduce over w
    eq_x = (xs[:, None] == jnp.arange(w, dtype=jnp.int32)[None, :])  # [V,W]
    rect1 = jnp.sum(
        jnp.where(eq_x[:, :, None], grid[None], jnp.uint32(0)),
        axis=1, dtype=jnp.uint32)  # [V,H]; one-hot rows -> no overflow
    # rect[i,j] = rect1[i, ys[j]]
    eq_y = (ys[:, None] == jnp.arange(h, dtype=jnp.int32)[None, :])  # [V,H]
    rect = jnp.sum(
        jnp.where(eq_y[None, :, :], rect1[:, None], jnp.uint32(0)),
        axis=2, dtype=jnp.uint32)  # [V,V]
    oob = ((xs[:, None] < 0) | (xs[:, None] >= w)
           | (ys[None, :] < 0) | (ys[None, :] >= h))
    rect = jnp.where(oob, _WALL_PACKED, rect)
    # view = rotate_left^(dir+1)(rect): four static transforms, one select.
    # d == 3 rotates 4 times — the IDENTITY (grid.py:110-122), so the final
    # branch returns rect unchanged.
    f0 = rect[::-1, :]
    f1 = rect[:, ::-1]
    d = agent_dir
    return jnp.where(
        d == 0, jnp.swapaxes(f0, 0, 1),
        jnp.where(d == 1, f0[:, ::-1],
                  jnp.where(d == 2, jnp.swapaxes(f1, 0, 1), rect)))


def gather_view_onehot2d(
    grid: jnp.ndarray,
    agent_pos: jnp.ndarray,
    agent_dir: jnp.ndarray,
    view_size: int,
) -> jnp.ndarray:
    """Slice + rotation as ONE fused 2-D one-hot masked reduction.

    The separable impl (gather_view_onehot) runs two chained reduces plus a
    rotation select — three fusion barriers per step.  Here the rotated
    world coordinate of every view cell (view_world_coords already bakes in
    the dir-dependent rotation) drives a single [V,V,W,H] one-hot reduce:
    ~4x the VPU ops of the separable form, but one kernel and no
    intermediates — a win when the step program is launch-bound.
    Packed: uint32[W, H] -> uint32[V, V]."""
    w, h = grid.shape
    v = view_size
    wx, wy = view_world_coords(agent_pos, agent_dir, v)  # [V,V] each
    eq = ((wx[..., None] == jnp.arange(w, dtype=jnp.int32)[None, None, :])
          [..., None]
          & (wy[..., None] == jnp.arange(h, dtype=jnp.int32)[None, None, :])
          [..., None, :])  # [V,V,W,H]
    rect = jnp.sum(
        jnp.where(eq, grid[None, None], jnp.uint32(0)),
        axis=(2, 3), dtype=jnp.uint32)  # [V,V]
    oob = (wx < 0) | (wx >= w) | (wy < 0) | (wy >= h)
    return jnp.where(oob, _WALL_PACKED, rect)


def gather_view_matmul(
    grid: jnp.ndarray,
    agent_pos: jnp.ndarray,
    agent_dir: jnp.ndarray,
    view_size: int,
) -> jnp.ndarray:
    """Window extraction as two int8 matmuls (MXU-eligible alternative to
    the one-hot masked reductions; exact — cell FIELDS are < 127 so the
    triple view fits int8, and the one-hot rows make every output a single
    product ≤ 255 < 2^31).  Interface matches the packed impls
    (uint32[W, H] -> uint32[V, V]); the int8 contraction runs on the
    unpacked triple view internally — this variant exists as the measured
    MXU formulation of the gather (PERF.md round-4 shootout), not as the
    default."""
    w, h = grid.shape
    grid = unpack_cells(grid)  # [W, H, 3] uint8 view for the contraction
    v = view_size
    top_x, top_y = _view_exts(agent_pos, agent_dir, v)
    ar = jnp.arange(v, dtype=jnp.int32)
    xs = top_x + ar
    ys = top_y + ar
    eq_x = (xs[:, None] == jnp.arange(w, dtype=jnp.int32)[None, :]).astype(
        jnp.int8)  # [V,W]
    eq_y = (ys[:, None] == jnp.arange(h, dtype=jnp.int32)[None, :]).astype(
        jnp.int8)  # [V,H]
    g8 = grid.astype(jnp.int8)
    # rect1[i,(h,c)] = eq_x @ grid  — contraction over w
    rect1 = jax.lax.dot_general(
        eq_x, g8.reshape(w, h * 3), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).reshape(v, h, 3)
    # rect[i,j,c] = eq_y @ rect1 over h (einsum 'jh,ihc->ijc')
    rect = jax.lax.dot_general(
        eq_y.astype(jnp.int32), rect1, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)  # [V(j), V(i), 3]
    rect = jnp.swapaxes(rect, 0, 1).astype(jnp.uint8)  # [V(i), V(j), 3]
    oob = ((xs[:, None] < 0) | (xs[:, None] >= w)
           | (ys[None, :] < 0) | (ys[None, :] >= h))
    rect = pack_cells(jnp.where(oob[..., None], _WALL, rect))  # [V, V] u32
    f0 = rect[::-1, :]
    f1 = rect[:, ::-1]
    d = agent_dir
    return jnp.where(
        d == 0, jnp.swapaxes(f0, 0, 1),
        jnp.where(d == 1, f0[:, ::-1],
                  jnp.where(d == 2, jnp.swapaxes(f1, 0, 1), rect)))


def gather_view_gather(
    grid: jnp.ndarray,
    agent_pos: jnp.ndarray,
    agent_dir: jnp.ndarray,
    view_size: int,
) -> jnp.ndarray:
    """Naive formulation: one fused slice+rotate dynamic gather.
    Packed: uint32[W, H] -> uint32[V, V]."""
    w, h = grid.shape
    wx, wy = view_world_coords(agent_pos, agent_dir, view_size)
    oob = (wx < 0) | (wx >= w) | (wy < 0) | (wy >= h)
    cells = grid[jnp.clip(wx, 0, w - 1), jnp.clip(wy, 0, h - 1)]
    return jnp.where(oob, _WALL_PACKED, cells)


def gather_view(
    grid: jnp.ndarray,
    agent_pos: jnp.ndarray,
    agent_dir: jnp.ndarray,
    view_size: int,
) -> jnp.ndarray:
    """Extract the rotated egocentric window, PACKED: uint32[W, H] ->
    uint32[V, V] (slice+rotate fused)."""
    if GATHER_IMPL == "onehot":
        return gather_view_onehot(grid, agent_pos, agent_dir, view_size)
    if GATHER_IMPL == "onehot2d":
        return gather_view_onehot2d(grid, agent_pos, agent_dir, view_size)
    if GATHER_IMPL == "matmul":
        return gather_view_matmul(grid, agent_pos, agent_dir, view_size)
    return gather_view_gather(grid, agent_pos, agent_dir, view_size)


def see_behind(cells: jnp.ndarray) -> jnp.ndarray:
    """Transparency of packed uint32 cells: per-type table + open-door rule
    (world_object.py:59-61, 210-211, 226-227)."""
    t = (cells & 0xFF).astype(jnp.int32)
    s = ((cells >> 16) & 0xFF).astype(jnp.int32)
    return in_table(t, _SEE_BEHIND_RANGES) & (
        (t != _DOOR) | (s == C.STATE_TO_IDX["open"]))


def process_vis(cells: jnp.ndarray, view_size: int) -> jnp.ndarray:
    """Occlusion mask over the V×V view (packed uint32 cells); agent at
    (V//2, V-1).

    Faithful re-derivation of Grid.process_vis (grid.py:291-328): rows are
    processed bottom-up; within a row a left-to-right then right-to-left
    propagation runs, each visible transparent cell lighting its lateral
    neighbor and the two cells diagonally/straight ahead (row j-1).

    The in-row recurrence ``m[i+1] |= m[i] & s[i]`` is evaluated in CLOSED
    FORM instead of a sequential update chain: light reaches k from i ⟺ no
    opaque cell lies between them, i.e. the cumulative opaque count is equal
    at both ends.  A per-cell ``.at[].set`` unroll is bit-identical but
    lowers under vmap to ~5·V² dependent dynamic-update-slice kernels
    (measured 252 kernels × ~95 µs = 21 ms/step at batch 1024 on TPU v5e —
    92% of the whole step for every see_through_walls=False family); the
    closed form is a handful of [V]/[V,V] elementwise ops per row that fuse.
    """
    v = view_size
    assert v <= 31
    see = see_behind(cells)  # (V, V) bool, [i, j]

    # Bit-pack: column j of the mask/see planes lives in ONE uint32 (bit i =
    # cell (i, j)), so the whole propagation is scalar bit arithmetic — no
    # [V, V]-shaped intermediates at all (under vmap those pad V -> 128
    # lanes and a 7x7 view moves ~40x its bytes per op).
    weights = (jnp.uint32(1) << jnp.arange(v, dtype=jnp.uint32))  # [V]
    see_cols = jnp.sum(
        jnp.where(see, weights[:, None], jnp.uint32(0)), axis=0,
        dtype=jnp.uint32,
    )  # [V] — uint32 per column
    full = jnp.uint32((1 << v) - 1)
    not_last = jnp.uint32((1 << (v - 1)) - 1)  # bits 0..v-2
    not_first = full & ~jnp.uint32(1)  # bits 1..v-1

    # doubling distances covering chains of length < v
    dists = []
    d = 1
    while d < v:
        dists.append(d)
        d *= 2

    cols = [jnp.uint32(0)] * v
    cols[v - 1] = jnp.uint32(1 << (v // 2))  # agent cell

    for j in range(v - 1, -1, -1):
        m = cols[j]
        s = see_cols[j]

        # L2R (grid.py:297-308): m[i+1] |= m[i] & s[i], evaluated
        # bit-parallel by doubling: P_d bit i = all-seen s[i-d .. i-1].
        p = (s << 1) & full  # P_1
        for d in dists:
            m = m | ((m << d) & p & full)
            p = p & ((p << d) & full)
        prop1 = m & s & not_last  # loop runs i = 0..v-2 only

        # R2L (grid.py:310-321) on the L2R result, mirrored:
        # Q_d bit i = all-seen s[i+1 .. i+d].
        q = s >> 1  # Q_1
        m2 = m
        for d in dists:
            m2 = m2 | ((m2 >> d) & q)
            q = q & (q >> d)
        prop2 = m2 & s & not_first  # loop runs i = v-1..1 only

        cols[j] = m2
        if j > 0:
            # L2R lights (i, j-1) and (i+1, j-1); R2L lights (i, j-1) and
            # (i-1, j-1)
            cols[j - 1] = (cols[j - 1] | prop1 | ((prop1 << 1) & full)
                           | prop2 | (prop2 >> 1))
    packed = jnp.stack(cols)  # [V] uint32, one per column
    return (packed[None, :] >> jnp.arange(v, dtype=jnp.uint32)[:, None]) & 1 > 0


def gen_obs_grid(
    state: EnvState, params: EnvParams
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(view_cells PACKED uint32[V,V], vis_mask bool[V,V]) — the tensor
    analogue of MiniGridEnv.gen_obs_grid (minigrid_env.py:594-629),
    including the carried-object overlay at the agent cell.  Cells stay in
    the packed layout; unpack with grid_ops.unpack_cells where triples are
    needed (encode_view does this for the obs image)."""
    v = params.agent_view_size
    cells = gather_view(state.grid, state.agent_pos, state.agent_dir, v)
    if params.see_through_walls:
        vis_mask = jnp.ones((v, v), dtype=bool)
    else:
        vis_mask = process_vis(cells, v)
    # Agent sees what it carries (minigrid_env.py:620-627); empty hands -> None.
    # Constant one-hot select: the .at[].set form lowers to a scatter kernel
    # even with static indices — in the hottest path of every family.
    agent_cell = ((np.arange(v)[:, None] == v // 2)
                  & (np.arange(v)[None, :] == v - 1))
    cells = jnp.where(agent_cell, pack_cells(state.carrying), cells)
    return cells, vis_mask


def encode_view(cells: jnp.ndarray, vis_mask: jnp.ndarray) -> jnp.ndarray:
    """Masked encode (grid.py:244-268): invisible cells -> unseen (0,0,0).

    Takes PACKED uint32[V, V] cells; returns the reference's uint8[V, V, 3]
    image (unseen packs to 0, so the mask applies pre-unpack)."""
    return unpack_cells(jnp.where(vis_mask, cells, jnp.uint32(0)))


def gen_obs(state: EnvState, params: EnvParams) -> dict:
    """The reference observation dict (minigrid_env.py:631-651) with the
    mission as a packed int code (host detokenization lives in the registry)."""
    cells, vis_mask = gen_obs_grid(state, params)
    return {
        "image": encode_view(cells, vis_mask),
        "direction": state.agent_dir,
        "mission": state.mission,
    }


def gen_obs_batch(states: EnvState, params: EnvParams) -> dict:
    """Batched ``gen_obs`` over a leading env axis — the vectorized hot path.

    On TPU backends the window extraction (57% of the whole step program at
    batch 4096, PERF.md round 4) runs as ONE fused Pallas kernel with the
    batch on the 128-lane axis (:mod:`minigrid_tpu.ops.obs_pallas`); the
    rest of the pipeline (rotation select, occlusion, carried-object
    overlay, encode) is the same elementwise program as the per-env path
    and fuses behind it.  Everywhere else this is exactly
    ``vmap(gen_obs)``.  Bitwise identity between the two paths is asserted
    by tests/test_obs_impls.py."""
    cells, vis_mask = gen_obs_grid_batch(states, params)
    return {
        "image": unpack_cells(jnp.where(vis_mask, cells, jnp.uint32(0))),
        "direction": states.agent_dir,
        "mission": states.mission,
    }


def gen_obs_grid_batch(
    states: EnvState, params: EnvParams
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched ``gen_obs_grid``: (packed cells uint32[B, V, V] incl. the
    carried-object overlay, vis_mask bool[B, V, V]).  The fused Pallas
    gather on TPU where applicable, else the vmapped per-env pipeline —
    used by both the symbolic obs (gen_obs_batch) and the batched RGB POV
    renderer (ops/render.py::pov_render_batch)."""
    from minigrid_tpu.ops import obs_pallas

    num_envs = states.agent_dir.shape[0]
    v = params.agent_view_size
    if not obs_pallas.pallas_obs_available(num_envs, params):
        return jax.vmap(lambda s: gen_obs_grid(s, params))(states)
    cells = obs_pallas.gather_view_pallas_packed(
        states.grid, states.agent_pos, states.agent_dir, v
    )  # [B, V, V] rotated, packed
    if params.see_through_walls:
        vis_mask = jnp.ones((num_envs, v, v), dtype=bool)
    else:
        vis_mask = jax.vmap(lambda c: process_vis(c, v))(cells)
    agent_cell = ((np.arange(v)[:, None] == v // 2)
                  & (np.arange(v)[None, :] == v - 1))
    cells = jnp.where(
        agent_cell[None], pack_cells(states.carrying)[:, None, None], cells
    )
    return cells, vis_mask


def gen_obs_batch_sharded(
    states: EnvState, params: EnvParams, mesh, axis_name: str = "env"
) -> dict:
    """``gen_obs_batch`` with the env batch sharded over a mesh axis, via
    ``jax.shard_map`` — the partitioning GSPMD cannot infer for an opaque
    Mosaic custom call.

    Observation extraction is purely per-env, so the sharded program is the
    per-shard kernel with NO collectives: every EnvState leaf (leading dim B)
    splits along ``axis_name``, each device runs the fused Pallas gather
    (:mod:`minigrid_tpu.ops.obs_pallas`) on its local B/n slice, and the
    output obs dict carries the same batch sharding.  This is what lets the
    multi-chip configs (ShardedVectorEnv, sharded_rollout, PPO-with-mesh)
    run the fast obs program on every chip instead of falling back to the
    vmap path (57% of the step at batch 4096 — PERF.md round 4).

    Requires the local batch B / mesh.shape[axis_name] to exist (B divisible
    by the axis size); when the local batch is not lane-tileable the
    per-shard program falls back to the vmapped pipeline, still inside
    shard_map, bit-identically.  Reference semantics anchor:
    minigrid_env.py:594-651."""
    from jax.sharding import PartitionSpec

    spec = PartitionSpec(axis_name)
    B = states.agent_dir.shape[0]
    n = mesh.shape[axis_name]
    assert B % n == 0, (
        f"batch {B} must divide over mesh axis {axis_name}={n}"
    )
    # check_vma=False: every input/output is batch-sharded and the program
    # is per-env; there is no replication invariant for the checker to
    # track through the pallas_call.
    f = jax.shard_map(
        lambda s: gen_obs_batch(s, params),
        mesh=mesh,
        in_specs=(spec,),
        out_specs=spec,
        check_vma=False,
    )
    return f(states)
