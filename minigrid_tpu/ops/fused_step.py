"""Fused transition Pallas kernel — the whole env step as ONE TPU kernel.

This module implements the *entire* vectorized transition — action tree
(minigrid_env.py:524-592), door-lock FSM (world_object.py:229-239),
pickup/drop, reward/truncation, auto-reset regeneration, egocentric view
gather with rotation (minigrid_env.py:594-629), shadow-casting occlusion
(grid.py:291-328), and carried-object overlay — as one Pallas kernel over
packed per-cell lanes, bit-identical to the XLA path (the parity test in
tests/test_fused.py locksteps the two).

**Measured verdict (v5e, DoorKey-8x8, batch 4096): the XLA path wins.**
This kernel reaches ~15M env-steps/s; the vmapped core/step.py program
reaches ~62M.  The per-env scalar dataflow (one [B]-wide lane per mask/
coordinate) maps to densely packed vector registers under XLA's fusion,
while in a Mosaic kernel the same values live as [BLK, 1] columns that
occupy one lane of a 128-lane register — ~100x register waste — and the
view-cell slicing/concatenation forces relayouts.  The kernel is kept as an
experimental backend: it exercises the Pallas integration end-to-end and is
the scaffold for a batch-on-lanes layout that could close the gap.

Layout choices, all driven by measurement on a v5e chip:
  * grid as ONE int32 ``[N, W*H]`` plane, cell = type | color<<8 | state<<16
    (lane = x*H + y).  The standard ``[N, W, H, 3]`` uint8 layout pads its
    minor dim 3 -> 128 lanes; a packed lane plane tiles exactly.
  * agent scalars packed into one ``[N, 8]`` int32 array — every extra
    kernel operand costs a layout copy per scan iteration.
  * regeneration RNG inside the kernel (``pltpu.prng_random_bits``) — a
    per-step host-side threefry draw alone costs ~100us at batch 4096.
    Under the Pallas interpreter (CPU tests) the TPU PRNG primitives do not
    lower, so draws arrive as an extra input there (streams differ between
    the two modes; layout *distributions* are identical).

Scope: envs whose dynamics are exactly ``base_step`` (no post_step
override) and which provide an in-kernel generator.  ``DoorKeyEnv`` and
``EmptyEnv`` qualify; envs with boxes (``box_contains`` plane) or custom
rewards use :class:`minigrid_tpu.parallel.vector.VectorEnv`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from minigrid_tpu.core import constants as C
from minigrid_tpu.core.state import EnvParams

_EMPTY = C.OBJECT_TO_IDX["empty"]
_WALL = C.OBJECT_TO_IDX["wall"]
_DOOR = C.OBJECT_TO_IDX["door"]
_KEY = C.OBJECT_TO_IDX["key"]
_BALL = C.OBJECT_TO_IDX["ball"]
_GOAL = C.OBJECT_TO_IDX["goal"]
_LAVA = C.OBJECT_TO_IDX["lava"]
_OPEN = C.STATE_TO_IDX["open"]
_LOCKED = C.STATE_TO_IDX["locked"]

# agent-plane column ids
A_X, A_Y, A_DIR, A_CNT, A_CTYP, A_CCOL = range(6)
A_WIDTH = 8


def _pack(typ, col, sta):
    return (typ.astype(jnp.int32) | (col.astype(jnp.int32) << 8)
            | (sta.astype(jnp.int32) << 16))


def _unpack(g):
    return g & 0xFF, (g >> 8) & 0xFF, (g >> 16) & 0xFF


def _kernel(W: int, H: int, V: int, LANES: int, BLK: int, max_steps: int,
            see_through_walls: bool, kernel_prng: bool, generate_fn,
            *refs):
    if kernel_prng:
        grid_ref, ag_ref, act_ref, seed_ref, ngrid_ref, nag_ref, obs_ref, \
            rtt_ref = refs
    else:
        grid_ref, ag_ref, act_ref, rnd_ref, ngrid_ref, nag_ref, obs_ref, \
            rtt_ref = refs
    WH = W * H
    i32 = jnp.int32
    grid = grid_ref[:]  # i32 [BLK, LANES] packed; lanes >= WH are pad walls
    typ, col, sta = _unpack(grid)
    ag = ag_ref[:]  # i32 [BLK, 8]
    x = ag[:, A_X:A_X + 1]
    y = ag[:, A_Y:A_Y + 1]
    d = ag[:, A_DIR:A_DIR + 1]
    cnt = ag[:, A_CNT:A_CNT + 1]
    ctyp = ag[:, A_CTYP:A_CTYP + 1]
    ccol = ag[:, A_CCOL:A_CCOL + 1]
    a = act_ref[:]  # i32 [BLK, 1]

    lane = jax.lax.broadcasted_iota(i32, (BLK, LANES), 1)
    real_cell = lane < WH  # lanes beyond the grid are padding
    cl = jnp.minimum(lane, WH - 1)
    lx = cl // H
    ly = cl % H

    # ---- front cell (pre-action direction, minigrid_env.py:532-535) -------
    def dir_vec(dd):  # DIR_TO_VEC (constants.py:102-111) as select chains
        vx = jnp.where(dd == 0, 1, jnp.where(dd == 2, -1, 0))
        vy = jnp.where(dd == 1, 1, jnp.where(dd == 3, -1, 0))
        return vx, vy

    fdx, fdy = dir_vec(d)
    fx = x + fdx
    fy = y + fdy
    in_bounds = (fx >= 0) & (fx < W) & (fy >= 0) & (fy < H)
    fmask = ((lx == jnp.clip(fx, 0, W - 1)) & (ly == jnp.clip(fy, 0, H - 1))
             & real_cell)

    fcell = jnp.max(jnp.where(fmask, grid, 0), axis=1, keepdims=True)
    ftyp0, fcol0, fsta0 = _unpack(fcell)
    ftyp = jnp.where(in_bounds, ftyp0, _WALL)
    fcol = jnp.where(in_bounds, fcol0, 0)
    fsta = jnp.where(in_bounds, fsta0, 0)

    # ---- action tree (minigrid_env.py:538-582) ------------------------------
    is_left, is_right, is_fwd = a == 0, a == 1, a == 2
    is_pick, is_drop, is_tog = a == 3, a == 4, a == 5
    nd = jnp.where(is_left, (d + 3) % 4, jnp.where(is_right, (d + 1) % 4, d))

    can_overlap = ((ftyp == _EMPTY) | (ftyp == _GOAL) | (ftyp == _LAVA)
                   | ((ftyp == _DOOR) & (fsta == _OPEN)))
    moved = is_fwd & can_overlap & in_bounds
    nx = jnp.where(moved, fx, x)
    ny = jnp.where(moved, fy, y)
    cnt2 = cnt + 1
    hit_goal = is_fwd & (ftyp == _GOAL)
    hit_lava = is_fwd & (ftyp == _LAVA)
    terminated = hit_goal | hit_lava
    reward = jnp.where(
        hit_goal,
        1.0 - 0.9 * cnt2.astype(jnp.float32) / float(max_steps), 0.0)
    truncated = cnt2 >= max_steps

    hands_free = ctyp == _EMPTY
    can_pickup = (ftyp == _KEY) | (ftyp == _BALL)
    picked = is_pick & can_pickup & hands_free & in_bounds
    dropped = is_drop & (ftyp == _EMPTY) & ~hands_free & in_bounds

    # toggle: door FSM (world_object.py:229-239)
    is_door = ftyp == _DOOR
    has_key = (ctyp == _KEY) & (ccol == fcol)
    new_door_sta = jnp.where(fsta == _LOCKED,
                             jnp.where(has_key, _OPEN, _LOCKED),
                             1 - fsta)
    toggling = is_tog & is_door & in_bounds

    new_ftyp = jnp.where(picked, _EMPTY, jnp.where(dropped, ctyp, ftyp))
    new_fcol = jnp.where(picked, 0, jnp.where(dropped, ccol, fcol))
    new_fsta = jnp.where(picked, 0,
                         jnp.where(dropped, 0,
                                   jnp.where(toggling, new_door_sta, fsta)))

    wmask = fmask & in_bounds
    grid2 = jnp.where(wmask, _pack(new_ftyp, new_fcol, new_fsta), grid)
    nct = jnp.where(picked, ftyp, jnp.where(dropped, _EMPTY, ctyp))
    ncc = jnp.where(picked, fcol, jnp.where(dropped, 0, ccol))

    # ---- auto-reset regeneration (env-specific closed form) ----------------
    done = terminated | truncated
    if kernel_prng:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0), seed_ref[1])
        rbits = pltpu.prng_random_bits((BLK, 8))
        r = (rbits >> jnp.uint32(8)).astype(i32)  # 24-bit non-negative
    else:
        r = rnd_ref[:]  # i32 [BLK, 8]
    g = generate_fn(r, lx, ly, BLK)
    gen_packed = jnp.where(real_cell, _pack(g["typ"], g["col"], g["sta"]),
                           _WALL | (C.COLOR_TO_IDX["grey"] << 8))
    grid3 = jnp.where(done, gen_packed, grid2)
    nx = jnp.where(done, g["x"], nx)
    ny = jnp.where(done, g["y"], ny)
    nd = jnp.where(done, g["dir"], nd)
    ncnt = jnp.where(done, 0, cnt2)
    nct = jnp.where(done, _EMPTY, nct)
    ncc = jnp.where(done, 0, ncc)

    # ---- egocentric view (gather_view: slice+rotate fused, obs.py:32-60) ----
    vi = lane // V  # first V*V lanes form the view; rest padded
    vj = lane % V
    f0, f1 = dir_vec(nd)
    r0, r1 = -f1, f0  # right vector (minigrid_env.py:409-415)
    wx = nx + f0 * (V - 1 - vj) + r0 * (vi - V // 2)
    wy = ny + f1 * (V - 1 - vj) + r1 * (vi - V // 2)
    valid_vcell = lane < V * V
    oob = ((wx < 0) | (wx >= W) | (wy < 0) | (wy >= H)) & valid_vcell
    ridx = jnp.where(valid_vcell,
                     jnp.clip(wx, 0, W - 1) * H + jnp.clip(wy, 0, H - 1), 0)
    vcell = jnp.take_along_axis(grid3, ridx, axis=1)
    # OOB pads with a full grey wall triple (grid.py:139 pads with Wall())
    oob_wall = _WALL | (C.COLOR_TO_IDX["grey"] << 8)
    vcell = jnp.where(oob, oob_wall, vcell)
    # carried-object overlay at the agent view cell (minigrid_env.py:620-627)
    agent_vlane = (V // 2) * V + (V - 1)
    vcell = jnp.where(lane == agent_vlane, _pack(nct, ncc, jnp.asarray(0)),
                      vcell)
    vt, vc, vs = _unpack(vcell)

    # ---- occlusion (process_vis, grid.py:291-328) ---------------------------
    if see_through_walls:
        vis = valid_vcell
    else:
        # Register dataflow: one [BLK, 1] int32 column per view cell, exact
        # unroll of the reference's two in-row sweeps per row, bottom-up.
        # The only opaque type is wall (SEE_BEHIND table), plus the
        # non-open-door rule (world_object.py:210-211, 226-227).  int32, not
        # bool — Mosaic rejects lane-sliced i1 vectors.
        see_plane = ((vt != _WALL)
                     & ((vt != _DOOR) | (vs == _OPEN))).astype(i32)
        see_cols = [see_plane[:, idx:idx + 1] for idx in range(V * V)]
        m = [jnp.zeros((BLK, 1), i32) for _ in range(V * V)]
        m[agent_vlane] = jnp.ones((BLK, 1), i32)
        for j in range(V - 1, -1, -1):
            for i in range(0, V - 1):
                p = m[i * V + j] * see_cols[i * V + j]
                m[(i + 1) * V + j] = jnp.maximum(m[(i + 1) * V + j], p)
                if j > 0:
                    m[(i + 1) * V + (j - 1)] = jnp.maximum(
                        m[(i + 1) * V + (j - 1)], p)
                    m[i * V + (j - 1)] = jnp.maximum(m[i * V + (j - 1)], p)
            for i in range(V - 1, 0, -1):
                p = m[i * V + j] * see_cols[i * V + j]
                m[(i - 1) * V + j] = jnp.maximum(m[(i - 1) * V + j], p)
                if j > 0:
                    m[(i - 1) * V + (j - 1)] = jnp.maximum(
                        m[(i - 1) * V + (j - 1)], p)
                    m[i * V + (j - 1)] = jnp.maximum(m[i * V + (j - 1)], p)
        vis = jnp.concatenate(
            m + [jnp.zeros((BLK, LANES - V * V), i32)], axis=1) > 0

    obs_packed = jnp.where(vis, vcell, 0)  # unseen = (0,0,0), grid.py:244-268

    # ---- outputs -------------------------------------------------------------
    ngrid_ref[:] = grid3
    nag = jnp.concatenate(
        [nx, ny, nd, ncnt, nct, ncc, jnp.zeros((BLK, A_WIDTH - 6), i32)],
        axis=1)
    nag_ref[:] = nag
    obs_ref[:] = obs_packed
    rtt_ref[:] = jnp.concatenate(
        [reward, terminated.astype(jnp.float32),
         truncated.astype(jnp.float32),
         jnp.zeros((BLK, 1), jnp.float32)], axis=1)


def doorkey_generate(params: EnvParams):
    """In-kernel DoorKey layout (mirrors envs/doorkey.py's closed form)."""
    W, H = params.width, params.height

    def gen(r, lx, ly, BLK):
        i32 = jnp.int32
        split = 2 + r[:, 0:1] % (W - 4)
        door_y = 1 + r[:, 1:2] % (W - 3)
        rows = H - 2
        nfree = (split - 1) * rows
        r1 = r[:, 2:3] % nfree
        r2 = r[:, 3:4] % jnp.maximum(nfree - 1, 1)
        r2 = r2 + (r2 >= r1).astype(i32)
        ax = 1 + r1 // rows
        ay = 1 + r1 % rows
        kx = 1 + r2 // rows
        ky = 1 + r2 % rows
        gdir = r[:, 4:5] % 4

        border = (lx == 0) | (lx == W - 1) | (ly == 0) | (ly == H - 1)
        goal_cell = (lx == W - 2) & (ly == H - 2)
        wall_col = lx == split
        door_cell = wall_col & (ly == door_y)
        key_cell = (lx == kx) & (ly == ky)

        typ = jnp.full(lx.shape, _EMPTY, i32)
        typ = jnp.where(border | wall_col, _WALL, typ)
        typ = jnp.where(goal_cell, _GOAL, typ)
        typ = jnp.where(door_cell, _DOOR, typ)
        typ = jnp.where(key_cell, _KEY, typ)
        col = jnp.zeros(lx.shape, i32)
        col = jnp.where(border | wall_col, C.COLOR_TO_IDX["grey"], col)
        col = jnp.where(goal_cell, C.COLOR_TO_IDX["green"], col)
        col = jnp.where(door_cell | key_cell, C.COLOR_TO_IDX["yellow"], col)
        sta = jnp.where(door_cell, _LOCKED, 0)
        return {"typ": typ, "col": col, "sta": sta,
                "x": ax, "y": ay, "dir": gdir}

    return gen


def empty_generate(params: EnvParams, agent_start_pos=(1, 1),
                   agent_start_dir=0, random_start: bool = False):
    """In-kernel EmptyEnv layout (envs/empty.py:97-114)."""
    W, H = params.width, params.height

    def gen(r, lx, ly, BLK):
        i32 = jnp.int32
        border = (lx == 0) | (lx == W - 1) | (ly == 0) | (ly == H - 1)
        goal_cell = (lx == W - 2) & (ly == H - 2)
        typ = jnp.full(lx.shape, _EMPTY, i32)
        typ = jnp.where(border, _WALL, typ)
        typ = jnp.where(goal_cell, _GOAL, typ)
        col = jnp.where(border, C.COLOR_TO_IDX["grey"],
                        jnp.where(goal_cell, C.COLOR_TO_IDX["green"], 0))
        sta = jnp.zeros(lx.shape, i32)
        if random_start:
            # uniform over interior cells minus the goal (exact: draw from
            # nfree-1 slots, shift past the goal's enumeration index)
            nfree = (W - 2) * (H - 2)
            goal_idx = (W - 3) * (H - 2) + (H - 3)
            r1 = r[:, 2:3] % (nfree - 1)
            r1 = r1 + (r1 >= goal_idx).astype(i32)
            ax = 1 + r1 // (H - 2)
            ay = 1 + r1 % (H - 2)
            gdir = r[:, 4:5] % 4
        else:
            ax = jnp.full((BLK, 1), agent_start_pos[0], i32)
            ay = jnp.full((BLK, 1), agent_start_pos[1], i32)
            gdir = jnp.full((BLK, 1), agent_start_dir, i32)
        return {"typ": typ, "col": col, "sta": sta,
                "x": ax, "y": ay, "dir": gdir}

    return gen


def _fused_generator_for(env, params: EnvParams):
    """Resolve the in-kernel generator hook for a supported env."""
    hook = getattr(env, "fused_generate", None)
    if hook is not None:
        return hook(params)
    name = type(env).__name__
    if name == "DoorKeyEnv":
        return doorkey_generate(params)
    if name == "EmptyEnv":
        return empty_generate(
            params,
            agent_start_pos=getattr(env, "agent_start_pos", (1, 1)) or (1, 1),
            agent_start_dir=getattr(env, "agent_start_dir", 0),
            random_start=getattr(env, "agent_start_pos", (1, 1)) is None,
        )
    raise NotImplementedError(
        f"{name} has no fused generator; use parallel.vector.VectorEnv")


class FusedVectorEnv:
    """Single-kernel vectorized env batch (auto-reset fused in).

    API mirrors :class:`minigrid_tpu.parallel.vector.VectorEnv`:

        venv = FusedVectorEnv(env, 4096)
        obs, fs = venv.reset(key)
        obs, fs, reward, term, trunc, info = venv.step(fs, actions)

    ``fs`` is the packed planar state dict; :meth:`to_env_states` lifts it
    back to the standard ``EnvState`` batch for rendering/checkpointing.
    On TPU, regeneration draws come from the kernel PRNG (seeded from the
    reset key): deterministic given the key, a different stream than
    jax.random — layout *distributions* match, exact draws do not.
    """

    def __init__(self, env, num_envs: int, params: EnvParams | None = None,
                 block: int = 256, interpret: bool | None = None):
        self.env = env
        self.num_envs = num_envs
        self.params = params or env.default_params
        p = self.params
        assert num_envs % block == 0, (num_envs, block)
        self.block = block
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret
        kernel_prng = not interpret
        self.kernel_prng = kernel_prng
        W, H, V = p.width, p.height, p.agent_view_size
        WH = W * H
        N, BLK = num_envs, block
        LANES = max(WH, V * V)
        self._lanes = LANES
        gen_fn = _fused_generator_for(env, p)
        kern = functools.partial(
            _kernel, W, H, V, LANES, BLK, p.max_steps, p.see_through_walls,
            kernel_prng, gen_fn)

        row = lambda width: pl.BlockSpec((BLK, width), lambda i: (i, 0),  # noqa: E731
                                         memory_space=pltpu.VMEM)
        rnd_spec = (pl.BlockSpec(memory_space=pltpu.SMEM) if kernel_prng
                    else row(8))
        self._call = pl.pallas_call(
            kern,
            grid=(N // BLK,),
            in_specs=[row(LANES), row(A_WIDTH), row(1), rnd_spec],
            out_specs=(row(LANES), row(A_WIDTH), row(LANES), row(4)),
            out_shape=(
                jax.ShapeDtypeStruct((N, LANES), jnp.int32),
                jax.ShapeDtypeStruct((N, A_WIDTH), jnp.int32),
                jax.ShapeDtypeStruct((N, LANES), jnp.int32),
                jax.ShapeDtypeStruct((N, 4), jnp.float32),
            ),
            interpret=interpret,
        )
        self._jit_step = jax.jit(self._step_impl)
        self._jit_reset = jax.jit(jax.vmap(lambda k: env.reset(k, p)))

    # -- state conversion ------------------------------------------------------
    def _planes_from_states(self, states) -> dict:
        # EnvState grids are packed uint32 words with the same field layout
        # as this backend's int32 planes (type | color<<8 | state<<16)
        g = states.grid.astype(jnp.int32)  # [N, W, H] packed
        n = g.shape[0]
        wh = g.shape[1] * g.shape[2]
        ag = jnp.zeros((n, A_WIDTH), jnp.int32)
        ag = ag.at[:, A_X].set(states.agent_pos[:, 0])
        ag = ag.at[:, A_Y].set(states.agent_pos[:, 1])
        ag = ag.at[:, A_DIR].set(states.agent_dir)
        ag = ag.at[:, A_CNT].set(states.step_count)
        ag = ag.at[:, A_CTYP].set(states.carrying[:, 0].astype(jnp.int32))
        ag = ag.at[:, A_CCOL].set(states.carrying[:, 1].astype(jnp.int32))
        packed = g.reshape(n, wh)
        if self._lanes > wh:
            pad = jnp.full((n, self._lanes - wh),
                           _WALL | (C.COLOR_TO_IDX["grey"] << 8), jnp.int32)
            packed = jnp.concatenate([packed, pad], axis=1)
        return {
            "grid": packed,
            "agent": ag,
            "rng": jax.random.PRNGKey(0),
            "t": jnp.zeros((), jnp.int32),
            "mission": states.mission,
        }

    def to_env_states(self, fs: dict):
        """Packed state -> EnvState batch (render/checkpoint interop)."""
        from minigrid_tpu.core.state import base_state

        p = self.params
        n = fs["grid"].shape[0]
        wh = p.width * p.height
        grid = fs["grid"][:, :wh].reshape(
            n, p.width, p.height).astype(jnp.uint32)
        ag = fs["agent"]

        def mk(g, ag, m):
            s = base_state(g, jnp.stack([ag[A_X], ag[A_Y]]), ag[A_DIR],
                           rng=jax.random.PRNGKey(0), mission=m)
            carrying = jnp.stack([ag[A_CTYP], ag[A_CCOL],
                                  jnp.zeros((), jnp.int32)])
            return s.replace(step_count=ag[A_CNT],
                             carrying=carrying.astype(jnp.uint8))

        return jax.vmap(mk)(grid, ag, fs["mission"])

    # -- API --------------------------------------------------------------------
    def reset(self, key: jnp.ndarray):
        keys = jax.random.split(key, self.num_envs)
        obs, states = self._jit_reset(keys)
        fs = self._planes_from_states(states)
        fs["rng"] = jax.random.fold_in(key, 1)
        return self._obs_from(obs["image"], fs), fs

    def _obs_from(self, image, fs):
        return {"image": image, "direction": fs["agent"][:, A_DIR],
                "mission": fs["mission"]}

    def _step_impl(self, fs: dict, action: jnp.ndarray):
        p = self.params
        V = p.agent_view_size
        if self.kernel_prng:
            # per-step seed pair: fold the step index into the key data
            seed = jnp.stack([
                fs["rng"][0].astype(jnp.int32)
                + fs["t"] * (self.num_envs // self.block + 1),
                fs["rng"][1].astype(jnp.int32),
            ])
            rnd_arg = seed
        else:
            rng, sub = jax.random.split(fs["rng"])
            rnd_arg = jax.random.randint(sub, (self.num_envs, 8), 0, 1 << 24,
                                         jnp.int32)
        grid, agent, obs_packed, rtt = self._call(
            fs["grid"], fs["agent"],
            action.reshape(-1, 1).astype(jnp.int32), rnd_arg)
        nfs = {**fs, "grid": grid, "agent": agent, "t": fs["t"] + 1}
        if not self.kernel_prng:
            nfs["rng"] = rng
        n = grid.shape[0]
        ot, oc, os_ = _unpack(obs_packed[:, :V * V].reshape(n, V, V))
        image = jnp.stack([ot, oc, os_], axis=-1).astype(jnp.uint8)
        return (self._obs_from(image, nfs), nfs, rtt[:, 0],
                rtt[:, 1] > 0, rtt[:, 2] > 0, {})

    def step(self, fs: dict, action: jnp.ndarray):
        return self._jit_step(fs, action)
