"""RoomGrid layer — multi-room scaffolding as a tensor program.

TPU-native re-derivation of ``minigrid/core/roomgrid.py:23-438``.  For fixed
(num_rows, num_cols, room_size) the room lattice is static; the dynamic parts
live in a *builder* pytree threaded through the generation program:

* ``door_pos`` — one sampled cell per internal wall (roomgrid.py:147-170; the
  reference samples a position for every wall up front, used or not),
* ``has_door`` — connectivity flags (door object placed or wall removed),
* ``locked`` — per-room locked flags (roomgrid.py:260),
* ``obj_mask`` — (kind, color) combos present, for distractor uniqueness.

``connect_all``'s sample-until-reachable loop (roomgrid.py:336-394) becomes a
fueled ``lax.while_loop`` whose body recomputes room reachability as a
bounded boolean flood over the (≤ rows×cols)-node room graph.  The RoomGrid
``place_agent`` retry ("not facing an object", roomgrid.py:313-334) becomes a
single masked draw over the (cell × direction) product space.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid_ops as G
from minigrid_tpu.core.env import Env
from minigrid_tpu.core.sampling import SORTED_COLOR_IDS, rand_color
from minigrid_tpu.core.state import EnvParams

_DOOR = C.OBJECT_TO_IDX["door"]
_KIND_IDS = np.asarray(
    [C.OBJECT_TO_IDX["key"], C.OBJECT_TO_IDX["ball"], C.OBJECT_TO_IDX["box"]],
    dtype=np.int32,
)


class RoomGridEnv(Env):
    """Base class for multi-room envs.  Subclasses call the builder API inside
    :meth:`generate`."""

    # connect_all / reachability generation dwarfs the per-step transition;
    # VectorEnv gates the auto-reset regeneration behind a batch-level cond
    # for such envs (see parallel/vector.py).
    expensive_generation = True
    # RoomGrid tasks terminate on success (pick the target, open the door),
    # so at large batch some env ends nearly every step and the batch-level
    # cond degenerates to full-width regeneration — the pooled double-buffer
    # keeps regeneration off the hot step path (measured on
    # KeyCorridorS3R3: 4.3M -> see PERF.md).  Episode turnover is much
    # slower than single-room BabyAI (ends are rare per env), so a narrow
    # refill window suffices.
    desynchronized_resets = True
    pool_refill_fraction = 1 / 64

    def __init__(self, room_size: int = 7, num_rows: int = 3, num_cols: int = 3,
                 max_steps: int = 100, agent_view_size: int = 7, **kwargs):
        assert room_size >= 3 and num_rows > 0 and num_cols > 0
        self.room_size = room_size
        self.num_rows = num_rows
        self.num_cols = num_cols
        height = (room_size - 1) * num_rows + 1
        width = (room_size - 1) * num_cols + 1
        super().__init__(width=width, height=height, max_steps=max_steps,
                         see_through_walls=False, agent_view_size=agent_view_size,
                         **kwargs)
        self._build_wall_tables()

    # ------------------------------------------------------------------ #
    # static lattice geometry
    # ------------------------------------------------------------------ #

    def _build_wall_tables(self):
        """Static wall enumeration: horizontal-neighbor walls first
        (right of room (i,j), i<cols-1), then vertical-neighbor walls
        (below room (i,j), j<rows-1)."""
        rows, cols, s = self.num_rows, self.num_cols, self.room_size
        self.num_h_walls = rows * (cols - 1)
        self.num_v_walls = (rows - 1) * cols
        self.num_walls = self.num_h_walls + self.num_v_walls
        r1, r2 = [], []
        for j in range(rows):
            for i in range(cols - 1):
                r1.append(j * cols + i)
                r2.append(j * cols + i + 1)
        for j in range(rows - 1):
            for i in range(cols):
                r1.append(j * cols + i)
                r2.append((j + 1) * cols + i)
        self._wall_r1 = jnp.asarray(r1, dtype=jnp.int32)
        self._wall_r2 = jnp.asarray(r2, dtype=jnp.int32)
        # Constant one-hot wall -> (room, room) incidence (symmetric), so
        # connect_all's room-graph edge matrix is a fused masked min-reduce
        # instead of index scatters (each static-index scatter still lowers
        # to its own kernel on TPU).
        n_rooms = rows * cols
        if self.num_walls:
            m = np.zeros((self.num_walls, n_rooms, n_rooms), bool)
            m[np.arange(self.num_walls), np.asarray(r1), np.asarray(r2)] = True
            self._wall_pair_mask = jnp.asarray(m | m.transpose(0, 2, 1))

    def room_top(self, i, j):
        s = self.room_size
        return (jnp.asarray(i) * (s - 1), jnp.asarray(j) * (s - 1))

    def h_wall_id(self, i, j):
        """Wall right of room (i, j)."""
        return jnp.asarray(j) * (self.num_cols - 1) + jnp.asarray(i)

    def v_wall_id(self, i, j):
        """Wall below room (i, j)."""
        return self.num_h_walls + jnp.asarray(j) * self.num_cols + jnp.asarray(i)

    def wall_id_for(self, i, j, k):
        """(room i, j, door side k∈{0:right,1:down,2:left,3:up}) -> (wall id,
        valid).  Works with traced values (connect_all samples k)."""
        i, j, k = (jnp.asarray(x, jnp.int32) for x in (i, j, k))
        wid = jnp.where(
            k == 0, self.h_wall_id(i, j),
            jnp.where(k == 2, self.h_wall_id(i - 1, j),
                      jnp.where(k == 1, self.v_wall_id(i, j),
                                self.v_wall_id(i, j - 1))))
        valid = jnp.where(
            k == 0, i < self.num_cols - 1,
            jnp.where(k == 2, i > 0,
                      jnp.where(k == 1, j < self.num_rows - 1, j > 0)))
        return jnp.clip(wid, 0, self.num_walls - 1), valid

    # ------------------------------------------------------------------ #
    # builder construction (RoomGrid._gen_grid, roomgrid.py:123-179)
    # ------------------------------------------------------------------ #

    def init_rooms(self, key: jnp.ndarray, params: EnvParams) -> dict:
        rows, cols, s = self.num_rows, self.num_cols, self.room_size
        from minigrid_tpu.core.state import empty_grid

        grid = empty_grid(params.width, params.height)
        # All room wall rects (roomgrid.py:142).
        for j in range(rows):
            for i in range(cols):
                grid = G.wall_rect(grid, i * (s - 1), j * (s - 1), s, s)

        # Sample a door slot on every internal wall (roomgrid.py:158-164).
        # One batched draw per wall class — a per-wall .at[w].set loop costs
        # one kernel per wall even with static indices.  Wall order matches
        # h_wall_id/v_wall_id: h walls j-major over (j, i<cols-1), then v
        # walls j-major over (j<rows-1, i).
        key, k_h, k_v = jax.random.split(key, 3)
        parts = []
        if self.num_h_walls:
            jj, ii = np.meshgrid(np.arange(rows), np.arange(cols - 1),
                                 indexing="ij")
            hx = jnp.asarray((ii + 1) * (s - 1), jnp.int32).ravel()
            hy = (jnp.asarray(jj * (s - 1), jnp.int32).ravel()
                  + jax.random.randint(k_h, (self.num_h_walls,), 1, s - 1))
            parts.append(jnp.stack([hx, hy], axis=1))
        if self.num_v_walls:
            jj, ii = np.meshgrid(np.arange(rows - 1), np.arange(cols),
                                 indexing="ij")
            vy = jnp.asarray((jj + 1) * (s - 1), jnp.int32).ravel()
            vx = (jnp.asarray(ii * (s - 1), jnp.int32).ravel()
                  + jax.random.randint(k_v, (self.num_v_walls,), 1, s - 1))
            parts.append(jnp.stack([vx, vy], axis=1))
        door_pos = (jnp.concatenate(parts, axis=0) if parts
                    else jnp.zeros((0, 2), jnp.int32))

        # Agent starts mid-grid facing right (roomgrid.py:172-179).
        mid = jnp.stack([
            jnp.asarray((cols // 2) * (s - 1) + s // 2, jnp.int32),
            jnp.asarray((rows // 2) * (s - 1) + s // 2, jnp.int32),
        ])
        return {
            "grid": grid,
            "door_pos": door_pos,
            "has_door": jnp.zeros((self.num_walls,), dtype=bool),
            "locked": jnp.zeros((rows * cols,), dtype=bool),
            "obj_mask": jnp.zeros((3 * 10,), dtype=bool),  # kind×color combos
            "agent_pos": mid,
            "agent_dir": jnp.asarray(0, jnp.int32),
        }

    # ------------------------------------------------------------------ #
    # builder ops
    # ------------------------------------------------------------------ #

    def room_rect_mask(self, params: EnvParams, i, j) -> jnp.ndarray:
        tx, ty = self.room_top(i, j)
        return G.rect_mask(params.width, params.height, (tx, ty),
                           (self.room_size, self.room_size))

    def add_door(self, b: dict, key: jnp.ndarray, i, j, door_idx=None,
                 color=None, locked=None, enabled=True
                 ) -> tuple[dict, jnp.ndarray, jnp.ndarray]:
        """Place a door on wall `door_idx` of room (i, j)
        (roomgrid.py:230-274).  door_idx=None picks a uniform free wall with a
        neighbor (the rejection loop at roomgrid.py:244-250).  `enabled` (may
        be traced) gates all writes.  Returns (builder, door_triple, door_pos)."""
        k_c, k_l, k_side = jax.random.split(key, 3)
        if door_idx is None:
            valids = []
            for side in range(4):
                wid, valid = self.wall_id_for(i, j, side)
                valids.append(valid & ~b["has_door"][wid])
            logits = jnp.where(jnp.stack(valids), 0.0, -jnp.inf)
            door_idx = jax.random.categorical(k_side, logits)
        if color is None:
            color = rand_color(k_c)
        color = jnp.asarray(color, jnp.int32)
        if locked is None:
            locked = jax.random.randint(k_l, (), 0, 2) == 0  # _rand_bool
        locked = jnp.asarray(locked)
        enabled = jnp.asarray(enabled)

        wid, _ = self.wall_id_for(i, j, door_idx)
        pos = b["door_pos"][wid]
        state = jnp.where(locked, C.STATE_TO_IDX["locked"], C.STATE_TO_IDX["closed"])
        triple = jnp.stack([jnp.asarray(_DOOR, jnp.int32), color, state]).astype(jnp.uint8)
        room = jnp.asarray(j, jnp.int32) * self.num_cols + jnp.asarray(i, jnp.int32)
        b = dict(b)
        b["grid"] = G.put_if(b["grid"], pos[0], pos[1], triple, enabled)
        nw = b["has_door"].shape[0]
        b["has_door"] = b["has_door"] | ((jnp.arange(nw) == wid) & enabled)
        # room.locked = locked — unconditional assignment (roomgrid.py:260)
        n_rooms = b["locked"].shape[0]
        b["locked"] = jnp.where((jnp.arange(n_rooms) == room) & enabled,
                                locked, b["locked"])
        return b, triple, pos

    def remove_wall(self, b: dict, i: int, j: int, wall_idx: int) -> dict:
        """Open a whole wall between two rooms (roomgrid.py:276-311).
        i, j, wall_idx must be static (they always are in the env zoo)."""
        s = self.room_size
        tx, ty = i * (s - 1), j * (s - 1)
        b = dict(b)
        g = b["grid"]
        if wall_idx == 0:
            g = G.vert_wall(g, tx + s - 1, ty + 1, s - 2, C.EMPTY_TRIPLE)
        elif wall_idx == 1:
            g = G.horz_wall(g, tx + 1, ty + s - 1, s - 2, C.EMPTY_TRIPLE)
        elif wall_idx == 2:
            g = G.vert_wall(g, tx, ty + 1, s - 2, C.EMPTY_TRIPLE)
        elif wall_idx == 3:
            g = G.horz_wall(g, tx + 1, ty, s - 2, C.EMPTY_TRIPLE)
        else:
            raise ValueError("invalid wall index")
        b["grid"] = g
        wid, _ = self.wall_id_for(i, j, wall_idx)
        b["has_door"] = b["has_door"] | (jnp.arange(b["has_door"].shape[0])
                                         == wid)
        return b

    def place_in_room(self, b: dict, key: jnp.ndarray, params: EnvParams,
                      i, j, triple, enabled=True) -> tuple[dict, jnp.ndarray, jnp.ndarray]:
        """place_in_room with the reject_next_to filter (roomgrid.py:181-196,
        11-20): uniform over empty room cells at manhattan distance >= 2 from
        the agent.  `enabled` (may be traced) gates the write entirely."""
        xs, ys = G.coords(params.width, params.height)
        near_agent = (jnp.abs(xs - b["agent_pos"][0])
                      + jnp.abs(ys - b["agent_pos"][1])) < 2
        mask = (G.is_empty(b["grid"]) & self.room_rect_mask(params, i, j)
                & ~near_agent)
        pos, ok = G.sample_cell(key, mask)
        ok = ok & jnp.asarray(enabled)
        b = dict(b)
        b["grid"] = G.put_if(b["grid"], pos[0], pos[1], triple, ok)
        return b, pos, ok

    def add_object(self, b: dict, key: jnp.ndarray, params: EnvParams, i, j,
                   kind=None, color=None, enabled=True
                   ) -> tuple[dict, jnp.ndarray, jnp.ndarray]:
        """Add a key/ball/box to room (i, j) (roomgrid.py:198-228).
        kind: None | 'key' | 'ball' | 'box' | traced local kind index (0/1/2).
        Returns (builder, triple, pos)."""
        k_kind, k_color, k_pos = jax.random.split(key, 3)
        if kind is None:
            kind_local = jax.random.randint(k_kind, (), 0, 3)
        elif isinstance(kind, str):
            kind_local = jnp.asarray({"key": 0, "ball": 1, "box": 2}[kind])
        else:
            kind_local = jnp.asarray(kind, jnp.int32)
        if color is None:
            color = rand_color(k_color)
        color = jnp.asarray(color, jnp.int32)
        t = jnp.asarray(_KIND_IDS)[kind_local]
        triple = jnp.stack([t, color, jnp.zeros((), jnp.int32)]).astype(jnp.uint8)
        b, pos, ok = self.place_in_room(b, k_pos, params, i, j, triple,
                                        enabled=enabled)
        # record (kind, color-name-rank) for distractor uniqueness
        color_rank = jnp.argmax(SORTED_COLOR_IDS == color)
        b["obj_mask"] = b["obj_mask"] | (
            (jnp.arange(30) == kind_local * 10 + color_rank) & ok)
        return b, triple, pos

    def place_agent_in_room(self, b: dict, key: jnp.ndarray, params: EnvParams,
                            i, j) -> dict:
        """RoomGrid.place_agent (roomgrid.py:313-334): uniform over (cell,
        direction) pairs where the cell is empty and the front cell is empty
        or a wall."""
        w, h = params.width, params.height
        room = self.room_rect_mask(params, i, j)
        empty = G.is_empty(b["grid"]) & room
        types = G.types(b["grid"])
        ok_dirs = []
        for d in range(4):
            dx, dy = int(C.DIR_TO_VEC[d][0]), int(C.DIR_TO_VEC[d][1])
            front = jnp.roll(types, (-dx, -dy), axis=(0, 1))
            # grid borders are always walls, so rolled wrap-around cells are
            # never selected from inside a room
            ok_dirs.append(
                (front == C.OBJECT_TO_IDX["empty"])
                | (front == C.OBJECT_TO_IDX["wall"])
            )
        ok = jnp.stack(ok_dirs, axis=-1) & empty[..., None]  # (W, H, 4)
        flat = ok.reshape(-1)
        any_valid = jnp.any(flat)
        logits = jnp.where(flat, 0.0, -jnp.inf)
        logits = jnp.where(any_valid, logits, jnp.zeros_like(logits))
        idx = jax.random.categorical(key, logits)
        d = idx % 4
        cell = idx // 4
        pos = jnp.stack([cell // h, cell % h]).astype(jnp.int32)
        b = dict(b)
        b["agent_pos"] = pos
        b["agent_dir"] = d.astype(jnp.int32)
        return b

    def connect_all(self, b: dict, key: jnp.ndarray,
                    max_itrs: int = 64, exclude_color=None) -> dict:
        """Add random unlocked doors until every room is reachable from the
        agent's room (roomgrid.py:336-394).

        The reference's rejection loop draws uniformly random walls and
        accepts each at most once, stopping as soon as the rooms connect —
        so the *sequence of accepted walls is a uniform random permutation of
        the eligible walls*, and the final door set is exactly the minimal
        connecting prefix of that permutation (each door's color an
        independent uniform draw).  That closed form is computed directly:
        one permutation, one Floyd–Warshall minimax pass over the (tiny)
        room graph to find the prefix length, and one fused masked write per
        wall.  A fueled while_loop formulation of the same process costs
        ~1300 sequential kernels under vmap (~35 ms/batch on TPU v5e); this
        costs ~40.  Walls touching locked rooms are ineligible; rooms only
        reachable through them are excluded from the connectivity target
        (`max_itrs` is kept for signature compatibility)."""
        del max_itrs
        rows, cols = self.num_rows, self.num_cols
        n_rooms = rows * cols
        n_walls = self.num_walls
        if n_walls == 0:  # single-room level: nothing to connect
            return b
        start_room = (
            b["agent_pos"][1] // (self.room_size - 1) * cols
            + b["agent_pos"][0] // (self.room_size - 1)
        )
        r1, r2 = self._wall_r1, self._wall_r2
        BIG = jnp.int32(n_walls + 1)

        k_perm, k_col = jax.random.split(key)
        rank = jax.random.permutation(k_perm, n_walls).astype(jnp.int32)
        eligible = (~b["has_door"]) & ~b["locked"][r1] & ~b["locked"][r2]
        # Edge cost: existing doors connect for free; eligible walls open at
        # their permutation rank; the rest never.
        edge = jnp.where(b["has_door"], jnp.int32(-1),
                         jnp.where(eligible, rank, BIG))

        # Edge matrix via the constant wall->(room,room) one-hot: a fused
        # masked min-reduce (three static-index scatters otherwise cost a
        # kernel each).
        ar = jnp.arange(n_rooms)
        D = jnp.min(
            jnp.where(self._wall_pair_mask, edge[:, None, None], BIG),
            axis=0,
        )
        D = jnp.where(ar[:, None] == ar[None, :], jnp.int32(-1), D)

        def fw(k, D):
            via = jnp.maximum(D[:, k][:, None], D[None, k, :])
            return jnp.minimum(D, via)

        D = jax.lax.fori_loop(0, n_rooms, fw, D)
        bottleneck = D[start_room]  # minimax rank to reach each room
        reachable = bottleneck < BIG
        prefix = jnp.max(jnp.where(reachable, bottleneck, -1))
        new_door = eligible & (rank <= prefix)

        # Independent uniform color per wall (the reference draws one color
        # per acceptance from its stream — iid uniform, same marginal).
        if exclude_color is None:
            colors = jax.vmap(rand_color)(jax.random.split(k_col, n_walls))
        else:
            # uniform over the colors != exclude_color when the (traced)
            # exclusion is active, i.e. a real color id; a negative sentinel
            # keeps the full palette (babyai/unlock.py:38-42)
            ex = jnp.asarray(exclude_color)
            active = ex > 0
            ex_rank = jnp.argmax(SORTED_COLOR_IDS == ex)
            r = jax.random.randint(k_col, (n_walls,), 0,
                                   jnp.where(active, 9, 10))
            colors = G.take_vec(jnp.asarray(SORTED_COLOR_IDS),
                                jnp.where(active, r + (r >= ex_rank), r))

        # Stamp every new door in one fused one-hot combine (a per-wall
        # put_if loop chains n_walls dependent full-grid selects).  Distinct
        # walls have distinct door cells, so max over walls is exact.
        grid = b["grid"]
        closed = jnp.asarray(C.STATE_TO_IDX["closed"], jnp.int32)
        W, H = grid.shape[:2]
        xs, ys = G.coords(W, H)
        stamp = ((xs[None] == b["door_pos"][:, 0, None, None])
                 & (ys[None] == b["door_pos"][:, 1, None, None])
                 & new_door[:, None, None])
        doors = G.pack_cells(jnp.stack([
            jnp.full((n_walls,), _DOOR, jnp.int32),
            colors.astype(jnp.int32),
            jnp.full((n_walls,), closed, jnp.int32),
        ], axis=1))  # uint32[n_walls]
        val = jnp.max(
            jnp.where(stamp, doors[:, None, None], jnp.uint32(0)), axis=0
        )
        grid = jnp.where(jnp.any(stamp, axis=0), val, grid)
        b = dict(b)
        b["grid"] = grid
        b["has_door"] = b["has_door"] | new_door
        return b

    def add_distractors(self, b: dict, key: jnp.ndarray, params: EnvParams,
                        i=None, j=None, num_distractors: int = 10,
                        all_unique: bool = True, enabled=True,
                        color_override=None
                        ) -> tuple[dict, jnp.ndarray, jnp.ndarray]:
        """Random key/ball/box distractors (roomgrid.py:396-438).  The
        uniqueness rejection loop becomes a masked draw over the 30
        (kind, color) combos, excluding combos already present.
        `color_override` forces the written color (GoToRedBallGrey's post-hoc
        grey recolor, babyai/goto.py:28-29) while sampling stays unchanged.
        Returns (builder, (num, 2) int array of (type_id, color_id),
        (num, 2) positions)."""
        # Fast path: when every distractor draws from the same cell mask
        # (fixed target room, or a single-room level where the per-draw room
        # choice is trivial), K sequential without-replacement draws are
        # distribution-equal to the top-K of iid cell priorities — one fused
        # program instead of ~8 kernels per distractor.
        single_room = self.num_rows == 1 and self.num_cols == 1
        if (single_room or (i is not None and j is not None)) and num_distractors:
            return self._add_distractors_oneshot(
                b, key, params, 0 if i is None else i, 0 if j is None else j,
                num_distractors, all_unique, enabled, color_override)
        if not num_distractors:
            return b, jnp.zeros((0, 2), jnp.int32), jnp.zeros((0, 2), jnp.int32)

        # The draws are inherently sequential (each consumes the builder the
        # previous produced), but the body is iteration-invariant — a
        # lax.scan compiles it ONCE instead of inlining `num_distractors`
        # copies of the full place-in-room graph (18 copies dominated the
        # LevelGen trace).  The split chain reproduces the sequential loop's
        # RNG stream exactly.
        def body(carry, _):
            b, key = carry
            key, k_tc, k_i, k_j, k_pos = jax.random.split(key, 5)
            if all_unique:
                avail = ~b["obj_mask"]
                logits = jnp.where(avail, 0.0, -jnp.inf)
                combo = jax.random.categorical(k_tc, logits)
            else:
                combo = jax.random.randint(k_tc, (), 0, 30)
            kind_local = combo // 10
            color = G.take1(jnp.asarray(SORTED_COLOR_IDS), combo % 10)
            write_color = color if color_override is None else jnp.asarray(
                color_override, jnp.int32)
            ri = jax.random.randint(k_i, (), 0, self.num_cols) if i is None else i
            rj = jax.random.randint(k_j, (), 0, self.num_rows) if j is None else j
            b, triple, pos = self.add_object(b, k_pos, params, ri, rj,
                                             kind=kind_local, color=write_color,
                                             enabled=enabled)
            added = jnp.stack([G.take1(jnp.asarray(_KIND_IDS), kind_local),
                               color])
            return (b, key), (added, pos)

        (b, _), (added, positions) = jax.lax.scan(
            body, (b, key), None, length=num_distractors)
        return b, added.astype(jnp.int32), positions

    def _add_distractors_oneshot(self, b: dict, key: jnp.ndarray,
                                 params: EnvParams, i, j, num: int,
                                 all_unique: bool, enabled,
                                 color_override) -> tuple[dict, jnp.ndarray, jnp.ndarray]:
        """One-shot equivalent of `num` sequential distractor draws over one
        room: uniform K-subsets via top-K of iid priorities, for both the
        (kind, color) combos (uniqueness = without-replacement) and the cells."""
        w, h = params.width, params.height
        k_combo, k_pri = jax.random.split(key)

        if all_unique:
            cp = jnp.where(~b["obj_mask"],
                           jax.random.uniform(k_combo, (30,)), -1.0)
            cvals, combos = jax.lax.top_k(cp, num)
            combo_ok = cvals > 0
        else:
            combos = jax.random.randint(k_combo, (num,), 0, 30)
            combo_ok = jnp.ones((num,), bool)
        kind_local = combos // 10
        color = G.take_vec(jnp.asarray(SORTED_COLOR_IDS), combos % 10)
        write_color = color if color_override is None else jnp.full(
            (num,), jnp.asarray(color_override, jnp.int32))

        xs, ys = G.coords(w, h)
        near_agent = (jnp.abs(xs - b["agent_pos"][0])
                      + jnp.abs(ys - b["agent_pos"][1])) < 2
        mask = (G.is_empty(b["grid"]) & self.room_rect_mask(params, i, j)
                & ~near_agent)
        pri = jnp.where(mask.reshape(-1),
                        jax.random.uniform(k_pri, (w * h,)), -1.0)
        pvals, idx = jax.lax.top_k(pri, num)
        ok = (pvals > 0) & combo_ok & jnp.asarray(enabled)
        pos = jnp.stack([idx // h, idx % h], axis=1).astype(jnp.int32)

        grid = b["grid"]
        kinds_t = G.take_vec(jnp.asarray(_KIND_IDS), kind_local)
        for n in range(num):
            triple = jnp.stack([kinds_t[n], write_color[n],
                                jnp.zeros((), jnp.int32)]).astype(jnp.uint8)
            grid = G.put_if(grid, pos[n, 0], pos[n, 1], triple, ok[n])
        b = dict(b)
        b["grid"] = grid
        combo_slot = (kind_local * 10 + combos % 10)  # (num,)
        hit = jnp.any((jnp.arange(30)[None, :] == combo_slot[:, None])
                      & ok[:, None], axis=0)
        b["obj_mask"] = b["obj_mask"] | hit
        added = jnp.stack([kinds_t, color], axis=1).astype(jnp.int32)
        return b, added, pos
