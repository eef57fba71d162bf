"""BabyAI level base — RoomGridLevel as a tensor program.

Re-derivation of ``minigrid/envs/babyai/core/roomgrid_level.py``:

* the generate-validate-retry loop (roomgrid_level.py:118-143, catching
  RejectSampling and resampling forever) becomes a fueled regeneration loop —
  each level's :meth:`gen_level` returns (state, valid) and invalid draws are
  retried with fresh keys up to a static attempt budget;
* the per-episode step limit ``num_navs * room² * rows * cols``
  (roomgrid_level.py:76-83) is computed from the sampled instruction and
  stored in ``state.max_steps``;
* the step hook runs the tensor verifier (roomgrid_level.py:86-103): success
  terminates with the shaped reward, failure terminates with 0;
* ``check_objs_reachable`` (roomgrid_level.py:249-301) is a bounded boolean
  flood fill (doors of any state are passable; objects are visitable but
  block expansion).

The observation's ``mission`` field carries the flattened instruction code
(35 ints + 2 article bits per desc); ``mission_text`` rebuilds the exact
reference surface string (verifier.py surface functions).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from minigrid_tpu.babyai import verifier as V
from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid_ops as G
from minigrid_tpu.core.roomgrid import RoomGridEnv
from minigrid_tpu.core.state import EnvParams, EnvState, base_state
from minigrid_tpu.core.step import DROP


def flatten_instr(instr: V.InstrCode, articles: jnp.ndarray) -> jnp.ndarray:
    """InstrCode -> int32[43] mission vector.
    Layout: [seq, a_and, b_and, kinds(4), d1(12), d2(12), strict(4),
    articles(8)] where articles[2k], articles[2k+1] flag plural ('a' vs
    'the') for clause k's desc1/desc2 (verifier.py:96-100).

    Single-clause (n=1) codes are zero-padded here so the mission layout is
    identical across all level families."""
    instr = V.pad_clauses(instr)
    if articles.shape[0] < 8:
        articles = jnp.concatenate(
            [articles, jnp.zeros((8 - articles.shape[0],), articles.dtype)]
        )
    return jnp.concatenate([
        jnp.stack([instr.seq_kind, instr.a_and.astype(jnp.int32),
                   instr.b_and.astype(jnp.int32)]),
        instr.kinds,
        instr.d1.reshape(-1),
        instr.d2.reshape(-1),
        instr.strict.astype(jnp.int32),
        articles.astype(jnp.int32),
    ]).astype(jnp.int32)


def unflatten_instr(mission: np.ndarray) -> tuple[V.InstrCode, np.ndarray]:
    m = np.asarray(mission)
    instr = V.InstrCode(
        seq_kind=jnp.asarray(m[0]),
        a_and=jnp.asarray(bool(m[1])),
        b_and=jnp.asarray(bool(m[2])),
        kinds=jnp.asarray(m[3:7]),
        d1=jnp.asarray(m[7:19].reshape(4, 3)),
        d2=jnp.asarray(m[19:31].reshape(4, 3)),
        strict=jnp.asarray(m[31:35].astype(bool)),
    )
    return instr, m[35:43]


def desc_surface(d, plural: bool) -> str:
    """ObjDesc.surface (verifier.py:72-102)."""
    t, color, loc = int(d[0]), int(d[1]), int(d[2])
    s = "object" if t == 0 else V.OBJ_TYPES[t - 1]
    if color:
        s = C.IDX_TO_COLOR[color] + " " + s
    if loc == 3:
        s += " in front of you"
    elif loc == 4:
        s += " behind you"
    elif loc in (1, 2):
        s += " on your " + V.LOC_NAMES[loc - 1]
    return ("a " if plural else "the ") + s


def clause_surface(kind: int, d1, d2, a1: bool, a2: bool) -> str:
    if kind == V.K_GOTO:
        return "go to " + desc_surface(d1, a1)
    if kind == V.K_PICKUP:
        return "pick up " + desc_surface(d1, a1)
    if kind == V.K_OPEN:
        return "open " + desc_surface(d1, a1)
    if kind == V.K_PUTNEXT:
        return ("put " + desc_surface(d1, a1) + " next to " + desc_surface(d2, a2))
    return ""


class BabyAILevel(RoomGridEnv):
    """Base class for BabyAI levels."""

    name = "BabyAILevel"
    max_gen_attempts: int = 8
    # Missions come from a recursive grammar -> gym adapter declares an
    # accept-all BabyAIMissionSpace (reference roomgrid_level.py:26-42).
    grammar_missions = True


    def __init__(self, room_size: int = 8, num_rows: int = 3, num_cols: int = 3,
                 max_steps: int | None = None, **kwargs):
        # max_steps=None -> per-episode dynamic limit (roomgrid_level.py:57-62);
        # the params field holds a fallback bound.
        self.fixed_max_steps = max_steps is not None
        nav_bound = room_size**2 * num_rows * num_cols * 8
        # Speculative generation width (see generate).  With the pooled
        # reset strategy (parallel/vector.py) regeneration is off the hot
        # step path entirely, so K>1 only multiplies the compiled gen-graph
        # size for no wall-clock win; the fueled mop-up loop alone handles
        # the ~16% rejection rate.
        self.parallel_gen_attempts = 1
        # Verifier success/failure can fire on any step, so BabyAI episode
        # ends are frequent and desynchronized -> VectorEnv picks the pooled
        # reset strategy.  Refill bandwidth scales with how fast episodes
        # turn over: single-room levels end within ~room^2 steps (B/8 fresh
        # levels per step), maze levels run long episodes (B/256 suffices
        # and the generator is far heavier).
        self.desynchronized_resets = True
        self.pool_refill_fraction = (1 / 8 if num_rows * num_cols == 1
                                     else 1 / 256)
        super().__init__(room_size=room_size, num_rows=num_rows,
                         num_cols=num_cols,
                         max_steps=max_steps if max_steps is not None else nav_bound,
                         **kwargs)

    # ------------------------------------------------------------------ #
    # generation
    # ------------------------------------------------------------------ #

    def gen_level(self, key: jnp.ndarray, params: EnvParams
                  ) -> tuple[dict, V.InstrCode, jnp.ndarray, jnp.ndarray]:
        """Per-level mission generator.  Returns (builder, instr, articles,
        valid)."""
        raise NotImplementedError

    def generate(self, key: jnp.ndarray, params: EnvParams) -> EnvState:
        def attempt(k):
            b, instr, articles, valid = self.gen_level(k, params)
            return b, instr, articles, valid

        def cond(carry):
            _, _, _, valid, k, n = carry
            return (~valid) & (n < self.max_gen_attempts)

        def body(carry):
            _, _, _, _, k, n = carry
            k, sub = jax.random.split(k)
            b, instr, articles, valid = attempt(sub)
            return (b, instr, articles, valid, k, n + 1)

        key, k0, k_state = jax.random.split(key, 3)
        # Speculative parallel attempts: "first valid of K iid attempts" is
        # the same distribution as sequential retry, but the K generations
        # have no sequential dependency — under vmap the fueled while_loop
        # otherwise runs max-attempts-across-the-batch full gen_level bodies
        # (~7 at batch 4096 with a 16% reject rate).  The while below only
        # mops up the ~p^K stragglers.  K trades compile size for runtime:
        # multi-room LevelGen graphs are large, so they stay sequential.
        K = self.parallel_gen_attempts
        if K <= 1:
            # Single-attempt path: instantiate the gen graph ONCE, inside the
            # while body only (a zeroed dummy carry + valid=False forces the
            # first iteration).  A separate pre-loop attempt would double the
            # compiled gen-graph size — XLA inlines each call site — for no
            # runtime win: the loop's first iteration IS the first attempt.
            shapes = jax.eval_shape(attempt, k0)
            b, instr, articles, valid = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), shapes)
            b, instr, articles, valid, _, _ = jax.lax.while_loop(
                cond, body, (b, instr, articles, valid, key, jnp.asarray(0))
            )
        else:
            cand = [attempt(k) for k in jax.random.split(k0, K)]
            b, instr, articles, valid = cand[-1]
            for cb, ci, ca, cv in reversed(cand[:-1]):
                b, instr, articles = jax.tree_util.tree_map(
                    lambda a, bb, cv=cv: jnp.where(cv, a, bb),
                    (cb, ci, ca), (b, instr, articles))
                valid = cv | valid
            b, instr, articles, valid, _, _ = jax.lax.while_loop(
                cond, body, (b, instr, articles, valid, key, jnp.asarray(1))
            )
        return self._finalize(b, instr, k_state, params)

    def generate_attempt(self, key: jnp.ndarray, params: EnvParams
                         ) -> tuple[EnvState, jnp.ndarray]:
        """ONE unvalidated generation attempt: (state, valid).

        The pooled VectorEnv refill uses this instead of :meth:`generate`:
        under vmap the fueled retry loop runs max-attempts-across-the-window
        full gen bodies (~4 at 512-wide refill with an 11% reject rate), so
        dropping the loop cuts the refill to exactly one body; an invalid
        draw keeps the slot's previous (valid) level instead
        (parallel/vector.py best-effort refill)."""
        key, k0, k_state = jax.random.split(key, 3)
        b, instr, articles, valid = self.gen_level(k0, params)
        return self._finalize(b, instr, k_state, params), valid

    def _finalize(self, b, instr, k_state, params) -> EnvState:
        # Verifier state + per-episode step limit (roomgrid_level.py:70-83).
        # The 8 desc-match planes are computed ONCE here, after the retry
        # loop, and serve both the verifier tracking state and the article
        # ('a'/'the') flags — gen_level attempts no longer pay for them.
        room_mask = self.agent_room_mask(b, params)
        n_clauses = instr.kinds.shape[0]
        masks = jax.vmap(V.desc_match_mask, in_axes=(None, 0, None, None, None))(
            b["grid"], jnp.concatenate([instr.d1, instr.d2]),
            b["agent_pos"], b["agent_dir"], room_mask)
        tracked1, tracked2 = masks[:n_clauses], masks[n_clauses:]
        plural = jnp.sum(masks, axis=(1, 2)) > 1
        # interleave to [d1_0, d2_0, d1_1, d2_1, ...]
        articles = jnp.stack([plural[:n_clauses], plural[n_clauses:]],
                             axis=1).reshape(-1)
        vs = V.init_verifier_state(b["grid"], instr, b["agent_pos"],
                                   b["agent_dir"], room_mask,
                                   masks=(tracked1, tracked2))
        if self.fixed_max_steps:
            max_steps = jnp.asarray(0, jnp.int32)  # use params.max_steps
        else:
            nav_time_maze = self.room_size**2 * self.num_rows * self.num_cols
            max_steps = V.num_navs(instr) * nav_time_maze

        mission = flatten_instr(instr, articles)
        state = base_state(
            b["grid"], b["agent_pos"], b["agent_dir"], rng=k_state,
            mission=mission, box_contains=b.get("box_contains"),
            max_steps=max_steps,
            extra={"instr": instr, "vs": vs},
        )
        return self.post_generate(state, b, params)

    def post_generate(self, state: EnvState, b: dict,
                      params: EnvParams) -> EnvState:
        """Hook for level classes that mutate state after reset (e.g.
        PutNext's start_carrying, putnext.py:84-93)."""
        return state

    def place_agent_any(self, b: dict, key: jnp.ndarray, params: EnvParams,
                        exclude_room=None) -> dict:
        """RoomGrid.place_agent with random room (roomgrid.py:313-334);
        `exclude_room` (ri, rj) masks out a room (LevelGen's not-the-locked-
        room retry, levelgen.py:67-73 — the retry distribution equals a
        uniform draw over the remaining rooms)."""
        k_room, k_pos = jax.random.split(key)
        n_rooms = self.num_rows * self.num_cols
        logits = jnp.zeros((n_rooms,))
        if exclude_room is not None:
            r = exclude_room[1] * self.num_cols + exclude_room[0]
            logits = jnp.where(jnp.arange(n_rooms) == r, -jnp.inf, 0.0)
        room = jax.random.categorical(k_room, logits)
        ri = room % self.num_cols
        rj = room // self.num_cols
        return self.place_agent_in_room(b, k_pos, params, ri, rj)

    def finish_level(self, b, instr, params, valid=True):
        """Standard (builder, instr, articles, valid) return tuple.

        The articles slot is a placeholder: real flags (and the verifier's
        desc-match planes) are computed once in :meth:`_finalize` after the
        retry loop, not per attempt."""
        return b, instr, jnp.zeros((8,), bool), jnp.asarray(valid)

    def agent_room_mask(self, b: dict, params: EnvParams) -> jnp.ndarray:
        """(W, H) mask of the agent's starting room (for location descs)."""
        s = self.room_size
        ri = b["agent_pos"][0] // (s - 1)
        rj = b["agent_pos"][1] // (s - 1)
        return self.room_rect_mask(params, ri, rj)

    # ------------------------------------------------------------------ #
    # stepping
    # ------------------------------------------------------------------ #

    def post_step(self, state, action, reward, terminated, outcome, params):
        vs, status = V.verify_step(
            state.extra["vs"], state.extra["instr"], state.grid,
            state.agent_pos, state.agent_dir, action, outcome,
            done_actions=params.babyai_done_actions,
        )
        state = state.replace(extra={**state.extra, "vs": vs})
        reward = jnp.where(status == V.SUCCESS,
                           self.task_reward(state, params),
                           jnp.where(status == V.FAILURE, 0.0, reward))
        terminated = terminated | (status != V.CONTINUE)
        return state, reward, terminated

    # ------------------------------------------------------------------ #
    # validation helpers (roomgrid_level.py:145-198, 249-301)
    # ------------------------------------------------------------------ #

    def objs_reachable(self, b: dict, params: EnvParams) -> jnp.ndarray:
        """check_objs_reachable as a bounded flood fill: doors (any state)
        are passable, other objects are visitable but block expansion."""
        grid = b["grid"]
        types = (grid & 0xFF).astype(jnp.int32)
        w, h = types.shape
        empty = types == C.OBJECT_TO_IDX["empty"]
        door = types == C.OBJECT_TO_IDX["door"]
        wall = types == C.OBJECT_TO_IDX["wall"]
        expandable = empty | door
        xs = jax.lax.broadcasted_iota(jnp.int32, (w, h), 0)
        ys = jax.lax.broadcasted_iota(jnp.int32, (w, h), 1)
        agent_cell = (xs == b["agent_pos"][0]) & (ys == b["agent_pos"][1])
        reach = agent_cell  # one-hot seed (a one-cell scatter costs a kernel)
        # constant edge masks kill the roll wrap-around without per-iteration
        # dynamic-update-slices (each lowers to a scatter kernel)
        not_r0, not_rl = xs != 0, xs != w - 1
        not_c0, not_cl = ys != 0, ys != h - 1

        def dilate(reach):
            src = reach & (expandable | agent_cell)
            grown = reach
            grown = grown | (jnp.roll(src, 1, axis=0) & not_r0)
            grown = grown | (jnp.roll(src, -1, axis=0) & not_rl)
            grown = grown | (jnp.roll(src, 1, axis=1) & not_c0)
            grown = grown | (jnp.roll(src, -1, axis=1) & not_cl)
            return grown

        # Fixed-trip dilation instead of a convergence while_loop: each while
        # cond is an extra reduce kernel + a pipeline sync per iteration.
        # 2*(w+h) dilations cover every shortest path a BabyAI level can
        # produce (rooms are convex; distractor counts are far too small to
        # build serpentine corridors approaching the w*h worst case).
        trips = 2 * (w + h)
        if w * h <= 144:
            # small (single-room) grids: full static unroll -> the whole
            # fill is ONE fusion instead of `trips/4` sequential loop
            # bodies, each of which pays a kernel dispatch (~30-100 us —
            # this fill sits in the pooled refill's hot generator)
            for _ in range(trips):
                reach = dilate(reach)
        else:
            def body(_, reach):
                # 4 dilations per trip: same fixpoint, 1/4 the dispatches
                return dilate(dilate(dilate(dilate(reach))))

            reach = jax.lax.fori_loop(0, (trips + 3) // 4, body, reach)
        objects = ~empty & ~wall
        return jnp.all(~objects | reach)

    def putnext_valid(self, b: dict, instr: V.InstrCode, params: EnvParams,
                      agent_pos, agent_dir) -> jnp.ndarray:
        """validate_instrs for PutNext clauses (roomgrid_level.py:159-176):
        move/fixed sets must not share objects or already be adjacent."""
        room_mask = None  # validation runs before agent move constraints
        n = instr.kinds.shape[0]
        masks = jax.vmap(V.desc_match_mask, in_axes=(None, 0, None, None, None))(
            b["grid"], jnp.concatenate([instr.d1, instr.d2]),
            agent_pos, agent_dir, room_mask)
        m1, m2 = masks[:n], masks[n:]  # bool[n, W, H] each
        is_pn = instr.kinds == V.K_PUTNEXT
        shared = jnp.any(m1 & m2, axis=(1, 2))
        xs = jax.lax.broadcasted_iota(jnp.int32, m2.shape, 1)
        ys = jax.lax.broadcasted_iota(jnp.int32, m2.shape, 2)
        w, h = m2.shape[1], m2.shape[2]
        dil = ((jnp.roll(m2, 1, 1) & (xs != 0))
               | (jnp.roll(m2, -1, 1) & (xs != w - 1))
               | (jnp.roll(m2, 1, 2) & (ys != 0))
               | (jnp.roll(m2, -1, 2) & (ys != h - 1)))
        adjacent = jnp.any(m1 & dil, axis=(1, 2))
        return jnp.all(~is_pn | (~shared & ~adjacent))

    # ------------------------------------------------------------------ #
    # mission surface
    # ------------------------------------------------------------------ #

    def mission_codes(self):
        """One representative 43-int mission code ("go to the red ball").

        The BabyAI instruction space is a grammar, not an enumerable
        template×placeholder product; the reference's BabyAIMissionSpace
        likewise surfaces a representative sample and accepts every string
        (roomgrid_level.py:26-42 ``contains() -> True``)."""
        code = np.zeros((1, 43), np.int32)
        code[0, 3] = V.K_GOTO
        code[0, 7] = V.OBJ_TYPES.index("ball") + 1  # d1[0].type
        code[0, 8] = C.COLOR_TO_IDX["red"]  # d1[0].color
        return code

    def mission_text(self, mission) -> str:
        instr, articles = unflatten_instr(np.asarray(mission))
        seq = int(instr.seq_kind)
        kinds = np.asarray(instr.kinds)
        d1 = np.asarray(instr.d1)
        d2 = np.asarray(instr.d2)

        def clause(k):
            return clause_surface(int(kinds[k]), d1[k], d2[k],
                                  bool(articles[2 * k]),
                                  bool(articles[2 * k + 1]))

        def operand(base, is_and):
            if is_and:
                return clause(base) + " and " + clause(base + 1)
            return clause(base)

        a = operand(0, bool(instr.a_and))
        b = operand(2, bool(instr.b_and))
        if seq == V.S_SINGLE:
            return a
        if seq == V.S_AND:
            return a + " and " + b
        if seq == V.S_BEFORE:
            return a + ", then " + b
        return a + " after you " + b
