"""BabyAI instruction language — tensor verifier.

Re-derivation of ``minigrid/envs/babyai/core/verifier.py``.  The reference's
instruction AST (ObjDesc matchers + GoTo/Pickup/Open/PutNext clauses composed
by Before/After/And) flattens to a fixed-size code — the grammar
(levelgen.py:157-210) never produces more than Seq(And(c0, c1), And(c2, c3)),
i.e. at most four action clauses:

    InstrCode.seq_kind: 0 single-clause, 1 before, 2 after, 3 and
    InstrCode.a_and / b_and: operand is an And of two clauses
    clauses 0-1 = operand a, clauses 2-3 = operand b (slots 1/3 unused unless
    the operand is an And)

Object identity (the reference's ``obj_set`` instance tracking,
verifier.py:104-169) becomes per-clause position masks plus carry flags:
objects only move via agent pickup/drop, so identity tracking is two masked
writes per step.  Matching the reference exactly, the *verify-visible*
positions (``obj_poss``) refresh only on drop actions (roomgrid_level.py:89-91
calls ``update_objs_poss`` only when action == drop), so a picked-up object's
stale position keeps satisfying GoTo until the next drop action.

Verification is a branchless reimplementation of the Before/After/And state
machines (verifier.py:449-566) over int statuses (0 continue / 1 success /
2 failure).  Clause-local state (the preCarrying snapshot) updates only when
the reference would have evaluated that clause.  The optional
``BABYAI_DONE_ACTIONS`` mode (verifier.py:25, 227-243, 559-561) is modeled
via ``verify_step(..., done_actions=True)`` (exposed as
``EnvParams.babyai_done_actions``); strict SeqInstr composition is unused by
the grammar and unsupported.
"""

from __future__ import annotations

import numpy as np
from flax import struct

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core.step import (
    DONE,
    DROP,
    PICKUP,
    TOGGLE,
    StepOutcome,
    dir_to_vec,
)

# Instruction clause kinds
K_NONE, K_GOTO, K_PICKUP, K_OPEN, K_PUTNEXT = range(5)
# Sequencing kinds
S_SINGLE, S_BEFORE, S_AFTER, S_AND = range(4)
# Statuses
CONTINUE, SUCCESS, FAILURE = 0, 1, 2

# Describable object types (verifier.py:15) — language-local type ids.
OBJ_TYPES = ["box", "ball", "key", "door"]
OBJ_TYPES_NOT_DOOR = ["box", "ball", "key"]
LOC_NAMES = ["left", "right", "front", "behind"]
# desc.type: 0 none/'object', 1 box, 2 ball, 3 key, 4 door
DESC_TYPE_IDS = np.asarray(
    [0] + [C.OBJECT_TO_IDX[t] for t in OBJ_TYPES], dtype=np.int32
)
# desc.loc: 0 none, 1 left, 2 right, 3 front, 4 behind


@struct.dataclass
class InstrCode:
    """Packed instruction program (int32/bool leaves; vmap-able)."""

    seq_kind: jnp.ndarray  # scalar int32
    a_and: jnp.ndarray  # bool
    b_and: jnp.ndarray  # bool
    kinds: jnp.ndarray  # int32[4]
    d1: jnp.ndarray  # int32[4, 3] — (type_local, color_id(0=any), loc)
    d2: jnp.ndarray  # int32[4, 3] — PutNext fixed desc
    strict: jnp.ndarray  # bool[4]


@struct.dataclass
class VerifierState:
    """Runtime tracking state (per env).

    The four position-set planes are BIT-PACKED: column y of plane cell
    (x, y) lives in bit y of word [k, x] (uint32[K, W], grid height ≤ 32) —
    the same packing as the occlusion sweep (core/obs.py::process_vis).
    Unpacked bool[K, W, H] planes were the single largest HBM term of the
    BabyAI step at scale: on BossLevel (K=4, 25×25 grid, batch 4096) the
    pooled consume + tracking update moved ~270 MB/step of bool planes,
    capping the consume-only step at 11.25M steps/s on TPU v5e; packed
    they are ~8× smaller and every per-step plane op (front-cell test,
    pickup/drop move, 4-adjacency test) is one-word bit arithmetic."""

    tracked1: jnp.ndarray  # uint32[K, W] — true current positions, desc1
    tracked2: jnp.ndarray  # uint32[K, W] — desc2 (PutNext fixed)
    stale1: jnp.ndarray  # uint32[K, W] — verify-visible positions (obj_poss)
    stale2: jnp.ndarray  # uint32[K, W]
    carry1: jnp.ndarray  # bool[K] — hand holds a tracked desc1 object
    carry2: jnp.ndarray  # bool[K] — hand holds a tracked desc2 object
    pre_empty: jnp.ndarray  # bool[K] — hands empty at the clause's last eval
    pre_carry1: jnp.ndarray  # bool[K] — tracked desc1 obj in hand at last eval
    # bool[K] — clause condition matched on its last evaluation (the
    # reference's ActionInstr.lastStepMatch, verifier.py:215-249; only
    # consulted in BABYAI_DONE_ACTIONS mode)
    last_match: jnp.ndarray
    # Packed operand statuses: status + 4*c0_success + 8*c1_success.
    a_packed: jnp.ndarray  # int32
    b_packed: jnp.ndarray  # int32


def pack_planes(m: jnp.ndarray) -> jnp.ndarray:
    """bool[..., W, H] -> uint32[..., W]: bit y of word [..., x] = cell (x, y)."""
    h = m.shape[-1]
    # ValueError, not assert: the whole packed layout depends on H fitting a
    # uint32 word (shifts >= 32 would silently wrap), and `python -O` strips
    # asserts — an over-tall grid must fail loudly regardless of flags.
    if h > 32:
        raise ValueError(
            f"packed verifier planes require grid height <= 32, got {h}"
        )
    weights = jnp.uint32(1) << jnp.arange(h, dtype=jnp.uint32)
    return jnp.sum(
        jnp.where(m, weights, jnp.uint32(0)), axis=-1, dtype=jnp.uint32)


def unpack_planes(p: jnp.ndarray, h: int) -> jnp.ndarray:
    """uint32[..., W] -> bool[..., W, H] (inverse of pack_planes)."""
    return (p[..., None] >> jnp.arange(h, dtype=jnp.uint32)) & 1 > 0


def onehot_packed(w: int, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """uint32[W] one-hot plane of cell (x, y) in the packed layout.

    Public contract of the packed plane layout: bit y of word x = cell
    (x, y).  Level generators (e.g. PutNextCarrying's post_generate) build
    single-cell masks with this to edit tracked planes without a scatter."""
    return jnp.where(
        jnp.arange(w, dtype=jnp.int32) == x,
        jnp.uint32(1) << y.astype(jnp.uint32), jnp.uint32(0))


# retained alias for the internal call sites below
_front_packed = onehot_packed


def desc(type_id, color_id=0, loc=0) -> jnp.ndarray:
    """Build a desc vector from a *world* type id (box/ball/key/door) or 0
    for 'object'.  All arguments may be traced."""
    t = jnp.asarray(type_id, jnp.int32)
    local = jnp.where(t == C.OBJECT_TO_IDX["box"], 1,
                      jnp.where(t == C.OBJECT_TO_IDX["ball"], 2,
                                jnp.where(t == C.OBJECT_TO_IDX["key"], 3,
                                          jnp.where(t == C.OBJECT_TO_IDX["door"],
                                                    4, 0))))
    return jnp.stack([local, jnp.asarray(color_id, jnp.int32),
                      jnp.asarray(loc, jnp.int32)])


def empty_instr(n: int = 4) -> InstrCode:
    return InstrCode(
        seq_kind=jnp.asarray(S_SINGLE, jnp.int32),
        a_and=jnp.asarray(False),
        b_and=jnp.asarray(False),
        kinds=jnp.zeros((n,), jnp.int32),
        d1=jnp.zeros((n, 3), jnp.int32),
        d2=jnp.zeros((n, 3), jnp.int32),
        strict=jnp.zeros((n,), bool),
    )


def single_clause(kind, d1, d2=None, strict=False, n: int = 1) -> InstrCode:
    """InstrCode for one action clause.  Arguments may be traced values.

    The clause count ``n`` is a STATIC specialization knob: a single-clause
    level family carries an ``n=1`` code, which collapses the verifier's
    tracked planes from [4, W, H] to [1, W, H] and compiles ``verify_step``
    down to the one-clause status path — no Before/After/And machinery, a
    quarter of the desc-match planes at generation.  Composite codes
    (``and_instr``/``seq_instr``) are always 4-slot."""
    base = empty_instr(n)
    # slot 0 is a static index: concatenate instead of .at[0].set (a
    # one-element scatter costs its own kernel in the generation graph)
    kinds = jnp.concatenate([jnp.asarray(kind, jnp.int32)[None],
                             base.kinds[1:]])
    d1_arr = jnp.concatenate([jnp.asarray(d1, jnp.int32)[None, :],
                              base.d1[1:]])
    d2_arr = base.d2
    if d2 is not None:
        d2_arr = jnp.concatenate([jnp.asarray(d2, jnp.int32)[None, :],
                                  base.d2[1:]])
    return base.replace(
        kinds=kinds, d1=d1_arr, d2=d2_arr,
        strict=jnp.concatenate([jnp.asarray(strict)[None],
                                base.strict[1:]]),
    )


def pad_clauses(x: InstrCode, n: int = 4) -> InstrCode:
    """Zero-pad an InstrCode to ``n`` clause slots (K_NONE clauses are
    inert in every status path)."""
    k = x.kinds.shape[0]
    if k >= n:
        return x
    p = n - k
    return x.replace(
        kinds=jnp.concatenate([x.kinds, jnp.zeros((p,), jnp.int32)]),
        d1=jnp.concatenate([x.d1, jnp.zeros((p, 3), jnp.int32)]),
        d2=jnp.concatenate([x.d2, jnp.zeros((p, 3), jnp.int32)]),
        strict=jnp.concatenate([x.strict, jnp.zeros((p,), bool)]),
    )


def and_instr(a: InstrCode, b: InstrCode) -> InstrCode:
    """AndInstr(a, b) of two single clauses (verifier.py:531-540)."""
    return InstrCode(
        seq_kind=jnp.asarray(S_AND, jnp.int32),
        a_and=jnp.asarray(False),
        b_and=jnp.asarray(False),
        kinds=jnp.stack([a.kinds[0], jnp.asarray(0), b.kinds[0], jnp.asarray(0)]),
        d1=jnp.stack([a.d1[0], jnp.zeros(3, jnp.int32), b.d1[0],
                      jnp.zeros(3, jnp.int32)]),
        d2=jnp.stack([a.d2[0], jnp.zeros(3, jnp.int32), b.d2[0],
                      jnp.zeros(3, jnp.int32)]),
        strict=jnp.stack([a.strict[0], jnp.asarray(False), b.strict[0],
                          jnp.asarray(False)]),
    )


def seq_instr(seq_kind, a: InstrCode, b: InstrCode) -> InstrCode:
    """Before/After(a, b) where a, b are single or And codes.  An And operand
    occupies both slots of its half; a single operand occupies the first.
    seq_kind may be traced (S_BEFORE or S_AFTER)."""
    a = pad_clauses(a)
    b = pad_clauses(b)

    def half(x: InstrCode):
        is_and = x.seq_kind == S_AND
        # single clause sits at slot 0; And at slots 0 (=0) and 1 (=2)
        k = jnp.stack([x.kinds[0], jnp.where(is_and, x.kinds[2], 0)])
        d1 = jnp.stack([x.d1[0], jnp.where(is_and, x.d1[2], jnp.zeros(3, jnp.int32))])
        d2 = jnp.stack([x.d2[0], jnp.where(is_and, x.d2[2], jnp.zeros(3, jnp.int32))])
        s = jnp.stack([x.strict[0], jnp.where(is_and, x.strict[2], False)])
        return is_and, k, d1, d2, s

    a_is_and, ak, ad1, ad2, as_ = half(a)
    b_is_and, bk, bd1, bd2, bs = half(b)
    return InstrCode(
        seq_kind=jnp.asarray(seq_kind, jnp.int32),
        a_and=a_is_and,
        b_and=b_is_and,
        kinds=jnp.concatenate([ak, bk]),
        d1=jnp.concatenate([ad1, bd1]),
        d2=jnp.concatenate([ad2, bd2]),
        strict=jnp.concatenate([as_, bs]),
    )


def desc_match_mask(
    grid: jnp.ndarray,
    desc: jnp.ndarray,
    agent_pos: jnp.ndarray,
    agent_dir: jnp.ndarray,
    room_mask: jnp.ndarray | None,
) -> jnp.ndarray:
    """ObjDesc.find_matching_objs at reset (verifier.py:104-169): (W, H) mask
    of cells matching (type, color, loc); location predicates are relative to
    the agent's initial pose and restricted to its starting room
    (verifier.py:141-144)."""
    t_local, color, loc = desc[0], desc[1], desc[2]
    types = (grid & 0xFF).astype(jnp.int32)
    colors = ((grid >> 8) & 0xFF).astype(jnp.int32)
    is_desc_obj = (
        (types == C.OBJECT_TO_IDX["box"])
        | (types == C.OBJECT_TO_IDX["ball"])
        | (types == C.OBJECT_TO_IDX["key"])
        | (types == C.OBJECT_TO_IDX["door"])
    )
    want_type = jnp.asarray(DESC_TYPE_IDS)[t_local]
    m = jnp.where(t_local == 0, is_desc_obj, types == want_type)
    m &= jnp.where(color == 0, True, colors == color)

    w, h = types.shape
    xs = jnp.arange(w)[:, None]
    ys = jnp.arange(h)[None, :]
    vx = xs - agent_pos[0]
    vy = ys - agent_pos[1]
    f0, f1 = dir_to_vec(agent_dir)  # selects, not a table gather
    dot_d1 = vx * f0 + vy * f1
    dot_d2 = vx * (-f1) + vy * f0
    loc_ok = jnp.where(
        loc == 1, dot_d2 < 0,
        jnp.where(loc == 2, dot_d2 > 0,
                  jnp.where(loc == 3, dot_d1 > 0,
                            jnp.where(loc == 4, dot_d1 < 0, True))))
    if room_mask is not None:
        loc_ok = loc_ok & room_mask
    m &= jnp.where(loc == 0, True, loc_ok)
    return m


def init_verifier_state(
    grid: jnp.ndarray,
    instr: InstrCode,
    agent_pos: jnp.ndarray,
    agent_dir: jnp.ndarray,
    room_mask: jnp.ndarray,
    masks: tuple[jnp.ndarray, jnp.ndarray] | None = None,
) -> VerifierState:
    """reset_verifier for every clause (verifier.py:262-266, 332-339, ...).

    ``masks`` lets the caller pass precomputed (tracked1, tracked2) desc
    match planes — generation needs the same 8 planes for the article
    flags, and desc_match_mask is a noticeable slice of the level-gen
    graph."""
    n_clauses = instr.kinds.shape[0]
    if masks is not None:
        tracked1, tracked2 = masks
    else:
        masks1, masks2 = [], []
        for k in range(n_clauses):
            masks1.append(desc_match_mask(grid, instr.d1[k], agent_pos,
                                          agent_dir, room_mask))
            masks2.append(desc_match_mask(grid, instr.d2[k], agent_pos,
                                          agent_dir, room_mask))
        tracked1 = jnp.stack(masks1)
        tracked2 = jnp.stack(masks2)
    tracked1 = pack_planes(tracked1)
    tracked2 = pack_planes(tracked2)
    return VerifierState(
        tracked1=tracked1,
        tracked2=tracked2,
        stale1=tracked1,
        stale2=tracked2,
        carry1=jnp.zeros((n_clauses,), bool),
        carry2=jnp.zeros((n_clauses,), bool),
        pre_empty=jnp.ones((n_clauses,), bool),  # preCarrying = None at reset
        pre_carry1=jnp.zeros((n_clauses,), bool),
        last_match=jnp.zeros((n_clauses,), bool),
        a_packed=jnp.asarray(CONTINUE, jnp.int32),
        b_packed=jnp.asarray(CONTINUE, jnp.int32),
    )


def _update_tracking(
    vs: VerifierState, outcome: StepOutcome, action: jnp.ndarray, h: int
) -> VerifierState:
    """Follow pickup/drop object movement; refresh verify-visible masks on
    drop actions (roomgrid_level.py:89-91)."""
    w = vs.tracked1.shape[1]
    fx = jnp.clip(outcome.fwd_pos[0], 0, w - 1)
    fy = jnp.clip(outcome.fwd_pos[1], 0, h - 1)

    # One-cell update across the K tracked planes as one-word bit math on
    # the packed layout (not a scatter — see core/grid_ops.put for why).
    front = _front_packed(w, fx, fy)  # uint32[w]

    def upd(tracked, carry):
        was = jnp.any((tracked & front[None]) != 0, axis=1)
        new_carry = jnp.where(outcome.picked_up, was, carry)
        cell = jnp.where(outcome.picked_up, False, was)
        cell = jnp.where(outcome.dropped & new_carry, True, cell)
        tracked = jnp.where(cell[:, None], tracked | front[None],
                            tracked & ~front[None])
        new_carry = jnp.where(outcome.dropped, False, new_carry)
        return tracked, new_carry

    tracked1, carry1 = upd(vs.tracked1, vs.carry1)
    # Fixed-desc (desc2) objects can also be picked up and relocated; the
    # reference re-finds obj_set members on the grid after every drop
    # (verifier.py:205-212, find_matching_objs use_location=False), so the
    # dropped object's NEW position must re-enter tracked2 — a carry flag
    # per clause restores the bit at the drop cell, same as tracked1.
    tracked2, carry2 = upd(vs.tracked2, vs.carry2)

    refresh = action == DROP
    stale1 = jnp.where(refresh, tracked1, vs.stale1)
    stale2 = jnp.where(refresh, tracked2, vs.stale2)
    return vs.replace(tracked1=tracked1, tracked2=tracked2,
                      stale1=stale1, stale2=stale2, carry1=carry1,
                      carry2=carry2)


def _eval_clauses(
    vs: VerifierState,
    instr: InstrCode,
    grid: jnp.ndarray,
    agent_pos: jnp.ndarray,
    agent_dir: jnp.ndarray,
    action: jnp.ndarray,
    outcome: StepOutcome,
) -> jnp.ndarray:
    """Raw verify_action results (int32[4]) for every clause this step.

    All per-cell reads are bit tests against the packed tracked planes,
    evaluated for the 4 clauses at once — vmapped one-cell gathers lower to
    serialized kCustom kernels (~40-80us each at batch 4096 on TPU v5e) and
    there would be ~25 of them per step here; unpacked bool-plane reduces
    were 8× the bytes."""
    w, h = grid.shape[:2]
    fdx, fdy = dir_to_vec(agent_dir)
    fwd = agent_pos + jnp.stack([fdx, fdy])
    in_b = (fwd[0] >= 0) & (fwd[0] < w) & (fwd[1] >= 0) & (fwd[1] < h)
    fx = jnp.clip(fwd[0], 0, w - 1)
    fy = jnp.clip(fwd[1], 0, h - 1)
    xs = jax.lax.broadcasted_iota(jnp.int32, (w, h), 0)
    ys = jax.lax.broadcasted_iota(jnp.int32, (w, h), 1)
    front = (xs == fx) & (ys == fy)  # bool[w, h]
    fwd_word = jnp.max(jnp.where(front, grid, jnp.uint32(0)), axis=(0, 1))
    fwd_is_door = ((fwd_word & 0xFF).astype(jnp.int32)
                   == C.OBJECT_TO_IDX["door"]) & in_b
    fwd_open = ((fwd_word >> 16) & 0xFF).astype(
        jnp.int32) == C.STATE_TO_IDX["open"]
    # carrying anything after the step
    empty_before = outcome.prev_carrying[0] == C.OBJECT_TO_IDX["empty"]
    carrying_after = (~empty_before & ~outcome.dropped) | outcome.picked_up
    # drop position for PutNext = the cell written by the drop
    dx = jnp.clip(outcome.fwd_pos[0], 0, w - 1)
    dy = jnp.clip(outcome.fwd_pos[1], 0, h - 1)
    # 4-neighborhood of the drop cell on the packed layout: same-column
    # neighbors are bit shifts of the drop bit (a shift past bit 0 or past
    # bit h-1 falls off / lands on a never-set bit — |Δ|=1 is in-bounds by
    # construction anyway); adjacent columns test the drop bit itself.
    xs_w = jnp.arange(w, dtype=jnp.int32)
    dbit = jnp.uint32(1) << dy.astype(jnp.uint32)
    adj_p = (jnp.where(xs_w == dx, (dbit << 1) | (dbit >> 1), jnp.uint32(0))
             | jnp.where(jnp.abs(xs_w - dx) == 1, dbit, jnp.uint32(0)))

    # per-clause [4] packed-plane reads, one word-reduce each
    front_p = _front_packed(w, fx, fy)
    stale1_at_front = jnp.any((vs.stale1 & front_p[None]) != 0, axis=1)
    tracked1_at_front = jnp.any((vs.tracked1 & front_p[None]) != 0, axis=1)
    stale2_adj = jnp.any((vs.stale2 & adj_p[None]) != 0, axis=1)

    kind = instr.kinds  # int32[K]
    strict = instr.strict  # bool[K]

    # GoTo (verifier.py:307-314): facing a verify-visible position.
    goto_succ = stale1_at_front & in_b
    # Open (verifier.py:268-285).
    open_succ = (action == TOGGLE) & tracked1_at_front & fwd_is_door & fwd_open
    open_fail = (action == TOGGLE) & strict & fwd_is_door & ~open_succ
    # Pickup (verifier.py:341-361): hands were empty at last eval AND the
    # hand now holds a tracked object.
    pickup_succ = (action == PICKUP) & vs.pre_empty & vs.carry1
    pickup_fail = (action == PICKUP) & strict & carrying_after & ~pickup_succ
    # PutNext (verifier.py:409-433): the clause's last-seen carried object
    # was tracked-move, it was dropped, and the drop cell is 4-adjacent to a
    # fixed-desc position.
    putnext_succ = ((action == DROP) & outcome.dropped & vs.pre_carry1
                    & stale2_adj)
    putnext_fail = (action == PICKUP) & strict & carrying_after

    res = jnp.full(kind.shape, CONTINUE, jnp.int32)
    res = jnp.where((kind == K_GOTO) & goto_succ, SUCCESS, res)
    res = jnp.where((kind == K_OPEN) & open_succ, SUCCESS, res)
    res = jnp.where((kind == K_OPEN) & open_fail & (res == CONTINUE),
                    FAILURE, res)
    res = jnp.where((kind == K_PICKUP) & pickup_succ, SUCCESS, res)
    res = jnp.where((kind == K_PICKUP) & pickup_fail & (res == CONTINUE),
                    FAILURE, res)
    res = jnp.where((kind == K_PUTNEXT) & putnext_succ, SUCCESS, res)
    res = jnp.where((kind == K_PUTNEXT) & putnext_fail & (res == CONTINUE),
                    FAILURE, res)
    return res


def _unpack(p):
    return p % 4, (p // 4) % 2 == 1, (p // 8) % 2 == 1


def _pack(status, c0, c1):
    return status + 4 * c0.astype(jnp.int32) + 8 * c1.astype(jnp.int32)


def verify_step(
    vs: VerifierState,
    instr: InstrCode,
    grid: jnp.ndarray,
    agent_pos: jnp.ndarray,
    agent_dir: jnp.ndarray,
    action: jnp.ndarray,
    outcome: StepOutcome,
    done_actions: bool = False,
) -> tuple[VerifierState, jnp.ndarray]:
    """One verifier tick after the env transition (roomgrid_level.py:86-103).
    Returns (new state, status ∈ {CONTINUE, SUCCESS, FAILURE}).

    ``done_actions`` (static) enables the reference's BABYAI_DONE_ACTIONS
    mode (verifier.py:25, 227-243): a clause succeeds only via an explicit
    ``done`` action taken while its condition matched on the previous step;
    a ``done`` without a match fails, and non-done actions never terminate
    (their raw result is recorded in ``last_match`` and discarded)."""
    action = jnp.asarray(action, jnp.int32)
    vs = _update_tracking(vs, outcome, action, grid.shape[1])
    raw = _eval_clauses(vs, instr, grid, agent_pos, agent_dir, action, outcome)
    if done_actions:
        raw_match = raw == SUCCESS
        is_done_act = action == DONE
        raw = jnp.where(
            is_done_act,
            jnp.where(vs.last_match, SUCCESS, FAILURE),
            CONTINUE,
        )

    if instr.kinds.shape[0] == 1:
        # Statically single-clause family (n=1 InstrCode): the raw clause
        # result IS the episode status — the whole Before/After/And operand
        # machinery compiles away, and clause 0 is unconditionally active
        # (matches the S_SINGLE path below: a_active=True, b_active=False).
        status = raw[0]
        empty_before = outcome.prev_carrying[0] == C.OBJECT_TO_IDX["empty"]
        hands_empty_after = ((empty_before & ~outcome.picked_up)
                             | outcome.dropped)
        new_last_match = vs.last_match
        if done_actions:
            new_last_match = jnp.where(~is_done_act, raw_match, vs.last_match)
        vs = vs.replace(pre_empty=hands_empty_after[None],
                        pre_carry1=vs.carry1,
                        last_match=new_last_match)
        return vs, status

    a_stat, a_c0, a_c1 = _unpack(vs.a_packed)
    b_stat, b_c0, b_c1 = _unpack(vs.b_packed)

    def operand(base, is_and, c0_done, c1_done):
        """AndInstr.verify (verifier.py:552-566) or single clause result."""
        r0 = jnp.where(c0_done, SUCCESS, raw[base])
        r1 = jnp.where(c1_done, SUCCESS, raw[base + 1])
        and_res = jnp.where((r0 == SUCCESS) & (r1 == SUCCESS),
                            SUCCESS, CONTINUE)
        if done_actions:
            # AndInstr fails on a `done` action when both (non-yet-succeeded)
            # operands fail (verifier.py:559-561); a locked success makes the
            # corresponding r SUCCESS, blocking the failure — as upstream,
            # where `a_done == "failure"` is False once a_done is "success".
            and_res = jnp.where(
                is_done_act & (r0 == FAILURE) & (r1 == FAILURE),
                FAILURE, and_res)
        return (jnp.where(is_and, and_res, raw[base]),
                r0 == SUCCESS, r1 == SUCCESS)

    a_res, a_c0n, a_c1n = operand(0, instr.a_and, a_c0, a_c1)
    b_res, b_c0n, b_c1n = operand(2, instr.b_and, b_c0, b_c1)
    seq = instr.seq_kind

    # --- Single clause: the raw result terminates the episode directly. ----
    single_status = a_res

    # --- Top-level And: lock operand successes across steps. ---------------
    a_eff = jnp.where(a_stat == SUCCESS, SUCCESS, a_res)
    b_eff = jnp.where(b_stat == SUCCESS, SUCCESS, b_res)
    and_status = jnp.where((a_eff == SUCCESS) & (b_eff == SUCCESS),
                           SUCCESS, CONTINUE)
    if done_actions:
        # Top-level And: a bad `done` (both operands failed) ends the episode
        # with FAILURE instead of continuing (verifier.py:559-561).
        and_status = jnp.where(
            is_done_act & (a_eff == FAILURE) & (b_eff == FAILURE),
            FAILURE, and_status)

    # --- Before (verifier.py:465-487). --------------------------------------
    a_done = a_stat == SUCCESS
    bef_a_new = jnp.where(a_done, a_stat, a_res)
    bef_b_active = a_done | (bef_a_new == SUCCESS)
    bef_b_new = jnp.where(bef_b_active, b_res, b_stat)
    before_status = jnp.where(
        (~a_done & (bef_a_new == FAILURE))
        | (bef_b_active & (bef_b_new == FAILURE)),
        FAILURE,
        jnp.where(bef_b_active & (bef_b_new == SUCCESS), SUCCESS, CONTINUE))

    # --- After (verifier.py:506-528): mirror. --------------------------------
    b_done = b_stat == SUCCESS
    aft_b_new = jnp.where(b_done, b_stat, b_res)
    aft_a_active = b_done | (aft_b_new == SUCCESS)
    aft_a_new = jnp.where(aft_a_active, a_res, a_stat)
    after_status = jnp.where(
        (~b_done & (aft_b_new == FAILURE))
        | (aft_a_active & (aft_a_new == FAILURE)),
        FAILURE,
        jnp.where(aft_a_active & (aft_a_new == SUCCESS), SUCCESS, CONTINUE))

    status = jnp.where(
        seq == S_SINGLE, single_status,
        jnp.where(seq == S_BEFORE, before_status,
                  jnp.where(seq == S_AFTER, after_status, and_status)))

    # --- operand activity (which clauses the reference evaluated) -----------
    a_active = jnp.where(
        seq == S_BEFORE, ~a_done,
        jnp.where(seq == S_AFTER, aft_a_active,
                  jnp.where(seq == S_AND, a_stat != SUCCESS, True)))
    b_active = jnp.where(
        seq == S_BEFORE, bef_b_active,
        jnp.where(seq == S_AFTER, ~b_done,
                  jnp.where(seq == S_AND, b_stat != SUCCESS, False)))

    # --- persist operand statuses -------------------------------------------
    new_a_stat = jnp.where(
        seq == S_BEFORE, bef_a_new,
        jnp.where(seq == S_AFTER, aft_a_new,
                  jnp.where(a_active & (a_res == SUCCESS), SUCCESS, a_stat)))
    new_b_stat = jnp.where(
        seq == S_BEFORE, bef_b_new,
        jnp.where(seq == S_AFTER, aft_b_new,
                  jnp.where(b_active & (b_res == SUCCESS), SUCCESS, b_stat)))
    new_a = _pack(new_a_stat,
                  jnp.where(a_active, a_c0n, a_c0),
                  jnp.where(a_active, a_c1n, a_c1))
    new_b = _pack(new_b_stat,
                  jnp.where(b_active, b_c0n, b_c0),
                  jnp.where(b_active, b_c1n, b_c1))

    # --- clause-local preCarrying snapshots, gated by activity ---------------
    clause_active = jnp.stack([a_active, a_active & instr.a_and,
                               b_active, b_active & instr.b_and])
    empty_before = outcome.prev_carrying[0] == C.OBJECT_TO_IDX["empty"]
    hands_empty_after = (empty_before & ~outcome.picked_up) | outcome.dropped
    new_pre_empty = jnp.where(clause_active, hands_empty_after, vs.pre_empty)
    new_pre_carry1 = jnp.where(clause_active, vs.carry1, vs.pre_carry1)

    new_last_match = vs.last_match
    if done_actions:
        # lastStepMatch updates only when verify() ran for the clause and the
        # action was not `done` (verifier.py:236-243).
        new_last_match = jnp.where(clause_active & ~is_done_act,
                                   raw_match, vs.last_match)

    vs = vs.replace(a_packed=new_a, b_packed=new_b,
                    pre_empty=new_pre_empty, pre_carry1=new_pre_carry1,
                    last_match=new_last_match)
    return vs, status


def num_navs(instr: InstrCode) -> jnp.ndarray:
    """num_navs_needed (roomgrid_level.py:215-235): putnext counts 2,
    other actions 1, compositions add."""
    per_clause = jnp.where(
        instr.kinds == K_PUTNEXT, 2, jnp.where(instr.kinds == K_NONE, 0, 1)
    )
    return jnp.sum(per_clause)
