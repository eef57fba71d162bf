"""Worker for the BABYAI_DONE_ACTIONS parity test.

The reference latches the flag at import time
(envs/babyai/core/verifier.py:25), so this runs in its own process with the
env var set before any import, then locksteps the reference against the
tensor engine with ``EnvParams.babyai_done_actions=True``:

* random actions including ``done`` — a done with no prior match fails the
  episode (reward 0), non-done actions never terminate;
* a scripted solve — navigate until the condition matches, then ``done`` —
  succeeds with the identical shaped reward on both sides.

Prints DONE-ACTIONS-OK on success.
"""

from __future__ import annotations

import os
import sys

os.environ["BABYAI_DONE_ACTIONS"] = "1"
sys.path.insert(0, "/root/repo")
sys.path.append("/root/reference")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from minigrid_tpu.core.grid_ops import unpack_np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main() -> None:
    import minigrid.envs.babyai.core.verifier as RefV

    assert RefV.use_done_actions, "reference did not pick up the env var"
    from minigrid.envs.babyai.goto import GoToRedBallNoDists
    from minigrid.envs.babyai.open import OpenRedDoor

    import minigrid_tpu
    from minigrid_tpu.babyai import verifier as V
    from minigrid_tpu.core import constants as C
    from minigrid_tpu.utils.convert import from_reference
    from tests.test_babyai import nav_actions

    cases = [
        ("BabyAI-GoToRedBallNoDists-v0", GoToRedBallNoDists,
         V.single_clause(V.K_GOTO, V.desc(C.OBJECT_TO_IDX["ball"],
                                          C.COLOR_TO_IDX["red"])),
         C.OBJECT_TO_IDX["ball"]),
        ("BabyAI-OpenRedDoor-v0", OpenRedDoor,
         V.single_clause(V.K_OPEN, V.desc(C.OBJECT_TO_IDX["door"],
                                          C.COLOR_TO_IDX["red"])),
         C.OBJECT_TO_IDX["door"]),
    ]

    for eid, ref_cls, instr, target_type in cases:
        env = minigrid_tpu.make(eid)
        params = env.default_params.replace(babyai_done_actions=True)
        step = jax.jit(lambda s, a, e=env, p=params: e.step(s, a, p))

        def lower(ref):
            state = from_reference(ref)
            room_mask = env.room_rect_mask(
                params,
                jnp.asarray(ref.agent_pos[0] // (env.room_size - 1)),
                jnp.asarray(ref.agent_pos[1] // (env.room_size - 1)),
            )
            vs = V.init_verifier_state(state.grid, instr, state.agent_pos,
                                       state.agent_dir, room_mask)
            return state.replace(
                extra={"instr": instr, "vs": vs},
                max_steps=jnp.asarray(ref.max_steps, jnp.int32),
            )

        # ---- random actions incl. done: bitwise lockstep -------------------
        ended = 0
        for seed in range(4):
            ref = ref_cls()
            ref.reset(seed=seed)
            state = lower(ref)
            rng = np.random.default_rng(seed)
            for t in range(150):
                a = int(rng.integers(0, 7))  # includes done=6
                o_r, r_r, te_r, tr_r, _ = ref.step(a)
                o, state, r, te, tr, _ = step(state, jnp.int32(a))
                assert np.array_equal(o_r["image"], np.asarray(o["image"])), (
                    eid, seed, t, a)
                assert abs(r_r - float(r)) < 1e-6, (eid, seed, t, a, r_r,
                                                    float(r))
                assert te_r == bool(te) and tr_r == bool(tr), (eid, seed, t, a)
                if te_r or tr_r:
                    ended += 1
                    break
        assert ended >= 3, f"{eid}: done-mode episodes should end fast"

        # ---- scripted success: match the condition, then done --------------
        if target_type != C.OBJECT_TO_IDX["ball"]:
            continue  # scripted solve for the goto case only
        ref = ref_cls()
        ref.reset(seed=7)
        state = lower(ref)
        g = unpack_np(np.asarray(state.grid))
        tgt = np.argwhere((g[..., 0] == target_type)
                          & (g[..., 1] == C.COLOR_TO_IDX["red"]))[0]
        acts = nav_actions(g, np.asarray(state.agent_pos),
                           int(state.agent_dir), tgt)
        assert acts is not None
        for a in acts:
            o_r, r_r, te_r, tr_r, _ = ref.step(a)
            o, state, r, te, tr, _ = step(state, jnp.int32(a))
            # in done-mode, facing the target does NOT terminate
            assert not te_r and not bool(te)
        o_r, r_r, te_r, tr_r, _ = ref.step(6)  # done
        o, state, r, te, tr, _ = step(state, jnp.int32(6))
        assert te_r and bool(te), "done after match must succeed"
        assert r_r > 0 and abs(r_r - float(r)) < 1e-6, (r_r, float(r))

    # ---- And composition (verifier.py:552-566): a bad `done` fails only ----
    # when BOTH operands fail; a locked operand success blocks the failure.
    from minigrid.envs.babyai.core.verifier import (AndInstr, GoToInstr,
                                                    ObjDesc, OpenInstr)

    env = minigrid_tpu.make("BabyAI-OpenRedDoor-v0")
    params = env.default_params.replace(babyai_done_actions=True)
    step = jax.jit(lambda s, a: env.step(s, a, params))
    instr = V.and_instr(
        V.single_clause(V.K_GOTO, V.desc(C.OBJECT_TO_IDX["door"],
                                         C.COLOR_TO_IDX["red"])),
        V.single_clause(V.K_OPEN, V.desc(C.OBJECT_TO_IDX["door"],
                                         C.COLOR_TO_IDX["red"])),
    )

    def lower_and(ref):
        state = from_reference(ref)
        room_mask = env.room_rect_mask(
            params,
            jnp.asarray(ref.agent_pos[0] // (env.room_size - 1)),
            jnp.asarray(ref.agent_pos[1] // (env.room_size - 1)),
        )
        vs = V.init_verifier_state(state.grid, instr, state.agent_pos,
                                   state.agent_dir, room_mask)
        return state.replace(
            extra={"instr": instr, "vs": vs},
            max_steps=jnp.asarray(ref.max_steps, jnp.int32),
        )

    def ref_with_and(seed):
        ref = OpenRedDoor()
        ref.reset(seed=seed)
        ref.instrs = AndInstr(GoToInstr(ObjDesc("door", "red")),
                              OpenInstr(ObjDesc("door", "red")))
        ref.instrs.reset_verifier(ref)
        ref.mission = ref.instrs.surface(ref)
        return ref

    def lockstep(ref, state, a):
        # AndInstr's both-failed check compares `action IS actions.done`
        # (verifier.py:559): a plain int never matches, only the Actions
        # enum member does. Pass the enum so the documented semantics run.
        o_r, r_r, te_r, tr_r, _ = ref.step(ref.actions(a))
        o, state, r, te, tr, _ = step(state, jnp.int32(a))
        assert np.array_equal(o_r["image"], np.asarray(o["image"])), a
        assert abs(r_r - float(r)) < 1e-6, (a, r_r, float(r))
        assert te_r == bool(te) and tr_r == bool(tr), (a, te_r, bool(te))
        return state, r_r, te_r

    # 1. immediate bad done: both clauses fail -> And FAILURE, reward 0
    ref = ref_with_and(11)
    state = lower_and(ref)
    state, r_r, te_r = lockstep(ref, state, 6)
    assert te_r and r_r == 0, "bad done on And must fail the episode"

    # 2. staged solve: face door / done (GoTo locks, Open fails -> CONTINUE,
    #    not FAILURE) / toggle / done -> SUCCESS with shaped reward
    ref = ref_with_and(11)
    state = lower_and(ref)
    g = unpack_np(np.asarray(from_reference(ref).grid))
    door = np.argwhere((g[..., 0] == C.OBJECT_TO_IDX["door"])
                       & (g[..., 1] == C.COLOR_TO_IDX["red"]))[0]
    acts = nav_actions(g, ref.agent_pos, int(ref.agent_dir), door)
    assert acts is not None
    for a in acts:
        state, _, te_r = lockstep(ref, state, a)
        assert not te_r
    state, _, te_r = lockstep(ref, state, 6)  # done: goto locks, open fails
    assert not te_r, "one locked success must block the And failure"
    state, _, te_r = lockstep(ref, state, 5)  # toggle opens the door
    assert not te_r
    state, r_r, te_r = lockstep(ref, state, 6)  # done: both succeeded
    assert te_r and r_r > 0, "And must succeed after both clauses match"

    print("DONE-ACTIONS-OK", flush=True)


if __name__ == "__main__":
    main()
