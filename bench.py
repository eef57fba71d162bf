"""Headline benchmark: aggregate env-steps/s, vectorized DoorKey-8x8.

The BASELINE.json metric: 4096 lockstep envs with auto-reset, symbolic
partial obs generated every step, random actions, whole rollout under one
jitted lax.scan on device.  Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp

import minigrid_tpu
from minigrid_tpu.parallel.vector import VectorEnv


def correctness_gate() -> None:
    """Refuse to record a number for a wrong program.

    Runs the fast parity smoke (minigrid_tpu/tools/smoke.py: obs-impl
    agreement incl. the dir==3 case + Empty/DoorKey reference lockstep) in a
    CPU subprocess; any failure aborts the bench before a JSON line is
    printed, so a broken kernel can never produce a recorded benchmark."""
    proc = subprocess.run(
        [sys.executable, "-m", "minigrid_tpu.tools.smoke"],
        cwd=os.path.dirname(os.path.abspath(__file__)),
        timeout=300,
    )
    if proc.returncode != 0:
        raise SystemExit(
            "bench.py: correctness smoke FAILED — no benchmark recorded"
        )

NUM_ENVS = 4096
# Long scan: the remote-TPU dispatch overhead (~40 ms/call through the axon
# tunnel) must be amortized to measure the device, not the tunnel.  At T=4096
# every env truncates several times, so the auto-reset lane is fully
# exercised in the measured region.
NUM_STEPS = 4096
# Execution config (autotuned, PERF.md round 4): pooled auto-reset serves
# pre-validated iid levels from the rotating double-buffer and amortizes
# the refill over REFILL_PERIOD-step windows — measured 103.5M vs 75.7M
# steps/s for per-step fused regeneration on this chip.  The refill window
# (64/step, full pool rotation every 128 steps) turns over far faster than
# the ~640-step DoorKey episodes, so every served level is fresh.
POOL_REFILL = 64
REFILL_PERIOD = 8
BASELINE_TARGET = 10_000_000.0  # env-steps/s north star (BASELINE.md)


def main() -> None:
    correctness_gate()
    # On-device compiled-kernel gate: the CPU smoke validates the kernel
    # PROGRAM via the interpreter; this validates its Mosaic LOWERING by
    # running one batch through both obs paths compiled on the chip that is
    # about to be timed (a lowering bug would otherwise bench wrong obs
    # with every CPU gate green).
    from minigrid_tpu.tools.smoke import device_kernel_gate

    if device_kernel_gate(num_envs=NUM_ENVS):
        print("DEVICE KERNEL GATE OK", file=sys.stderr)
    else:
        print("device kernel gate skipped (fused path n/a on this backend)",
              file=sys.stderr)
    env = minigrid_tpu.make("MiniGrid-DoorKey-8x8-v0")
    params = env.default_params
    venv = VectorEnv(env, NUM_ENVS, params, reset_strategy="pooled",
                     pool_refill=POOL_REFILL)

    @jax.jit
    def run(key):
        key, k_reset = jax.random.split(key)
        obs, state = venv._reset(k_reset)

        def body(carry, k):
            state, acc = carry
            action = jax.random.randint(
                k, (NUM_ENVS,), 0, env.num_actions, dtype=jnp.int32
            )
            new_obs, new_state, reward, term, trunc, _ = venv._step_nofill(
                state, action)
            # Fold an obs checksum into the running sum: the metric is "obs
            # generated every step", and a merely-carried obs is dead to
            # XLA's while-loop simplifier, which then deletes the whole
            # per-step observation program (measured 89M vs the honest 38M
            # on this chip).  One running scalar in the carry (reward sum +
            # obs checksum + episode-end count — term/trunc stay live):
            # stacking [T, B] traces would add 2*T*B*4 bytes of HBM writes
            # and measure the trace buffer, not the engine.
            chk = jax.tree_util.tree_reduce(
                lambda a, leaf: a + leaf.astype(jnp.float32).sum(),
                new_obs, jnp.float32(0)
            )
            acc = acc + reward.sum() + chk + (
                (term | trunc).sum().astype(jnp.float32))
            return (new_state, acc), None

        def outer(carry, ks):
            state, acc = jax.lax.scan(body, carry, ks)[0]
            return (venv._refill(state, REFILL_PERIOD), acc), None

        keys = jax.random.split(key, NUM_STEPS).reshape(
            NUM_STEPS // REFILL_PERIOD, REFILL_PERIOD, -1
        )
        (state, acc), _ = jax.lax.scan(
            outer, (state, jnp.float32(0)), keys
        )
        # Only one scalar crosses to the host.
        return acc

    def sync(val) -> float:
        # HARD sync via host fetch: on the tunneled axon backend
        # jax.block_until_ready returns before queued work completes, which
        # silently times nothing (measured "58 billion steps/s").
        return float(val)

    # Compile + first run (excluded from timing).
    sync(run(jax.random.PRNGKey(0)))

    times = []
    for i in range(2):
        t0 = time.perf_counter()
        sync(run(jax.random.PRNGKey(i + 1)))
        times.append(time.perf_counter() - t0)

    best = min(times)
    steps_per_sec = NUM_ENVS * NUM_STEPS / best
    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec (4096 envs, DoorKey-8x8, auto-reset)",
                "value": round(steps_per_sec),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / BASELINE_TARGET, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
