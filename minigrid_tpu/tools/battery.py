"""TPU bench battery: measure a list of env/vector configurations on the
current backend and print one JSON line per configuration.

This is the harness behind PERF.md's table: every row there is produced by a
SPEC string so the measurement is reproducible from the command line.

Usage::

    python -m minigrid_tpu.tools.battery SPEC [SPEC ...]

    SPEC = env_id[:key=val,...]
    keys = num_envs, steps, strategy, refill, strict, period, unroll,
           obs (symbolic|rgb), tile (rgb tile size, default 8 — the
           reference RGBImgPartialObsWrapper default, wrappers.py:195)

Examples::

    python -m minigrid_tpu.tools.battery MiniGrid-DoorKey-8x8-v0
    python -m minigrid_tpu.tools.battery \
        "BabyAI-GoToRedBall-v0:strategy=pooled,refill=64,period=8,unroll=4"

The reference's own micro-bench (minigrid/benchmark.py:12-48) times one env
object; this battery times the vectorized auto-reset rollout, which is the
metric BASELINE.md targets.
"""

from __future__ import annotations

import json
import sys

import minigrid_tpu
from minigrid_tpu.parallel.vector import VectorEnv
from minigrid_tpu.tools.benchmark import timed_rollout


def run_spec(spec: str) -> dict:
    if ":" in spec:
        env_id, opts_s = spec.split(":", 1)
        opts = dict(kv.split("=") for kv in opts_s.split(","))
    else:
        env_id, opts = spec, {}
    num_envs = int(opts.get("num_envs", 4096))
    steps = int(opts.get("steps", 4096))
    period = int(opts.get("period", 1))
    unroll = int(opts.get("unroll", 1))
    strategy = opts.get("strategy")
    strict = bool(int(opts.get("strict", 0)))
    refill = int(opts["refill"]) if "refill" in opts else None
    obs_mode = opts.get("obs", "symbolic")
    env = minigrid_tpu.make(env_id)
    if obs_mode in ("rgb", "rgb_chw"):
        # the reference's headline metric is RGB partial-obs step FPS
        # (minigrid/benchmark.py:30-46); this row is its vectorized analogue.
        # 'rgb' serves the reference HWC layout (whose (H, 3) minor dims pad
        # ~42x on TPU tiles and bound the row); 'rgb_chw' serves [B, 3, H, W]
        from minigrid_tpu.wrappers import RGBImgPartialObsWrapper

        env = RGBImgPartialObsWrapper(env, tile_size=int(opts.get("tile", 8)),
                                      channels_first=obs_mode == "rgb_chw")
    venv = VectorEnv(env, num_envs, reset_strategy=strategy,
                     pool_refill=refill, strict_refill=strict)
    sps, compile_s, stats = timed_rollout(venv, steps, refill_period=period,
                                          unroll=unroll, with_stats=True)
    from minigrid_tpu.core.obs import GATHER_IMPL

    row = {
        "env": env_id, "num_envs": num_envs, "steps": steps,
        "obs": obs_mode, "gather_impl": GATHER_IMPL,
        "strategy": venv.reset_strategy, "refill_period": period,
        "unroll": unroll, "pool_refill": venv.pool_refill
        if venv.reset_strategy == "pooled" else None, "strict": strict,
        "steps_per_sec": round(sps), "compile_s": round(compile_s, 1),
        # served-distribution accounting (timed run): fraction of auto
        # resets served a FRESH level vs a best-effort stale replay
        "resets": stats["resets"],
        "fresh_frac": (round(stats["fresh_frac"], 4)
                       if stats["fresh_frac"] is not None else None),
    }
    print(json.dumps(row), flush=True)
    return row


def main(argv: list[str]) -> None:
    if not argv:
        print(__doc__, file=sys.stderr)
        raise SystemExit(2)
    # Refuse to record rows for a mis-lowered kernel: one batch through both
    # obs paths compiled on THIS backend (see smoke.device_kernel_gate).
    from minigrid_tpu.tools.smoke import device_kernel_gate

    if device_kernel_gate():
        print("device kernel gate ok", file=sys.stderr)
    for spec in argv:
        run_spec(spec)


if __name__ == "__main__":
    main(sys.argv[1:])
