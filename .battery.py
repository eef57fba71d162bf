"""TPU bench battery: re-measure the PERF.md table after round-3 changes.

Usage: python /tmp/battery.py SPEC [SPEC...]
SPEC = env_id[:key=val,...]  with keys num_envs,steps,strategy,refill,period,unroll
Prints one JSON line per spec.
"""
import json
import sys

import minigrid_tpu
from minigrid_tpu.parallel.vector import VectorEnv
from minigrid_tpu.tools.benchmark import timed_rollout


def run(spec: str):
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
    env = minigrid_tpu.make(env_id)
    venv = VectorEnv(env, num_envs, reset_strategy=strategy,
                     pool_refill=refill, strict_refill=strict)
    sps, compile_s = timed_rollout(venv, steps, refill_period=period,
                                   unroll=unroll)
    print(json.dumps({
        "env": env_id, "num_envs": num_envs, "steps": steps,
        "strategy": venv.reset_strategy, "refill_period": period,
        "unroll": unroll, "pool_refill": venv.pool_refill
        if venv.reset_strategy == "pooled" else None, "strict": strict,
        "steps_per_sec": round(sps), "compile_s": round(compile_s, 1),
    }), flush=True)


if __name__ == "__main__":
    for spec in sys.argv[1:]:
        run(spec)
