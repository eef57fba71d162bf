"""Auto-tune the vectorized execution config for one env family.

The right reset strategy and pool parameters depend on measured platform
economics (see PERF.md): per-fusion launch cost makes the *number* of
kernels in the hot loop the figure of merit, so which of
fused / conditional / pooled wins — and at what refill window and bulk
period — is an empirical question per family and batch size.  The
reference has no analogue (it steps one Python object; its benchmark is
minigrid/benchmark.py:12-48); this tool sweeps the knobs this framework
actually exposes and reports the fastest configuration:

    python -m minigrid_tpu.tools.autotune BabyAI-GoToRedBall-v0 \
        --num-envs 4096 --num-steps 1024

Timing protocol (PERF.md): whole rollout under one jitted ``lax.scan``
(amortizes the ~40 ms tunnel dispatch), synced by host fetch
(``block_until_ready`` returns early on the tunneled axon backend), first
call discarded as compile.
"""

from __future__ import annotations

import argparse
from dataclasses import dataclass

from minigrid_tpu.tools.benchmark import timed_rollout


@dataclass(frozen=True)
class Candidate:
    reset_strategy: str
    pool_refill: int | None = None
    refill_period: int = 1
    strict_refill: bool = False
    unroll: int = 1

    def label(self) -> str:
        s = self.reset_strategy
        if self.reset_strategy == "pooled":
            s += f"(C={self.pool_refill or 'auto'},K={self.refill_period}"
            s += ",strict)" if self.strict_refill else ")"
        if self.unroll > 1:
            s += f" U={self.unroll}"
        return s


def candidates(num_envs: int, expensive: bool) -> list[Candidate]:
    """Sweep grid: strategies the family could plausibly want.  An
    expensive generator skips 'fused' (it would regenerate B-wide every
    step — the exact degenerate case the other strategies exist for).
    Scan-unroll variants are included because the step program is
    launch-bound (PERF.md): fusing across unrolled steps cuts launches."""
    out = [] if expensive else [Candidate("fused"), Candidate("fused", unroll=4)]
    out.append(Candidate("conditional"))
    seen = set()
    # Round 4: since the Pallas obs kernel, pooled + bulk refill wins even
    # for cheap generators, and generation-dominated families (BossLevel)
    # keep gaining through period 16 (1.2M -> 8.3M, PERF.md) — sweep
    # smaller windows and longer periods than the r3 grid did.
    for frac in (8, 16, 32, 64, 256):
        c = max(1, num_envs // frac)
        while (2 * num_envs) % c:
            c -= 1
        for period in (1, 8, 16):
            if ((2 * num_envs) % min(period * c, 2 * num_envs) == 0
                    and (c, period) not in seen):
                seen.add((c, period))
                out.append(Candidate("pooled", c, period))
                if period == 8:
                    out.append(Candidate("pooled", c, period, unroll=4))
    return out


def measure(env_id: str, cand: Candidate, num_envs: int, num_steps: int,
            seed: int = 0) -> tuple[float, float]:
    """(env-steps/s, compile+first-call seconds) for one candidate."""
    import minigrid_tpu
    from minigrid_tpu.parallel.vector import VectorEnv

    env = minigrid_tpu.make(env_id)
    venv = VectorEnv(
        env, num_envs, env.default_params,
        reset_strategy=cand.reset_strategy,
        pool_refill=cand.pool_refill,
        strict_refill=cand.strict_refill,
    )
    return timed_rollout(venv, num_steps, cand.refill_period, seed=seed,
                         unroll=cand.unroll, with_stats=True)


def autotune(env_id: str, num_envs: int = 4096, num_steps: int = 1024,
             verbose: bool = True, min_fresh: float = 0.9) -> dict:
    """Sweep all candidates; return the best config as a dict of
    VectorEnv/rollout kwargs plus the measured table."""
    import minigrid_tpu

    env = minigrid_tpu.make(env_id)
    expensive = getattr(env, "expensive_generation", False)
    rows = []
    for cand in candidates(num_envs, expensive):
        try:
            sps, compile_s, stats = measure(env_id, cand, num_envs, num_steps)
        except Exception as e:  # noqa: BLE001 — report and keep sweeping
            if verbose:
                print(f"  {cand.label():28s} failed: {type(e).__name__}: {e}",
                      flush=True)
            continue
        fresh = stats["fresh_frac"]
        rows.append((cand, sps, compile_s, fresh))
        if verbose:
            fs = "  n/a " if fresh is None else f"{fresh:6.1%}"
            print(f"  {cand.label():28s} {sps / 1e6:9.2f}M steps/s"
                  f"  fresh {fs}  (compile {compile_s:5.1f}s)", flush=True)
    if not rows:
        raise RuntimeError(f"no candidate succeeded for {env_id}")
    # Headline selection honors the freshness floor (PERF.md round-5
    # policy): a pooled config that mostly replays stale levels is a
    # different metric, not a faster one.  Fall back to the raw max only
    # when no candidate clears the floor (and say so via best_fresh_frac).
    honest = [r for r in rows if r[3] is None or r[3] >= min_fresh]
    best, sps, _, best_fresh = max(honest or rows, key=lambda r: r[1])
    result = {
        "env_id": env_id,
        "num_envs": num_envs,
        "steps_per_sec": sps,
        "fresh_frac": best_fresh,
        "min_fresh": min_fresh,
        "reset_strategy": best.reset_strategy,
        "pool_refill": best.pool_refill,
        "refill_period": best.refill_period,
        "strict_refill": best.strict_refill,
        "unroll": best.unroll,
        "table": [(c.label(), s, f) for c, s, _, f in rows],
    }
    if verbose:
        print(f"best: {best.label()} at {sps / 1e6:.2f}M steps/s")
    return result


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("env_id")
    p.add_argument("--num-envs", type=int, default=4096)
    p.add_argument("--num-steps", type=int, default=1024)
    args = p.parse_args(argv)
    autotune(args.env_id, args.num_envs, args.num_steps)


if __name__ == "__main__":
    main()
