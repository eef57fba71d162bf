"""Train PPO on a MiniGrid env — runnable end-to-end example.

Measured on one TPU v5e chip (2026-08-16):
  * MiniGrid-Empty-8x8-v0   — 100% success, return 0.961, ep-len 11, by
    update 15 (1024 envs x 128 steps per update).
  * MiniGrid-DoorKey-5x5-v0 — 100% success, return 0.965, ep-len 10, by
    update 20.

Usage:
    python examples/train_ppo.py --env MiniGrid-DoorKey-5x5-v0 \
        --num-envs 1024 --num-updates 40 [--checkpoint /tmp/ppo.msgpack]
"""

from __future__ import annotations

import argparse
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="MiniGrid-Empty-8x8-v0")
    p.add_argument("--num-envs", type=int, default=1024)
    p.add_argument("--num-steps", type=int, default=128)
    p.add_argument("--num-updates", type=int, default=30)
    p.add_argument("--lr", type=float, default=2.5e-4)
    p.add_argument("--ent-coef", type=float, default=0.01)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--checkpoint", default=None,
                   help="save the runner pytree here after training")
    p.add_argument("--resume", default=None,
                   help="restore a runner checkpoint before training")
    args = p.parse_args()

    import jax

    import minigrid_tpu
    from minigrid_tpu.rl import PPO, PPOConfig

    env = minigrid_tpu.make(args.env)
    cfg = PPOConfig(num_envs=args.num_envs, num_steps=args.num_steps,
                    num_updates=args.num_updates, lr=args.lr,
                    ent_coef=args.ent_coef)
    trainer = PPO(env, env.default_params, cfg)
    runner = trainer.init(jax.random.PRNGKey(args.seed))
    if args.resume:
        from minigrid_tpu.utils.checkpoint import load

        runner = load(args.resume, runner)

    t0 = time.perf_counter()
    for u in range(args.num_updates):
        runner, m = trainer.update(runner)
        print(f"update {u + 1:4d}  return={float(m['mean_return']):7.3f}  "
              f"success={float(m['success_rate']):5.2f}  "
              f"len={float(m['mean_length']):6.1f}  "
              f"episodes={int(m['episodes']):6d}  "
              f"loss={float(m['loss']):8.4f}", flush=True)
    dt = time.perf_counter() - t0
    steps = args.num_updates * args.num_envs * args.num_steps
    print(f"\n{steps:,} env-steps in {dt:.0f}s "
          f"({steps / dt:,.0f} steps/s through the full PPO loop)")

    if args.checkpoint:
        from minigrid_tpu.utils.checkpoint import save

        save(args.checkpoint, runner)
        print(f"runner saved to {args.checkpoint}")


if __name__ == "__main__":
    main()
