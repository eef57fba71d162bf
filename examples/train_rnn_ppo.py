"""Train recurrent PPO (LSTM) on a memory task — runnable example.

MemoryEnv (reference envs/memory.py) is unsolvable for a feed-forward
policy: the cue object is visible only near the start position and the
matching decision happens at the far end of the corridor.

Measured on one TPU v5e chip (2026-08-16), MiniGrid-MemoryS7-v0 with the
defaults below (512 envs x 256 steps/update): **100% success, episode
length 6-7 (near-optimal), by update ~125**.  The same budget with
PPO-default hyperparameters (gamma=0.99, ent_coef=0.02, T=128) plateaus at
the 50% chance level — the long horizon discount and extra exploration
entropy matter.

Usage:
    python examples/train_rnn_ppo.py --env MiniGrid-MemoryS7-v0
"""

from __future__ import annotations

import argparse


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="MiniGrid-MemoryS7-v0")
    p.add_argument("--num-envs", type=int, default=512)
    p.add_argument("--num-steps", type=int, default=256)
    p.add_argument("--num-updates", type=int, default=150)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--ent-coef", type=float, default=0.05)
    p.add_argument("--gamma", type=float, default=0.95)
    p.add_argument("--seed", type=int, default=1)
    args = p.parse_args()

    import jax

    import minigrid_tpu
    from minigrid_tpu.rl.ppo import PPOConfig
    from minigrid_tpu.rl.rnn import RecurrentPPO

    env = minigrid_tpu.make(args.env)
    cfg = PPOConfig(num_envs=args.num_envs, num_steps=args.num_steps,
                    num_updates=args.num_updates, num_minibatches=4,
                    update_epochs=4, lr=args.lr, ent_coef=args.ent_coef,
                    gamma=args.gamma)
    trainer = RecurrentPPO(env, env.default_params, cfg)
    runner = trainer.init(jax.random.PRNGKey(args.seed))
    for u in range(args.num_updates):
        runner, m = trainer.update(runner)
        print(f"update {u + 1:4d}  success={float(m['success_rate']):5.2f}  "
              f"return={float(m['mean_return']):6.3f}  "
              f"len={float(m['mean_length']):6.1f}  "
              f"episodes={int(m['episodes']):6d}", flush=True)


if __name__ == "__main__":
    main()
