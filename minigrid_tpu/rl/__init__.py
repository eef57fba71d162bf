"""RL learner layer — the component the reference leaves to external code.

PPO with GAE over the vectorized env, one jitted program per update, mesh
sharding for scale-out (SURVEY.md §2.6, §7 step 9).
"""

from minigrid_tpu.rl.networks import ActorCritic, ObsEncoder
from minigrid_tpu.rl.ppo import (
    PPO,
    EpisodeStats,
    PPOConfig,
    compute_gae,
    ppo_loss,
    tp_param_sharding,
    train_step_fn,
)

__all__ = [
    "ActorCritic",
    "ObsEncoder",
    "PPO",
    "PPOConfig",
    "EpisodeStats",
    "compute_gae",
    "ppo_loss",
    "tp_param_sharding",
    "train_step_fn",
]
