"""RL learner layer — the component the reference leaves to external code.

PPO with GAE over the vectorized env, one jitted program per update, mesh
sharding for scale-out (SURVEY.md §2.6, §7 step 9).
"""

from minigrid_tpu.rl.bc import BCConfig, bc_train, evaluate_policy, pack_bc_dataset
from minigrid_tpu.rl.networks import ActorCritic, ObsEncoder
from minigrid_tpu.rl.rnn import RecurrentActorCritic, RecurrentPPO
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
    "BCConfig",
    "bc_train",
    "evaluate_policy",
    "pack_bc_dataset",
    "ObsEncoder",
    "PPO",
    "PPOConfig",
    "EpisodeStats",
    "compute_gae",
    "ppo_loss",
    "tp_param_sharding",
    "train_step_fn",
    "RecurrentActorCritic",
    "RecurrentPPO",
]
