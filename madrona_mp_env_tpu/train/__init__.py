from .distributions import (
    ActorDistributions,
    DiscreteActionDistributions,
    DISCRETE_BUCKETS,
    AIM_BUCKETS,
)
from .normalizer import (
    EMANormalizerState,
    init_normalizer,
    normalize_obs,
    update_normalizer,
)
from .policy import ActorCriticNet, get_episode_scores, init_rnn_states
from .ppo import PPOConfig, compute_gae, ppo_loss
from .trainer import TrainConfig, TrainState, TrainingManager

__all__ = [
    "ActorDistributions",
    "DiscreteActionDistributions",
    "DISCRETE_BUCKETS",
    "AIM_BUCKETS",
    "EMANormalizerState",
    "init_normalizer",
    "normalize_obs",
    "update_normalizer",
    "ActorCriticNet",
    "get_episode_scores",
    "init_rnn_states",
    "PPOConfig",
    "compute_gae",
    "ppo_loss",
    "TrainConfig",
    "TrainState",
    "TrainingManager",
]
