"""On-device learners: PPO and DQN (layer T6)."""

from blockpuzzle_tpu.learn.dqn import DQN, DQNConfig, DQNState, default_dqn_hypers
from blockpuzzle_tpu.learn.networks import ActorCritic, QNetwork, Torso
from blockpuzzle_tpu.learn.ppo import PPO, PPOConfig, TrainState, default_hypers

__all__ = [
    "PPO",
    "PPOConfig",
    "TrainState",
    "default_hypers",
    "DQN",
    "DQNConfig",
    "default_dqn_hypers",
    "DQNState",
    "ActorCritic",
    "QNetwork",
    "Torso",
]
