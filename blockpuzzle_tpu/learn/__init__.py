"""On-device learners: PPO and DQN (layer T6)."""

from blockpuzzle_tpu.learn.dqn import DQN, DQNConfig, DQNState
from blockpuzzle_tpu.learn.networks import ActorCritic, QNetwork, Torso
from blockpuzzle_tpu.learn.ppo import PPO, PPOConfig, TrainState, default_hypers

__all__ = [
    "PPO",
    "PPOConfig",
    "TrainState",
    "default_hypers",
    "DQN",
    "DQNConfig",
    "DQNState",
    "ActorCritic",
    "QNetwork",
    "Torso",
]
