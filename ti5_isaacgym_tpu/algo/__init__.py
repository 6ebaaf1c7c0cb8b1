from . import networks, ppo, rollout, runner  # noqa: F401
from .ppo import PPO, PPOConfig, TrainState, init_train_state  # noqa: F401
from .runner import DHOnPolicyRunner, OnPolicyRunner  # noqa: F401
