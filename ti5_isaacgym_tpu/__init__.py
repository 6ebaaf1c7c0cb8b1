"""ti5_isaacgym_tpu — TPU-native humanoid RL training framework.

A ground-up JAX/XLA re-design of the capabilities of
``Robotics-Engineer-khy/ti5_isaacgym`` (legged-gym-style PPO training for the
TI5 T1 humanoid): pure-JAX articulated physics, procedural terrain,
vectorized task environments, DH-PPO learner, and multi-chip data-parallel
scaling over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"
