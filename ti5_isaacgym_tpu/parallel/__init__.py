from .trainer import AXIS, ShardedRunner, carry_specs, distributed_init, make_mesh  # noqa: F401
