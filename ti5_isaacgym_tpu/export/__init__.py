from . import mjcf, policy  # noqa: F401
