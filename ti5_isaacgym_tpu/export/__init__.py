from . import mjcf, onnx, policy  # noqa: F401
