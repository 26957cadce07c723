from .conv1d import fused_conv1d_prelu  # noqa: F401
