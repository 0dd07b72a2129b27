from .layers import layer_norm, rms_norm, linear, gelu_exact  # noqa: F401
from .attention import multihead_attention, xla_attention  # noqa: F401
