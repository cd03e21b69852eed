from tpu3dssf.kernels.window_attention import (
    window_attention,
    window_attention_reference,
)

__all__ = [
    "window_attention",
    "window_attention_reference",
]
