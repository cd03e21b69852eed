from tpu3dssf.kernels.window_attention import (
    window_attention,
    window_attention_reference,
)
from tpu3dssf.kernels.flash_attention import (
    flash_attention,
    mha_reference,
)

__all__ = [
    "window_attention",
    "window_attention_reference",
    "flash_attention",
    "mha_reference",
]
