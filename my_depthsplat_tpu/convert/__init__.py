from .torch_weights import (
    convert_conv,
    convert_dino_vit,
    convert_linear,
    convert_lpips,
)

__all__ = [
    "convert_conv",
    "convert_dino_vit",
    "convert_linear",
    "convert_lpips",
]
