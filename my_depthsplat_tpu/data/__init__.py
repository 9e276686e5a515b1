from .loader import DataLoaderCfg, batch_examples, data_loader
from .shims import (
    apply_augmentation_shim,
    apply_bounds_shim,
    apply_crop_shim,
    apply_patch_shim,
)
from .view_samplers import (
    ViewSamplerAll,
    ViewSamplerArbitrary,
    ViewSamplerBounded,
    ViewSamplerBoundedV2,
    ViewSamplerEvaluation,
    get_view_sampler,
)

__all__ = [
    "DataLoaderCfg",
    "ViewSamplerAll",
    "ViewSamplerArbitrary",
    "ViewSamplerBounded",
    "ViewSamplerBoundedV2",
    "ViewSamplerEvaluation",
    "apply_augmentation_shim",
    "apply_bounds_shim",
    "apply_crop_shim",
    "apply_patch_shim",
    "batch_examples",
    "data_loader",
    "get_view_sampler",
]
