from .camera_path import (
    generate_wobble,
    generate_wobble_transformation,
    interpolate_extrinsics,
    interpolate_intrinsics,
    render_stabilization_path,
)
from .image_io import prep_image, save_image, save_video
from .layout import add_border, hcat, vcat
from .ply_export import export_ply
from .step_tracker import StepTracker
from .vis_depth import viz_depth

__all__ = [
    "StepTracker",
    "add_border",
    "export_ply",
    "generate_wobble",
    "generate_wobble_transformation",
    "hcat",
    "interpolate_extrinsics",
    "interpolate_intrinsics",
    "prep_image",
    "render_stabilization_path",
    "save_image",
    "save_video",
    "vcat",
    "viz_depth",
]
