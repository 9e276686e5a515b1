from .interpolate import resize_bilinear, resize_nearest
from .grid_sample import (
    grid_sample_bilinear,
    plane_sweep_correlation,
    plane_sweep_correlation_window,
    take_rows,
    warp_with_pose_depth_candidates,
)

__all__ = [
    "grid_sample_bilinear",
    "plane_sweep_correlation",
    "plane_sweep_correlation_window",
    "resize_bilinear",
    "resize_nearest",
    "warp_with_pose_depth_candidates",
]
