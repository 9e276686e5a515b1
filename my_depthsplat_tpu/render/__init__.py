from .api import DepthRenderingMode, render, render_depth, render_orthographic
from .camera import get_projection_matrix
from .oracle import render_oracle

__all__ = [
    "DepthRenderingMode",
    "get_projection_matrix",
    "render",
    "render_depth",
    "render_orthographic",
    "render_oracle",
]
