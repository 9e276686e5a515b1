from .api import DepthRenderingMode, render, render_depth, render_orthographic
from .camera import get_projection_matrix
from .oracle import render_oracle


def render_pallas_depth_sharded(*args, **kwargs):
    """Lazy re-export (render/sharded.py pulls in the Pallas stack)."""
    from .sharded import render_pallas_depth_sharded as impl

    return impl(*args, **kwargs)


__all__ = [
    "DepthRenderingMode",
    "get_projection_matrix",
    "render",
    "render_depth",
    "render_orthographic",
    "render_oracle",
    "render_pallas_depth_sharded",
]
