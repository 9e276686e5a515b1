"""Public rendering API.

Mirrors the capability surface of the reference's cuda_splatting.py
(render_cuda :46-126, render_cuda_orthographic :129-219, render_depth_cuda
:225-264) with a backend switch: the XLA oracle (exact, any platform) or the
Pallas tile rasterizer (fast path on TPU).
"""

from __future__ import annotations

from typing import Literal

import jax.numpy as jnp
from jax import Array

from ..geometry import homogenize_points
from .oracle import render_oracle

DepthRenderingMode = Literal["depth", "disparity", "relative_disparity", "log"]
Backend = Literal["auto", "oracle", "pallas"]


def _resolve_backend(backend: Backend):
    if backend == "pallas" or backend == "auto":
        try:
            from .pallas_raster import render_pallas  # lazy; TPU-only fast path
            import jax

            on_tpu = jax.default_backend() == "tpu"
            # Inside jax.sharding.set_mesh(...) the computation runs on the
            # mesh's devices, which may differ from the default backend
            # (e.g. a virtual CPU mesh in a TPU-attached process). The
            # abstract mesh is queryable both inside and outside jit.
            mesh = jax.sharding.get_abstract_mesh()
            kind = getattr(getattr(mesh, "abstract_device", None), "device_kind", None)
            if not mesh.empty and kind is not None:
                on_tpu = "tpu" in str(kind).lower()
            if backend == "pallas" or on_tpu:
                return render_pallas
        except ImportError:
            if backend == "pallas":
                raise
    return render_oracle


def render(
    extrinsics: Array,  # (B, 4, 4) c2w
    intrinsics: Array,  # (B, 3, 3) normalized
    near: Array,  # (B,)
    far: Array,  # (B,)
    image_shape: tuple[int, int],
    background_color: Array,  # (B, 3)
    gaussian_means: Array,  # (B, G, 3)
    gaussian_covariances: Array,  # (B, G, 3, 3)
    gaussian_sh_coefficients: Array,  # (B, G, 3, d_sh)
    gaussian_opacities: Array,  # (B, G)
    scale_invariant: bool = True,
    use_sh: bool = True,
    backend: Backend = "auto",
    instance_budget: int | None = None,
    big_tile_cap: int | None = None,
    return_aux: bool = False,
) -> Array:
    """Differentiable 3DGS render -> (B, h, w, 3) images (channels-last).

    instance_budget caps the Pallas backend's tile-instance layout per batch
    element (overflow is counted and dropped); None keeps the exact
    G*max_tiles_per_gaussian bound, whose gather/scatter cost is usually
    5-10x the live instance count. big_tile_cap raises the tier-2 expansion
    cap for large-splat regimes. Both ignored by the oracle (which never
    drops). return_aux=True returns (image, {"num_dropped": int32})."""
    assert use_sh or gaussian_sh_coefficients.shape[-1] == 1
    impl = _resolve_backend(backend)
    kwargs = {"return_aux": return_aux} if return_aux else {}
    if impl is not render_oracle and instance_budget is not None:
        kwargs["instance_budget"] = instance_budget
    if impl is not render_oracle and big_tile_cap is not None:
        kwargs["big_tile_cap"] = big_tile_cap
    return impl(
        extrinsics,
        intrinsics,
        near,
        far,
        image_shape,
        background_color,
        gaussian_means,
        gaussian_covariances,
        gaussian_sh_coefficients,
        gaussian_opacities,
        scale_invariant=scale_invariant,
        use_sh=use_sh,
        **kwargs,
    )


def render_depth(
    extrinsics: Array,
    intrinsics: Array,
    near: Array,
    far: Array,
    image_shape: tuple[int, int],
    gaussian_means: Array,
    gaussian_covariances: Array,
    gaussian_opacities: Array,
    scale_invariant: bool = True,
    mode: DepthRenderingMode = "depth",
    backend: Backend = "auto",
) -> Array:
    """Render camera-space depth as color (cuda_splatting.py:225-264)."""
    w2c = jnp.linalg.inv(extrinsics)
    cam = jnp.einsum("bij,bgj->bgi", w2c, homogenize_points(gaussian_means))
    fake_color = cam[..., 2]
    if mode == "disparity":
        fake_color = 1.0 / fake_color
    elif mode == "log":
        fake_color = jnp.log(
            jnp.maximum(jnp.minimum(fake_color, near[:, None]), far[:, None])
        )

    b, g = fake_color.shape
    result = render(
        extrinsics,
        intrinsics,
        near,
        far,
        image_shape,
        jnp.zeros((b, 3), fake_color.dtype),
        gaussian_means,
        gaussian_covariances,
        jnp.broadcast_to(fake_color[..., None, None], (b, g, 3, 1)),
        gaussian_opacities,
        scale_invariant=scale_invariant,
        use_sh=False,
        backend=backend,
    )
    return result.mean(axis=-1)  # (B, h, w)


def render_orthographic(
    extrinsics: Array,
    width: Array,  # (B,) world-space extent
    height: Array,  # (B,)
    near: Array,
    far: Array,
    image_shape: tuple[int, int],
    background_color: Array,
    gaussian_means: Array,
    gaussian_covariances: Array,
    gaussian_sh_coefficients: Array,
    gaussian_opacities: Array,
    fov_degrees: float = 0.1,
    use_sh: bool = True,
    backend: Backend = "auto",
) -> Array:
    """Fake-orthographic render: push the camera far back with a tiny fov
    (cuda_splatting.py:129-219). Used for 3-axis gaussian visualizations."""
    b = extrinsics.shape[0]
    fov_x = jnp.deg2rad(jnp.asarray(fov_degrees, extrinsics.dtype))
    tan_fov_x = jnp.tan(0.5 * fov_x)
    distance_to_near = (0.5 * width) / tan_fov_x
    tan_fov_y = 0.5 * height / distance_to_near
    fov_y = 2.0 * jnp.arctan(tan_fov_y)
    near = near + distance_to_near
    far = far + distance_to_near
    move_back = jnp.eye(4, dtype=extrinsics.dtype).at[2, 3].set(1.0)
    move_back = (
        jnp.broadcast_to(move_back, (b, 4, 4))
        .at[:, 2, 3]
        .multiply(-distance_to_near)
    )
    extrinsics = extrinsics @ move_back

    # Build synthetic intrinsics with the chosen fovs so the shared pinhole
    # path reproduces the reference's projection-matrix construction.
    fx = 0.5 / tan_fov_x
    fy = 0.5 / tan_fov_y
    intr = jnp.zeros((b, 3, 3), extrinsics.dtype)
    intr = intr.at[:, 0, 0].set(fx)
    intr = intr.at[:, 1, 1].set(fy)
    intr = intr.at[:, 0, 2].set(0.5)
    intr = intr.at[:, 1, 2].set(0.5)
    intr = intr.at[:, 2, 2].set(1.0)

    return render(
        extrinsics,
        intr,
        near,
        far,
        image_shape,
        background_color,
        gaussian_means,
        gaussian_covariances,
        gaussian_sh_coefficients,
        gaussian_opacities,
        scale_invariant=False,
        use_sh=use_sh,
        backend=backend,
    )
