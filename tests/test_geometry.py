"""Geometry parity tests: closed-form and round-trip checks.

The reference's semantics (src/geometry/projection.py) are validated here by
independent construction: project/unproject round trips, ray placement, fov of
known intrinsics, grid pixel centers.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from my_depthsplat_tpu.geometry import (
    get_fov,
    get_world_rays,
    intersect_rays,
    project,
    sample_image_grid,
    unproject,
)


def look_at_extrinsics(position, target, up=(0.0, -1.0, 0.0)):
    """Build an OpenCV-convention c2w matrix looking from position to target."""
    position = np.asarray(position, dtype=np.float32)
    target = np.asarray(target, dtype=np.float32)
    forward = target - position
    forward = forward / np.linalg.norm(forward)
    up = np.asarray(up, dtype=np.float32)
    right = np.cross(up, forward)
    right /= np.linalg.norm(right)
    down = np.cross(forward, right)
    m = np.eye(4, dtype=np.float32)
    m[:3, 0] = right
    m[:3, 1] = down
    m[:3, 2] = forward
    m[:3, 3] = position
    return m


@pytest.fixture
def camera():
    intrinsics = jnp.array(
        [[1.2, 0.0, 0.5], [0.0, 1.5, 0.5], [0.0, 0.0, 1.0]], dtype=jnp.float32
    )
    extrinsics = jnp.asarray(look_at_extrinsics([1.0, 2.0, -3.0], [0.0, 0.0, 1.0]))
    return extrinsics, intrinsics


def test_project_unproject_roundtrip(camera):
    extrinsics, intrinsics = camera
    rng = np.random.default_rng(0)
    xy = jnp.asarray(rng.uniform(0.1, 0.9, size=(64, 2)).astype(np.float32))
    z = jnp.asarray(rng.uniform(1.0, 10.0, size=(64,)).astype(np.float32))

    cam_points = unproject(xy, z, intrinsics)
    assert np.allclose(np.asarray(cam_points[..., 2]), np.asarray(z), atol=1e-5)

    # To world and back through project.
    world = jnp.einsum(
        "ij,nj->ni",
        extrinsics,
        jnp.concatenate([cam_points, jnp.ones_like(z[:, None])], axis=-1),
    )[..., :3]
    xy_back, in_front = project(world, extrinsics, intrinsics)
    assert bool(jnp.all(in_front))
    assert np.allclose(np.asarray(xy_back), np.asarray(xy), atol=1e-4)


def test_world_rays_place_points_at_depth(camera):
    extrinsics, intrinsics = camera
    xy = jnp.array([[0.5, 0.5], [0.25, 0.75]], dtype=jnp.float32)
    origins, directions = get_world_rays(xy, extrinsics, intrinsics)
    # origins are the camera center
    assert np.allclose(np.asarray(origins), np.asarray(extrinsics[:3, 3]), atol=1e-6)
    # point at depth d projects back to xy and has camera-space z == d
    depth = 4.2
    pts = origins + directions * depth
    xy_back, _ = project(pts, extrinsics, intrinsics)
    assert np.allclose(np.asarray(xy_back), np.asarray(xy), atol=1e-4)
    w2c = jnp.linalg.inv(extrinsics)
    cam = jnp.einsum(
        "ij,nj->ni", w2c, jnp.concatenate([pts, jnp.ones((2, 1))], axis=-1)
    )
    assert np.allclose(np.asarray(cam[:, 2]), depth, atol=1e-4)


def test_sample_image_grid_pixel_centers():
    coords, indices = sample_image_grid((4, 8))
    assert coords.shape == (4, 8, 2)
    assert indices.shape == (4, 8, 2)
    # coords are xy: coords[i, j] = ((j + .5)/w, (i + .5)/h)
    assert np.allclose(np.asarray(coords[0, 0]), [0.5 / 8, 0.5 / 4])
    assert np.allclose(np.asarray(coords[3, 7]), [7.5 / 8, 3.5 / 4])
    assert np.array_equal(np.asarray(indices[2, 5]), [2, 5])


def test_get_fov_symmetric_pinhole():
    # fx normalized: fx = 0.5 / tan(fov_x / 2) for centered principal point.
    fov_x_true, fov_y_true = 0.9, 0.6
    fx = 0.5 / np.tan(fov_x_true / 2)
    fy = 0.5 / np.tan(fov_y_true / 2)
    k = jnp.array(
        [[fx, 0, 0.5], [0, fy, 0.5], [0, 0, 1]], dtype=jnp.float32
    )[None]
    fov = get_fov(k)[0]
    assert np.allclose(np.asarray(fov), [fov_x_true, fov_y_true], atol=1e-5)


def test_intersect_rays_crossing():
    o1 = jnp.array([[-1.0, 0.0, 0.0]])
    d1 = jnp.array([[1.0, 0.0, 0.0]])
    o2 = jnp.array([[0.0, -1.0, 1.0]])
    d2 = jnp.array([[0.0, 1.0, 0.0]])
    p = intersect_rays(o1, d1, o2, d2)
    # closest point between lines x-axis and the line x=0,z=1 => (0, 0, 0.5)
    assert np.allclose(np.asarray(p[0]), [0.0, 0.0, 0.5], atol=1e-5)

    # parallel rays -> inf
    p2 = intersect_rays(o1, d1, o2, d1)
    assert np.all(np.asarray(p2) > 1e9)
