"""Op-level parity vs torch CPU: resize + grid_sample semantics."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from my_depthsplat_tpu.ops import (
    grid_sample_bilinear,
    resize_bilinear,
    resize_nearest,
    warp_with_pose_depth_candidates,
)


def _nchw(x_nhwc):
    return torch.from_numpy(np.moveaxis(np.asarray(x_nhwc), -1, 1).copy())


def _nhwc(t_nchw):
    return np.moveaxis(t_nchw.numpy(), 1, -1)


def test_resize_bilinear_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 7, 11, 3)).astype(np.float32)
    for size in [(14, 22), (28, 44), (3, 5), (7, 11), (13, 29)]:
        for ac in [True, False]:
            ours = np.asarray(resize_bilinear(jnp.asarray(x), size, align_corners=ac))
            theirs = _nhwc(
                F.interpolate(_nchw(x), size=size, mode="bilinear", align_corners=ac)
            )
            np.testing.assert_allclose(ours, theirs, atol=1e-5,
                                       err_msg=f"size={size} ac={ac}")


def test_resize_nearest_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 6, 10, 4)).astype(np.float32)
    for size in [(12, 20), (3, 5), (9, 15)]:
        ours = np.asarray(resize_nearest(jnp.asarray(x), size))
        theirs = _nhwc(F.interpolate(_nchw(x), size=size, mode="nearest"))
        np.testing.assert_allclose(ours, theirs, atol=0, err_msg=f"size={size}")


def test_grid_sample_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 9, 13, 5)).astype(np.float32)
    # grid includes out-of-bounds coords to exercise zeros padding
    grid = rng.uniform(-1.4, 1.4, size=(2, 6, 8, 2)).astype(np.float32)
    ours = np.asarray(grid_sample_bilinear(jnp.asarray(x), jnp.asarray(grid)))
    theirs = _nhwc(
        F.grid_sample(
            _nchw(x), torch.from_numpy(grid), mode="bilinear",
            padding_mode="zeros", align_corners=True,
        )
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_plane_sweep_warp_matches_torch_reference_semantics():
    """Full plane-sweep warp vs a torch spec built from grid_sample directly."""
    rng = np.random.default_rng(3)
    b, c, h, w, d = 2, 8, 6, 9, 4
    feat = rng.normal(size=(b, h, w, c)).astype(np.float32)
    intr = np.broadcast_to(
        np.array([[w * 0.9, 0, w / 2], [0, h * 0.9, h / 2], [0, 0, 1]], np.float32),
        (b, 3, 3),
    ).copy()
    pose = np.broadcast_to(np.eye(4, dtype=np.float32), (b, 4, 4)).copy()
    pose[:, :3, 3] = rng.normal(size=(b, 3)) * 0.05
    # small rotation
    th = 0.05
    rot = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]],
        np.float32,
    )
    pose[:, :3, :3] = rot
    depth = rng.uniform(1.0, 5.0, size=(b, d, h, w)).astype(np.float32)

    ours = np.asarray(
        warp_with_pose_depth_candidates(
            jnp.asarray(feat), jnp.asarray(intr), jnp.asarray(pose),
            jnp.asarray(depth),
        )
    )  # (B, D, H, W, C)

    # torch spec (independent implementation of matching.py:24-90 semantics)
    t_feat = _nchw(feat)
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    grid = np.stack([xs, ys, np.ones_like(xs)], 0).reshape(3, -1).astype(np.float32)
    pts = np.linalg.inv(intr) @ grid  # (b, 3, hw)
    pts = pose[:, :3, :3] @ pts
    pts = pts[:, :, None, :] * depth.reshape(b, 1, d, h * w)
    pts = pts + pose[:, :3, 3][:, :, None, None]
    pts = (intr @ pts.reshape(b, 3, -1)).reshape(b, 3, d, h * w)
    pix = pts[:, :2] / np.maximum(pts[:, 2:], 1e-3)
    gx = 2 * pix[:, 0] / (w - 1) - 1
    gy = 2 * pix[:, 1] / (h - 1) - 1
    t_grid = torch.from_numpy(
        np.stack([gx, gy], -1).reshape(b, d * h, w, 2).astype(np.float32)
    )
    theirs = F.grid_sample(
        t_feat, t_grid, mode="bilinear", padding_mode="zeros", align_corners=True
    ).view(b, c, d, h, w).numpy()
    theirs = np.moveaxis(theirs, 1, -1)  # (b, d, h, w, c)
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_grid_sample_gradients_match_dense_reference():
    """take_rows' custom VJP (u16 gather fwd, f32 scatter bwd) must produce
    the same gradients as a plain differentiable gather implementation."""
    import jax

    rng = np.random.default_rng(3)
    b, h, w, c = 2, 7, 9, 5
    feat = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    grid = jnp.asarray(rng.uniform(-1.2, 1.2, size=(b, 4, 6, 2)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(b, 4, 6, c)).astype(np.float32))

    def ref_sample(feature, g):
        bb, hh, ww, cc = feature.shape
        gx = (g[..., 0] + 1.0) * 0.5 * (ww - 1)
        gy = (g[..., 1] + 1.0) * 0.5 * (hh - 1)
        x0, y0 = jnp.floor(gx), jnp.floor(gy)
        x1, y1 = x0 + 1.0, y0 + 1.0
        wx1, wy1 = gx - x0, gy - y0
        wx0, wy0 = 1.0 - wx1, 1.0 - wy1
        flat = feature.reshape(bb, hh * ww, cc)

        def tap(xi, yi, wgt):
            inb = (xi >= 0) & (xi <= ww - 1) & (yi >= 0) & (yi <= hh - 1)
            xi_c = jnp.clip(xi, 0, ww - 1).astype(jnp.int32)
            yi_c = jnp.clip(yi, 0, hh - 1).astype(jnp.int32)
            idx = yi_c * ww + xi_c
            vals = jnp.take_along_axis(
                flat, idx.reshape(bb, -1, 1), axis=1
            ).reshape(idx.shape + (cc,))
            return vals * (wgt * inb)[..., None]

        return (
            tap(x0, y0, wx0 * wy0) + tap(x1, y0, wx1 * wy0)
            + tap(x0, y1, wx0 * wy1) + tap(x1, y1, wx1 * wy1)
        )

    def loss(f, g, sampler):
        return jnp.sum(sampler(f, g) * cot)

    gf, gg = jax.grad(lambda f, g: loss(f, g, grid_sample_bilinear), (0, 1))(feat, grid)
    rf, rg = jax.grad(lambda f, g: loss(f, g, ref_sample), (0, 1))(feat, grid)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(rf), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gg), np.asarray(rg), atol=1e-5)
    # forward exactness
    np.testing.assert_array_equal(
        np.asarray(grid_sample_bilinear(feat, grid)),
        np.asarray(ref_sample(feat, grid)),
    )


def test_plane_sweep_correlation_matches_warp_einsum():
    """The fused feature-major warp+dot equals the composition of
    warp_with_pose_depth_candidates and an einsum, values and gradients."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from my_depthsplat_tpu.ops import (
        plane_sweep_correlation,
        warp_with_pose_depth_candidates,
    )

    rng = np.random.default_rng(0)
    b, h, w, c, d = 2, 12, 20, 16, 5
    src = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    ref = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    intr = np.broadcast_to(
        np.array([[20.0, 0, 10.0], [0, 12.0, 6.0], [0, 0, 1]], np.float32),
        (b, 3, 3),
    )
    pose = np.broadcast_to(np.eye(4, dtype=np.float32), (b, 4, 4)).copy()
    pose[:, 0, 3] = 0.2
    pose[:, 1, 3] = -0.1
    depth = jnp.asarray(
        rng.uniform(0.8, 10.0, (b, d, h, w)).astype(np.float32)
    )
    intr, pose = jnp.asarray(intr), jnp.asarray(pose)

    def ref_fn(src, ref_):
        warped = warp_with_pose_depth_candidates(src, intr, pose, depth)
        return jnp.einsum("bhwc,bdhwc->bdhw", ref_, warped)

    def fused_fn(src, ref_):
        return plane_sweep_correlation(src, ref_, intr, pose, depth)

    want = ref_fn(src, ref)
    got = fused_fn(src, ref)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )

    g_want = jax.grad(lambda s, r: jnp.sum(jnp.sin(ref_fn(s, r))), (0, 1))(
        src, ref
    )
    g_got = jax.grad(lambda s, r: jnp.sum(jnp.sin(fused_fn(s, r))), (0, 1))(
        src, ref
    )
    for a, b_ in zip(g_got, g_want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-5, atol=5e-5
        )


def test_plane_sweep_correlation_bf16_close():
    """bf16 gather mode stays within ~1e-2 relative of the f32 sweep."""
    import jax.numpy as jnp
    import numpy as np

    from my_depthsplat_tpu.ops import plane_sweep_correlation

    rng = np.random.default_rng(3)
    b, h, w, c, d = 2, 10, 16, 32, 4
    src = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    ref = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    intr = jnp.asarray(
        np.broadcast_to(
            np.array([[16.0, 0, 8.0], [0, 10.0, 5.0], [0, 0, 1]], np.float32),
            (b, 3, 3),
        )
    )
    pose = np.broadcast_to(np.eye(4, dtype=np.float32), (b, 4, 4)).copy()
    pose[:, 0, 3] = 0.15
    depth = jnp.asarray(rng.uniform(0.8, 8.0, (b, d, h, w)).astype(np.float32))
    f32 = plane_sweep_correlation(src, ref, intr, jnp.asarray(pose), depth)
    b16 = plane_sweep_correlation(
        src, ref, intr, jnp.asarray(pose), depth, gather_dtype=jnp.bfloat16
    )
    scale = float(jnp.abs(f32).max())
    assert float(jnp.abs(b16 - f32).max()) / scale < 1e-2
