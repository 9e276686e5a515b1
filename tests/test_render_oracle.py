"""Oracle renderer tests: analytic single-gaussian checks, occlusion ordering,
termination semantics, and gradient health.

There is no CUDA rasterizer available on this host, so correctness is pinned by
closed-form expectations of the 3DGS compositing rules rather than by goldens.
"""

import jax
import jax.numpy as jnp
import numpy as np

from my_depthsplat_tpu.render import render, render_depth
from my_depthsplat_tpu.gaussians.sh import C0


def make_camera(b=1):
    extr = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, 4, 4))
    intr = jnp.broadcast_to(
        jnp.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]], jnp.float32),
        (b, 3, 3),
    )
    return extr, intr


def single_gaussian_scene(z=5.0, s=0.05, opacity=0.8, rgb_raw=0.7, g=1):
    means = jnp.array([[[0.0, 0.0, z]]] * 1, jnp.float32)
    cov = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32) * s**2, (1, 1, 3, 3))
    sh = jnp.full((1, 1, 3, 1), rgb_raw, jnp.float32)
    op = jnp.full((1, 1), opacity, jnp.float32)
    return means, cov, sh, op


def test_empty_scene_is_background():
    extr, intr = make_camera()
    means = jnp.zeros((1, 4, 3))
    # behind the camera -> culled
    means = means.at[..., 2].set(-3.0)
    cov = jnp.broadcast_to(jnp.eye(3) * 1e-4, (1, 4, 3, 3))
    sh = jnp.ones((1, 4, 3, 1))
    op = jnp.ones((1, 4))
    bg = jnp.array([[0.2, 0.4, 0.6]], jnp.float32)
    img = render(
        extr, intr, jnp.ones(1), jnp.full((1,), 100.0), (8, 8), bg,
        means, cov, sh, op, backend="oracle",
    )
    assert img.shape == (1, 8, 8, 3)
    np.testing.assert_allclose(
        np.asarray(img), np.broadcast_to([0.2, 0.4, 0.6], (1, 8, 8, 3)), atol=1e-6
    )


def test_single_gaussian_analytic_alpha():
    h = w = 32
    z, s, opacity, rgb_raw = 5.0, 0.05, 0.8, 0.7
    extr, intr = make_camera()
    means, cov, sh, op = single_gaussian_scene(z, s, opacity, rgb_raw)
    bg = jnp.zeros((1, 3), jnp.float32)
    img = np.asarray(
        render(
            extr, intr, jnp.ones(1), jnp.full((1,), 100.0), (h, w), bg,
            means, cov, sh, op, use_sh=True, backend="oracle",
        )
    )[0]

    # Analytic: focal(px) = w / (2 * tan(fov/2)), tan = 0.5/fx_norm = 0.5.
    focal = w / (2 * 0.5)
    center = (w - 1) / 2.0  # projected mean lands mid-image in pixel coords
    sigma2 = (focal * s / z) ** 2 + 0.3  # EWA variance + dilation
    color = C0 * rgb_raw + 0.5

    for px, py in [(15, 15), (15, 18), (20, 12), (8, 25)]:
        d2 = (px - center) ** 2 + (py - center) ** 2
        alpha = opacity * np.exp(-0.5 * d2 / sigma2)
        alpha = 0.0 if alpha < 1.0 / 255.0 else min(alpha, 0.99)
        expected = alpha * color
        np.testing.assert_allclose(
            img[py, px], [expected] * 3, atol=2e-5,
            err_msg=f"pixel {(px, py)}",
        )


def test_two_gaussians_depth_order_and_occlusion():
    h = w = 16
    extr, intr = make_camera()
    # Near-opaque front gaussian at z=2 (red-ish), back at z=10 (green-ish).
    means = jnp.array([[[0, 0, 10.0], [0, 0, 2.0]]], jnp.float32)  # back first!
    cov = jnp.broadcast_to(jnp.eye(3) * 0.2**2, (1, 2, 3, 3)).astype(jnp.float32)
    def raw(v):
        return (v - 0.5) / C0

    sh = jnp.zeros((1, 2, 3, 1), jnp.float32)
    sh = sh.at[0, 0, :, 0].set(jnp.array([raw(0.0), raw(0.9), raw(0.0)]))  # back: green
    sh = sh.at[0, 1, :, 0].set(jnp.array([raw(0.99), raw(0.0), raw(0.0)]))  # front: red
    op = jnp.array([[1.0, 0.98]], jnp.float32)
    bg = jnp.zeros((1, 3), jnp.float32)
    img = np.asarray(
        render(
            extr, intr, jnp.ones(1), jnp.full((1,), 100.0), (h, w), bg,
            means, cov, sh, op, backend="oracle",
        )
    )[0]
    c = img[7, 7]
    # Front (red) should dominate at the center despite storage order.
    assert c[0] > 0.8, c
    assert c[1] < 0.2, c


def test_transmittance_early_termination():
    """Many stacked opaque gaussians: pixels converge, no NaN, T -> ~0."""
    h = w = 8
    extr, intr = make_camera()
    g = 64
    zs = np.linspace(2, 4, g).astype(np.float32)
    means = jnp.asarray(np.stack([np.zeros(g), np.zeros(g), zs], -1))[None]
    cov = jnp.broadcast_to(jnp.eye(3) * 0.5**2, (1, g, 3, 3)).astype(jnp.float32)
    sh = jnp.full((1, g, 3, 1), (1.0 - 0.5) / C0, jnp.float32)
    op = jnp.full((1, g), 0.95, jnp.float32)
    bg = jnp.full((1, 3), 123.0, jnp.float32)  # poisonous bg: must not leak
    img = np.asarray(
        render(
            extr, intr, jnp.ones(1), jnp.full((1,), 100.0), (h, w), bg,
            means, cov, sh, op, backend="oracle",
        )
    )[0]
    assert np.isfinite(img).all()
    # center pixel: saturated white stack. Early termination leaves residual
    # transmittance T_final <= eps/(1-alpha) ~ 2e-3 (identical to CUDA), so the
    # poisonous background may leak by at most 123 * 2e-3.
    np.testing.assert_allclose(img[3, 3], [1.0, 1.0, 1.0], atol=123 * 2.2e-3)


def test_scale_invariant_renorm_matches_manual():
    h = w = 16
    extr, intr = make_camera()
    means, cov, sh, op = single_gaussian_scene(z=6.0)
    bg = jnp.zeros((1, 3), jnp.float32)
    near = jnp.full((1,), 2.0)
    far = jnp.full((1,), 100.0)
    a = render(extr, intr, near, far, (h, w), bg, means, cov, sh, op,
               scale_invariant=True, backend="oracle")
    # manual renorm: scale everything by 1/near, then scale_invariant=False
    s = 1.0 / 2.0
    b_img = render(
        extr.at[:, :3, 3].multiply(s), intr, near * s, far * s, (h, w), bg,
        means * s, cov * s**2, sh, op, scale_invariant=False, backend="oracle",
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_img), atol=1e-6)


def test_render_depth_modes():
    h = w = 16
    extr, intr = make_camera()
    means, cov, sh, op = single_gaussian_scene(z=5.0, opacity=1.0)
    near = jnp.ones((1,))
    far = jnp.full((1,), 100.0)
    d = np.asarray(
        render_depth(extr, intr, near, far, (h, w), means, cov, op,
                     mode="depth", backend="oracle")
    )[0]
    # Depth is alpha-composited like color: center value = alpha * z.
    focal = w / (2 * 0.5)
    sigma2 = (focal * 0.05 / 5.0) ** 2 + 0.3
    alpha = min(0.99, np.exp(-0.5 * 0.5 / sigma2))  # d2 = 0.5 at pixel (7,7)
    assert abs(d[7, 7] - alpha * 5.0) < 1e-3, (d[7, 7], alpha * 5.0)
    disp = np.asarray(
        render_depth(extr, intr, near, far, (h, w), means, cov, op,
                     mode="disparity", backend="oracle")
    )[0]
    assert abs(disp[7, 7] - alpha * 0.2) < 1e-3, (disp[7, 7], alpha * 0.2)


def test_gradients_flow_and_match_finite_differences():
    h = w = 12
    extr, intr = make_camera()
    means, cov, sh, op = single_gaussian_scene(z=4.0, s=0.1, opacity=0.6)
    bg = jnp.zeros((1, 3), jnp.float32)
    near, far = jnp.ones((1,)), jnp.full((1,), 50.0)

    def loss(m, o, s_):
        img = render(extr, intr, near, far, (h, w), bg, m, cov, s_, o,
                     backend="oracle")
        return jnp.sum(img * jnp.arange(h * w * 3).reshape(1, h, w, 3))

    grads = jax.grad(loss, argnums=(0, 1, 2))(means, op, sh)
    for gname, gv in zip(["means", "opacity", "sh"], grads):
        assert np.isfinite(np.asarray(gv)).all(), gname
        assert np.abs(np.asarray(gv)).max() > 0, gname

    # finite differences on opacity
    eps = 1e-3
    f0 = loss(means, op - eps, sh)
    f1 = loss(means, op + eps, sh)
    fd = (f1 - f0) / (2 * eps)
    np.testing.assert_allclose(np.asarray(grads[1])[0, 0], np.asarray(fd),
                               rtol=2e-2)
