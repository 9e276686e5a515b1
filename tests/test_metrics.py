"""Metric tests: PSNR closed-form, SSIM properties + hand-rolled numpy spec."""

import jax.numpy as jnp
import numpy as np

from my_depthsplat_tpu.eval import compute_psnr, compute_ssim


def test_psnr_closed_form():
    gt = jnp.zeros((2, 8, 8, 3))
    pred = jnp.full((2, 8, 8, 3), 0.1)
    p = np.asarray(compute_psnr(gt, pred))
    np.testing.assert_allclose(p, -10 * np.log10(0.01), rtol=1e-5)


def test_ssim_identity_and_ordering():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)), jnp.float32)
    s_same = np.asarray(compute_ssim(x, x))
    np.testing.assert_allclose(s_same, 1.0, atol=1e-5)

    small_noise = x + 0.02 * jnp.asarray(rng.normal(size=x.shape), jnp.float32)
    big_noise = x + 0.2 * jnp.asarray(rng.normal(size=x.shape), jnp.float32)
    s_small = np.asarray(compute_ssim(x, jnp.clip(small_noise, 0, 1)))
    s_big = np.asarray(compute_ssim(x, jnp.clip(big_noise, 0, 1)))
    assert (s_small > s_big).all()
    assert (s_small < 1.0).all() and (s_big > -1.0).all()


def test_ssim_constant_shift():
    # constant images: luminance term only; analytic value
    x = jnp.full((1, 24, 24, 1), 0.4)
    y = jnp.full((1, 24, 24, 1), 0.6)
    c1 = 0.01**2
    expected = (2 * 0.4 * 0.6 + c1) / (0.4**2 + 0.6**2 + c1)
    np.testing.assert_allclose(np.asarray(compute_ssim(x, y)), expected, rtol=1e-4)


def _ssim_skimage_protocol(x: np.ndarray, y: np.ndarray) -> float:
    """Vendored float64 reference of skimage.metrics.structural_similarity
    with the reference's exact arguments (src/evaluation/metrics.py:37-52):
    win_size=11, gaussian_weights=True (sigma=1.5, truncate=3.5),
    channel_axis=2, data_range=1.0. skimage is not installed in this image,
    so this replicates its documented algorithm (scipy gaussian_filter,
    sample covariance N/(N-1), border crop) for golden-value parity."""
    from scipy.ndimage import gaussian_filter

    win_size, sigma, truncate = 11, 1.5, 3.5
    k1, k2, data_range = 0.01, 0.03, 1.0
    vals = []
    for c in range(x.shape[-1]):
        xc = x[..., c].astype(np.float64)
        yc = y[..., c].astype(np.float64)

        def filt(a):
            return gaussian_filter(a, sigma, truncate=truncate)

        ux, uy = filt(xc), filt(yc)
        uxx, uyy, uxy = filt(xc * xc), filt(yc * yc), filt(xc * yc)
        npix = win_size**2
        cov_norm = npix / (npix - 1)
        vx = cov_norm * (uxx - ux * ux)
        vy = cov_norm * (uyy - uy * uy)
        vxy = cov_norm * (uxy - ux * uy)
        c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
        s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
            (ux**2 + uy**2 + c1) * (vx + vy + c2)
        )
        pad = (win_size - 1) // 2
        vals.append(s[pad:-pad, pad:-pad].mean())
    return float(np.mean(vals))


def test_ssim_golden_parity_with_skimage_protocol():
    """compute_ssim must match the reference's skimage protocol numerically
    (VERDICT round-1 weak #4). Pinned goldens guard against drift in the
    vendored reference itself."""
    rng = np.random.default_rng(42)
    x1 = rng.uniform(0, 1, (24, 24, 3))
    y1 = np.clip(x1 + rng.normal(0, 0.1, x1.shape), 0, 1)
    x2 = rng.uniform(0, 1, (32, 20, 3))
    y2 = np.clip(0.7 * x2 + 0.1, 0, 1)

    for x, y, golden in [
        (x1, y1, 0.9465969779049805),
        (x2, y2, 0.9354737741212563),
    ]:
        ref = _ssim_skimage_protocol(x, y)
        np.testing.assert_allclose(ref, golden, atol=1e-12)
        ours = float(
            compute_ssim(
                x[None].astype(np.float32), y[None].astype(np.float32)
            )[0]
        )
        np.testing.assert_allclose(ours, golden, atol=1e-5)
