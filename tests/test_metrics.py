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
