"""Gaussian adapter + SH rotation tests.

SH rotation is validated through its defining property
sh_l(R x) = D_l(R) sh_l(x) for every band, which pins the implementation to the
same convention family as the reference's e3nn wigner_D (src/misc/sh_rotation.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as R

from my_depthsplat_tpu.gaussians import (
    GaussianAdapterCfg,
    RGB2SH,
    adapt_gaussians,
    build_covariance,
    quaternion_to_matrix,
    rotate_sh,
    sh_mask,
    sh_rotation_matrices,
)


def e3nn_style_sh(xyz: np.ndarray, max_degree: int) -> np.ndarray:
    """Orthonormal-family real SH in (y, z, x) band ordering, up to degree 3.

    Per-band overall normalization is irrelevant for rotation-matrix checks.
    """
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    out = [np.ones_like(x)]
    if max_degree >= 1:
        out += [y, z, x]
    if max_degree >= 2:
        out += [
            np.sqrt(3.0) * x * y,
            np.sqrt(3.0) * y * z,
            0.5 * (3 * z * z - 1),
            np.sqrt(3.0) * x * z,
            np.sqrt(3.0) / 2 * (x * x - y * y),
        ]
    if max_degree >= 3:
        xx, yy, zz = x * x, y * y, z * z
        out += [
            np.sqrt(5.0 / 8.0) * y * (3 * xx - yy),
            np.sqrt(15.0) * x * y * z,
            np.sqrt(3.0 / 8.0) * y * (5 * zz - 1),
            0.5 * z * (5 * zz - 3),
            np.sqrt(3.0 / 8.0) * x * (5 * zz - 1),
            np.sqrt(15.0) / 2 * z * (xx - yy),
            np.sqrt(5.0 / 8.0) * x * (xx - 3 * yy),
        ]
    return np.stack(out, axis=-1)


def test_sh_rotation_defining_property():
    rng = np.random.default_rng(1)
    rot = R.random(8, rng=3).as_matrix().astype(np.float32)
    dirs = rng.normal(size=(16, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    max_degree = 3
    blocks = sh_rotation_matrices(jnp.asarray(rot), max_degree)
    sh_orig = e3nn_style_sh(dirs, max_degree)  # (16, n)
    rotated_dirs = np.einsum("rij,nj->rni", rot, dirs)
    sh_rotated = e3nn_style_sh(rotated_dirs, max_degree)  # (8, 16, n)

    for deg in range(max_degree + 1):
        d = np.asarray(blocks[deg])  # (8, 2deg+1, 2deg+1)
        lo, hi = deg**2, (deg + 1) ** 2
        expected = np.einsum("rij,nj->rni", d, sh_orig[:, lo:hi])
        np.testing.assert_allclose(
            sh_rotated[..., lo:hi], expected, atol=1e-4,
            err_msg=f"degree {deg} rotation mismatch",
        )


def test_sh_rotation_is_representation():
    """D(R1 @ R2) == D(R1) @ D(R2) and D is orthogonal, up to degree 4."""
    r1 = R.random(4, rng=7).as_matrix().astype(np.float32)
    r2 = R.random(4, rng=8).as_matrix().astype(np.float32)
    b1 = sh_rotation_matrices(jnp.asarray(r1), 4)
    b2 = sh_rotation_matrices(jnp.asarray(r2), 4)
    b12 = sh_rotation_matrices(jnp.asarray(r1 @ r2), 4)
    for deg in range(5):
        d1, d2, d12 = map(np.asarray, (b1[deg], b2[deg], b12[deg]))
        np.testing.assert_allclose(d12, d1 @ d2, atol=1e-4)
        eye = np.eye(2 * deg + 1, dtype=np.float32)
        np.testing.assert_allclose(
            d1 @ d1.transpose(0, 2, 1), np.broadcast_to(eye, d1.shape), atol=1e-4
        )


def test_rotate_sh_identity_and_dc():
    sh = jnp.asarray(np.random.default_rng(0).normal(size=(5, 9)), jnp.float32)
    eye = jnp.broadcast_to(jnp.eye(3), (5, 3, 3))
    out = rotate_sh(sh, eye)
    np.testing.assert_allclose(np.asarray(out), np.asarray(sh), atol=1e-5)
    # DC term is rotation-invariant
    rot = jnp.asarray(R.random(5, rng=2).as_matrix())
    out = rotate_sh(sh, rot)
    np.testing.assert_allclose(np.asarray(out[..., 0]), np.asarray(sh[..., 0]), atol=1e-5)


def test_quaternion_to_matrix_matches_scipy():
    q = np.random.default_rng(5).normal(size=(32, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    ours = np.asarray(quaternion_to_matrix(jnp.asarray(q, jnp.float32)))
    scipys = R.from_quat(q).as_matrix()  # scipy uses xyzw, same as reference
    np.testing.assert_allclose(ours, scipys, atol=1e-5)


def test_build_covariance_properties():
    rng = np.random.default_rng(6)
    s = np.abs(rng.normal(size=(10, 3))).astype(np.float32) + 0.1
    q = rng.normal(size=(10, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    cov = np.asarray(build_covariance(jnp.asarray(s), jnp.asarray(q)))
    np.testing.assert_allclose(cov, cov.transpose(0, 2, 1), atol=1e-5)
    # eigenvalues == squared scales
    eig = np.sort(np.linalg.eigvalsh(cov), axis=-1)
    np.testing.assert_allclose(eig, np.sort(s**2, axis=-1), rtol=1e-4, atol=1e-5)


def test_sh_mask_values():
    m = np.asarray(sh_mask(2))
    assert m.shape == (9,)
    np.testing.assert_allclose(m[0], 1.0)
    np.testing.assert_allclose(m[1:4], 0.1 * 0.25)
    np.testing.assert_allclose(m[4:9], 0.1 * 0.25**2)


def test_adapter_end_to_end_shapes_and_means():
    cfg = GaussianAdapterCfg(0.5, 15.0, sh_degree=2)
    b, v, hw = 2, 2, 12
    rng = np.random.default_rng(9)
    extr = np.broadcast_to(np.eye(4, dtype=np.float32), (b, v, 4, 4)).copy()
    extr[..., :3, 3] = rng.normal(size=(b, v, 3)) * 0.1
    intr = np.broadcast_to(
        np.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], np.float32),
        (b, v, 3, 3),
    )
    coords = rng.uniform(0.2, 0.8, size=(b, v, hw, 1, 1, 2)).astype(np.float32)
    depths = rng.uniform(1, 5, size=(b, v, hw, 1, 1)).astype(np.float32)
    opac = rng.uniform(0, 1, size=(b, v, hw, 1, 1)).astype(np.float32)
    raw = rng.normal(size=(b, v, hw, 1, 1, 7 + 27)).astype(np.float32)
    imgs = rng.uniform(0, 1, size=(b, v, 3, 4, 3)).astype(np.float32)  # h*w == hw

    out = adapt_gaussians(
        cfg,
        jnp.asarray(extr)[:, :, None, None, None],
        jnp.asarray(intr)[:, :, None, None, None],
        jnp.asarray(coords),
        jnp.asarray(depths),
        jnp.asarray(opac),
        jnp.asarray(raw),
        input_images=jnp.asarray(imgs),
    )
    assert out.means.shape == (b, v, hw, 1, 1, 3)
    assert out.covariances.shape == (b, v, hw, 1, 1, 3, 3)
    assert out.harmonics.shape == (b, v, hw, 1, 1, 3, 9)
    assert out.opacities.shape == (b, v, hw, 1, 1)

    # scales clamped into [min, max]
    s = np.asarray(out.scales)
    assert s.min() >= 0.5 - 1e-6 and s.max() <= 15.0 + 1e-6

    # identity-rotation cameras: mean z == origin z + depth
    flat = out.flattened()
    assert flat.means.shape == (b, v * hw, 3)

    # DC seeded from image: with raw sh scaled small, DC ~ RGB2SH(img)
    raw_zero_sh = raw.copy()
    raw_zero_sh[..., 7:] = 0.0
    out2 = adapt_gaussians(
        cfg,
        jnp.asarray(extr)[:, :, None, None, None],
        jnp.asarray(intr)[:, :, None, None, None],
        jnp.asarray(coords),
        jnp.asarray(depths),
        jnp.asarray(opac),
        jnp.asarray(raw_zero_sh),
        input_images=jnp.asarray(imgs),
    )
    dc = np.asarray(out2.harmonics[..., 0]).reshape(b, v, hw, 3)
    expected = np.asarray(RGB2SH(jnp.asarray(imgs))).reshape(b, v, hw, 3)
    np.testing.assert_allclose(dc, expected, atol=1e-5)


def test_scalarized_adapter_matches_reference():
    """adapt_gaussians (scalarized TPU layout) vs adapt_gaussians_reference
    (direct broadcast transcription): every output field must agree — the
    rewrite is a pure layout change."""
    from my_depthsplat_tpu.gaussians.adapter import adapt_gaussians_reference

    rng = np.random.default_rng(11)
    b, v, hw = 2, 3, 12
    cfg = GaussianAdapterCfg(0.5, 15.0, 2)
    extr = np.broadcast_to(np.eye(4, dtype=np.float32), (b, v, 4, 4)).copy()
    extr[..., :3, 3] = rng.normal(size=(b, v, 3)) * 0.2
    # a real rotation so the Wigner blocks are nontrivial
    th = rng.uniform(0, 2 * np.pi, size=(b, v))
    extr[..., 0, 0] = np.cos(th)
    extr[..., 0, 1] = -np.sin(th)
    extr[..., 1, 0] = np.sin(th)
    extr[..., 1, 1] = np.cos(th)
    intr = np.broadcast_to(
        np.array([[0.9, 0, 0.5], [0, 1.1, 0.45], [0, 0, 1]], np.float32),
        (b, v, 3, 3),
    )
    coords = rng.uniform(0.1, 0.9, size=(b, v, hw, 1, 1, 2)).astype(np.float32)
    depths = rng.uniform(1, 5, size=(b, v, hw, 1, 1)).astype(np.float32)
    opac = rng.uniform(0, 1, size=(b, v, hw, 1, 1)).astype(np.float32)
    raw = rng.normal(size=(b, v, hw, 1, 1, 7 + 27)).astype(np.float32)
    imgs = rng.uniform(0, 1, size=(b, v, 3, 4, 3)).astype(np.float32)

    args = (
        cfg,
        jnp.asarray(extr)[:, :, None, None, None],
        jnp.asarray(intr)[:, :, None, None, None],
        jnp.asarray(coords),
        jnp.asarray(depths),
        jnp.asarray(opac),
        jnp.asarray(raw),
    )
    a = adapt_gaussians(*args, input_images=jnp.asarray(imgs))
    r = adapt_gaussians_reference(*args, input_images=jnp.asarray(imgs))
    for name in ("means", "covariances", "harmonics", "opacities", "scales"):
        ga, gr = np.asarray(getattr(a, name)), np.asarray(getattr(r, name))
        assert ga.shape == np.broadcast_shapes(ga.shape, gr.shape), name
        np.testing.assert_allclose(
            ga, np.broadcast_to(gr, ga.shape), rtol=2e-5, atol=2e-6,
            err_msg=name,
        )
    np.testing.assert_allclose(
        np.asarray(a.rotations),
        np.broadcast_to(np.asarray(r.rotations), a.rotations.shape),
        rtol=2e-5, atol=2e-6,
    )
