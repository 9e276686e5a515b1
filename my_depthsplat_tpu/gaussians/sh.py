"""Real spherical harmonics: evaluation, rotation, masking.

The reference rotates SH coefficients with e3nn's ``wigner_D``
(src/misc/sh_rotation.py:10-31) and evaluates them inside the CUDA rasterizer
with the standard 3DGS basis. Here:

- ``eval_sh`` reproduces the 3DGS rasterizer's SH evaluation (including the
  ``+ 0.5`` offset and clamp applied downstream by the renderer).
- ``rotate_sh`` builds per-degree real-SH rotation matrices directly from the
  3x3 rotation via the Ivanic-Ruedenberg recursion (J. Phys. Chem. 1996, with
  the 1998 errata), which satisfies the same defining property as e3nn's
  wigner_D: sh_l(R x) = D_l(R) sh_l(x) in the (..., y, z, x, ...) real basis
  ordering that both e3nn and 3DGS use. No Euler-angle extraction needed, so it
  is branch-free and batched.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import Array

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)


def RGB2SH(rgb: Array) -> Array:
    """Reference gaussian_adapter.py:126-128."""
    return (rgb - 0.5) / C0


def SH2RGB(sh: Array) -> Array:
    return sh * C0 + 0.5


def sh_mask(sh_degree: int, dtype=jnp.float32) -> Array:
    """Per-coefficient init mask biasing towards DC (gaussian_adapter.py:41-47)."""
    d = (sh_degree + 1) ** 2
    mask = np.ones((d,), dtype=np.float32)
    for degree in range(1, sh_degree + 1):
        mask[degree**2 : (degree + 1) ** 2] = 0.1 * 0.25**degree
    return jnp.asarray(mask, dtype=dtype)


def eval_sh(sh: Array, dirs: Array, degree: int) -> Array:
    """Evaluate RGB spherical harmonics exactly like the 3DGS CUDA rasterizer.

    sh: (..., 3, d_sh) coefficients; dirs: (..., 3) unit view directions.
    Returns raw (..., 3) color WITHOUT the rasterizer's `+0.5, clamp(0)` —
    callers apply that (see render/).
    """
    result = C0 * sh[..., 0]
    if degree >= 1:
        x, y, z = dirs[..., 0:1], dirs[..., 1:2], dirs[..., 2:3]
        result = (
            result
            - C1 * y * sh[..., 1]
            + C1 * z * sh[..., 2]
            - C1 * x * sh[..., 3]
        )
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        result = (
            result
            + C2[0] * xy * sh[..., 4]
            + C2[1] * yz * sh[..., 5]
            + C2[2] * (2.0 * zz - xx - yy) * sh[..., 6]
            + C2[3] * xz * sh[..., 7]
            + C2[4] * (xx - yy) * sh[..., 8]
        )
    if degree >= 3:
        result = (
            result
            + C3[0] * y * (3.0 * xx - yy) * sh[..., 9]
            + C3[1] * xy * z * sh[..., 10]
            + C3[2] * y * (4.0 * zz - xx - yy) * sh[..., 11]
            + C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy) * sh[..., 12]
            + C3[4] * x * (4.0 * zz - xx - yy) * sh[..., 13]
            + C3[5] * z * (xx - yy) * sh[..., 14]
            + C3[6] * x * (xx - 3.0 * yy) * sh[..., 15]
        )
    return result


# ---------------------------------------------------------------------------
# Real-SH rotation (Ivanic-Ruedenberg recursion)
# ---------------------------------------------------------------------------

def _band1(rotation: Array) -> Array:
    """D_1 = A R A^T where A reorders (x,y,z) -> (y,z,x).

    Satisfies sh_1(R x) = D_1 sh_1(x) for sh_1(x) proportional to (y, z, x).
    """
    perm = [1, 2, 0]
    return rotation[..., perm, :][..., :, perm]


def _ir_next_band(ell: int, d1: Array, dprev: Array) -> Array:
    """Build D_ell (2l+1 x 2l+1) from D_1 and D_{l-1} via the IR recursion.

    Indices below use python offsets: band matrix index i corresponds to
    m = i - ell. All coefficient logic is static python; only the matrix
    entries are traced arrays (small fixed-size stacks, fine for XLA).
    """

    lp = ell - 1  # degree of dprev

    def D1(i: int, j: int) -> Array:  # i, j in {-1, 0, 1}
        return d1[..., i + 1, j + 1]

    def Dp(a: int, b: int) -> Array:  # a, b in [-lp, lp]
        return dprev[..., a + lp, b + lp]

    def P(i: int, a: int, b: int) -> Array:
        if b == ell:
            return D1(i, 1) * Dp(a, lp) - D1(i, -1) * Dp(a, -lp)
        if b == -ell:
            return D1(i, 1) * Dp(a, -lp) + D1(i, -1) * Dp(a, lp)
        return D1(i, 0) * Dp(a, b)

    rows = []
    for m in range(-ell, ell + 1):
        cols = []
        for n in range(-ell, ell + 1):
            denom = (
                (ell + n) * (ell - n) if abs(n) < ell else (2 * ell) * (2 * ell - 1)
            )
            d_m0 = 1.0 if m == 0 else 0.0
            u = np.sqrt((ell + m) * (ell - m) / denom)
            v = (
                0.5
                * np.sqrt(
                    (1.0 + d_m0)
                    * (ell + abs(m) - 1)
                    * (ell + abs(m))
                    / denom
                )
                * (1.0 - 2.0 * d_m0)
            )
            w = (
                -0.5
                * np.sqrt((ell - abs(m) - 1) * (ell - abs(m)) / denom)
                * (1.0 - d_m0)
            )

            term = None

            def add(coef: float, val: Array) -> None:
                nonlocal term
                if coef == 0.0:
                    return
                piece = coef * val
                term = piece if term is None else term + piece

            if u != 0.0:
                add(u, P(0, m, n))
            if v != 0.0:
                if m == 0:
                    add(v, P(1, 1, n) + P(-1, -1, n))
                elif m > 0:
                    d_m1 = 1.0 if m == 1 else 0.0
                    add(v * np.sqrt(1.0 + d_m1), P(1, m - 1, n))
                    add(-v * (1.0 - d_m1), P(-1, -m + 1, n))
                else:
                    d_m1 = 1.0 if m == -1 else 0.0
                    add(v * (1.0 - d_m1), P(1, m + 1, n))
                    add(v * np.sqrt(1.0 + d_m1), P(-1, -m - 1, n))
            if w != 0.0:
                if m > 0:
                    add(w, P(1, m + 1, n) + P(-1, -m - 1, n))
                elif m < 0:
                    add(w, P(1, m - 1, n) - P(-1, -m + 1, n))
            assert term is not None
            cols.append(term)
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


def sh_rotation_matrices(rotation: Array, max_degree: int) -> list[Array]:
    """[D_0, D_1, ..., D_max] real-SH rotation blocks for (..., 3, 3) rotation."""
    blocks: list[Array] = [
        jnp.ones(rotation.shape[:-2] + (1, 1), dtype=rotation.dtype)
    ]
    if max_degree >= 1:
        blocks.append(_band1(rotation))
    for ell in range(2, max_degree + 1):
        blocks.append(_ir_next_band(ell, blocks[1], blocks[-1]))
    return blocks


def rotate_sh(sh_coefficients: Array, rotations: Array) -> Array:
    """Rotate per-degree SH coefficient blocks (reference sh_rotation.py:10-31).

    sh_coefficients: (..., n) with n a perfect square; rotations: (..., 3, 3).
    """
    n = sh_coefficients.shape[-1]
    max_degree = int(np.sqrt(n)) - 1
    assert (max_degree + 1) ** 2 == n, f"n={n} is not a perfect square"
    blocks = sh_rotation_matrices(rotations, max_degree)
    out = []
    for degree, d in enumerate(blocks):
        chunk = sh_coefficients[..., degree**2 : (degree + 1) ** 2]
        out.append(jnp.einsum("...ij,...j->...i", d, chunk))
    return jnp.concatenate(out, axis=-1)
