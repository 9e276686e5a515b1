"""Profile the Pallas render pipeline stage by stage on the real TPU.

Not part of the library — a development tool. Times (after jit warm-up):
projection, instance binning, composite fwd kernel, full forward, and full
value_and_grad, at the bench.py geometry (2 views, 256x256, 131k gaussians).
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from my_depthsplat_tpu.geometry import get_fov
from my_depthsplat_tpu.render.camera import (
    TILE_X,
    TILE_Y,
    scale_invariant_normalization,
)
from my_depthsplat_tpu.render.instances import build_tile_instances_batched
from my_depthsplat_tpu.render.pallas_raster import (
    CHUNK,
    composite_tiles,
    render_pallas,
)
from my_depthsplat_tpu.render.projection import project_gaussians


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / iters * 1e3  # ms


def main() -> None:
    h = w = 256
    n_views = 2
    g = n_views * h * w
    budget = 8 * 256 * 256
    rng = np.random.default_rng(0)

    extr = np.broadcast_to(np.eye(4, dtype=np.float32), (n_views, 4, 4)).copy()
    extr[:, 0, 3] = 0.15 * np.arange(n_views)
    intr = np.broadcast_to(
        np.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], np.float32),
        (n_views, 3, 3),
    )
    near = np.full((n_views,), 1.0, np.float32)
    far = np.full((n_views,), 100.0, np.float32)
    bg = np.zeros((n_views, 3), np.float32)
    means = rng.normal(size=(n_views, g, 3)).astype(np.float32) * np.array(
        [1.0, 1.0, 0.0], np.float32
    ) + np.array([0.0, 0.0, 4.0], np.float32)
    scales = rng.uniform(0.01, 0.05, size=(n_views, g, 3)).astype(np.float32)
    cov = np.zeros((n_views, g, 3, 3), np.float32)
    cov[..., 0, 0] = scales[..., 0] ** 2
    cov[..., 1, 1] = scales[..., 1] ** 2
    cov[..., 2, 2] = scales[..., 2] ** 2
    sh = rng.normal(size=(n_views, g, 3, 9)).astype(np.float32) * 0.3
    opac = rng.uniform(0.3, 1.0, size=(n_views, g)).astype(np.float32)

    extr, intr, near, far, bg, means, cov, sh, opac = map(
        jnp.asarray, (extr, intr, near, far, bg, means, cov, sh, opac)
    )

    @jax.jit
    def proj(extr, near, far, means, cov, sh, opac):
        e, n_, f_, m, c = scale_invariant_normalization(
            extr, near, far, means, cov
        )
        fovs = get_fov(intr)

        def proj_one(e1, fov, m1, c1, s1, o1):
            return project_gaussians(
                e1, m1, c1, s1, o1,
                jnp.tan(0.5 * fov[0]), jnp.tan(0.5 * fov[1]), (h, w), True,
            )

        return jax.vmap(proj_one)(e, fovs, m, c, sh, opac)

    sg = proj(extr, near, far, means, cov, sh, opac)
    print(f"projection:        {timeit(proj, extr, near, far, means, cov, sh, opac):8.2f} ms")

    binning = jax.jit(
        partial(
            build_tile_instances_batched,
            image_shape=(h, w),
            chunk=CHUNK,
            instance_budget=budget,
        )
    )
    inst = binning(sg)
    print(f"binning:           {timeit(binning, sg):8.2f} ms")
    print(f"  layout len:      {inst.packed.shape[1]}")
    print(f"  dropped:         {int(inst.num_dropped)}")
    print(f"  total instances: {int(jnp.sum(inst.counts))}")

    gy, gx = (h + TILE_Y - 1) // TILE_Y, (w + TILE_X - 1) // TILE_X
    comp = jax.jit(
        lambda p, s, c, b: composite_tiles(p, s, c, b, (n_views, gy, gx))
    )
    print(f"composite fwd:     {timeit(comp, inst.packed, inst.starts, inst.counts, bg):8.2f} ms")

    def comp_loss(p, s, c, b):
        return jnp.sum(composite_tiles(p, s, c, b, (n_views, gy, gx))[..., :3] ** 2)

    comp_grad = jax.jit(jax.grad(comp_loss))
    print(f"composite fwd+bwd: {timeit(comp_grad, inst.packed, inst.starts, inst.counts, bg):8.2f} ms")

    fwd = jax.jit(
        lambda m, c, s, o: render_pallas(
            extr, intr, near, far, (h, w), bg, m, c, s, o,
            instance_budget=budget,
        )
    )
    print(f"full forward:      {timeit(fwd, means, cov, sh, opac):8.2f} ms")

    def loss_fn(m, c, s, o):
        img = render_pallas(
            extr, intr, near, far, (h, w), bg, m, c, s, o,
            instance_budget=budget,
        )
        return jnp.sum(img**2)

    step = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3)))
    print(f"full fwd+bwd:      {timeit(step, means, cov, sh, opac):8.2f} ms")


if __name__ == "__main__":
    main()
