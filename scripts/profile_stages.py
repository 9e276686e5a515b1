"""Stage attribution for the bench render step, profiler-based.

Profiles (device op totals):
  proj        — vmapped project_gaussians only
  layout      — proj + build_tile_instances_batched (forward)
  fwd         — full render_pallas forward
  fwdbwd      — value_and_grad through render_pallas (the bench step)
Differences give per-stage costs without trusting wall clocks.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from my_depthsplat_tpu.geometry import get_fov
from my_depthsplat_tpu.render.camera import scale_invariant_normalization
from my_depthsplat_tpu.render.instances import build_tile_instances_batched
from my_depthsplat_tpu.render.pallas_raster import CHUNK, render_pallas
from my_depthsplat_tpu.render.projection import project_gaussians


def total_device_ms(trace_dir):
    fn = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/vm.trace.json.gz"))[-1]
    with gzip.open(fn) as f:
        tr = json.load(f)
    return sum(
        e.get("dur", 0) / 1e3
        for e in tr["traceEvents"]
        if e.get("ph") == "X" and e.get("pid") == 3 and e.get("tid") == 3
    )


def profile(tag, fn, *args):
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    d = f"/tmp/stage_{tag}"
    jax.profiler.start_trace(d)
    r = f(*args)
    jax.block_until_ready(r)
    jax.profiler.stop_trace()
    t = total_device_ms(d)
    print(f"{tag}: {t:.2f} ms", flush=True)
    return t


def main():
    budget_mult = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    h = w = 256
    n_views = 2
    g = n_views * h * w
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
    args = tuple(map(jnp.asarray, (extr, intr, near, far, bg, means, cov, sh, opac)))
    budget = budget_mult * h * w

    image_shape = (h, w)

    def proj(extr_, intr_, near_, far_, means_, cov_, sh_, opac_):
        e, n_, f_, m, c = scale_invariant_normalization(
            extr_, near_, far_, means_, cov_
        )
        fovs = get_fov(intr_)

        def one(e1, k1, fov, m1, c1, s1, o1):
            return project_gaussians(
                e1, m1, c1, s1, o1,
                jnp.tan(0.5 * fov[0]), jnp.tan(0.5 * fov[1]),
                image_shape, True,
            )
        return jax.vmap(one)(e, intr_, fovs, m, c, sh_, opac_)

    def layout(extr_, intr_, near_, far_, means_, cov_, sh_, opac_):
        sg = proj(extr_, intr_, near_, far_, means_, cov_, sh_, opac_)
        inst = build_tile_instances_batched(
            sg, image_shape, 16, CHUNK, budget
        )
        return (
            jnp.sum(inst.packed), jnp.sum(inst.starts), jnp.sum(inst.counts)
        )

    render = partial(render_pallas, instance_budget=budget)

    def fwd(means_, cov_, sh_, opac_):
        return jnp.sum(
            render(args[0], args[1], args[2], args[3], image_shape, args[4],
                   means_, cov_, sh_, opac_) ** 2
        )

    profile("proj", lambda m, c, s, o: jax.tree.map(jnp.sum, proj(
        args[0], args[1], args[2], args[3], m, c, s, o)),
        args[5], args[6], args[7], args[8])
    profile("layout", lambda m, c, s, o: layout(
        args[0], args[1], args[2], args[3], m, c, s, o),
        args[5], args[6], args[7], args[8])
    profile("fwd", fwd, args[5], args[6], args[7], args[8])
    profile("fwdbwd", jax.value_and_grad(fwd, argnums=(0, 1, 2, 3)),
            args[5], args[6], args[7], args[8])


if __name__ == "__main__":
    main()
