"""Real-TPU gradient check for the huge-G grouped render backward.

Renders >2^21 gaussians per view (the threshold where render_pallas switches
to depth-grouped chained compositing) and compares value_and_grad through the
GROUPED path against the FLAT path (forced by raising _CHAIN_MIN_G), which is
slower at this size but exact at any count. This is the capability the CUDA
reference has (backprop at any gaussian count, memory permitting —
src/model/decoder/cuda_splatting.py:112-123) and round 4 lacked.

Run on the real TPU: python scripts/check_grouped_grad_tpu.py [n_gaussians]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from my_depthsplat_tpu.render import pallas_raster


def make_scene(g, h, w, seed=0):
    rng = np.random.default_rng(seed)
    extr = np.eye(4, dtype=np.float32)[None]
    intr = np.array([[[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]]], np.float32)
    means = np.stack(
        [rng.uniform(-1.5, 1.5, g), rng.uniform(-1.0, 1.0, g),
         rng.uniform(2.0, 8.0, g)], -1,
    ).astype(np.float32)[None]
    scales = rng.uniform(0.002, 0.01, (g, 3)).astype(np.float32)
    cov = np.zeros((1, g, 3, 3), np.float32)
    for i in range(3):
        cov[0, :, i, i] = scales[:, i] ** 2
    sh = (rng.normal(size=(1, g, 3, 9)) * 0.3).astype(np.float32)
    opac = rng.uniform(0.2, 0.95, (1, g)).astype(np.float32)
    near = np.ones((1,), np.float32)
    far = np.full((1,), 100.0, np.float32)
    bg = np.array([[0.1, 0.2, 0.3]], np.float32)
    return tuple(
        map(jnp.asarray, (extr, intr, near, far, bg, means, cov, sh, opac))
    )


def main() -> None:
    g = int(sys.argv[1]) if len(sys.argv) > 1 else (1 << 21) + 200_000
    h = w = 256
    args = make_scene(g, h, w)
    budget = 6 * g  # generous: tiny gaussians average ~1-3 tiles

    weights = jnp.asarray(
        np.random.default_rng(1).normal(size=(1, h, w, 3)).astype(np.float32)
    )

    def loss(m, c, s, o):
        img = pallas_raster.render_pallas(
            *args[:4], (h, w), args[4], m, c, s, o, instance_budget=budget,
        )
        return jnp.sum(img * weights)

    grad_fn = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3)))

    assert g >= pallas_raster._CHAIN_MIN_G, "scene below the grouped threshold"
    t0 = time.perf_counter()
    val_g, grads_g = grad_fn(*args[5:])
    jax.block_until_ready(grads_g)
    t_grouped = time.perf_counter() - t0
    print(f"grouped fwd+bwd at G={g}: loss={float(val_g):.1f} "
          f"(first call incl. compile {t_grouped:.1f}s)", flush=True)

    # force the flat path (exact at any size; slow two-key sort above int32
    # key packing) as the reference
    pallas_raster._CHAIN_MIN_G = 1 << 62
    grad_fn_flat = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3)))
    t0 = time.perf_counter()
    val_f, grads_f = grad_fn_flat(*args[5:])
    jax.block_until_ready(grads_f)
    print(f"flat fwd+bwd: loss={float(val_f):.1f} "
          f"({time.perf_counter()-t0:.1f}s)", flush=True)

    print(f"|loss diff| = {abs(float(val_g) - float(val_f)):.3e}")
    worst = 0.0
    for name, gg, gf in zip(["means", "cov", "sh", "opac"], grads_g, grads_f):
        gg, gf = np.asarray(gg), np.asarray(gf)
        assert np.isfinite(gg).all(), f"nonfinite grouped grad: {name}"
        scale = np.abs(gf).max() + 1e-8
        rel = np.abs(gg - gf).max() / scale
        worst = max(worst, rel)
        print(f"  d{name}: max rel diff {rel:.3e}")
    # Tolerance: at >2M gaussians this scene stacks ~35 gaussians/pixel, and
    # the two paths re-chunk the transmittance product chains differently
    # (grouped: per 2^18-slot group; flat: per 256-lane chunk), so gradients
    # diverge by FP re-association — measured 7.8e-4 max-rel here, within
    # the ~4e-3 envelope the oracle-vs-pallas comparison shows on dense
    # scenes. Interpreter parity at small scale is 5e-5-clean
    # (tests/test_pallas_raster.py::test_grouped_chain_matches_flat).
    assert worst < 2e-3, f"gradient mismatch: {worst}"
    print("PASS: grouped backward matches flat on TPU at "
          f"G={g} (> 2^21 = {1 << 21})")


if __name__ == "__main__":
    main()
