"""Pallas rasterizer vs XLA oracle: image and gradient parity.

Runs the kernels in Pallas interpreter mode on CPU (the compiled path needs a
real TPU; the driver's bench exercises that).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from my_depthsplat_tpu.render import render_oracle
from my_depthsplat_tpu.render import pallas_raster
from my_depthsplat_tpu.render.instances import build_tile_instances
from my_depthsplat_tpu.render.projection import project_gaussians
from my_depthsplat_tpu.geometry import get_fov


@pytest.fixture(autouse=True)
def _interpret_mode():
    pallas_raster.INTERPRET = True
    yield
    pallas_raster.INTERPRET = False


def random_scene(g=300, seed=0, h=32, w=48):
    rng = np.random.default_rng(seed)
    extr = np.eye(4, dtype=np.float32)[None]
    intr = np.array(
        [[[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]]], np.float32
    )
    means = np.stack(
        [
            rng.uniform(-1.5, 1.5, g),
            rng.uniform(-1.0, 1.0, g),
            rng.uniform(2.0, 8.0, g),
        ],
        -1,
    ).astype(np.float32)[None]
    scales = rng.uniform(0.02, 0.15, (g, 3)).astype(np.float32)
    q = rng.normal(size=(g, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    from my_depthsplat_tpu.gaussians import build_covariance

    cov = np.asarray(build_covariance(jnp.asarray(scales), jnp.asarray(q)))[None]
    sh = (rng.normal(size=(1, g, 3, 9)) * 0.3).astype(np.float32)
    opac = rng.uniform(0.2, 0.95, (1, g)).astype(np.float32)
    near = np.ones((1,), np.float32)
    far = np.full((1,), 100.0, np.float32)
    bg = np.array([[0.1, 0.2, 0.3]], np.float32)
    return tuple(
        map(jnp.asarray, (extr, intr, near, far, bg, means, cov, sh, opac))
    ), (h, w)


def test_instances_layout():
    (extr, intr, near, far, bg, means, cov, sh, opac), (h, w) = random_scene(64)
    fov = get_fov(intr)[0]
    sg = project_gaussians(
        extr[0], means[0], cov[0], sh[0], opac[0],
        jnp.tan(0.5 * fov[0]), jnp.tan(0.5 * fov[1]), (h, w), True,
    )
    inst = build_tile_instances(sg, (h, w), 16, chunk=256)
    starts = np.asarray(inst.starts)
    counts = np.asarray(inst.counts)
    gid = np.asarray(inst.gaussian_id)
    # runs are contiguous and ascending by tile (the kernel's sequential
    # backward-overwrite correctness depends on this)
    order_t = np.argsort(starts, kind="stable")
    live = counts[order_t] > 0
    s, c = starts[order_t][live], counts[order_t][live]
    assert (s[1:] >= s[:-1] + c[:-1]).all()
    assert (s[1:] == s[:-1] + c[:-1]).all()  # no gaps either
    # every live lane's gaussian id < G; ids in [start, start+count) are live
    for t in range(len(starts)):
        seg = gid[starts[t] : starts[t] + counts[t]]
        assert (seg < 64).all()
    # depth order within each tile segment
    depth = np.asarray(sg.depth)
    for t in range(len(starts)):
        seg = gid[starts[t] : starts[t] + counts[t]]
        d = depth[seg]
        assert (np.diff(d) >= 0).all()


def test_pallas_matches_oracle_forward():
    args, (h, w) = random_scene(300)
    img_oracle = render_oracle(*args[:4], (h, w), args[4], *args[5:])
    img_pallas = pallas_raster.render_pallas(
        *args[:4], (h, w), args[4], *args[5:]
    )
    np.testing.assert_allclose(
        np.asarray(img_pallas), np.asarray(img_oracle), atol=2e-5
    )


@pytest.mark.slow
def test_deep_stack_sticky_termination():
    """Regression: many overlapping high-opacity gaussians spanning several
    256-instance chunks. The termination must be sticky across chunk
    boundaries (raw-product carry); a frozen-T carry resurrects gaussians and
    inflates gradients by orders of magnitude."""
    args, (h, w) = random_scene(1200, seed=7, h=32, w=32)
    extr, intr, near, far, bg, means, cov, sh, opac = args
    # concentrate gaussians so single tiles see deep stacks
    means = means.at[..., 0:2].multiply(0.3)
    opac = jnp.clip(opac * 1.3, 0.2, 0.95)

    img_o = render_oracle(extr, intr, near, far, (h, w), bg, means, cov, sh, opac)
    img_p = pallas_raster.render_pallas(
        extr, intr, near, far, (h, w), bg, means, cov, sh, opac
    )
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_o), atol=5e-4)

    def loss(renderer, o):
        img = renderer(extr, intr, near, far, (h, w), bg, means, cov, sh, o)
        return jnp.sum(img**2)

    go = jax.grad(lambda o: loss(render_oracle, o))(opac)
    gp = jax.grad(lambda o: loss(pallas_raster.render_pallas, o))(opac)
    scale = np.abs(np.asarray(go)).max()
    np.testing.assert_allclose(
        np.asarray(gp) / scale, np.asarray(go) / scale, atol=1e-4
    )


@pytest.mark.slow
def test_view_grouped_layout_matches_oracle(monkeypatch):
    """Force the view-grouping path (used when B*G exceeds the fast-scatter
    accumulator size) and check image + gradient parity with the oracle."""
    rng = np.random.default_rng(5)
    b, g, h, w = 4, 50, 32, 32
    extr = np.broadcast_to(np.eye(4, dtype=np.float32), (b, 4, 4)).copy()
    extr[:, 0, 3] = 0.1 * np.arange(b)
    intr = np.broadcast_to(
        np.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], np.float32),
        (b, 3, 3),
    )
    means = np.stack(
        [rng.uniform(-1, 1, (b, g)), rng.uniform(-1, 1, (b, g)),
         rng.uniform(2, 6, (b, g))], -1,
    ).astype(np.float32)
    scales = rng.uniform(0.03, 0.12, (b, g, 3)).astype(np.float32)
    cov = np.zeros((b, g, 3, 3), np.float32)
    for i in range(3):
        cov[..., i, i] = scales[..., i] ** 2
    sh = (rng.normal(size=(b, g, 3, 9)) * 0.3).astype(np.float32)
    opac = rng.uniform(0.3, 0.9, (b, g)).astype(np.float32)
    near = np.ones((b,), np.float32)
    far = np.full((b,), 100.0, np.float32)
    bg = np.tile(np.array([[0.2, 0.1, 0.3]], np.float32), (b, 1))
    args = tuple(map(jnp.asarray, (extr, intr, near, far, bg, means, cov, sh, opac)))

    monkeypatch.setattr(pallas_raster, "_SCATTER_ACC_ROWS_FAST", g)  # group=1
    img_p = pallas_raster.render_pallas(*args[:4], (h, w), args[4], *args[5:])
    img_o = render_oracle(*args[:4], (h, w), args[4], *args[5:])
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_o), atol=5e-5)

    def loss(renderer, o):
        return jnp.sum(renderer(*args[:4], (h, w), args[4], args[5], args[6], args[7], o) ** 2)

    gp = jax.grad(lambda o: loss(pallas_raster.render_pallas, o))(args[8])
    go = jax.grad(lambda o: loss(render_oracle, o))(args[8])
    scale = np.abs(np.asarray(go)).max() + 1e-8
    np.testing.assert_allclose(
        np.asarray(gp) / scale, np.asarray(go) / scale, atol=5e-4
    )


def test_starved_instance_budget():
    """Regression: a budget far below the live instance count truncates runs
    so that many tiles end up empty with out-of-range insertion-point starts.
    The kernels must issue NO DMA windows for those tiles (a lead-only window
    reads/writes out of bounds and faults on real TPUs)."""
    args, (h, w) = random_scene(300)
    extr, intr, near, far, bg, means, cov, sh, opac = args

    img = pallas_raster.render_pallas(
        extr, intr, near, far, (h, w), bg, means, cov, sh, opac,
        instance_budget=64,
    )
    assert np.isfinite(np.asarray(img)).all()

    def loss(o):
        out = pallas_raster.render_pallas(
            extr, intr, near, far, (h, w), bg, means, cov, sh, o,
            instance_budget=64,
        )
        return jnp.sum(out**2)

    g = jax.grad(loss)(opac)
    assert np.isfinite(np.asarray(g)).all()


def test_pallas_matches_oracle_gradients():
    args, (h, w) = random_scene(120, seed=3)
    extr, intr, near, far, bg, means, cov, sh, opac = args

    weights = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, h, w, 3)).astype(np.float32)
    )

    def loss(renderer, m, c, s, o):
        img = renderer(extr, intr, near, far, (h, w), bg, m, c, s, o)
        return jnp.sum(img * weights)

    g_oracle = jax.grad(
        lambda *a: loss(render_oracle, *a), argnums=(0, 1, 2, 3)
    )(means, cov, sh, opac)
    g_pallas = jax.grad(
        lambda *a: loss(pallas_raster.render_pallas, *a), argnums=(0, 1, 2, 3)
    )(means, cov, sh, opac)

    for name, go, gp in zip(
        ["means", "cov", "sh", "opac"], g_oracle, g_pallas
    ):
        go, gp = np.asarray(go), np.asarray(gp)
        assert np.isfinite(gp).all(), name
        scale = np.abs(go).max() + 1e-8
        np.testing.assert_allclose(
            gp / scale, go / scale, atol=5e-4,
            err_msg=f"gradient mismatch: {name}",
        )


@pytest.mark.slow
def test_tile_size_is_output_invariant():
    """TILE_X/TILE_Y are pure perf knobs (camera.py): a 32x32-tile render
    must match the oracle exactly like the default 16x16 does. Subprocess:
    the tile constants bind at import."""
    import subprocess
    import sys
    import os

    code = (
        "import tests.test_pallas_raster as t\n"
        "from my_depthsplat_tpu.render import pallas_raster, render_oracle\n"
        "from my_depthsplat_tpu.render.camera import TILE_X, TILE_Y\n"
        "import numpy as np\n"
        "assert (TILE_X, TILE_Y) == (32, 32), (TILE_X, TILE_Y)\n"
        "pallas_raster.INTERPRET = True\n"
        "args, hw = t.random_scene(150)\n"
        "o = render_oracle(*args[:4], hw, args[4], *args[5:])\n"
        "p = pallas_raster.render_pallas(*args[:4], hw, args[4], *args[5:])\n"
        "np.testing.assert_allclose(np.asarray(p), np.asarray(o), atol=2e-5)\n"
        "print('tile32 parity OK')\n"
    )
    env = dict(os.environ, MDS_TILE="32", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-c", code],
        cwd=os.path.dirname(os.path.dirname(__file__)),
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "tile32 parity OK" in r.stdout


@pytest.mark.slow
def test_grouped_chain_matches_flat(monkeypatch):
    """The huge-G depth-grouped chained forward (build_tile_instances_grouped
    + chained _fwd_kernel state) reproduces the flat single-layout composite:
    groups partition the global depth order, so chaining (rgb, t_frozen,
    p_raw) across groups is the same per-pixel multiply sequence."""
    args, (h, w) = random_scene(600, seed=4)
    img_flat = pallas_raster.render_pallas(*args[:4], (h, w), args[4], *args[5:])

    monkeypatch.setattr(pallas_raster, "_CHAIN_MIN_G", 1)
    monkeypatch.setattr(pallas_raster, "_CHAIN_GROUP_SLOTS", 256)
    # this synthetic scene has many multi-tile gaussians, so give the upper
    # tiers full capacity (tier-cap overflow would legitimately drop lanes)
    img_g, aux = pallas_raster.render_pallas(
        *args[:4], (h, w), args[4], *args[5:], big_tile_cap=256,
        return_aux=True,
    )
    assert int(aux["num_dropped"]) == 0
    np.testing.assert_allclose(
        np.asarray(img_g), np.asarray(img_flat), atol=1e-6
    )

    # grouped backward: the reverse-order chained VJP must reproduce the
    # flat path's gradients (same math, re-chunked association order)
    weights = jnp.asarray(
        np.random.default_rng(1).normal(size=(1, h, w, 3)).astype(np.float32)
    )

    def loss(renderer, m, c, s, o):
        img = renderer(
            *args[:4], (h, w), args[4], m, c, s, o, big_tile_cap=256
        )
        return jnp.sum(img * weights)

    g_grouped = jax.grad(
        lambda *a: loss(pallas_raster.render_pallas, *a), argnums=(0, 1, 2, 3)
    )(*args[5:])
    monkeypatch.setattr(pallas_raster, "_CHAIN_MIN_G", 1 << 21)  # flat again
    g_flat = jax.grad(
        lambda *a: loss(pallas_raster.render_pallas, *a), argnums=(0, 1, 2, 3)
    )(*args[5:])
    for name, gf, gg in zip(
        ["means", "cov", "sh", "opac"], g_flat, g_grouped
    ):
        gf, gg = np.asarray(gf), np.asarray(gg)
        assert np.isfinite(gg).all(), name
        scale = np.abs(gf).max() + 1e-8
        np.testing.assert_allclose(
            gg / scale, gf / scale, atol=5e-5,
            err_msg=f"grouped-vs-flat gradient mismatch: {name}",
        )


@pytest.mark.slow
def test_grouped_chain_batched_views(monkeypatch):
    """The grouped chain's per-batch-element loop (b > 1): a 2-view batch
    through the grouped path matches the flat composite per view."""
    rng = np.random.default_rng(9)
    b, g, h, w = 2, 400, 32, 32
    extr = np.broadcast_to(np.eye(4, dtype=np.float32), (b, 4, 4)).copy()
    extr[:, 0, 3] = 0.1 * np.arange(b)
    intr = np.broadcast_to(
        np.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], np.float32),
        (b, 3, 3),
    )
    means = np.stack(
        [rng.uniform(-1, 1, (b, g)), rng.uniform(-1, 1, (b, g)),
         rng.uniform(2, 6, (b, g))], -1,
    ).astype(np.float32)
    scales = rng.uniform(0.02, 0.1, (b, g, 3)).astype(np.float32)
    cov = np.zeros((b, g, 3, 3), np.float32)
    for i in range(3):
        cov[..., i, i] = scales[..., i] ** 2
    sh = (rng.normal(size=(b, g, 3, 9)) * 0.3).astype(np.float32)
    opac = rng.uniform(0.3, 0.9, (b, g)).astype(np.float32)
    near = np.ones((b,), np.float32)
    far = np.full((b,), 100.0, np.float32)
    bg = np.tile(np.array([[0.2, 0.1, 0.3]], np.float32), (b, 1))
    args = tuple(map(jnp.asarray, (extr, intr, near, far, bg, means, cov, sh, opac)))

    img_flat = pallas_raster.render_pallas(*args[:4], (h, w), args[4], *args[5:])
    monkeypatch.setattr(pallas_raster, "_CHAIN_MIN_G", 1)
    monkeypatch.setattr(pallas_raster, "_CHAIN_GROUP_SLOTS", 128)
    img_g, aux = pallas_raster.render_pallas(
        *args[:4], (h, w), args[4], *args[5:], big_tile_cap=128,
        return_aux=True,
    )
    assert int(aux["num_dropped"]) == 0
    np.testing.assert_allclose(
        np.asarray(img_g), np.asarray(img_flat), atol=1e-6
    )
