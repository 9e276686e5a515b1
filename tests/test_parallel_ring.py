"""Ring-sharded cross-view attention vs the local gather path.

Runs on the virtual 8-device CPU mesh (tests/conftest.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from my_depthsplat_tpu.models.mv_transformer import (
    MultiViewFeatureTransformer,
    _full_attention,
    _window_attention,
)
from my_depthsplat_tpu.parallel.ring import ring_cross_view_attention


def _mesh(model=4):
    dev = np.asarray(jax.devices()[:8]).reshape(8 // model, model)
    return Mesh(dev, ("data", "model"))


def _qkv(b=2, v=8, h=8, w=8, c=16, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(b, v, h, w, c)).astype(np.float32))
    return mk(), mk(), mk()


def _reference_cross(q, k, v, splits, with_shift):
    """The local path: gather all-other-views kv, windowed attention."""
    nviews = q.shape[1]
    idx = jnp.asarray(
        np.stack([[j for j in range(nviews) if j != i] for i in range(nviews)])
        .astype(np.int32)
    )
    kv_k = k[:, idx]  # (B, V, V-1, H, W, C)
    kv_v = v[:, idx]
    if splits > 1:
        return _window_attention(q, kv_k, kv_v, splits, with_shift)
    return _full_attention(q, kv_k, kv_v)


@pytest.mark.parametrize(
    "splits,with_shift", [(1, False), (2, False), (2, True)]
)
def test_ring_matches_gather_path(splits, with_shift):
    mesh = _mesh(model=4)
    q, k, v = _qkv()
    want = _reference_cross(q, k, v, splits, with_shift)

    with jax.sharding.set_mesh(mesh):
        sh = NamedSharding(mesh, P(None, "model"))
        qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
        got = jax.jit(
            lambda a, b_, c_: ring_cross_view_attention(
                a, b_, c_, "model", splits=splits, with_shift=with_shift
            )
        )(qs, ks, vs)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_ring_grads_match():
    mesh = _mesh(model=4)
    q, k, v = _qkv(v=4, h=4, w=4, c=8, seed=1)

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(_reference_cross(q, k, v, 2, True)))

    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)

    with jax.sharding.set_mesh(mesh):
        sh = NamedSharding(mesh, P(None, "model"))
        qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))

        def loss_ring(q, k, v):
            return jnp.sum(
                jnp.sin(
                    ring_cross_view_attention(
                        q, k, v, "model", splits=2, with_shift=True
                    )
                )
            )

        got = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(qs, ks, vs)
    for g, w_ in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w_), rtol=5e-5, atol=5e-5
        )


def test_transformer_view_sharded_matches_local():
    mesh = _mesh(model=4)
    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 32)).astype(np.float32))

    local = MultiViewFeatureTransformer(num_layers=2, d_model=32)
    params = local.init(jax.random.key(0), feats, attn_splits=2)
    want = local.apply(params, feats, attn_splits=2)

    sharded = MultiViewFeatureTransformer(
        num_layers=2, d_model=32, view_shard_axis="model"
    )
    with jax.sharding.set_mesh(mesh):
        fs = jax.device_put(feats, NamedSharding(mesh, P(None, "model")))
        got = jax.jit(lambda p, f: sharded.apply(p, f, attn_splits=2))(
            params, fs
        )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=5e-5, atol=5e-5
    )


def test_ring_rejects_indivisible_views():
    mesh = _mesh(model=4)
    q, k, v = _qkv(v=6)
    with jax.sharding.set_mesh(mesh):
        with pytest.raises(ValueError, match="not divisible"):
            ring_cross_view_attention(q, k, v, "model")


def test_encoder_view_sharded_forward_matches_local(monkeypatch):
    """The pod-slice headline layout (context VIEW axis sharded over the
    mesh; PERF.md pod-slice projection): the full encoder forward under
    view sharding must match the unsharded forward — XLA partitions the
    per-view network and inserts the cross-view collectives (sweep source
    features, kNN, attention) without changing the math."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_models import tiny_vit

    from my_depthsplat_tpu.models import vit as vit_mod

    monkeypatch.setitem(vit_mod.VIT_CONFIGS, "vits", tiny_vit())
    monkeypatch.setitem(vit_mod.INTERMEDIATE_LAYER_IDX, "vits", [0, 1, 2, 3])

    from my_depthsplat_tpu.models import EncoderDepthSplat
    from my_depthsplat_tpu.models.encoder import EncoderDepthSplatCfg

    rng = np.random.default_rng(0)
    b, v, h, w = 1, 4, 32, 32
    extr = np.broadcast_to(np.eye(4, dtype=np.float32), (b, v, 4, 4)).copy()
    for i in range(v):
        extr[:, i, 0, 3] = 0.15 * i
    context = {
        "image": jnp.asarray(
            rng.uniform(0, 1, (b, v, h, w, 3)).astype(np.float32)
        ),
        "extrinsics": jnp.asarray(extr),
        "intrinsics": jnp.broadcast_to(
            jnp.asarray(
                [[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], jnp.float32
            ),
            (b, v, 3, 3),
        ),
        "near": jnp.full((b, v), 0.5, jnp.float32),
        "far": jnp.full((b, v), 100.0, jnp.float32),
    }
    cfg = EncoderDepthSplatCfg(
        num_scales=1, num_depth_candidates=16, costvolume_unet_feat_dim=16,
        gaussian_regressor_channels=16,
    )
    enc = EncoderDepthSplat(cfg)
    params = enc.init(jax.random.key(0), context, training=False)
    want = enc.apply(params, context, training=False)["gaussians"].means

    mesh = _mesh(model=4)
    with jax.sharding.set_mesh(mesh):
        ctx_s = {
            k: jax.device_put(x, NamedSharding(mesh, P(None, "model")))
            for k, x in context.items()
        }
        got = jax.jit(
            lambda p, c: enc.apply(p, c, training=False)["gaussians"].means
        )(params, ctx_s)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_encoder_views_x_depth_composed_sharding(monkeypatch):
    """The 8-chip pod-slice projection assumes a COMPOSED (views=4, depth=2)
    sharding (PERF.md pod-slice section). Execute exactly that layout on the
    8-device CPU mesh: context views sharded over a 4-way "view" axis AND
    plane-sweep depth hypotheses over a 2-way "depth" axis, full encoder
    forward vs the unsharded reference."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_models import tiny_vit

    from my_depthsplat_tpu.models import vit as vit_mod

    monkeypatch.setitem(vit_mod.VIT_CONFIGS, "vits", tiny_vit())
    monkeypatch.setitem(vit_mod.INTERMEDIATE_LAYER_IDX, "vits", [0, 1, 2, 3])

    from my_depthsplat_tpu.models import EncoderDepthSplat
    from my_depthsplat_tpu.models.encoder import EncoderDepthSplatCfg

    rng = np.random.default_rng(3)
    b, v, h, w = 1, 4, 32, 32
    extr = np.broadcast_to(np.eye(4, dtype=np.float32), (b, v, 4, 4)).copy()
    for i in range(v):
        extr[:, i, 0, 3] = 0.15 * i
    context = {
        "image": jnp.asarray(
            rng.uniform(0, 1, (b, v, h, w, 3)).astype(np.float32)
        ),
        "extrinsics": jnp.asarray(extr),
        "intrinsics": jnp.broadcast_to(
            jnp.asarray(
                [[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], jnp.float32
            ),
            (b, v, 3, 3),
        ),
        "near": jnp.full((b, v), 0.5, jnp.float32),
        "far": jnp.full((b, v), 100.0, jnp.float32),
    }
    base_cfg = EncoderDepthSplatCfg(
        num_scales=1, num_depth_candidates=16, costvolume_unet_feat_dim=16,
        gaussian_regressor_channels=16,
    )
    enc = EncoderDepthSplat(base_cfg)
    params = enc.init(jax.random.key(0), context, training=False)
    want = enc.apply(params, context, training=False)["gaussians"].means

    from dataclasses import replace

    sharded_cfg = replace(
        base_cfg, spmd_view_axis="view", spmd_depth_axis="depth"
    )
    enc_s = EncoderDepthSplat(sharded_cfg)
    dev = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(dev, ("view", "depth"))
    with jax.sharding.set_mesh(mesh):
        ctx_s = {
            k: jax.device_put(x, NamedSharding(mesh, P(None, "view")))
            for k, x in context.items()
        }
        got = jax.jit(
            lambda p, c: enc_s.apply(p, c, training=False)["gaussians"].means
        )(params, ctx_s)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_depth_sharded_render_matches_grouped(monkeypatch):
    """render_pallas_depth_sharded: depth groups sharded over a 4-way mesh
    axis, partial (rgb, T) images composed in rank order — must match the
    single-chip grouped render (groups partition depth order; compositing
    over disjoint depth ranges is an ordered associative fold)."""
    from my_depthsplat_tpu.render import pallas_raster
    from my_depthsplat_tpu.render.sharded import render_pallas_depth_sharded

    pallas_raster.INTERPRET = True
    try:
        import tests.test_pallas_raster  # noqa: F401
    except ImportError:
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
    from test_pallas_raster import random_scene

    args, (h, w) = random_scene(600, seed=12)
    monkeypatch.setattr(pallas_raster, "_CHAIN_MIN_G", 1)
    monkeypatch.setattr(pallas_raster, "_CHAIN_GROUP_SLOTS", 128)
    try:
        want = pallas_raster.render_pallas(
            *args[:4], (h, w), args[4], *args[5:], big_tile_cap=128
        )
        mesh = _mesh(model=4)
        with jax.sharding.set_mesh(mesh):
            got = jax.jit(
                lambda m, c, s, o: render_pallas_depth_sharded(
                    "model", *args[:4], (h, w), args[4], m, c, s, o,
                    big_tile_cap=128, group_slots=128,
                )
            )(*args[5:])
        # tolerance: per-chip sticky termination sees only its own range's
        # transmittance, so deep stacks crossing a chip boundary keep a few
        # contributions the sequential walk cut at eps=1e-4 — measured here
        # as 4/4608 pixels off by <= 5.5e-4 (each surviving contribution is
        # <= eps-transmittance-weighted; a handful can stack)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-3
        )

        # forward-only: a clear error instead of silently wrong gradients
        with jax.sharding.set_mesh(mesh):
            with pytest.raises(NotImplementedError, match="forward-only"):
                jax.grad(
                    lambda o: jnp.sum(
                        render_pallas_depth_sharded(
                            "model", *args[:4], (h, w), args[4],
                            args[5], args[6], args[7], o,
                            big_tile_cap=128, group_slots=128,
                        )
                    )
                )(args[8])
    finally:
        pallas_raster.INTERPRET = False
