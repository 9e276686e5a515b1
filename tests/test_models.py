"""Model-stack tests: shapes, init behavior, and end-to-end encoder->decoder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from my_depthsplat_tpu.gaussians import GaussianAdapterCfg
from my_depthsplat_tpu.models import (
    CNNEncoder,
    DecoderSplattingCfg,
    EncoderDepthSplat,
    EncoderDepthSplatCfg,
    MultiViewFeatureTransformer,
    MultiViewUniMatch,
    UNetModel,
    decode_splatting,
    knn_view_indices,
)
from my_depthsplat_tpu.models.vit import DinoViT, ViTConfig


def make_context(b=1, v=2, h=32, w=32, seed=0, with_prompt=False):
    rng = np.random.default_rng(seed)
    extr = np.broadcast_to(np.eye(4, dtype=np.float32), (b, v, 4, 4)).copy()
    for i in range(v):
        extr[:, i, 0, 3] = 0.2 * i  # cameras along x
    intr = np.broadcast_to(
        np.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], np.float32),
        (b, v, 3, 3),
    )
    ctx = {
        "image": jnp.asarray(rng.uniform(0, 1, (b, v, h, w, 3)), jnp.float32),
        "intrinsics": jnp.asarray(intr),
        "extrinsics": jnp.asarray(extr),
        "near": jnp.full((b, v), 0.5, jnp.float32),
        "far": jnp.full((b, v), 100.0, jnp.float32),
    }
    if with_prompt:
        ctx["depth"] = jnp.asarray(
            rng.uniform(1, 5, (b, v, h // 4, w // 4)), jnp.float32
        )
    return ctx


def tiny_vit():
    return ViTConfig(embed_dim=64, depth=4, num_heads=2, base_img_size=56)


@pytest.fixture(autouse=True)
def _patch_tiny_vit(monkeypatch):
    """Swap the vits config for a tiny one so tests stay fast."""
    from my_depthsplat_tpu.models import vit as vit_mod

    monkeypatch.setitem(vit_mod.VIT_CONFIGS, "vits", tiny_vit())
    monkeypatch.setitem(vit_mod.INTERMEDIATE_LAYER_IDX, "vits", [0, 1, 2, 3])


def test_cnn_encoder_scales():
    x = jnp.zeros((2, 32, 48, 3))
    model = CNNEncoder(output_dim=128, lowest_scale=8)
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert [f.shape for f in out] == [
        (2, 16, 24, 64),
        (2, 8, 12, 96),
        (2, 4, 6, 128),
    ]
    model4 = CNNEncoder(output_dim=128, lowest_scale=4)
    out4 = model4.apply(model4.init(jax.random.key(0), x), x)
    assert [f.shape for f in out4] == [
        (2, 16, 24, 64),
        (2, 16, 24, 96),
        (2, 8, 12, 128),
    ]


def test_mv_transformer_shapes_and_knn():
    b, v, h, w, c = 1, 4, 8, 8, 32
    x = jnp.asarray(np.random.default_rng(0).normal(size=(b, v, h, w, c)), jnp.float32)
    model = MultiViewFeatureTransformer(num_layers=2, d_model=c)
    params = model.init(jax.random.key(0), x, attn_splits=2)
    out = model.apply(params, x, attn_splits=2)
    assert out.shape == x.shape
    # kNN subset path
    extr = np.broadcast_to(np.eye(4, dtype=np.float32), (b, v, 4, 4)).copy()
    extr[:, :, 0, 3] = np.arange(v)
    idx = knn_view_indices(jnp.asarray(extr), 2)
    assert idx.shape == (b, v, 3)
    assert np.all(np.asarray(idx[:, :, 0]) == np.arange(v))  # self first
    out2 = model.apply(params, x, attn_splits=2, nn_idx=idx)
    assert out2.shape == x.shape


def test_unet_cross_view():
    b, v, h, w, c = 1, 2, 16, 16, 32
    x = jnp.asarray(np.random.default_rng(1).normal(size=(b, v, h, w, c)), jnp.float32)
    model = UNetModel(model_channels=32, out_channels=32)
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.shape == (b, v, h, w, 32)
    # zero-init output conv: UNet output starts at zero
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_unet_cross_attn_condition():
    """External-conditioning path (reference cross_attention.py /
    unet.py:797-803): token cross-attention and concat-conv variants."""
    rng = np.random.default_rng(2)
    b, v, h, w, c = 1, 2, 16, 16, 32
    x = jnp.asarray(rng.normal(size=(b, v, h, w, c)), jnp.float32)

    ctx_tokens = jnp.asarray(rng.normal(size=(b, v, 12, 24)), jnp.float32)
    model = UNetModel(
        model_channels=32, out_channels=32, cross_attn_condition=True
    )
    params = model.init(jax.random.key(0), x, ctx_tokens)
    out = model.apply(params, x, ctx_tokens)
    assert out.shape == (b, v, h, w, 32)
    assert np.isfinite(np.asarray(out)).all()

    ctx_map = jnp.asarray(rng.normal(size=(b, v, 8, 8, 24)), jnp.float32)
    model_cat = UNetModel(
        model_channels=32, out_channels=32,
        cross_attn_condition=True, concat_condition=True,
    )
    params_cat = model_cat.init(jax.random.key(0), x, ctx_map)
    out_cat = model_cat.apply(params_cat, x, ctx_map)
    assert out_cat.shape == (b, v, h, w, 32)
    assert np.isfinite(np.asarray(out_cat)).all()

    # the attention math matches a direct numpy computation
    from my_depthsplat_tpu.models.ldm_unet import ConditionCrossAttentionBlock

    blk = ConditionCrossAttentionBlock(dim=8, num_heads=2)
    xb = jnp.asarray(rng.normal(size=(1, 1, 2, 2, 6)), jnp.float32)
    cb = jnp.asarray(rng.normal(size=(1, 1, 3, 5)), jnp.float32)
    p = blk.init(jax.random.key(1), xb, cb)
    got = np.asarray(blk.apply(p, xb, cb))[0, 0].reshape(4, 6)
    wq = np.asarray(p["params"]["q"]["kernel"])
    wkv = np.asarray(p["params"]["kv"]["kernel"])
    wp = np.asarray(p["params"]["proj"]["kernel"])
    tok = np.asarray(xb)[0, 0].reshape(4, 6)
    cond = np.asarray(cb)[0, 0]
    q = (tok @ wq).reshape(4, 2, 4)
    kv = (cond @ wkv).reshape(3, 2, 2, 4)
    k, vv = kv[:, 0], kv[:, 1]
    outs = np.zeros((4, 2, 4), np.float32)
    for hd in range(2):
        s = q[:, hd] @ k[:, hd].T / np.sqrt(4.0)
        a = np.exp(s - s.max(-1, keepdims=True))
        a /= a.sum(-1, keepdims=True)
        outs[:, hd] = a @ vv[:, hd]
    want = tok + outs.reshape(4, 8) @ wp
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_vit_intermediate_layers_and_pos_interp():
    cfg = tiny_vit()
    x = jnp.zeros((2, 28, 42, 3))  # non-square, != base -> pos interp path
    model = DinoViT(cfg)
    params = model.init(jax.random.key(0), x, [1, 3])
    outs = model.apply(params, x, [1, 3])
    assert len(outs) == 2
    patches, cls = outs[0]
    assert patches.shape == (2, (28 // 14) * (42 // 14), cfg.embed_dim)
    assert cls.shape == (2, cfg.embed_dim)


@pytest.mark.parametrize("branch", ["unimatch", "promptda"])
@pytest.mark.slow
def test_encoder_end_to_end(branch):
    cfg = EncoderDepthSplatCfg(
        depth_branch=branch,
        gaussian_adapter=GaussianAdapterCfg(1e-10, 3.0, 2),
        num_scales=1,
        upsample_factor=4,
        lowest_feature_resolution=4,
        num_depth_candidates=32,
        costvolume_unet_feat_dim=32,
        monodepth_vit_type="vits",
    )
    ctx = make_context(b=1, v=2, h=32, w=32, with_prompt=(branch == "promptda"))
    model = EncoderDepthSplat(cfg)
    params = model.init(jax.random.key(0), ctx, training=False)
    out = model.apply(params, ctx, training=False)

    g = out["gaussians"]
    n_g = 2 * 32 * 32  # v * h * w * srf * spp
    assert g.means.shape == (1, n_g, 3)
    assert g.covariances.shape == (1, n_g, 3, 3)
    assert g.harmonics.shape == (1, n_g, 3, 9)
    assert g.opacities.shape == (1, n_g)
    assert out["depths"].shape == (1, 2, 32, 32)
    assert np.isfinite(np.asarray(g.means)).all()

    # render the gaussians into a target view
    dec = decode_splatting(
        DecoderSplattingCfg(),
        g,
        ctx["extrinsics"][:, :1],
        ctx["intrinsics"][:, :1],
        ctx["near"][:, :1],
        ctx["far"][:, :1],
        (32, 32),
        depth_mode="depth",
    )
    assert dec.color.shape == (1, 1, 32, 32, 3)
    assert dec.depth.shape == (1, 1, 32, 32)
    assert np.isfinite(np.asarray(dec.color)).all()


@pytest.mark.slow
def test_encoder_multiscale_intermediate_supervision():
    cfg = EncoderDepthSplatCfg(
        depth_branch="unimatch",
        num_scales=2,
        upsample_factor=2,
        lowest_feature_resolution=4,
        num_depth_candidates=32,
        costvolume_unet_feat_dim=32,
        monodepth_vit_type="vits",
        supervise_intermediate_depth=True,
    )
    ctx = make_context(b=1, v=2, h=32, w=32)
    model = EncoderDepthSplat(cfg)
    params = model.init(jax.random.key(0), ctx, training=True)
    out = model.apply(params, ctx, training=True)
    # 2 scales -> 2 depth preds -> batch doubled for intermediate supervision
    assert out["depths"].shape == (2, 2, 32, 32)
    assert out["gaussians"].means.shape[0] == 2


def test_plane_sweep_depth_chunking_exact():
    """The lax.scan depth-chunked cost volume (big-scene memory path)
    matches the unchunked sweep (bit-exact on TPU; the CPU backend
    reassociates the correlation einsum slightly differently)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from my_depthsplat_tpu.models.unimatch import MultiViewUniMatch

    rng = np.random.default_rng(0)
    b, v, h, w = 1, 3, 32, 48
    imgs = jnp.asarray(rng.uniform(0, 1, (b, v, h, w, 3)).astype(np.float32))
    intr = np.broadcast_to(
        np.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], np.float32),
        (b, v, 3, 3),
    ).copy()
    extr = np.broadcast_to(np.eye(4, dtype=np.float32), (b, v, 4, 4)).copy()
    for i in range(v):
        extr[:, i, 0, 3] = 0.1 * i
    mind = jnp.full((b, v), 1 / 50.0)
    maxd = jnp.full((b, v), 1 / 0.5)

    def run(max_bytes):
        m = MultiViewUniMatch(
            num_scales=1,
            upsample_factor=4,
            lowest_feature_resolution=4,
            num_depth_candidates=32,
            vit_type="vits",
            unet_channels=32,
            plane_sweep_max_bytes=max_bytes,
        )
        params = m.init(
            jax.random.key(0), imgs, jnp.asarray(intr), jnp.asarray(extr),
            mind, maxd,
        )
        out = m.apply(
            params, imgs, jnp.asarray(intr), jnp.asarray(extr), mind, maxd
        )
        return out["depth_preds"][-1]

    np.testing.assert_allclose(
        np.asarray(run(2 * 1024**3)), np.asarray(run(1)),
        rtol=1e-4, atol=1e-5,
    )


def test_plane_sweep_pair_scan_exact():
    """The per-pair sweep scan (cache-resident gather tables) matches the
    flat all-pairs sweep — pairs are independent, so the math is identical."""
    from my_depthsplat_tpu.models.unimatch import MultiViewUniMatch

    rng = np.random.default_rng(1)
    b, v, h, w = 1, 3, 32, 64
    imgs = jnp.asarray(rng.uniform(0, 1, (b, v, h, w, 3)).astype(np.float32))
    intr = np.broadcast_to(
        np.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], np.float32),
        (b, v, 3, 3),
    ).copy()
    extr = np.broadcast_to(np.eye(4, dtype=np.float32), (b, v, 4, 4)).copy()
    for i in range(v):
        extr[:, i, 0, 3] = 0.1 * i
    mind = jnp.full((b, v), 1 / 50.0)
    maxd = jnp.full((b, v), 1 / 0.5)

    def run(cache_bytes):
        m = MultiViewUniMatch(
            num_scales=1,
            upsample_factor=4,
            lowest_feature_resolution=4,
            num_depth_candidates=32,
            vit_type="vits",
            unet_channels=32,
            sweep_table_cache_bytes=cache_bytes,
        )
        params = m.init(
            jax.random.key(0), imgs, jnp.asarray(intr), jnp.asarray(extr),
            mind, maxd,
        )
        out = m.apply(
            params, imgs, jnp.asarray(intr), jnp.asarray(extr), mind, maxd
        )
        return out["depth_preds"][-1]

    np.testing.assert_allclose(
        np.asarray(run(8 * 1024**2)),  # flat path (table under the cap)
        np.asarray(run(1)),  # pair-scan path (cap of 1 byte forces it)
        rtol=1e-4, atol=1e-5,
    )


@pytest.mark.slow
def test_encoder_bf16_compute_parity():
    """encoder.compute_dtype=bfloat16 (the drivers' precision policy) stays
    within tolerance of the f32 reference path: depth within ~2% relative,
    gaussian means finite and close. Pins VERDICT weak #5's requirement that
    the precision lever is a config switch with a tested tolerance."""
    from my_depthsplat_tpu.models.precision import apply_with_precision

    cfg = EncoderDepthSplatCfg(
        depth_branch="unimatch",
        gaussian_adapter=GaussianAdapterCfg(1e-10, 3.0, 2),
        num_scales=1,
        upsample_factor=4,
        lowest_feature_resolution=4,
        num_depth_candidates=32,
        costvolume_unet_feat_dim=32,
        monodepth_vit_type="vits",
    )
    ctx = make_context(b=1, v=2, h=32, w=32)
    model = EncoderDepthSplat(cfg)
    params = model.init(jax.random.key(0), ctx, training=False)
    ref = model.apply(params, ctx, training=False)
    out = apply_with_precision(model.apply, "bfloat16", params, ctx,
                               training=False)

    d_ref = np.asarray(ref["depths"])
    d_bf = np.asarray(out["depths"])
    assert d_bf.dtype == np.float32  # outputs cast back to f32
    rel = np.abs(d_bf - d_ref) / (np.abs(d_ref) + 1e-6)
    assert float(np.median(rel)) < 0.02, float(np.median(rel))
    m_ref = np.asarray(ref["gaussians"].means)
    m_bf = np.asarray(out["gaussians"].means)
    assert np.isfinite(m_bf).all()
    scale = np.abs(m_ref).max()
    assert float(np.median(np.abs(m_bf - m_ref))) / scale < 0.02


def test_plane_sweep_window_mode_parity():
    """sweep_mode="window" (per-pixel window correlations on refinement
    scales) matches the reference-exact tap-gather sweep when the band's
    taps fit the window, and reports zero overflow."""
    from my_depthsplat_tpu.models.unimatch import MultiViewUniMatch

    rng = np.random.default_rng(2)
    b, v, h, w = 1, 2, 32, 48
    imgs = jnp.asarray(rng.uniform(0, 1, (b, v, h, w, 3)).astype(np.float32))
    intr = np.broadcast_to(
        np.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], np.float32),
        (b, v, 3, 3),
    ).copy()
    extr = np.broadcast_to(np.eye(4, dtype=np.float32), (b, v, 4, 4)).copy()
    for i in range(v):
        extr[:, i, 0, 3] = 0.1 * i
    mind = jnp.full((b, v), 1 / 50.0)
    maxd = jnp.full((b, v), 1 / 2.0)

    def run(mode):
        m = MultiViewUniMatch(
            num_scales=2,
            upsample_factor=2,
            lowest_feature_resolution=4,
            num_depth_candidates=32,
            vit_type="vits",
            unet_channels=32,
            sweep_mode=mode,
            sweep_window=8,
        )
        params = m.init(
            jax.random.key(0), imgs, jnp.asarray(intr), jnp.asarray(extr),
            mind, maxd,
        )
        return m.apply(
            params, imgs, jnp.asarray(intr), jnp.asarray(extr), mind, maxd
        )

    ref = run("gather")
    win = run("window")
    assert int(win["sweep_window_overflow"]) == 0
    np.testing.assert_allclose(
        np.asarray(win["depth_preds"][-1]),
        np.asarray(ref["depth_preds"][-1]),
        rtol=1e-4, atol=1e-5,
    )
