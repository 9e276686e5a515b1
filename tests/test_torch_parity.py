"""Architecture-parity tests against the reference's torch modules.

The reference repo (read-only, mounted at /root/reference) is imported as a
TEST ORACLE only: its modules are built with random weights, the weights are
converted through convert/, and forward outputs are compared. This pins the
flax re-designs to the reference architectures without any pretrained
checkpoints. Skipped when the reference tree is absent.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference tree not mounted"
)

import jax
import jax.numpy as jnp
import torch


@pytest.fixture(scope="module")
def dinov2_torch():
    sys.path.insert(0, str(REFERENCE / "torchhub/facebookresearch_dinov2_main"))
    import vision_transformer as vits  # noqa: E402

    torch.manual_seed(0)
    model = vits.vit_small(
        patch_size=14, img_size=518, init_values=1.0, block_chunks=0
    )
    model.eval()
    return model


def test_dinov2_vit_parity(dinov2_torch):
    """Random-weight DINOv2 vit-s: torch get_intermediate_layers vs our flax
    ViT with converted weights."""
    from my_depthsplat_tpu.convert import convert_dino_vit
    from my_depthsplat_tpu.models.vit import DinoViT, VIT_CONFIGS

    model = dinov2_torch
    rng = np.random.default_rng(0)
    # 28x42 -> exercises the pos-embed interpolation path too
    x = rng.normal(size=(2, 3, 28, 42)).astype(np.float32)
    layer_idx = [2, 5, 8, 11]

    with torch.no_grad():
        ref_outs = model.get_intermediate_layers(
            torch.from_numpy(x), layer_idx, return_class_token=True
        )

    params = convert_dino_vit(model.state_dict(), depth=12)
    params = jax.tree.map(jnp.asarray, params)
    ours = DinoViT(VIT_CONFIGS["vits"]).apply(
        params, jnp.asarray(np.moveaxis(x, 1, -1)), layer_idx
    )

    for (ref_patches, ref_cls), (our_patches, our_cls) in zip(ref_outs, ours):
        ref_p = ref_patches.numpy()
        scale = np.abs(ref_p).max()
        np.testing.assert_allclose(
            np.asarray(our_patches) / scale, ref_p / scale, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(our_cls) / scale, ref_cls.numpy() / scale, atol=2e-5
        )


def test_cnn_backbone_parity():
    """Reference CNNEncoder vs our flax CNNEncoder with converted weights."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_backbone",
        REFERENCE / "src/model/encoder/unimatch/backbone.py",
    )
    ref_backbone = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_backbone)
    TorchCNN = ref_backbone.CNNEncoder

    from my_depthsplat_tpu.convert.torch_weights import convert_conv
    from my_depthsplat_tpu.models.backbone import CNNEncoder

    torch.manual_seed(1)
    tm = TorchCNN(
        output_dim=128, num_output_scales=1, lowest_scale=8,
        return_all_scales=True,
    )
    tm.eval()
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 3, 32, 48)).astype(np.float32)
    with torch.no_grad():
        ref = [t.numpy() for t in tm(torch.from_numpy(x))]

    model = CNNEncoder(output_dim=128, lowest_scale=8)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 48, 3)))

    # Build the converted tree by walking both module structures.
    sd = tm.state_dict()

    def wrap(leaves):  # our Conv module wraps an inner nn.Conv (Conv_0)
        return {"Conv_0": leaves}

    def res_block(prefix):
        out = {
            "Conv_0": wrap(convert_conv(sd[f"{prefix}.conv1.weight"])),
            "Conv_1": wrap(convert_conv(sd[f"{prefix}.conv2.weight"])),
        }
        if f"{prefix}.downsample.0.weight" in sd:
            out["Conv_2"] = wrap(
                convert_conv(
                    sd[f"{prefix}.downsample.0.weight"],
                    sd[f"{prefix}.downsample.0.bias"],
                )
            )
        return out

    params = {
        "Conv_0": wrap(convert_conv(sd["conv1.weight"])),
        "ResidualBlock_0": res_block("layer1.0"),
        "ResidualBlock_1": res_block("layer1.1"),
        "ResidualBlock_2": res_block("layer2.0"),
        "ResidualBlock_3": res_block("layer2.1"),
        "ResidualBlock_4": res_block("layer3.0"),
        "ResidualBlock_5": res_block("layer3.1"),
        "Conv_1": wrap(convert_conv(sd["conv2.weight"], sd["conv2.bias"])),
    }
    params = jax.tree.map(jnp.asarray, {"params": params})
    # sanity: same tree structure
    assert (
        jax.tree.map(lambda a: a.shape, params)
        == jax.tree.map(lambda a: a.shape, variables)
    )

    ours = model.apply(params, jnp.asarray(np.moveaxis(x, 1, -1)))
    assert len(ours) == len(ref)
    for our, r in zip(ours, ref):
        r_nhwc = np.moveaxis(r, 1, -1)
        scale = np.abs(r_nhwc).max() + 1e-8
        np.testing.assert_allclose(
            np.asarray(our) / scale, r_nhwc / scale, atol=5e-5
        )


@pytest.fixture(scope="module")
def ref_unimatch_pkg():
    """Import the reference unimatch dir as a package (relative imports)."""
    import importlib
    import types

    if "refum" not in sys.modules:
        pkg = types.ModuleType("refum")
        pkg.__path__ = [str(REFERENCE / "src/model/encoder/unimatch")]
        sys.modules["refum"] = pkg
    return importlib.import_module


def test_mv_transformer_parity(ref_unimatch_pkg):
    """Reference MultiViewFeatureTransformer vs ours with converted weights,
    including shifted-window layers and 3-view cross attention."""
    mvt = ref_unimatch_pkg("refum.mv_transformer")

    from my_depthsplat_tpu.convert.torch_weights import convert_linear
    from my_depthsplat_tpu.models.mv_transformer import MultiViewFeatureTransformer

    torch.manual_seed(3)
    c, layers = 32, 2
    tm = mvt.MultiViewFeatureTransformer(
        num_layers=layers, d_model=c, nhead=1, ffn_dim_expansion=4
    )
    tm.eval()

    b, v, h, w = 2, 3, 8, 8
    rng = np.random.default_rng(4)
    x = rng.normal(size=(b, v, c, h, w)).astype(np.float32)
    with torch.no_grad():
        ref = tm(
            [torch.from_numpy(x[:, i]) for i in range(v)], attn_num_splits=2
        )
    ref = np.stack([r.numpy() for r in ref], axis=1)  # (B, V, C, H, W)

    sd = tm.state_dict()

    def dense(name):  # our Dense wrapper nests an inner nn.Dense
        return {"Dense_0": convert_linear(sd[name])}

    def attn_layer(prefix, with_ffn):
        out = {
            "q_proj": dense(f"{prefix}.q_proj.weight"),
            "k_proj": dense(f"{prefix}.k_proj.weight"),
            "v_proj": dense(f"{prefix}.v_proj.weight"),
            "merge": dense(f"{prefix}.merge.weight"),
            "norm1": {
                "scale": sd[f"{prefix}.norm1.weight"].numpy(),
                "bias": sd[f"{prefix}.norm1.bias"].numpy(),
            },
        }
        if with_ffn:
            out["mlp_0"] = dense(f"{prefix}.mlp.0.weight")
            out["mlp_1"] = dense(f"{prefix}.mlp.2.weight")
            out["norm2"] = {
                "scale": sd[f"{prefix}.norm2.weight"].numpy(),
                "bias": sd[f"{prefix}.norm2.bias"].numpy(),
            }
        return out

    params = {
        f"layer_{i}": {
            "self_attn": attn_layer(f"layers.{i}.self_attn", False),
            "cross_attn_ffn": attn_layer(f"layers.{i}.cross_attn_ffn", True),
        }
        for i in range(layers)
    }
    params = jax.tree.map(jnp.asarray, {"params": params})

    model = MultiViewFeatureTransformer(num_layers=layers, d_model=c)
    variables = model.init(
        jax.random.key(0), jnp.zeros((b, v, h, w, c)), attn_splits=2
    )
    assert (
        jax.tree.map(lambda a: a.shape, params)
        == jax.tree.map(lambda a: a.shape, variables)
    )

    ours = model.apply(
        params, jnp.asarray(np.moveaxis(x, 2, -1)), attn_splits=2
    )
    ref_nhwc = np.moveaxis(ref, 2, -1)
    scale = np.abs(ref_nhwc).max()
    np.testing.assert_allclose(
        np.asarray(ours) / scale, ref_nhwc / scale, atol=5e-5
    )


def test_ldm_unet_parity(ref_unimatch_pkg):
    """Reference LDM UNetModel (cross-view self-attn config) vs ours."""
    unet_mod = ref_unimatch_pkg("refum.ldm_unet.unet")

    from my_depthsplat_tpu.convert.torch_weights import convert_ldm_unet
    from my_depthsplat_tpu.models.ldm_unet import UNetModel

    torch.manual_seed(5)
    c = 32
    tm = unet_mod.UNetModel(
        image_size=None,
        in_channels=c,
        model_channels=c,
        out_channels=c,
        num_res_blocks=1,
        attention_resolutions=[4],
        channel_mult=[1, 1, 1],
        num_head_channels=32,
        dims=2,
        postnorm=False,
        num_frames=2,
        use_cross_view_self_attn=True,
    )
    tm.eval()

    b, v, h, w = 1, 2, 16, 16
    rng = np.random.default_rng(6)
    x = rng.normal(size=(b * v, c, h, w)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    params = convert_ldm_unet(tm.state_dict())
    params = jax.tree.map(jnp.asarray, params)
    model = UNetModel(model_channels=c, out_channels=c)
    variables = model.init(jax.random.key(0), jnp.zeros((b, v, h, w, c)))
    assert (
        jax.tree.map(lambda a: a.shape, params)
        == jax.tree.map(lambda a: a.shape, variables)
    )

    x_nhwc = np.moveaxis(x.reshape(b, v, c, h, w), 2, -1)
    ours = model.apply(params, jnp.asarray(x_nhwc))
    ref_nhwc = np.moveaxis(ref.reshape(b, v, c, h, w), 2, -1)
    scale = np.abs(ref_nhwc).max() + 1e-8
    np.testing.assert_allclose(
        np.asarray(ours) / scale, ref_nhwc / scale, atol=5e-5
    )


def test_dpt_upsampler_parity(ref_unimatch_pkg):
    """Reference DPT upsampler head (df=4, ns=1 small config) vs ours."""
    dpt_mod = ref_unimatch_pkg("refum.dpt_head")

    from my_depthsplat_tpu.convert.torch_weights import convert_dpt_upsampler
    from my_depthsplat_tpu.models.dpt import DPTUpsamplerHead

    torch.manual_seed(7)
    tm = dpt_mod.DPTHead(
        in_channels=384,
        features=32,
        out_channels=[48, 96, 192, 384],
        downsample_factor=4,
        num_scales=1,
    )
    tm.eval()
    # the reference zero-inits the residual-depth head (dpt_head.py:442-444),
    # which would make this comparison trivially 0 == 0 — randomize it
    with torch.no_grad():
        tm.scratch.output_conv[-1].weight.normal_(0, 0.1)
        tm.scratch.output_conv[-1].bias.normal_(0, 0.1)

    bv, h8, w8 = 2, 8, 8  # full res 32x32 at df=4 -> vit at 1/8
    rng = np.random.default_rng(8)
    vit = [rng.normal(size=(bv, 384, h8, w8)).astype(np.float32) for _ in range(4)]
    cnn = [
        rng.normal(size=(bv, 64, h8 * 4, w8 * 4)).astype(np.float32),   # 1/2
        rng.normal(size=(bv, 96, h8 * 4, w8 * 4)).astype(np.float32),   # 1/2
        rng.normal(size=(bv, 128, h8 * 2, w8 * 2)).astype(np.float32),  # 1/4
    ]
    mv = rng.normal(size=(bv, 128, h8 * 2, w8 * 2)).astype(np.float32)
    depth = rng.normal(size=(bv, 1, h8 * 2, w8 * 2)).astype(np.float32)

    with torch.no_grad():
        ref = tm(
            [torch.from_numpy(v) for v in vit],
            cnn_features=[torch.from_numpy(cc) for cc in cnn],
            mv_features=torch.from_numpy(mv),
            depth=torch.from_numpy(depth),
        ).numpy()

    params = jax.tree.map(jnp.asarray, convert_dpt_upsampler(tm.state_dict()))
    model = DPTUpsamplerHead(
        out_channels=(48, 96, 192, 384), features=32,
        downsample_factor=4, num_scales=1,
    )

    def nhwc(t):
        return jnp.asarray(np.moveaxis(t, 1, -1))

    variables = model.init(
        jax.random.key(0),
        [nhwc(v) for v in vit], [nhwc(cc) for cc in cnn], nhwc(mv), nhwc(depth),
    )
    assert (
        jax.tree.map(lambda a: a.shape, params)
        == jax.tree.map(lambda a: a.shape, variables)
    )

    ours = model.apply(
        params,
        [nhwc(v) for v in vit], [nhwc(cc) for cc in cnn], nhwc(mv), nhwc(depth),
    )
    ref_nhwc = np.moveaxis(ref, 1, -1)
    scale = np.abs(ref_nhwc).max() + 1e-8
    np.testing.assert_allclose(
        np.asarray(ours) / scale, ref_nhwc / scale, atol=5e-5
    )


def test_mv_unimatch_full_parity(ref_unimatch_pkg, monkeypatch):
    """THE capstone: full reference MultiViewUniMatch vs ours with converted
    weights — cost volumes, candidate logic, cross-view UNet, DPT upsampler."""
    sys.path.insert(0, str(REFERENCE / "torchhub/facebookresearch_dinov2_main"))
    import vision_transformer as vits

    def fake_hub_load(*a, **k):
        torch.manual_seed(11)
        m = vits.vit_small(
            patch_size=14, img_size=518, init_values=1.0, block_chunks=0
        )
        m.mask_token = torch.nn.Parameter(torch.zeros(1, 384))
        return m

    monkeypatch.setattr(torch.hub, "load", fake_hub_load)
    um = ref_unimatch_pkg("refum.mv_unimatch")

    from my_depthsplat_tpu.convert.torch_weights import convert_mv_unimatch
    from my_depthsplat_tpu.models.unimatch import MultiViewUniMatch

    torch.manual_seed(12)
    tm = um.MultiViewUniMatch(
        num_scales=1,
        feature_channels=128,
        upsample_factor=4,
        lowest_feature_resolution=4,
        num_depth_candidates=32,
        vit_type="vits",
        unet_channels=32,
        unet_channel_mult=[1, 1, 1],
        unet_num_res_blocks=1,
        unet_attn_resolutions=[4],
    )
    tm.eval()
    with torch.no_grad():  # un-zero the residual head so the DPT path matters
        tm.upsampler.scratch.output_conv[-1].weight.normal_(0, 0.05)
        tm.upsampler.scratch.output_conv[-1].bias.normal_(0, 0.05)

    b, v, h, w = 1, 2, 64, 64
    rng = np.random.default_rng(13)
    images = rng.uniform(0, 1, (b, v, 3, h, w)).astype(np.float32)
    intr = np.broadcast_to(
        np.array([[1.0, 0, 0.5], [0, 1.1, 0.5], [0, 0, 1]], np.float32),
        (b, v, 3, 3),
    ).copy()
    extr = np.broadcast_to(np.eye(4, dtype=np.float32), (b, v, 4, 4)).copy()
    extr[:, 1, 0, 3] = 0.15
    near, far = 0.5, 100.0
    min_d = np.full((b, v), 1.0 / far, np.float32)
    max_d = np.full((b, v), 1.0 / near, np.float32)

    with torch.no_grad():
        ref = tm(
            torch.from_numpy(images),
            attn_splits_list=[2],
            intrinsics=torch.from_numpy(intr),
            min_depth=torch.from_numpy(min_d),
            max_depth=torch.from_numpy(max_d),
            extrinsics=torch.from_numpy(extr),
        )
    ref_depth = ref["depth_preds"][-1].numpy()  # (B, V, H, W)

    params = jax.tree.map(
        jnp.asarray,
        convert_mv_unimatch(tm.state_dict(), num_scales=1),
    )
    model = MultiViewUniMatch(
        num_scales=1,
        upsample_factor=4,
        lowest_feature_resolution=4,
        num_depth_candidates=32,
        vit_type="vits",
        unet_channels=32,
    )
    images_nhwc = jnp.asarray(np.moveaxis(images, 2, -1))
    variables = model.init(
        jax.random.key(0), images_nhwc, jnp.asarray(intr), jnp.asarray(extr),
        jnp.asarray(min_d), jnp.asarray(max_d), attn_splits=2,
    )
    ours_shapes = jax.tree.map(lambda a: a.shape, variables)
    conv_shapes = jax.tree.map(lambda a: a.shape, params)
    assert conv_shapes == ours_shapes

    out = model.apply(
        params, images_nhwc, jnp.asarray(intr), jnp.asarray(extr),
        jnp.asarray(min_d), jnp.asarray(max_d), attn_splits=2,
    )
    our_depth = np.asarray(out["depth_preds"][-1])
    np.testing.assert_allclose(our_depth, ref_depth, rtol=5e-3, atol=5e-3)


def test_prompt_dpt_parity(ref_unimatch_pkg):
    """Reference PromptDA DPT head (prompt fusion at every stage) vs ours."""
    pd = ref_unimatch_pkg("refum.promptda_dpt")

    from my_depthsplat_tpu.convert.torch_weights import convert_prompt_dpt
    from my_depthsplat_tpu.models.dpt import PromptDPTHead

    torch.manual_seed(9)
    tm = pd.DPTHead(
        nclass=1, in_channels=384, features=64,
        out_channels=[48, 96, 192, 384], use_bn=False, use_clstoken=False,
        output_act="sigmoid",
    )
    tm.eval()

    n, gh, gw = 2, 4, 6
    rng = np.random.default_rng(10)
    feats = [
        (
            torch.from_numpy(
                rng.normal(size=(n, gh * gw, 384)).astype(np.float32)
            ),
            torch.zeros(n, 384),
        )
        for _ in range(4)
    ]
    prompt = rng.uniform(0, 1, (n, 1, 8, 12)).astype(np.float32)
    with torch.no_grad():
        ref = tm(feats, gh, gw, torch.from_numpy(prompt)).numpy()

    params = jax.tree.map(jnp.asarray, convert_prompt_dpt(tm.state_dict()))
    model = PromptDPTHead(out_channels=(48, 96, 192, 384), features=64)
    stage_maps = [
        jnp.asarray(f[0].numpy().reshape(n, gh, gw, 384)) for f in feats
    ]
    prompt_nhwc = jnp.asarray(np.moveaxis(prompt, 1, -1))
    variables = model.init(jax.random.key(0), stage_maps, prompt_nhwc)
    assert (
        jax.tree.map(lambda a: a.shape, params)
        == jax.tree.map(lambda a: a.shape, variables)
    )
    ours = model.apply(params, stage_maps, prompt_nhwc)
    ref_nhwc = np.moveaxis(ref, 1, -1)
    np.testing.assert_allclose(np.asarray(ours), ref_nhwc, atol=1e-5)


def test_promptda_full_parity(ref_unimatch_pkg):
    """Full PromptDA branch: reflect padding, prompt normalization, DPT with
    prompt fusion, denormalization, and full-res intermediate features."""
    # stub torchvision (not installed; the reference only imports Pad unused)
    if "torchvision" not in sys.modules:
        tv = __import__("types").ModuleType("torchvision")
        tr = __import__("types").ModuleType("torchvision.transforms")
        tr.Pad = object
        tv.transforms = tr
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr
    pda = ref_unimatch_pkg("refum.promptda")

    from my_depthsplat_tpu.convert.torch_weights import convert_promptda
    from my_depthsplat_tpu.models.promptda import PromptDA

    class Cfg:  # the reference PromptDA only stores this, never reads it
        pass

    torch.manual_seed(14)
    tm = pda.PromptDA(cfg=Cfg(), num_scales=1, encoder="vits")
    tm.eval()
    # un-zero the final prompt-fusion convs stay zero (trained nets differ but
    # zero-init means prompt path silent; randomize to exercise it)
    with torch.no_grad():
        for rn in [tm.depth_head.scratch.refinenet1,
                   tm.depth_head.scratch.refinenet2,
                   tm.depth_head.scratch.refinenet3,
                   tm.depth_head.scratch.refinenet4]:
            rn.resConfUnit_depth[4].weight.normal_(0, 0.05)
            rn.resConfUnit_depth[4].bias.normal_(0, 0.05)

    b, v, h, w = 1, 2, 36, 50  # not multiples of 14 -> reflect-pad path
    rng = np.random.default_rng(15)
    images = rng.uniform(0, 1, (b, v, 3, h, w)).astype(np.float32)
    prompt = rng.uniform(0.5, 4.0, (b, v, 1, 12, 16)).astype(np.float32)

    with torch.no_grad():
        ref = tm(torch.from_numpy(images), torch.from_numpy(prompt))
    ref_depth = ref["depth_preds"][0].numpy()  # (B, V, H, W)
    ref_feat = ref["features_mono_intermediate"][-1].numpy()  # (BV, C, H, W)

    params = jax.tree.map(jnp.asarray, convert_promptda(tm.state_dict()))
    model = PromptDA(vit_type="vits")
    images_nhwc = jnp.asarray(np.moveaxis(images, 2, -1))
    prompt_j = jnp.asarray(prompt[:, :, 0])
    out = model.apply(params, images_nhwc, prompt_j)

    our_depth = np.asarray(out["depth_preds"][0])
    scale = np.abs(ref_depth).max()
    np.testing.assert_allclose(
        our_depth / scale, ref_depth / scale, atol=1e-4
    )
    our_feat = np.asarray(out["features_mono_intermediate"][-1])
    ref_feat_nhwc = np.moveaxis(ref_feat, 1, -1)
    fscale = np.abs(ref_feat_nhwc).max()
    np.testing.assert_allclose(
        our_feat / fscale, ref_feat_nhwc / fscale, atol=1e-4
    )


def test_epipolar_project_rays_parity():
    """Exact ray-segment projection vs reference epipolar_lines.project_rays
    (overlap flags and segment endpoints), random camera pairs."""
    import importlib
    import types

    if "refgeo" not in sys.modules:
        pkg = types.ModuleType("refgeo")
        pkg.__path__ = [str(REFERENCE / "src/geometry")]
        sys.modules["refgeo"] = pkg
    ref_ep = importlib.import_module("refgeo.epipolar_lines")

    from my_depthsplat_tpu.geometry.epipolar import project_rays
    from my_depthsplat_tpu.geometry.projection import (
        get_world_rays,
        sample_image_grid,
    )

    rng = np.random.default_rng(11)
    for case in range(4):
        # two random-ish cameras looking roughly at each other
        def cam(offset):
            e = np.eye(4, dtype=np.float32)
            angle = rng.uniform(-0.4, 0.4)
            ca, sa = np.cos(angle), np.sin(angle)
            e[:3, :3] = np.array(
                [[ca, 0, sa], [0, 1, 0], [-sa, 0, ca]], np.float32
            )
            e[:3, 3] = offset + rng.normal(0, 0.3, 3).astype(np.float32)
            return e

        extr_a = cam(np.array([0, 0, 0], np.float32))
        extr_b = cam(np.array([1.0, 0.2, 0.3], np.float32))
        intr = np.array(
            [[0.9, 0, 0.5], [0, 1.1, 0.5], [0, 0, 1]], np.float32
        )

        xy, _ = sample_image_grid((8, 8))
        origins, dirs = jax.jit(get_world_rays)(
            jnp.asarray(xy.reshape(-1, 2)), jnp.asarray(extr_a), jnp.asarray(intr)
        )
        ours = jax.jit(project_rays)(
            origins, dirs, jnp.asarray(extr_b), jnp.asarray(intr)
        )

        ref = ref_ep.project_rays(
            torch.as_tensor(np.asarray(origins)),
            torch.as_tensor(np.asarray(dirs)),
            torch.as_tensor(extr_b),
            torch.as_tensor(intr),
        )
        ov_ref = ref["overlaps_image"].numpy()
        ov_ours = np.asarray(ours["overlaps_image"])
        np.testing.assert_array_equal(ov_ours, ov_ref, err_msg=f"case {case}")
        if ov_ref.any():
            for key in ("t_min", "t_max"):
                a = np.asarray(ours[key])[ov_ref]
                b = ref[key].numpy()[ov_ref]
                both_finite = np.isfinite(a) & np.isfinite(b)
                np.testing.assert_allclose(
                    a[both_finite], b[both_finite], rtol=1e-4, atol=1e-5,
                    err_msg=f"case {case} {key}",
                )
                assert (np.isfinite(a) == np.isfinite(b)).all()
            for key in ("xy_min", "xy_max"):
                a = np.asarray(ours[key])[ov_ref]
                b = ref[key].numpy()[ov_ref]
                np.testing.assert_allclose(
                    a, b, rtol=1e-4, atol=1e-4, err_msg=f"case {case} {key}"
                )
