"""LPIPS net + loss gating tests (weights random — structure only)."""

import jax
import jax.numpy as jnp
import numpy as np

from my_depthsplat_tpu.train import LPIPS
from my_depthsplat_tpu.train.losses import lpips_loss


def test_lpips_shapes_and_identity():
    net = LPIPS()
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 32, 32, 3)),
                    jnp.float32)
    params = net.init(jax.random.key(0), x, x)
    d_same = np.asarray(net.apply(params, x, x))
    assert d_same.shape == (2,)
    np.testing.assert_allclose(d_same, 0.0, atol=1e-6)

    y = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (2, 32, 32, 3)),
                    jnp.float32)
    d_diff = np.asarray(net.apply(params, x, y))
    assert (d_diff > 0).all()


def test_lpips_loss_step_gating():
    net = LPIPS()
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 1, 16, 16, 3)),
                    jnp.float32)
    y = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (1, 1, 16, 16, 3)),
                    jnp.float32)
    params = net.init(jax.random.key(0), x[0], y[0])
    apply_fn = lambda p, a, b: net.apply(p, a, b)
    before = lpips_loss(apply_fn, params, x, y, 0.05,
                        jnp.asarray(10), apply_after_step=100)
    after = lpips_loss(apply_fn, params, x, y, 0.05,
                       jnp.asarray(200), apply_after_step=100)
    assert float(before) == 0.0
    assert float(after) > 0.0


def test_lpips_converter_shapes():
    """The torch->flax converter's output matches the flax param tree."""
    import torch

    from my_depthsplat_tpu.convert import convert_lpips
    from my_depthsplat_tpu.convert.torch_weights import _VGG_SLICES

    # Build a fake lpips state dict with the right shapes.
    cfg = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
    sd = {}
    c_in = 3
    for si, (c, n) in enumerate(cfg):
        for ci, idx in enumerate(_VGG_SLICES[si]):
            sd[f"net.slice{si+1}.{idx}.weight"] = torch.zeros(c, c_in, 3, 3)
            sd[f"net.slice{si+1}.{idx}.bias"] = torch.zeros(c)
            c_in = c
    for i, c in enumerate([64, 128, 256, 512, 512]):
        sd[f"lin{i}.model.1.weight"] = torch.zeros(1, c, 1, 1)

    params = convert_lpips(sd)

    net = LPIPS()
    x = jnp.zeros((1, 32, 32, 3))
    ref = net.init(jax.random.key(0), x, x)
    ref_shapes = jax.tree.map(lambda a: a.shape, ref)
    got_shapes = jax.tree.map(lambda a: a.shape, params)
    assert ref_shapes == got_shapes
