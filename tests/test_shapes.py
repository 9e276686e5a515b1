"""Runtime shape-check layer (the reference's jaxtyping+beartype analog,
src/main.py:22-37): transposed/swap batches must fail loudly at the seams."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from my_depthsplat_tpu.utils.shapes import ShapeError, assert_shapes, check_views


def test_assert_shapes_binds_and_rejects():
    a = jnp.zeros((2, 3, 4))
    b = jnp.zeros((2, 5))
    dims = assert_shapes({"a": (a, ("B", "V", None)), "b": (b, ("B", "N"))})
    assert dims["B"] == 2 and dims["V"] == 3 and dims["N"] == 5
    with pytest.raises(ShapeError, match="axis 1"):
        assert_shapes({"a": (a, ("B", None, None)), "b": (b, ("N", "B"))})
    with pytest.raises(ShapeError, match="rank"):
        assert_shapes({"a": (a, ("B", "V"))})


def test_encoder_rejects_transposed_batch():
    """A (B, V)-consistent but HW-transposed image with swapped camera dims
    fails at the encoder seam instead of producing wrong numbers."""
    from my_depthsplat_tpu.models import EncoderDepthSplat, EncoderDepthSplatCfg

    cfg = EncoderDepthSplatCfg(
        num_scales=1, num_depth_candidates=16, costvolume_unet_feat_dim=16,
    )
    model = EncoderDepthSplat(cfg)
    ctx = {
        "image": jnp.zeros((1, 2, 3, 32, 32)),  # channels-first: WRONG layout
        "intrinsics": jnp.zeros((1, 2, 3, 3)),
        "extrinsics": jnp.zeros((1, 2, 4, 4)),
        "near": jnp.zeros((1, 2)),
        "far": jnp.zeros((1, 2)),
    }
    with pytest.raises(ShapeError):
        model.init(jax.random.key(0), ctx, training=False)


def test_decoder_rejects_mismatched_views():
    from my_depthsplat_tpu.gaussians.types import Gaussians
    from my_depthsplat_tpu.models import DecoderSplattingCfg, decode_splatting

    g = Gaussians(
        means=jnp.zeros((1, 16, 3)),
        covariances=jnp.zeros((1, 16, 3, 3)),
        harmonics=jnp.zeros((1, 16, 3, 9)),
        opacities=jnp.zeros((1, 16)),
    )
    with pytest.raises(ShapeError):
        decode_splatting(
            DecoderSplattingCfg(),
            g,
            jnp.zeros((1, 2, 4, 4)),
            jnp.zeros((1, 2, 3, 3)).transpose(0, 2, 3, 1),  # wrong layout
            jnp.zeros((1, 2)),
            jnp.zeros((1, 2)),
            (8, 8),
        )


def test_losses_reject_swapped_axes():
    from my_depthsplat_tpu.train.losses import LossCfg, compute_losses

    with pytest.raises(ShapeError):
        compute_losses(
            LossCfg(),
            jnp.zeros((1, 2, 8, 8, 3)),
            jnp.zeros((1, 8, 8, 2, 3)),  # V moved
            jnp.zeros(()),
        )


def test_train_step_rejects_mismatched_batch():
    """The train-step batch seam: target whose B disagrees with context
    fails at trace time with a named error (VERDICT r3 item 5)."""
    from my_depthsplat_tpu.train import TrainCfg, make_train_step
    from my_depthsplat_tpu.train.step import TrainState

    _, train_step = make_train_step(TrainCfg())
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params={}, opt_state=None
    )

    def views(b, v):
        return {
            "image": jnp.zeros((b, v, 8, 8, 3)),
            "intrinsics": jnp.zeros((b, v, 3, 3)),
            "extrinsics": jnp.zeros((b, v, 4, 4)),
            "near": jnp.zeros((b, v)),
            "far": jnp.zeros((b, v)),
        }

    batch = {"context": views(1, 2), "target": views(2, 1)}  # B mismatch
    with pytest.raises(ShapeError, match="batch.target"):
        train_step(state, batch)
