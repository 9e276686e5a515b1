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
