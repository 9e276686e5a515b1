"""Depth-range-sharded huge-G render: the grouped decode over a mesh axis.

The depth-grouped render (pallas_raster._render_grouped_impl) partitions the
globally depth-sorted gaussians into contiguous groups and chain-composites
them. Alpha compositing over DISJOINT DEPTH RANGES is associative:

    out = rgb_0 + T_0 * (rgb_1 + T_1 * (... + T_last * bg))

so the groups themselves shard over chips: chip c composites groups
[c*K/P, (c+1)*K/P) into a partial (rgb_c, T_c) image, and an ordered fold
over the all-gathered partials reproduces the sequential result. What
shards: the per-group layout work (slot gathers, expansion, candidate
sorts, pack gathers) AND the composite kernels — the measured bulk of the
decode. What stays replicated: projection, the global depth argsort, and
the gaussian-order row table (each chip gathers only ITS groups' slot
columns, so the dominant out-of-cache slot gather ALSO shards by index
count). Measured single-chip decode ledger in PERF.md round-5 projects
~40 ms replicated + ~340/P ms sharded.

Deviation from the sequential path: each chip's sticky-termination test
(p_raw >= 1e-4) sees only its OWN range's transmittance product, so
contributions the sequential walk would have cut at the threshold can
survive here — a <=eps-weighted (1e-4) difference, the same class as the
flat-vs-grouped chunk-boundary tolerance. FORWARD-ONLY (eval/video): the
VJP raises; training at huge G uses the single-chip grouped backward.

Reference: the CUDA pipeline has no multi-GPU renderer at all — this is a
TPU-native capability (pod-slice video rendering at 512x960x12-view scale).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.sharding import PartitionSpec as P

from ..geometry import get_fov
from .camera import TILE_X, TILE_Y, scale_invariant_normalization
from .projection import project_gaussians


def render_pallas_depth_sharded(
    axis: str,
    extrinsics: Array,  # (B, 4, 4) target views (replicated)
    intrinsics: Array,  # (B, 3, 3)
    near: Array,
    far: Array,
    image_shape: tuple[int, int],
    background_color: Array,  # (B, 3)
    gaussian_means: Array,  # (B, G, 3)
    gaussian_covariances: Array,
    gaussian_sh_coefficients: Array,
    gaussian_opacities: Array,
    scale_invariant: bool = True,
    use_sh: bool = True,
    max_tiles_per_gaussian: int = 16,
    instance_budget: int | None = None,
    big_tile_cap: int | None = None,
    group_slots: int | None = None,
    mesh=None,
) -> Array:
    """Render with depth groups sharded over mesh axis ``axis``.

    All gaussian/camera inputs are REPLICATED (in_specs P()); the output
    image is replicated too. Designed for the eval/video path at huge
    gaussian counts on a pod slice."""
    from . import pallas_raster as _pr

    if scale_invariant:
        extrinsics, near, far, gaussian_means, gaussian_covariances = (
            scale_invariant_normalization(
                extrinsics, near, far, gaussian_means, gaussian_covariances
            )
        )
    h, w = image_shape
    gy = (h + TILE_Y - 1) // TILE_Y
    gx = (w + TILE_X - 1) // TILE_X
    fovs = get_fov(intrinsics)
    b = extrinsics.shape[0]
    s = group_slots if group_slots is not None else _pr._CHAIN_GROUP_SLOTS
    if mesh is None:
        mesh = jax.sharding.get_abstract_mesh()
    n_chips = int(mesh.shape[axis])

    def local(extr, intr, fv, nr, fr, bg, means, cov, sh, opac):
        from .instances import grouped_group_layout, grouped_prep

        rank = jax.lax.axis_index(axis)

        images = []
        for i in range(b):
            sg = project_gaussians(
                extr[i], means[i], cov[i], sh[i], opac[i],
                jnp.tan(0.5 * fv[i, 0]), jnp.tan(0.5 * fv[i, 1]),
                image_shape, use_sh,
            )
            # replicated: pad/sort/table build (gather=False keeps the table
            # in gaussian order); each chip gathers ONLY its groups' slot
            # columns, sharding the dominant out-of-cache gather's index
            # count across the mesh
            g = sg.depth.shape[0]
            n_groups = -(-g // s)
            per_chip = -(-n_groups // n_chips)
            n_groups_pad = per_chip * n_chips
            budget_g = (
                None if instance_budget is None
                else -(-instance_budget // n_groups)
            )

            table_g, order, gp, _ng, _nd0 = grouped_prep(
                sg, s, max_tiles_per_gaussian, gather=False
            )
            # one guaranteed-invalid column (all-zero -> valid row 0) at
            # index gp; padded order entries point at it so out-of-range
            # group slices expand to sentinel keys only
            table_g = jnp.pad(table_g, ((0, 0), (0, 1)))
            pad_cols = n_groups_pad * s - gp
            order_pad = jnp.pad(order, (0, pad_cols), constant_values=gp)
            # my contiguous depth-rank span: per_chip groups
            span = per_chip * s
            sel = jax.lax.dynamic_slice_in_dim(order_pad, rank * span, span)
            table_mine = table_g[:, sel]

            state = jnp.zeros((1, gy, gx, _pr._NPIX, _pr._OUTC), jnp.float32)
            state = state.at[..., 3].set(1.0).at[..., 5].set(1.0)
            bg_i = bg[i : i + 1]
            for k in range(per_chip):
                inst, _dk, _slots = grouped_group_layout(
                    table_mine, k * s, image_shape, s,
                    max_tiles_per_gaussian, _pr.CHUNK, budget_g, big_tile_cap,
                )
                state = _pr._composite_fwd_impl(
                    inst.packed, inst.starts, inst.counts, bg_i, (1, gy, gx),
                    "float32", init=state, add_bg=False,
                )

            # partials: (rgb_c, T_c) for my depth span; ordered fold across
            # the all-gathered ranks reproduces the sequential chain
            part = jnp.concatenate(
                [state[..., 0:3], state[..., 3:4]], axis=-1
            )  # (1, gy, gx, NPIX, 4)
            parts = jax.lax.all_gather(part, axis)  # (P, 1, gy, gx, NPIX, 4)
            rgb = jnp.zeros_like(part[..., 0:3])
            t_acc = jnp.ones_like(part[..., 3:4])
            for c in range(int(n_chips)):
                rgb = rgb + t_acc * parts[c, ..., 0:3]
                t_acc = t_acc * parts[c, ..., 3:4]
            rgb = rgb + t_acc * bg_i[0][None, None, None, None, :]

            img = rgb.reshape(1, gy, gx, TILE_Y, TILE_X, 3)
            img = img.transpose(0, 1, 3, 2, 4, 5).reshape(
                1, gy * TILE_Y, gx * TILE_X, 3
            )
            images.append(img[:, :h, :w])
        return jnp.concatenate(images, axis=0)

    rep = P()

    def run(arrays):
        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(rep,) * 10,
            out_specs=rep,
            check_vma=False,
        )(*arrays)

    # Forward-only guard on the INPUT side: the u16 bitcast pack chain has
    # symbolic-zero tangents, so without this jax.grad would return silent
    # ZEROS (the output looks constant w.r.t. the gaussians to autodiff)
    # rather than erroring. Wrapping the arrays in a custom_vjp whose bwd
    # raises makes differentiation loud.
    return _fwd_only(
        (
            extrinsics, intrinsics, fovs, near, far, background_color,
            gaussian_means, gaussian_covariances, gaussian_sh_coefficients,
            gaussian_opacities,
        ),
        run,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _fwd_only(arrays, run):
    return run(arrays)


def _fwd_only_fwd(arrays, run):
    return run(arrays), None


def _fwd_only_bwd(run, res, g):
    raise NotImplementedError(
        "render_pallas_depth_sharded is forward-only (eval/video); train at "
        "huge G with the single-chip grouped backward (render_pallas)"
    )


_fwd_only.defvjp(_fwd_only_fwd, _fwd_only_bwd)
