"""Pallas tier-expansion kernel: packed tile-candidate sort keys.

Replaces the XLA expansion op-soup in the tile-instance builder (the
reference's CUDA duplicate-with-keys preprocessing, driven from
cuda_splatting.py:98-126 via diff-gaussian-rasterization). Measured on the
bench step, the XLA form cost ~1.5 ms spread over T(1024)-layout int fusions,
1-sublane (1, BG) selects, and relayout copies; this kernel emits the packed
``tile_id * 2^slot_bits + slot`` sort keys in one pass at a VPU-dense
(8, 512) register layout.

Inputs arrive pre-reshaped to (rows, 8, N/8) so every row op runs on dense
(8, 512) tiles instead of 1-sublane (1, N) strips. The kernel evaluates, per
candidate tile j of each slot:

- the bbox walk (j -> (ty, tx) via comparison-sum div/mod, j < area);
- the exact ellipse-tile cull: the compositing kernel gates every
  contribution on alpha = min(0.99, op * exp(-q/2)) >= 1/255, so a candidate
  whose quadratic form exceeds 2*ln(op/ALPHA_MIN) over the whole tile rect is
  an exact zero in forward AND backward — dropping it is output-invariant
  (the CUDA pipeline bins by the circular-radius bbox only);
- the packed int32 key, with the sentinel ``n_tiles_total * 2^slot_bits`` for
  dead candidates (slot bits zeroed so the key never overflows int32 even
  when padding lanes exceed 2^slot_bits).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .camera import ALPHA_MIN, TILE_X, TILE_Y

_SUB = 8
_LANES = 512
_BN = _SUB * _LANES  # columns per grid step


def rect_quadratic_min(ca, cb, cc, x0, x1, y0, y1):
    """Min of q(x, y) = ca*x^2 + 2*cb*x*y + cc*y^2 over the box
    [x0, x1] x [y0, y1], assuming the conic (ca, cb; cb, cc) is positive
    definite. Elementwise over any broadcastable shapes.

    If the origin is inside the box the min is 0; otherwise it lies on the
    boundary, and on each edge the 1-D quadratic has a closed-form clamped
    minimizer (e.g. on x = xe: y* = clip(-cb*xe/cc, y0, y1))."""
    inside = (x0 <= 0.0) & (x1 >= 0.0) & (y0 <= 0.0) & (y1 >= 0.0)
    ca_s = jnp.where(ca > 0.0, ca, 1.0)
    cc_s = jnp.where(cc > 0.0, cc, 1.0)

    def edge_x(xe):
        ye = jnp.clip(-cb * xe / cc_s, y0, y1)
        return ca * xe * xe + 2.0 * cb * xe * ye + cc * ye * ye

    def edge_y(ye):
        xe = jnp.clip(-cb * ye / ca_s, x0, x1)
        return ca * xe * xe + 2.0 * cb * xe * ye + cc * ye * ye

    q_edge = jnp.minimum(
        jnp.minimum(edge_x(x0), edge_x(x1)),
        jnp.minimum(edge_y(y0), edge_y(y1)),
    )
    return jnp.where(inside, 0.0, q_edge)


def _expand_kernel(
    rect_ref,  # (6, SUB, LANES) u16: rmin_x, rmin_y, rw, area, valid, vid
    cull_ref,  # (6, SUB, LANES) f32: xs, ys, ca, cb, cc, opacity
    slots_ref,  # (SUB, LANES) i32 (ignored when iota_slots)
    keys_ref,  # (J, SUB, LANES) i32 out
    *,
    j0: int,
    jmax: int,
    grid_x: int,
    n_tiles: int,
    n_tiles_total: int,
    slot_mult: int,
    iota_slots: bool,
    cols: int,  # total columns per sublane row (BGp // SUB)
):
    rect = rect_ref[...].astype(jnp.int32)  # (6, SUB, LANES)
    rx, ry = rect[0], rect[1]
    rw = jnp.maximum(rect[2], 1)
    area = rect[3]
    valid = rect[4] > 0
    vid = rect[5]
    cull = cull_ref[...]
    xs, ys = cull[0], cull[1]
    ca, cb, cc, op = cull[2], cull[3], cull[4], cull[5]
    pd = (ca > 0.0) & (cc > 0.0) & (ca * cc - cb * cb > 0.0)
    thr = 2.0 * jnp.log(jnp.maximum(op, 1e-12) / ALPHA_MIN) + 1e-3

    if iota_slots:
        i = pl.program_id(0)
        s_iota = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANES), 0)
        l_iota = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANES), 1)
        slots = s_iota * cols + i * _LANES + l_iota
    else:
        slots = slots_ref[...]

    sentinel = n_tiles_total * slot_mult
    for j in range(j0, jmax):
        # j // rw and j % rw as comparison sums (variable int div is a long
        # VPU sequence; j is static and small).
        jdiv = jnp.zeros((_SUB, _LANES), jnp.int32)
        for k in range(1, jmax):
            jdiv = jdiv + (j >= k * rw).astype(jnp.int32)
        ty = ry + jdiv
        tx = rx + (j - jdiv * rw)
        ok = (j < area) & valid
        x0 = (tx * TILE_X).astype(jnp.float32) - xs
        y0 = (ty * TILE_Y).astype(jnp.float32) - ys
        qmin = rect_quadratic_min(
            ca, cb, cc, x0, x0 + float(TILE_X - 1), y0, y0 + float(TILE_Y - 1)
        )
        # no bool-valued where: Mosaic rejects the i8->i1 select truncation
        ok &= (qmin <= thr) | jnp.logical_not(pd)
        key = jnp.where(
            ok,
            (ty * grid_x + tx + vid * n_tiles) * slot_mult + slots,
            sentinel,
        )
        keys_ref[j - j0] = key


def expand_keys(
    rect_u16: Array,  # (6, N) u16 slot-space rect table
    cull6: Array,  # (6, N) f32 slot-space screen columns
    slots: Array | None,  # (N,) i32 slot ids; None -> global lane index
    j0: int,
    jmax: int,
    grid_x: int,
    n_tiles: int,
    n_tiles_total: int,
    slot_bits: int,
    interpret: bool,
) -> Array:
    """Returns packed int32 keys, shape (jmax - j0, Np) with Np = N padded to
    the kernel block; padding lanes carry the sentinel key (they sort to the
    end and are truncated/masked downstream like any dead candidate)."""
    n = rect_u16.shape[1]
    n_pad = -(-n // _BN) * _BN
    pad = n_pad - n
    if pad:
        # padded rect lanes have valid=0 -> dead candidates
        rect_u16 = jnp.pad(rect_u16, ((0, 0), (0, pad)))
        cull6 = jnp.pad(cull6, ((0, 0), (0, pad)))
        if slots is not None:
            slots = jnp.pad(slots, (0, pad))
    cols = n_pad // _SUB
    rect3 = rect_u16.reshape(6, _SUB, cols)
    cull3 = cull6.reshape(6, _SUB, cols)
    slots3 = (
        jnp.zeros((_SUB, cols), jnp.int32)
        if slots is None
        else slots.reshape(_SUB, cols)
    )
    j = jmax - j0
    grid = (cols // _LANES,)
    kernel = functools.partial(
        _expand_kernel,
        j0=j0,
        jmax=jmax,
        grid_x=grid_x,
        n_tiles=n_tiles,
        n_tiles_total=n_tiles_total,
        slot_mult=1 << slot_bits,
        iota_slots=slots is None,
        cols=cols,
    )
    keys3 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((6, _SUB, _LANES), lambda i: (0, 0, i)),
            pl.BlockSpec((6, _SUB, _LANES), lambda i: (0, 0, i)),
            pl.BlockSpec((_SUB, _LANES), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((j, _SUB, _LANES), lambda i: (0, 0, i)),
        out_shape=jax.ShapeDtypeStruct((j, _SUB, cols), jnp.int32),
        interpret=interpret,
    )(rect3, cull3, slots3)
    return keys3.reshape(j, n_pad)
