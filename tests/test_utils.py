"""Utils tests: ply round trip, trajectories, stabilization, drawing,
calibration validator, logger."""

import numpy as np
from scipy.spatial.transform import Rotation

from my_depthsplat_tpu.utils.calibration_validator import validate_pair
from my_depthsplat_tpu.utils.camera_path import (
    generate_wobble,
    interpolate_extrinsics,
    render_stabilization_path,
)
from my_depthsplat_tpu.utils.drawing import draw_lines, draw_points, frustum_segments
from my_depthsplat_tpu.utils.layout import add_border, hcat, vcat
from my_depthsplat_tpu.utils.logger import LocalLogger
from my_depthsplat_tpu.utils.ply_export import export_ply, read_ply


def test_ply_round_trip(tmp_path):
    rng = np.random.default_rng(0)
    g = 50
    means = rng.normal(size=(g, 3)).astype(np.float32)
    scales = np.abs(rng.normal(size=(g, 3))).astype(np.float32) + 0.01
    q = rng.normal(size=(g, 4)); q /= np.linalg.norm(q, axis=-1, keepdims=True)
    sh = rng.normal(size=(g, 3, 9)).astype(np.float32)
    opac = rng.uniform(0.1, 0.9, g).astype(np.float32)
    extr = np.eye(4, dtype=np.float32)

    path = tmp_path / "g.ply"
    export_ply(extr, means, scales, q, sh, opac, path)
    data = read_ply(path)
    np.testing.assert_allclose(data["x"], means[:, 0], atol=1e-6)
    np.testing.assert_allclose(data["f_dc_0"], sh[:, 0, 0], atol=1e-6)
    # opacity logit round trip
    sig = 1 / (1 + np.exp(-data["opacity"]))
    np.testing.assert_allclose(sig, opac, atol=1e-5)
    np.testing.assert_allclose(np.exp(data["scale_0"]), scales[:, 0], rtol=1e-5)


def test_wobble_and_interpolation():
    extr = np.eye(4, dtype=np.float32)
    t = np.linspace(0, 1, 10).astype(np.float32)
    wob = generate_wobble(extr, np.asarray(0.1, np.float32), t)
    assert wob.shape == (10, 4, 4)
    # at t=0 the pose is offset by -radius*0 in x, -cos(0)*0 = identity-ish
    np.testing.assert_allclose(wob[0], extr, atol=1e-6)

    final = np.eye(4, dtype=np.float32)
    final[:3, :3] = Rotation.from_euler("y", 30, degrees=True).as_matrix()
    final[:3, 3] = [1, 0, 0]
    interp = interpolate_extrinsics(extr, final, t)
    np.testing.assert_allclose(interp[0], extr, atol=1e-5)
    np.testing.assert_allclose(interp[-1], final, atol=1e-5)
    # midpoint rotation is 15 degrees
    mid = Rotation.from_matrix(interp[5][:3, :3]).magnitude()
    expected = Rotation.from_euler("y", 30 * t[5], degrees=True).magnitude()
    assert abs(mid - expected) < 1e-4


def test_stabilization_orthonormal():
    rng = np.random.default_rng(0)
    n = 60
    poses = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    for i in range(n):
        jitter = Rotation.from_euler(
            "xyz", rng.normal(scale=2.0, size=3), degrees=True
        ).as_matrix()
        poses[i, :3, :3] = jitter
        poses[i, :3, 3] = [i * 0.1 + rng.normal(scale=0.05), 0, 0]
    smooth = render_stabilization_path(poses, k_size=15)
    assert smooth.shape == (n, 3, 4)
    # Reference semantics: r1/r2 unit, r3 = r1 x r2 (r1.r2 is only approx 0,
    # matching stablize_camera.py which does not re-orthogonalize r2).
    r = smooth[:, :3, :3]
    np.testing.assert_allclose(np.linalg.norm(r[:, :, 0], axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(r[:, :, 1], axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(
        np.einsum("ni,ni->n", r[:, :, 2], r[:, :, 0]), 0.0, atol=1e-5
    )
    assert np.abs(np.einsum("ni,ni->n", r[:, :, 0], r[:, :, 1])).max() < 0.1
    # translation jitter reduced
    raw_var = np.var(np.diff(poses[:, 0, 3]))
    smooth_var = np.var(np.diff(smooth[:, 0, 3]))
    assert smooth_var < raw_var


def test_drawing_and_layout():
    img = np.zeros((32, 32, 3), np.float32)
    img = draw_points(img, np.array([[0.5, 0.5]]), color=(1, 0, 0), radius=2)
    assert img[16, 16, 0] > 0.5
    img = draw_lines(img, np.array([[0.1, 0.1]]), np.array([[0.9, 0.1]]))
    assert img[3, 16].max() > 0.5

    a = np.zeros((8, 8, 3)); b = np.zeros((10, 6, 3))
    assert hcat(a, b).shape == (10, 8 + 8 + 6, 3)
    assert vcat(a, b).shape == (8 + 8 + 10, 8, 3)
    assert add_border(a, 2).shape == (12, 12, 3)

    starts, ends = frustum_segments(np.eye(4), np.eye(3))
    assert starts.shape == (8, 3) and ends.shape == (8, 3)


def test_calibration_validator_good_and_bad():
    h, w = 48, 64
    rng = np.random.default_rng(0)
    # a fronto-parallel textured plane at z=2
    tex = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    depth = np.full((h, w), 2.0, np.float32)
    intr = np.array([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], np.float32)
    e_a = np.eye(4, dtype=np.float32)
    e_b = np.eye(4, dtype=np.float32)
    e_b[0, 3] = 0.05  # small baseline

    # image B = plane seen from B: shift texture by disparity
    # (for a fronto-parallel plane the shift is uniform in pixels)
    disp_px = 0.05 / 2.0 * 1.0 * w  # baseline/z * fx_px
    shift = int(round(disp_px))
    img_b = np.roll(tex, -shift, axis=1)

    rep = validate_pair(tex, depth, e_a, intr, img_b, depth, e_b, intr)
    assert rep.valid_fraction > 0.5
    assert rep.depth_consistency_mae_m < 0.05
    assert rep.ok

    # break the intrinsics: fx off by 2x -> large depth inconsistency
    intr_bad = intr.copy(); intr_bad[0, 0] = 2.0
    rep_bad = validate_pair(tex, depth, e_a, intr_bad, img_b, depth, e_b, intr_bad)
    assert rep_bad.photometric_mae > rep.photometric_mae


def test_local_logger(tmp_path):
    lg = LocalLogger(tmp_path, "t")
    lg.log_scalars(1, {"loss": 0.5})
    lg.log_image(1, "val/panel", np.zeros((8, 8, 3)))
    lg.close()
    assert (tmp_path / "metrics.jsonl").exists()
    assert list((tmp_path / "images").glob("*.png"))


def test_exaggerated_interpolation_trajectory():
    """Exaggerated-interp video path (reference model_wrapper.py:985-1029):
    extrapolating pose interpolation + 5-rotation wobble of half-baseline
    radius; endpoints at t=0.4/0.6 reproduce the context cameras' rotations
    (t*5-2 hits 0 and 1 there)."""
    import numpy as np

    from my_depthsplat_tpu.utils.camera_path import (
        generate_exaggerated_interpolation,
        interpolate_extrinsics,
    )
    from scipy.spatial.transform import Rotation

    e0 = np.eye(4, dtype=np.float32)
    e1 = np.eye(4, dtype=np.float32)
    e1[:3, :3] = Rotation.from_euler("y", 10, degrees=True).as_matrix()
    e1[0, 3] = 0.5
    intr = np.broadcast_to(np.eye(3, dtype=np.float32), (2, 3, 3))
    t = np.linspace(0, 1, 11).astype(np.float32)
    poses, intrs = generate_exaggerated_interpolation(
        np.stack([e0, e1]), intr, t
    )
    assert poses.shape == (11, 4, 4) and intrs.shape == (11, 3, 3)
    # t=0.4 -> interp parameter 0 -> rotation == e0's (wobble is translation-only)
    np.testing.assert_allclose(poses[4, :3, :3], e0[:3, :3], atol=1e-5)
    # t=0.6 -> parameter 1 -> e1's rotation
    np.testing.assert_allclose(poses[6, :3, :3], e1[:3, :3], atol=1e-5)
    # extrapolation: t=0 -> parameter -2 -> rotation continues past e0
    rel = Rotation.from_matrix(poses[0, :3, :3]).as_euler("xyz", degrees=True)
    assert rel[1] < -15  # -2 x 10 degrees about y
    # interpolate_extrinsics itself matches slerp inside [0, 1]
    mid = interpolate_extrinsics(e0, e1, np.asarray([0.5], np.float32))[0]
    np.testing.assert_allclose(
        Rotation.from_matrix(mid[:3, :3]).as_euler("xyz", degrees=True)[1],
        5.0, atol=1e-4,
    )
