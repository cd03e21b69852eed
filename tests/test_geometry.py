"""Golden tests for the geometry core against tiny numpy oracles.

Checks the exact contracts of reference utils/fusion_model.py:14-127
(projection validity rule, -1 fill, rescale) and
utils/dataloader.py:123-152 (calibration chain).
"""

import numpy as np
import jax.numpy as jnp

from tpu3dssf.geometry import (
    quaternion_to_rotation_matrix,
    make_se3,
    invert_se3,
    lidar_to_camera_extrinsics,
    multi_camera_projector,
    scale_pixel_coords,
    pixel_to_patch_index,
)


def _np_quat_to_rot(q):
    # numpy oracle, same convention as pyquaternion (w, x, y, z)
    w, x, y, z = q / np.linalg.norm(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def test_quaternion_rotation_matches_oracle(rng):
    for _ in range(10):
        q = rng.normal(size=4)
        got = np.asarray(quaternion_to_rotation_matrix(q))
        want = _np_quat_to_rot(q)
        np.testing.assert_allclose(got, want, atol=1e-5)
        # proper rotation
        np.testing.assert_allclose(got @ got.T, np.eye(3), atol=1e-5)


def test_se3_inverse(rng):
    q = rng.normal(size=4)
    t = rng.normal(size=3)
    T = make_se3(quaternion_to_rotation_matrix(q), t)
    T_inv = invert_se3(T)
    np.testing.assert_allclose(
        np.asarray(T) @ np.asarray(T_inv), np.eye(4), atol=1e-5)


def test_calibration_chain_matches_numpy_oracle(rng):
    # reference utils/dataloader.py:127-152: T_lidar_cam = inv(T_cam_ego) @ T_lidar_ego
    lid_q = rng.normal(size=4)
    lid_t = rng.normal(size=3)
    cam_q = rng.normal(size=(6, 4))
    cam_t = rng.normal(size=(6, 3))

    got = np.asarray(
        lidar_to_camera_extrinsics(lid_q, lid_t, cam_q, cam_t))

    T_lidar_ego = np.eye(4)
    T_lidar_ego[:3, :3] = _np_quat_to_rot(lid_q)
    T_lidar_ego[:3, 3] = lid_t
    for n in range(6):
        T_cam_ego = np.eye(4)
        T_cam_ego[:3, :3] = _np_quat_to_rot(cam_q[n])
        T_cam_ego[:3, 3] = cam_t[n]
        want = np.linalg.inv(T_cam_ego) @ T_lidar_ego
        np.testing.assert_allclose(got[n], want, atol=1e-4)


def _np_project(points, K, Rt, H, W):
    """numpy oracle of reference multi_camera_projector semantics."""
    n_cam = K.shape[0]
    P = points.shape[0]
    pix = np.full((n_cam, P, 2), -1.0)
    depth = np.full((n_cam, P), -1.0)
    valid = np.zeros((n_cam, P), dtype=bool)
    pts_h = np.concatenate([points, np.ones((P, 1))], axis=1)
    for c in range(n_cam):
        cam = (Rt[c] @ pts_h.T).T
        xyz = cam[:, :3]
        z = xyz[:, 2]
        proj = (K[c] @ xyz.T).T
        denom = np.maximum(proj[:, 2], 1e-12)
        u = proj[:, 0] / denom
        v = proj[:, 1] / denom
        ok = (z > 0) & (u >= 0) & (u < W) & (v >= 0) & (v < H)
        valid[c] = ok
        pix[c, ok] = np.stack([u[ok], v[ok]], axis=1)
        depth[c, ok] = z[ok]
    return pix, depth, valid


def test_projection_matches_oracle(rng):
    P, n_cam, H, W = 257, 6, 900, 1600
    points = rng.normal(size=(P, 3)) * 30.0
    K = np.zeros((n_cam, 3, 3))
    K[:, 0, 0] = K[:, 1, 1] = 1200.0
    K[:, 0, 2] = W / 2
    K[:, 1, 2] = H / 2
    K[:, 2, 2] = 1.0
    Rt = np.zeros((n_cam, 4, 4))
    for c in range(n_cam):
        q = rng.normal(size=4)
        Rt[c, :3, :3] = _np_quat_to_rot(q)
        Rt[c, :3, 3] = rng.normal(size=3)
        Rt[c, 3, 3] = 1.0

    pix, depth, valid = multi_camera_projector(points, K, Rt, (H, W))
    pix_o, depth_o, valid_o = _np_project(points, K, Rt, H, W)

    np.testing.assert_array_equal(np.asarray(valid), valid_o)
    np.testing.assert_allclose(np.asarray(pix), pix_o, atol=1e-2)
    np.testing.assert_allclose(np.asarray(depth), depth_o, atol=1e-3)


def test_projection_batched_shapes(rng):
    B, P, n_cam = 2, 64, 6
    points = rng.normal(size=(B, P, 3)).astype(np.float32)
    K = np.tile(np.eye(3, dtype=np.float32), (B, n_cam, 1, 1))
    Rt = np.tile(np.eye(4, dtype=np.float32), (B, n_cam, 1, 1))
    pix, depth, valid = multi_camera_projector(points, K, Rt, (900, 1600))
    assert pix.shape == (B, n_cam, P, 2)
    assert depth.shape == (B, n_cam, P)
    assert valid.shape == (B, n_cam, P)


def test_scale_pixel_coords():
    coords = jnp.array([[800.0, 450.0], [1600.0, 900.0]])
    out = np.asarray(scale_pixel_coords(coords, (900, 1600), (640, 1138)))
    np.testing.assert_allclose(
        out,
        [[800 * 1138 / 1600, 450 * 640 / 900],
         [1138.0, 640.0]],
        rtol=1e-5,
    )


def test_pixel_to_patch_index_matches_reference_math():
    # reference fusion_model.py:176-188 with dinov3 geometry: patch 16,
    # grid 40x71
    grid_h, grid_w, patch = 40, 71, 16
    coords = jnp.array([
        [0.0, 0.0],        # patch (0, 0) -> 0
        [16.0, 0.0],       # u_idx 1 -> 1
        [1137.0, 639.0],   # (70, 39) -> 39*71+70
        [5000.0, 5000.0],  # clamped to (70, 39)
        [-1.0, -1.0],      # floor(-1/16) = -1 -> clamped to 0
    ])
    idx = np.asarray(pixel_to_patch_index(coords, patch, grid_h, grid_w))
    np.testing.assert_array_equal(
        idx, [0, 1, 39 * 71 + 70, 39 * 71 + 70, 0])
