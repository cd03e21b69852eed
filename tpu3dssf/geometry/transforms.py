"""SE(3) calibration chains, pure jnp.

Rebuilds the calibration math the reference performs on the host with
pyquaternion + numpy inside the dataset's ``__getitem__``
(reference utils/dataloader.py:123-152): per camera,
``T_lidar_cam = inv(T_cam_ego) @ T_lidar_ego``.

Here the chain is a vectorized, jit-able function of raw quaternions and
translations so it can run on device for a whole batch of samples at once.
Works for both numpy and jax.numpy inputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Calibration math must be exact float32 — the default (bf16) matmul
# precision loses ~1e-3, which moves projected pixels by several pixels.
_F32 = jax.lax.Precision.HIGHEST


def quaternion_to_rotation_matrix(q):
    """Convert (w, x, y, z) quaternion(s) to rotation matrices.

    Matches the convention of ``pyquaternion.Quaternion(...).rotation_matrix``
    used by the reference (utils/dataloader.py:128,142): scalar-first,
    right-handed. ``q`` has shape (..., 4); returns (..., 3, 3). The
    quaternion is normalized first, like pyquaternion does.
    """
    q = jnp.asarray(q, dtype=jnp.float32)
    q = q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]

    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)

    rows = [
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def make_se3(rotation, translation):
    """Build (..., 4, 4) homogeneous transforms from R (..., 3, 3), t (..., 3)."""
    rotation = jnp.asarray(rotation, dtype=jnp.float32)
    translation = jnp.asarray(translation, dtype=jnp.float32)
    batch_shape = rotation.shape[:-2]
    top = jnp.concatenate([rotation, translation[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=jnp.float32),
        batch_shape + (1, 4),
    )
    return jnp.concatenate([top, bottom], axis=-2)


def invert_se3(T):
    """Closed-form inverse of (..., 4, 4) rigid transforms: [Rᵀ, -Rᵀt]."""
    T = jnp.asarray(T, dtype=jnp.float32)
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    R_inv = jnp.swapaxes(R, -1, -2)
    t_inv = -jnp.einsum("...ij,...j->...i", R_inv, t, precision=_F32)
    return make_se3(R_inv, t_inv)


def lidar_to_camera_extrinsics(lidar_rotation, lidar_translation,
                               cam_rotations, cam_translations):
    """Compute per-camera ``T_lidar_cam`` from calibrated-sensor records.

    Semantics of reference utils/dataloader.py:127-152 (keyframe
    approximation: LiDAR and cameras share one ego pose, so ego-pose records
    cancel and only calibrated_sensor extrinsics matter).

    Args:
      lidar_rotation: (..., 4) quaternion (w,x,y,z) of the LiDAR sensor in ego.
      lidar_translation: (..., 3).
      cam_rotations: (..., N_cam, 4) quaternions of each camera in ego.
      cam_translations: (..., N_cam, 3).

    Returns:
      (..., N_cam, 4, 4) transforms taking LiDAR-frame points to each
      camera frame.
    """
    T_lidar_ego = make_se3(
        quaternion_to_rotation_matrix(lidar_rotation), lidar_translation
    )
    T_cam_ego = make_se3(
        quaternion_to_rotation_matrix(cam_rotations), cam_translations
    )
    T_ego_cam = invert_se3(T_cam_ego)
    return jnp.einsum(
        "...nij,...jk->...nik", T_ego_cam, T_lidar_ego, precision=_F32
    )
