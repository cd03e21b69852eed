"""Multi-camera pinhole projection + patch indexing, fully vectorized jnp.

Rebuilds the semantics of the reference's projection stack
(utils/fusion_model.py:14-127 and the patch-index math at
utils/fusion_model.py:172-191) without the per-camera Python loop: one
einsum over all cameras, all points, all batch entries — so XLA maps it
onto the MXU as a handful of batched matmuls.

Contract preserved from the reference:
  * validity rule ``(z > 0) & (0 <= u < W) & (0 <= v < H)``
    (fusion_model.py:77);
  * invalid pixel coords are forced to -1 (fusion_model.py:82-83), invalid
    depths to -1 (fusion_model.py:84);
  * rescale from the raw capture resolution (900x1600 on nuScenes,
    dataloader.py:217-218) to the image-encoder input resolution with
    per-axis scale (W_new/W, H_new/H) (fusion_model.py:89-127);
  * patch index = clamp(floor(u / patch), 0, grid_w-1) /
    clamp(floor(v / patch), 0, grid_h-1); flat = v_idx * grid_w + u_idx
    (fusion_model.py:176-188).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Projection must be exact f32: bf16 matmul precision shifts pixels by
# whole patch cells at nuScenes resolutions.
_F32 = jax.lax.Precision.HIGHEST


def multi_camera_projector(points, cam_intrinsics, lidar2cam_extrinsics,
                           image_size):
    """Project LiDAR-frame points into every camera.

    Args:
      points: (..., P, 3) xyz in the LiDAR frame (any leading batch dims).
      cam_intrinsics: (..., N_cam, 3, 3).
      lidar2cam_extrinsics: (..., N_cam, 4, 4).
      image_size: (H, W) of the raw images — static Python ints or a
        (..., 2) array (per-sample sizes, (H, W) order like the reference's
        ``image_sizes`` tensor, dataloader.py:217-218).

    Returns:
      pixel_coords: (..., N_cam, P, 2) (u, v); -1 where invalid.
      depth: (..., N_cam, P) camera-frame z; -1 where invalid.
      valid: (..., N_cam, P) bool.
    """
    points = jnp.asarray(points, dtype=jnp.float32)
    K = jnp.asarray(cam_intrinsics, dtype=jnp.float32)
    Rt = jnp.asarray(lidar2cam_extrinsics, dtype=jnp.float32)

    # R p + t for every camera at once: (..., N_cam, P, 3)
    xyz = (
        jnp.einsum("...nij,...pj->...npi", Rt[..., :3, :3], points,
                   precision=_F32)
        + Rt[..., :3, 3][..., None, :]
    )
    z = xyz[..., 2]

    pix = jnp.einsum("...nij,...npj->...npi", K, xyz, precision=_F32)
    denom = jnp.maximum(pix[..., 2], 1e-12)
    u = pix[..., 0] / denom
    v = pix[..., 1] / denom

    if isinstance(image_size, (tuple, list)):
        img_h = float(image_size[0])
        img_w = float(image_size[1])
    else:
        hw = jnp.asarray(image_size, dtype=jnp.float32)
        # broadcast (..., 2) against (..., N_cam, P)
        img_h = hw[..., 0][..., None, None]
        img_w = hw[..., 1][..., None, None]

    valid = (z > 0) & (u >= 0) & (u < img_w) & (v >= 0) & (v < img_h)

    pixel_coords = jnp.stack([u, v], axis=-1)
    pixel_coords = jnp.where(valid[..., None], pixel_coords, -1.0)
    depth = jnp.where(valid, z, -1.0)
    return pixel_coords, depth, valid


def scale_pixel_coords(pixel_coords, origin_size, new_size):
    """Rescale (u, v) coords from ``origin_size`` to ``new_size`` (H, W).

    Mirror of reference utils/fusion_model.py:89-127 — scale factors are
    (W_new / W_orig, H_new / H_orig) applied to (u, v).
    """
    if isinstance(new_size, int):
        h_new = w_new = float(new_size)
    else:
        h_new, w_new = float(new_size[0]), float(new_size[1])

    if isinstance(origin_size, (tuple, list)):
        h_orig = jnp.maximum(float(origin_size[0]), 1e-6)
        w_orig = jnp.maximum(float(origin_size[1]), 1e-6)
        scale = jnp.asarray([w_new / w_orig, h_new / h_orig], dtype=jnp.float32)
    else:
        hw = jnp.asarray(origin_size, dtype=jnp.float32)
        h_orig = jnp.maximum(hw[..., 0], 1e-6)
        w_orig = jnp.maximum(hw[..., 1], 1e-6)
        scale = jnp.stack([w_new / w_orig, h_new / h_orig], axis=-1)
        # broadcast over the (..., P, 2) tail of pixel_coords
        extra = pixel_coords.ndim - scale.ndim
        scale = scale.reshape(scale.shape[:-1] + (1,) * extra + (2,))
    return pixel_coords * scale


def pixel_to_patch_index(pixel_coords, patch_size, grid_h, grid_w):
    """Map encoder-resolution (u, v) to a flat ViT patch-token index.

    Mirror of reference utils/fusion_model.py:176-188: floor-divide by the
    patch size, clamp each axis into the grid, flatten row-major
    (``v_idx * grid_w + u_idx``), then clamp into [0, grid_h*grid_w - 1].
    Invalid points (coords -1) land in patch 0; callers mask them out with
    the projector's validity mask, exactly like the reference's masked
    camera mean (fusion_model.py:195-201).
    """
    patch_xy = jnp.floor(pixel_coords / float(patch_size)).astype(jnp.int32)
    u_idx = jnp.clip(patch_xy[..., 0], 0, grid_w - 1)
    v_idx = jnp.clip(patch_xy[..., 1], 0, grid_h - 1)
    flat = v_idx * grid_w + u_idx
    return jnp.clip(flat, 0, grid_h * grid_w - 1)
