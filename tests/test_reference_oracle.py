"""Independent numpy oracle of the REFERENCE fusion forward contract.

The reference's FeatureFusionModel.forward (utils/fusion_model.py:152-206)
defines the dataflow contract our pipeline must honor (SURVEY.md §3.5):

  1. project voxel centroids into 6 cameras (per-camera loop,
     ``cam_pts = Rt @ pts``, pinhole ``K @ xyz / z``, validity
     ``z>0 & in-bounds``, fusion_model.py:63-84);
  2. rescale (u, v) from the 900x1600 capture to the encoder grid
     (fusion_model.py:89-127);
  3. patch index = clamped ``floor(uv / patch)``; flat = v*gw + u
     (fusion_model.py:172-188);
  4. per-camera token gather, zero invalid, mean over valid cameras
     with count clamped to >= 1 (fusion_model.py:184-201);
  5. concat [voxel_feat || img_feat] -> MLP (Linear-ReLU-Linear-ReLU-
     Linear, fusion_model.py:144-150);
  6. devoxelize: nearest-voxel argmin per point (lidar.py:147-155).

This file re-implements that contract directly from the above semantics
in plain numpy (per-camera Python loops and all) and asserts our jit
pipeline produces the same logits and the same argmax predictions on a
tiny scene — closing the loop the per-component oracles leave open.
"""

import numpy as np
import jax
import jax.numpy as jnp

from tpu3dssf.models.fusion import FeatureFusionModel, FusionConfig
from tpu3dssf.voxel import devoxelize_nearest


def numpy_reference_forward(tokens, voxel_feats, voxel_raw, voxel_mask,
                            points_xyz, point_mask, K, Rt, mlp,
                            cfg: FusionConfig):
    """The reference forward, written blind from the contract above.

    tokens: (n_cam, M, D); voxel_*: (V, ...); points_xyz: (P, 3);
    K: (n_cam, 3, 3); Rt: (n_cam, 4, 4); mlp: list of (W, b) with torch
    Linear orientation W: (out, in).
    Returns (point_logits (P, 16), predictions (P,) in [1, 16]).
    """
    n_cam, M, D = tokens.shape
    V = voxel_raw.shape[0]
    H_raw, W_raw = cfg.raw_image_size
    H_enc, W_enc = cfg.encoder_size
    gh, gw = cfg.grid_hw
    xyz = voxel_raw[:, :3].astype(np.float64)

    img_feat = np.zeros((V, D))
    cam_count = np.zeros((V,))
    for c in range(n_cam):  # the reference's per-camera loop
        hom = np.concatenate([xyz, np.ones((V, 1))], axis=1)  # (V, 4)
        cam_pts = (Rt[c].astype(np.float64) @ hom.T).T[:, :3]
        z = cam_pts[:, 2]
        pix = (K[c].astype(np.float64) @ cam_pts.T).T
        u = pix[:, 0] / np.maximum(pix[:, 2], 1e-12)
        v = pix[:, 1] / np.maximum(pix[:, 2], 1e-12)
        valid = (z > 0) & (u >= 0) & (u < W_raw) & (v >= 0) & (v < H_raw)
        # rescale to encoder resolution
        u = u * (W_enc / W_raw)
        v = v * (H_enc / H_raw)
        # patch index (floor, clamp, row-major flatten)
        ui = np.clip(np.floor(u / cfg.patch_size).astype(int), 0, gw - 1)
        vi = np.clip(np.floor(v / cfg.patch_size).astype(int), 0, gh - 1)
        flat = np.clip(vi * gw + ui, 0, gh * gw - 1)
        g = tokens[c][flat]                      # (V, D) gather
        img_feat += np.where(valid[:, None], g, 0.0)
        cam_count += valid
    img_feat = img_feat / np.maximum(cam_count, 1.0)[:, None]

    x = np.concatenate([voxel_feats, img_feat], axis=1)
    for i, (W, b) in enumerate(mlp):
        x = x @ W.T + b
        if i < len(mlp) - 1:
            x = np.maximum(x, 0.0)
    voxel_scores = x * voxel_mask[:, None]

    # devoxelize: nearest valid voxel per point (dense cdist + argmin)
    d = np.linalg.norm(
        points_xyz[:, None, :].astype(np.float64)
        - voxel_raw[None, :, :3].astype(np.float64), axis=-1)
    d = np.where(voxel_mask[None, :], d, np.inf)
    nearest = np.argmin(d, axis=1)
    point_logits = voxel_scores[nearest] * point_mask[:, None]
    preds = np.argmax(point_logits, axis=1) + 1  # losses.py:66 range 1..16
    return point_logits, preds


def test_fusion_forward_matches_numpy_reference_oracle(rng):
    n_cam, M, D, V, P = 6, 2840, 8, 24, 100
    cfg = FusionConfig(point_feat_dim=8, patch_tok_dim=D)

    tokens = rng.normal(size=(n_cam, M, D)).astype(np.float32)
    voxel_feats = rng.normal(size=(V, 8)).astype(np.float32)
    voxel_raw = np.concatenate(
        [rng.normal(size=(V, 3)) * 15, rng.random((V, 1))],
        axis=1).astype(np.float32)
    voxel_mask = np.ones(V, bool)
    voxel_mask[-3:] = False  # dead capacity slots
    points_xyz = (rng.normal(size=(P, 3)) * 15).astype(np.float32)
    point_mask = np.ones(P, bool)
    point_mask[-7:] = False  # padding slots

    K = np.zeros((n_cam, 3, 3), np.float32)
    K[:, 0, 0] = K[:, 1, 1] = 1266.0
    K[:, 0, 2], K[:, 1, 2], K[:, 2, 2] = 800.0, 450.0, 1.0
    Rt = np.tile(np.eye(4, dtype=np.float32), (n_cam, 1, 1))
    for c in range(n_cam):
        a = 2 * np.pi * c / n_cam
        Rt[c, 0, 0], Rt[c, 0, 1] = np.cos(a), -np.sin(a)
        Rt[c, 1, 0], Rt[c, 1, 1] = np.sin(a), np.cos(a)

    # ---- ours: jit fusion head + parity devoxelize ----
    model = FeatureFusionModel(cfg)
    batch = lambda a: jnp.asarray(a)[None]
    params = model.init(jax.random.PRNGKey(3), batch(tokens),
                        batch(voxel_feats), batch(voxel_raw),
                        batch(voxel_mask), batch(K), batch(Rt))
    voxel_scores = model.apply(params, batch(tokens), batch(voxel_feats),
                               batch(voxel_raw), batch(voxel_mask),
                               batch(K), batch(Rt))
    point_logits, _ = devoxelize_nearest(
        jnp.asarray(points_xyz), jnp.asarray(point_mask),
        jnp.asarray(voxel_raw[:, :3]), jnp.asarray(voxel_mask),
        voxel_scores[0])
    ours_logits = np.asarray(point_logits)
    ours_preds = np.argmax(ours_logits, axis=1) + 1

    # ---- oracle: same MLP weights, torch Linear orientation ----
    p = params["params"]
    mlp = [(np.asarray(p[n]["kernel"]).T, np.asarray(p[n]["bias"]))
           for n in ("mlp0", "mlp1", "mlp_out")]
    want_logits, want_preds = numpy_reference_forward(
        tokens, voxel_feats, voxel_raw, voxel_mask, points_xyz,
        point_mask, K, Rt, mlp, cfg)

    np.testing.assert_allclose(ours_logits, want_logits, atol=2e-4)
    valid = point_mask
    np.testing.assert_array_equal(ours_preds[valid], want_preds[valid])
