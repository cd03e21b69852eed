"""Synthetic nuScenes-like scenes for tests and benchmarks.

Generates samples with the exact output contract of the real dataset
(reference utils/dataloader.py:105-163): LiDAR points + 16-class labels +
6 surround cameras with plausible intrinsics/extrinsics. Geometry is
learnable (labels correlate with height, range, and cluster identity) so
training smoke-tests can show loss decreasing on it.
"""

from __future__ import annotations

import numpy as np

NUM_CLASSES = 16


def _camera_ring(rng, n_cam=6, jitter=0.0):
    """6 cameras in a yaw ring, each looking outward (like nuScenes).

    Returns K (n_cam, 3, 3) and T_lidar_cam (n_cam, 4, 4): LiDAR frame is
    x-forward/y-left/z-up; camera frames are the usual x-right/y-down/
    z-forward.
    """
    K = np.zeros((n_cam, 3, 3), np.float32)
    K[:, 0, 0] = K[:, 1, 1] = 1266.0
    K[:, 0, 2] = 800.0
    K[:, 1, 2] = 450.0
    K[:, 2, 2] = 1.0

    Rt = np.zeros((n_cam, 4, 4), np.float32)
    for c in range(n_cam):
        yaw = 2.0 * np.pi * c / n_cam + jitter * rng.normal()
        # forward direction of this camera in the LiDAR frame
        f = np.array([np.cos(yaw), np.sin(yaw), 0.0])
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(f, up)
        down = -up
        # rows of R map lidar coords to camera (x=right, y=down, z=forward)
        R = np.stack([right, down, f], axis=0)
        t = -R @ (f * 1.5)  # camera 1.5 m out from the sensor
        Rt[c, :3, :3] = R
        Rt[c, :3, 3] = t
        Rt[c, 3, 3] = 1.0
    return K, Rt


class SyntheticNuScenes:
    """Deterministic synthetic dataset; index-addressable like the real one."""

    def __init__(self, num_samples=8, num_points=34000, image_hw=(90, 160),
                 seed=0, num_classes=NUM_CLASSES):
        self.num_samples = num_samples
        self.num_points = num_points
        self.image_hw = image_hw
        self.seed = seed
        self.num_classes = num_classes
        # raw capture resolution the intrinsics assume (nuScenes cameras)
        self.raw_image_size = (900, 1600)

    def __len__(self):
        return self.num_samples

    def __getitem__(self, index):
        rng = np.random.default_rng(self.seed * 100003 + index)
        P = self.num_points

        # ground plane + a few object clusters + scattered "vegetation"
        n_ground = P // 2
        n_cluster = P // 4
        n_rest = P - n_ground - n_cluster

        r = np.sqrt(rng.uniform(4.0, 2500.0, n_ground))
        th = rng.uniform(0, 2 * np.pi, n_ground)
        ground = np.stack(
            [r * np.cos(th), r * np.sin(th),
             rng.normal(0, 0.05, n_ground)], axis=1)
        ground_lab = np.full(n_ground, 11)  # driveable_surface

        k = 8
        centers = rng.uniform(-30, 30, (k, 3))
        centers[:, 2] = rng.uniform(0.5, 2.0, k)
        which = rng.integers(0, k, n_cluster)
        cluster = centers[which] + rng.normal(0, 0.8, (n_cluster, 3))
        cluster_lab = (which % 10) + 1  # classes 1..10 (objects)

        rest_r = np.sqrt(rng.uniform(25.0, 3600.0, n_rest))
        rest_th = rng.uniform(0, 2 * np.pi, n_rest)
        rest = np.stack(
            [rest_r * np.cos(rest_th), rest_r * np.sin(rest_th),
             rng.uniform(0.0, 6.0, n_rest)], axis=1)
        rest_lab = np.where(rest[:, 2] > 3.0, 16, 15)  # veg / manmade

        xyz = np.concatenate([ground, cluster, rest]).astype(np.float32)
        labels = np.concatenate(
            [ground_lab, cluster_lab, rest_lab]).astype(np.uint8)

        # ~2% noise class (label 0), like real lidarseg
        noise = rng.random(P) < 0.02
        labels = np.where(noise, 0, labels).astype(np.uint8)

        intensity = np.clip(
            rng.normal(0.3 + 0.02 * labels.astype(np.float32), 0.1),
            0, 1).astype(np.float32)
        points = np.concatenate([xyz, intensity[:, None]], axis=1)

        perm = rng.permutation(P)
        points, labels = points[perm], labels[perm]

        K, Rt = _camera_ring(rng)
        H, W = self.image_hw
        images = rng.integers(0, 255, (6, H, W, 3), dtype=np.uint8)

        return {
            "points": points,                  # (P, 4) float32
            "labels": labels,                  # (P,) uint8 in [0, 16]
            "images": images,                  # (6, H, W, 3) uint8
            "cam_intrinsics": K,               # (6, 3, 3) float32
            "lidar2cam": Rt,                   # (6, 4, 4) float32
            "num_points": P,
        }
