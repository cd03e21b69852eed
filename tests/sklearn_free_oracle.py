"""Tiny numpy oracles shared by tests (no sklearn/open3d deps)."""

import numpy as np

KNN5_WEIGHTS = np.array([0.4, 0.3, 0.2, 0.05, 0.05])


def knn5_oracle(queries, points, intensities):
    """Exact 5-NN weighted intensity (reference utils/lidar.py:97-105)."""
    d = ((queries[:, None, :] - points[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d, axis=1, kind="stable")[:, :5]
    return (intensities[idx] * KNN5_WEIGHTS[None, :]).sum(axis=1)
