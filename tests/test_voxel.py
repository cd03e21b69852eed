"""Voxelization / devoxelization vs numpy oracles.

Oracle semantics follow reference utils/lidar.py:83-172: per-voxel centroid
downsample, 5-NN weighted intensity, nearest-centroid devoxelization.
"""

import numpy as np
import jax
import jax.numpy as jnp

from tpu3dssf.voxel import (
    voxelize,
    devoxelize_nearest,
    devoxelize_own_voxel,
    knn_intensity_transfer,
)


def _oracle_voxelize(pts, voxel_size):
    """Centroid per occupied cell, cells keyed by floor(xyz / voxel_size)."""
    cells = np.floor(pts[:, :3] / voxel_size).astype(np.int64)
    keys = {}
    for i, c in enumerate(map(tuple, cells)):
        keys.setdefault(c, []).append(i)
    cents = {c: pts[idx, :3].mean(axis=0) for c, idx in keys.items()}
    return keys, cents


def test_voxelize_centroids_match_oracle(rng):
    P, cap = 512, 512
    pts = np.concatenate(
        [rng.normal(size=(P, 3)) * 3.0, rng.random((P, 1))], axis=1
    ).astype(np.float32)
    mask = np.ones(P, dtype=bool)
    res = voxelize(jnp.asarray(pts), jnp.asarray(mask), 0.5, cap)

    _, cents = _oracle_voxelize(pts, 0.5)
    n_vox = len(cents)
    assert int(res.num_voxels) == n_vox

    got = np.asarray(res.voxel_raw)[np.asarray(res.voxel_mask)]
    got_set = {tuple(np.round(c, 4)) for c in got[:, :3]}
    want_set = {tuple(np.round(c, 4)) for c in cents.values()}
    assert got_set == want_set


def test_voxelize_respects_point_mask(rng):
    P, cap = 128, 128
    pts = rng.normal(size=(P, 4)).astype(np.float32) * 5.0
    mask = np.zeros(P, dtype=bool)
    mask[:50] = True
    res = voxelize(jnp.asarray(pts), jnp.asarray(mask), 0.5, cap)
    _, cents = _oracle_voxelize(pts[:50], 0.5)
    assert int(res.num_voxels) == len(cents)
    assert not np.any(np.asarray(res.point_ok)[50:])


def test_voxelize_capacity_overflow(rng):
    P, cap = 256, 16  # far fewer slots than voxels
    pts = (rng.random((P, 4)) * 100).astype(np.float32)
    mask = np.ones(P, dtype=bool)
    res = voxelize(jnp.asarray(pts), jnp.asarray(mask), 0.1, cap)
    assert int(res.num_voxels) <= cap
    # dropped points flagged
    assert np.asarray(res.point_ok).sum() < P
    # surviving assignment consistent: each ok point's cell == its voxel cell
    ok = np.asarray(res.point_ok)
    pv = np.asarray(res.point_voxel)[ok]
    cells = np.floor(pts[ok, :3] / 0.1).astype(np.int32)
    vox_cells = np.floor(
        np.asarray(res.voxel_raw)[:, :3] / 0.1).astype(np.int32)
    # centroids of a cell stay in that cell
    np.testing.assert_array_equal(cells, vox_cells[pv])


def test_point_voxel_assignment_roundtrip(rng):
    P, cap = 300, 300  # voxels ≤ points, so capacity can never overflow
    pts = (rng.normal(size=(P, 4)) * 4).astype(np.float32)
    mask = np.ones(P, dtype=bool)
    res = voxelize(jnp.asarray(pts), jnp.asarray(mask), 0.4, cap)
    ok = np.asarray(res.point_ok)
    assert ok.all()
    pv = np.asarray(res.point_voxel)
    cells_p = np.floor(pts[:, :3] / 0.4).astype(np.int32)
    # all points in one voxel slot share a cell
    for v in np.unique(pv):
        cell_group = cells_p[pv == v]
        assert (cell_group == cell_group[0]).all()


def test_knn_intensity_matches_oracle(rng):
    # reference utils/lidar.py:97-105
    from sklearn_free_oracle import knn5_oracle  # local helper below
    P, V = 200, 40
    pts = rng.normal(size=(P, 3)).astype(np.float32)
    intens = rng.random(P).astype(np.float32)
    cents = rng.normal(size=(V, 3)).astype(np.float32)
    got = np.asarray(knn_intensity_transfer(
        jnp.asarray(cents), jnp.ones(V, bool), jnp.asarray(pts),
        jnp.asarray(intens), jnp.ones(P, bool)))
    want = knn5_oracle(cents, pts, intens)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_devoxelize_nearest_matches_oracle(rng):
    P, V, C = 333, 77, 16
    pts = rng.normal(size=(P, 3)).astype(np.float32) * 10
    cents = rng.normal(size=(V, 3)).astype(np.float32) * 10
    vals = rng.normal(size=(V, C)).astype(np.float32)
    got, idx = devoxelize_nearest(
        jnp.asarray(pts), jnp.ones(P, bool), jnp.asarray(cents),
        jnp.ones(V, bool), jnp.asarray(vals))
    d = ((pts[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
    want_idx = d.argmin(axis=1)
    np.testing.assert_array_equal(np.asarray(idx), want_idx)
    np.testing.assert_allclose(np.asarray(got), vals[want_idx], atol=1e-5)


def test_devoxelize_nearest_is_differentiable(rng):
    # gradient must flow into voxel values (reference keeps autograd
    # through the gather, utils/lidar.py:150-155)
    P, V, C = 64, 16, 4
    pts = jnp.asarray(rng.normal(size=(P, 3)), dtype=jnp.float32)
    cents = jnp.asarray(rng.normal(size=(V, 3)), dtype=jnp.float32)
    vals = jnp.asarray(rng.normal(size=(V, C)), dtype=jnp.float32)

    def loss(v):
        out, _ = devoxelize_nearest(
            pts, jnp.ones(P, bool), cents, jnp.ones(V, bool), v)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(vals)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_devoxelize_own_voxel_consistent_with_nearest(rng):
    # when cells are well-separated, own-voxel == nearest-centroid
    P, cap, C = 256, 256, 8
    pts = (rng.integers(0, 8, size=(P, 3)) * 1.0
           + rng.random((P, 3)) * 0.2).astype(np.float32)
    pts4 = np.concatenate([pts, np.zeros((P, 1), np.float32)], axis=1)
    res = voxelize(jnp.asarray(pts4), jnp.ones(P, bool), 1.0, cap)
    vals = jnp.asarray(rng.normal(size=(cap, C)), dtype=jnp.float32)
    own, _ = devoxelize_own_voxel(res.point_voxel, res.point_ok, vals)
    near, _ = devoxelize_nearest(
        jnp.asarray(pts), jnp.ones(P, bool),
        res.voxel_raw[:, :3], res.voxel_mask, vals)
    np.testing.assert_allclose(np.asarray(own), np.asarray(near), atol=1e-5)


def test_voxelize_jits_and_vmaps(rng):
    B, P, cap = 2, 128, 64
    pts = rng.normal(size=(B, P, 4)).astype(np.float32)
    mask = np.ones((B, P), dtype=bool)
    fn = jax.jit(jax.vmap(lambda p, m: voxelize(p, m, 0.5, 64)))
    res = fn(jnp.asarray(pts), jnp.asarray(mask))
    assert res.voxel_raw.shape == (B, cap, 4)
    assert res.voxel_mask.shape == (B, cap)


def test_knn_pallas_matches_xla_path(rng):
    """Pallas k-NN kernel (interpret mode) == the XLA tiled top-k."""
    from jax.experimental.pallas import tpu as pltpu
    from tpu3dssf.kernels.knn import knn_pallas
    from tpu3dssf.voxel.voxelize import _tiled_topk_neighbors

    Q, R = 128, 256
    q = jnp.asarray(rng.normal(size=(Q, 3)) * 10, jnp.float32)
    r = jnp.asarray(rng.normal(size=(R, 3)) * 10, jnp.float32)
    rmask = jnp.asarray(rng.random(R) > 0.2)
    for k in (1, 5):
        want_d, want_i = _tiled_topk_neighbors(
            q, jnp.ones(Q, bool), r, rmask, k, tile=64)
        with pltpu.force_tpu_interpret_mode():
            got_d, got_i = knn_pallas(q, r, rmask, k)
        np.testing.assert_allclose(np.asarray(got_d),
                                   np.asarray(want_d), rtol=1e-5,
                                   atol=1e-4)
        # ties can legitimately swap indices; distances above pin the
        # semantics, indices must point at equally-near refs
        dd = np.sum((np.asarray(q)[:, None] -
                     np.asarray(r)[np.asarray(got_i)]) ** 2, -1)
        np.testing.assert_allclose(dd, np.asarray(want_d), rtol=1e-5,
                                   atol=1e-4)


def test_voxel_coords_are_exact_member_cells(rng):
    """voxel_coords must equal each member point's own grid cell EXACTLY
    (no f32 re-floor of the centroid, which can round a boundary-hugging
    centroid into the neighboring cell and emit duplicate coords —
    breaking PTv3's unique-cell pooling invariant)."""
    from tpu3dssf.voxel import voxelize

    vs = 0.1  # inexact in f32 on purpose
    # boundary-heavy: many points epsilon-close to cell edges
    base = rng.integers(0, 20, size=(256, 3)).astype(np.float32) * vs
    jitter = rng.choice(
        [1e-7, vs - 1e-7, vs * 0.5], size=(256, 3)).astype(np.float32)
    pts = np.concatenate([base + jitter,
                          rng.random((256, 1)).astype(np.float32)], -1)
    mask = np.ones((512,), bool)
    mask[256:] = False
    pts = np.concatenate([pts, np.zeros((256, 4), np.float32)])

    res = voxelize(jnp.asarray(pts), jnp.asarray(mask), vs, 128)
    coords = np.asarray(res.voxel_coords)
    pv = np.asarray(res.point_voxel)
    ok = np.asarray(res.point_ok)
    cells = np.floor(pts[:, :3] / vs).astype(np.int32)
    np.testing.assert_array_equal(coords[pv[ok]], cells[ok])
    # and occupied coords are unique
    occ = coords[np.asarray(res.voxel_mask)]
    assert len({tuple(c) for c in occ}) == len(occ)
