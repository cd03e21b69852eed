"""Data layer tests: synthetic scenes, packing, pipeline, native loader,
and the devkit-free nuScenes reader on a fabricated mini table tree."""

import json
import os

import numpy as np
import pytest

from tpu3dssf.data import (
    HostDataPipeline,
    NuScenesDataset,
    SyntheticNuScenes,
    pack_sample,
)


def test_synthetic_contract():
    ds = SyntheticNuScenes(num_samples=3, num_points=1000,
                           image_hw=(45, 80))
    assert len(ds) == 3
    s = ds[0]
    assert s["points"].shape == (1000, 4)
    assert s["labels"].shape == (1000,)
    assert s["labels"].min() >= 0 and s["labels"].max() <= 16
    assert s["images"].shape == (6, 45, 80, 3)
    assert s["cam_intrinsics"].shape == (6, 3, 3)
    assert s["lidar2cam"].shape == (6, 4, 4)
    # deterministic
    s2 = SyntheticNuScenes(num_samples=3, num_points=1000,
                           image_hw=(45, 80))[0]
    np.testing.assert_array_equal(s["points"], s2["points"])


def test_synthetic_projects_into_cameras():
    # the camera ring must actually see a good fraction of the cloud
    from tpu3dssf.geometry import multi_camera_projector
    s = SyntheticNuScenes(num_samples=1, num_points=2000)[0]
    _, _, valid = multi_camera_projector(
        s["points"][:, :3], s["cam_intrinsics"], s["lidar2cam"],
        (900, 1600))
    frac = np.asarray(valid).any(axis=0).mean()
    assert frac > 0.5, f"only {frac:.2%} of points visible in any camera"


def test_pack_sample_pads_and_truncates():
    s = SyntheticNuScenes(num_samples=1, num_points=500)[0]
    p = pack_sample(s, 800)
    assert p["points"].shape == (800, 4)
    assert p["point_valid"].sum() == 500
    assert not p["mask"][500:].any()
    # mask excludes noise labels among real points
    assert p["mask"].sum() == (s["labels"] != 0).sum()

    p2 = pack_sample(s, 300)
    assert p2["points"].shape == (300, 4)
    assert p2["point_valid"].all()


def test_pipeline_batches_and_shuffles():
    ds = SyntheticNuScenes(num_samples=6, num_points=400)
    pipe = HostDataPipeline(ds, batch_size=2, point_capacity=512,
                            shuffle=True, seed=1)
    batches = list(pipe)
    assert len(batches) == 3
    b = batches[0]
    assert b["points"].shape == (2, 512, 4)
    assert b["labels"].shape == (2, 512)
    assert b["images"].shape[0] == 2
    # second epoch shuffles differently (epoch counter advances)
    order1 = [b["num_points"].tolist() for b in batches]
    _ = list(pipe)
    assert len(_) == 3


def test_pipeline_abandoned_iterator_stops_producer():
    # round-5 closing review: abandoning the iterator mid-epoch (break,
    # exception — e.g. the NaN guard aborting training, islice) used to
    # leak the producer thread blocked forever on q.put into the full
    # bounded queue. Closing the generator must terminate it.
    import threading

    ds = SyntheticNuScenes(num_samples=12, num_points=64)
    pipe = HostDataPipeline(ds, batch_size=1, point_capacity=128,
                            prefetch=1)
    before = set(threading.enumerate())
    it = iter(pipe)
    next(it)          # producer fills the prefetch queue and blocks
    it.close()        # GeneratorExit -> stop event -> producer exits
    leaked = [t for t in set(threading.enumerate()) - before
              if t.is_alive()]
    for t in leaked:
        t.join(timeout=5.0)
    assert not any(t.is_alive() for t in leaked), leaked


def test_pipeline_propagates_worker_errors():
    class Broken:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            raise RuntimeError("boom")

    pipe = HostDataPipeline(Broken(), batch_size=1, point_capacity=8)
    with pytest.raises(RuntimeError, match="boom"):
        list(pipe)


# ---------- native C++ loader ----------

def _native_available():
    from tpu3dssf.data.native import get_native_loader
    return get_native_loader() is not None


@pytest.mark.skipif(not _native_available(),
                    reason="csrc/libtpu3dssf_io.so not built")
def test_native_loader_matches_numpy(tmp_path, rng):
    from tpu3dssf.data.native import load_sample_native
    P = 1000
    raw = rng.normal(size=(P, 5)).astype(np.float32)
    labels = rng.integers(0, 32, size=P, dtype=np.uint8)
    lidar = tmp_path / "sweep.bin"
    seg = tmp_path / "labels.bin"
    raw.tofile(lidar)
    labels.tofile(seg)
    lut = (np.arange(32, dtype=np.uint8) % 17)

    out = load_sample_native(str(lidar), str(seg), lut, 1200)
    assert out["num_points"] == P
    np.testing.assert_allclose(out["points"][:P], raw[:, :4], rtol=1e-6)
    np.testing.assert_array_equal(out["labels"][:P], lut[labels])
    assert out["point_valid"][:P].all()
    assert not out["point_valid"][P:].any()
    np.testing.assert_array_equal(out["mask"][:P], lut[labels] != 0)


@pytest.mark.skipif(not _native_available(),
                    reason="csrc/libtpu3dssf_io.so not built")
def test_native_loader_truncates(tmp_path, rng):
    from tpu3dssf.data.native import load_sample_native
    raw = rng.normal(size=(100, 5)).astype(np.float32)
    lidar = tmp_path / "sweep.bin"
    raw.tofile(lidar)
    out = load_sample_native(str(lidar), None,
                             np.arange(32, dtype=np.uint8), 64)
    assert out["num_points"] == 64
    np.testing.assert_allclose(out["points"], raw[:64, :4], rtol=1e-6)


# ---------- fabricated nuScenes table tree ----------

def _make_fake_nuscenes(root, n_scenes=2, samples_per_scene=2,
                        n_points=50, with_images=False,
                        image_hw=(90, 160)):
    """Devkit-format mini tree: table JSONs + lidar/lidarseg .bin files
    (+ optional camera JPEGs) — the on-disk layout the reference devkit
    indexes (utils/dataloader.py:50,63-81)."""
    version = "v1.0-mini"
    tdir = os.path.join(root, version)
    os.makedirs(os.path.join(root, "sweeps"), exist_ok=True)
    os.makedirs(tdir, exist_ok=True)
    rng = np.random.default_rng(0)

    cams = ["CAM_FRONT", "CAM_FRONT_RIGHT", "CAM_BACK_RIGHT",
            "CAM_BACK", "CAM_BACK_LEFT", "CAM_FRONT_LEFT"]
    scenes, samples, sample_data, calibs, lidarsegs = [], [], [], [], []
    # use the official mini-split scene names so split logic engages
    names = ["scene-0061", "scene-0103"]
    for si in range(n_scenes):
        stok = f"scene{si}"
        scenes.append({"token": stok, "name": names[si],
                       "first_sample_token": f"s{si}_0"})
        for j in range(samples_per_scene):
            sample_tok = f"s{si}_{j}"
            data = {}
            # lidar
            lt = f"lid_{si}_{j}"
            lidar_file = f"samples/LIDAR_TOP/{lt}.bin"
            os.makedirs(os.path.join(root, "samples", "LIDAR_TOP"),
                        exist_ok=True)
            pts = rng.normal(size=(n_points, 5)).astype(np.float32)
            pts[:, :3] *= 20.0  # street-scale extents
            pts.tofile(os.path.join(root, lidar_file))
            lab_file = f"lidarseg/{version}/{lt}.bin"
            os.makedirs(os.path.join(root, "lidarseg", version),
                        exist_ok=True)
            rng.integers(0, 32, n_points, dtype=np.uint8).tofile(
                os.path.join(root, lab_file))
            sample_data.append({
                "token": lt, "sample_token": sample_tok,
                "filename": lidar_file,
                "calibrated_sensor_token": "cs_lidar",
                "ego_pose_token": "ego0"})
            lidarsegs.append({"token": lt, "filename": lab_file})
            data["LIDAR_TOP"] = lt
            # cameras (image files only when with_images — most tests
            # run load_images=False)
            for c in cams:
                ct = f"{c}_{si}_{j}"
                img_file = f"samples/{c}/{ct}.jpg"
                sample_data.append({
                    "token": ct, "sample_token": sample_tok,
                    "filename": img_file,
                    "calibrated_sensor_token": f"cs_{c}",
                    "ego_pose_token": "ego0"})
                data[c] = ct
                if with_images:
                    from PIL import Image
                    os.makedirs(os.path.join(root, "samples", c),
                                exist_ok=True)
                    arr = rng.integers(0, 255, image_hw + (3,),
                                       dtype=np.uint8)
                    Image.fromarray(arr).save(
                        os.path.join(root, img_file), quality=70)
            samples.append({"token": sample_tok, "scene_token": stok,
                            "timestamp": j, "data": data})

    calibs.append({"token": "cs_lidar",
                   "rotation": [1, 0, 0, 0], "translation": [0, 0, 1.8],
                   "camera_intrinsic": []})
    for c in cams:
        calibs.append({"token": f"cs_{c}",
                       "rotation": [0.5, -0.5, 0.5, -0.5],
                       "translation": [1.0, 0.0, 1.5],
                       "camera_intrinsic": [[1266, 0, 800],
                                            [0, 1266, 450], [0, 0, 1]]})

    tables = {
        "scene": scenes, "sample": samples, "sample_data": sample_data,
        "calibrated_sensor": calibs, "sensor": [], "lidarseg": lidarsegs,
    }
    for name, rows in tables.items():
        with open(os.path.join(tdir, f"{name}.json"), "w") as f:
            json.dump(rows, f)
    return root


def test_nuscenes_reader_on_fake_tree(tmp_path):
    root = _make_fake_nuscenes(str(tmp_path))
    lm = {i: (i % 17) for i in range(32)}
    train = NuScenesDataset(root, "v1.0-mini", "train",
                            learning_map=lm, load_images=False)
    val = NuScenesDataset(root, "v1.0-mini", "val",
                          learning_map=lm, load_images=False)
    # scene-0061 ∈ MINI_TRAIN, scene-0103 ∈ MINI_VAL
    assert len(train) == 2 and len(val) == 2
    s = train[0]
    assert s["points"].shape == (50, 4)
    assert s["labels"].shape == (50,)
    assert s["labels"].max() <= 16
    assert s["cam_intrinsics"].shape == (6, 3, 3)
    assert s["lidar2cam"].shape == (6, 4, 4)
    # calibration chain sanity: finite, last row [0,0,0,1]
    np.testing.assert_allclose(s["lidar2cam"][:, 3], [[0, 0, 0, 1]] * 6,
                               atol=1e-6)


@pytest.mark.skipif(not _native_available(),
                    reason="csrc/libtpu3dssf_io.so not built")
def test_nuscenes_reader_native_pack(tmp_path):
    root = _make_fake_nuscenes(str(tmp_path))
    lm = {i: (i % 17) for i in range(32)}
    ds = NuScenesDataset(root, "v1.0-mini", "train", learning_map=lm,
                         load_images=False, point_capacity=64)
    s = ds[0]
    assert s.get("packed") is True
    assert s["points"].shape == (64, 4)
    assert s["num_points"] == 50
    packed = pack_sample(s, 64)
    assert packed["points"].shape == (64, 4)
    # consistent with the numpy path
    ds2 = NuScenesDataset(root, "v1.0-mini", "train", learning_map=lm,
                          load_images=False)
    s2 = ds2[0]
    np.testing.assert_allclose(s["points"][:50], s2["points"], rtol=1e-6)
    np.testing.assert_array_equal(s["labels"][:50], s2["labels"])


def test_scene_validity_filter(tmp_path):
    """Scenes whose lidar file is missing on disk are dropped at indexing
    time (reference get_available_scenes, utils/dataloader.py:83-92)."""
    root = _make_fake_nuscenes(str(tmp_path))
    os.remove(os.path.join(root, "samples/LIDAR_TOP/lid_0_0.bin"))
    train = NuScenesDataset(root, "v1.0-mini", "train", load_images=False)
    assert len(train) == 0  # scene-0061's first lidar file is gone
    # opt-out restores table-only indexing
    train2 = NuScenesDataset(root, "v1.0-mini", "train",
                             load_images=False, check_files=False)
    assert len(train2) == 2
    # val scene untouched
    val = NuScenesDataset(root, "v1.0-mini", "val", load_images=False)
    assert len(val) == 2


def test_num_vote_duplicates(tmp_path):
    root = _make_fake_nuscenes(str(tmp_path))
    ds = NuScenesDataset(root, "v1.0-mini", "train", num_vote=3,
                         load_images=False)
    assert len(ds) == 6  # 2 samples x 3 votes
