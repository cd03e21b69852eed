"""Day-1 dress rehearsal (VERDICT r4 task 5): the real CLI entry points
against an on-disk nuScenes-devkit-format tree.

Everything before this test exercised the reader on fake trees
(test_data.py) and the CLIs on synthetic configs (test_cli.py) but never
joined them. Here a devkit-format tree — table JSONs + lidar/lidarseg
``.bin`` files + camera JPEGs — is synthesized on disk, a config points
at it, and ``main_train`` then ``main_test`` run through their actual
entry points: config → index → (native C++) loader → pipeline → train →
checkpoint → test. This is the exact composition that runs on day 1 with
real nuScenes data (reference main_train.py:18-113 +
utils/dataloader.py:105-163).
"""

import os

import numpy as np
import pytest
import yaml

from tests.test_data import _make_fake_nuscenes


@pytest.fixture(scope="module")
def day1_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("nusc")
    _make_fake_nuscenes(str(root), n_points=600, with_images=True)
    return str(root)


@pytest.fixture(scope="module")
def day1_config(day1_tree, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("day1") / "ckpt")
    cfg = {
        "debug": True,  # -> v1.0-mini, exactly the day-1 smoke config
        "dataset_params": {
            "label_mapping": "./configs/label_mapping/nuscenes.yaml",
            "class_weights": [1.0] * 16,
            "train_data_loader": {"data_path": day1_tree, "batch_size": 2,
                                  "shuffle": True, "num_workers": 2},
            "val_data_loader": {"data_path": day1_tree, "batch_size": 2,
                                "shuffle": False, "num_workers": 0},
            "test_data_loader": {"data_path": day1_tree, "batch_size": 1,
                                 "shuffle": False, "num_workers": 0},
            "lidar": {"voxel_size": 0.8},
        },
        "train_params": {
            "train_best_weights": False,
            "best_model_path": ckpt,
            "checkpoint_path": ckpt,
            "image_encoder": "none",
            "mlp_class": 16,
            "max_num_epochs": 1,
            "learning_rate": 0.003,
            "optimizer": "AdamW",
            "lr_scheduler": "none",
            "momentum": 0.9,
            "nesterov": False,
            "weight_decay": 0.0,
            "lambda_lovasz": 1,
        },
        "test_params": {"checkpoint_path": ckpt},
        # same geometry as test_cli's micro config so the jit cache is
        # shared within a pytest process
        "tpu_params": {
            "point_capacity": 1024,
            "voxel_capacity": 512,
            "window_size": 128,
            "intensity_mode": "mean",
            "devoxelize_mode": "own",
            "use_pallas": False,
            "compute_dtype": "float32",
            "mesh_shape": [1],
            # no "dataset" key: defaults to "nuscenes" — the real path
        },
    }
    path = str(tmp_path_factory.mktemp("day1cfg") / "nusc_mini.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path, ckpt


def test_reader_feeds_real_format(day1_tree):
    """The production discovery path: config-style construction against
    the on-disk tree, native packing engaged when the .so is built."""
    from tpu3dssf.config import load_label_mapping
    from tpu3dssf.data import NuScenesDataset
    from tpu3dssf.data.native import get_native_loader

    mapping = load_label_mapping("./configs/label_mapping/nuscenes.yaml")
    lm = {int(k): int(v) for k, v in mapping["learning_map"].items()}
    ds = NuScenesDataset(day1_tree, "v1.0-mini", "train",
                         learning_map=lm, point_capacity=1024)
    assert len(ds) == 2
    s = ds[0]
    if get_native_loader() is not None:
        assert s.get("packed") is True, "native loader did not engage"
        assert s["points"].shape == (1024, 4)
        assert int(s["num_points"]) == 600
    assert s["images"].shape == (6, 90, 160, 3)
    assert s["labels"].max() <= 16
    np.testing.assert_allclose(s["lidar2cam"][:, 3], [[0, 0, 0, 1]] * 6,
                               atol=1e-6)


def test_train_then_test_cli_on_disk_tree(day1_config):
    path, ckpt = day1_config

    from tpu3dssf.cli.main_train import main as train_main
    train_main(["--config", path])
    assert os.path.exists(os.path.join(ckpt, "training_history.png"))
    assert os.path.exists(os.path.join(ckpt, "training_history.json"))
    assert os.path.isdir(os.path.join(ckpt, "last"))

    from tpu3dssf.cli.main_test import main as test_main
    metrics = test_main(["--config", path])
    assert 0.0 <= float(metrics["overall_acc"]) <= 1.0
    assert np.isfinite(float(metrics["loss"]))
    assert os.path.exists(os.path.join(ckpt, "per_class_iou.png"))

    # resume composes on the real format too (preemption-safe last/)
    train_main(["--config", path, "--resume"])
