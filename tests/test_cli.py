"""In-process CLI smoke tests on a micro synthetic config."""

import os

import numpy as np
import pytest
import yaml


@pytest.fixture(scope="module")
def micro_config(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    ckpt = str(root / "ckpt")
    cfg = {
        "debug": True,
        "dataset_params": {
            "label_mapping": "./configs/label_mapping/nuscenes.yaml",
            "class_weights": [1.0] * 16,
            "train_data_loader": {"data_path": "", "batch_size": 2,
                                  "shuffle": True, "num_workers": 0},
            "val_data_loader": {"data_path": "", "batch_size": 2,
                                "shuffle": False, "num_workers": 0},
            "test_data_loader": {"data_path": "", "batch_size": 1,
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
        "tpu_params": {
            "point_capacity": 1024,
            "voxel_capacity": 512,
            "window_size": 128,
            "intensity_mode": "mean",
            "devoxelize_mode": "own",
            "use_pallas": False,
            "compute_dtype": "float32",
            "mesh_shape": [1],
            "dataset": "synthetic",
        },
    }
    path = str(root / "micro.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path, ckpt


def test_train_test_sample_infer_cli(micro_config):
    path, ckpt = micro_config

    from tpu3dssf.cli.main_train import main as train_main
    train_main(["--config", path])
    assert os.path.exists(os.path.join(ckpt, "training_history.png"))
    assert os.path.exists(os.path.join(ckpt, "metrics.jsonl"))

    from tpu3dssf.cli.main_test import main as test_main
    metrics = test_main(["--config", path])
    assert 0.0 <= float(metrics["overall_acc"]) <= 1.0
    assert os.path.exists(os.path.join(ckpt, "per_class_iou.png"))

    from tpu3dssf.cli.main_sample import main as sample_main
    sample_main(["--config", path])
    assert os.path.exists(os.path.join(ckpt, "segmentation_result.html"))
    assert os.path.exists(os.path.join(ckpt, "cam_0_prediction.png"))

    from tpu3dssf.cli.main_infer import main as infer_main
    m = infer_main(["--config", path, "--split", "val"])
    assert 0.0 <= float(m["overall_acc"]) <= 1.0


def test_sweep_launcher(micro_config, tmp_path):
    """scripts/sweep.py — the SLURM job-array equivalent — runs one
    params line by index."""
    path, ckpt = micro_config
    params_file = str(tmp_path / "sweep.txt")
    with open(params_file, "w") as f:
        f.write("# comment line ignored\n")
        f.write(f"--config {path}\n")
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "sweep", os.path.join(os.path.dirname(__file__), "..",
                              "scripts", "sweep.py"))
    sweep = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sweep)
    import sys
    argv = sys.argv
    sys.argv = ["sweep.py", "--params", params_file, "--index", "0"]
    try:
        sweep.main()
    finally:
        sys.argv = argv
    assert os.path.exists(os.path.join(ckpt, "training_history.png"))


def test_viz_functions(tmp_path, rng):
    from tpu3dssf.utils.viz import (plot_comparison_cloud,
                                    plot_iou_per_class,
                                    plot_images_with_point_cloud,
                                    plot_training_history)
    d = str(tmp_path)
    p = plot_training_history([0.1, 0.5], [0.2, 0.4], d)
    assert os.path.getsize(p) > 0
    p = plot_iou_per_class(rng.random(16), {i + 1: f"c{i}" for i in
                                            range(16)}, d)
    assert os.path.getsize(p) > 0
    pts = rng.normal(size=(500, 3)) * 10
    gt = rng.integers(1, 17, 500)
    pr = rng.integers(1, 17, 500)
    p = plot_comparison_cloud(pts, gt, pr, d)
    html = open(p).read()
    assert "canvas" in html and "rgb(" in html

    imgs = rng.integers(0, 255, (6, 90, 160, 3), dtype=np.uint8)
    K = np.zeros((6, 3, 3), np.float32)
    K[:, 0, 0] = K[:, 1, 1] = 1266.0
    K[:, 0, 2], K[:, 1, 2], K[:, 2, 2] = 800, 450, 1
    Rt = np.tile(np.eye(4, dtype=np.float32), (6, 1, 1))
    paths = plot_images_with_point_cloud(imgs, pts, pr, gt, K, Rt, d)
    assert len(paths) == 6 and all(os.path.getsize(x) > 0 for x in paths)
