"""End-to-end strict-parity A/B: reference-parity modes vs defaults.

Runs the SAME params through the full pipeline on one batch in three
configurations and quantifies logit/prediction deltas:

  default      intensity_mode=mean + devoxelize_mode=own
  devox-parity mean + nearest   (isolates the devoxelize divergence,
                                 reference utils/lidar.py:147-155)
  full-parity  knn5 + nearest   (adds the sklearn-5NN intensity
                                 semantics, utils/lidar.py:97-105)

With --config/--checkpoint the comparison runs on TRAINED weights
(meaningful margins); without, on random init (argmax is near-noise —
recorded for completeness only). Writes PARITY_AB.md.

    python scripts/parity_ab.py --config configs/synthetic_convergence_lidar.yaml \
        --checkpoint checkpoints/synthetic/convergence_lidar
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def run(config_path, checkpoint):
    import jax
    import jax.numpy as jnp
    from tpu3dssf.cli import common
    from tpu3dssf.config import load_config

    cfg = load_config(config_path)
    datasets = common.build_datasets(cfg)
    encode_fn, vit_cfg = common.build_image_encoder(cfg)

    batch = common.example_batch(cfg, datasets)
    images = batch.pop("images", None)
    tokens = (encode_fn(images) if encode_fn is not None
              and images is not None
              else common.zero_tokens(cfg, vit_cfg, 1))

    def build(intensity, devox):
        c = dataclasses.replace(
            cfg, tpu=dataclasses.replace(
                cfg.tpu, intensity_mode=intensity,
                devoxelize_mode=devox))
        model, _ = common.build_pipeline(c, vit_cfg)
        return model

    base = build("mean", "own")
    state = common.init_state(cfg, base, batch, tokens)
    trained = False
    if checkpoint:
        from tpu3dssf.train.checkpoint import restore_checkpoint
        state, _, step = restore_checkpoint(checkpoint, None, state)
        print(f"loaded trained params (step {step}) from {checkpoint}")
        trained = True

    variants = {
        "default": ("mean", "own"),
        "devox-parity": ("mean", "nearest"),
        "full-parity": ("knn5", "nearest"),
    }
    logits = {}
    for name, (im, dm) in variants.items():
        model = build(im, dm)
        logits[name] = np.asarray(jax.jit(model.apply)(
            state.params, batch["points"], batch["point_valid"], tokens,
            batch["cam_intrinsics"], batch["lidar2cam"]))

    valid = (np.asarray(batch["point_valid"])
             & (np.asarray(batch["labels"]) != 0))
    ref = logits["full-parity"][valid]
    ref_pred = ref.argmax(-1)
    rows = []
    for name in ("default", "devox-parity"):
        l = logits[name][valid]
        rows.append({
            "variant": name,
            "agreement": float((l.argmax(-1) == ref_pred).mean()),
            "mean_delta": float(np.abs(l - ref).mean()),
            "max_delta": float(np.abs(l - ref).max()),
        })
    acc = None
    labels = np.asarray(batch["labels"])[valid] - 1
    acc = {name: float((logits[name][valid].argmax(-1) == labels).mean())
           for name in variants}
    return {"trained": trained, "valid_points": int(valid.sum()),
            "rows": rows, "acc": acc}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config",
                    default="configs/synthetic_convergence_lidar.yaml")
    ap.add_argument("--checkpoint", default=None,
                    help="Orbax checkpoint dir with trained params")
    ap.add_argument("--out", default="PARITY_AB.md")
    args = ap.parse_args()

    r = run(args.config, args.checkpoint)
    print(r)
    lines = [
        "# Strict-parity A/B — reference-parity modes vs fast defaults",
        "",
        "Same params, same batch, full pipeline (voxelize → PTv3 → "
        "head → devoxelize). Reference point: `full-parity` = "
        "`intensity_mode=knn5` (sklearn 5-NN semantics, "
        "utils/lidar.py:97-105) + `devoxelize_mode=nearest` "
        "(cdist-argmin semantics, utils/lidar.py:147-155).",
        "",
        f"- params: {'TRAINED' if r['trained'] else 'random init'};"
        f" {r['valid_points']} valid points",
        "",
        "| variant | pred agreement vs full-parity | mean delta "
        "| max delta |",
        "|---|---|---|---|",
    ]
    for row in r["rows"]:
        lines.append(
            f"| {row['variant']} | {row['agreement']:.4f} | "
            f"{row['mean_delta']:.3e} | {row['max_delta']:.3e} |")
    lines += [
        "",
        "Point-level accuracy per variant (same batch): "
        + ", ".join(f"{k}={v:.4f}" for k, v in r["acc"].items()),
        "",
        "Per-component parity of the knn5/nearest modes themselves is "
        "oracle-tested in tests/test_voxel.py; the table above bounds "
        "the end-to-end effect of running the fast defaults instead.",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
