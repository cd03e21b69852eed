"""End-to-end strict-parity A/B: reference-parity config vs default.

Runs the SAME params through the full SegmentationPipeline twice on one
batch — once in strict reference-parity configuration
(intensity_mode="knn5" + devoxelize_mode="nearest", the exact semantics
of utils/lidar.py:97-105 and 147-155) and once in the default TPU-fast
configuration (in-voxel mean intensity + own-voxel devoxelize) — and
quantifies the logit / prediction delta. Writes PARITY_AB.md.

    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/parity_ab.py --small
    python scripts/parity_ab.py            # full nuScenes scale, on TPU
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def run(small: bool):
    import jax
    import jax.numpy as jnp
    from tpu3dssf.data.pipeline import pack_sample
    from tpu3dssf.data.synthetic import SyntheticNuScenes
    from tpu3dssf.models.fusion import (FusionConfig, PipelineConfig,
                                        SegmentationPipeline)
    from tpu3dssf.models.ptv3 import PTv3Config

    if small:
        P, V, window = 4096, 2048, 128
        ptv3 = PTv3Config(
            orders=("z", "z-trans"),
            enc_depths=(1, 1), enc_channels=(16, 32), enc_heads=(2, 4),
            enc_window=(window, window),
            dec_depths=(1,), dec_channels=(64,), dec_heads=(4,),
            dec_window=(window,), use_pallas=False)
        n_pts = 4000
    else:
        P, V, window = 34816, 25600, 1024
        ptv3 = PTv3Config(enc_window=(window,) * 5,
                          dec_window=(window,) * 4,
                          use_pallas=jax.default_backend() != "cpu")
        n_pts = 34000

    tok_dim = 16 if small else 384

    def cfg(intensity, devox):
        return PipelineConfig(
            fusion=FusionConfig(patch_tok_dim=tok_dim), ptv3=ptv3,
            voxel_size=0.1, voxel_capacity=V,
            intensity_mode=intensity, devoxelize_mode=devox)

    ds = SyntheticNuScenes(num_samples=1, num_points=n_pts, seed=7)
    s = pack_sample(ds[0], P)
    pts = jnp.asarray(s["points"])[None]
    pmask = jnp.asarray(s["point_valid"])[None]
    labels = np.asarray(s["labels"])[None]
    K = jnp.asarray(s["cam_intrinsics"])[None]
    Rt = jnp.asarray(s["lidar2cam"])[None]
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(
        rng.normal(size=(1, 6, 2840, tok_dim)) * 0.05, jnp.float32)

    default = SegmentationPipeline(cfg("mean", "own"))
    parity = SegmentationPipeline(cfg("knn5", "nearest"))
    params = jax.jit(default.init)(
        jax.random.PRNGKey(0), pts, pmask, tokens, K, Rt)

    out_d = np.asarray(jax.jit(default.apply)(
        params, pts, pmask, tokens, K, Rt))
    out_p = np.asarray(jax.jit(parity.apply)(
        params, pts, pmask, tokens, K, Rt))

    valid = np.asarray(pmask)[0] & (labels[0] != 0)
    ld, lp = out_d[0][valid], out_p[0][valid]
    pred_d, pred_p = ld.argmax(-1), lp.argmax(-1)
    agree = float((pred_d == pred_p).mean())
    denom = np.abs(lp).max()
    return {
        "scale": "small" if small else "nuScenes-scale",
        "valid_points": int(valid.sum()),
        "pred_agreement": agree,
        "mean_abs_logit_delta": float(np.abs(ld - lp).mean()),
        "max_abs_logit_delta": float(np.abs(ld - lp).max()),
        "rel_logit_delta": float(np.abs(ld - lp).max() / denom),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="tiny PTv3 + 4k points (CPU-friendly)")
    ap.add_argument("--out", default="PARITY_AB.md")
    args = ap.parse_args()

    r = run(args.small)
    print(r)
    lines = [
        "# Strict-parity A/B — reference-parity vs default config",
        "",
        "Same params, same batch, full pipeline "
        "(voxelize → PTv3 → fusion → devoxelize). Parity config: "
        "`intensity_mode=knn5` (sklearn 5-NN semantics, "
        "utils/lidar.py:97-105) + `devoxelize_mode=nearest` "
        "(cdist-argmin semantics, utils/lidar.py:147-155). Default: "
        "in-voxel mean intensity + own-voxel devoxelize.",
        "",
        f"- scale: {r['scale']}  ({r['valid_points']} valid points)",
        f"- prediction agreement: **{r['pred_agreement']:.4f}**",
        f"- mean |logit delta|: {r['mean_abs_logit_delta']:.3e}",
        f"- max |logit delta|: {r['max_abs_logit_delta']:.3e} "
        f"({r['rel_logit_delta']:.2%} of max |logit|)",
        "",
        "Deltas come from (a) intensity transfer (5-NN weighted vs "
        "in-voxel mean — different by design, feeds PTv3's 4th input "
        "channel) and (b) devoxelize tie-breaks where a point's nearest "
        "centroid is not its own cell's. Per-component parity of the "
        "knn5/nearest modes themselves is oracle-tested in "
        "tests/test_voxel.py; prediction-level agreement here bounds "
        "the end-to-end effect of running the fast defaults.",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
