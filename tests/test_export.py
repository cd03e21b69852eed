"""StableHLO export roundtrip (tpu3dssf/export.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from tpu3dssf.export import export_infer_bytes, load_exported
from tpu3dssf.models.fusion import (FusionConfig, PipelineConfig,
                                    SegmentationPipeline)
from tpu3dssf.models.ptv3 import PTv3Config


def _tiny_pipeline():
    ptv3 = PTv3Config(
        orders=("z", "z-trans"),
        enc_depths=(1, 1), enc_channels=(8, 16), enc_heads=(1, 2),
        enc_window=(16, 16),
        dec_depths=(1,), dec_channels=(16,), dec_heads=(2,),
        dec_window=(16,), use_pallas=False)
    cfg = PipelineConfig(
        fusion=FusionConfig(patch_tok_dim=8, hidden_dims=(16, 16),
                            point_feat_dim=16),
        ptv3=ptv3, voxel_size=0.5, voxel_capacity=64)
    return SegmentationPipeline(cfg)


def test_export_roundtrip(rng, tmp_path):
    """Serialized artifact must reproduce model.apply exactly (same
    program, same platform) after a disk roundtrip."""
    model = _tiny_pipeline()
    B, P = 1, 128
    pts = jnp.asarray(np.concatenate(
        [rng.normal(size=(B, P, 3)) * 3, rng.random((B, P, 1))], -1),
        jnp.float32)
    valid = jnp.ones((B, P), bool)
    tokens = jnp.asarray(rng.normal(size=(B, 6, 2840, 8)) * 0.02,
                         jnp.float32)
    K = np.zeros((B, 6, 3, 3), np.float32)
    K[:, :, 0, 0] = K[:, :, 1, 1] = 1266.0
    K[:, :, 0, 2], K[:, :, 1, 2], K[:, :, 2, 2] = 800.0, 450.0, 1.0
    K = jnp.asarray(K)
    Rt = jnp.asarray(np.tile(np.eye(4, dtype=np.float32),
                             (B, 6, 1, 1)))
    params = model.init(jax.random.PRNGKey(0), pts, valid, tokens, K, Rt)

    def infer(p, v, t, k, rt):
        return model.apply(params, p, v, t, k, rt)

    # compare against the JITTED forward — the artifact serializes
    # exactly that program (eager CPU execution fuses differently and
    # drifts ~1e-4)
    want = jax.jit(infer)(pts, valid, tokens, K, Rt)

    blob = export_infer_bytes(infer, (pts, valid, tokens, K, Rt))
    path = tmp_path / "model.shlo"
    path.write_bytes(blob)

    f = load_exported(path.read_bytes())
    got = f(pts, valid, tokens, K, Rt)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        got, want)
