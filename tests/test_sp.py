"""Sequence parallelism over the serialized order (tpu3dssf.parallel.sp).

The SURVEY §5 stance implemented: shard the space-filling-curve order
contiguously; windows never span shards, so the only cross-chip traffic
in a PTv3 block is the CPE depthwise conv's one-row ppermute halo.
These tests prove the sharded math equals the single-device math on the
8-device virtual CPU mesh (conftest).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu3dssf.models.ptv3 import PTv3Block, SerializedCPE
from tpu3dssf.parallel import create_mesh, sp_block_apply


def _data(rng, B=2, N=512, C=32):
    x = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    # valid prefix per sample (realistic: padding tail), plus a hole in
    # the interior so halo rows can be masked slots too
    mask = np.ones((B, N), bool)
    mask[0, 400:] = False
    mask[1, 200:230] = False
    return x, jnp.asarray(mask)


def test_sp_cpe_matches_single_device(rng):
    """The halo-exchange CPE equals the zero-padded single-device CPE,
    including across every shard boundary (N=512 over 8 shards puts 7
    interior boundaries under test)."""
    x, mask = _data(rng)
    mesh = create_mesh((8,), ("seq",))
    cpe = SerializedCPE(channels=32)
    params = cpe.init(jax.random.key(0), x, None, None, mask)
    ref = cpe.apply(params, x, None, None, mask)

    cpe_sp = SerializedCPE(channels=32, sp_axis="seq")
    from jax.sharding import PartitionSpec as P
    out = jax.shard_map(
        lambda p, xs, ms: cpe_sp.apply(p, xs, None, None, ms),
        mesh=mesh, in_specs=(P(), P(None, "seq", None), P(None, "seq")),
        out_specs=P(None, "seq", None), check_vma=False)(params, x, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6)


def test_sp_block_matches_single_device(rng):
    """A full PTv3Block (CPE + windowed attention + MLP) sharded over
    the point axis equals the unsharded block. window=16 with
    N_local=64 → 4 whole windows per shard."""
    x, mask = _data(rng)
    mesh = create_mesh((8,), ("seq",))
    mk = lambda sp: PTv3Block(channels=32, heads=2, window=16,
                              mlp_ratio=2.0, use_pallas=False,
                              sp_axis=sp)
    params = mk(None).init(jax.random.key(1), x, None, None, mask)
    ref = mk(None).apply(params, x, None, None, mask)
    out = sp_block_apply(mk("seq"), params, x, mask, mesh, axis="seq")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5)


def test_sp_block_grads_match(rng):
    """SP must also hold under differentiation (the halo ppermute's
    transpose is the reverse ppermute): d(sum(block(x)))/dx equal
    sharded vs unsharded."""
    x, mask = _data(rng)
    mesh = create_mesh((8,), ("seq",))
    mk = lambda sp: PTv3Block(channels=32, heads=2, window=16,
                              mlp_ratio=2.0, use_pallas=False,
                              sp_axis=sp)
    params = mk(None).init(jax.random.key(1), x, None, None, mask)

    g_ref = jax.grad(
        lambda xx: mk(None).apply(params, xx, None, None, mask).sum())(x)
    g_sp = jax.grad(
        lambda xx: sp_block_apply(mk("seq"), params, xx, mask, mesh,
                                  axis="seq").sum())(x)
    np.testing.assert_allclose(np.asarray(g_sp), np.asarray(g_ref),
                               atol=1e-5)


def test_sp_block_pallas_kernel_under_shard_map(rng, monkeypatch):
    """The SP claim "attention is shard-local" must hold for the REAL
    Pallas route too, not just the jnp reference: window=128 routes the
    C=32 stage through window_attention_packed (whole-3C kernel), here
    interpret-traced to HLO (TPU3DSSF_PALLAS_INTERPRET, same mechanism
    as the flagship multichip dryrun) inside the SP shard_map."""
    monkeypatch.setenv("TPU3DSSF_PALLAS_INTERPRET", "1")
    x, mask = _data(rng, N=1024)
    mesh = create_mesh((8,), ("seq",))
    mk = lambda sp: PTv3Block(channels=32, heads=2, window=128,
                              mlp_ratio=2.0, use_pallas=True,
                              sp_axis=sp)
    params = mk(None).init(jax.random.key(1), x, None, None, mask)
    ref = mk(None).apply(params, x, None, None, mask)
    out = sp_block_apply(mk("seq"), params, x, mask, mesh, axis="seq")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5)


def test_sp_block_rejects_bad_shapes_and_orders(rng):
    x, mask = _data(rng, N=520)  # 520 % (8*16) != 0
    mesh = create_mesh((8,), ("seq",))
    blk = PTv3Block(channels=32, heads=2, window=16, mlp_ratio=2.0,
                    use_pallas=False, sp_axis="seq")
    params = PTv3Block(channels=32, heads=2, window=16, mlp_ratio=2.0,
                       use_pallas=False).init(
        jax.random.key(0), x[:, :512], None, None, mask[:, :512])
    with pytest.raises(ValueError, match="multiple of shards"):
        sp_block_apply(blk, params, x, mask, mesh, axis="seq")
    # cross-order permutations are global gathers — refused under SP
    perm = jnp.tile(jnp.arange(512)[None], (2, 1))
    with pytest.raises(ValueError, match="CPE order"):
        blk.apply(params, x[:, :512], perm, perm, mask[:, :512])
