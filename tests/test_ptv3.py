"""PTv3 model tests (tiny config, CPU, jnp attention path)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu3dssf.models.ptv3 import (
    PointTransformerV3,
    PTv3Config,
    _pool_structure,
)


def tiny_config(**kw):
    base = dict(
        in_channels=4,
        orders=("z", "z-trans"),
        enc_depths=(1, 1),
        enc_channels=(8, 16),
        enc_heads=(1, 2),
        enc_window=(16, 16),
        dec_depths=(1,),
        dec_channels=(8,),
        dec_heads=(1,),
        dec_window=(16,),
        use_pallas=False,
    )
    base.update(kw)
    return PTv3Config(**base)


def _inputs(rng, B=2, N=64):
    pts = (rng.normal(size=(B, N, 3)) * 4).astype(np.float32)
    feat = np.concatenate(
        [pts, rng.random((B, N, 1)).astype(np.float32)], axis=-1)
    grid = np.floor(pts / 0.5).astype(np.int32)
    mask = np.ones((B, N), bool)
    mask[:, N - 10:] = False
    return jnp.asarray(feat), jnp.asarray(grid), jnp.asarray(mask)


def test_pool_structure_groups_by_coarse_cell(rng):
    N = 32
    grid = jnp.asarray(rng.integers(-8, 8, size=(1, N, 3)), jnp.int32)
    mask = jnp.ones((1, N), bool)
    _check_pool(grid, mask)


def test_pool_structure_with_precomputed_perm(rng):
    # the sort-reuse path: pooling over an existing hierarchical-curve
    # permutation must produce the identical grouping
    from tpu3dssf.serialization import serialization_keys, argsort_lex
    N = 64
    grid = jnp.asarray(rng.integers(-8, 8, size=(1, N, 3)), jnp.int32)
    mask = jnp.asarray(rng.random((1, N)) > 0.2)
    for order_name in ("z", "hilbert"):
        hi, lo = serialization_keys(grid[0], order_name)
        perm = argsort_lex(hi, lo, mask[0])[None]
        _, _, g1, m1, p1, ok1 = _pool_structure(grid, mask, 64, perm)
        _, _, g2, m2, p2, ok2 = _pool_structure(grid, mask, 64)
        # same number of cells; same parent-cell coords per point
        assert np.asarray(m1).sum() == np.asarray(m2).sum()
        np.testing.assert_array_equal(np.asarray(ok1), np.asarray(ok2))
        np.testing.assert_array_equal(
            np.asarray(g1)[0][np.asarray(p1)[0][np.asarray(ok1)[0]]],
            np.asarray(g2)[0][np.asarray(p2)[0][np.asarray(ok2)[0]]])


def _check_pool(grid, mask):
    seg_s, order, grid_out, mask_out, parent, parent_ok = _pool_structure(
        grid, mask, 32)
    coarse = np.asarray(grid)[0] >> 1
    n_cells = len({tuple(c) for c in coarse})
    assert int(np.asarray(mask_out).sum()) == n_cells
    # every point's parent cell coords match its own coarse coords
    g_out = np.asarray(grid_out)[0]
    par = np.asarray(parent)[0]
    assert np.asarray(parent_ok).all()
    np.testing.assert_array_equal(g_out[par], coarse)


@pytest.mark.parametrize("collapse", [True, False])
def test_forward_shapes_and_mask(rng, collapse):
    cfg = tiny_config(collapse_pooled_orders=collapse)
    feat, grid, mask = _inputs(rng)
    model = PointTransformerV3(cfg)
    params = model.init(jax.random.PRNGKey(0), feat, grid, mask)
    out, out_mask = model.apply(params, feat, grid, mask)
    assert out.shape == (2, 64, cfg.out_channels)
    np.testing.assert_array_equal(np.asarray(out_mask), np.asarray(mask))
    # padding slots stay zero
    assert np.abs(np.asarray(out)[~np.asarray(mask)]).max() == 0.0
    assert np.isfinite(np.asarray(out)).all()


def test_forward_is_deterministic(rng):
    cfg = tiny_config()
    feat, grid, mask = _inputs(rng)
    model = PointTransformerV3(cfg)
    params = model.init(jax.random.PRNGKey(0), feat, grid, mask)
    o1, _ = model.apply(params, feat, grid, mask)
    o2, _ = model.apply(params, feat, grid, mask)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_gradients_flow_to_all_params(rng):
    cfg = tiny_config()
    feat, grid, mask = _inputs(rng, B=1)
    model = PointTransformerV3(cfg)
    params = model.init(jax.random.PRNGKey(0), feat, grid, mask)

    def loss(p):
        out, m = model.apply(p, feat, grid, mask)
        return jnp.sum(out ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    nonzero = sum(float(jnp.abs(g).sum()) > 0 for g in leaves)
    # every block participates (a few biases may be zero-grad; bulk must
    # be nonzero)
    assert nonzero / len(leaves) > 0.8


def test_permutation_invariance(rng):
    # shuffling input points (and their masks) must permute outputs
    # identically — the serialization sort makes the model order-agnostic
    cfg = tiny_config()
    feat, grid, mask = _inputs(rng, B=1)
    model = PointTransformerV3(cfg)
    params = model.init(jax.random.PRNGKey(0), feat, grid, mask)
    out1, _ = model.apply(params, feat, grid, mask)

    perm = rng.permutation(64)
    out2, _ = model.apply(
        params, feat[:, perm], grid[:, perm], mask[:, perm])
    np.testing.assert_allclose(
        np.asarray(out1)[:, perm], np.asarray(out2), atol=2e-5)


@pytest.mark.parametrize("collapse", [True, False])
def test_three_stage_pyramid(rng, collapse):
    cfg = tiny_config(
        enc_depths=(1, 1, 1), enc_channels=(8, 16, 16),
        enc_heads=(1, 2, 2), enc_window=(16, 16, 16),
        dec_depths=(1, 1), dec_channels=(8, 16), dec_heads=(1, 2),
        dec_window=(16, 16), collapse_pooled_orders=collapse,
    )
    feat, grid, mask = _inputs(rng, B=1, N=128)
    model = PointTransformerV3(cfg)
    params = model.init(jax.random.PRNGKey(0), feat, grid, mask)
    out, _ = model.apply(params, feat, grid, mask)
    assert out.shape == (1, 128, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_collapsed_orders_match_reserialize_on_nonneg_grid(rng):
    """collapse_pooled_orders=True must EXACTLY reproduce the
    re-serializing path whenever no Morton comparison can flip between
    the two lattice translations — true for all-non-negative coords,
    where c + 2^14 and c + 2^15 share constant high bits across every
    point, so the re-derived coarse sort is the identity and both modes
    run the same values through the same blocks. Multi-order, multi-
    stage config so relative perms and the decoder parent path are all
    exercised in collapsed mode."""
    N = 128
    pts = (rng.random((1, N, 3)) * 8).astype(np.float32)
    feat = np.concatenate(
        [pts, rng.random((1, N, 1)).astype(np.float32)], axis=-1)
    grid = np.floor(pts / 0.25).astype(np.int32)
    assert (grid >= 0).all()
    mask = np.ones((1, N), bool)
    mask[:, N - 10:] = False
    feat, grid, mask = jnp.asarray(feat), jnp.asarray(grid), \
        jnp.asarray(mask)
    kw = dict(
        orders=("z", "z-trans", "hilbert"),
        enc_depths=(2, 2, 2), enc_channels=(8, 16, 16),
        enc_heads=(1, 2, 2), enc_window=(16, 16, 16),
        dec_depths=(2, 2), dec_channels=(8, 16), dec_heads=(1, 2),
        dec_window=(16, 16),
    )
    m_new = PointTransformerV3(tiny_config(collapse_pooled_orders=True,
                                           **kw))
    m_old = PointTransformerV3(tiny_config(collapse_pooled_orders=False,
                                           **kw))
    params = m_new.init(jax.random.PRNGKey(0), feat, grid, mask)
    out_new, _ = m_new.apply(params, feat, grid, mask)
    out_old, _ = m_old.apply(params, feat, grid, mask)
    np.testing.assert_array_equal(np.asarray(out_new),
                                  np.asarray(out_old))


def test_remat_matches_plain_and_backprops(rng):
    feat, grid, mask = _inputs(rng, B=1)
    cfg_p = tiny_config(remat=False)
    cfg_r = tiny_config(remat=True)
    model_p = PointTransformerV3(cfg_p)
    model_r = PointTransformerV3(cfg_r)
    params = model_p.init(jax.random.PRNGKey(0), feat, grid, mask)
    out_p, _ = model_p.apply(params, feat, grid, mask)
    out_r, _ = model_r.apply(params, feat, grid, mask)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r),
                               atol=1e-6)

    def loss(p):
        o, _ = model_r.apply(p, feat, grid, mask)
        return jnp.sum(o ** 2)

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree.leaves(g))


def test_remat_attention_matches_plain(rng):
    """Selective attention-branch remat: same params, same forward,
    same gradients as the plain model (it only changes what the
    backward recomputes)."""
    feat, grid, mask = _inputs(rng, B=1)
    cfg_p = tiny_config()
    cfg_r = tiny_config(remat_attention=True)
    model_p = PointTransformerV3(cfg_p)
    model_r = PointTransformerV3(cfg_r)
    params = model_p.init(jax.random.PRNGKey(0), feat, grid, mask)
    out_p, _ = model_p.apply(params, feat, grid, mask)
    out_r, _ = model_r.apply(params, feat, grid, mask)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r),
                               atol=1e-6)

    def loss(m, p):
        o, _ = m.apply(p, feat, grid, mask)
        return jnp.sum(o ** 2)

    g_p = jax.grad(lambda p: loss(model_p, p))(params)
    g_r = jax.grad(lambda p: loss(model_r, p))(params)
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5)


def test_capacity_schedule():
    cfg = PTv3Config()
    caps = cfg.capacities(32768)
    assert caps[0] == 32768
    assert all(c % w == 0 for c, w in zip(caps, cfg.enc_window))
    assert all(caps[i] >= caps[i + 1] for i in range(len(caps) - 1))


def test_sorted_pool_run_max_matches_segment_max(rng):
    """The presorted pooling path (shifted run-max + end-pos gather)
    must equal a plain segment_max oracle on UNIQUE sorted cells (the
    model invariant: each fine slot is a distinct cell, so a coarse
    cell has <= 8 contiguous children)."""
    from tpu3dssf.models.ptv3 import (_pool_structure_sorted,
                                      _run_max_sorted)

    # unique 3D cells in HIERARCHICAL-curve (Morton) order — the model
    # invariant: the stream is sorted along a space-filling curve, so
    # points of one coarse cell are contiguous — with a masked tail
    from tpu3dssf.serialization import serialization_keys, argsort_lex
    cells = rng.choice(10 ** 3, size=48, replace=False)
    grid = np.stack([cells // 100, (cells // 10) % 10, cells % 10],
                    axis=-1).astype(np.int32)[None]
    mask = np.ones((1, 48), bool)
    hi, lo = serialization_keys(jnp.asarray(grid[0]), "z")
    zperm = np.asarray(argsort_lex(hi, lo, jnp.asarray(mask[0])))
    grid = grid[:, zperm]
    mask[:, 44:] = False
    out_cap = 32

    seg, grid_out, mask_out, parent, ok, end_pos = jax.jit(
        lambda g, m: _pool_structure_sorted(g, m, out_cap))(
            jnp.asarray(grid), jnp.asarray(mask))
    h = jnp.asarray(rng.normal(size=(1, 48, 5)), jnp.float32)
    pooled = jax.vmap(_run_max_sorted)(h, seg, end_pos)

    # numpy oracle
    segn = np.asarray(seg)[0]
    hn = np.asarray(h)[0]
    okn = np.asarray(ok)[0]
    want = np.full((out_cap, 5), -np.inf)
    for i in range(48):
        if okn[i]:
            want[segn[i]] = np.maximum(want[segn[i]], hn[i])
    got = np.asarray(pooled)[0]
    mo = np.asarray(mask_out)[0]
    np.testing.assert_allclose(got[mo], want[mo], rtol=1e-6)
    # structural invariants: occupied slots are a prefix; parents map
    # to matching coarse coords
    assert mo.sum() == len({tuple(c) for c in (grid[0] >> 1)[okn]})
    coarse = grid[0] >> 1
    gn = np.asarray(grid_out)[0]
    pn = np.asarray(parent)[0]
    np.testing.assert_array_equal(gn[pn[okn]], coarse[okn])


def test_pooling_duplicate_cells_exact_with_unique_cells_false(rng):
    """Raw (non-voxelized) grid coords can repeat a cell >8 times; the
    run-max fast path silently truncates such runs (documented
    invariant), so unique_cells=False must route the first pooling
    through an exact segment_max. This test builds a 12-long duplicate
    run whose max sits at the run head — exactly the case run-max
    loses — and checks the exact path against a numpy oracle."""
    from tpu3dssf.models.ptv3 import SerializedPooling
    from tpu3dssf.serialization import serialization_keys, argsort_lex

    N, out_cap = 48, 32
    cells = rng.choice(10 ** 3, size=N - 11, replace=False)
    grid = np.stack([cells // 100, (cells // 10) % 10, cells % 10],
                    axis=-1).astype(np.int32)
    # duplicate the first cell 12x (one run of 12 after sorting)
    grid = np.concatenate([np.repeat(grid[:1], 12, axis=0), grid[1:]])[None]
    mask = np.ones((1, N), bool)
    hi, lo = serialization_keys(jnp.asarray(grid[0]), "z")
    zperm = np.asarray(argsort_lex(hi, lo, jnp.asarray(mask[0])))
    grid = grid[:, zperm]

    h = jnp.asarray(rng.normal(size=(1, N, 5)), jnp.float32)
    pool = SerializedPooling(5, out_cap, presorted=True,
                             unique_cells=False)
    params = pool.init(jax.random.PRNGKey(0), h, jnp.asarray(grid),
                       jnp.asarray(mask))
    # identity-project so pooled values ARE the segment maxima
    params = jax.tree.map(lambda x: x, params)
    params["params"]["proj"]["kernel"] = jnp.eye(5)
    params["params"]["proj"]["bias"] = jnp.zeros(5)
    pooled, grid_out, mask_out, parent, parent_ok = pool.apply(
        params, h, jnp.asarray(grid), jnp.asarray(mask))

    # numpy oracle over coarse cells (pre-norm: recompute the pool's
    # segment max by re-deriving segments from contiguous coarse runs)
    coarse = np.asarray(grid)[0] >> 1
    seg = np.zeros(N, np.int64)
    for i in range(1, N):
        seg[i] = seg[i - 1] + (tuple(coarse[i]) != tuple(coarse[i - 1]))
    hn = np.asarray(h)[0]
    want = np.full((int(seg[-1]) + 1, 5), -np.inf)
    for i in range(N):
        want[seg[i]] = np.maximum(want[seg[i]], hn[i])

    # compare against the raw segment max the module should have used:
    # re-apply its norm+gelu to the oracle
    import flax.linen as nn
    ln = params["params"]["norm"]
    mo = np.asarray(mask_out)[0]
    want = want[:mo.sum()]  # cells beyond capacity are dropped
    normed = nn.LayerNorm().apply({"params": ln}, jnp.asarray(want))
    want_out = np.asarray(nn.gelu(normed))
    np.testing.assert_allclose(np.asarray(pooled)[0][mo], want_out,
                               rtol=2e-5, atol=2e-6)

    # and prove the guard matters: the run-max path differs here
    pool_fast = SerializedPooling(5, out_cap, presorted=True,
                                  unique_cells=True)
    pooled_fast, *_ = pool_fast.apply(params, h, jnp.asarray(grid),
                                      jnp.asarray(mask))
    assert not np.allclose(np.asarray(pooled_fast)[0][mo],
                           np.asarray(pooled)[0][mo])


def test_model_runs_with_unique_cells_false(rng):
    feat, grid, mask = _inputs(rng, B=1)
    model = PointTransformerV3(tiny_config(unique_cells=False))
    params = model.init(jax.random.PRNGKey(0), feat, grid, mask)
    out, out_mask = model.apply(params, feat, grid, mask)
    assert np.all(np.isfinite(np.asarray(out)))


def test_scan_blocks_forward_and_grads(rng):
    """scan_blocks compiles each stage's blocks as one nn.scan: forward
    must be finite, permutation-invariant, and differentiable; HLO must
    be substantially smaller than the unrolled form."""
    import jax.numpy as jnp

    feat, grid, mask = _inputs(rng, B=1)
    cfg = tiny_config(enc_depths=(2, 2), dec_depths=(2,),
                      scan_blocks=True)
    model = PointTransformerV3(cfg)
    params = model.init(jax.random.PRNGKey(0), feat, grid, mask)
    out, _ = model.apply(params, feat, grid, mask)
    assert np.all(np.isfinite(np.asarray(out)))

    # scanned param tree: stage blocks stacked along a leading axis
    enc0 = params["params"]["enc0_scan"]
    assert enc0["mlp_in"]["kernel"].shape[0] == 2

    # permutation invariance (same property the unrolled model has)
    perm = rng.permutation(feat.shape[1])
    params2 = model.init(jax.random.PRNGKey(0), feat[:, perm],
                         grid[:, perm], mask[:, perm])
    out2, _ = model.apply(params2, feat[:, perm], grid[:, perm],
                          mask[:, perm])
    # params depend on init input order only through shapes -> identical
    np.testing.assert_allclose(
        np.asarray(out2[0][np.argsort(perm)][mask[0]]),
        np.asarray(out[0][mask[0]]), rtol=2e-4, atol=2e-5)

    def loss(p):
        o, _ = model.apply(p, feat, grid, mask)
        return jnp.sum(o ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    nonzero = sum(bool(np.any(np.asarray(l))) for l in leaves)
    assert nonzero >= len(leaves) - 2  # dp gates may be zero

    # HLO shrinks (modestly at tiny scale — serialization/pooling HLO
    # dominates there; at bench scale the saving is ~11%: 1.21 -> 1.07
    # MB, block bodies are ~18% of PTv3's ops)
    un = PointTransformerV3(tiny_config(enc_depths=(2, 2),
                                        dec_depths=(2,)))
    pu = un.init(jax.random.PRNGKey(0), feat, grid, mask)
    t_scan = jax.jit(lambda p, f, g2, m: model.apply(p, f, g2, m)[0]
                     ).lower(params, feat, grid, mask).as_text()
    t_un = jax.jit(lambda p, f, g2, m: un.apply(p, f, g2, m)[0]
                   ).lower(pu, feat, grid, mask).as_text()
    assert len(t_scan) < len(t_un)


def test_serialized_attention_packed_matches_fallback(rng):
    """use_pallas + K % 128 == 0 + C % 128 == 0 routes windows through
    the packed flash kernel (one attention kernel for ViT and PTv3); it
    must agree with the XLA window_attention fallback, masked tail and
    permutation included. C must be a multiple of 128 — the packed
    kernel's channel-block in_specs fail the real-TPU Mosaic lowering
    otherwise (PTv3 stages with C ∈ {32, 64} take the window kernel)."""
    from jax.experimental.pallas import tpu as pltpu
    from tpu3dssf.models.ptv3 import SerializedAttention

    B, N, C, H, K = 2, 256, 128, 2, 128
    x = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    mask = np.ones((B, N), bool)
    mask[:, N - 37:] = False          # ragged tail inside the last window
    mask = jnp.asarray(mask)
    perm = jnp.stack([jnp.asarray(rng.permutation(N).astype(np.int32))
                      for _ in range(B)])
    inv = jnp.argsort(perm, axis=1).astype(jnp.int32)

    ref_attn = SerializedAttention(C, H, K, use_pallas=False)
    params = ref_attn.init(jax.random.PRNGKey(0), x, perm, inv, mask)
    want = ref_attn.apply(params, x, perm, inv, mask)

    packed = SerializedAttention(C, H, K, use_pallas=True)
    with pltpu.force_tpu_interpret_mode():
        got = packed.apply(params, x, perm, inv, mask)

    np.testing.assert_allclose(
        np.asarray(got)[np.asarray(mask)],
        np.asarray(want)[np.asarray(mask)], rtol=2e-4, atol=2e-5)


def test_packed_route_many_heads_matches_window_path(rng):
    """K=128/C=256/H=16 geometry takes the packed flash route with
    head_group=8 (the s4-style many-head branch; CPU test configs use
    K=16 windows and never reach it). Must match the XLA window path."""
    from jax.experimental.pallas import tpu as pltpu
    from tpu3dssf.models.ptv3 import SerializedAttention

    B, N, C, H = 1, 128, 256, 16
    x = jnp.asarray(rng.normal(size=(B, N, C)) * 0.1, jnp.float32)
    mask = jnp.asarray(rng.random((B, N)) > 0.2)
    attn_p = SerializedAttention(C, H, 128, use_pallas=True)
    attn_x = SerializedAttention(C, H, 128, use_pallas=False)
    params = attn_x.init(jax.random.PRNGKey(0), x, None, None, mask)
    want = attn_x.apply(params, x, None, None, mask)
    with pltpu.force_tpu_interpret_mode():
        got = attn_p.apply(params, x, None, None, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_depthwise_conv3_matches_nn_conv(rng):
    """_DepthwiseConv3 advertises bit-level drop-in compatibility with
    ``nn.Conv(C, (3,), feature_group_count=C, padding=SAME)`` — same
    param names/shapes so existing checkpoints load unchanged. Guard the
    numerical equivalence (a silent drift here would change every CPE
    output while old checkpoints still load)."""
    import flax.linen as nn
    from tpu3dssf.models.ptv3 import _DepthwiseConv3

    C = 8
    x = jnp.asarray(rng.normal(size=(2, 16, C)), jnp.float32)
    dw = _DepthwiseConv3(C)
    params = dw.init(jax.random.PRNGKey(0), x)
    conv = nn.Conv(C, (3,), feature_group_count=C, padding="SAME")
    want = conv.apply(params, x)  # same param dict loads directly
    got = dw.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_many_heads_without_legal_group_takes_window_kernel(
        rng, monkeypatch):
    """C=128/H=16 (D=8): no 128-aligned head group exists, so the packed
    route must NOT run — a single many-head packed body is exactly the
    Mosaic shape the remote AOT compiler rejects (PERF.md ViT-L). The
    (W, K, H, D) window kernel handles it instead."""
    import importlib

    from jax.experimental.pallas import tpu as pltpu
    from tpu3dssf.models.ptv3 import SerializedAttention

    # the kernels package re-exports the flash_attention FUNCTION, which
    # shadows the submodule attribute — fetch the module itself
    fa = importlib.import_module("tpu3dssf.kernels.flash_attention")
    assert fa.pick_head_group(16, 128) is None

    def boom(*a, **k):
        raise AssertionError("packed kernel must not be called")

    monkeypatch.setattr(fa, "flash_attention_packed", boom)

    B, N, C, H = 1, 128, 128, 16
    x = jnp.asarray(rng.normal(size=(B, N, C)) * 0.1, jnp.float32)
    mask = jnp.asarray(rng.random((B, N)) > 0.2)
    attn_p = SerializedAttention(C, H, 128, use_pallas=True)
    attn_x = SerializedAttention(C, H, 128, use_pallas=False)
    params = attn_x.init(jax.random.PRNGKey(0), x, None, None, mask)
    want = attn_x.apply(params, x, None, None, mask)
    with pltpu.force_tpu_interpret_mode():
        got = attn_p.apply(params, x, None, None, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)
