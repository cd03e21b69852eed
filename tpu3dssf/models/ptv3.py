"""PointTransformerV3 rebuilt TPU-first in flax.linen.

Capability-parity reimplementation of the PTv3 encoder-decoder the
reference consumes as a git submodule (reference utils/lidar.py:12,25 —
``PointTransformerV3(in_channels=4)`` whose ``.feat`` head is 64-d,
utils/fusion_model.py:134). Upstream PTv3 is CUDA-bound (pointops,
flash-attn, spconv); this version is pure JAX + the Pallas window-attention
kernel, designed around static shapes:

  * point sets live in fixed-capacity buffers with validity masks;
  * serialization = Morton/Hilbert codes + 2-key lexicographic sort
    (tpu3dssf.serialization), recomputed per pyramid level;
  * serialized-patch attention over fixed windows of the sorted order
    (tpu3dssf.kernels.window_attention) — attention cost linear in N;
  * grid pooling = coarsen grid coords (>>1) + sort + segment-max, with a
    recorded parent map for decoder unpooling;
  * conditional positional encoding (upstream xCPE = submanifold sparse
    conv) is a depthwise conv along the serialized order + a pointwise
    dense — a TPU-friendly local aggregator with the same role.

Deliberate divergences from upstream (documented for the parity audit):
LayerNorm everywhere (upstream mixes BatchNorm into embedding/pooling —
BN is hostile to masked fixed-capacity batches), deterministic cycling
through serialization orders per block instead of random shuffling,
capacity halving per pooling stage (upstream is fully dynamic), and —
with the default ``collapse_pooled_orders`` — pooled stages inherit the
collapse of the stage-0 curve instead of re-deriving the curve from
coarse coords (hierarchy makes the re-sort redundant; see PTv3Config).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpu3dssf.kernels import window_attention
from tpu3dssf.serialization import (
    SERIALIZATION_ORDERS,
    argsort_lex,
    inverse_permutation,
    pack_cell_keys,
    permutation_gather,
    serialization_keys,
)

_INT_MIN = jnp.iinfo(jnp.int32).min


@dataclasses.dataclass(frozen=True)
class PTv3Config:
    """Mirrors upstream PTv3 defaults (model scale identical)."""

    in_channels: int = 4
    orders: Tuple[str, ...] = SERIALIZATION_ORDERS
    enc_depths: Tuple[int, ...] = (2, 2, 2, 6, 2)
    enc_channels: Tuple[int, ...] = (32, 64, 128, 256, 512)
    enc_heads: Tuple[int, ...] = (2, 4, 8, 16, 32)
    enc_window: Tuple[int, ...] = (1024, 1024, 1024, 1024, 1024)
    dec_depths: Tuple[int, ...] = (2, 2, 2, 2)
    dec_channels: Tuple[int, ...] = (64, 64, 128, 256)
    dec_heads: Tuple[int, ...] = (4, 4, 8, 16)
    dec_window: Tuple[int, ...] = (1024, 1024, 1024, 1024)
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    pool_ratio: int = 2  # capacity divisor per pooling stage
    # True ⇒ caller guarantees every valid grid_coord row is a DISTINCT
    # cell (voxelize() provides this), enabling the run-max pooling fast
    # path. Set False for raw/duplicated grid coords: the first pooling
    # then uses exact segment_max (run-max silently truncates runs > 8).
    unique_cells: bool = True
    # Space-filling curves are hierarchical: a stream sorted along the
    # stage's curve stays sorted (run-collapsed) after 2x grid pooling,
    # so coarser stages need NO re-sort and NO re-gather for the CPE
    # order — their stream order is the collapse of the stage-0 curve
    # (a Morton/Hilbert curve of the half-offset lattice: bit j of
    # c + 2^15 becomes c>>1 + 2^14, etc.). This shifts coarse window
    # boundaries slightly vs re-deriving the curve from coarse coords
    # (documented divergence; the reference re-serializes per level) —
    # set False for the round-2-exact re-serializing behavior.
    collapse_pooled_orders: bool = True
    # Compile each stage's blocks as ONE nn.scan over stacked params
    # instead of `depth` unrolled bodies (22 → 9 block bodies in the
    # default config): much less HLO for the remote AOT compiler, at
    # the cost of explicit identity gathers for blocks that attend
    # along the CPE order. Changes the param tree (per-stage stacks) —
    # opt-in so existing checkpoints stay loadable.
    scan_blocks: bool = False
    use_pallas: bool = True
    remat: bool = False  # jax.checkpoint each block (activation memory ↓)
    # Selective remat: recompute only the attention branch (qkv dense →
    # windowed attention → proj) in the backward. Full-block remat costs
    # ~23% step time (PERF.md); the attention branch holds the largest
    # per-block activations (the (B, N, 3C) qkv and the kernel's saved
    # stats) at a fraction of the recompute FLOPs.
    remat_attention: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def num_stages(self) -> int:
        return len(self.enc_depths)

    @property
    def out_channels(self) -> int:
        return self.dec_channels[0]

    def capacities(self, n: int) -> Tuple[int, ...]:
        caps = [n]
        for s in range(1, self.num_stages):
            w = self.enc_window[s]
            c = max(w, caps[-1] // self.pool_ratio)
            caps.append(_round_up(c, w))
        return tuple(caps)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _serialize_perms(grid, mask, orders):
    """Per-order (perm, inv) for a batched point set; each (B, N).

    All orders are folded into the batch dimension so the whole level
    runs ONE batched lexicographic sort instead of len(orders) calls.
    """
    B, N = mask.shape
    his, los = [], []
    for order in orders:
        hi, lo = serialization_keys(grid, order)     # (B, N) each
        his.append(hi)
        los.append(lo)
    hi = jnp.concatenate(his, axis=0)                # (O*B, N)
    lo = jnp.concatenate(los, axis=0)
    m = jnp.tile(mask, (len(orders), 1))

    def one(h, l, mm):
        perm = argsort_lex(h, l, mm)
        return perm, inverse_permutation(perm)

    perm, inv = jax.vmap(one)(hi, lo, m)
    out = {}
    for i, order in enumerate(orders):
        out[order] = (perm[i * B:(i + 1) * B], inv[i * B:(i + 1) * B])
    return out


def _compose_perm(a, b):
    """Batched permutation composition: out[., t] = a[., b[., t]]."""
    return jnp.take_along_axis(a, b, axis=1)


def _pool_structure_sorted(grid, mask, out_cap):
    """`_pool_structure` for inputs ALREADY in serialized order.

    The stream spends each stage in its CPE curve order (hierarchical ⇒
    points of one coarse cell are contiguous), so the pooling sort AND
    the parent scatter both collapse to identity. Because every fine
    slot is a distinct cell, a coarse cell has ≤ 8 children — runs are
    short contiguous spans, which `_run_max_sorted` exploits to avoid
    (N, C) scatter-max entirely.

    Returns (seg, grid_out, mask_out, parent, parent_ok, end_pos) —
    parent maps each SORTED fine point to its coarse vid slot; end_pos
    (out_cap,) is the sorted index of each cell's last member (gather
    site for pooled values; 0-clamped on empty slots).
    """

    def one(g, m):
        n = g.shape[0]
        coarse = g >> 1
        diff = jnp.any(coarse[1:] != coarse[:-1], axis=-1)
        new = jnp.concatenate([
            jnp.ones((1,), jnp.int32), diff.astype(jnp.int32)])
        new = jnp.where(m, new, 0)
        vid = jnp.cumsum(new) - 1
        ok = m & (vid >= 0) & (vid < out_cap)
        seg = jnp.where(ok, vid, out_cap)
        # cells are numbered contiguously 0..V-1, so occupancy is a
        # prefix: no segment_sum needed for the output mask
        num_cells = jnp.sum(new)
        mask_out = (jnp.arange(out_cap, dtype=jnp.int32)
                    < jnp.minimum(num_cells, out_cap))
        # last member of each cell: a 1-wide int scatter-max (64x less
        # data than the old (N, C) float segment_max)
        idx = jnp.arange(n, dtype=jnp.int32)
        end_pos = jnp.full((out_cap + 1,), -1, jnp.int32).at[seg].max(
            jnp.where(ok, idx, -1), mode="drop")[:out_cap]
        end_pos = jnp.clip(end_pos, 0, n - 1)
        grid_out = jnp.where(mask_out[:, None], coarse[end_pos], 0)
        parent = jnp.clip(vid, 0, out_cap - 1).astype(jnp.int32)
        return seg, grid_out, mask_out, parent, ok, end_pos

    return jax.vmap(one)(grid, mask)


def _run_max_sorted(h, seg, end_pos, max_run=8):
    """Per-cell max for SORTED features whose cells are contiguous runs
    of ≤ ``max_run`` elements: log2(max_run) shifted elementwise maxima
    propagate each run's max to its last element, then one gather at
    ``end_pos`` reads it out — no (N, C) scatter.

    INVARIANT: runs longer than ``max_run`` are silently truncated, so
    every input slot must be a DISTINCT grid cell (≤ 2³ children per 2x
    pooling). Stage 0 gets this from voxelize (voxel_coords are the
    exact unique cell keys, never a re-floored centroid); pooled stages
    emit one slot per coarse cell by construction.

    h: (N, C) float; seg: (N,) int (same-cell ⇔ equal value);
    end_pos: (V,) int. Returns (V, C) in h's dtype.
    """
    y = h
    shift = 1
    while shift < max_run:
        same = (seg[shift:] == seg[:-shift])[:, None]
        prev = y[:-shift]
        y = jnp.concatenate(
            [y[:shift], jnp.where(same, jnp.maximum(y[shift:], prev),
                                  y[shift:])])
        shift *= 2
    return y[end_pos]


def _pool_structure(grid, mask, out_cap, perm=None):
    """Grouping of a batched point set into 2x-coarser grid cells.

    ``perm``: optional existing serialization permutation (any of the
    space-filling curves — they are hierarchical, so points of one
    coarse cell are contiguous along the sorted order and the pooling
    sort can be skipped entirely). Without it, a fresh cell-key sort.

    Returns per batch entry:
      seg_s:     (N,) int32 — coarse slot per SORTED point (out_cap for
                 dropped),
      order:     (N,) int32 — the sort permutation used,
      grid_out:  (out_cap, 3) int32 coarse cell coords,
      mask_out:  (out_cap,) bool,
      parent:    (N,) int32 — slot per ORIGINAL point (0-clamped),
      parent_ok: (N,) bool.
    """

    def one(g, m, pre_perm):
        n = g.shape[0]
        coarse = g >> 1
        if pre_perm is None:
            hi, lo = pack_cell_keys(coarse)
            big = jnp.int32(jnp.iinfo(jnp.int32).max)
            hi = jnp.where(m, hi, big)
            lo = jnp.where(m, lo, big)
            idx = jnp.arange(n, dtype=jnp.int32)
            _, _, order = jax.lax.sort((hi, lo, idx), num_keys=2)
        else:
            order = pre_perm
        coarse_s = coarse[order]
        valid_s = m[order]
        diff = jnp.any(coarse_s[1:] != coarse_s[:-1], axis=-1)
        new = jnp.concatenate([
            jnp.ones((1,), jnp.int32), diff.astype(jnp.int32)])
        new = jnp.where(valid_s, new, 0)
        vid_s = jnp.cumsum(new) - 1
        ok_s = valid_s & (vid_s >= 0) & (vid_s < out_cap)
        seg_s = jnp.where(ok_s, vid_s, out_cap)

        grid_out = jax.ops.segment_max(
            jnp.where(ok_s[:, None], coarse_s, _INT_MIN), seg_s,
            num_segments=out_cap + 1, indices_are_sorted=False)[:out_cap]
        count = jax.ops.segment_sum(
            ok_s.astype(jnp.int32), seg_s,
            num_segments=out_cap + 1, indices_are_sorted=False)[:out_cap]
        mask_out = count > 0
        grid_out = jnp.where(mask_out[:, None], grid_out, 0)

        parent = jnp.zeros((n,), jnp.int32).at[order].set(
            jnp.clip(vid_s, 0, out_cap - 1).astype(jnp.int32))
        parent_ok = jnp.zeros((n,), bool).at[order].set(ok_s)
        return seg_s, order, grid_out, mask_out, parent, parent_ok

    if perm is None:
        return jax.vmap(lambda g, m: one(g, m, None))(grid, mask)
    return jax.vmap(one)(grid, mask, perm)


class _DepthwiseConv3(nn.Module):
    """Kernel-3 depthwise conv along the sequence as three shifted
    multiply-adds. Exactly ``nn.Conv(C, (3,), feature_group_count=C,
    padding=SAME)`` — same param names/shapes (kernel (3, 1, C), bias)
    so existing checkpoints load unchanged — but lowered as fusable VPU
    passes instead of XLA's grouped-conv relayout.

    Sequence parallelism: with ``sp_axis`` set (inside a ``shard_map``
    whose point axis is sharded over that mesh axis), the two shifted
    taps pull their one-row halos from the neighbor shards via
    ``lax.ppermute`` — the SURVEY §5 "ring-exchange window-boundary
    halos" design. End shards receive zeros (ppermute's no-source
    default), matching the global zero padding.
    """

    channels: int
    dtype: jnp.dtype = jnp.float32
    sp_axis: Optional[str] = None

    @nn.compact
    def __call__(self, xs):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 1, self.channels)).astype(self.dtype)
        b = self.param("bias", nn.initializers.zeros,
                       (self.channels,)).astype(self.dtype)
        if self.sp_axis is not None:
            n_sh = jax.lax.axis_size(self.sp_axis)
            halo_l = jax.lax.ppermute(  # shard i edge row -> i+1
                xs[:, -1:], self.sp_axis,
                [(i, i + 1) for i in range(n_sh - 1)])
            halo_r = jax.lax.ppermute(  # shard i first row -> i-1
                xs[:, :1], self.sp_axis,
                [(i + 1, i) for i in range(n_sh - 1)])
            left = jnp.concatenate([halo_l, xs[:, :-1]], axis=1)
            right = jnp.concatenate([xs[:, 1:], halo_r], axis=1)
        else:
            left = jnp.pad(xs[:, :-1], ((0, 0), (1, 0), (0, 0)))
            right = jnp.pad(xs[:, 1:], ((0, 0), (0, 1), (0, 0)))
        return left * k[0, 0] + xs * k[1, 0] + right * k[2, 0] + b


class SerializedCPE(nn.Module):
    """Conditional positional encoding along the serialized order.

    Role of upstream xCPE (submanifold sparse conv + skip): inject local
    geometric context. Depthwise conv (kernel 3) over the z-order sequence
    + pointwise dense, residual.
    """

    channels: int
    dtype: jnp.dtype = jnp.float32
    sp_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, perm, inv, mask):
        if self.sp_axis is not None and perm is not None:
            raise ValueError("sequence-parallel CPE requires the CPE "
                             "order itself (perm=None): cross-order "
                             "permutations are global gathers")
        xs = x * mask[..., None]
        if perm is not None:
            xs = permutation_gather(xs, perm, inv)
        y = _DepthwiseConv3(self.channels, dtype=self.dtype,
                            sp_axis=self.sp_axis,
                            name="depthwise")(xs)
        y = nn.Dense(self.channels, dtype=self.dtype, name="pointwise")(y)
        if inv is not None:
            y = permutation_gather(y, inv, perm)
        return x + y * mask[..., None]


class SerializedAttention(nn.Module):
    """Windowed MHA over one serialization order."""

    channels: int
    heads: int
    window: int
    use_pallas: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, perm, inv, mask):
        B, N, C = x.shape
        K = min(self.window, N)
        H = self.heads
        D = self.channels // H

        qkv = nn.Dense(3 * self.channels, dtype=self.dtype, name="qkv")(x)
        if perm is not None:
            qkv = permutation_gather(qkv, perm, inv)
            mask_s = jnp.take_along_axis(mask, perm, axis=1)
        else:
            mask_s = mask

        W = N // K
        key_mask = mask_s.reshape(B * W, K)
        # the packed kernel's in_specs slice qkv in C-wide channel
        # blocks — Mosaic requires the block's last dim to divide 128
        # (or equal 3C), so stages with C ∈ {32, 64} must take the
        # (W, K, H, D) window kernel instead (interpret-mode tests do
        # not enforce this; the real-TPU lowering does)
        from tpu3dssf.kernels.flash_attention import pick_head_group
        # many-head stages (s4: H=32): unroll ≤8 heads per Mosaic body,
        # head groups on the grid (same route as the ViT-L — one
        # 32-head body is 4x the code and scratch staging). A many-head
        # stage with NO legal 128-aligned grouping (e.g. C=128, H=16 ⇒
        # D=8) must NOT run one many-head packed body — that is the
        # compile shape the remote AOT service rejects — so it takes
        # the (W, K, H, D) window kernel below instead.
        hg = pick_head_group(H, C) if H > 8 else None
        if (self.use_pallas and K % 128 == 0 and C % 128 == 0
                and (H <= 8 or hg is not None)):
            # windows are just batch rows of a full MHA — reuse the
            # packed flash kernel (one attention kernel for ViT AND
            # PTv3): qkv stays (B·W, K, 3C) straight off the Dense,
            # heads sliced in VMEM, ZERO transposes. The old
            # (W, K, H, D) path relayouts q/k/v (and the output)
            # through 8x-lane-padded (…, D=16) tiles.
            from tpu3dssf.kernels.flash_attention import (
                flash_attention_packed, pick_block_q)
            qkvw = qkv.reshape(B * W, K, 3 * C)
            bias = jnp.where(key_mask, 0.0, -1e9)[:, None, :]
            out = flash_attention_packed(  # positional: custom_vjp
                qkvw, bias, H, pick_block_q(K), None, None,
                1.0 / (D ** 0.5), hg)
            out = out * key_mask[..., None].astype(out.dtype)
        elif self.use_pallas and K % 128 == 0 and H <= 8:
            # small-C stages (C 32/64): packed whole-3C forward +
            # (W, H, K, D) backward — measured fastest combination
            # (scripts/time_smallc_attn.py; dec0 fwd 1.39 -> 0.72 ms)
            from tpu3dssf.kernels.window_attention import (
                window_attention_packed)
            out = window_attention_packed(
                qkv.reshape(B * W, K, 3 * C), key_mask, H)
        else:
            qkv4 = qkv.reshape(B * W, K, 3, H, D)
            q, k, v = qkv4[:, :, 0], qkv4[:, :, 1], qkv4[:, :, 2]
            out = window_attention(q, k, v, key_mask, self.use_pallas)
        out = out.reshape(B, N, C)
        if inv is not None:
            out = permutation_gather(out, inv, perm)
        return nn.Dense(self.channels, dtype=self.dtype, name="proj")(out)


class DropPath(nn.Module):
    """Per-sample stochastic depth on a residual branch."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class PTv3Block(nn.Module):
    """CPE → pre-norm windowed attention → pre-norm MLP (all residual).

    The residual stream is in the CPE curve's sorted space (the model
    keeps it there per stage), so CPE itself needs no permutation and
    ``perm``/``inv`` are the attention order's RELATIVE permutations —
    ``None`` when the block attends along the CPE order itself.
    """

    channels: int
    heads: int
    window: int
    mlp_ratio: float
    drop_path: float = 0.0
    use_pallas: bool = True
    remat_attention: bool = False
    dtype: jnp.dtype = jnp.float32
    sp_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, perm, inv, mask, deterministic=True):
        if self.sp_axis is not None and perm is not None:
            raise ValueError("sequence-parallel blocks must attend "
                             "along the CPE order (perm=None); see "
                             "tpu3dssf.parallel.sp")
        x = SerializedCPE(self.channels, dtype=self.dtype,
                          sp_axis=self.sp_axis, name="cpe")(
            x, None, None, mask)

        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        Attn = (nn.remat(SerializedAttention)
                if self.remat_attention else SerializedAttention)
        h = Attn(
            self.channels, self.heads, self.window,
            use_pallas=self.use_pallas, dtype=self.dtype, name="attn",
        )(h, perm, inv, mask)
        x = x + DropPath(self.drop_path, name="dp1")(h, deterministic)

        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        hidden = int(self.channels * self.mlp_ratio)
        h = nn.Dense(hidden, dtype=self.dtype, name="mlp_in")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.channels, dtype=self.dtype, name="mlp_out")(h)
        x = x + DropPath(self.drop_path, name="dp2")(h, deterministic)
        return x * mask[..., None]


class SerializedPooling(nn.Module):
    """Grid pooling: dense proj → segment-max over 2x-coarser cells.

    Reuses the level's existing serialization permutation (hierarchical
    curve ⇒ coarse cells are contiguous runs) so no extra sort runs.
    """

    channels: int
    out_cap: int
    presorted: bool = False  # input already in a serialized order
    unique_cells: bool = True  # distinct-cell slots ⇒ run-max fast path
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, grid, mask, perm=None):
        if self.presorted:
            seg_s, grid_out, mask_out, parent, parent_ok, end_pos = \
                _pool_structure_sorted(grid, mask, self.out_cap)
            h = nn.Dense(self.channels, dtype=self.dtype, name="proj")(x)
            if self.unique_cells:
                # contiguous ≤8-element runs: shifted maxima + one
                # gather, no (N, C) scatter-max, no "empty" sentinel
                pooled = jax.vmap(
                    lambda hh, ss, ep: _run_max_sorted(
                        hh.astype(jnp.float32), ss, ep))(h, seg_s, end_pos)
            else:
                # duplicate cells ⇒ runs can exceed 8: exact segment_max
                # (sorted order still groups a cell's members, so the
                # structure result is identical — only the max changes)
                neg = jnp.float32(-1.0e9)

                def pool_one(hh, ss):
                    ok = ss < self.out_cap
                    return jax.ops.segment_max(
                        jnp.where(ok[:, None], hh.astype(jnp.float32),
                                  neg), ss,
                        num_segments=self.out_cap + 1,
                        indices_are_sorted=False)[:self.out_cap]

                pooled = jax.vmap(pool_one)(h, seg_s)
        else:
            seg_s, order, grid_out, mask_out, parent, parent_ok = \
                _pool_structure(grid, mask, self.out_cap, perm)
            h = nn.Dense(self.channels, dtype=self.dtype, name="proj")(x)
            # "empty segment" sentinel for the max-pool. Must stay far
            # from f32 overflow: a sentinel near -finfo.max that leaks
            # into any later variance/square (LayerNorm) turns into
            # inf -> NaN. Features here are O(10); -1e9 dominates.
            neg = jnp.float32(-1.0e9)

            def pool_one(hh, od, ss):
                hs = hh[od].astype(jnp.float32)
                ok = ss < self.out_cap
                pooled = jax.ops.segment_max(
                    jnp.where(ok[:, None], hs, neg), ss,
                    num_segments=self.out_cap + 1,
                    indices_are_sorted=False)[:self.out_cap]
                return pooled

            pooled = jax.vmap(pool_one)(h, order, seg_s)
        pooled = jnp.where(mask_out[..., None], pooled, 0.0).astype(
            self.dtype)
        pooled = nn.LayerNorm(dtype=self.dtype, name="norm")(pooled)
        pooled = nn.gelu(pooled)
        pooled = pooled * mask_out[..., None]
        return pooled, grid_out, mask_out, parent, parent_ok


class SerializedUnpooling(nn.Module):
    """Broadcast coarse features to their children + project the skip."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_coarse, skip, parent, parent_ok, mask_fine):
        up = nn.Dense(self.channels, dtype=self.dtype, name="proj")(x_coarse)
        up = nn.LayerNorm(dtype=self.dtype, name="norm")(up)
        up = jnp.take_along_axis(up, parent[..., None], axis=1)
        up = jnp.where(parent_ok[..., None], up, 0.0)
        sk = nn.Dense(self.channels, dtype=self.dtype, name="proj_skip")(skip)
        sk = nn.LayerNorm(dtype=self.dtype, name="norm_skip")(sk)
        out = nn.gelu(up + sk)
        return out * mask_fine[..., None]


class PointTransformerV3(nn.Module):
    """Batched PTv3 over fixed-capacity masked point sets.

    Input:  feat (B, N, in_channels), grid_coord (B, N, 3) int32,
            mask (B, N) bool. N must be a multiple of enc_window[0].
    Output: (feat (B, N, dec_channels[0]), mask) — the 64-d point head the
            fusion model consumes (reference utils/lidar.py:55-56).

    Cell-uniqueness contract: with the default ``config.unique_cells``,
    every valid grid_coord row must be a DISTINCT cell — exactly what
    :func:`tpu3dssf.voxel.voxelize` emits (its voxel_coords are the
    per-voxel unique cell keys). The first grid pooling then uses a
    truncating run-max fast path (≤ 2³ children per 2x coarse cell).
    Feeding raw, possibly-duplicated grid coords (e.g. floored points
    without voxelization) requires ``unique_cells=False``, which swaps
    that stage to an exact segment_max.
    """

    config: PTv3Config

    @nn.compact
    def __call__(self, feat, grid_coord, mask, deterministic: bool = True):
        cfg = self.config
        caps = cfg.capacities(feat.shape[1])
        orders = cfg.orders
        cpe_order = orders[0]
        # remat: recompute block activations in backward — trades FLOPs
        # for HBM, the standard TPU memory lever
        # static_argnums count self as 0: deterministic=5
        Block = (nn.remat(PTv3Block, static_argnums=(5,))
                 if cfg.remat else PTv3Block)

        def run_blocks(x, perms, msk, depth, channels, heads, window,
                       name):
            """`depth` blocks cycling through the serialization orders
            — unrolled, or one nn.scan over stacked per-block params
            (cfg.scan_blocks) with the relative permutations as scanned
            inputs (identity arange where a block attends along the
            CPE order)."""
            mk = lambda nm: Block(  # noqa: E731
                channels, heads, window, cfg.mlp_ratio,
                drop_path=cfg.drop_path, use_pallas=cfg.use_pallas,
                remat_attention=cfg.remat_attention,
                dtype=cfg.dtype, name=nm)
            if not (cfg.scan_blocks and depth > 1):
                for b in range(depth):
                    order = orders[b % len(orders)]
                    perm, inv = perms[order]
                    x = mk(f"{name}_blk{b}")(x, perm, inv, msk,
                                             deterministic)
                return x
            Bb, Nn = msk.shape
            ar = jnp.broadcast_to(
                jnp.arange(Nn, dtype=jnp.int32), (Bb, Nn))
            ps, ivs = [], []
            for b in range(depth):
                perm, inv = perms[orders[b % len(orders)]]
                ps.append(ar if perm is None else perm)
                ivs.append(ar if inv is None else inv)
            stacks = (jnp.stack(ps), jnp.stack(ivs))

            def body(block, carry, pi):
                return block(carry, pi[0], pi[1], msk,
                             deterministic), None

            x, _ = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=0,
                length=depth,
                metadata_params={nn.meta.PARTITION_NAME: None},
            )(mk(f"{name}_scan"), x, stacks)
            return x

        x = nn.Dense(cfg.enc_channels[0], dtype=cfg.dtype, name="embed")(feat)
        x = nn.LayerNorm(dtype=cfg.dtype, name="embed_norm")(x)
        x = x * mask[..., None]

        grid, msk = grid_coord, mask
        skips = []
        pools = []

        def used_orders(depth):
            # only sort the orders this stage's blocks (+ CPE) touch —
            # depth-2 stages need 2 of the 4 curves, halving sort cost
            used = {orders[b % len(orders)] for b in range(depth)}
            used.add(cpe_order)
            return tuple(o for o in orders if o in used)

        # The residual stream spends each stage in its CPE curve order:
        # the per-block CPE gather/scatter pair and the pooling sort
        # collapse to identity, and the other attention orders become
        # RELATIVE permutations (two int-index compositions per stage
        # instead of two (B, N, C) float gathers per block).
        def sorted_space(perms_orig):
            perm_c, inv_c = perms_orig[cpe_order]
            rel = {}
            for o, (p, i) in perms_orig.items():
                if o == cpe_order:
                    rel[o] = (None, None)
                else:
                    rel[o] = (_compose_perm(inv_c, p),
                              _compose_perm(i, perm_c))
            return perm_c, inv_c, rel

        # ---- encoder ----
        # per stage: (perm, inv) of the CPE-order sort (sorted <-> vid
        # space), or None when the stream inherited the collapsed order
        cpe_sorts = []
        for s in range(cfg.num_stages):
            if s > 0:
                # only stage 1 pools caller-provided cells; deeper
                # stages pool slots that are unique by construction
                x, grid, msk, parent, parent_ok = SerializedPooling(
                    cfg.enc_channels[s], caps[s], presorted=True,
                    unique_cells=(cfg.unique_cells or s > 1),
                    dtype=cfg.dtype, name=f"pool{s}",
                )(x, grid, msk)
                pools.append((parent, parent_ok))
            if s > 0 and cfg.collapse_pooled_orders:
                # hierarchical curve: the pooled stream is ALREADY in
                # this stage's CPE order (see config docstring) — skip
                # the re-sort and the x/grid/mask gathers; fresh perms
                # for the other orders ARE relative (grid is stored in
                # the stream's sorted space)
                need = tuple(o for o in used_orders(cfg.enc_depths[s])
                             if o != cpe_order)
                perms = {cpe_order: (None, None)}
                if need:
                    perms.update(_serialize_perms(grid, msk, need))
                cpe_sorts.append(None)
            else:
                perms_orig = _serialize_perms(
                    grid, msk, used_orders(cfg.enc_depths[s]))
                perm_c, inv_c, perms = sorted_space(perms_orig)
                x = permutation_gather(x, perm_c, inv_c)
                grid = jnp.take_along_axis(grid, perm_c[..., None],
                                           axis=1)
                msk = jnp.take_along_axis(msk, perm_c, axis=1)
                cpe_sorts.append((perm_c, inv_c))
            x = run_blocks(x, perms, msk, cfg.enc_depths[s],
                           cfg.enc_channels[s], cfg.enc_heads[s],
                           cfg.enc_window[s], f"enc{s}")
            skips.append((x, grid, msk, perms))

        # ---- decoder ----
        for d in reversed(range(cfg.num_stages - 1)):
            skip_x, skip_grid, skip_mask, skip_perms = skips[d]
            parent, parent_ok = pools[d]
            # parent points at coarse VID slots; when the coarse stream
            # was re-sorted into its own curve order, compose with that
            # sort's inverse (None ⇒ the stream kept the collapsed
            # order and VID slots ARE stream slots)
            if cpe_sorts[d + 1] is not None:
                parent = _compose_perm(cpe_sorts[d + 1][1], parent)
            x = SerializedUnpooling(
                cfg.dec_channels[d], dtype=cfg.dtype, name=f"unpool{d}",
            )(x, skip_x, parent, parent_ok, skip_mask)
            grid, msk = skip_grid, skip_mask
            # reuse the encoder's permutations for this level — same
            # grid/mask, so re-sorting is pure waste; only compute
            # orders the encoder stage didn't need (grid is already in
            # this level's sorted space, so fresh perms ARE relative)
            need = used_orders(cfg.dec_depths[d])
            missing = tuple(o for o in need if o not in skip_perms)
            perms = dict(skip_perms)
            if missing:
                perms.update(_serialize_perms(grid, msk, missing))
            x = run_blocks(x, perms, msk, cfg.dec_depths[d],
                           cfg.dec_channels[d], cfg.dec_heads[d],
                           cfg.dec_window[d], f"dec{d}")

        # stream is in stage-0 sorted space; un-sort to input point order
        perm0, inv0 = cpe_sorts[0]
        x = permutation_gather(x, inv0, perm0)
        return x, mask
