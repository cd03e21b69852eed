"""Vision Transformer (DINOv2 / DINOv3 style) in flax.linen.

Rebuilds the capability of the reference's frozen HF image encoder
(utils/camera.py:6-65): a ViT-S that maps one camera image to per-patch
tokens (M, 384) plus a CLS/global token. Presets mirror the two reference
branches:

  * ``dinov2_small``  — patch 14, input 224x224, 16x16 = 256 patches
    (camera.py:15-19);
  * ``dinov3_small``  — patch 16, input 640x1138, 40x71 = 2840 patches,
    4 register tokens, axial 2D RoPE (camera.py:21-34;
    fusion_model.py:172-174).

Token-layout note (parity quirk, documented): the reference slices
``feats[1:-4]`` for BOTH branches (camera.py:57-58). For DINOv3
([CLS, 4 registers, patches...]) that keeps the 4 registers and drops the
last 4 *patch* tokens — shape-invisible but semantically shifted; for
DINOv2 (no registers) it drops 4 real patch tokens. This implementation
returns the true patch tokens; ``register_slice_compat=True`` reproduces
the reference slice bit-for-bit for parity testing.

Weights: architecture-compatible with HF ``facebook/dinov2-small`` /
``facebook/dinov3-vits16-pretrain-lvd1689m``; see
:mod:`tpu3dssf.models.vit_port` for the HF→flax port (gated on a local
checkpoint — this environment has no network egress).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# ImageNet normalization used by both HF processors.
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    patch_size: int = 16
    image_size: Tuple[int, int] = (640, 1138)  # (H, W)
    hidden_size: int = 384
    num_layers: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    num_register_tokens: int = 0
    layerscale_init: Optional[float] = 1e-5
    use_rope: bool = False
    use_flash: bool = False  # Pallas flash attention (TPU only)
    # Head-parallel tensor parallelism over the FLASH path: set both to
    # shard_map the packed flash kernel over ``tp_axis`` of ``tp_mesh``
    # (heads split across chips; qkv column-parallel, proj row-parallel
    # — GSPMD inserts the one psum per residual branch). Requires
    # params permuted by :func:`prepare_tp_params` (per-shard
    # [q_s|k_s|v_s] qkv column layout) and num_heads % shards == 0.
    # The einsum path (use_flash=False) needs neither: plain
    # vit_tp_shardings is enough there.
    tp_axis: Optional[str] = None
    tp_mesh: Optional[object] = None  # jax.sharding.Mesh
    dtype: jnp.dtype = jnp.float32
    # HF-parity knobs: DINOv3 uses LN eps 1e-5 (DINOv3ViTConfig
    # layer_norm_eps) and RoPE base theta 100; dinov2 uses eps 1e-6
    ln_eps: float = 1e-6
    rope_theta: float = 100.0
    # compile the transformer as ONE lax.scan over stacked block params
    # instead of num_layers unrolled blocks: ~12x less HLO to compile
    # (the round-1 bench spent 419 s compiling the unrolled encode)
    scan_layers: bool = False
    # W8A8 inference: block Dense matmuls run int8xint8->int32 on the
    # MXU (2x bf16 throughput on v5e). Params come from quantize_vit();
    # weights are per-output-channel symmetric, activations per-token
    # dynamic symmetric. Attention + patch embed stay bf16.
    quant_int8: bool = False
    # Many-head flash route (ViT-L): True → packed kernel with head
    # GROUPS on the grid (≤8 heads per Mosaic body, zero transposes);
    # False → the (B,H,N,D) kernel with per-layer transposes.
    packed_head_groups: bool = True
    # Patchify as reshape + ONE MXU matmul instead of nn.Conv — the
    # identical linear map (kernel reshaped (P*P*3, C), same param tree
    # so checkpoints/HF ports are interchangeable; tests assert
    # equality). The conv lowering is slower on TPU and its ViT-L-width
    # HLO is implicated in the remote-compiler crash (PERF.md).
    embed_matmul: bool = True

    @property
    def grid_size(self) -> Tuple[int, int]:
        return (self.image_size[0] // self.patch_size,
                self.image_size[1] // self.patch_size)

    @property
    def num_patches(self) -> int:
        gh, gw = self.grid_size
        return gh * gw

    @property
    def num_prefix_tokens(self) -> int:
        return 1 + self.num_register_tokens  # CLS + registers


def dinov2_small() -> ViTConfig:
    """Reference dinov2 branch geometry (camera.py:15-19)."""
    return ViTConfig(patch_size=14, image_size=(224, 224),
                     num_register_tokens=0, use_rope=False)


def dinov3_small() -> ViTConfig:
    """Reference dinov3 branch geometry (camera.py:21-34)."""
    return ViTConfig(patch_size=16, image_size=(640, 1138),
                     num_register_tokens=4, use_rope=True, ln_eps=1e-5)


def dinov3_large() -> ViTConfig:
    """ViT-L/16 backbone option (BASELINE config 5: batched streaming
    inference with a DINOv3 ViT-L backbone on a chip slice)."""
    return ViTConfig(patch_size=16, image_size=(640, 1138),
                     hidden_size=1024, num_layers=24, num_heads=16,
                     num_register_tokens=4, use_rope=True, ln_eps=1e-5)


def _rope_angles(gh, gw, head_dim, theta=100.0):
    """Axial 2D RoPE angles over the patch grid — exact HF DINOv3
    semantics (modeling_dinov3_vit.get_patches_center_coordinates +
    DINOv3ViTRopePositionEmbedding): patch-*center* coords mapped to
    (-1, 1), inv_freq = theta^(-4i/head_dim), angles = 2*pi*coord*freq,
    laid out [y-freqs | x-freqs] per patch (the HF tile(2) is realized
    by _apply_rope's half-rotation convention)."""
    quarter = head_dim // 4
    freqs = theta ** (-jnp.arange(quarter, dtype=jnp.float32)
                      * 4.0 / head_dim)
    ys = ((jnp.arange(gh, dtype=jnp.float32) + 0.5) / gh) * 2.0 - 1.0
    xs = ((jnp.arange(gw, dtype=jnp.float32) + 0.5) / gw) * 2.0 - 1.0
    ang_y = 2.0 * jnp.pi * ys[:, None] * freqs[None, :]      # (gh, q)
    ang_x = 2.0 * jnp.pi * xs[:, None] * freqs[None, :]      # (gw, q)
    ang_y = jnp.broadcast_to(ang_y[:, None, :], (gh, gw, quarter))
    ang_x = jnp.broadcast_to(ang_x[None, :, :], (gh, gw, quarter))
    ang = jnp.concatenate([ang_y, ang_x], axis=-1)           # (gh, gw, 2q)
    return ang.reshape(gh * gw, 2 * quarter)


def _apply_rope(x, angles, n_prefix):
    """Rotate patch-token halves of q/k; prefix tokens pass through.

    x: (B, N, H, D); angles: (num_patches, D // 2).
    """
    B, N, H, D = x.shape
    prefix, patches = x[:, :n_prefix], x[:, n_prefix:]
    half = D // 2
    cos = jnp.cos(angles)[None, :, None, :]
    sin = jnp.sin(angles)[None, :, None, :]
    p1, p2 = patches[..., :half], patches[..., half:]
    # rotate in f32 (cos/sin are f32), return in the input dtype so
    # bf16 compute paths (and the scan carry) keep a stable dtype
    rotated = jnp.concatenate(
        [p1 * cos - p2 * sin, p1 * sin + p2 * cos], axis=-1)
    return jnp.concatenate([prefix, rotated.astype(x.dtype)], axis=1)


class QuantDense(nn.Module):
    """W8A8 Dense: int8 weights (per-output-channel symmetric scales) x
    int8 activations (per-token dynamic symmetric), int32 MXU
    accumulation, f32 dequant epilogue.

    Parameters are produced by :func:`quantize_vit`; ``init`` creates
    correctly-shaped placeholders so param trees line up.
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        kernel_q = self.param(
            "kernel_q", nn.initializers.zeros, (in_dim, self.features),
            jnp.int8)
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        xf = x.astype(jnp.float32)
        a_scale = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
        a_scale = jnp.maximum(a_scale, 1e-8)
        x_q = jnp.round(xf / a_scale).astype(jnp.int8)
        acc = jax.lax.dot_general(
            x_q, kernel_q,
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        out = acc.astype(jnp.float32) * (a_scale * scale) + bias
        return out.astype(self.dtype)


class LayerScale(nn.Module):
    dim: int
    init: float

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.constant(self.init),
                           (self.dim,))
        return x * gamma.astype(x.dtype)


class ViTBlock(nn.Module):
    config: ViTConfig

    @nn.compact
    def __call__(self, x, rope_angles=None, key_bias=None):
        cfg = self.config
        C = cfg.hidden_size
        H = cfg.num_heads
        D = C // H
        B, N, _ = x.shape

        def dense(feats, name):
            if cfg.quant_int8:
                return QuantDense(feats, dtype=cfg.dtype, name=name)
            return nn.Dense(feats, dtype=cfg.dtype, name=name)

        h = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=cfg.dtype,
                         name="norm1")(x)
        qkv = dense(3 * C, "qkv")(h)
        if cfg.use_flash:
            # packed path: qkv stays (B, N, 3C) end to end — rope via a
            # free trailing-dim reshape, heads sliced inside the kernel,
            # zero transposes. (Measured: rotating q/k INSIDE the kernel
            # instead is 2.6x slower — per-grid-step lane-slice
            # relayouts swamp the saved HBM traffic, see
            # scripts/time_vit_parts.py — so RoPE stays out here.)
            from tpu3dssf.kernels.flash_attention import (
                flash_attention, flash_attention_packed, pick_block_q,
                pick_head_group)

            def run_flash(qkv_blk, bias, rope):
                # shapes from the (possibly per-shard) block itself —
                # under shard_map both B and the channel count shrink
                Bl, Nl, C3l = qkv_blk.shape
                Cl = C3l // 3
                Hl = Cl // D
                q = qkv_blk[..., :Cl].reshape(Bl, Nl, Hl, D)
                k = qkv_blk[..., Cl:2 * Cl].reshape(Bl, Nl, Hl, D)
                if rope is not None:
                    q = _apply_rope(q, rope, cfg.num_prefix_tokens)
                    k = _apply_rope(k, rope, cfg.num_prefix_tokens)
                if Hl > 8:
                    # many-head configs (ViT-L: 16): the packed kernel
                    # unrolls heads in ONE Mosaic body (16x the code +
                    # scratch staging) and its remote AOT compile dies
                    # at ViT-L size (PERF.md round 2). Preferred route:
                    # packed with head GROUPS on the grid — each body
                    # unrolls ≤8 heads (the ViT-S-proven shape), zero
                    # transposes. Requires 128-aligned group widths;
                    # otherwise the (B,H,N,D) kernel puts heads on the
                    # grid at the cost of per-layer transposes.
                    hg = pick_head_group(Hl, Cl)
                    if hg is None or not cfg.packed_head_groups:
                        v = qkv_blk[..., 2 * Cl:].reshape(Bl, Nl, Hl, D)
                        out4 = flash_attention(q, k, v, pick_block_q(Nl),
                                               bias)
                        return out4.reshape(Bl, Nl, Cl)
                    q = q * jnp.asarray(1.0 / (D ** 0.5), q.dtype)
                    packed = jnp.concatenate(
                        [q.reshape(Bl, Nl, Cl), k.reshape(Bl, Nl, Cl),
                         qkv_blk[..., 2 * Cl:]], axis=-1)
                    return flash_attention_packed(
                        packed, bias, Hl, pick_block_q(Nl), None, None,
                        None, hg)
                q = q * jnp.asarray(1.0 / (D ** 0.5), q.dtype)
                packed = jnp.concatenate(
                    [q.reshape(Bl, Nl, Cl), k.reshape(Bl, Nl, Cl),
                     qkv_blk[..., 2 * Cl:]], axis=-1)
                return flash_attention_packed(packed, bias, Hl,
                                              pick_block_q(Nl))

            bias = (key_bias if key_bias is not None
                    else jnp.zeros((B, 1, N), jnp.float32))
            rope = (rope_angles if (cfg.use_rope and
                                    rope_angles is not None) else None)
            if cfg.tp_axis is not None and cfg.tp_mesh is not None:
                # head-parallel shard_map: qkv arrives in the TP column
                # layout (prepare_tp_params), so each shard's contiguous
                # channel block IS its packed [q_s|k_s|v_s] — the local
                # kernel call is identical to the single-chip one.
                # Sequence + bias are replicated; any other mesh axis
                # stays a batch (data) axis.
                from jax.sharding import PartitionSpec as P
                mesh, ax = cfg.tp_mesh, cfg.tp_axis
                dp = next((a for a in mesh.axis_names if a != ax), None)
                specs = [P(dp, None, ax), P(dp, None, None)]
                args = [qkv, bias]
                if rope is not None:
                    specs.append(P(None, None))
                    args.append(rope)
                # check_vma=False: pallas_call's out ShapeDtypeStruct
                # carries no vma annotation, which the checker requires
                out = jax.shard_map(
                    lambda qk, b, *r: run_flash(
                        qk, b, r[0] if r else None),
                    mesh=mesh, in_specs=tuple(specs),
                    out_specs=P(dp, None, ax), check_vma=False)(*args)
            else:
                out = run_flash(qkv, bias, rope)
        else:
            qkv = qkv.reshape(B, N, 3, H, D)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            if cfg.use_rope and rope_angles is not None:
                q = _apply_rope(q, rope_angles, cfg.num_prefix_tokens)
                k = _apply_rope(k, rope_angles, cfg.num_prefix_tokens)
            attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / (D ** 0.5)
            attn = jax.nn.softmax(attn, axis=-1)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, N, C)
        out = dense(C, "proj")(out)
        if cfg.layerscale_init is not None:
            out = LayerScale(C, cfg.layerscale_init, name="ls1")(out)
        x = x + out.astype(x.dtype)

        h = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=cfg.dtype,
                         name="norm2")(x)
        h = dense(int(C * cfg.mlp_ratio), "mlp_in")(h)
        # exact (erf) GELU — HF ACT2FN["gelu"]; flax default is tanh-approx
        h = nn.gelu(h, approximate=False)
        h = dense(C, "mlp_out")(h)
        if cfg.layerscale_init is not None:
            h = LayerScale(C, cfg.layerscale_init, name="ls2")(h)
        return x + h.astype(x.dtype)


class _PatchEmbedMatmul(nn.Module):
    """Conv-free patchifier: crop → (B, gh*gw, P*P*3) → one MXU matmul.

    Parameter-compatible with ``nn.Conv(name="patch_embed")``: the
    kernel keeps the conv layout (P, P, 3, C) — flattening the patch
    pixels row-major as (kh, kw, cin) makes ``x @ kernel.reshape(-1, C)``
    the exact same linear map as the VALID strided conv.
    """

    features: int
    patch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        P, C = self.patch, self.features
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (P, P, 3, C))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        B, H, W, _ = images.shape
        gh, gw = H // P, W // P
        x = images[:, :gh * P, :gw * P, :].astype(self.dtype)
        x = x.reshape(B, gh, P, gw, P, 3)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, gh * gw, P * P * 3)
        w = kernel.astype(self.dtype).reshape(P * P * 3, C)
        return x @ w + bias.astype(self.dtype)


class VisionTransformer(nn.Module):
    """DINO-style ViT: images (B, H, W, 3) → patch + global tokens."""

    config: ViTConfig
    register_slice_compat: bool = False

    @nn.compact
    def __call__(self, images):
        cfg = self.config
        B = images.shape[0]
        C = cfg.hidden_size
        gh, gw = cfg.grid_size

        # VALID padding: 1138 px / 16 → 71 patches with 2 px dropped,
        # matching the HF conv patchifier (grid 40x71, fusion_model.py:172)
        if cfg.embed_matmul:
            x = _PatchEmbedMatmul(C, cfg.patch_size, dtype=cfg.dtype,
                                  name="patch_embed")(images)
        else:
            x = nn.Conv(C, kernel_size=(cfg.patch_size, cfg.patch_size),
                        strides=(cfg.patch_size, cfg.patch_size),
                        padding="VALID", dtype=cfg.dtype,
                        name="patch_embed")(images)
            x = x.reshape(B, gh * gw, C)

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, C))
        tokens = [jnp.broadcast_to(cls, (B, 1, C)).astype(cfg.dtype)]
        if cfg.num_register_tokens:
            reg = self.param("register_tokens", nn.initializers.zeros,
                             (1, cfg.num_register_tokens, C))
            tokens.append(jnp.broadcast_to(
                reg, (B, cfg.num_register_tokens, C)).astype(cfg.dtype))
        x = jnp.concatenate(tokens + [x], axis=1)

        if not cfg.use_rope:
            pos = self.param(
                "pos_embed", nn.initializers.normal(0.02),
                (1, cfg.num_prefix_tokens + cfg.num_patches, C))
            x = x + pos.astype(cfg.dtype)

        rope_angles = (
            _rope_angles(gh, gw, C // cfg.num_heads, cfg.rope_theta)
            if cfg.use_rope else None)

        # flash path: pad the sequence to a q-block multiple ONCE and
        # carry a key bias, instead of pad/unpad inside every layer
        key_bias = None
        N = x.shape[1]
        if cfg.use_flash:
            # pad to the next 128-multiple (pick_block_q finds a q-block
            # dividing it): DINOv3's 2845 tokens pad to 2944, not 3072 —
            # 8% fewer attention FLOPs than a fixed 256-multiple
            Np = ((N + 127) // 128) * 128
            if Np != N:
                x = jnp.pad(x, ((0, 0), (0, Np - N), (0, 0)))
                key_bias = jnp.zeros((B, 1, Np), jnp.float32).at[
                    :, :, N:].set(-1e9)
                if rope_angles is not None:
                    # identity rotation (angle 0) for padded slots
                    rope_angles = jnp.pad(
                        rope_angles, ((0, Np - N), (0, 0)))

        if cfg.scan_layers:
            def body(block, carry, _):
                return block(carry, rope_angles, key_bias), None
            x, _ = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=cfg.num_layers,
                metadata_params={nn.meta.PARTITION_NAME: None},
            )(ViTBlock(cfg, name="blocks"), x, None)
        else:
            for i in range(cfg.num_layers):
                x = ViTBlock(cfg, name=f"block{i}")(x, rope_angles,
                                                    key_bias)
        x = x[:, :N]
        x = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=cfg.dtype,
                         name="norm")(x)

        n_pre = cfg.num_prefix_tokens
        if self.register_slice_compat:
            # reference camera.py:57-58: feats[1:-4] regardless of layout
            patch_tokens = x[:, 1:-4]
        else:
            patch_tokens = x[:, n_pre:]
        return {
            "patch_features": patch_tokens,
            "global_features": x[:, 0],
        }


def fold_layerscale(params, config: ViTConfig):
    """Fold LayerScale gammas into the adjacent Dense weights (inference).

    ``LS(Dense(x)) = x @ (W * gamma) + b * gamma`` exactly, so a frozen
    ViT can drop the two per-layer elementwise VPU passes. Returns
    (params', config') where config' has ``layerscale_init=None`` and
    params' has no ls1/ls2 entries. Works for both the unrolled
    (block0..N) and scan_layers (stacked "blocks") trees.
    """
    if config.layerscale_init is None:
        return params, config
    import jax

    def fold_block(blk):
        blk = dict(blk)
        for ls, dense in (("ls1", "proj"), ("ls2", "mlp_out")):
            gamma = blk.pop(ls)["gamma"]
            d = blk[dense]
            blk[dense] = {
                "kernel": d["kernel"] * gamma[..., None, :],
                "bias": d["bias"] * gamma,
            }
        return blk

    p = dict(params["params"])
    if config.scan_layers:
        p["blocks"] = fold_block(p["blocks"])
    else:
        for i in range(config.num_layers):
            p[f"block{i}"] = fold_block(p[f"block{i}"])
    new_cfg = dataclasses.replace(config, layerscale_init=None)
    out = dict(params)
    out["params"] = p
    return jax.tree.map(lambda x: x, out), new_cfg


def quantize_vit(params, config: ViTConfig):
    """Convert a float ViT param tree to the W8A8 inference layout.

    Folds LayerScale first (exact), then quantizes each block Dense to
    int8 with per-output-channel symmetric scales:
    ``W ≈ kernel_q * scale`` with ``kernel_q = round(W / scale)``,
    ``scale = max|W[:, o]| / 127``. Handles both unrolled (block0..N)
    and scan_layers (stacked "blocks", leading layer axis — scales are
    per layer per channel) trees. Returns (params', config') with
    ``quant_int8=True``.
    """
    params, config = fold_layerscale(params, config)

    def quant_dense(d):
        w = jnp.asarray(d["kernel"], jnp.float32)
        scale = jnp.max(jnp.abs(w), axis=-2) / 127.0   # (..., out)
        scale = jnp.maximum(scale, 1e-12)
        kernel_q = jnp.round(w / scale[..., None, :]).astype(jnp.int8)
        return {"kernel_q": kernel_q, "scale": scale,
                "bias": jnp.asarray(d["bias"], jnp.float32)}

    def quant_block(blk):
        blk = dict(blk)
        for name in ("qkv", "proj", "mlp_in", "mlp_out"):
            blk[name] = quant_dense(blk[name])
        return blk

    p = dict(params["params"])
    if config.scan_layers:
        p["blocks"] = quant_block(p["blocks"])
    else:
        for i in range(config.num_layers):
            p[f"block{i}"] = quant_block(p[f"block{i}"])
    new_cfg = dataclasses.replace(config, quant_int8=True)
    out = dict(params)
    out["params"] = p
    return jax.tree.map(lambda x: x, out), new_cfg


def make_looped_encode(config: ViTConfig, params, donate: bool = True):
    """Per-layer-dispatch encode: compile ONE block program, call it
    ``num_layers`` times with per-layer param slices.

    The one-program 24-layer ViT-L encode exceeds this environment's
    remote AOT compile service (PERF.md "ViT-L" — broken pipe after
    ~30 min, reproduced 5x, model-independent), while a single ViT-L
    block compiles in ~1-2 min. Splitting the encode into three tiny
    programs (embed / block x L / final) sidesteps the compiler limit
    with no algorithmic change: dispatches are async, so L back-to-back
    block launches pipeline on device and the only added cost is L-1
    enqueues overlapped with ~10 ms/block of compute. The block buffer
    is donated so the token carry is updated in place.

    Requires ``scan_layers=True`` params (stacked (L, ...) leaves under
    "blocks"). Returns ``encode(images) -> patch_features``, equal to
    ``VisionTransformer(config).apply(params, images)["patch_features"]``
    (exactly — same submodules, same order of ops; tested).
    """
    cfg = config
    if not cfg.scan_layers:
        raise ValueError("make_looped_encode needs scan_layers=True "
                         "(stacked per-layer params)")
    p = dict(params["params"])
    L = cfg.num_layers
    # per-layer param trees, sliced once at setup (device-side gathers)
    layer_params = [jax.tree.map(lambda a, i=i: a[i], p["blocks"])
                    for i in range(L)]
    # embed/final close over `p` but need only the non-block leaves —
    # keeping the stacked (L, ...) block tree referenced would pin a
    # second full copy of the block weights in HBM (~0.6 GB at ViT-L)
    # for the encoder's lifetime
    del p["blocks"]
    gh, gw = cfg.grid_size
    n_pre = cfg.num_prefix_tokens
    N = n_pre + cfg.num_patches
    Np = ((N + 127) // 128) * 128 if cfg.use_flash else N
    rope = (_rope_angles(gh, gw, cfg.hidden_size // cfg.num_heads,
                         cfg.rope_theta) if cfg.use_rope else None)
    if rope is not None and Np != N:
        rope = jnp.pad(rope, ((0, Np - N), (0, 0)))

    embed_mod = (_PatchEmbedMatmul(cfg.hidden_size, cfg.patch_size,
                                   dtype=cfg.dtype)
                 if cfg.embed_matmul else
                 nn.Conv(cfg.hidden_size,
                         kernel_size=(cfg.patch_size, cfg.patch_size),
                         strides=(cfg.patch_size, cfg.patch_size),
                         padding="VALID", dtype=cfg.dtype))

    @jax.jit
    def embed(images):
        B = images.shape[0]
        x = embed_mod.apply({"params": p["patch_embed"]}, images)
        x = x.reshape(B, cfg.num_patches, cfg.hidden_size)
        toks = [jnp.broadcast_to(p["cls_token"],
                                 (B, 1, cfg.hidden_size)).astype(cfg.dtype)]
        if cfg.num_register_tokens:
            toks.append(jnp.broadcast_to(
                p["register_tokens"],
                (B, cfg.num_register_tokens,
                 cfg.hidden_size)).astype(cfg.dtype))
        x = jnp.concatenate(toks + [x], axis=1)
        if not cfg.use_rope:
            x = x + p["pos_embed"].astype(cfg.dtype)
        key_bias = None
        if cfg.use_flash and Np != N:
            x = jnp.pad(x, ((0, 0), (0, Np - N), (0, 0)))
            key_bias = jnp.zeros((B, 1, Np), jnp.float32).at[
                :, :, N:].set(-1e9)
        return x, key_bias

    block = ViTBlock(cfg)

    @functools.partial(jax.jit,
                       donate_argnums=(1,) if donate else ())
    def block_fn(lp, x, key_bias):
        return block.apply({"params": lp}, x, rope, key_bias)

    @jax.jit
    def final(x):
        x = x[:, :N]
        x = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=cfg.dtype).apply(
            {"params": p["norm"]}, x)
        return x[:, n_pre:]

    def encode(images):
        x, key_bias = embed(images)
        for lp in layer_params:
            x = block_fn(lp, x, key_bias)
        return final(x)

    return encode


def qkv_tp_permutation(hidden_size: int, num_heads: int,
                       num_shards: int):
    """Column permutation taking the qkv Dense layout [q|k|v] (each
    (H, D) channel blocks) to the TP layout [q_0|k_0|v_0 | q_1|k_1|v_1
    | ...] where block s holds shard s's heads. After this permutation
    a CONTIGUOUS sharding of the 3C output dim over ``num_shards``
    hands every shard exactly the packed qkv its local flash kernel
    expects — column-parallel attention with zero resharding."""
    import numpy as np
    C, H, S = hidden_size, num_heads, num_shards
    if H % S:
        raise ValueError(f"num_heads={H} not divisible by shards={S}")
    D = C // H
    Hl = H // S
    idx = np.arange(3 * C).reshape(3, H, D)
    blocks = [idx[t, s * Hl:(s + 1) * Hl].reshape(-1)
              for s in range(S) for t in range(3)]
    return np.concatenate(blocks)


def prepare_tp_params(params, config: ViTConfig, mesh, axis: str = "model"):
    """Permute qkv columns into the TP layout and stamp (tp_mesh,
    tp_axis) into the config — the flash path then runs head-parallel
    over ``axis`` (see ViTConfig.tp_axis). Shard with
    :func:`tpu3dssf.parallel.vit_tp_shardings` afterwards.

    Works for unrolled and scan trees, float and W8A8 (quantize_vit)
    params. No-op permutation when the mesh axis has size 1.

    Flash-path only: the einsum path (use_flash=False) reshapes qkv
    assuming the ORIGINAL [q|k|v] head-ordered columns — permuted
    params would silently scramble its head slices, so that combination
    is rejected (plain vit_tp_shardings is all the einsum path needs).
    """
    import jax as _jax

    if not config.use_flash:
        raise ValueError(
            "prepare_tp_params requires use_flash=True: the einsum "
            "attention path assumes unpermuted [q|k|v] qkv columns "
            "(use vit_tp_shardings alone for einsum TP)")
    shards = mesh.shape[axis]
    perm = qkv_tp_permutation(config.hidden_size, config.num_heads,
                              shards)

    def permute_qkv(qkv):
        out = dict(qkv)
        for key in ("kernel", "kernel_q"):
            if key in out:
                out[key] = jnp.asarray(out[key])[..., perm]
        for key in ("bias", "scale"):
            if key in out:
                out[key] = jnp.asarray(out[key])[..., perm]
        return out

    p = dict(params["params"])
    if config.scan_layers:
        blk = dict(p["blocks"])
        blk["qkv"] = permute_qkv(blk["qkv"])
        p["blocks"] = blk
    else:
        for i in range(config.num_layers):
            blk = dict(p[f"block{i}"])
            blk["qkv"] = permute_qkv(blk["qkv"])
            p[f"block{i}"] = blk
    out = dict(params)
    out["params"] = p
    new_cfg = dataclasses.replace(config, tp_axis=axis, tp_mesh=mesh)
    return _jax.tree.map(lambda x: x, out), new_cfg


def _resize_matrix(n_in: int, n_out: int) -> jnp.ndarray:
    """(n_out, n_in) matrix M with M @ x == jax.image.resize(x) along one
    axis — built by resizing the identity, so it captures resize's exact
    kernel (incl. the antialiased triangle filter used on downsampling;
    a hand-built 2-tap bilinear matrix is ~2.1 off per pixel)."""
    return jax.image.resize(jnp.eye(n_in, dtype=jnp.float32),
                            (n_out, n_in), method="bilinear")


def preprocess_images(images_uint8_or_float, target_hw, dtype=jnp.float32):
    """Resize + ImageNet-normalize a batch of images on device.

    Replaces the per-image HF processor calls of the reference
    (camera.py:53-56). Accepts (..., H, W, 3) uint8 [0,255] or float [0,1];
    returns (..., H', W', 3) normalized.

    The separable resize runs as two MXU matmul contractions instead of
    jax.image.resize's gather lowering — 6x faster on TPU (0.46 vs
    2.9 ms for 6 cams), bit-identical in f32 and within bf16 rounding
    (≈0.4%, the same magnitude as uint8 quantization) in bf16.
    """
    x = jnp.asarray(images_uint8_or_float)
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
    x = x.astype(jnp.float32)
    lead = x.shape[:-3]
    H, W = x.shape[-3], x.shape[-2]
    Ho, Wo = target_hw
    mm_dtype = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32
    # f32 requests get true-f32 matmuls (TPU default precision is
    # bf16-grade even on f32 inputs — CLAUDE.md trap 6)
    prec = None if mm_dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    wh = _resize_matrix(H, Ho).astype(mm_dtype)
    ww = _resize_matrix(W, Wo).astype(mm_dtype)
    xb = x.reshape((-1, H, W, 3)).astype(mm_dtype)
    y = jnp.einsum("oh,bhwc->bowc", wh, xb, precision=prec,
                   preferred_element_type=jnp.float32)
    y = jnp.einsum("pw,bowc->bopc", ww, y.astype(mm_dtype), precision=prec,
                   preferred_element_type=jnp.float32)
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    y = (y - mean) / std
    return y.reshape(lead + (Ho, Wo, 3)).astype(dtype)
