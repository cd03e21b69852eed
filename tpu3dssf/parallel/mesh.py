"""Device mesh + sharding helpers (data parallelism over scenes).

The reference is strictly single-process single-GPU (SURVEY.md §2.4: no
torch.distributed/NCCL anywhere). Here scaling is SPMD: a 1-D ``data``
mesh axis shards the scene batch across chips; params are replicated;
XLA inserts the gradient all-reduces (psum over ICI) during jit
partitioning. The confusion-matrix metric reduction is a plain sum of
per-shard (C, C) matrices, so eval sharding needs nothing special.

Multi-host: call ``jax.distributed.initialize()`` before ``create_mesh``
and the same code spans slices (DCN between hosts, ICI inside).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(shape: Optional[Tuple[int, ...]] = None,
                axis_names: Sequence[str] = ("data",)) -> Mesh:
    """Build a Mesh over all visible devices (default: 1-D data axis)."""
    if shape is None:
        shape = (jax.device_count(),)
    devices = mesh_utils.create_device_mesh(shape)
    return Mesh(devices, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-dim (batch) sharding."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """device_put every array leaf with its batch dim sharded over ``axis``.

    Batch size must be divisible by the mesh axis size.
    """
    sh = batch_sharding(mesh, axis)

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, replicated_sharding(mesh))
        return jax.device_put(x, sh)

    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params / train state) across the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def vit_tp_shardings(params, mesh: Mesh, axis: str = "model"):
    """Megatron-style tensor-parallel NamedShardings for a ViT tree.

    Column-parallel qkv/mlp_in (output dim sharded over ``axis``),
    row-parallel proj/mlp_out (input dim sharded) — GSPMD then inserts
    the single all-reduce per residual branch over ICI. Everything else
    (norms, embeddings) is replicated. Works for both the unrolled
    (block0..N) and scan_layers (stacked "blocks") param trees; kernels
    gain one leading layer dim in the stacked case, which is why specs
    are derived from rank. Intended for the ViT-L option (SURVEY.md
    §2.4: "keep mesh axis reserved for ViT-L").

    Works with BOTH attention paths: the einsum path needs nothing
    more; the Pallas flash path (use_flash=True) additionally needs
    ``tpu3dssf.models.vit.prepare_tp_params`` (permutes qkv columns to
    the per-shard packed layout and stamps tp_mesh/tp_axis into the
    config so the kernel runs head-parallel under shard_map).
    """
    def spec_for(path, x):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        leaf = names[-1]
        mod = names[-2] if len(names) >= 2 else ""
        if mod in ("qkv", "mlp_in") and leaf == "kernel":
            return P(*([None] * (x.ndim - 1) + [axis]))      # column
        if mod in ("qkv", "mlp_in") and leaf == "bias":
            return P(*([None] * (x.ndim - 1) + [axis]))
        if mod in ("proj", "mlp_out") and leaf == "kernel":
            return P(*([None] * (x.ndim - 2) + [axis, None]))  # row
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, x: NamedSharding(mesh, spec_for(path, x)), params)
