"""Sequence parallelism over the serialized point order (giant scenes).

The reference is single-GPU and has no sequence-parallel analog
(SURVEY.md §5 "Long-context / sequence parallelism: None"); nuScenes
sweeps (~34k points) never need it. This module implements the design
stance SURVEY §5 records for scenes that outgrow one chip's HBM: shard
the space-filling-curve order CONTIGUOUSLY across chips. Because PTv3's
attention is windowed over that order, windows never span shards once
the per-shard length is a window multiple — attention, LayerNorm, the
qkv/proj/MLP matmuls and the mask algebra are all shard-local, and the
ONLY cross-chip traffic in a block is the CPE depthwise conv's one-row
halo (``lax.ppermute`` in ``_DepthwiseConv3``): O(B·C) bytes per block
vs O(B·N·C) activations, so ICI time is negligible and scaling is
linear in chips.

Scope (documented, enforced): blocks attend along the CPE curve itself
(``perm=None``). Cross-order re-sorts and pooling are GLOBAL gathers in
sorted space — supporting them sequence-parallel needs a distributed
permute, which nuScenes-scale workloads never pay for (the whole model
fits one chip with 12+ GiB to spare; PERF.md "Static peak HBM"). The
unit of SP here is therefore the serialized transformer stage, the part
whose activations dominate memory at giant N.

Verified: tests/test_sp.py runs a PTv3Block over an 8-device virtual
mesh and checks the sharded output equals the single-device one; the
multichip dryrun (``__graft_entry__.dryrun_multichip``) includes an SP
leg so the driver exercises it every round.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, PartitionSpec as P


def sp_block_apply(block, params: Any, x, mask, mesh: Mesh,
                   axis: str = "seq"):
    """Run one PTv3Block sequence-parallel over ``mesh[axis]``.

    Args:
      block: a ``models.ptv3.PTv3Block`` constructed with
        ``sp_axis=axis`` (the CPE pulls its halos over that axis).
      params: the block's variables (replicated; identical to the
        single-device tree, so existing checkpoints shard unchanged).
      x: (B, N, C) features in serialized (sorted) order. N must split
        into whole windows on every shard:
        ``N % (mesh.shape[axis] * block.window) == 0``.
      mask: (B, N) validity.
      mesh: device mesh containing ``axis``.

    Returns:
      (B, N, C), sharded over ``axis`` on the point dim; equal to the
      unsharded ``block.apply`` output.
    """
    if block.sp_axis != axis:
        raise ValueError(f"block.sp_axis={block.sp_axis!r} must equal "
                         f"the mesh axis {axis!r}")
    n_sh = mesh.shape[axis]
    n = x.shape[1]
    if n % (n_sh * block.window):
        raise ValueError(
            f"N={n} must be a multiple of shards*window="
            f"{n_sh}*{block.window} so windows never span shards")

    def local(p, xs, ms):
        return block.apply(p, xs, None, None, ms)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(None, axis, None), P(None, axis)),
        out_specs=P(None, axis, None),
        check_vma=False,  # pallas_call outputs carry no vma annotation
    )(params, x, mask)
