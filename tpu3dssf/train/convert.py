"""Checkpoint layout conversion: unrolled blocks ↔ nn.scan stacks.

``PTv3Config.scan_blocks`` (and ``ViTConfig.scan_layers``) change the
param-tree layout — per-block subtrees ``enc3_blk0..blk5`` become one
``enc3_scan`` subtree whose leaves carry a leading depth axis (ViT:
``block0..blkN`` → ``blocks``). A checkpoint written under one layout
cannot restore under the other, and scan_blocks is the designated escape
hatch for AOT program-size limits — so checkpoints must survive flipping
it. These transforms restack/unstack any state pytree (params AND
optimizer moments, which mirror the param tree) in either direction:

    restacked = convert_tree(tree, to_scan=True)    # blk{i} → _scan
    unrolled  = convert_tree(tree, to_scan=False)   # _scan → blk{i}

Conversion is exact at the math level: the scanned model feeds blocks
that attend along the stream's own order an identity-arange permutation
(a no-op gather), so converted params produce the same logits up to
XLA's fusion reassociation under scan (few-ULP, ≤3e-6 observed; tested
in tests/test_convert.py). The tree roundtrip itself is bit-identical. Reference analog: resume must outlive config
changes (the reference reloads best weights across runs,
main_train.py:77-78).

CLI: ``python scripts/convert_checkpoint.py --in d1 --out d2 --to scan``.
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np

_BLK = re.compile(r"^(.+)_blk(\d+)$")     # PTv3 unrolled stage blocks
_SCAN = re.compile(r"^(.+)_scan$")        # PTv3 scanned stage
_VIT_BLK = re.compile(r"^block(\d+)$")    # ViT unrolled layers
_VIT_SCAN = "blocks"                      # ViT scanned layers


def _is_mapping(x) -> bool:
    return isinstance(x, dict)


def _stack_subtrees(subtrees):
    """Stack a list of identically-structured pytrees along axis 0."""
    import jax

    return jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs],
                                             axis=0), *subtrees)


def _unstack_subtree(tree, depth: int):
    import jax

    return [jax.tree.map(lambda a, i=i: np.asarray(a)[i], tree)
            for i in range(depth)]


def _leading_dim(tree) -> int:
    import jax

    leaves = jax.tree.leaves(tree)
    if not leaves:
        raise ValueError("cannot unstack an empty subtree")
    return int(np.asarray(leaves[0]).shape[0])


def convert_tree(tree: Any, to_scan: bool) -> Any:
    """Recursively convert block layouts anywhere in a state pytree.

    Handles dicts (flax param trees, after orbax restore everything is
    dicts/lists) and lists/tuples (optimizer chains). Non-container
    leaves pass through untouched. Depth-1 PTv3 stages keep their
    ``_blk0`` name in both layouts (run_blocks only scans depth > 1).
    """
    if isinstance(tree, (list, tuple)):
        out = [convert_tree(v, to_scan) for v in tree]
        if isinstance(tree, tuple):
            # namedtuples (optax states) reconstruct from *args
            return (type(tree)(*out) if hasattr(tree, "_fields")
                    else tuple(out))
        return out
    if not _is_mapping(tree):
        return tree

    if to_scan:
        groups: dict = {}
        vit_groups: dict = {}
        out = {}
        for k, v in tree.items():
            m = _BLK.match(k)
            mv = _VIT_BLK.match(k)
            if m and _is_mapping(v):
                groups.setdefault(m.group(1), {})[int(m.group(2))] = v
            elif mv and _is_mapping(v):
                vit_groups[int(mv.group(1))] = v
            else:
                out[k] = convert_tree(v, to_scan)
        for name, blocks in sorted(groups.items()):
            idxs = sorted(blocks)
            if idxs != list(range(len(idxs))):
                raise ValueError(
                    f"non-contiguous block indices for {name}: {idxs}")
            if len(idxs) == 1:  # depth-1 stages stay unrolled
                out[f"{name}_blk0"] = convert_tree(blocks[0], to_scan)
            else:
                out[f"{name}_scan"] = _stack_subtrees(
                    [convert_tree(blocks[i], to_scan) for i in idxs])
        if vit_groups:
            idxs = sorted(vit_groups)
            if idxs != list(range(len(idxs))):
                raise ValueError(
                    f"non-contiguous ViT block indices: {idxs}")
            out[_VIT_SCAN] = _stack_subtrees(
                [convert_tree(vit_groups[i], to_scan) for i in idxs])
        return out

    # to unrolled
    out = {}
    for k, v in tree.items():
        m = _SCAN.match(k)
        if m and _is_mapping(v):
            for i, sub in enumerate(_unstack_subtree(v, _leading_dim(v))):
                out[f"{m.group(1)}_blk{i}"] = sub
        elif k == _VIT_SCAN and _is_mapping(v):
            for i, sub in enumerate(_unstack_subtree(v, _leading_dim(v))):
                out[f"block{i}"] = sub
        else:
            out[k] = convert_tree(v, to_scan)
    return out
