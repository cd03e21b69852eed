"""Deployment export: serialize the inference step to StableHLO.

A production serving stack wants the model as a self-contained artifact
— weights baked in, no Python model code at load time. ``jax.export``
gives exactly that on TPU: the jitted function lowers to StableHLO with
Mosaic custom-calls for the Pallas kernels, serializes to bytes, and a
server (Python or C++ via the PJRT C API) deserializes and calls it.

The reference has no analog (it pickles torch state_dicts and re-runs
the Python model, main_train.py:97-104); this is the TPU-native
deployment contract.

    infer = lambda *a: model.apply(params, *a)   # params baked in
    blob = export_infer_bytes(infer, example_args)
    f = load_exported(blob)          # .call-able on matching shapes
    logits, mask = f(*example_args)

CLI: python scripts/export_model.py --config <yaml> --out model.shlo
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
from jax import export as _jexport


def export_infer_bytes(apply_fn: Callable, example_args: Sequence,
                       platforms: Sequence[str] | None = None) -> bytes:
    """Serialize ``jax.jit(apply_fn)(*example_args)`` to portable bytes.

    ``apply_fn`` must close over params (weights are baked into the
    artifact as constants). ``platforms`` defaults to the current
    backend; pass ("tpu",) to cross-export from a CPU host.
    """
    exported = _jexport.export(
        jax.jit(apply_fn),
        platforms=tuple(platforms) if platforms else None,
    )(*example_args)
    return exported.serialize()


def load_exported(blob: bytes) -> Callable:
    """Deserialize an exported artifact; returns a callable running the
    compiled computation on the current backend."""
    exported = _jexport.deserialize(blob)
    return exported.call
