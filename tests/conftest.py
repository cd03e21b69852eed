"""Test config: run everything on CPU with 8 virtual devices.

The image's sitecustomize registers the axon TPU plugin in EVERY
interpreter and programmatically sets ``jax_platforms=axon,cpu`` —
overriding the JAX_PLATFORMS env var. Tests must not touch the (single,
tunneled) TPU: ops dispatched over the tunnel are latency-bound and two
processes serialize on the device grant. So we force the config back to
cpu here, before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _drain_jax_effects():
    """Wait for pending io_callbacks after every test.

    Pallas TPU-interpret mode tears down its global SharedMemory via an
    async io_callback; on this 1-core host a later interpret-mode
    computation can initialize against the STALE object (sized for a
    different device count), deadlocking its cleanup barrier — the
    whole pytest process then dies with "Fatal Python error: Aborted"
    (seen: any interpret test + test_graft_entry_dryrun back to back).
    An effects barrier between tests guarantees the teardown ran.
    """
    yield
    try:
        jax.effects_barrier()
    except Exception:
        pass
