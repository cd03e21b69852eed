"""time_device internals: every numeric output leaf must stay live.

Regression for a measurement bug: ``_live_sum`` only kept INEXACT
(float) leaves, so a function with integer outputs (e.g. an int8->int32
matmul) contributed nothing to the fori_loop carry and XLA dead-code
-eliminated the entire body — it timed as ~0 (an int8 matmul read
"13,447 TOP/s", 34x the chip's int8 peak).
"""

import jax.numpy as jnp
import numpy as np

from tpu3dssf.utils.timing import _live_sum, time_device


def test_live_sum_keeps_integer_leaves():
    x = jnp.arange(5, dtype=jnp.int32)           # sums to 10
    y = jnp.ones((2, 2), jnp.float32)            # sums to 4
    assert float(_live_sum({"a": x, "b": y})) == 14.0
    assert float(_live_sum(x)) == 10.0           # int-only tree != 0
    assert float(_live_sum(None)) == 0.0


def test_live_sum_skips_non_numeric():
    tree = {"m": jnp.ones((3,), bool), "s": "label",
            "f": jnp.full((2,), 2.0, jnp.bfloat16)}
    assert float(_live_sum(tree)) == 4.0


def test_time_device_runs_integer_output_fn():
    # smoke: an integer-output body must go through warmup + both trip
    # counts without raising (slope may be nan on a jittery host — that
    # is the documented "re-run with larger iters" signal, not an error)
    a = jnp.asarray(np.arange(64, dtype=np.int32).reshape(8, 8))
    dt = time_device(lambda m: m @ m, a, iters=2, repeats=1)
    assert isinstance(dt, float)


def test_chained_slope_guards_nonpositive_slope(monkeypatch):
    """Same invalid-measurement contract as time_device: when jitter
    makes wall(n2) <= wall(n1), chained_slope must warn and return NaN,
    never record a zero/negative seconds-per-call."""
    import warnings

    from tpu3dssf.utils import timing

    # fake clock: warmup run 0s, n1 runs read 10s, n2 runs read 1s
    walls = iter([0.0, 0.0,            # warmup run(1)
                  0.0, 10.0, 0.0, 10.0,  # run(n1) x repeats
                  0.0, 1.0, 0.0, 1.0])   # run(n2) x repeats

    class FakeTime:
        perf_counter = staticmethod(lambda: next(walls))

    monkeypatch.setattr(timing, "time", FakeTime)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        dt = timing.chained_slope(lambda acc: acc + 1.0, n1=2, n2=8)
    assert np.isnan(dt)
    assert any("non-positive slope" in str(x.message) for x in w)


def test_program_peak_mb_static_analysis():
    """program_peak_mb reads XLA's buffer-assignment peak — the fallback
    datum when the runtime exposes no memory_stats (the axon TPU plugin
    returns None, scripts/probe_memory.py). The peak must cover at least
    the argument buffers and never be absurd."""
    from tpu3dssf.utils.timing import program_peak_mb

    x = jnp.zeros((512, 512), jnp.float32)  # 1 MiB argument
    peak = program_peak_mb(lambda a: (a @ a).sum(), x)
    assert peak >= 1.0        # holds the input at minimum
    assert peak < 64.0        # sanity: a 1 MiB matmul is not 64 MiB

    # failure contract: un-jittable callables report 0.0, never raise
    def unlowerable(a):
        raise RuntimeError("boom")

    assert program_peak_mb(unlowerable, x) == 0.0


def test_hbm_squeeze_loop_contract():
    """hbm_squeeze's control flow on a healthy program: with tiny units
    and a small cap it exhausts max_units without a failure (CPU has
    gigabytes of headroom) and frees its ballast; a program that always
    raises is reported as run@0, never raised."""
    from tpu3dssf.utils.timing import hbm_squeeze

    x = jnp.zeros((64, 64), jnp.float32)
    res = hbm_squeeze(lambda: (x @ x).sum(), unit_mib=1, max_units=3)
    assert res == {"k_ok": 3, "failed": None, "unit_mib": 1}

    def broken():
        raise RuntimeError("boom")

    res = hbm_squeeze(broken, unit_mib=1, max_units=3)
    assert res["k_ok"] == -1 and res["failed"] == "run@0"
