"""Trustworthy device timing on the tunneled-TPU transport.

Host-side loop timings are unreliable here: ``block_until_ready`` on the
axon backend can return before remote execution completes, so
loop-then-block underestimates wildly. ``time_device`` instead runs the
function N times inside ONE jitted ``lax.fori_loop`` (keeping the result
live through a scalar reduction) and fetches a scalar — a single
dispatch whose wall time is genuinely device compute.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def _live_sum(tree) -> jax.Array:
    # every NUMERIC leaf must feed the carry: keeping only float leaves
    # would dead-code-eliminate integer-output kernels (an int8->int32
    # matmul timed "13,447 TOP/s" before this — the whole body was DCE'd)
    leaves = [l for l in jax.tree.leaves(tree)
              if hasattr(l, "dtype") and jnp.issubdtype(l.dtype,
                                                        jnp.number)]
    if not leaves:
        leaves = [jnp.float32(0)]
    return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)


def time_device(fn: Callable, *args, iters: int = 10,
                warmup: bool = True, repeats: int = 2) -> float:
    """Seconds per call of ``fn(*args)``, measured device-side.

    Runs the body N times inside one jitted ``fori_loop`` (carry
    perturbation of every input defeats hoisting), then derives the
    per-call time from the SLOPE between two trip counts (``iters`` and
    ``4*iters``): wall(n) = F + n*t, so t = Δwall/Δn. The fixed term F
    (dispatch RTT + fetch, ~25-30 ms on the tunneled transport) cancels
    exactly — a single-point wall/n estimate overstates sub-ms kernels
    by F/n, which at iters=20 is a +1.4 ms phantom per call.

    For µs-scale kernels pass ``iters`` ≥ 100 so RTT jitter (~±1 ms over
    ``3*iters`` extra calls) stays small against the slope.
    """

    @jax.jit
    def run(n, *a):
        def body(i, acc):
            # make EVERY numeric input depend on the carry (add zero) —
            # otherwise XLA hoists any branch fed only by loop-invariant
            # args out of the loop and that branch gets amortized away
            def perturb(x):
                if hasattr(x, "dtype") and jnp.issubdtype(
                        x.dtype, jnp.number):
                    return x + (acc * 0).astype(x.dtype)
                return x

            out = fn(*[perturb(x) for x in a])
            return acc + _live_sum(out)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    if warmup:
        float(run(jnp.int32(1), *args))  # one compile (n is traced)

    def wall(n):
        best = float("inf")
        for _ in range(max(1, repeats)):
            t0 = time.perf_counter()
            float(run(jnp.int32(n), *args))  # scalar fetch = completion
            best = min(best, time.perf_counter() - t0)
        return best

    n1, n2 = iters, 4 * iters
    slope = (wall(n2) - wall(n1)) / (n2 - n1)
    if slope <= 0.0:
        # RTT jitter exceeded the kernel cost: the measurement is
        # invalid, not "0 s/call" — tell the caller to raise iters
        # instead of silently recording a too-good-to-be-true number
        import warnings
        warnings.warn(
            f"time_device: non-positive slope ({slope*1e6:.1f} us/call "
            f"at iters={iters}) — RTT jitter swamped the kernel; "
            f"re-run with larger iters", stacklevel=2)
        return float("nan")
    return slope


def chained_slope(step: Callable, n1: int = 2, n2: int = 8,
                  repeats: int = 2, warmup: bool = True) -> float:
    """Seconds per call of a MULTI-DISPATCH step, host-side slope.

    ``time_device`` jits its body into ONE ``fori_loop`` program —
    exactly wrong for functions whose point is multiple dispatches
    (``make_looped_encode`` exists to avoid that one big program;
    CLAUDE.md trap 12). This measures host-side with the same two-point
    slope protocol instead: ``step(acc) -> acc`` must chain each call's
    input on the previous call's reduced scalar output (so no dispatch
    can be elided or reordered), the final ``float(acc)`` is the
    completion fence, and ``(wall(n2)-wall(n1))/(n2-n1)`` cancels the
    fixed dispatch RTT.
    """

    def run(n):
        acc = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(n):
            acc = step(acc)
        float(acc)
        return time.perf_counter() - t0

    if warmup:
        run(1)
    w1 = min(run(n1) for _ in range(max(1, repeats)))
    w2 = min(run(n2) for _ in range(max(1, repeats)))
    slope = (w2 - w1) / (n2 - n1)
    if slope <= 0.0:
        # same invalid-measurement contract as time_device: RTT jitter
        # over only (n2-n1) extra calls swamped the step — NaN, never a
        # silently-recorded zero/negative seconds-per-call
        import warnings
        warnings.warn(
            f"chained_slope: non-positive slope ({slope*1e3:.2f} ms/call "
            f"at n1={n1}, n2={n2}) — jitter swamped the step; re-run "
            f"with larger n2", stacklevel=2)
        return float("nan")
    return slope


def peak_hbm_mb() -> float:
    """Peak device-memory high-water mark in MiB (0.0 if unavailable).

    Reads ``peak_bytes_in_use`` from the default device's memory stats —
    the datum remat/batching decisions need (VERDICT r3 task 8; reference
    analog: utils/evaluation.py:76-81 ``torch.cuda.memory_allocated``).
    The CPU backend exposes no stats; the axon TPU plugin does.
    """
    try:
        stats = jax.devices()[0].memory_stats()
        if stats:
            peak = stats.get("peak_bytes_in_use",
                             stats.get("bytes_in_use", 0))
            return peak / (1024 ** 2)
    except Exception:
        pass
    return 0.0


def program_peak_mb(fn: Callable, *args) -> float:
    """Static peak-HBM of ``jit(fn)(*args)`` in MiB (0.0 on failure).

    XLA's buffer assignment knows the exact high-water mark of one
    program (``memory_analysis().peak_memory_in_bytes``: arguments +
    outputs + live temporaries). This is the fallback datum when the
    runtime exposes no ``memory_stats()`` — the axon TPU plugin returns
    None (probed, scripts/probe_memory.py) so :func:`peak_hbm_mb` reads
    0.0 there. Static analysis is per-program, not per-process: it
    excludes other live buffers, which is exactly what batching/remat
    decisions need. Costs one trace + (cache-hit) compile.
    """
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        return compiled.memory_analysis().peak_memory_in_bytes / (1024 ** 2)
    except Exception:
        return 0.0


def hbm_squeeze(run: Callable[[], object], unit_mib: int = 128,
                max_units: int = 140, log=None) -> dict:
    """Empirically bracket a program's real HBM high-water mark.

    The axon plugin exposes no runtime ``memory_stats()`` (probed,
    scripts/probe_memory.py), so :func:`program_peak_mb`'s static
    buffer-assignment peak is the only per-program number — and it has
    never been validated against the device (VERDICT r4 task 7;
    reference analog: utils/evaluation.py:76-81 memory accounting).
    This helper validates it by *squeezing*: allocate ``unit_mib``-MiB
    ballast buffers one at a time and re-run the (already compiled)
    program after each, until either the ballast allocation or the run
    fails with RESOURCE_EXHAUSTED. If the static peak is faithful, the
    program keeps succeeding until free HBM ≈ its peak:

        usable_hbm ≈ k_fail * unit + real_peak   (to one unit)

    With the same ``unit_mib`` the UNKNOWN usable-HBM constant cancels
    between two programs: Δ(k_fail) * unit ≈ −Δ(real_peak), which is
    directly comparable to −Δ(static_peak). Returns a dict with
    ``k_ok`` (most units survived), ``failed`` ("ballast"/"run"/None)
    and ``unit_mib``. Frees all ballast before returning. TPU-only by
    design — on CPU the "ballast" would be host RAM and can OOM the
    machine.
    """
    log = log or (lambda s: None)
    unit_fn = jax.jit(lambda: jnp.zeros((unit_mib << 20,), jnp.uint8))
    ballast, failed = [], None
    try:
        out = run()
        jax.block_until_ready(out)
        del out
    except Exception as e:  # program must run with zero ballast
        return {"k_ok": -1, "failed": "run@0", "unit_mib": unit_mib,
                "error": repr(e)[:200]}
    while len(ballast) < max_units and failed is None:
        try:
            b = unit_fn()
            b.block_until_ready()
            ballast.append(b)
        except Exception:
            failed = "ballast"
            break
        try:
            out = run()
            jax.block_until_ready(out)
            del out
            log(f"[squeeze] ok with {len(ballast)} x {unit_mib} MiB "
                f"ballast")
        except Exception:
            failed = "run"
    k = len(ballast) - (1 if failed == "run" else 0)
    del ballast
    return {"k_ok": k, "failed": failed, "unit_mib": unit_mib}


def measure_efficiency(func, *args, **kwargs):
    """Wall-time + device-memory snapshot around one call.

    API-parity helper for reference utils/evaluation.py:76-81
    (``measure_efficiency`` — wall time + cuda memory_allocated, never
    actually called upstream). Memory comes from jax's per-device stats
    when the backend exposes them.
    """
    t0 = time.perf_counter()
    result = func(*args, **kwargs)
    result = jax.block_until_ready(result)
    runtime = time.perf_counter() - t0
    mem_mb = 0.0
    try:
        stats = jax.devices()[0].memory_stats()
        if stats:
            mem_mb = stats.get("bytes_in_use", 0) / (1024 ** 2)
    except Exception:
        pass
    return result, {"runtime_sec": runtime, "mem_alloc_MB": mem_mb}


class StepTimer:
    """Rolling per-step wall-time tracker for train loops (the reference
    has only tqdm postfix timing; this is a first-class metric)."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times = []
        self._last = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    @property
    def mean_ms(self) -> float:
        return 1e3 * (sum(self._times) / len(self._times)) \
            if self._times else 0.0
