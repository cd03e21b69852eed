"""Probe what device-memory observability this platform actually has.

Round 4 found `peak_hbm=0 MiB` in every TPU run: the axon plugin's
`Device.memory_stats()` apparently exposes nothing. This script prints,
on the live backend:

  1. the raw `memory_stats()` dict (or the exception),
  2. `jax.local_devices()[0]` attributes that look memory-related,
  3. a compiled program's static `memory_analysis()` (argument/output/
     temp/alias bytes) — the AOT-side fallback bench.py uses when the
     runtime exposes no high-water mark.

Run bare on the TPU: python scripts/probe_memory.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    d = jax.devices()[0]
    print(f"backend={jax.default_backend()} device={d}")

    print("\n-- memory_stats() --")
    try:
        print(repr(d.memory_stats()))
    except Exception as e:
        print(f"raises {type(e).__name__}: {e}")

    print("\n-- memory-ish device attributes --")
    for name in dir(d):
        if any(k in name.lower() for k in ("mem", "bytes", "hbm")):
            try:
                attr = getattr(d, name)
                print(f"{name} = {attr() if callable(attr) else attr}")
            except Exception as e:
                print(f"{name} raises {type(e).__name__}: {e}")

    print("\n-- compiled.memory_analysis() --")
    x = jnp.zeros((1024, 1024), jnp.bfloat16)
    compiled = jax.jit(lambda a: (a @ a).sum()).lower(x).compile()
    try:
        ma = compiled.memory_analysis()
        print(type(ma))
        for name in dir(ma):
            if name.startswith("_"):
                continue
            try:
                print(f"{name} = {getattr(ma, name)}")
            except Exception as e:
                print(f"{name} raises {type(e).__name__}: {e}")
    except Exception as e:
        print(f"raises {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
