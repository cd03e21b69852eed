"""Check the sequence-parallel block path on the real chip.

CPU tests (tests/test_sp.py) prove the SP math — halo exchange, window
locality, grads — on an 8-device virtual mesh, but with the Pallas
kernels interpret-traced. This script proves the OTHER half on actual
TPU hardware: the SP shard_map + ppermute + real Mosaic-lowered window
kernel compile and match the unsharded block. One chip means a 1-device
mesh (the ppermute pair is empty — end-shard zeros, same as the global
pad), so the halo itself stays CPU-verified; multi-chip hardware is not
available here (PERF.md "Known inefficiencies" 5).

Run bare on the TPU: python scripts/check_sp_tpu.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tpu3dssf.models.ptv3 import PTv3Block
    from tpu3dssf.parallel import create_mesh, sp_block_apply

    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    n, c = 1024, 128  # C=128 routes through the packed flash kernel
    x = jnp.asarray(rng.normal(size=(2, n, c)).astype(np.float32))
    mask = jnp.asarray(np.arange(n)[None, :] < n - 37).repeat(2, 0)
    mk = lambda sp: PTv3Block(channels=c, heads=8, window=128,
                              mlp_ratio=2.0, use_pallas=True, sp_axis=sp)
    params = jax.jit(mk(None).init)(jax.random.key(1), x, None, None,
                                    mask)
    ref = np.asarray(jax.jit(
        lambda p, xx, mm: mk(None).apply(p, xx, None, None, mm))(
            params, x, mask))
    ndev = jax.device_count()
    mesh = create_mesh((ndev,), ("seq",))
    got = np.asarray(sp_block_apply(mk("seq"), params, x, mask, mesh,
                                    axis="seq"))
    err = float(np.abs(got - ref).max())
    print(f"SP({ndev}-chip {jax.default_backend()}, real Pallas "
          f"window=128 C=128): max|err|={err:.2e}")
    assert err < 1e-4, err
    print("OK")


if __name__ == "__main__":
    main()
