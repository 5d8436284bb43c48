"""Microbenchmark: the dense-placement scatter's cost model on TPU.

The engine's segmented reductions end in ONE unique-index scatter of K
particle rows into an (M, C) cell table (ops/scatter._place_at_last).
Per-step there are ~7 such placements at 128^3 (68 ms total, round-3
profile).  This asks: is the scatter row-bound (cost ~ K, insensitive
to C) or byte-bound (cost ~ K*C)?  The answer decides whether merging
placements (fewer K-row scatters, more channels each) wins.

  python benchmarks/scatter_micro.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, *args, iters=20):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    K = 356_256
    M = 811_330
    rng = np.random.default_rng(0)
    ids = np.sort(rng.integers(0, M, K)).astype(np.int32)
    last = np.concatenate([ids[1:] != ids[:-1], [True]])
    slots = np.where(last, ids, M + np.arange(K, dtype=np.int32))
    slots_d = jnp.asarray(slots)
    ids_d = jnp.asarray(ids)

    for C in (1, 27, 54, 108, 128, 135, 256):
        vals = jnp.asarray(rng.standard_normal((K, C), dtype=np.float32))

        @jax.jit
        def place_drop(v, s):
            buf = jnp.zeros((M,) + v.shape[1:], v.dtype)
            return buf.at[s].set(v, mode="drop", unique_indices=True)

        @jax.jit
        def place_tail(v, s):
            buf = jnp.zeros((M + K,) + v.shape[1:], v.dtype)
            return buf.at[s].set(v, unique_indices=True)[:M]

        t_drop = bench(place_drop, vals, slots_d)
        t_tail = bench(place_tail, vals, slots_d)
        print(f"C={C:4d}  drop {t_drop:7.2f} ms   tail {t_tail:7.2f} ms")

    # permutation gather (the payload take) for reference
    for C in (1, 3, 13, 54):
        tab = jnp.asarray(rng.standard_normal((K, C), dtype=np.float32))
        perm = jnp.asarray(rng.permutation(K).astype(np.int32))

        @jax.jit
        def take(t, p):
            return t[p]

        print(f"gather (K,{C:3d})[perm]  {bench(take, tab, perm):7.2f} ms")


if __name__ == "__main__":
    main()
