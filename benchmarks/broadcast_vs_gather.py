"""Is the segment broadcast (masked-doubling scan, 8 passes over a
(K,128)-lane buffer) still the right way to read a dense per-cell table
at cell-sorted particles — or does a plain row gather win now that the
rows are full 128-lane tiles (512 B/row, not the 4-byte rows that made
per-corner gathers row-bound in round 2)?

  python benchmarks/broadcast_vs_gather.py [--k 356256] [--cells 2460375]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(f, label, iters=20):
    import jax

    out = f()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f()
        jax.block_until_ready(out)  # no pipelining: real per-call wall
    ms = (time.perf_counter() - t0) / iters * 1000
    print(f"{label}: {ms:.2f} ms", flush=True)
    return out, ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--k", type=int, default=356256)
    p.add_argument("--cells", type=int, default=79 * 130 * 79)
    p.add_argument("--channels", type=int, default=119)
    p.add_argument("--per-cell", type=float, default=8.0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from python_fluid_simulation_tpu.ops.scatter import (
        segment_broadcast_sorted,
    )

    rng = np.random.default_rng(0)
    # sorted ids with ~per-cell particles per occupied cell, occupying
    # k/per_cell distinct cells of [0, cells)
    n_seg = max(1, int(args.k / args.per_cell))
    seg_cells = np.sort(rng.choice(args.cells, size=n_seg, replace=False))
    ids = np.sort(rng.integers(0, n_seg, size=args.k))
    sorted_ids = jnp.asarray(seg_cells[ids], jnp.int32)
    table = jnp.asarray(
        rng.standard_normal((args.cells, args.channels)), jnp.float32
    )

    bc = jax.jit(lambda t, i: segment_broadcast_sorted(t, i))
    ga = jax.jit(
        lambda t, i: jnp.take(t, i, axis=0, mode="fill", fill_value=0.0)
    )
    o1, _ = timeit(lambda: bc(table, sorted_ids), "segment_broadcast")
    o2, _ = timeit(lambda: ga(table, sorted_ids), "row_gather")
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=0)
    print("identical results")


if __name__ == "__main__":
    main()
