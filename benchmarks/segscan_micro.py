"""Micro-benchmark: Pallas single-pass segmented scan vs the XLA
masked-doubling loops, at 128^3-class particle counts.

  python benchmarks/segscan_micro.py [--k 356256] [--c 12 54 125]
"""

import argparse
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
    p = argparse.ArgumentParser()
    p.add_argument("--k", type=int, default=356256)
    p.add_argument("--c", type=int, nargs="+", default=[12, 54, 125])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from python_fluid_simulation_tpu.ops import scatter as sc
    from python_fluid_simulation_tpu.ops.pallas_segscan import (
        seg_scan_sorted,
    )

    rng = np.random.default_rng(0)
    k = args.k
    m = k // 8  # ~8 particles/cell
    ids = jnp.asarray(np.sort(rng.integers(0, m, size=k)).astype(np.int32))
    first = jnp.concatenate(
        [jnp.array([True]), ids[1:] != ids[:-1]]
    )
    same = ~first

    def xla_scan_add(vals):
        out = vals
        for p_ in range(8):
            s = 1 << p_
            nv = sc.shift(out, (-s, 0), 0.0)
            ni = sc.shift(ids, (-s,), -1)
            out = out + jnp.where(sc._bcast(ni == ids, out), nv, 0.0)
        return out

    def xla_scan_min(vals):
        out = vals
        for p_ in range(8):
            s = 1 << p_
            nv = sc.shift(out, (s, 0), 3.0)
            ni = sc.shift(ids, (s,), -1)
            out = jnp.where(
                sc._bcast(ni == ids, out), jnp.minimum(out, nv), out
            )
        return out

    for c in args.c:
        vals = jnp.asarray(
            rng.standard_normal((k, c)).astype(np.float32)
        )
        t_x_add = bench(jax.jit(xla_scan_add), vals)
        t_p_add = bench(
            lambda v: seg_scan_sorted(v, same, "add"), vals
        )
        t_x_min = bench(jax.jit(xla_scan_min), vals)
        t_p_min = bench(
            lambda v: seg_scan_sorted(v, same, "min"), vals
        )
        print(
            f"k={k} c={c:4d}: add xla {t_x_add:7.3f} ms  pallas "
            f"{t_p_add:7.3f} ms ({t_x_add / t_p_add:4.1f}x)   "
            f"min xla {t_x_min:7.3f} ms  pallas {t_p_min:7.3f} ms "
            f"({t_x_min / t_p_min:4.1f}x)"
        )


if __name__ == "__main__":
    main()
