"""Capture an xplane trace + HLO of ONE MG-preconditioned pressure solve
at 128^3-class, for per-line attribution of the V-cycle cost.

  python benchmarks/mg_solve_profile.py --trace /tmp/prof_mg --hlo /tmp/hlo_mg.txt
  python benchmarks/parse_xplane.py /tmp/prof_mg --hlo /tmp/hlo_mg.txt
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--res", type=int, default=128)
    p.add_argument("--trace", default="/tmp/prof_mg")
    p.add_argument("--hlo", default="/tmp/hlo_mg.txt")
    p.add_argument("--precond", default="mg")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )

    from python_fluid_simulation_tpu.solvers.pressure import (
        pressure_coefficients, solve_cell_poisson,
    )

    n = (args.res * 77 // 128, args.res, args.res * 77 // 128)
    rng = np.random.default_rng(0)
    lphi = jnp.asarray(rng.standard_normal(n).astype(np.float32)) - 0.5
    w = [
        jnp.asarray(
            rng.uniform(
                0.2, 1.0,
                tuple(k + (1 if i == a else 0) for i, k in enumerate(n)),
            ).astype(np.float32)
        )
        for a in range(3)
    ]
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    f = jax.jit(
        lambda b_, w_, l_: solve_cell_poisson(
            b_, w_, l_, tol=1e-6, rel_tol=1e-4, max_iter=600,
            precond_kind=args.precond,
        )
    )
    lowered = f.lower(b, w, lphi)
    compiled = lowered.compile()
    with open(args.hlo, "w") as fh:
        fh.write(compiled.as_text())
    print("wrote HLO ->", args.hlo)

    x, st = compiled(b, w, lphi)
    jax.block_until_ready(x)
    print("iters", int(st.iters), "converged", bool(st.converged))

    import time

    t0 = time.perf_counter()
    x, st = compiled(b, w, lphi)
    jax.block_until_ready(x)
    print("solve ms:", (time.perf_counter() - t0) * 1000)

    with jax.profiler.trace(args.trace):
        x, st = compiled(b, w, lphi)
        jax.block_until_ready(x)
    print("trace ->", args.trace)


if __name__ == "__main__":
    main()
