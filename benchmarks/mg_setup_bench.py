"""Split the MG-preconditioned solve into setup (hierarchy build) vs
iteration cost: time solves at max_iter=1 vs max_iter=25 on the real
buckling-128 pressure system.

  python benchmarks/mg_setup_bench.py [--res 128]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--res", type=int, default=128)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )

    from python_fluid_simulation_tpu.solvers.multigrid import (
        build_hierarchy,
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

    def timed(f, xargs, label, iters=10):
        out = jax.block_until_ready(f(*xargs))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*xargs)
        jax.block_until_ready(out)
        print(
            f"{label}: {(time.perf_counter() - t0) / iters * 1000:.2f} ms",
            flush=True,
        )
        return out

    # hierarchy build alone
    diag, coefs, _ = pressure_coefficients(w, lphi)
    diag = jax.block_until_ready(diag)

    def build(d_, cs_):
        levels = build_hierarchy(d_, cs_)
        return [lv.diag for lv in levels]

    timed(jax.jit(lambda d_, *cs: build(
        d_, [(off, c) for (off, _), c in zip(coefs, cs)]
    )), (diag, *[c for _, c in coefs]), "hierarchy build (Galerkin)")

    for mi in (1, 25):
        f = jax.jit(
            lambda b_, w_, l_, m=mi: solve_cell_poisson(
                b_, w_, l_, tol=1e-30, rel_tol=1e-30, max_iter=m,
                precond_kind="mg",
            )
        )
        timed(f, (b, w, lphi), f"mg solve max_iter={mi}")

    for mi in (1, 25):
        f = jax.jit(
            lambda b_, w_, l_, m=mi: solve_cell_poisson(
                b_, w_, l_, tol=1e-30, rel_tol=1e-30, max_iter=m,
                precond_kind="jacobi",
            )
        )
        timed(f, (b, w, lphi), f"jacobi solve max_iter={mi}")


if __name__ == "__main__":
    main()
