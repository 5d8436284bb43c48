"""End-to-end MG-vs-Jacobi cycle-shape scan at 128^3-class (VERDICT
round-2 item 9: make the V-cycle win, or document why not).

Times the FULL buckling_128 step (the decision metric) under a matrix of
cell-Poisson preconditioner variants:

  jacobi            — round-2 default (81 pressure iters, wins by ~8%)
  mg (None)         — solver defaults: V(2,2), min_dim=4, coarse 24
  mg (n,s,m,c) ...  — shallower/lighter cycles via SolverConfig.mg_opts

All variants now smooth level 0 with the blocked Pallas stencil matvec
(multigrid.make_mg_preconditioner(matvec0=...)) and skip the A@0 stencil
apply of each level's first relaxation.

  python benchmarks/mg_bench.py [--steps 5] [--res 128]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(cfg, state, steps):
    import jax

    from python_fluid_simulation_tpu.engine.step import _geom_jit, simulate

    geom = None if cfg.moving_solid else _geom_jit(state.solid, None)
    jax.block_until_ready(geom)
    s_w, _ = simulate(state, cfg, steps, geom=geom)
    jax.block_until_ready(s_w)
    t0 = time.perf_counter()
    s_f, metrics = simulate(state, cfg, steps, geom=geom)
    jax.block_until_ready(s_f)
    elapsed = time.perf_counter() - t0
    last = {k: int(v[-1]) for k, v in metrics.items() if k.endswith("_iters")}
    return elapsed / steps * 1000, last


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--res", type=int, default=128)
    p.add_argument("--out", default=None)
    p.add_argument(
        "--variants",
        default=None,
        help="comma-separated variant names to run (default: all)",
    )
    args = p.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from python_fluid_simulation_tpu.engine import scenes

    cfg0 = scenes.scaled_buckling_config(res=args.res)
    state = scenes.buckling_scene(cfg0)

    variants = [
        ("jacobi", dict(precond="jacobi")),
        ("mg_default", dict(precond="mg", mg_opts=None)),
        # (n_smooth, min_dim, coarse_iters)
        ("mg_1_4_24", dict(precond="mg", mg_opts=(1, 4, 24))),
        ("mg_2_16_24", dict(precond="mg", mg_opts=(2, 16, 24))),
        ("mg_1_16_24", dict(precond="mg", mg_opts=(1, 16, 24))),
        ("mg_1_32_40", dict(precond="mg", mg_opts=(1, 32, 40))),
        ("mg_2_32_40", dict(precond="mg", mg_opts=(2, 32, 40))),
    ]
    if args.variants:
        keep = set(args.variants.split(","))
        variants = [v for v in variants if v[0] in keep]
    results = {}
    for name, kw in variants:
        cfg = dataclasses.replace(
            cfg0, solver=dataclasses.replace(cfg0.solver, **kw)
        )
        ms, iters = bench(cfg, state, args.steps)
        results[name] = {"ms_per_step": round(ms, 2), "iters": iters}
        print(name, json.dumps(results[name]), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
