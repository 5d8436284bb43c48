"""A/B the coiling_256 viscosity preconditioner modes end-to-end
(regression check for the 'auto' hysteresis path: a per-iteration
lax.cond made the Jacobi regime pay the full MG hierarchy build every
step — 209 -> 1177 ms/step — fixed by lifting the cond to the whole
solve).

  python benchmarks/coiling_ab.py [--steps 10] [--modes jacobi,auto,mg]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--res", type=int, default=256)
    p.add_argument("--modes", default="jacobi,auto")
    p.add_argument("--out", default=None)
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
    from python_fluid_simulation_tpu.engine.step import simulate

    cfg0 = scenes.coiling_config(res=args.res)
    state = scenes.coiling_scene(cfg0)
    results = {}
    for mode in args.modes.split(","):
        cfg = dataclasses.replace(
            cfg0,
            solver=dataclasses.replace(
                cfg0.solver, viscosity_precond=mode
            ),
        )
        from python_fluid_simulation_tpu.engine.step import _geom_jit

        geom = None if cfg.moving_solid else _geom_jit(state.solid, None)
        jax.block_until_ready(geom)
        s_w, _ = simulate(state, cfg, args.steps, geom=geom)
        jax.block_until_ready(s_w)
        t0 = time.perf_counter()
        s_f, metrics = simulate(state, cfg, args.steps, geom=geom)
        jax.block_until_ready(s_f)
        ms = (time.perf_counter() - t0) / args.steps * 1000
        iters = {
            k: int(v[-1]) for k, v in metrics.items()
            if k.endswith("_iters")
        }
        results[mode] = {"ms_per_step": round(ms, 2), "iters": iters}
        print(mode, json.dumps(results[mode]), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
