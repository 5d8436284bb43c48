"""Memory probe: coiling_504 with viscosity_precond='mg' on the real chip.

Round-3 follow-up to `Fused blocked Poisson PCG` commit: the auto-mode
hysteresis flip to MG at step ~6 of coiling_504 exceeded HBM.  This runs
the MG branch directly for a couple of steps and prints live/peak byte
stats (or the OOM allocation report) so the diet can be targeted.

  python benchmarks/visc_mg_probe.py [--steps 2] [--res 504]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def mem(tag):
    import jax

    try:
        s = jax.devices()[0].memory_stats() or {}
        print(
            f"[mem] {tag}: in_use={s.get('bytes_in_use', 0) / 1e9:.2f} GB "
            f"peak={s.get('peak_bytes_in_use', 0) / 1e9:.2f} GB "
            f"limit={s.get('bytes_limit', 0) / 1e9:.2f} GB",
            flush=True,
        )
    except Exception as e:  # pragma: no cover - probe only
        print(f"[mem] {tag}: unavailable ({e})", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2)
    p.add_argument("--res", type=int, default=504)
    p.add_argument("--precond", default="mg")
    args = p.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from python_fluid_simulation_tpu.engine import scenes
    from python_fluid_simulation_tpu.engine.step import _geom_jit, simulate

    cfg = scenes.coiling_config(res=args.res)
    cfg = dataclasses.replace(
        cfg, solver=dataclasses.replace(
            cfg.solver, viscosity_precond=args.precond),
    )
    state = scenes.coiling_scene(cfg)
    mem("after scene build")
    geom = _geom_jit(state.solid, None)
    jax.block_until_ready(geom)
    mem("after geom cache")

    t0 = time.perf_counter()
    s, m = simulate(state, cfg, args.steps, geom=geom)
    jax.block_until_ready(s)
    dt = time.perf_counter() - t0
    mem("after run (incl. compile)")
    last = {k: int(v[-1]) for k, v in m.items() if k.endswith("_iters")}
    print(json.dumps({
        "res": args.res,
        "precond": args.precond,
        "steps": args.steps,
        "s_total_incl_compile": round(dt, 2),
        "cg_iters_last": last,
    }))


if __name__ == "__main__":
    main()
