"""Capture an xplane trace + optimized HLO of the fused engine step.

Produces the inputs for parse_xplane.py at the CURRENT source state, so
per-line attribution matches today's line numbers (stale profiles from
earlier commits attribute to shifted lines).

  python benchmarks/capture_profile.py --res 128 --steps 5 \
      --trace /tmp/prof_128 --hlo /tmp/hlo_128.txt
  python benchmarks/parse_xplane.py /tmp/prof_128 --hlo /tmp/hlo_128.txt --steps 5
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--res", type=int, default=128)
    p.add_argument("--scene", default="buckling",
                   choices=["buckling", "coiling"])
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--trace", default="/tmp/prof_step")
    p.add_argument("--hlo", default="/tmp/hlo_step.txt")
    args = p.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from python_fluid_simulation_tpu.engine import scenes
    from python_fluid_simulation_tpu.engine.step import _simulate_jit

    if args.scene == "buckling":
        cfg = scenes.scaled_buckling_config(res=args.res)
        state = scenes.buckling_scene(cfg)
    else:
        cfg = scenes.coiling_config(res=args.res)
        state = scenes.coiling_scene(cfg)

    import jax.numpy as jnp

    from python_fluid_simulation_tpu.engine.step import _geom_jit

    state = state._replace(visc_mg=jnp.asarray(state.visc_mg, jnp.int32))
    geom = None if cfg.moving_solid else _geom_jit(state.solid, None)
    statics = (cfg, args.steps, None, None, False)
    lowered = _simulate_jit.lower(state, None, geom, *statics)
    compiled = lowered.compile()
    with open(args.hlo, "w") as f:
        f.write(compiled.as_text())
    print(f"wrote HLO -> {args.hlo}")

    out, _ = compiled(state, None, geom)
    jax.block_until_ready(out)  # warm
    with jax.profiler.trace(args.trace):
        out, _ = compiled(state, None, geom)
        jax.block_until_ready(out)
    print(f"wrote trace -> {args.trace}")


if __name__ == "__main__":
    main()
