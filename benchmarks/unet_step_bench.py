"""Warm per-step timing of the 'unet' viscosity mode (full engine step
including UNet inference), separating compile from execute.

  python benchmarks/unet_step_bench.py [--steps 20] [--bf16]
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--bf16", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

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
    from python_fluid_simulation_tpu.models.features import padded_box
    from python_fluid_simulation_tpu.models.unet3d import UNet3D

    cfg = scenes.buckling_config()
    cfg = dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver, viscosity_mode="unet")
    )
    state = scenes.buckling_scene(cfg)
    model = UNet3D(dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    data, _ = padded_box(cfg.grid.dual_res)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *data, 11)))

    t0 = time.perf_counter()
    s1, _ = simulate(state, cfg, args.steps, model.apply, params)
    jax.block_until_ready(s1)
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    s2, _ = simulate(state, cfg, args.steps, model.apply, params)
    jax.block_until_ready(s2)
    warm = time.perf_counter() - t0
    print(
        f"unet step ({'bf16' if args.bf16 else 'fp32'}): "
        f"{warm / args.steps * 1000:.1f} ms/step warm "
        f"({args.steps} steps; first call incl. compile {cold:.1f} s)"
    )


if __name__ == "__main__":
    main()
