"""Compile-time memory attribution for the coiling_504 step: lower the
one-step program under each viscosity preconditioner and print XLA's
memory analysis (generated_code/temp/argument/output sizes) without
executing — the axon backend exposes no runtime memory_stats, so this is
the only per-buffer visibility for the 8M-cell MG OOM.

  python benchmarks/visc_mg_memattr.py [--res 504] [--precond mg jacobi]
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--res", type=int, default=504)
    p.add_argument("--precond", nargs="+", default=["jacobi", "mg"])
    args = p.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )

    from python_fluid_simulation_tpu.engine import scenes
    from python_fluid_simulation_tpu.engine.step import _geom_jit, step_3d

    base = scenes.coiling_config(res=args.res)
    state = scenes.coiling_scene(base)
    geom = _geom_jit(state.solid, None)
    jax.block_until_ready(geom)

    for pk in args.precond:
        cfg = dataclasses.replace(
            base, solver=dataclasses.replace(
                base.solver, viscosity_precond=pk),
        )

        def one(s, g):
            out, m = step_3d(s, cfg, geom=g)
            return out, m

        lowered = jax.jit(one).lower(state, geom)
        compiled = lowered.compile()
        ma = compiled.memory_analysis()
        if ma is None:
            print(f"{pk}: memory_analysis unavailable")
            continue
        row = {
            "precond": pk,
            "temp_gb": round(ma.temp_size_in_bytes / 1e9, 3),
            "arg_gb": round(ma.argument_size_in_bytes / 1e9, 3),
            "out_gb": round(ma.output_size_in_bytes / 1e9, 3),
            "alias_gb": round(ma.alias_size_in_bytes / 1e9, 3),
            "code_mb": round(ma.generated_code_size_in_bytes / 1e6, 1),
        }
        total = (ma.temp_size_in_bytes + ma.argument_size_in_bytes
                 + ma.output_size_in_bytes - ma.alias_size_in_bytes)
        row["total_gb"] = round(total / 1e9, 3)
        print(row, flush=True)


if __name__ == "__main__":
    main()
