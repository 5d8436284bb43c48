"""Benchmark: sim steps/sec on the reference's buckling scene.

Baseline (BASELINE.md): the reference's only recorded run — 48x80x48
buckling, 'unet' viscosity mode — at ~1.64 s/step => 0.61 steps/s on an
RTX-3090-class GPU.  We run the SAME scene in 'apic' mode (classic CG
viscosity — strictly MORE work per step than the baseline's UNet path)
fully jitted under lax.scan, and report steps/s.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "steps/s", "vs_baseline": N}

Env knobs: BENCH_STEPS (default 20), BENCH_DX (default 0.0125),
BENCH_WARMUP (default 3).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_STEPS_PER_S = 0.61  # BASELINE.md end-to-end 1.64 s/step


def main():
    import jax

    # persistent compile cache: the step graph is large and the axon
    # remote-compile path is slow; cache across bench invocations
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from python_fluid_simulation_tpu.engine.scenes import (
        buckling_config,
        buckling_scene,
    )
    from python_fluid_simulation_tpu.engine.step import simulate

    steps = int(os.environ.get("BENCH_STEPS", "20"))
    dx = float(os.environ.get("BENCH_DX", "0.0125"))

    cfg = buckling_config(dx=dx, mu=1.0, viscosity_mode="apic")
    mi = os.environ.get("BENCH_MAX_ITER")
    if mi:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, solver=dataclasses.replace(cfg.solver, max_iter=int(mi))
        )
    state = buckling_scene(cfg)
    n_particles = int(state.particles.x.shape[0])

    # static geometry once for both calls (run.py does the same per run)
    from python_fluid_simulation_tpu.engine.step import _geom_jit

    geom = _geom_jit(state.solid, None)
    jax.block_until_ready(geom)

    # warm up with the SAME scan length so the timed call hits the
    # compile cache (scan length is a static shape parameter)
    s_w, _ = simulate(state, cfg, steps, geom=geom)
    jax.block_until_ready(s_w)

    t0 = time.perf_counter()
    s_f, metrics = simulate(state, cfg, steps, geom=geom)
    jax.block_until_ready(s_f)
    elapsed = time.perf_counter() - t0

    steps_per_s = steps / elapsed
    import numpy as np

    iters_series = {
        k: np.asarray(v).astype(int).tolist()
        for k, v in metrics.items() if k.endswith("_iters")
    }
    mean_iters = {
        k: sum(v) / max(1, len(v)) for k, v in iters_series.items()
    }
    from python_fluid_simulation_tpu.utils.roofline import (
        hlo_bytes_per_step,
        roofline,
    )

    measured_bytes = None
    try:
        from python_fluid_simulation_tpu.engine.step import _simulate_jit

        import jax.numpy as jnp

        st = state._replace(visc_mg=jnp.asarray(state.visc_mg, jnp.int32))
        compiled = _simulate_jit.lower(
            st, None, geom, cfg, steps, None, None, False
        ).compile()
        measured_bytes = hlo_bytes_per_step(compiled, steps)
    except Exception:
        pass
    roof = roofline(
        cfg.grid.res, n_particles, mean_iters,
        elapsed / steps * 1000, jax.devices()[0].device_kind,
        measured_bytes_per_step=measured_bytes,
    )
    out = {
        "metric": (
            f"sim steps/s, 3D buckling {cfg.grid.res[0]}x{cfg.grid.res[1]}"
            f"x{cfg.grid.res[2]} grid, {n_particles} particles, apic "
            f"viscosity CG (reference: 0.61 steps/s unet mode, RTX3090)"
        ),
        "value": round(steps_per_s, 4),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / BASELINE_STEPS_PER_S, 2),
        "hbm_util": roof.get("hbm_util"),
        "achieved_gbps": roof.get("achieved_gbps"),
    }

    # BASELINE north star: ">= 100x faster per step than the CPU
    # reference" — the comparator is benchmarks/cpu_reference.py (the
    # vectorized-NumPy embodiment of the reference algorithm, f64 solver
    # math; "identical surface evolution" is backed by
    # tests/test_cpu_reference.py's 20-step sign-exact level-set check).
    here0 = os.path.dirname(os.path.abspath(__file__))
    cpu48 = os.path.join(here0, "artifacts", "CPU_REF_48.json")
    if os.path.exists(cpu48):
        with open(cpu48) as f:
            rec = json.load(f)
        cpu_sps = rec["s_per_step"]
        out["cpu_reference_s_per_step"] = cpu_sps
        out["vs_cpu_reference"] = round(cpu_sps * steps_per_s, 1)

    # Attach the recorded big-config runs (BASELINE configs 3/5, measured
    # on this repo's TPU by benchmarks/big_configs.py) and per-phase
    # attributions (benchmarks/phase_bench.py) so the single bench line
    # carries the full picture.
    here = os.path.dirname(os.path.abspath(__file__))
    big = os.path.join(here, "artifacts", "BENCH_BIG.json")
    if os.path.exists(big):
        with open(big) as f:
            recorded = json.load(f)
        out["recorded_big_configs"] = {
            k: {
                "grid": v.get("grid"),
                "steps_per_s": v.get("steps_per_s"),
                "ms_per_step": v.get("ms_per_step"),
                "cg_iters_last_step": v.get("cg_iters_last_step"),
                "hbm_util": (v.get("roofline") or {}).get("hbm_util"),
            }
            for k, v in recorded.items()
        }
        cpu128 = os.path.join(here, "artifacts", "CPU_REF_128.json")
        if os.path.exists(cpu128) and "buckling_128" in recorded:
            with open(cpu128) as f:
                c = json.load(f)
            out["recorded_big_configs"]["buckling_128"][
                "vs_cpu_reference"
            ] = round(
                c["s_per_step"] * 1000.0
                / recorded["buckling_128"]["ms_per_step"],
                1,
            )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
