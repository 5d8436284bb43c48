"""BASELINE configs 3/5 on real hardware: 128^3-class buckling and the
256-vertical coiling scene, fully fused under lax.scan (geometry hoisted).

Writes artifacts/BENCH_BIG.json:
  {"buckling_128": {...}, "coiling_256": {...}}
with steps/s, ms/step and the per-solver CG iteration counts of the last
benched step — the numbers VERDICT round-1 item 5 asked to be recorded
(the reference cannot run these configs at all: single-GPU notebook,
0.61 steps/s at 48x80x48, SURVEY §6).

  python benchmarks/big_configs.py [--steps 10] [--out artifacts/BENCH_BIG.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_scene(cfg, state, steps, warmup=2):
    import jax

    from python_fluid_simulation_tpu.engine.step import (
        _geom_jit,
        _simulate_jit,
        simulate,
    )

    geom = None if cfg.moving_solid else _geom_jit(state.solid, None)
    jax.block_until_ready(geom)
    # measured bytes of the compiled program (XLA cost analysis) — the
    # honest roofline numerator (cached compile: same program the timed
    # run uses)
    from python_fluid_simulation_tpu.utils.roofline import (
        hlo_bytes_per_step,
    )

    import jax.numpy as jnp

    state = state._replace(visc_mg=jnp.asarray(state.visc_mg, jnp.int32))
    try:
        compiled = _simulate_jit.lower(
            state, None, geom, cfg, steps, None, None, False
        ).compile()
        measured_bytes = hlo_bytes_per_step(compiled, steps)
    except Exception:
        measured_bytes = None
    s_w, m_w = simulate(state, cfg, steps, geom=geom)
    jax.block_until_ready(s_w)
    # free the warmup outputs BEFORE the timed run: at 8M cells the
    # returned state (3 face fields + 2 dual lattices ~1 GB) kept live
    # alongside the second run's working set tips a 16 GB chip over
    del s_w, m_w
    t0 = time.perf_counter()
    s_f, metrics = simulate(state, cfg, steps, geom=geom)
    jax.block_until_ready(s_f)
    elapsed = time.perf_counter() - t0
    import numpy as np

    # single device->host transfer per series (a python int() loop over a
    # jax array forces one transfer per element — ADVICE r3)
    series = {k: np.asarray(v).astype(int).tolist()
              for k, v in metrics.items() if k.endswith("_iters")}
    last = {k: v[-1] for k, v in series.items()}
    # the roofline model scales CG traffic with iteration count; per-step
    # counts are volatile (ADVICE r3: 508 vs 70 on the same config), so
    # feed the MEAN of the benched series, not the last step
    mean_iters = {k: sum(v) / max(1, len(v)) for k, v in series.items()}
    from python_fluid_simulation_tpu.utils.roofline import roofline

    ms = elapsed / steps * 1000
    return {
        "grid": list(cfg.grid.res),
        "particles": int(state.particles.x.shape[0]),
        "steps": steps,
        "steps_per_s": round(steps / elapsed, 4),
        "ms_per_step": round(ms, 2),
        "precond": cfg.solver.precond,
        "viscosity_precond": cfg.solver.viscosity_precond,
        "pallas": cfg.solver.pallas,
        "cg_iters_last_step": last,
        "cg_iters_per_step": series,
        "cg_iters_mean": {k: round(v, 1) for k, v in mean_iters.items()},
        "roofline": roofline(
            cfg.grid.res, state.particles.x.shape[0], mean_iters, ms,
            jax.devices()[0].device_kind,
            measured_bytes_per_step=measured_bytes,
        ),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "BENCH_BIG.json"))
    p.add_argument("--only", default=None,
                   choices=[None, "buckling_128", "coiling_256",
                            "coiling_512", "coiling_504"])
    args = p.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from python_fluid_simulation_tpu.engine import scenes

    results = {}
    if args.only in (None, "buckling_128"):
        cfg = scenes.scaled_buckling_config(res=128)
        state = scenes.buckling_scene(cfg)
        results["buckling_128"] = bench_scene(cfg, state, args.steps)
        print("buckling_128:", json.dumps(results["buckling_128"]))
    if args.only in (None, "coiling_256"):
        cfg = scenes.coiling_config(res=256)
        state = scenes.coiling_scene(cfg)
        results["coiling_256"] = bench_scene(cfg, state, args.steps)
        print("coiling_256:", json.dumps(results["coiling_256"]))
    if args.only == "coiling_512":
        # BASELINE config 5 taken literally: "256^3+ ... sharded across a
        # TPU mesh".  128x512x128 = 8.4M cells (16x coiling_256) — the
        # VERDICT round-2 item-2 "true 256^3-class" run.  Dual lattice
        # 257x1025x257 (~271 MB/field fp32); per-device memory is
        # reported below from jax's live-buffer stats.
        cfg = scenes.coiling_config(res=512)
        state = scenes.coiling_scene(cfg)
        results["coiling_512"] = bench_scene(cfg, state, args.steps)
        try:
            stats = jax.devices()[0].memory_stats() or {}
            results["coiling_512"]["device_mem_gb"] = {
                k: round(v / 1e9, 2)
                for k, v in stats.items()
                if k in ("bytes_in_use", "peak_bytes_in_use",
                         "bytes_limit")
            }
        except Exception:
            pass
        print("coiling_512:", json.dumps(results["coiling_512"]))
    if args.only == "coiling_504":
        # The 256^3-class single-chip run (>= 8M cells).  504 vertical
        # cells instead of 512: on TPU the MINOR array dim pads to a
        # 128 multiple, so a 128x512x128 grid pays 2x padding on every
        # z-extended array (z-faces 129 -> 256, dual/ext 130 -> 256) —
        # 126x504x126 (8.0M cells) keeps every minor dim at <= 128 and
        # fits the 16 GB chip together with the channel-grouped
        # placement (ops/transfers.py `grouped`).
        cfg = scenes.coiling_config(res=504)
        state = scenes.coiling_scene(cfg)
        results["coiling_504"] = bench_scene(cfg, state, args.steps)
        try:
            stats = jax.devices()[0].memory_stats() or {}
            results["coiling_504"]["device_mem_gb"] = {
                k: round(v / 1e9, 2)
                for k, v in stats.items()
                if k in ("bytes_in_use", "peak_bytes_in_use",
                         "bytes_limit")
            }
        except Exception:
            pass
        print("coiling_504:", json.dumps(results["coiling_504"]))

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    existing = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            existing = json.load(f)
    existing.update(results)
    with open(args.out, "w") as f:
        json.dump(existing, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
