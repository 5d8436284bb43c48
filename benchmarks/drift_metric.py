"""Long-horizon surface-evolution drift vs the f64 CPU reference.

VERDICT r3 item 6: the fp32 "identical surface evolution" claim was
backed by a 20-step sign-exact check only; this measures ACCUMULATION —
a >= 100-step run at 32^3 with the fluid level set compared every 10
steps (IoU of the {phi < 0} masks, near-surface phi deviation, particle
cloud deviation) against benchmarks/cpu_reference.py (f64 NumPy solver
math, the same algorithm).

  python benchmarks/drift_metric.py [--steps 100] [--every 10] \
      [--out artifacts/drift_32.json]

The committed artifact is the metric curve; tests/test_cpu_reference.py
asserts the bound on a smaller grid in CI.
"""

import argparse
import json
import os
import sys

try:
    _HERE = os.path.dirname(os.path.abspath(__file__))
except NameError:  # exec'd without __file__
    _HERE = os.path.join(os.getcwd(), "benchmarks")
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)


def drift_curve(cfg, n_steps, every, engine_steps=None):
    """Run engine (fp32) and NumPy reference (f64) side by side; return
    the per-checkpoint drift records."""
    import jax
    import numpy as np

    from cpu_reference import (
        fluid_levelset,
        state_from_engine,
        step as np_step,
    )
    from python_fluid_simulation_tpu.engine import scenes
    from python_fluid_simulation_tpu.engine.step import _geom_jit, simulate
    from python_fluid_simulation_tpu.ops.levelset import (
        compute_fluid_levelset,
    )

    st = (engine_steps or scenes.dam_break_scene)(cfg)
    g = cfg.grid
    geom = _geom_jit(st.solid, None)
    state_np = state_from_engine(cfg, st)
    state_e = st
    records = []
    for ck in range(n_steps // every):
        state_e, _ = simulate(state_e, cfg, every, geom=geom)
        jax.block_until_ready(state_e)
        for _ in range(every):
            state_np, _ = np_step(state_np, cfg)
        step = (ck + 1) * every
        ex = np.asarray(state_e.particles.x, np.float64)
        nx = state_np["x"]
        dev = np.linalg.norm(ex - nx, axis=-1)
        phi_e = np.asarray(
            compute_fluid_levelset(
                state_e.particles.x, g.res, g.bound_min, g.cell_size,
                g.dx, pm=state_e.particles.m,
            ),
            np.float64,
        )
        phi_n = fluid_levelset(
            nx, g.res, g.bound_min, np.asarray(g.cell_size), g.dx,
            mass=state_np["m"],
        )
        in_e = phi_e < 0
        in_n = phi_n < 0
        inter = np.count_nonzero(in_e & in_n)
        union = np.count_nonzero(in_e | in_n)
        iou = inter / max(1, union)
        near = np.abs(phi_n) < g.dx  # cells near the reference surface
        surf_dev = (
            float(np.abs(phi_e - phi_n)[near].max()) if near.any() else 0.0
        )
        records.append(
            {
                "step": step,
                "iou": round(iou, 6),
                "sign_mismatch_cells": int(union - inter),
                "fluid_cells": int(np.count_nonzero(in_n)),
                "surface_phi_dev_max": round(surf_dev, 8),
                "surface_phi_dev_over_dx": round(surf_dev / g.dx, 6),
                "particle_dev_max": round(float(dev.max()), 8),
                "particle_dev_max_over_dx": round(
                    float(dev.max()) / g.dx, 6
                ),
                "particle_dev_mean": round(float(dev.mean()), 9),
            }
        )
        print(json.dumps(records[-1]), flush=True)
    return records


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--every", type=int, default=10)
    p.add_argument("--dx", type=float, default=1.0 / 32)
    p.add_argument("--mu", type=float, default=0.5)
    p.add_argument(
        "--scene", default="dam_break",
        choices=["dam_break", "buckling"],
        help="buckling = the FLAGSHIP 48x80x48 funnel scene (cell-10 "
        "parity); gives the banked buckling_full run its surface-IoU "
        "series vs the f64 comparator (VERDICT r4 #8)",
    )
    p.add_argument(
        "--cpu", action="store_true",
        help="force the CPU backend for the engine side (leaves the "
        "real TPU free, e.g. while a training run owns it)",
    )
    p.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(_HERE), "artifacts", "drift_32.json"
        ),
    )
    args = p.parse_args()
    if args.cpu:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(_HERE), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from python_fluid_simulation_tpu.config import (
        GridConfig3D,
        PhysicsConfig,
        SimConfig,
        SolverConfig,
    )

    cfg = SimConfig(
        grid=GridConfig3D(
            bound_min=(0.0, 0.0, 0.0),
            bound_size=(1.0, 1.0, 1.0),
            dx=args.dx,
        ),
        physics=PhysicsConfig(rho=1000.0, mu=args.mu, dt=1.0 / 300.0),
        solver=SolverConfig(max_iter=600),
        particle_dx=args.dx / 2,
        dt_mode="cfl",
    )
    engine_steps = None
    if args.scene == "buckling":
        from python_fluid_simulation_tpu.engine import scenes

        cfg = scenes.buckling_config(dx=0.0125, mu=args.mu)
        engine_steps = scenes.buckling_scene
    records = drift_curve(
        cfg, args.steps, args.every, engine_steps=engine_steps
    )
    out = {
        "scene": args.scene,
        "grid": list(cfg.grid.res),
        "dx": cfg.grid.dx,
        "mu": args.mu,
        "dt": 1.0 / 300.0,
        "steps": args.steps,
        "comparator": "benchmarks/cpu_reference.py (f64 NumPy)",
        "records": records,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
