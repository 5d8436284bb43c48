"""Microprofile of the 128^3-class implicit solves: where does a PCG
iteration's time go (matvec vs MG V-cycle vs loop overhead)?

  python benchmarks/mg_profile.py [--res 128]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(f, args, label, iters=10):
    import jax

    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{label}: {dt:.2f} ms")
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--res", type=int, default=128)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )

    from python_fluid_simulation_tpu.engine import scenes
    from python_fluid_simulation_tpu.engine.step import _levelsets
    from python_fluid_simulation_tpu.ops.fractions import (
        compute_solid_frac_3d,
    )
    from python_fluid_simulation_tpu.ops.indexing import split_parity
    from python_fluid_simulation_tpu.solvers.multigrid import (
        make_mg_preconditioner,
    )
    from python_fluid_simulation_tpu.solvers.pressure import (
        pressure_coefficients,
        pressure_rhs_3d,
        solve_cell_poisson,
    )
    from python_fluid_simulation_tpu.solvers.viscosity import (
        make_viscosity_mg_preconditioner,
        prepare_viscosity_matvec,
        viscosity_rhs_3d,
        viscosity_solve_3d,
        viscosity_term_fields,
    )

    cfg = scenes.scaled_buckling_config(res=args.res)
    state = scenes.buckling_scene(cfg)
    g = cfg.grid
    print("grid", g.res, file=sys.stderr)

    sphi_c = split_parity(state.solid.phi, 3)
    w = compute_solid_frac_3d(sphi_c)
    lphi, lvol = _levelsets(state.particles.x, cfg, state.particles.m)
    lphi, lvol = jax.block_until_ready((lphi, lvol))

    shapes = [
        tuple(n + (1 if i == a else 0) for i, n in enumerate(g.res))
        for a in range(3)
    ]
    rng = np.random.default_rng(0)
    v = tuple(
        jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)
        for s in shapes
    )

    # ---- pressure pieces
    diag, coefs, pd = pressure_coefficients(w, lphi)
    jax.block_until_ready(diag)
    mg = make_mg_preconditioner(diag, coefs)
    r = jnp.asarray(rng.standard_normal(g.res).astype(np.float32))
    timeit(jax.jit(mg), (r,), "pressure MG V-cycle (1 application)")

    sv = jnp.zeros(tuple(2 * k + 1 for k in g.res) + (3,), jnp.float32)
    b = jax.jit(
        lambda v_, l_, w_: pressure_rhs_3d(v_, sv, l_, w_, g.cell_size)
    )(v, lphi, w)
    jax.block_until_ready(b)

    for kind in ("jacobi", "mg"):
        f = jax.jit(
            lambda b_, w_, l_, k=kind: solve_cell_poisson(
                b_, w_, l_, tol=cfg.solver.tol, rel_tol=cfg.solver.rel_tol,
                max_iter=cfg.solver.max_iter, precond_kind=k,
            )
        )
        x, st = timeit(f, (b, w, lphi), f"pressure solve [{kind}]", iters=5)
        print(f"  iters={int(st.iters)} converged={bool(st.converged)}")

    # ---- viscosity pieces
    s_mu = float(cfg.physics.dt / g.cell_vol / cfg.physics.rho) * cfg.physics.mu
    vol_c = split_parity(lvol / (g.cell_vol * 0.125), 3)
    fields = viscosity_term_fields(s_mu, sphi_c, vol_c, shapes)
    jax.block_until_ready(fields[0])
    diags, per_axis, pdiags = fields

    vmg = make_viscosity_mg_preconditioner(diags, per_axis)
    rs = v
    timeit(jax.jit(vmg), (rs,), "viscosity MG precond (3 V-cycles)")

    mv, _ = prepare_viscosity_matvec(s_mu, sphi_c, vol_c, shapes,
                                     fields=fields)
    timeit(jax.jit(lambda q: mv(q)), (v,), "coupled matvec")

    for kind in ("jacobi", "mg"):
        f = jax.jit(
            lambda gv, sp, lv, k=kind: viscosity_solve_3d(
                cfg.physics.dt, cfg.physics.mu, cfg.physics.rho,
                gv, sp, lv, g.cell_vol,
                tol=cfg.solver.tol, rel_tol=cfg.solver.rel_tol,
                max_iter=cfg.solver.max_iter, precond_kind=k,
            )
        )
        res = timeit(
            f, (v, sphi_c, lvol), f"viscosity solve [{kind}]", iters=5
        )
        print(
            f"  iters={int(res.stats.iters)} "
            f"converged={bool(res.stats.converged)}"
        )


if __name__ == "__main__":
    main()
