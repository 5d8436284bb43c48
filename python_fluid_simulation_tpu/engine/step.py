"""The time-step orchestrator: one pure ``step(state) -> (state, metrics)``.

TPU-native replacement for notebook cell 13 (:4552-4693).  The whole step
— advection, SDF projection, level set, density projection, APIC P2G,
gravity, implicit viscosity, pressure projection, extrapolation, boundary
conditions, G2P — traces into ONE XLA computation; ``simulate`` rolls it
under ``jax.lax.scan``.  The reference launches ~80 kernels per step and
syncs the host twice per CG iteration (SURVEY §3.1); here there is zero
host traffic inside a step.

Step order follows cell 13 exactly:
  dt (CFL in 'apic' mode :4572-4576) → advect + SDF project (:4582-4584)
  → levelset+volume → density solve (:4587-4590) → levelset+volume again
  (:4593-4594) → P2G (:4597) → gravity (:4608) → viscosity (:4623/:4634)
  → pressure (:4648, reusing the density solve's solid fractions)
  → extrapolate 2 iters (:4652) → boundary condition (:4655) → G2P (:4660).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from python_fluid_simulation_tpu.config import SimConfig
from python_fluid_simulation_tpu.ops import sdf as sdf3d
from python_fluid_simulation_tpu.ops.boundary import apply_boundary_condition
from python_fluid_simulation_tpu.ops.extrapolate import extrapolate
from python_fluid_simulation_tpu.ops.fractions import compute_solid_frac_3d
from python_fluid_simulation_tpu.ops.levelset import (
    compute_fluid_levelset,
    compute_fluid_volume_classes,
)
from python_fluid_simulation_tpu.ops.transfers import g2p_all, p2g_all
from python_fluid_simulation_tpu.solvers.density import density_solve_3d
from python_fluid_simulation_tpu.solvers.pressure import pressure_solve_3d
from python_fluid_simulation_tpu.solvers.viscosity import viscosity_solve_3d
from python_fluid_simulation_tpu.state import Particles, SimState

_FACE_BIAS = ((0.0, 0.5, 0.5), (0.5, 0.0, 0.5), (0.5, 0.5, 0.0))


def _levelsets(px, cfg: SimConfig, pm=None, need_volume: bool = True):
    g = cfg.grid
    lphi = compute_fluid_levelset(
        px, g.res, g.bound_min, g.cell_size, g.dx, pm=pm
    )
    if not need_volume:
        return lphi, None
    pvol = cfg.particle_dx ** 3
    # parity-class form: the viscosity solver and UNet features accept
    # the dict, and the (2N+1)^3 array's ::2 views (7 gather ops,
    # ~9 ms each at 128^3) never happen
    lvol = compute_fluid_volume_classes(
        px, pvol, g.res, g.bound_min, g.dual_cell_size, pm=pm
    )
    return lphi, lvol


class GeomCache(NamedTuple):
    """Static solid geometry derived from the solid level set: the 2^3
    parity-class views of sphi/sv and the cut-cell face weights.

    The reference evaluates the solid SDF once at scene build (cell 10
    :791) and re-derives fractions per solve; at 128^3-class grids the
    parity splits + fraction build cost ~350 ms/step (measured,
    benchmarks/phase_bench.py) on data that never changes while the
    rigid bodies are static.  ``simulate`` computes this once per scan;
    rebuild it (or pass geom=None) whenever bodies move and the solid
    level set is re-evaluated.
    """

    sphi_c: dict
    sv_c: Tuple
    w_faces: Tuple


def build_geom_cache(solid, mesh=None) -> "GeomCache":
    from python_fluid_simulation_tpu.ops.indexing import split_parity

    if mesh is not None:
        from jax.sharding import NamedSharding

        from python_fluid_simulation_tpu.parallel.mesh import grid_pspec

        def gshard(x):
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, grid_pspec(mesh, x.ndim))
            )
    else:

        def gshard(x):
            return x

    sphi_c = {k: gshard(v) for k, v in split_parity(solid.phi, 3).items()}
    sv_c = tuple(
        {k: gshard(v) for k, v in split_parity(solid.v[..., c], 3).items()}
        for c in range(3)
    )
    w_faces = tuple(
        gshard(w) for w in compute_solid_frac_3d(sphi_c)
    )
    return GeomCache(sphi_c=sphi_c, sv_c=sv_c, w_faces=w_faces)


def step_3d(
    state: SimState, cfg: SimConfig, unet_apply=None, unet_params=None,
    capture_ml: bool = False, mesh=None, geom: "GeomCache" = None,
    bucketed: bool = False,
) -> Tuple[SimState, Dict[str, jnp.ndarray]]:
    """One step.  With ``capture_ml`` the metrics include the learned-
    viscosity training pair captured around the CG solve — the engine-side
    equivalent of the reference's apic-mode ``ml_data`` dump (cell 13
    :4611-4630); use with python-loop stepping, not scan (the feature
    boxes are large).

    With a ``mesh`` (jax.sharding.Mesh, 1 axis) the step runs spatially
    decomposed: every grid field is slab-sharded along x via GSPMD
    sharding constraints, and the three implicit solves run as explicit
    shard_map PCG with ppermute halo exchanges + psum reductions
    (SURVEY §2.4 — the reference is single-GPU, notebook cell 1 :80-82).
    """
    g = cfg.grid
    ph = cfg.physics
    sol = cfg.solver
    p = state.particles
    sphi, sv = state.solid.phi, state.solid.v

    if mesh is not None:
        from jax.sharding import NamedSharding

        from python_fluid_simulation_tpu.parallel.mesh import grid_pspec

        def gshard(x):
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, grid_pspec(mesh, x.ndim))
            )
    else:

        def gshard(x):
            return x

    # -- dt selection (cell 13 :4572-4576)
    if cfg.dt_mode == "cfl":
        vmax = jnp.max(jnp.sqrt(jnp.sum(p.v**2, axis=-1)))
        cfl_dt = g.dx / jnp.maximum(1e-10, vmax)
        dt = jnp.minimum(
            jnp.float32(ph.dt),
            jnp.minimum(cfl_dt, jnp.maximum(cfg.duration - state.t, 1e-6)),
        )
    else:
        dt = jnp.float32(ph.dt)

    # -- moving bodies (SimConfig.moving_solid): advance each body's
    #    translation by its velocity row and re-evaluate the solid level
    #    set + geometry for THIS step (the reference's transform_rb/
    #    set_vel_rb host API, sdf3D.py:329-336, run inside the jit)
    solid = state.solid
    if cfg.moving_solid:
        from python_fluid_simulation_tpu.ops.indexing import (
            grid_positions,
        )
        from python_fluid_simulation_tpu.state import SolidState

        rb = sdf3d.advance_rigid_bodies(solid.rb, dt)
        dual_pos = grid_positions(
            g.dual_res, g.bound_min, g.dual_cell_size, (0.0,) * 3
        )
        s_phi, s_vel = sdf3d.evaluate(rb, dual_pos)
        solid = SolidState(phi=s_phi, v=s_vel, rb=rb)
        geom = None
        sphi, sv = s_phi, s_vel

    # static solid geometry: parity-class splits of the dual lattices +
    # cut-cell face weights.  Strided (::2) slices of the 49M-site dual
    # lattice relayout on TPU and were re-done by every consumer
    # (boundary, viscosity, fractions, pressure RHS/apply, fix_volume);
    # with a GeomCache (simulate builds one per scan) the whole block is
    # hoisted out of the step entirely (~350 ms/step at 128^3).  With
    # moving_solid it is necessarily rebuilt per step.
    if geom is None:
        geom = build_geom_cache(solid, mesh)
    sphi_c = geom.sphi_c
    sv_c = geom.sv_c

    # -- advect + project out of solids (:4582-4584)
    px = p.x + p.v * dt
    px = sdf3d.project(solid.rb, px)

    # -- spatially-bucketed particle residency (SURVEY §2.4(b)): after
    #    every particle move, a bounded ±1-slab exchange restores the
    #    slab-major layout so all transfers below stay shard-local
    bspec = None
    bucket_lost = jnp.int32(0)
    if bucketed:
        assert mesh is not None, "bucketed mode needs a mesh"
        if len(mesh.axis_names) == 2:
            # 2D (x,z) slab-x-slab residency (parallel/particles2d.py)
            from python_fluid_simulation_tpu.parallel.particles2d import (
                rebucket_2d as rebucket,
                sharded_fluid_levelset_2d as sharded_fluid_levelset,
                sharded_g2p_all_2d as sharded_g2p_all,
                sharded_p2g_all_2d as sharded_p2g_all,
                spec_from_state_2d,
            )

            bspec = spec_from_state_2d(
                p.x.shape[0], mesh, g.res[0], g.res[2]
            )
        else:
            from python_fluid_simulation_tpu.parallel.particles import (
                rebucket,
                sharded_fluid_levelset,
                sharded_g2p_all,
                sharded_p2g_all,
                spec_from_state,
            )

            bspec = spec_from_state(
                p.x.shape[0], mesh.devices.size, g.res[0]
            )
        p2, l1 = rebucket(
            Particles(x=px, v=p.v, c=p.c, m=p.m), mesh, bspec,
            g.bound_min, g.cell_size,
        )
        p = p2
        px = p.x
        bucket_lost = bucket_lost + l1

    def _lphi_of(px_):
        if bspec is not None:
            return sharded_fluid_levelset(
                px_, p.m, mesh, bspec, g.res, g.bound_min,
                g.cell_size, g.dx,
            )
        out, _ = _levelsets(px_, cfg, p.m, need_volume=False)
        return gshard(out)

    # -- solid fractions (computed once; density computes them and the
    #    pressure solve reuses them, cell 13 :4648 / solve :314)
    w_faces = geom.w_faces

    # -- density/position projection (:4587-4590); the fluid-volume
    #    field is NOT needed before the density solve (3D rebuilds cell
    #    volumes from its own particle scatter) — skip its scatter here.
    #    Non-bucketed: ONE bias-0 cell sort serves this level set, the
    #    density mass/volume scatter, and the displacement gather
    sort1 = None
    if bspec is None:
        from python_fluid_simulation_tpu.ops.transfers import (
            make_sort_info,
        )

        sort1 = make_sort_info(px, p.m, g.res, g.bound_min, g.cell_size)
        lphi = gshard(
            compute_fluid_levelset(
                px, g.res, g.bound_min, g.cell_size, g.dx, pm=p.m,
                sort_info=sort1,
            )
        )
    else:
        lphi = _lphi_of(px)
    dres = density_solve_3d(
        ph.rho,
        dt,
        px,
        p.m,
        cfg.particle_dx ** 3,
        sphi_c,
        lphi,
        w_faces,
        g.bound_min,
        g.cell_size,
        tol=sol.tol,
        rel_tol=sol.rel_tol,
        max_iter=sol.max_iter,
        jacobi_precond=sol.jacobi_precond,
        wz_bug=sol.density_wz_bug,
        use_pallas=sol.pallas,
        precond_kind=sol.precond,
        mg_opts=sol.mg_opts,
        mesh=mesh,
        bucket=((mesh, bspec) if bspec is not None else None),
        sort_info=sort1,
    )
    px = dres.px
    if bspec is not None:
        p2, l2 = rebucket(
            Particles(x=px, v=p.v, c=p.c, m=p.m), mesh, bspec,
            g.bound_min, g.cell_size,
        )
        p = p2
        px = p.x
        bucket_lost = bucket_lost + l2

    # -- post-displacement level-set rebuild (:4593) + P2G: particles do
    #    not move again until G2P, so ONE bias-0 cell sort serves the
    #    level set, the merged P2G/volume scatter, and G2P's broadcasts
    shared_sort = None
    if bspec is None:
        from python_fluid_simulation_tpu.ops.transfers import (
            make_sort_info,
        )

        shared_sort = make_sort_info(
            px, p.m, g.res, g.bound_min, g.cell_size
        )
        lphi = gshard(
            compute_fluid_levelset(
                px, g.res, g.bound_min, g.cell_size, g.dx, pm=p.m,
                sort_info=shared_sort,
            )
        )
    else:
        lphi = _lphi_of(px)

    # -- P2G (:4597-4604) + fluid volume (:4588 recompute, :4593-4594):
    #    all 3 axes AND the dual-lattice volume share one sort + one
    #    dense placement (the TPU scatter is row-bound)
    fshapes = [
        tuple(n + (1 if i == a else 0) for i, n in enumerate(g.res))
        for a in range(3)
    ]
    # fp32 hardening (docs/PARITY.md divergence #9): faces carrying
    # < 1e-7 of one particle mass are numerically empty — dividing
    # momentum by the EXACT tiny mass amplifies summation noise into
    # unbounded velocities (observed Inf/NaN at the funnel pile-up)
    mass_floor = 1e-7 * ph.rho * cfg.particle_dx ** 3
    if bspec is not None:
        gm, gv, lvol, sort_info = sharded_p2g_all(
            p, mesh, bspec, g.res, fshapes, _FACE_BIAS,
            g.bound_min, g.cell_size,
            volume=(cfg.particle_dx ** 3, g.dual_cell_size),
            mass_floor=mass_floor,
        )
    else:
        gm, gv, lvol, sort_info = p2g_all(
            px, p.m, p.v, p.c, g.res, fshapes, _FACE_BIAS,
            g.bound_min, g.cell_size,
            volume=(cfg.particle_dx ** 3, g.dual_cell_size),
            with_sort_info=True,
            sort_info=shared_sort,
            mass_floor=mass_floor,
        )
    gm = [gshard(m_a) for m_a in gm]
    gv = [gshard(v_a) for v_a in gv]
    lvol = {k: gshard(v) for k, v in lvol.items()}

    # -- gravity (:4608): applied to the whole y-face array
    gv[1] = gv[1] + ph.gravity * dt

    # -- viscosity (:4611-4642)
    visc_iters = jnp.int32(0)
    visc_resid = jnp.float32(0.0)
    visc_rel = jnp.float32(0.0)
    visc_conv = jnp.bool_(True)
    # 'auto' preconditioner: hysteresis on the PREVIOUS step's iteration
    # count (high-mu scenes flip regime when the fluid pools — Jacobi
    # explodes past the cap, the MG block preconditioner stays ~flat;
    # probing the contraction rate in-step misfires on Jacobi's early
    # plateau, measured on TPU coiling-256: probe-based auto chose MG in
    # the early regime where MG is 2x WORSE).  Switch to MG after a
    # >= viscosity_auto_iters step; fall-back rules at the update below
    # (cost-entered MG falls back on cheap convergence, failure-entered
    # MG is sticky).
    visc_mg = jnp.asarray(state.visc_mg, jnp.int32)
    use_mg = visc_mg > 0
    if ph.mu > 0:
        if sol.viscosity_mode in ("apic", "unet_warm"):
            warm = None
            if sol.viscosity_mode == "unet_warm" and unet_apply is not None:
                from python_fluid_simulation_tpu.models.features import (
                    unet_delta_v,
                )

                dvx, dvy, dvz = unet_delta_v(
                    unet_apply, unet_params, gv, sphi, lvol, cfg
                )
                # warm-start ONLY: the system is still built from gv, the
                # UNet prediction just seeds the CG iterate (BASELINE
                # config 4 — the reference itself has no such mode, it
                # uses the UNet INSTEAD of CG, cell 13 :4632-4640)
                warm = (
                    jnp.where(gm[0] > 0, gv[0] + dvx, gv[0]),
                    jnp.where(gm[1] > 0, gv[1] + dvy, gv[1]),
                    jnp.where(gm[2] > 0, gv[2] + dvz, gv[2]),
                )
            vres = viscosity_solve_3d(
                dt, ph.mu, ph.rho, tuple(gv), sphi_c, lvol, g.cell_vol,
                tol=sol.tol, rel_tol=sol.rel_tol, max_iter=sol.max_iter,
                jacobi_precond=sol.jacobi_precond, use_pallas=sol.pallas,
                mesh=mesh, precond_kind=sol.viscosity_precond,
                warm_start=warm,
                auto_use_mg=use_mg,
            )
            if capture_ml == "raw":
                # storage-friendly capture: the raw fields around the CG
                # solve (~10 MB/step at the flagship vs ~150 MB for the
                # built feature boxes); models/train.pairs_from_raw
                # rebuilds the ViscosityExample at training time
                from python_fluid_simulation_tpu.ops.indexing import (
                    merge_parity,
                )

                ml_pair = {
                    "gv_before": tuple(gv),
                    "gv_after": tuple(vres.v_faces),
                    "lvol": merge_parity(lvol, sphi.shape),
                }
            elif capture_ml:
                from python_fluid_simulation_tpu.models.train import (
                    capture_viscosity_pair,
                )

                ml_pair = capture_viscosity_pair(
                    tuple(gv), vres.v_faces, sphi, lvol, cfg
                )
            gv = list(vres.v_faces)
            visc_iters = vres.stats.iters
            visc_resid = vres.stats.residual
            visc_rel = vres.stats.residual / jnp.maximum(
                vres.stats.initial_residual, 1e-30
            )
            visc_conv = vres.stats.converged
        elif sol.viscosity_mode == "unet":
            from python_fluid_simulation_tpu.models.features import (
                unet_delta_v,
            )

            dvx, dvy, dvz = unet_delta_v(
                unet_apply, unet_params, gv, sphi, lvol, cfg
            )
            # g.v += delv; zero where face mass is 0 (cell 13 :4635-4640)
            gv[0] = jnp.where(gm[0] > 0, gv[0] + dvx, 0.0)
            gv[1] = jnp.where(gm[1] > 0, gv[1] + dvy, 0.0)
            gv[2] = jnp.where(gm[2] > 0, gv[2] + dvz, 0.0)

    # -- pressure projection (:4648)
    pres = pressure_solve_3d(
        tuple(gv), sv_c, lphi, w_faces, g.cell_size,
        tol=sol.tol, rel_tol=sol.rel_tol, max_iter=sol.max_iter,
        jacobi_precond=sol.jacobi_precond,
        dt_scale=(dt if sol.pressure_dt_scaled else None),
        use_pallas=sol.pallas,
        precond_kind=sol.precond,
        mg_opts=sol.mg_opts,
        mesh=mesh,
    )
    gv = [gshard(v) for v in pres.v_faces]

    # -- extrapolate 2 iterations, valid = mass > 0 (:4652)
    for a in range(3):
        gv[a], _ = extrapolate(gv[a], gm[a] > 0, 2)

    # -- boundary conditions (:4655)
    gv = list(
        apply_boundary_condition(
            gv, gm, sphi_c, sv_c, g.dx, mass_floor=mass_floor
        )
    )

    # -- G2P (:4660): gather-free segment broadcast over P2G's cell sort
    #    (positions unchanged between P2G and G2P)
    if bspec is not None:
        pv, pc = sharded_g2p_all(
            gv, mesh, bspec, g.res, _FACE_BIAS, g.bound_min,
            g.cell_size, sort_info,
        )
    else:
        pv, pc = g2p_all(
            gv, g.res, _FACE_BIAS, g.bound_min, g.cell_size, sort_info
        )

    # Cost-gated hysteresis (VERDICT r3 weak #1: the MG flip at 300
    # Jacobi iterations LOSES wall-clock on every measured config).  The
    # lean two-grid cycle costs ~12-14x a Jacobi iteration on TPU v5e
    # (coiling_504: Jacobi 508 it @ ~3.3 ms vs MG 70 it @ ~46 ms) and MG
    # converges in ~20-70, so Jacobi wins below ~800 iterations; the MG
    # flip exists for CORRECTNESS — a Jacobi solve that hits the cap is a
    # silently under-solved step — so non-convergence also triggers it.
    # Three states in the carried flag (r4 advisor high):
    #   0 = Jacobi; 1 = MG entered on COST (Jacobi converged but slowly);
    #   2 = MG entered on Jacobi NON-CONVERGENCE — sticky.  State 1 falls
    # back once MG converges cheaply enough that Jacobi is surely faster
    # (mg_iters * cost_ratio < the switch threshold); state 2 never falls
    # back on low MG iters — MG converging fast says nothing about
    # whether Jacobi's 600-iteration cap now suffices, and the old single
    # flag oscillated MG -> Jacobi(cap, under-solved) -> MG every other
    # step in the pooled coiling regime.
    _mg_fallback = max(16, sol.viscosity_auto_iters // 12)
    new_visc_mg = jnp.where(
        use_mg,
        jnp.where(
            (visc_mg == 1) & (visc_iters < _mg_fallback), 0, visc_mg
        ),
        jnp.where(
            ~visc_conv,
            2,
            jnp.where(visc_iters >= sol.viscosity_auto_iters, 1, 0),
        ),
    ).astype(jnp.int32)
    new_state = SimState(
        particles=Particles(x=px, v=pv, c=pc, m=p.m),
        solid=solid,
        t=state.t + dt,
        step_idx=state.step_idx + 1,
        visc_mg=new_visc_mg,
    )
    # per-solver records are self-describing (VERDICT r3 weak #7): the
    # absolute ||r||^2, the RELATIVE residual ||r||^2/||r0||^2, and the
    # converged flag (||r||^2 < max(tol^2, rel_tol^2 ||r0||^2)) all land
    # in metrics.jsonl so a reader can tell solved from stalled without
    # opening cg.py
    def _rel(stats):
        return stats.residual / jnp.maximum(stats.initial_residual, 1e-30)

    metrics = {
        "dt": dt,
        "max_speed": jnp.max(jnp.sqrt(jnp.sum(pv**2, axis=-1))),
        "density_iters": dres.stats.iters,
        "density_residual": dres.stats.residual,
        "density_rel_residual": _rel(dres.stats),
        "density_converged": dres.stats.converged,
        "viscosity_iters": visc_iters,
        "viscosity_residual": visc_resid,
        "viscosity_rel_residual": visc_rel,
        "viscosity_converged": visc_conv,
        "pressure_iters": pres.stats.iters,
        "pressure_residual": pres.stats.residual,
        "pressure_rel_residual": _rel(pres.stats),
        "pressure_converged": pres.stats.converged,
    }
    if bucketed:
        metrics["bucket_lost"] = bucket_lost
    if capture_ml:
        metrics["ml_pair"] = ml_pair
    return new_state, metrics


def make_step(
    cfg: SimConfig, unet_apply=None, unet_params=None, mesh=None,
    bucketed: bool = False,
):
    """Jitted single step with a static config.

    UNet params are threaded as a jit ARGUMENT — capturing them in the
    closure would bake ~69M weights into the program as constants
    (hundreds of MB of MLIR; the remote-compile path rejects it)."""

    @functools.partial(jax.jit, static_argnums=(2, 3, 4))
    def _step(state, params, apply_fn, mesh_, bucketed_):
        return step_3d(
            state, cfg, apply_fn, params, mesh=mesh_,
            bucketed=bucketed_,
        )

    def step(state):
        return _step(state, unet_params, unet_apply, mesh, bucketed)

    return step


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def _simulate_jit(
    state, unet_params, geom, cfg, num_steps, unet_apply, mesh, bucketed
):
    # normalise the carried hysteresis flag (construction sites default
    # it to plain 0; the scan carry needs a concrete i32)
    state = state._replace(visc_mg=jnp.asarray(state.visc_mg, jnp.int32))

    def body(s, _):
        return step_3d(
            s, cfg, unet_apply, unet_params, mesh=mesh, geom=geom,
            bucketed=bucketed,
        )

    return jax.lax.scan(body, state, None, length=num_steps)


@functools.partial(jax.jit, static_argnums=(1,))
def _geom_jit(solid, mesh):
    return build_geom_cache(solid, mesh)


def simulate(
    state: SimState, cfg: SimConfig, num_steps: int, unet_apply=None,
    unet_params=None, mesh=None, bucketed: bool = False, geom=None,
):
    """Roll `num_steps` under lax.scan; returns (final_state, metrics).

    The jitted runner is module-level with (cfg, num_steps, unet_apply,
    mesh) static, so repeated calls hit the jit cache (a per-call inner
    closure would recompile the whole scan every time).

    Static solid geometry is built in its OWN small jit and threaded
    into the scan program as an ARGUMENT: inlining build_geom_cache
    into the scan program re-evaluated the SDF/fraction tables on every
    simulate() call inside the hot program — ~167 ms at 128^3, i.e.
    +17 ms/step apparent on a 10-step benchmark block (round-3 xplane
    attribution: ops/indexing.py:120 parity-view slices).  Callers that
    roll many blocks (run.py) pass ``geom`` once to amortise it to zero.
    With moving bodies (cfg.moving_solid) the step re-evaluates the
    solid level set and rebuilds the geometry itself each iteration.

    ``bucketed`` (with a mesh) runs the spatially-bucketed particle
    layout: the state's particle arrays must come from
    `parallel.particles.bucket_particles`.
    """
    if geom is None and not cfg.moving_solid:
        geom = _geom_jit(state.solid, mesh)
    return _simulate_jit(
        state, unet_params, geom, cfg, num_steps, unet_apply, mesh,
        bucketed,
    )
