"""CLI simulation runner.

The reference has no CLI (a notebook is the only driver, SURVEY §0);
this is the production entry point:

  python -m python_fluid_simulation_tpu.run --scene buckling --duration 0.1 \
      --out out/ --metrics --snapshot-pickle --checkpoint-every 100

Runs blocks of steps under lax.scan, logging per-step metrics (JSONL),
snapshotting the particle series in the reference's pickle layout, and
checkpointing the full state for resume.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time


def build_argparser():
    p = argparse.ArgumentParser(description="TPU fluid engine runner")
    p.add_argument("--scene", default="buckling",
                   choices=["buckling", "dam_break", "dam_break_2d", "droplet_2d", "coiling"])
    p.add_argument("--dx", type=float, default=None)
    p.add_argument("--mu", type=float, default=None)
    p.add_argument("--duration", type=float, default=None)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--block", type=int, default=15,
                   help="steps per scan block (= snapshot interval)")
    p.add_argument("--viscosity-mode", default=None,
                   choices=["apic", "unet", "unet_warm"])
    p.add_argument("--ckpt", default=None, help="torch/orbax UNet weights")
    p.add_argument("--unet-bf16", action="store_true",
                   help="run UNet inference in bfloat16 (params fp32)")
    p.add_argument("--out", default="out")
    p.add_argument("--metrics", action="store_true")
    p.add_argument("--snapshot-pickle", action="store_true")
    p.add_argument("--export-obj", action="store_true",
                   help="export the final fluid surface as OBJ")
    p.add_argument("--export-html", action="store_true",
                   help="write a standalone HTML replay of the particle "
                        "series (the reference's k3d playback, cell 14)")
    p.add_argument("--checkpoint-every", type=int, default=0)
    p.add_argument("--resume", default=None)
    p.add_argument("--profile-dir", default=None)
    p.add_argument("--bucketed", action="store_true",
                   help="with --mesh: spatially-bucketed particle "
                        "sharding (per-device residency + bounded "
                        "exchange) instead of index sharding")
    p.add_argument("--mesh", type=int, default=0,
                   help="shard the 3D step over an N-device mesh (grid "
                        "slab-decomposed along x, distributed PCG solves)")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    import jax

    # honour JAX_PLATFORMS even when a sitecustomize pinned another
    # platform via jax.config (the env var alone is overridden; backends
    # are lazy, so flipping back before any device op works)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import numpy as np

    from python_fluid_simulation_tpu.engine import scenes
    from python_fluid_simulation_tpu.engine.step import simulate
    from python_fluid_simulation_tpu.utils.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )
    from python_fluid_simulation_tpu.utils.io import (
        ParticleSeries,
        export_levelset_obj,
    )
    from python_fluid_simulation_tpu.utils.metrics import MetricsLogger
    from python_fluid_simulation_tpu.utils.timers import profiler_trace

    if args.scene in ("dam_break_2d", "droplet_2d"):
        from python_fluid_simulation_tpu.engine.step2d import (
            dam_break_scene_2d,
            droplet_scene_2d,
            simulate_2d,
        )

        maker = (
            droplet_scene_2d if args.scene == "droplet_2d"
            else dam_break_scene_2d
        )
        cfg, state = maker()
        sim = simulate_2d
    else:
        if args.scene == "coiling":
            cfg = scenes.coiling_config(
                res=int(round(1.2 / args.dx)) if args.dx else 256,
                mu=(args.mu if args.mu is not None else 5.0),
            )
            make_scene = scenes.coiling_scene
        elif args.scene == "buckling":
            cfg = scenes.buckling_config(
                dx=args.dx or 0.0125,
                mu=(args.mu if args.mu is not None else 1.0),
            )
            make_scene = scenes.buckling_scene
        else:  # dam_break
            from python_fluid_simulation_tpu.config import (
                GridConfig3D,
                PhysicsConfig,
                SimConfig,
            )

            dx = args.dx or 1.0 / 48
            cfg = SimConfig(
                grid=GridConfig3D(
                    bound_min=(0.0, 0.0, 0.0),
                    bound_size=(1.0, 1.0, 1.0),
                    dx=dx,
                ),
                physics=PhysicsConfig(
                    mu=(args.mu if args.mu is not None else 0.0)
                ),
                particle_dx=dx / 2,
                duration=2.0,
            )
            make_scene = scenes.dam_break_scene
        # solver-mode flags apply uniformly to every 3D scene
        if args.viscosity_mode:
            cfg = dataclasses.replace(
                cfg,
                solver=dataclasses.replace(
                    cfg.solver, viscosity_mode=args.viscosity_mode
                ),
            )
        state = make_scene(cfg)
        sim = simulate
    if args.resume:
        state, cfg, start = restore_checkpoint(args.resume)
        print(f"resumed from step {start}")
    if args.duration is not None and cfg is not None:
        cfg = dataclasses.replace(cfg, duration=args.duration)

    mesh = None
    if args.bucketed and not (args.mesh and args.mesh > 1):
        raise SystemExit("--bucketed requires --mesh N")
    if args.mesh and args.mesh > 1:
        if sim is not simulate:
            raise SystemExit("--mesh applies to 3D scenes only")
        from python_fluid_simulation_tpu.parallel.mesh import (
            make_mesh,
            shard_state,
        )

        mesh = make_mesh(args.mesh)
        state = shard_state(state, mesh)  # grid fields + rb table
        if args.bucketed:
            from python_fluid_simulation_tpu.parallel.particles import (
                bucket_particles,
                make_bucket_spec,
            )

            spec = make_bucket_spec(
                args.mesh, cfg.grid.res[0],
                state.particles.x.shape[0],
                positions=np.asarray(state.particles.x),
                bound_min=cfg.grid.bound_min,
                cell_size=cfg.grid.cell_size,
            )
            state = state._replace(
                particles=bucket_particles(
                    state.particles, mesh, spec, cfg.grid.bound_min,
                    cfg.grid.cell_size,
                )
            )
            print(
                f"bucket-sharded over {args.mesh} devices "
                f"(cap {spec.cap}/device, exchange {spec.exchange_cap})"
            )
        else:
            print(f"spatially sharded over {args.mesh} devices")

    unet_apply = unet_params = None
    if cfg is not None and cfg.solver.viscosity_mode in ("unet", "unet_warm"):
        import jax.numpy as _jnp

        from python_fluid_simulation_tpu.models.unet3d import UNet3D

        # bf16 compute (params stay fp32): conv FLOPs land on the MXU at
        # 2x the fp32 rate; the Tanh-bounded activations tolerate it
        model = UNet3D(
            dtype=_jnp.bfloat16 if args.unet_bf16 else _jnp.float32
        )
        if args.ckpt:
            from python_fluid_simulation_tpu.models.convert import (
                load_torch_checkpoint,
            )

            unet_params = load_torch_checkpoint(args.ckpt)
        else:
            import jax.numpy as jnp

            dual = cfg.grid.dual_res
            from python_fluid_simulation_tpu.models.features import padded_box

            data, _ = padded_box(dual)
            unet_params = model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, *data, 11))
            )
            print("WARNING: no --ckpt given; using random UNet weights")
        unet_apply = model.apply

    logger = MetricsLogger(
        os.path.join(args.out, "metrics.jsonl") if args.metrics else None
    )
    series = ParticleSeries()
    series.snapshot(0.0, np.asarray(state.particles.x))

    duration = cfg.duration if cfg is not None else 3.0
    dt_nominal = cfg.physics.dt if cfg is not None else 1 / 300.0
    max_steps = args.max_steps or int(duration / dt_nominal * 2)

    # static solid geometry: build once for the whole run (simulate
    # would otherwise re-derive it per block — ~167 ms at 128^3)
    geom = None
    if sim is simulate and not cfg.moving_solid:
        from python_fluid_simulation_tpu.engine.step import _geom_jit

        geom = _geom_jit(state.solid, mesh)

    step_count = 0
    t_start = time.perf_counter()
    with profiler_trace(args.profile_dir):
        while step_count < max_steps and float(state.t) < duration:
            n = min(args.block, max_steps - step_count)
            if sim is simulate:
                state, metrics = sim(
                    state, cfg, n, unet_apply, unet_params, mesh,
                    bucketed=args.bucketed, geom=geom,
                )
            else:
                state, metrics = sim(state, cfg, n)
            jax.block_until_ready(state)
            logger.log_scan(
                jax.tree.map(np.asarray, metrics), start_step=step_count
            )
            step_count += n
            series.snapshot(float(state.t), np.asarray(state.particles.x))
            if args.checkpoint_every and step_count % args.checkpoint_every == 0:
                save_checkpoint(
                    os.path.join(args.out, "ckpt"), state, cfg, step_count
                )
            rate = step_count / (time.perf_counter() - t_start)
            print(
                f"t={float(state.t):.4f}s steps={step_count} "
                f"({rate:.2f} steps/s)",
                flush=True,
            )

    if args.snapshot_pickle:
        series.save(os.path.join(args.out, "ps.pickle"))
    if args.export_html:
        from python_fluid_simulation_tpu.utils.viewer import (
            export_html_replay,
        )

        solid_mesh = None
        if cfg is not None and hasattr(state, "solid"):
            # embed the solid geometry as a wireframe, like the
            # reference's k3d.marching_cubes view (cell 10 :785-795)
            try:
                from python_fluid_simulation_tpu.utils.io import (
                    triangulate_levelset,
                )

                g = cfg.grid
                verts, tris = triangulate_levelset(
                    np.asarray(state.solid.phi),
                    origin=g.bound_min,
                    spacing=g.dual_cell_size,
                )
                verts = verts[:, [0, 2, 1]]  # match the series' k3d order
                solid_mesh = (verts, tris)
            except Exception as e:  # viewer still works without the solid
                print(f"solid mesh skipped: {e}")
        export_html_replay(
            series.series, os.path.join(args.out, "replay.html"),
            solid_mesh=solid_mesh,
        )
    if args.export_obj and cfg is not None:
        from python_fluid_simulation_tpu.ops.levelset import (
            compute_fluid_levelset,
        )

        g = cfg.grid
        lphi = compute_fluid_levelset(
            state.particles.x, g.res, g.bound_min, g.cell_size, g.dx
        )
        export_levelset_obj(
            np.asarray(lphi),
            os.path.join(args.out, "surface.obj"),
            origin=tuple(m + 0.5 * c for m, c in zip(g.bound_min, g.cell_size)),
            spacing=g.cell_size,
        )
    if args.checkpoint_every:
        save_checkpoint(os.path.join(args.out, "ckpt"), state, cfg, step_count)
    print(f"done: {step_count} steps, t={float(state.t):.4f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
