"""BASELINE config 5 "sharded across a TPU mesh": execute a 256^3-class
coiling step spatially sharded over an N-device mesh and record the
per-device memory footprint (memory-scaling evidence — with one physical
TPU chip, the mesh is the 8-virtual-CPU mesh; the sharding/collective
program is identical to a real v5e-8 slice, cf. __graft_entry__'s
dryrun).

Runs `--steps` full engine steps (spatially-sharded grid + bucketed
particle residency), asserts finiteness, and prints per-device live
buffer bytes after the run plus the largest single buffer per device.

  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
  python benchmarks/sharded_big.py [--res 512] [--steps 1] [--devices 8]
"""

import argparse
import collections
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--res", type=int, default=512,
                   help="vertical cell count; grid = (res/4, res, res/4)")
    p.add_argument("--steps", type=int, default=1)
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--out", default=None)
    p.add_argument(
        "--warm-rerun", action="store_true",
        help="time a second (jit-cached) simulate call; skip for big "
        "grids on the CPU mesh where a step takes minutes",
    )
    args = p.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags += f" --xla_force_host_platform_device_count={args.devices}"
    # N virtual devices timeshare the host's cores; at 256^3-class each
    # shard computes for minutes between collectives, so the in-process
    # communicator's default 30/40 s stuck-rendezvous abort fires
    # spuriously.  Irrelevant on a real TPU mesh (hardware collectives).
    if "collective_timeout" not in flags:
        flags += (
            " --xla_cpu_collective_timeout_seconds=7200"
            " --xla_cpu_collective_call_terminate_timeout_seconds=7200"
        )
    os.environ["XLA_FLAGS"] = flags.strip()

    import jax

    # the container's sitecustomize pins jax_platforms to "axon,cpu"
    # (overriding JAX_PLATFORMS); backends are lazy, so flipping the
    # config back before any device op restores plain CPU
    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    assert len(jax.devices()) >= args.devices, (
        f"have {len(jax.devices())} devices, want {args.devices}"
    )

    import numpy as np

    from python_fluid_simulation_tpu.engine import scenes
    from python_fluid_simulation_tpu.engine.step import simulate
    from python_fluid_simulation_tpu.parallel.mesh import (
        make_mesh,
        shard_state,
    )
    from python_fluid_simulation_tpu.parallel.particles import (
        bucket_particles,
        make_bucket_spec,
    )

    cfg = scenes.coiling_config(res=args.res)
    state = scenes.coiling_scene(cfg)
    n_part = int(state.particles.x.shape[0])
    mesh = make_mesh(args.devices)
    state = shard_state(state, mesh)
    spec = make_bucket_spec(
        args.devices, cfg.grid.res[0], state.particles.x.shape[0],
        positions=np.asarray(state.particles.x),
        bound_min=cfg.grid.bound_min, cell_size=cfg.grid.cell_size,
    )
    state = state._replace(
        particles=bucket_particles(
            state.particles, mesh, spec, cfg.grid.bound_min,
            cfg.grid.cell_size,
        )
    )

    from python_fluid_simulation_tpu.engine.step import _geom_jit

    geom = None if cfg.moving_solid else _geom_jit(state.solid, mesh)
    jax.block_until_ready(geom)
    t0 = time.perf_counter()
    out, metrics = simulate(state, cfg, args.steps, mesh=mesh,
                            bucketed=True, geom=geom)
    jax.block_until_ready(out)
    wall = time.perf_counter() - t0
    # timed second call (jit cache warm) for an honest per-step wall
    t1 = time.perf_counter()
    out, metrics = simulate(out, cfg, args.steps, mesh=mesh,
                            bucketed=True, geom=geom)
    jax.block_until_ready(out)
    warm = time.perf_counter() - t1

    x = jax.device_get(out.particles.x)
    m = jax.device_get(out.particles.m)
    assert np.all(np.isfinite(x[np.asarray(m) > 0]))

    per_dev = collections.defaultdict(int)
    biggest = collections.defaultdict(int)
    for buf in jax.live_arrays():
        for shard in buf.addressable_shards:
            nb = shard.data.nbytes
            per_dev[str(shard.device)] += nb
            biggest[str(shard.device)] = max(biggest[str(shard.device)], nb)
    result = {
        "grid": list(cfg.grid.res),
        "cells": int(np.prod(cfg.grid.res)),
        "particles": n_part,
        "devices": args.devices,
        "bucket_cap_per_device": int(spec.cap),
        "steps": args.steps,
        "wall_s_incl_compile": round(wall, 1),
        "warm_wall_s_per_step": round(warm / args.steps, 2),
        "iters_last": {
            k: int(np.asarray(v)[-1]) for k, v in metrics.items()
            if k.endswith("_iters")
        },
        "per_device_state_gb": {
            k: round(v / 1e9, 3) for k, v in sorted(per_dev.items())
        },
        "largest_buffer_mb": {
            k: round(v / 1e6, 1) for k, v in sorted(biggest.items())
        },
    }
    print(json.dumps(result, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
