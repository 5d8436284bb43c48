"""Profile the learned-viscosity (UNet) inference path in isolation
(VERDICT round-2 item 6: attribute the ~300 ms 'unet' step).

Times, on the flagship 48x80x48 buckling box (dual lattice 97x161x97 ->
padded 112x176x112):

  net        — UNet3D.apply alone on a prebuilt input batch
  features   — build_unet_input (embed + 9 masked gradients + masks)
  extract    — extract_delta_v de-interleave
  full       — unet_delta_v end-to-end

each for fp32 and bf16, and optionally captures an xplane trace of the
bare network for per-op attribution (--trace /tmp/unetprof; parse with
benchmarks/parse_xplane.py).

  python benchmarks/unet_profile.py [--iters 20] [--trace DIR] [--fast-unpool]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(f, label, iters):
    import jax

    out = f()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f()
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1000
    print(f"{label}: {ms:.2f} ms", flush=True)
    return ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--trace", default=None)
    p.add_argument("--fast-unpool", action="store_true")
    p.add_argument("--width", type=int, default=64)
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
    from python_fluid_simulation_tpu.engine.step import step_3d
    from python_fluid_simulation_tpu.models import features
    from python_fluid_simulation_tpu.models.unet3d import UNet3D

    cfg = scenes.buckling_config()
    state = scenes.buckling_scene(cfg)
    # one classical step to get a live velocity field
    state, _ = step_3d(state, cfg)

    g = cfg.grid
    from python_fluid_simulation_tpu.engine.step import _FACE_BIAS
    from python_fluid_simulation_tpu.ops.transfers import p2g_all

    fshapes = [
        tuple(n + (1 if i == a else 0) for i, n in enumerate(g.res))
        for a in range(3)
    ]
    gm, gv, lvol, _ = p2g_all(
        state.particles.x, state.particles.m, state.particles.v,
        state.particles.c, g.res, fshapes, _FACE_BIAS,
        g.bound_min, g.cell_size,
        volume=(cfg.particle_dx ** 3, g.dual_cell_size),
        with_sort_info=True,
    )
    sphi = state.solid.phi

    for dtype, tag in ((jnp.float32, "fp32"), (jnp.bfloat16, "bf16")):
        model = UNet3D(
            width=args.width, dtype=dtype, fast_unpool=args.fast_unpool
        )
        x = jax.jit(
            lambda gv=gv: features.build_unet_input(
                gv, sphi, lvol, g.dx ** 3
            )
        )()
        params = model.init(jax.random.PRNGKey(0), x)
        apply_j = jax.jit(model.apply)
        feats_j = jax.jit(
            lambda: features.build_unet_input(gv, sphi, lvol, g.dx ** 3)
        )
        out = apply_j(params, x)
        extract_j = jax.jit(
            lambda out=out: features.extract_delta_v(
                out, sphi.shape, [v.shape for v in gv],
                via_reshape=False,
            )
        )
        extract_r = jax.jit(
            lambda out=out: features.extract_delta_v(
                out, sphi.shape, [v.shape for v in gv],
                via_reshape=True,
            )
        )
        # params/fields as ARGUMENTS: a 69M-param closure bakes 275 MB
        # of literals into the program (the remote compile tunnel 413s)
        full_j = jax.jit(
            lambda pr, gv_, sphi_, lvol_: features.unet_delta_v(
                model.apply, pr, gv_, sphi_, lvol_, cfg
            )
        )
        full_j = (lambda f: (lambda: f(params, gv, sphi, lvol)))(full_j)
        print(f"--- {tag} (input {x.shape}, fast_unpool={args.fast_unpool})")
        # compiled FLOP count -> MXU utilisation (VERDICT r4 #4): v5e
        # peak ~197 TFLOP/s fp32-on-MXU... use the bf16 peak 394 for
        # bf16 and half for fp32 (XLA convs run on the MXU either way)
        try:
            ca = apply_j.lower(params, x).compile().cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            gflop = float(ca.get("flops", 0.0)) / 1e9
            peak_tflops = 394.0 if tag == "bf16" else 197.0
            print(
                f"compiled flops: {gflop:.1f} GFLOP "
                f"(peak {peak_tflops} TFLOP/s -> "
                f"{gflop/peak_tflops:.2f} ms at 100% MXU)"
            )
        except Exception as e:  # cost analysis is best-effort
            gflop = None
            print("cost_analysis unavailable:", e)
        net_ms = timeit(
            lambda: apply_j(params, x), f"net/{tag}", args.iters
        )
        if gflop:
            peak_tflops = 394.0 if tag == "bf16" else 197.0
            mfu = gflop / (net_ms * 1e-3) / (peak_tflops * 1e3)
            print(f"net MFU/{tag}: {100*mfu:.1f}%")
        timeit(feats_j, f"features/{tag}", args.iters)
        timeit(lambda: extract_j(), f"extract/{tag}", args.iters)
        timeit(lambda: extract_r(), f"extract_reshape/{tag}", args.iters)
        timeit(full_j, f"full/{tag}", args.iters)

        if args.trace and tag == "fp32":
            os.makedirs(args.trace, exist_ok=True)
            hlo = jax.jit(model.apply).lower(params, x).compile().as_text()
            with open(os.path.join(args.trace, "hlo.txt"), "w") as f:
                f.write(hlo)
            with jax.profiler.trace(args.trace):
                for _ in range(3):
                    out = apply_j(params, x)
                jax.block_until_ready(out)
            print("trace written to", args.trace)


if __name__ == "__main__":
    main()
