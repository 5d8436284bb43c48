"""Device-side V-cycle cost: run each piece N times inside ONE compiled
program (fori_loop) so the per-dispatch tunnel latency (~2 ms) divides out.

  python benchmarks/vcycle_dissect2.py [--res 128] [--inner 50]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--res", type=int, default=128)
    p.add_argument("--inner", type=int, default=50)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )

    from python_fluid_simulation_tpu.ops import pallas_mg
    from python_fluid_simulation_tpu.ops.pallas_stencils import (
        make_blocked_stencil_matvec,
    )
    from python_fluid_simulation_tpu.solvers import multigrid as mgmod
    from python_fluid_simulation_tpu.solvers.multigrid import (
        _prolong,
        _restrict,
    )
    from python_fluid_simulation_tpu.solvers.pressure import (
        pressure_coefficients,
    )

    n = (args.res * 77 // 128, args.res, args.res * 77 // 128)
    rng = np.random.default_rng(0)
    lphi = jnp.asarray(rng.standard_normal(n).astype(np.float32)) - 0.5
    w = [
        jnp.asarray(
            rng.uniform(
                0.2, 1.0,
                tuple(k + (1 if i == a else 0) for i, k in enumerate(n)),
            ).astype(np.float32)
        )
        for a in range(3)
    ]
    diag, coefs, _ = pressure_coefficients(w, lphi)
    diag = jax.block_until_ready(diag)
    r0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    levels = mgmod.build_hierarchy(diag, coefs)
    mv0 = make_blocked_stencil_matvec(diag, coefs)

    N = args.inner

    def loop_time(f, x0, label):
        @jax.jit
        def run(x):
            def body(_, q):
                return f(q) * 0.5  # keep values bounded

            return jax.lax.fori_loop(0, N, body, x)

        out = jax.block_until_ready(run(x0))
        t0 = time.perf_counter()
        out = jax.block_until_ready(run(x0))
        dt = (time.perf_counter() - t0) / N * 1000
        print(f"{label}: {dt:.4f} ms/apply", flush=True)
        return out

    mg_fused = mgmod.make_mg_preconditioner(diag, coefs, matvec0=mv0)
    loop_time(mg_fused, r0, "vcycle fused tails + matvec0")

    orig = pallas_mg.level_kernels_available
    pallas_mg.level_kernels_available = lambda s: False
    mg_xla = mgmod.make_mg_preconditioner(diag, coefs, matvec0=mv0)
    pallas_mg.level_kernels_available = orig
    loop_time(mg_xla, r0, "vcycle XLA tails + matvec0")

    loop_time(mv0, r0, "L0 blocked matvec")

    inv0 = jnp.where(diag > 0, 0.8 / jnp.where(diag > 0, diag, 1.0), 0.0)

    def l0_chain(b):
        x = b * inv0
        x = x + (b - mv0(x)) * inv0
        return b - mv0(x)

    loop_time(l0_chain, r0, "L0 presmooth(2)+resid")

    def updown(q):
        rc = _restrict(q, levels[1].diag.shape)
        return _prolong(rc, tuple(n))

    loop_time(updown, r0, "restrict+prolong L0<->L1")

    if pallas_mg.level_kernels_available(levels[1].diag.shape):
        lk = pallas_mg.make_level_kernels(
            levels[1].diag, levels[1].coefs, omega=0.8, n_smooth=2,
            coarse_iters=24,
        )
        r1 = jnp.asarray(
            rng.standard_normal(levels[1].diag.shape).astype(np.float32)
        )
        loop_time(
            lambda q: lk.presmooth_resid(q)[0], r1, "L1 fused presmooth+resid"
        )
        loop_time(lk.coarse_solve, r1, "L1-sized fused coarse(24)")

        # XLA-tail comparison at L1: one unfused smoothing chain
        def l1_xla_chain(b):
            lv = levels[1]

            def apply1(x):
                acc = lv.diag * x
                for off, c in lv.coefs:
                    acc = acc + c * jnp.roll(x, tuple(-o for o in off),
                                             (0, 1, 2))
                return acc

            inv = jnp.where(lv.diag > 0, 0.8 / jnp.where(lv.diag > 0,
                                                         lv.diag, 1.0), 0.0)
            x = b * inv
            x = x + (b - apply1(x)) * inv
            return b - apply1(x)

        loop_time(l1_xla_chain, r1, "L1 XLA(roll) presmooth+resid")

    # full sub-cycle below L0: what the tail actually costs per vcycle
    def tail_only(q):
        rc = _restrict(q, levels[1].diag.shape)

        def vc(k, b):
            return mgmod.make_mg_preconditioner  # placeholder

        return _prolong(rc, tuple(n))


if __name__ == "__main__":
    main()
