"""Dissect the 128^3 MG V-cycle's 4.4 ms: L0 smoothing vs fused tails vs
restriction/prolongation vs dispatch.

  python benchmarks/vcycle_dissect.py [--res 128]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(f, args, label, iters=20):
    import jax

    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{label}: {dt:.3f} ms", flush=True)
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

    print("default_backend:", jax.default_backend(), flush=True)

    from python_fluid_simulation_tpu.ops import pallas_mg
    from python_fluid_simulation_tpu.ops.pallas_stencils import (
        make_blocked_stencil_matvec,
    )
    from python_fluid_simulation_tpu.solvers import multigrid as mgmod
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
    r = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    levels = mgmod.build_hierarchy(diag, coefs)
    print("levels:", [lv.diag.shape for lv in levels], flush=True)
    print(
        "fused available per level:",
        [pallas_mg.level_kernels_available(lv.diag.shape) for lv in levels],
        flush=True,
    )

    mv0 = make_blocked_stencil_matvec(diag, coefs)

    # full V-cycle, fused tails (current state)
    mg_fused = mgmod.make_mg_preconditioner(diag, coefs, matvec0=mv0)
    timeit(jax.jit(mg_fused), (r,), "vcycle fused tails + matvec0")

    # full V-cycle, XLA tails
    orig = pallas_mg.level_kernels_available
    pallas_mg.level_kernels_available = lambda s: False
    mg_xla = mgmod.make_mg_preconditioner(diag, coefs, matvec0=mv0)
    pallas_mg.level_kernels_available = orig
    timeit(jax.jit(mg_xla), (r,), "vcycle XLA tails + matvec0")

    # no matvec0 (XLA L0 smoothing)
    mg_nomv0 = mgmod.make_mg_preconditioner(diag, coefs)
    timeit(jax.jit(mg_nomv0), (r,), "vcycle fused tails, XLA L0")

    # L0 pieces in isolation
    timeit(jax.jit(mv0), (r,), "L0 blocked matvec (1 apply)")

    inv0 = jnp.where(diag > 0, 0.8 / jnp.where(diag > 0, diag, 1.0), 0.0)

    def l0_chain(b):
        # pre-smooth from zero (2 relax) + residual, as the cycle does
        x = b * inv0
        x = x + (b - mv0(x)) * inv0
        return b - mv0(x)

    timeit(jax.jit(l0_chain), (r,), "L0 pre-smooth(2)+resid")

    # tail-only: time one fused level-1 chain set
    if len(levels) > 1 and pallas_mg.level_kernels_available(
        levels[1].diag.shape
    ):
        lk = pallas_mg.make_level_kernels(
            levels[1].diag, levels[1].coefs, omega=0.8, n_smooth=2,
            coarse_iters=24,
        )
        r1 = jnp.asarray(
            rng.standard_normal(levels[1].diag.shape).astype(np.float32)
        )
        timeit(jax.jit(lk.presmooth_resid), (r1,), "L1 fused presmooth+resid")
        timeit(jax.jit(lk.coarse_solve), (r1,), "L1-sized fused coarse(24)")

    # restriction/prolongation at the top
    from python_fluid_simulation_tpu.solvers.multigrid import (
        _prolong, _restrict,
    )

    timeit(
        jax.jit(lambda q: _restrict(q, levels[1].diag.shape)),
        (r,),
        "restrict L0->L1",
    )
    r1b = jnp.asarray(
        rng.standard_normal(levels[1].diag.shape).astype(np.float32)
    )
    timeit(
        jax.jit(lambda q: _prolong(q, tuple(n))), (r1b,), "prolong L1->L0"
    )


if __name__ == "__main__":
    main()
