"""Micro-benchmark: coupled viscosity matvec + CG-iteration cost.

Times (a) one blocked coupled matvec, (b) one full Jacobi-PCG iteration
as the XLA while_loop body runs it (matvec + dots + axpys), at a given
grid shape, and reports achieved GB/s against the modeled bytes.  Sets
the target for the fused coupled-CG kernel (round 3).

  python benchmarks/coupled_cg_micro.py --shape 77 128 77
  python benchmarks/coupled_cg_micro.py --shape 126 504 126
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--shape", type=int, nargs=3, default=[77, 128, 77])
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--fused", action="store_true")
    args = p.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )

    import itertools

    import jax.numpy as jnp
    import numpy as np

    from python_fluid_simulation_tpu.solvers.viscosity import (
        prepare_viscosity_matvec,
        viscosity_term_fields,
    )

    nx, ny, nz = args.shape
    shape = (nx, ny, nz)
    if args.fused:
        bench_fused(shape, args.iters)
        return
    rng = np.random.default_rng(0)

    # synthetic parity-class dual-lattice fields: random control volumes
    # in (0,1], solid wall shell at the domain boundary (the matvec cost
    # is data-independent; only shapes matter)
    def class_shape(p):
        full = (2 * nx + 1, 2 * ny + 1, 2 * nz + 1)
        return tuple((full[i] - p[i] + 1) // 2 for i in range(3))

    vol = {}
    sphi_c = {}
    for p in itertools.product((0, 1), repeat=3):
        s = class_shape(p)
        vol[p] = jnp.asarray(
            rng.uniform(0.1, 1.0, s).astype(np.float32)
        )
        ii = np.minimum.reduce(np.meshgrid(
            np.minimum(np.arange(s[0]), s[0] - 1 - np.arange(s[0])),
            np.minimum(np.arange(s[1]), s[1] - 1 - np.arange(s[1])),
            np.minimum(np.arange(s[2]), s[2] - 1 - np.arange(s[2])),
            indexing="ij",
        ))
        sphi_c[p] = jnp.asarray((ii - 1).astype(np.float32))

    face_shapes = [
        (nx + 1, ny, nz), (nx, ny + 1, nz), (nx, ny, nz + 1)
    ]
    s_mu = 0.5
    fields = viscosity_term_fields(s_mu, sphi_c, vol, face_shapes, False)
    matvec, pdiag = prepare_viscosity_matvec(
        s_mu, sphi_c, vol, face_shapes, False, fields=fields
    )

    v = tuple(
        jnp.asarray(rng.standard_normal(s), jnp.float32)
        for s in face_shapes
    )

    mv = jax.jit(lambda vs: matvec(vs))
    out = jax.block_until_ready(mv(v))

    n = args.iters
    t0 = time.perf_counter()
    cur = v
    for _ in range(n):
        cur = mv(cur)
    jax.block_until_ready(cur)
    t_mv = (time.perf_counter() - t0) / n

    # one CG iteration as cg() runs it (matvec + 3 dots + 3 axpys + prec)
    def cg_iter(x, d, r, delta):
        q = matvec(d)
        dq = sum(
            jnp.vdot(a, b, precision=jax.lax.Precision.HIGHEST)
            for a, b in zip(d, q)
        )
        alpha = delta / dq
        x = tuple(xx + alpha * dd for xx, dd in zip(x, d))
        r = tuple(rr - alpha * qq for rr, qq in zip(r, q))
        z = tuple(rr / pp for rr, pp in zip(r, pdiag))
        nd = sum(
            jnp.vdot(a, b, precision=jax.lax.Precision.HIGHEST)
            for a, b in zip(r, z)
        )
        res = sum(
            jnp.vdot(a, a, precision=jax.lax.Precision.HIGHEST)
            for a in r
        )
        beta = nd / delta
        d = tuple(zz + beta * dd for zz, dd in zip(z, d))
        return x, d, r, nd + 0 * res

    it = jax.jit(cg_iter)
    st = (v, v, v, jnp.float32(1.0))
    st = jax.block_until_ready(it(*st))
    t0 = time.perf_counter()
    cur = st
    for _ in range(n):
        cur = it(*cur)
    jax.block_until_ready(cur)
    t_it = (time.perf_counter() - t0) / n

    field_mb = sum(
        4 * s[0] * s[1] * s[2] for s in face_shapes
    ) / 1e6
    # matvec modeled: read 3 fields x3 (per-axis re-read) + 42 coef + 3
    # diag + write 3
    mv_gb = field_mb * (3 + 14 + 1 + 1) / 1e3
    it_gb = mv_gb + field_mb * (2 + 3 + 3 + 3 + 3) / 1e3
    print(f"shape {shape}  field set {field_mb:.1f} MB")
    print(
        f"matvec: {t_mv*1e3:8.3f} ms  modeled {mv_gb:.2f} GB  "
        f"-> {mv_gb/t_mv:6.1f} GB/s"
    )
    print(
        f"cg_it : {t_it*1e3:8.3f} ms  modeled {it_gb:.2f} GB  "
        f"-> {it_gb/t_it:6.1f} GB/s"
    )


def bench_fused(shape, iters=50):
    """Time the fused blocked coupled CG at a fixed iteration count."""
    import itertools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from python_fluid_simulation_tpu.ops.pallas_cg import (
        make_fused_coupled_cg,
    )
    from python_fluid_simulation_tpu.solvers.cg import cg
    from python_fluid_simulation_tpu.solvers.viscosity import (
        prepare_viscosity_matvec,
        viscosity_term_fields,
    )

    nx, ny, nz = shape
    rng = np.random.default_rng(0)

    def class_shape(p):
        full = (2 * nx + 1, 2 * ny + 1, 2 * nz + 1)
        return tuple((full[i] - p[i] + 1) // 2 for i in range(3))

    vol, sphi_c = {}, {}
    for p in itertools.product((0, 1), repeat=3):
        s = class_shape(p)
        vol[p] = jnp.asarray(rng.uniform(0.1, 1.0, s).astype(np.float32))
        ii = np.minimum.reduce(np.meshgrid(
            np.minimum(np.arange(s[0]), s[0] - 1 - np.arange(s[0])),
            np.minimum(np.arange(s[1]), s[1] - 1 - np.arange(s[1])),
            np.minimum(np.arange(s[2]), s[2] - 1 - np.arange(s[2])),
            indexing="ij"))
        sphi_c[p] = jnp.asarray((ii - 1).astype(np.float32))

    face_shapes = [(nx + 1, ny, nz), (nx, ny + 1, nz), (nx, ny, nz + 1)]
    fields = viscosity_term_fields(0.5, sphi_c, vol, face_shapes, False)
    diags, per_axis, pdiags = fields
    v = tuple(jnp.asarray(rng.standard_normal(s), jnp.float32)
              for s in face_shapes)
    b = v
    x0 = tuple(jnp.zeros(s, jnp.float32) for s in face_shapes)

    import time as _t

    # generic XLA cg with the blocked pallas matvec, tol=0 -> max_iter
    matvec, pdiag = prepare_viscosity_matvec(
        0.5, sphi_c, vol, face_shapes, False, fields=fields)
    jaccg = jax.jit(lambda bb, xx: cg(
        matvec, bb, xx, tol=0.0, rel_tol=0.0, max_iter=iters,
        precond=lambda rs: tuple(r / d for r, d in zip(rs, pdiag))))
    out = jax.block_until_ready(jaccg(b, x0))
    t0 = _t.perf_counter()
    out = jax.block_until_ready(jaccg(b, x0))
    t_x = _t.perf_counter() - t0
    print(f"xla  cg {iters} iters: {t_x*1e3:8.1f} ms "
          f"({t_x/iters*1e3:.3f} ms/iter)  iters={int(out[1].iters)}")

    fused = make_fused_coupled_cg(
        diags, per_axis, face_shapes, pdiags,
        tol=0.0, rel_tol=0.0, max_iter=iters)
    from python_fluid_simulation_tpu.ops.pallas_cg import (
        make_fused_coupled_cg_geom,
    )
    geom = make_fused_coupled_cg_geom(
        sphi_c, vol, jnp.float32(0.5), face_shapes, pdiags,
        tol=0.0, rel_tol=0.0, max_iter=iters)
    fsolve = jax.jit(lambda bb, xx: fused(bb, xx))
    outf = jax.block_until_ready(fsolve(b, x0))
    t0 = _t.perf_counter()
    outf = jax.block_until_ready(fsolve(b, x0))
    t_f = _t.perf_counter() - t0
    print(f"fused cg {iters} iters: {t_f*1e3:8.1f} ms "
          f"({t_f/iters*1e3:.3f} ms/iter)  iters={int(outf[1])}")
    err = max(float(jnp.abs(a - c).max()) for a, c in zip(out[0], outf[0]))
    print(f"max |x_xla - x_fused| = {err:.3e}   speedup {t_x/t_f:.2f}x")
    gsolve = jax.jit(lambda bb, xx: geom(bb, xx))
    outg = jax.block_until_ready(gsolve(b, x0))
    t0 = _t.perf_counter()
    outg = jax.block_until_ready(gsolve(b, x0))
    t_g = _t.perf_counter() - t0
    print(f"geom cg {iters} iters: {t_g*1e3:8.1f} ms "
          f"({t_g/iters*1e3:.3f} ms/iter)  iters={int(outg[1])}  "
          f"speedup vs xla {t_x/t_g:.2f}x")


if __name__ == "__main__":
    main()
