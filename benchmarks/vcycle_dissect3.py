"""Restrict/prolong implementation shootout at 128^3-class L0<->L1,
device-side (fori_loop), plus a floor measurement.

  python benchmarks/vcycle_dissect3.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )

    from python_fluid_simulation_tpu.solvers.multigrid import (
        _pad_even, _prolong, _restrict,
    )

    n = (77, 128, 77)
    nc = (39, 64, 39)
    rng = np.random.default_rng(0)
    r0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    N = 100

    def loop_time(f, x0, label):
        @jax.jit
        def run(x):
            def body(_, q):
                return f(q) * 0.9999

            return lax.fori_loop(0, N, body, x)

        out = jax.block_until_ready(run(x0))
        t0 = time.perf_counter()
        out = jax.block_until_ready(run(x0))
        dt = (time.perf_counter() - t0) / N * 1000
        print(f"{label}: {dt:.4f} ms/apply", flush=True)
        return out

    # floor: elementwise on the fine field
    loop_time(lambda q: q + 1.0, r0, "floor fine elementwise")
    rc0 = jnp.asarray(rng.standard_normal(nc).astype(np.float32))
    loop_time(lambda q: q + 1.0, rc0, "floor coarse elementwise")

    # current implementations (round-trip to keep shapes stable)
    loop_time(
        lambda q: _prolong(_restrict(q, nc), n), r0, "current restrict+prolong"
    )

    # reduce_window restrict
    def rw_restrict(q):
        q = _pad_even(q)
        return lax.reduce_window(
            q, 0.0, lax.add, (2, 2, 2), (2, 2, 2), "VALID"
        )

    def rw_round(q):
        return _prolong(rw_restrict(q), n)

    loop_time(rw_round, r0, "reduce_window restrict + current prolong")

    # matmul restrict/prolong: contraction matrices on y (sublane) and z
    # (lane); x handled by free-major reshape-sum.
    def mk_R(fine, coarse):
        R = np.zeros((fine + fine % 2, coarse), np.float32)
        for i in range(fine):
            R[i, i // 2] = 1.0
        return jnp.asarray(R[:fine])

    Rx, Ry, Rz = mk_R(n[0], nc[0]), mk_R(n[1], nc[1]), mk_R(n[2], nc[2])

    def mm_restrict(q):
        # z: (x,y,z)@(z,zc); y: contract with Ry; x: reshape-sum (major dim)
        q = jnp.einsum("xyz,zc->xyc", q, Rz)
        q = jnp.einsum("xyc,yd->xdc", q, Ry)
        xp = n[0] + n[0] % 2
        q = jnp.pad(q, ((0, xp - n[0]), (0, 0), (0, 0)))
        return q.reshape(xp // 2, 2, nc[1], nc[2]).sum(axis=1)

    def mm_prolong(q):
        q = jnp.einsum("xdc,yd->xyc", q, Ry)
        q = jnp.einsum("xyc,zc->xyz", q, Rz)
        q = jnp.repeat(q, 2, axis=0)[: n[0]]
        return q

    loop_time(lambda q: mm_prolong(mm_restrict(q)), r0,
              "matmul restrict+prolong")

    err = np.abs(
        np.asarray(mm_restrict(r0)) - np.asarray(_restrict(r0, nc))
    ).max()
    print("matmul restrict max err vs current:", err)

    # conv-based restrict (XLA convs hit the MXU with im2col)
    def conv_restrict(q):
        q = _pad_even(q)[None, ..., None]
        k = jnp.ones((2, 2, 2, 1, 1), jnp.float32)
        out = lax.conv_general_dilated(
            q, k, window_strides=(2, 2, 2), padding="VALID",
            dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
        )
        return out[0, ..., 0]

    loop_time(lambda q: _prolong(conv_restrict(q), n), r0,
              "conv restrict + current prolong")
    err = np.abs(
        np.asarray(conv_restrict(r0)) - np.asarray(_restrict(r0, nc))
    ).max()
    print("conv restrict max err vs current:", err)

    # prolong via transposed conv
    def conv_prolong(e):
        q = e[None, ..., None]
        k = jnp.ones((2, 2, 2, 1, 1), jnp.float32)
        out = lax.conv_general_dilated(
            q, k, window_strides=(1, 1, 1), padding=((1, 0), (1, 0), (1, 0)),
            lhs_dilation=(2, 2, 2),
            dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
        )
        return out[0, : n[0], : n[1], : n[2], 0]

    loop_time(lambda q: conv_prolong(conv_restrict(q)), r0,
              "conv restrict + conv prolong")
    err = np.abs(
        np.asarray(conv_prolong(rc0)) - np.asarray(_prolong(rc0, n))
    ).max()
    print("conv prolong max err vs current:", err)

    # restrict alone / prolong alone (pad coarse back via slice to keep
    # loop shapes stable is awkward; time one-way with pairs)
    loop_time(lambda q: _prolong(q * 0.5 + 0.1, n)[::2, ::2, ::2] * 0.0 + q,
              rc0, "prolong-only (current, + coarse passthrough)")


if __name__ == "__main__":
    main()
