"""Fused Pallas smoothers for the multigrid V-cycle's coarse levels.

Round-2 finding (VERDICT item 9, DESIGN.md §9): at 128^3 the MG
preconditioner cuts pressure/density PCG iterations ~8x (81 -> 10) yet
LOSES end-to-end, because the V-cycle compiles to a chain of ~700 small
XLA ops per application (each damped-Jacobi relaxation is ~15 pad/slice/
arith ops, and levels 1+ run 5 relaxations each plus a 24-iteration
coarse solve) — at 64^3-and-below the arrays are tiny, so the cycle is
pure dispatch latency, not bandwidth.

Fix: one ``pallas_call`` per *smoothing chain*.  Every tail level
(k >= 1) fits comfortably in VMEM (level 1 of a 128^3 hierarchy is
64^3 = 1 MB/field fp32), so each of

  - pre-smooth from zero (n_smooth damped-Jacobi iters) + residual,
  - post-smooth (n_smooth iters from the corrected iterate),
  - coarse solve (coarse_iters iters from zero)

becomes a single kernel holding the level's (diag, 6 coefs) and the
iterate in VMEM — unrolled in-register Jacobi with zero HBM round trips.
Restriction/prolongation stay XLA (they are single free-reshape
reductions/broadcasts, already fused well).  Level 0 keeps the blocked
streaming matvec (`make_blocked_stencil_matvec`) — its fields don't fit
VMEM and its smoothing is bandwidth-real work.

Layout identical to `pallas_stencils.make_stencil_matvec`: fields
flatten (X, Y, Z) -> (X, Y*Z) padded to a lane multiple; y/z stencil
steps become lane rolls whose wrapped entries only land where the
boundary-masked coefficients are zero (Galerkin coarsening preserves
zero couplings across domain edges).  A leading batch dim (the batched
viscosity preconditioner stacks 3 axis systems) flattens into rows the
same way: cross-system x-wraps also land on zero coefficients.

Reference contrast: the reference runs UNPRECONDITIONED host-driven CG
(PressureCGSolver3D.py:207-221); this file exists to make the TPU MG
path strictly faster than Jacobi-PCG at 128^3+.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

try:  # pragma: no cover - exercised via interpret mode on CPU
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

from python_fluid_simulation_tpu.ops.pallas_stencils import (
    _VMEM_BUDGET,
    _pad_lanes,
)


class LevelKernels(NamedTuple):
    presmooth_resid: callable  # b -> (x, r)
    postsmooth: callable  # (x, b) -> x
    coarse_solve: callable  # b -> x


def _flatten_level(a, yzp):
    """(…batch, X, Y, Z) -> (B*X, yzp) row-major flatten + lane pad."""
    *lead, x, y, z = a.shape
    rows = x
    for s in lead:
        rows *= s
    flat = a.reshape(rows, y * z)
    if yzp != y * z:
        flat = jnp.pad(flat, ((0, 0), (0, yzp - y * z)))
    return flat


def _roll(q, s, axis):
    if s == 0:
        return q
    return pltpu.roll(q, (-s) % q.shape[axis], axis)


def level_kernels_available(shape) -> bool:
    """True when the fused tail-level smoothers can run for a level of
    this (possibly batch-leading) shape: pallas present, TPU backend,
    and the ~12-buffer live set under the scoped-VMEM budget."""
    if not _HAS_PALLAS:
        return False
    if jax.default_backend() != "tpu":
        return False
    *lead, x, y, z = shape
    rows = x
    for s in lead:
        rows *= s
    yzp = _pad_lanes(y * z)
    return 4 * rows * yzp * 12 <= _VMEM_BUDGET


def make_level_kernels(
    diag: jnp.ndarray,
    coefs,
    *,
    omega: float,
    n_smooth: int,
    coarse_iters: int,
    interpret: bool | None = None,
) -> LevelKernels:
    """Fused smoothing chains for one MG level (see module docstring).

    ``diag``/``coefs`` as stored in a `_Level` — 3D fields or batched 4D
    (leading systems dim).  The caller gates on
    `level_kernels_available(diag.shape)`.
    """
    *lead, X, Y, Z = diag.shape
    rows = X
    for s in lead:
        rows *= s
    yz = Y * Z
    yzp = _pad_lanes(yz)
    # offsets: last-three-axes stencil steps -> (x-roll, lane-roll)
    shifts = tuple(
        (off[-3], off[-2] * Z + off[-1]) for off, _ in coefs
    )
    n = len(coefs)
    diag_f = _flatten_level(diag, yzp)
    coef_fs = [_flatten_level(c, yzp) for _, c in coefs]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    om = float(omega)  # python scalar: inlined, not a captured constant

    def _apply(xv, diag_v, coef_vs):
        acc = diag_v * xv
        for (sr, sl), cv in zip(shifts, coef_vs):
            q = xv
            if sr:
                q = _roll(q, sr, 0)
            if sl:
                q = _roll(q, sl, 1)
            acc = acc + cv * q
        return acc

    def _chain(iters, from_zero, emit_resid):
        def kernel(*refs):
            k = 0
            diag_v = refs[k][:]
            k += 1
            coef_vs = [r[:] for r in refs[k : k + n]]
            k += n
            b = refs[k][:]
            k += 1
            if from_zero:
                xv = None
            else:
                xv = refs[k][:]
                k += 1
            out_x = refs[k]
            k += 1
            out_r = refs[k] if emit_resid else None

            inv = om / jnp.where(diag_v > 0, diag_v, 1.0)
            for i in range(iters):
                if i == 0 and from_zero:
                    xv = b * inv  # A@0 == 0: first relaxation is free
                    continue
                xv = xv + (b - _apply(xv, diag_v, coef_vs)) * inv
            out_x[:] = xv
            if emit_resid:
                out_r[:] = b - _apply(xv, diag_v, coef_vs)

        n_in = 1 + n + 1 + (0 if from_zero else 1)
        out_shape = jax.ShapeDtypeStruct((rows, yzp), jnp.float32)
        out_shapes = (out_shape, out_shape) if emit_resid else out_shape
        out_specs = pl.BlockSpec(memory_space=pltpu.VMEM)
        if emit_resid:
            out_specs = (out_specs, out_specs)

        def run(*arrays):
            flat = [_flatten_level(a, yzp) for a in arrays]
            out = pl.pallas_call(
                kernel,
                out_shape=out_shapes,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
                out_specs=out_specs,
                interpret=interpret,
            )(diag_f, *coef_fs, *flat)
            shape = diag.shape

            def back(o):
                return o[:, :yz].reshape(shape)

            if emit_resid:
                return back(out[0]), back(out[1])
            return back(out)

        return run

    pre = _chain(n_smooth, from_zero=True, emit_resid=True)
    post_raw = _chain(n_smooth, from_zero=False, emit_resid=False)
    coarse = _chain(coarse_iters, from_zero=True, emit_resid=False)

    def presmooth_resid(b):
        return pre(b)

    def postsmooth(x, b):
        return post_raw(b, x)

    def coarse_solve(b):
        return coarse(b)

    return LevelKernels(presmooth_resid, postsmooth, coarse_solve)
