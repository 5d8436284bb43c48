"""5^3 min-fold of a per-cell channel table straight to the fluid grid.

The level-set pipeline reduces particle distance channels to a dense
(M, 125) per-cell table (ops/pallas_binned.py) and then folds channel
(sx, sy, sz) at spatial offset (sx, sy, sz) with min-combine and border
clamping.  The XLA route does that as channels_first (a physical (M,128)
transpose), a reshape copy, and a separable 15-piece fold — ~20+ ms/step
at 128^3 and several hundred at coiling_504's 8.8M-cell tables.

This kernel consumes the table in its NATIVE (M, C) layout:
  * channels are stored GROUP-PADDED: 5 groups of 25 (one per x-offset)
    each padded to 32 lanes, C = 160 — so a BlockSpec can address one
    group as a lane-aligned block.
  * XLA pads the table spatially (reshape to (nx, ny, nz, 160), pad x by
    (2, 6), y/z by (4, 4) with the background fill — out-of-range
    sources read background, min-identity).
  * grid over extended output x-planes; FIVE views of the padded table
    feed each instance: view i loads plane (o + i), channel group
    (4 - i) (x-offset sx = 2 - i).
  * in-register: 25 static (y, z)-shifted slices per view, channel
    lane-extracted, min-combined into the (ny+4, nz+4) extended output
    plane.
  * XLA's fold_clip then reduces the extended borders into the edge
    cells (the reference's target clamping, cell 4 :281-284) — bit-equal
    to ops/scatter.fold_scattered_sep's min fold.

Availability: TPU (or interpret), f32, 3D, C == 160.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold5_available(res, interpret: bool = False) -> bool:
    if not interpret and jax.default_backend() != "tpu":
        return False
    return len(res) == 3


def _kernel(ny_e, nz_e, fill, ref, out_ref):
    # grid (o, s): s enumerates the 125 (sx, sy, sz) pieces; the output
    # block (same index for every s) stays resident and min-accumulates
    # one sliced piece per step — tiny register pressure (loading whole
    # blocks / unrolling all 125 pieces spilled ~650 MB of vregs).
    s = pl.program_id(1)
    sy_i = (s % 25) // 5  # sy + 2
    sz_i = s % 5  # sz + 2
    ch = s % 25

    @pl.when(s == 0)
    def _():
        out_ref[0] = jnp.full((ny_e, nz_e), fill, jnp.float32)

    # piece start = (2 - sy) = 4 - sy_i (and likewise for z); ch is a
    # dynamic lane index -> gather the lane via a one-hot dot-free
    # select: slice the 25 real lanes and mask-reduce
    blk = ref[0, 0, pl.ds(4 - sy_i, ny_e), pl.ds(4 - sz_i, nz_e), :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (ny_e, nz_e, 32), 2)
    piece = jnp.min(
        jnp.where(lane == ch, blk, jnp.inf), axis=2
    )
    out_ref[0] = jnp.minimum(out_ref[0], piece)


@functools.partial(
    jax.jit, static_argnames=("res", "fill", "interpret")
)
def fold5_min(
    table: jnp.ndarray,
    res,
    fill: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """table: (prod(res), 160) group-padded min table (channel
    (sx+2)*32 + (sy+2)*5 + (sz+2)); returns the folded (res) grid."""
    nx, ny, nz = (int(n) for n in res)
    t3 = table.reshape(nx, ny, nz, 160)
    # padded source index = (true source) + 4 on every axis: extended
    # output plane o (true target o - 2) with view i = 2 - sx reads
    # padded plane (o - 2 - sx) + 4 = o + i; y/z slices start at 2 - s.
    # The channel groups are split into five separate (.., 32) arrays in
    # XLA: Mosaic requires the last two BLOCK dims to be full-or-8/128-
    # divisible, so a 32-lane block of a 160-lane array is illegal while
    # the full 32-lane dim of a split array is fine.
    s3 = jnp.pad(
        t3,
        ((4, 4), (4, 4), (4, 4), (0, 0)),
        constant_values=fill,
    )
    # channel groups stacked on a leading dim: view i (x-offset
    # sx = 2 - i) is groups[4 - i... wait group index g = sx + 2 = 4 - i
    groups = jnp.stack(
        [s3[..., 32 * g : 32 * g + 32] for g in range(5)]
    )  # (5, nx+8, ny+8, nz+8, 32)
    ny_e, nz_e = ny + 4, nz + 4

    # instance (o, s): piece group g = 4 - s//25, source plane o + s//25
    in_spec = pl.BlockSpec(
        (1, 1, ny + 8, nz + 8, 32),
        lambda o, s: (4 - s // 25, o + s // 25, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )

    out_ext = pl.pallas_call(
        functools.partial(_kernel, ny_e, nz_e, fill),
        grid=(nx + 4, 125),
        in_specs=[in_spec],
        out_specs=pl.BlockSpec(
            (1, ny_e, nz_e), lambda o, s: (o, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nx + 4, ny_e, nz_e), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(groups)

    from python_fluid_simulation_tpu.ops.scatter import fold_clip

    return fold_clip(out_ext, (-2, -2, -2), (nx, ny, nz), "min", fill)
