"""Pallas TPU kernel for the per-corner fold (`ops.scatter.fold_*`).

The scatter engine's dense placement produces a channel-major table
``seg (C, E0, E1, E2)`` over the +1-extended grid (source cells
u ∈ [-1, n] per axis); every transfer then folds channel c onto target
cells ``t = clip(u + s_c, 0, N-1)`` (the reference's per-corner border
clamp, cell 2 :128).  The XLA implementation (`fold_scattered_sep` +
`fold_clip`) lowers to a chain of pad/slice pieces and concatenates —
each materialised piece costs ~0.15 ms of async DMA at 128^3 regardless
of size, and the chains total ~40 ms/step (round-3 self-time profile).

MEASURED (round 3, TPU v5e): bit-exact vs the XLA fold at every engine
shift family, but perf-NEUTRAL in isolation (both paths are HBM-bound on
the big channel-major table, e.g. 125ch levelset fold = 25 ms either
way) and a slight LOSS end-to-end (128^3 step 284.9 vs 281.4 ms/step):
the opaque pallas_call breaks XLA's fusion of the fold pieces into
consumers.  Default OFF (`PFS_PALLAS_FOLD=1` opts in); kept because the
single-pass structure is the right starting point if the fold is ever
fused with the segment-reduction producer.

This kernel computes the whole fold in ONE pass:

    out[t] = combine_c  P[c, t - s_c - 1]          (static shifts)

(the engine's shift convention is relative to the EXTENDED-array index:
channel c lands on t = e + s_c where e = u + 1, so the source cell is
u = t - s_c - 1) where ``P`` is ``seg`` with a *border pre-accumulation*
that makes the clip exact: the sources contributing to target t=0 along
an axis are u ∈ [-1, -s-1] (every u with u+s+1 <= 0), so combining them
at the single position the stencil reads for t=0 (u = -s-1) — and the
u ∈ [N-2-s, E-2] tail at u = N-2-s for the high edge — turns the
clipped fold into a pure static-shift stencil.  Pre-accumulation composes separably across
axes when applied sequentially (x, then y, then z), exactly mirroring
`fold_clip`'s axis order: the y-edge combine then sees x-corrected
values, which is what routes corner sources like (u,v) = (-1,-1) to
target (0,0).

Blocking: 2-D over (x, y), z unblocked.  Each blocked axis uses the
repo's two-BlockSpec halo trick (cur + next block of the same padded
array), so stencil reads t + 3 - s ∈ [1, B+5) stay inside the 2B-wide
window for B >= 8.  The output is computed on a B-aligned padded grid
and sliced back.

Exact for "min"; for "add" it matches the XLA fold up to fp32 summation
order (channels combine in lexicographic order here, per-axis groups
there).  Oracle parity test (interpret mode): tests/test_scatter.py.
"""

from __future__ import annotations

import itertools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_B = 8  # block edge (x and y); needs >= 5 so reads fit in cur+next
_VMEM_BUDGET = 48 * 1024 * 1024


def fold_pallas_available(
    seg_shape: Sequence[int],
    out_shape: Sequence[int],
    axis_shifts,
    noclip_axes=(),
    interpret: bool = False,
) -> bool:
    if len(out_shape) != 3 or len(seg_shape) != 4 or noclip_axes:
        return False
    C = seg_shape[0]
    n_ch = 1
    for s in axis_shifts:
        n_ch *= len(s)
    if C != n_ch:
        return False
    for a, s in enumerate(axis_shifts):
        if min(s) < -2 or max(s) > 2:
            return False
        # ext must be the +1-extended grid (or one short of it, as for
        # the parity-class outputs): E in {N+1, N+2}
        if seg_shape[1 + a] - out_shape[a] not in (1, 2):
            return False
    if min(out_shape) < 8:
        return False
    # window VMEM: C * 2B * 2B * (Z + 7) * 4 bytes; x2 slack for the
    # functional pre-accumulation copies
    zp = seg_shape[3] + 7
    if C * 2 * _B * 2 * _B * zp * 4 * 2 > _VMEM_BUDGET:
        return False
    if not interpret and jax.default_backend() != "tpu":
        return False
    return True


def fold_scattered_sep_pallas(
    seg: jnp.ndarray,
    axis_shifts,
    out_shape: Sequence[int],
    combine: str = "add",
    fill=0.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for `ops.scatter.fold_scattered_sep` (no noclip_axes)."""
    C, E0, E1, E2 = (int(v) for v in seg.shape)
    N0, N1, N2 = (int(n) for n in out_shape)
    fill_v = jnp.asarray(fill, seg.dtype)

    nbx = -(-N0 // _B)
    nby = -(-N1 // _B)
    # pad 2 low / >=3 high for the stencil; high pads land exactly on
    # block multiples, with one extra block so `next` never reads OOB
    px_hi = (nbx + 1) * _B - (E0 + 2)
    py_hi = (nby + 1) * _B - (E1 + 2)
    assert px_hi >= 3 and py_hi >= 3, (seg.shape, out_shape)
    Q = jnp.pad(
        seg,
        [(0, 0), (2, px_hi), (2, py_hi), (2, 3)],
        constant_values=fill_v,
    )
    shifts = list(itertools.product(*axis_shifts))
    op = jnp.minimum if combine == "min" else jnp.add

    def _edge_ranges(s, N, E):
        """(low_src_qs, low_dst_q, high_src_qs, high_dst_q) in absolute
        padded coordinates (q = u + 3; the t=0 read sits at q = 2 - s,
        the t=N-1 read at q = N + 1 - s)."""
        low_src, low_dst = [], None
        if s <= -1:  # sources u in [-1, -s-2] join the u = -s-1 read
            low_dst = 2 - s
            low_src = list(range(2, 2 - s + 1))
        high_dst = N + 1 - s
        high_src = list(range(high_dst, E + 1 + 1))
        if len(high_src) <= 1:
            high_src, high_dst = [], None
        return low_src, low_dst, high_src, high_dst


    def _set_plane(w, axis, dst, v, pred=None):
        """w with plane `dst` along `axis` replaced by v (broadcast), as
        an iota-compare select (Mosaic has no in-kernel scatter); `pred`
        (scalar bool) optionally gates the replacement."""
        mask = jax.lax.broadcasted_iota(jnp.int32, w.shape, axis) == dst
        if pred is not None:
            mask = jnp.logical_and(mask, pred)
        return jnp.where(mask, jnp.expand_dims(v, axis), w)

    def kernel(q00, q10, q01, q11, out_ref):
        pid_x = pl.program_id(0)
        pid_y = pl.program_id(1)
        x_off = (nbx - 1) * _B  # window-local = absolute - off (last blk)
        y_off = (nby - 1) * _B

        acc = None
        for c, (sx, sy, sz) in enumerate(shifts):
            # per-channel (2B, 2B, Zp) window from the four block refs
            top = jnp.concatenate([q00[c], q01[c]], axis=1)
            bot = jnp.concatenate([q10[c], q11[c]], axis=1)
            w = jnp.concatenate([top, bot], axis=0)

            # pre-accumulate borders: x, then y, then z (fold_clip order)
            # x (blocked): low planes live in block 0 (local=absolute),
            # high planes in block nbx-1 (local = absolute - x_off);
            # apply with a per-plane where so other blocks are no-ops.
            lo_s, lo_d, hi_s, hi_d = _edge_ranges(sx, N0, E0)
            if lo_d is not None:
                v = w[lo_s[0]]
                for q in lo_s[1:]:
                    v = op(v, w[q])
                w = _set_plane(w, 0, lo_d, v, pid_x == 0)
            if hi_d is not None:
                v = w[hi_s[0] - x_off]
                for q in hi_s[1:]:
                    v = op(v, w[q - x_off])
                w = _set_plane(w, 0, hi_d - x_off, v, pid_x == nbx - 1)
            lo_s, lo_d, hi_s, hi_d = _edge_ranges(sy, N1, E1)
            if lo_d is not None:
                v = w[:, lo_s[0]]
                for q in lo_s[1:]:
                    v = op(v, w[:, q])
                w = _set_plane(w, 1, lo_d, v, pid_y == 0)
            if hi_d is not None:
                v = w[:, hi_s[0] - y_off]
                for q in hi_s[1:]:
                    v = op(v, w[:, q - y_off])
                w = _set_plane(w, 1, hi_d - y_off, v, pid_y == nby - 1)
            lo_s, lo_d, hi_s, hi_d = _edge_ranges(sz, N2, E2)
            if lo_d is not None:
                v = w[:, :, lo_s[0]]
                for q in lo_s[1:]:
                    v = op(v, w[:, :, q])
                w = _set_plane(w, 2, lo_d, v)
            if hi_d is not None:
                v = w[:, :, hi_s[0]]
                for q in hi_s[1:]:
                    v = op(v, w[:, :, q])
                w = _set_plane(w, 2, hi_d, v)

            piece = jax.lax.slice(
                w,
                (2 - sx, 2 - sy, 2 - sz),
                (2 - sx + _B, 2 - sy + _B, 2 - sz + N2),
            )
            acc = piece if acc is None else op(acc, piece)
        out_ref[...] = acc

    Zp = E2 + 5
    blk = (1, _B, _B, Zp)

    def spec(dx, dy):
        return pl.BlockSpec(
            (C,) + blk[1:],
            lambda i, j, dx=dx, dy=dy: (0, i + dx, j + dy, 0),
            memory_space=pltpu.VMEM,
        )

    out = pl.pallas_call(
        kernel,
        grid=(nbx, nby),
        in_specs=[spec(0, 0), spec(1, 0), spec(0, 1), spec(1, 1)],
        out_specs=pl.BlockSpec(
            (_B, _B, N2),
            lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (nbx * _B, nby * _B, N2), seg.dtype
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(Q, Q, Q, Q)
    return out[:N0, :N1, :]
