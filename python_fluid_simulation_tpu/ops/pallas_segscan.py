"""Single-pass Pallas segmented scan over cell-sorted particle rows.

The scatter engine's segmented reductions/broadcasts over the sorted
particle order (`ops/scatter.py`) are masked-doubling loops in XLA:
``segment_broadcast_sorted`` and ``segment_min_sorted`` make 8 shifted
passes over a (K, C<=128) array and ``segment_sum_sorted`` runs a global
cumsum + a backpointer gather — every pass a full HBM round-trip on a
lane-padded ~180 MB buffer at 128^3-class particle counts.  The round-3
self-time profile attributes ~35 ms/step to those loops (scatter.py
doubling/cumsum/take lines) out of a 280 ms step.

This kernel computes the inclusive SEGMENTED SCAN (combine = add or min)
in one read + one write:

  out[i] = combine(vals[j] for j in segment(i), j <= i)

using the classic Hillis-Steele segmented-scan operator on (value, flag)
pairs [Blelloch, "Scans as primitive parallel operations", 1989 — the
same formulation the reference's CUDA ecosystem uses via CUB], executed
blockwise in VMEM with a cross-block carry:

  * rows ride the sublane axis; the per-row segment flag
    (``same[i] = ids[i] == ids[i-1]``, computed by the caller from the
    sorted ids) is appended as ONE extra lane — the (K, C) value table
    lane-pads to 128 anyway, so the flag channel is free, and the kernel
    never needs the ids themselves;
  * within a block of B rows: log2(B) ``pltpu.roll`` doubling passes on
    VMEM-resident registers (v_i (+)= f_i ? v_{i-s} : ident;
    f_i &= f_{i-s}), with rows i < s reading (ident, 1) so the final
    flag means "this row's segment extends past the block start";
  * across blocks: the TPU grid is sequential, so a (1, C) VMEM scratch
    carries the last row's scanned value; rows whose final flag is set
    combine the carry — exactly the rows whose segment crosses the
    block boundary.  Segments may therefore be ARBITRARILY long (the
    XLA doubling loops cap segments at 2^8 rows).

Numerics: bit-exact for ``min`` (order-free) and for the broadcast use
(one non-zero row per segment); for ``add`` the doubling tree
associates fp32 additions differently from both a sequential fold and
the XLA cumsum-difference path (which additionally cancels
``c[i] - c[first-1]``) — all three agree to fp32 rounding of the
segment sums.

MEASURED (round 3, TPU v5e, k=356k, benchmarks/segscan_micro.py):
both kernels are VPU-bound, not DMA-bound, and LOSE to the fused XLA
masked-doubling loops except at full channel width:

  c      xla add   roll add   mxu add   xla min   roll min
  12     1.6 ms    5.2 ms     4.7 ms    1.6 ms    5.2 ms
  54     2.3 ms    5.4 ms     5.1 ms    2.3 ms    5.4 ms
  125    5.5 ms    5.7 ms     4.7 ms    5.3 ms    5.7 ms

The roll kernel spends 11 doubling passes x ~6 VPU ops on the
lane-padded (2048, 128) block; the MXU reformulation (tile-local scan
as a boundary-count-equality mask matmul) moves the combine to the
MXU but still pays per-tile (128,128) mask construction on the VPU,
landing at ~4.7 ms vs the 0.45 ms DMA floor.  A plain row gather
(``table[ids]``) is 31 ms — row-bound, as round 2 found.  So the XLA
formulation stays the default; ``PFS_PALLAS_SEGSCAN=1`` opts in (the
MXU add kernel wins only at c~125, 1.2x).  Kept because it removes
the 2^8 segment-length cap of the doubling loops, and as the measured
record of why single-pass scans do not pay on this VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK = 2048  # rows per grid step (power of two; (2048,128) f32 = 1 MB)
_MIN_ROWS = 4096  # below this the XLA doubling loop wins (kernel launch)


def seg_scan_available(vals: jnp.ndarray, interpret: bool = False) -> bool:
    import os

    if os.environ.get("PFS_PALLAS_SEGSCAN", "0") == "0":
        return False
    if not interpret and jax.default_backend() != "tpu":
        return False
    return (
        vals.ndim == 2
        and vals.dtype == jnp.float32
        and vals.shape[-1] <= 127  # one lane reserved for the flag
        and vals.shape[0] >= _MIN_ROWS
    )


def _kernel_mxu(n_lanes, in_ref, out_ref, carry_ref):
    """MXU formulation of the segmented ADD-scan (the docstring's known
    follow-up): per 128-row tile, the inclusive segmented scan is ONE
    masked-lower-triangular matmul —

      c_i   = #segment-starts in rows [tile_start, i]   (L @ b)
      M[i,j] = (c_i == c_j) & (j <= i)                  (same segment,
                                                         causal)
      scan  = M @ V                                     ((128,128)@(128,C))

    11 VPU doubling passes over the whole block become 16 small MXU
    matmuls — ~13x less VPU work, so the kernel goes from VPU-bound to
    DMA-bound.  The 0/1 mask makes every product exact; only the fp32
    ADD association differs from the sequential fold (same caveat as
    the XLA cumsum path).  min has no matmul form and keeps the roll
    kernel."""
    b_rows = in_ref.shape[0]
    c = n_lanes

    @pl.when(pl.program_id(0) == 0)
    def _():
        carry_ref[0, :] = jnp.zeros((carry_ref.shape[1],), jnp.float32)

    row = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    ltri = (row >= col).astype(jnp.float32)
    ones_col = jnp.ones((128, 1), jnp.float32)
    carry = carry_ref[0:1, :c]
    for t in range(b_rows // 128):
        v = in_ref[t * 128 : (t + 1) * 128, :c]
        f = in_ref[t * 128 : (t + 1) * 128, c : c + 1]
        starts = 1.0 - f
        # inclusive start-count, as column and (via outer product) row
        ccol = jax.lax.dot(
            ltri, starts, precision=jax.lax.Precision.HIGHEST
        )
        crow = jax.lax.dot_general(
            ones_col, ccol, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
        mask = jnp.where(
            (ccol == crow) & (row >= col), 1.0, 0.0
        )
        s = jax.lax.dot(
            mask, v, precision=jax.lax.Precision.HIGHEST
        )
        s = s + jnp.where(ccol == 0.0, 1.0, 0.0) * carry
        carry = s[127:128, :]
        out_ref[t * 128 : (t + 1) * 128, :] = s
    carry_ref[0, :c] = carry[0, :]


def _kernel(combine, ident, n_lanes, in_ref, out_ref, carry_ref):
    b = in_ref.shape[0]
    c = n_lanes
    v = in_ref[:, :c]
    f = in_ref[:, c : c + 1]  # (B, 1) 0/1 "same segment as row i-1"

    @pl.when(pl.program_id(0) == 0)
    def _():
        carry_ref[0, :] = jnp.full((carry_ref.shape[1],), ident, jnp.float32)

    row = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)
    s = 1
    while s < b:
        in_block = row >= s
        vs = jnp.where(in_block, pltpu.roll(v, s, axis=0), ident)
        fs = jnp.where(
            in_block.astype(jnp.float32), pltpu.roll(f, s, axis=0), 1.0
        )
        v = combine(v, jnp.where(f > 0, vs, ident))
        f = f * fs
        s *= 2
    carry = carry_ref[0:1, :c]
    v = combine(v, jnp.where(f > 0, carry, ident))
    carry_ref[0, :c] = v[b - 1, :]
    out_ref[:, :] = v


@functools.partial(jax.jit, static_argnames=("op", "interpret", "kernel"))
def seg_scan_sorted(
    vals: jnp.ndarray,
    same: jnp.ndarray,
    op: str = "add",
    interpret: bool = False,
    kernel: str = "auto",
) -> jnp.ndarray:
    """Inclusive segmented scan of ``vals`` (K, C) down the rows.

    ``same``: (K,) bool/int — True where row i continues row i-1's
    segment (``sorted_ids[i] == sorted_ids[i-1]``; row 0 False).

    ``kernel``: 'roll' (Hillis-Steele VPU doubling), 'mxu' (masked
    lower-triangular matmul per 128-row tile; add only), or 'auto'
    (mxu for add, roll for min).
    """
    k, c = vals.shape
    ident = 0.0 if op == "add" else float(jnp.finfo(jnp.float32).max)
    combine = jnp.add if op == "add" else jnp.minimum
    if kernel == "auto":
        kernel = "mxu" if op == "add" else "roll"
    use_mxu = kernel == "mxu" and op == "add"

    kp = -(-k // _BLOCK) * _BLOCK
    aug = jnp.concatenate(
        [vals, same.astype(jnp.float32)[:, None]], axis=-1
    )
    if kp != k:
        pad = jnp.zeros((kp - k, c + 1), jnp.float32)
        if ident != 0.0:
            pad = pad.at[:, :c].set(ident)
        aug = jnp.concatenate([aug, pad], axis=0)

    body = (
        functools.partial(_kernel_mxu, c)
        if use_mxu
        else functools.partial(_kernel, combine, ident, c)
    )
    out = pl.pallas_call(
        body,
        grid=(kp // _BLOCK,),
        in_specs=[
            pl.BlockSpec(
                (_BLOCK, c + 1), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (_BLOCK, c), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((kp, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        interpret=interpret,
    )(aug)
    return out[:k] if kp != k else out
