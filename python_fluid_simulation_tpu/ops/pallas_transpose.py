"""Tiled Pallas transpose for the scatter engine's (M, C) -> (C, M) hop.

``ops/scatter.py::channels_first`` turns a dense per-cell segment table
(M = extended-grid cells, C = transfer channels) into channel-major
grids for the separable corner fold.  XLA lowers that moveaxis as a
relayout fused into the downstream reshape — measured 6.5-7 ms per
instance at 128^3 (~20 ms/step across the P2G / level-set / density
transposes; round-3 xplane: scatter.py:362/:388 reshapes), ~5x off
bandwidth for the ~1.6 GB the hop actually has to move (the (M, C<=128)
source is lane-padded to 128 in HBM; the (C, M) destination is dense).

This kernel streams (BM, C) tiles through VMEM and writes the
transposed (C, BM) tiles with the TPU's in-register transpose unit —
one read + one write of each byte, sequential DMAs on both sides.

Numerics: a transpose moves bytes, so the result is bit-exact; gated
on dtype/f32 + TPU backend only (interpret=True for CPU tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BM = 1024  # rows per tile: (1024, 128) f32 = 512 kB in + 512 kB out


def transpose_available(a: jnp.ndarray, interpret: bool = False) -> bool:
    if not interpret and jax.default_backend() != "tpu":
        return False
    return (
        a.ndim == 2
        and a.dtype == jnp.float32
        and a.shape[-1] <= 128
        and a.shape[0] >= 4 * _BM  # tiny tables: XLA's relayout is fine
    )


def _kernel(in_ref, out_ref):
    out_ref[:, :] = in_ref[:, :].T


@functools.partial(jax.jit, static_argnames=("interpret",))
def transpose_mc(a: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """(M, C) -> (C, M), C <= 128.  Edge block handled by Pallas
    (out-of-range rows read as padding and their columns are never
    written)."""
    m, c = a.shape
    return pl.pallas_call(
        _kernel,
        grid=(pl.cdiv(m, _BM),),
        in_specs=[
            pl.BlockSpec((_BM, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (c, _BM), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((c, m), jnp.float32),
        interpret=interpret,
    )(a)
