"""Grid indexing primitives: static shifts and dual-lattice parity views.

The reference addresses its (2N+1)^d dual lattice with explicit strided
indices inside CUDA kernels (e.g. ``sphi[2*x+3, 2*y, 2*z+1]``,
ViscosityCGSolver3D.py:133).  Every such sample is (a) a *parity class* of
the dual lattice — one of 2^d interleaved subgrids — and (b) a static
integer shift within that class.  Expressing stencils as
``shift(parity_view(S, p), offsets)`` turns every reference kernel into a
composition of slices XLA fuses into a single loop, and makes the halo
widths for sharding explicit (±1 on each parity class ⇒ ±2 on the fine
lattice, SURVEY §7 hardest-parts #4).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def shift(a: jnp.ndarray, offsets: Sequence[int], fill=0):
    """out[i] = a[i + offsets] with out-of-range reads replaced by `fill`.

    Static offsets only — compiles to pad+static-slice (never gather).
    """
    return sample(a, offsets, a.shape[: len(offsets)], fill)


def sample(a: jnp.ndarray, offsets: Sequence[int], target_shape: Sequence[int], fill=0):
    """out[i] = a[i + offsets] over a target grid, `fill` when out of range.

    Generalises `shift` to differently-shaped source/target grids (e.g.
    sampling the (nx,ny+1,nz) y-face array from the (nx+1,ny,nz) x-face
    grid).  Static offsets/shapes → pure pad + lax.slice_in_dim.
    """
    out = a
    for axis, (off, t) in enumerate(zip(offsets, target_shape)):
        off = int(off)
        s = out.shape[axis]
        front = max(0, -off)
        back = max(0, t + off - s)
        if front or back:
            pad = [(0, 0)] * out.ndim
            pad[axis] = (front, back)
            out = jnp.pad(out, pad, constant_values=fill)
        start = off + front
        if start != 0 or start + t != out.shape[axis]:
            out = jax.lax.slice_in_dim(out, start, start + t, axis=axis)
    return out


def split_parity(dual: jnp.ndarray, ndim: int | None = None):
    """Pre-split a dual-lattice array into its 2^d parity classes.

    Strided (::2) slices relayout data on TPU; doing the split ONCE per
    field per solve and sampling the dense class arrays afterwards is
    much cheaper than re-striding inside every stencil term.  The dict
    is accepted anywhere `dual_sample` takes a raw dual array.
    """
    import itertools as _it

    if isinstance(dual, dict):  # already split
        return dual
    d = ndim or dual.ndim
    return {
        p: parity_view(dual, p) for p in _it.product((0, 1), repeat=d)
    }


def dual_sample(
    dual,
    base_parity: Sequence[int],
    offset: Sequence[int],
    target_shape: Sequence[int],
    fill=0,
):
    """Sample the dual lattice at ``dual[2*i + base_parity + offset]`` for
    every site ``i`` of a primal grid (cells or faces).

    This is the direct transcription device for the reference's CUDA
    indexing: e.g. ``sphi[2*x+3, 2*y, 2*z+1]`` inside the y-face viscosity
    kernel (ViscosityCGSolver3D.py:133) is
    ``dual_sample(sphi, P3_YFACE, (2, 0, 0), yface_shape)`` since the
    y-face base site is (2x+1, 2y, 2z+1).

    Decomposition: q = base_parity + offset; the sample lives in parity
    class (q mod 2) at integer shift (q - q mod 2)/2 within that class.
    """
    q = [p + o for p, o in zip(base_parity, offset)]
    cls = tuple(c % 2 for c in q)
    k = tuple((c - c % 2) // 2 for c in q)
    src = dual[cls] if isinstance(dual, dict) else parity_view(dual, cls)
    return sample(src, k, target_shape, fill)


def merge_parity(classes: dict, dual_res: Sequence[int]) -> jnp.ndarray:
    """Inverse of `split_parity`: interleave 2^d parity-class grids back
    into one (2N+1)^d dual-lattice array.  Only needed where a consumer
    genuinely wants the interleaved box (the UNet feature builder);
    everything stencil-shaped samples the classes directly."""
    d = len(dual_res)
    any_cls = next(iter(classes.values()))
    dual = jnp.zeros(tuple(dual_res), any_cls.dtype)
    for p, arr in classes.items():
        idx = tuple(slice(int(pp), None, 2) for pp in p)
        dual = dual.at[idx].set(arr)
    return dual


def parity_view(dual: jnp.ndarray, parity: Sequence[int]) -> jnp.ndarray:
    """Return the subgrid dual[p0::2, p1::2, ...] for parity in {0,1}^d.

    For a MAC grid of resolution N (dual lattice 2N+1):
      3D: centers=(1,1,1) → N^3;  x-faces=(0,1,1) → (N+1,N,N);
          y-faces=(1,0,1);  z-faces=(1,1,0);  edges/nodes = the rest.
      2D: centers=(1,1);  x-faces=(0,1);  y-faces=(1,0);  nodes=(0,0).
    """
    idx = tuple(slice(p, None, 2) for p in parity)
    return dual[idx]


# Canonical parity tuples (3D)
P3_CENTER = (1, 1, 1)
P3_XFACE = (0, 1, 1)
P3_YFACE = (1, 0, 1)
P3_ZFACE = (1, 1, 0)
P3_XYEDGE = (0, 0, 1)  # dual sites offset in x and y (== z-aligned edge)
P3_XZEDGE = (0, 1, 0)
P3_YZEDGE = (1, 0, 0)
P3_NODE = (0, 0, 0)

# Canonical parity tuples (2D)
P2_CENTER = (1, 1)
P2_XFACE = (0, 1)
P2_YFACE = (1, 0)
P2_NODE = (0, 0)


def face_parity(axis: int, ndim: int) -> Tuple[int, ...]:
    p = [1] * ndim
    p[axis] = 0
    return tuple(p)


def interior_mask(shape: Sequence[int], active_hi: Sequence[int] | None = None):
    """Boolean mask of "interior" sites following the reference kernels.

    The reference CUDA kernels skip ``x == 0 or x >= dim-1`` per axis
    (e.g. PressureCGSolver3D.py:9).  `active_hi` overrides the upper
    bound per axis for the kernels that use ``x > gres-1`` instead
    (apply_pressure :135 covers faces up to gres-1 inclusive on face
    axes of size gres+1).
    """
    masks = []
    for axis, n in enumerate(shape):
        i = jnp.arange(n)
        hi = (active_hi[axis] if active_hi is not None else n - 1)
        m = (i >= 1) & (i < hi)
        bshape = [1] * len(shape)
        bshape[axis] = n
        masks.append(m.reshape(bshape))
    out = masks[0]
    for m in masks[1:]:
        out = out & m
    return out


def grid_positions(res, bound_min, cell_size, bias, dtype=jnp.float32):
    """Positions of grid sites: bound_min + (index + bias) * cell_size.

    Reference: ``get_grid_pos`` (cell 10 :783-788).  Returns shape
    res + (d,).
    """
    d = len(res)
    axes = [
        (jnp.arange(res[a], dtype=dtype) + bias[a]) * cell_size[a]
        + bound_min[a]
        for a in range(d)
    ]
    grids = jnp.meshgrid(*axes, indexing="ij")
    return jnp.stack(grids, axis=-1)
