"""Feature builder + output extraction for the learned viscosity operator.

Reference: notebook cell 12 (:824-911).  Staggered velocities are embedded
at their parity sites in a conv-friendly padded box (multiple of 16 per
axis so 4 pool levels divide evenly), 9 masked central-difference
velocity-gradient channels are formed, sphi becomes a binary solid mask,
lvol is normalised by the cell volume of the coarse grid, and the model's
3 output channels are read back at the face parities as Δv (scaled by DT:
``output / int(1/DT)``, :907).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax.numpy as jnp


def _pad16(n: int) -> int:
    return ((n + 15) // 16) * 16


def padded_box(dual_res: Sequence[int]) -> Tuple[Tuple[int, int, int], Tuple[int, int, int]]:
    """(data_size, pad_lo) per cell-12's data_size computation (:834-838)."""
    data = tuple(_pad16(s) for s in dual_res)
    pad = tuple((d - s) // 2 for d, s in zip(data, dual_res))
    return data, pad


def _embed(field, data_size, pad, parity):
    """Place a face-parity field at its dual-lattice sites inside the box.

    Via the (X,2,Y,2,Z,2) parity view: a stride-2 `.at[].set` lowers to
    a strided scatter, while the reshaped form is a contiguous
    slice-assign + one free-ish reshape (same trick as
    `extract_delta_v`)."""
    r = jnp.zeros(
        tuple(s for d_ in data_size for s in (d_ // 2, 2)), field.dtype
    )
    (sx, tx), (sy, ty), (sz, tz) = (
        ((p + q) // 2, (p + q) % 2) for p, q in zip(pad, parity)
    )
    n = field.shape
    r = r.at[
        sx : sx + n[0], tx, sy : sy + n[1], ty, sz : sz + n[2], tz
    ].set(field)
    return r.reshape(data_size)


def _masked_central_diff(g, axis):
    """d[i] = g[i-1] - g[i+1], zeroed where either neighbour is exactly 0.

    Reference: grad_v (cell 12 :844-883).  Operating on the sparse parity
    embedding, nonzero results land on the correct derivative parities.
    """
    lo = jnp.roll(g, 1, axis)
    hi = jnp.roll(g, -1, axis)
    d = lo - hi
    d = jnp.where((lo == 0) | (hi == 0), 0.0, d)
    # zero the boundary slices the roll wrapped
    idx = jnp.arange(g.shape[axis])
    shape = [1] * g.ndim
    shape[axis] = g.shape[axis]
    interior = ((idx > 0) & (idx < g.shape[axis] - 1)).reshape(shape)
    return jnp.where(interior, d, 0.0)


_FACE_PARITY = ((0, 1, 1), (1, 0, 1), (1, 1, 0))


def build_unet_input(
    gv: Sequence[jnp.ndarray],
    sphi: jnp.ndarray,
    lvol: jnp.ndarray,
    cell_vol_norm: float,
) -> jnp.ndarray:
    """(1, D, H, W, 11) channels-last input. Channel order matches cell 12
    :899: [dxdx, dydy, dzdz, dxdy, dxdz, dydx, dydz, dzdx, dzdy,
    solid_mask, lvol_norm].

    ``lvol`` may be the raw (2N+1)^3 dual array or its parity-class dict
    (the engine's form); the UNet box genuinely needs the interleaved
    lattice, so a dict is merged here (the only consumer that pays the
    relayout — the stencil solvers sample classes directly)."""
    dual = sphi.shape
    if isinstance(lvol, dict):
        from python_fluid_simulation_tpu.ops.indexing import merge_parity

        lvol = merge_parity(lvol, dual)
    data_size, pad = padded_box(dual)
    emb = [
        _embed(gv[a], data_size, pad, _FACE_PARITY[a]) for a in range(3)
    ]
    grads = []
    for a in range(3):  # dxdx, dydy, dzdz (diagonal first)
        grads.append(_masked_central_diff(emb[a], a))
    ordered = [grads[0], grads[1], grads[2]]
    # off-diagonals in reference order: dxdy, dxdz, dydx, dydz, dzdx, dzdy
    for a, ax in ((0, 1), (0, 2), (1, 0), (1, 2), (2, 0), (2, 1)):
        ordered.append(_masked_central_diff(emb[a], ax))

    # solid mask: 1 where sphi <= 0 (solid), 0 where fluid/air; the box
    # padding counts as solid (sphi_sympad initialised to -1, :838)
    mask = jnp.ones(data_size, jnp.float32)
    window = tuple(slice(p, p + s) for p, s in zip(pad, dual))
    mask = mask.at[window].set((sphi <= 0).astype(jnp.float32))
    lv = jnp.zeros(data_size, jnp.float32)
    lv = lv.at[window].set(lvol / cell_vol_norm)

    x = jnp.stack(ordered + [mask, lv], axis=-1)
    return x[None, ...]


def extract_delta_v(
    output: jnp.ndarray,
    dual_res: Sequence[int],
    face_shapes,
    via_reshape: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """De-interleave the 3 output channels at face parities (:909-911).

    ``via_reshape`` extracts through one (X,2,Y,2,Z,2,3) parity view —
    stride-2 slices of the conv-layout box lower to strided gathers
    (measured 44 ms of the 316 ms unet-mode step); the reshape form is
    contiguous slices + static parity indices.
    """
    _, pad = padded_box(dual_res)
    if via_reshape:
        box = output[0]
        bx, by, bz, _ = box.shape
        r = box.reshape(bx // 2, 2, by // 2, 2, bz // 2, 2, -1)
        out = []
        for a in range(3):
            parity = _FACE_PARITY[a]
            n = face_shapes[a]
            (sx, tx), (sy, ty), (sz, tz) = (
                ((p + q) // 2, (p + q) % 2)
                for p, q in zip(pad, parity)
            )
            out.append(
                r[
                    sx : sx + n[0], tx,
                    sy : sy + n[1], ty,
                    sz : sz + n[2], tz,
                    a,
                ]
            )
        return tuple(out)
    out = []
    for a in range(3):
        parity = _FACE_PARITY[a]
        n = face_shapes[a]
        sl = tuple(
            slice(p + q, p + q + 2 * k, 2)
            for p, q, k in zip(pad, parity, n)
        )
        out.append(output[0, ..., a][sl])
    return tuple(out)


def unet_delta_v(apply_fn, params, gv, sphi, lvol, cfg):
    """Full learned-viscosity forward: features -> UNet -> Δv·dt.

    Unlike the reference (which re-instantiates the model and reloads the
    checkpoint from disk every step, cell 12 :904-906), params are plain
    pytree leaves of the jitted step.
    """
    dx = cfg.grid.dx
    x = build_unet_input(gv, sphi, lvol, dx**3)
    out = apply_fn(params, x) / int(round(1.0 / cfg.physics.dt))
    return extract_delta_v(out, sphi.shape, [v.shape for v in gv])
