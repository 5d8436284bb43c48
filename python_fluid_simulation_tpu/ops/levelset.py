"""Fluid level set (union-of-balls) and fluid-volume field.

TPU-native replacement for notebook cells 4 and 6
(`3D_viscous_fluid_sim.ipynb` :224-278, :442-500).

The reference builds the level set by per-particle 5^d-stencil CUDA
``atomic.min`` (cell 4 :288) and the dual-lattice volume field by trilinear
``atomic.add`` (cell 6 :468).  Here both are single XLA scatter ops
(``.at[].min`` / ``.at[].add``) over the concatenated
(particles × stencil-offsets) index set — deterministic, device-resident.
"""

from __future__ import annotations

import itertools
import math
from typing import Sequence

import jax.numpy as jnp

from python_fluid_simulation_tpu.ops.transfers import (
    _corner_setup,
    _corner_weight,
    _flat_index,
)


def compute_fluid_levelset(
    px: jnp.ndarray,
    res: Sequence[int],
    bound_min: Sequence[float],
    cell_size: Sequence[float],
    gdx: float,
) -> jnp.ndarray:
    """Union-of-balls SDF at cell centers.

    Reference (cell 4): background phi = 3*gdx; particle radius
    r = gdx * 0.5 * sqrt(d) * 1.02; scatter-min of |center - x_p| - r over
    the particle's 5^d-cell neighbourhood with border clamping (:270-288).
    """
    d = px.shape[-1]
    n = px.shape[0]
    r = gdx * 0.5 * math.sqrt(float(d)) * 1.02
    bmin = jnp.asarray(bound_min, dtype=px.dtype)
    h = jnp.asarray(cell_size, dtype=px.dtype)
    hi = jnp.asarray(res, dtype=jnp.int32) - 1
    gi = jnp.floor((px - bmin) / h).astype(jnp.int32)

    idx_all, val_all = [], []
    for offs in itertools.product(range(-2, 3), repeat=d):
        oi = jnp.asarray(offs, dtype=jnp.int32)
        gii = jnp.clip(gi + oi, 0, hi)
        center = (gii.astype(px.dtype) + 0.5) * h + bmin
        dist = jnp.linalg.norm(center - px, axis=-1) - r
        idx_all.append(_flat_index(gii, res))
        val_all.append(dist)
    idx = jnp.concatenate(idx_all)
    val = jnp.concatenate(val_all)

    size = 1
    for s in res:
        size *= s
    phi = jnp.full((size,), 3.0 * gdx, dtype=px.dtype)
    phi = phi.at[idx].min(val)
    return phi.reshape(tuple(res))


def compute_fluid_volume(
    px: jnp.ndarray,
    pvol: float,
    dual_res: Sequence[int],
    bound_min: Sequence[float],
    fine_cell_size: Sequence[float],
) -> jnp.ndarray:
    """Particle volume scattered onto the (2N+1)^d dual lattice, clamped.

    Reference (cell 6): node-biased trilinear scatter (bias 0, gx = gi*h)
    with border clamping, then per-node clamp to the fine cell volume
    (constrain_fluid_volume_kernel :528-533).
    """
    d = px.shape[-1]
    gi, _, w = _corner_setup(
        px, bound_min, fine_cell_size, (0.0,) * d
    )
    hi = jnp.asarray(dual_res, dtype=jnp.int32) - 1

    idx_all, val_all = [], []
    for offs in itertools.product((0, 1), repeat=d):
        oi = jnp.asarray(offs, dtype=jnp.int32)
        corner = jnp.clip(gi + oi, 0, hi)
        weight = _corner_weight(w, offs)
        idx_all.append(_flat_index(corner, dual_res))
        val_all.append(weight * pvol)
    idx = jnp.concatenate(idx_all)
    val = jnp.concatenate(val_all)

    size = 1
    for s in dual_res:
        size *= s
    vol = jnp.zeros((size,), dtype=px.dtype).at[idx].add(val)
    fine_vol = 1.0
    for c in fine_cell_size:
        fine_vol *= c
    return jnp.minimum(vol, fine_vol).reshape(tuple(dual_res))
