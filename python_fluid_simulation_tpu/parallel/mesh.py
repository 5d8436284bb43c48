"""Device-mesh helpers for spatial domain decomposition.

The reference is single-GPU (SURVEY §2.4: one ``cp.cuda.Device(n).use()``,
no NCCL/MPI anywhere).  Multi-device support is therefore designed fresh,
TPU-first: the MAC grid is decomposed along the x spatial axis over a 1D
``jax.sharding.Mesh`` (2D x/z meshes are a natural extension), particles
are sharded along their leading dimension, CG dot products all-reduce over
ICI, and stencil halos move via ``ppermute`` (see halo.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

GRID_AXIS = "x"  # mesh axis name used for spatial decomposition


def make_mesh(n_devices: Optional[int] = None, axis: str = GRID_AXIS) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), (axis,))


def particle_sharding(mesh: Mesh) -> NamedSharding:
    """Particles are data-parallel along their leading dim."""
    return NamedSharding(mesh, P(GRID_AXIS))


def grid_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Grid fields decompose along the spatial x axis (GSPMD pads uneven
    face/dual extents automatically)."""
    return NamedSharding(mesh, P(GRID_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_state(state, mesh: Mesh):
    """Place a SimState for multi-device stepping: particles sharded,
    geometry (solid level set, rb table) replicated — it is read-only and
    small relative to HBM; sharding it would add halo traffic to every
    dual-lattice sample."""
    ps = particle_sharding(mesh)
    rep = replicated(mesh)
    particles = jax.tree.map(
        lambda a: jax.device_put(a, ps), state.particles
    )
    solid = jax.tree.map(lambda a: jax.device_put(a, rep), state.solid)
    return type(state)(
        particles=particles,
        solid=solid,
        t=jax.device_put(state.t, rep),
        step_idx=jax.device_put(state.step_idx, rep),
    )
