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


def shard_state(state, mesh: Mesh, shard_grid: bool = True):
    """Place a SimState for multi-device stepping: particles sharded
    data-parallel along their leading dim; with ``shard_grid`` (default)
    the solid dual lattices (phi/v, the largest persistent fields — 513³
    per field at 256³) are slab-sharded along x so grid memory scales
    with the mesh.  The tiny rigid-body table stays replicated."""
    ps = particle_sharding(mesh)
    rep = replicated(mesh)
    particles = state.particles
    n = particles.x.shape[0]
    pad = (-n) % mesh.devices.size
    if pad:
        # zero-MASS padding particles are inert by engine convention
        # (every scatter gates on m > 0, ops/levelset.py); position them
        # on particle 0 so they stay in-domain as they advect along
        import jax.numpy as jnp

        particles = type(particles)(
            x=jnp.concatenate(
                [particles.x, jnp.broadcast_to(particles.x[:1], (pad,) + particles.x.shape[1:])]
            ),
            v=jnp.concatenate([particles.v, jnp.zeros((pad,) + particles.v.shape[1:], particles.v.dtype)]),
            c=jnp.concatenate([particles.c, jnp.zeros((pad,) + particles.c.shape[1:], particles.c.dtype)]),
            m=jnp.concatenate([particles.m, jnp.zeros((pad,), particles.m.dtype)]),
        )
    particles = jax.tree.map(lambda a: jax.device_put(a, ps), particles)
    n_dev = mesh.devices.size
    if shard_grid and state.solid.phi.shape[0] % n_dev == 0:
        solid = type(state.solid)(
            phi=jax.device_put(state.solid.phi, grid_sharding(mesh, state.solid.phi.ndim)),
            v=jax.device_put(state.solid.v, grid_sharding(mesh, state.solid.v.ndim)),
            rb=jax.device_put(state.solid.rb, rep),
        )
    else:
        # device_put rejects non-divisible slab shardings (the dual
        # lattice is (2N+1) — always odd); place replicated and let the
        # step's with_sharding_constraint annotations shard it under jit
        # (GSPMD pads uneven extents internally)
        solid = jax.tree.map(lambda a: jax.device_put(a, rep), state.solid)
    return type(state)(
        particles=particles,
        solid=solid,
        t=jax.device_put(state.t, rep),
        step_idx=jax.device_put(state.step_idx, rep),
    )
