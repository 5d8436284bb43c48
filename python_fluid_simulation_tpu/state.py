"""Simulation state pytrees.

The reference keeps state in ``easydict`` dicts of CuPy arrays (notebook
cell 10 :705-775).  Here state is a NamedTuple pytree flowing through one
pure jitted ``step``; grid fields (mass/velocity faces) are *transient* —
rebuilt from particles by P2G every step — so only particle state, the
solid level set and the rigid-body table persist.

dtype policy: fp32 throughout (TPU-native; the reference uses f64 solver
buffers over f32 grid state — SURVEY §7 design stance).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from python_fluid_simulation_tpu.config import SimConfig
from python_fluid_simulation_tpu.ops import sdf as sdf3d
from python_fluid_simulation_tpu.ops.indexing import grid_positions


class Particles(NamedTuple):
    """APIC particle set (reference cell 10 :705-714).

    c[:, a, :] is the affine row for velocity component a (the reference's
    cx/cy/cz arrays).
    """

    x: jnp.ndarray  # (N, d) positions
    v: jnp.ndarray  # (N, d) velocities
    c: jnp.ndarray  # (N, d, d) APIC affine rows
    m: jnp.ndarray  # (N,) masses


class SolidState(NamedTuple):
    """Solid level set on the dual lattice + rigid-body table.

    Reference: solid_levelset dict (cell 10 :747-756) + rb_d table.
    phi/v are re-evaluated from `rb` when bodies move (the reference
    evaluates once at scene build, cell 10 :791).
    """

    phi: jnp.ndarray  # (2N+1)^d
    v: jnp.ndarray  # (2N+1)^d + (d,)
    rb: jnp.ndarray  # (B, 10, 4)


class SimState(NamedTuple):
    particles: Particles
    solid: SolidState
    t: jnp.ndarray  # scalar f32 simulated time
    step_idx: jnp.ndarray  # scalar i32
    # viscosity preconditioner hysteresis flag (0 = Jacobi, 1 = MG) for
    # SolverConfig.viscosity_precond='auto': high-mu scenes flip regime
    # when the fluid pools (Jacobi-PCG iteration counts explode past the
    # cap while the MG block preconditioner stays ~flat); the previous
    # step's iteration count drives the switch.  Plain 0 default keeps
    # old construction sites valid; the engine coerces to i32.
    visc_mg: jnp.ndarray | int = 0


def make_solid_state(cfg: SimConfig, rbs: "sdf3d.RigidBodySet") -> SolidState:
    """Evaluate the rigid-body SDF onto the dual lattice (cell 10 :791)."""
    g = cfg.grid
    dual_res = g.dual_res
    pos = grid_positions(
        dual_res, g.bound_min, g.dual_cell_size, (0.0,) * len(dual_res)
    )
    rb = rbs.table()
    phi, vel = sdf3d.evaluate(rb, pos)
    return SolidState(phi=phi, v=vel, rb=rb)


def seed_particle_box(
    center,
    size,
    dx: float,
    rb_table=None,
    jitter: float = 0.3,
    seed: int = 0,
) -> np.ndarray:
    """Jittered particle block, filtered to outside solids.

    Reference: add_box + oob_filter (cell 10 :662-699): grid of spacing dx,
    solid filter BEFORE jitter, then gaussian jitter of dx*jitter.
    """
    center = np.asarray(center, dtype=np.float32)
    size = np.asarray(size, dtype=np.float32)
    dim = center.shape[0]
    box_min = center - 0.5 * size
    grid_dim = (size / dx).astype(np.int64)
    axes = [np.arange(n) for n in grid_dim]
    idx = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).astype(
        np.float32
    )
    pos = box_min + size * ((idx + 0.5) / grid_dim)
    pos = pos.reshape(-1, dim)
    if rb_table is not None and rb_table.shape[0] > 0:
        sd, _ = sdf3d.evaluate(jnp.asarray(rb_table), jnp.asarray(pos))
        pos = pos[np.asarray(sd) >= 0]
    rng = np.random.default_rng(seed)
    pos = pos + rng.standard_normal(pos.shape).astype(np.float32) * dx * jitter
    return pos


def make_particles(positions: np.ndarray, rho: float, pdx: float) -> Particles:
    n, d = positions.shape
    return Particles(
        x=jnp.asarray(positions, dtype=jnp.float32),
        v=jnp.zeros((n, d), dtype=jnp.float32),
        c=jnp.zeros((n, d, d), dtype=jnp.float32),
        m=jnp.full((n,), rho * pdx**d, dtype=jnp.float32),
    )


def face_shapes(gres) -> Tuple[Tuple[int, ...], ...]:
    d = len(gres)
    return tuple(
        tuple(n + (1 if i == a else 0) for i, n in enumerate(gres))
        for a in range(d)
    )
