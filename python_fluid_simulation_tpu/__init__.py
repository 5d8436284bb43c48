"""python_fluid_simulation_tpu — a TPU-native viscous free-surface fluid engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
SSTDV-Project/python-fluid-simulation (GRAPP 2024, "Data-driven Viscosity
Solver for Fluid Simulation"): an APIC liquid simulator on a staggered MAC
grid with analytic rigid-body SDFs, implicit density/position projection,
variational cut-cell pressure projection, variational implicit viscosity,
and a learned (3D U-Net) viscosity operator.

Design stance (TPU-first, not a port):
  * one pure ``step(state) -> state`` compiled into a single XLA program
    (reference: ~80 CUDA kernel launches + 2 host syncs per CG iteration);
  * all three CG solves run fully on device under ``lax.while_loop``;
  * scatters (P2G, level set, fluid volume) are XLA ``.at[].add/min`` —
    deterministic, unlike the reference's CUDA atomics;
  * dual-lattice (2N+1)^3 sampling is expressed through 8 parity-class
    views + static shifts, which XLA fuses into single stencil loops;
  * multi-device scaling via ``jax.sharding.Mesh`` + GSPMD / ``shard_map``
    with ICI halo exchange (the reference is single-GPU only).
"""

__version__ = "0.1.0"

from python_fluid_simulation_tpu.config import (  # noqa: F401
    GridConfig2D,
    GridConfig3D,
    PhysicsConfig,
    SolverConfig,
    SimConfig,
)
