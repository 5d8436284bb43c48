"""Near-solid boundary-condition velocity correction.

TPU-native replacement for notebook cell 5 (:279-441): within one cell of a
solid (``ndist = sphi/dx < 1``), assemble the full velocity at each face by
mass-weighted averaging of the transverse components, subtract the solid
velocity, and remove the inward normal component of the relative velocity
scaled by ``(1 - ndist)``:  dv_a = -min(0, v_rel · n) n_a / |n|^2 (1-ndist).

NaN semantics of the reference made explicit: when a transverse mass group
sums to zero the reference divides by zero, the NaN rides into
``min(0, nan)`` which numba resolves to 0 (first-argument semantics), so
``dv`` is effectively 0 there.  Here that is an explicit mask.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

from python_fluid_simulation_tpu.ops.indexing import (
    dual_sample,
    face_parity,
    interior_mask,
    sample,
    split_parity,
)


def boundary_dv_axis(
    axis: int,
    gv: Sequence[jnp.ndarray],
    gm: Sequence[jnp.ndarray],
    sphi: jnp.ndarray,
    sv: jnp.ndarray,
    dx: float,
    mass_floor: float = 0.0,
) -> jnp.ndarray:
    """dv for one face grid. Reference: boundary_condition_{x,y,z}."""
    d = len(gv)
    shape = gv[axis].shape
    parity = face_parity(axis, d)

    def sph(off):
        return dual_sample(sphi, parity, off, shape, fill=1e9)

    def svc(comp):
        src = sv[comp] if isinstance(sv, (list, tuple)) else sv[..., comp]
        return dual_sample(src, parity, (0,) * d, shape, fill=0.0)

    ndist = sph((0,) * d) / dx

    # relative velocity at the face site
    v_rel = [None] * d
    mass_ok = jnp.ones(shape, dtype=bool)
    v_rel[axis] = gv[axis] - svc(axis)
    for t in range(d):
        if t == axis:
            continue
        vm_sum = jnp.zeros(shape, dtype=gv[axis].dtype)
        m_sum = jnp.zeros(shape, dtype=gv[axis].dtype)
        for ja in (0, 1):
            for jt in (0, 1):
                off = [0] * d
                off[axis] = -ja
                off[t] = jt
                vt = sample(gv[t], tuple(off), shape, 0.0)
                mt = sample(gm[t], tuple(off), shape, 0.0)
                vm_sum = vm_sum + vt * mt
                m_sum = m_sum + mt
        mass_ok = mass_ok & (m_sum > 0)
        # relative floor (see transfers.p2g_all mass_floor): a transverse
        # group below ~1e-7 particle masses is numerically empty; the
        # exact tiny division amplifies fp32 summation noise unboundedly
        v_avg = vm_sum / jnp.maximum(m_sum, max(mass_floor, 1e-30))
        v_rel[t] = v_avg - svc(t)

    # solid normal: central difference of sphi in each direction (cell 5)
    sn = []
    for k in range(d):
        op = [0] * d
        om = [0] * d
        op[k] = 1
        om[k] = -1
        sn.append(sph(tuple(op)) - sph(tuple(om)))
    sn_sq = sum(s * s for s in sn)
    sn_inv = 1.0 / jnp.maximum(sn_sq, 1e-30)

    dot = sum(sn[k] * v_rel[k] for k in range(d))
    gv_sn = jnp.minimum(0.0, dot) * sn[axis] * sn_inv
    dv = -gv_sn * (1.0 - ndist)

    active = interior_mask(shape) & (ndist < 1.0) & mass_ok
    return jnp.where(active, dv, 0.0)


def apply_boundary_condition(
    gv: Sequence[jnp.ndarray],
    gm: Sequence[jnp.ndarray],
    sphi: jnp.ndarray,
    sv: jnp.ndarray,
    dx: float,
    mass_floor: float = 0.0,
) -> Tuple[jnp.ndarray, ...]:
    """Returns the corrected face velocities (g.v += g.dv, cell 5 :436-441)."""
    d = len(gv)
    sphi_c = split_parity(sphi, d)
    sv_c = (
        list(sv) if isinstance(sv, (list, tuple))
        else [split_parity(sv[..., comp], d) for comp in range(d)]
    )
    out = []
    for a in range(d):
        dv = boundary_dv_axis(a, gv, gm, sphi_c, sv_c, dx, mass_floor)
        out.append(gv[a] + dv)
    return tuple(out)
