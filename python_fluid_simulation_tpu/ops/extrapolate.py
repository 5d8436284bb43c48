"""Jacobi layer-peel velocity extrapolation.

TPU-native replacement for notebook cell 7 (:501-611) and the viscosity
solver's private copy (ViscosityCGSolver3D.py:8-39): invalid sites take the
mean of their valid axis neighbours; validity grows one layer per
iteration; boundary sites are never updated.

Divergence from the reference (documented, SURVEY §7 tracked list): the
reference launches the vz pass with the vx block shape (cell 7 :567,
ViscosityCGSolver3D.py:494), leaving the last interior z-plane of vz
untouched.  Here every axis is extrapolated over its full interior.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from python_fluid_simulation_tpu.ops.indexing import interior_mask, shift


def extrapolate(
    v: jnp.ndarray, valid: jnp.ndarray, num_iter: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One field; `valid` is boolean.  Returns (v, valid) after num_iter."""
    interior = interior_mask(v.shape)
    dirs = []
    for axis in range(v.ndim):
        for s in (+1, -1):
            off = [0] * v.ndim
            off[axis] = s
            dirs.append(tuple(off))
    for _ in range(num_iter):
        vf = jnp.where(valid, v, 0.0)
        nb_sum = None
        nb_cnt = None
        for off in dirs:
            sv = shift(vf, off, 0.0)
            sc = shift(valid.astype(v.dtype), off, 0.0)
            nb_sum = sv if nb_sum is None else nb_sum + sv
            nb_cnt = sc if nb_cnt is None else nb_cnt + sc
        upd = (~valid) & (nb_cnt > 0) & interior
        v = jnp.where(upd, nb_sum / jnp.maximum(nb_cnt, 1.0), v)
        valid = valid | upd
    return v, valid


def extrapolate_velocities(vs, valids, num_iter: int):
    """Extrapolate each face-velocity field with its own validity mask.

    Reference: extrapolate() loop (cell 7 :535-567) with valid = mass > 0,
    and ViscosityCGSolver3D.extrapolate (:472-502) with valid = sphi >= 0.
    """
    out_v, out_valid = [], []
    for v, m in zip(vs, valids):
        nv, nval = extrapolate(v, m, num_iter)
        out_v.append(nv)
        out_valid.append(nval)
    return tuple(out_v), tuple(out_valid)
