"""Analytic rigid-body signed-distance fields, 2D.

TPU-native replacement for ``solver/sdf2D.py`` (11 Numba-CUDA device
fns/kernels): circle ("sphere") and box primitives with 3x3 rigid
transforms.  Table encoding matches the reference (sdf2D.py:221-252):

  rb: (B, 8, 3) float32
    row 0    : [type, p0, p1]  (0/1 sphere(+flip) radius; 2/3 box w,h)
    rows 1:4 : 3x3 translation matrix
    rows 4:7 : 3x3 rotation matrix
    row 7    : [vx, vy, 0] body velocity

Reference quirk preserved: sphere_project pins a particle exactly at the
center of a flipped circle to (cx + r, cy) (sdf2D.py:71-75).
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_FAR = 100.0
_HI = jax.lax.Precision.HIGHEST

_TYPE_CODES = {"sphere": 0, "box": 2}


def make_body_2d(
    kind: str,
    params: Sequence[float],
    flip: bool = False,
    center: Sequence[float] = (0.0, 0.0),
    angle: float = 0.0,
    velocity: Sequence[float] = (0.0, 0.0),
) -> np.ndarray:
    if kind not in _TYPE_CODES:
        raise ValueError(f"unknown 2D rigid body kind {kind!r}")
    rb = np.zeros((8, 3), dtype=np.float32)
    rb[0, 0] = _TYPE_CODES[kind] + (1 if flip else 0)
    p = list(params)
    rb[0, 1 : 1 + len(p)] = p
    t = np.eye(3)
    t[0:2, 2] = np.asarray(center)
    rb[1:4, :] = t
    r = np.eye(3)
    if angle:
        th = math.radians(angle)
        r[:2, :2] = [[math.cos(th), -math.sin(th)],
                     [math.sin(th), math.cos(th)]]
    rb[4:7, :] = r
    rb[7, :2] = np.asarray(velocity)
    return rb


class RigidBodySet2D:
    def __init__(self):
        self._blocks: List[np.ndarray] = []
        self.name_to_index: Dict[str, int] = {}

    def add(self, name: str, kind: str, params, **kw) -> int:
        idx = len(self._blocks)
        self._blocks.append(make_body_2d(kind, params, **kw))
        self.name_to_index[name] = idx
        return idx

    def set_velocity(self, name_or_index, vel):
        i = (
            self.name_to_index[name_or_index]
            if isinstance(name_or_index, str)
            else name_or_index
        )
        self._blocks[i][7, :2] = np.asarray(vel)

    def table(self, dtype=jnp.float32) -> jnp.ndarray:
        if not self._blocks:
            return jnp.zeros((0, 8, 3), dtype=dtype)
        return jnp.asarray(np.stack(self._blocks), dtype=dtype)


def _decode(rb):
    type_code = rb[:, 0, 0]
    kind = jnp.floor_divide(type_code.astype(jnp.int32), 2)
    flip = jnp.mod(type_code.astype(jnp.int32), 2)
    params = rb[:, 0, 1:3]
    t = rb[:, 1:4, :][:, 0:2, 2]
    R = rb[:, 4:7, :][:, 0:2, 0:2]
    vel = rb[:, 7, 0:2]
    return kind, flip, params, t, R, vel


def eval_per_body_2d(rb, points):
    kind, flip, params, t, R, _ = _decode(rb)
    rel = points[:, None, :] - t[None, :, :]
    p_local = jnp.einsum("bji,pbj->pbi", R, rel, precision=_HI)
    dist = jnp.linalg.norm(rel, axis=-1)
    sd_sphere = dist - params[None, :, 0]
    half = params[None, :, :] * 0.5
    dbox = jnp.abs(p_local) - half
    outside = jnp.linalg.norm(jnp.maximum(dbox, 0.0), axis=-1)
    sd_box = outside + jnp.minimum(jnp.max(dbox, axis=-1), 0.0)
    sd = jnp.where(kind[None, :] == 0, sd_sphere, sd_box)
    return jnp.where(flip[None, :] == 1, -sd, sd)


def evaluate_2d(rb, points):
    """min-over-bodies SDF + owner velocity (sdf2D.evaluate_kernel)."""
    shape = points.shape[:-1]
    pts = points.reshape(-1, 2)
    if rb.shape[0] == 0:
        sd = jnp.full(pts.shape[0], _FAR, dtype=points.dtype)
        return sd.reshape(shape), jnp.zeros_like(pts).reshape(*shape, 2)
    _, _, _, _, _, bvel = _decode(rb)
    sd_all = eval_per_body_2d(rb, pts)
    min_sd = jnp.minimum(jnp.min(sd_all, axis=1), _FAR)
    owner = jnp.argmin(sd_all, axis=1)
    vel = jnp.where((min_sd <= 0)[:, None], bvel[owner], 0.0)
    return min_sd.reshape(shape), vel.reshape(*shape, 2).astype(points.dtype)


def _project_sphere_2d(points, t_b, params_b, flip_b):
    rel = points - t_b[None, :]
    dist = jnp.linalg.norm(rel, axis=-1)
    # degenerate center: flipped circle pins to (cx + r, cy) (:71-75)
    at_center = dist <= 1e-4
    r = params_b[0]
    nrm = rel / jnp.maximum(dist, 1e-12)[:, None]
    surf = nrm * r + t_b[None, :]
    pinned = jnp.stack(
        [jnp.full(points.shape[0], t_b[0] + r), jnp.full(points.shape[0], t_b[1])],
        axis=-1,
    )
    sd = dist - r
    sd = jnp.where(flip_b == 1, -sd, sd)
    moved = jnp.where(
        at_center[:, None],
        jnp.where(flip_b == 1, pinned, points),
        jnp.where((sd < 0)[:, None], surf, points),
    )
    return moved


def _project_box_2d(points, t_b, R_b, params_b, flip_b):
    rel = points - t_b[None, :]
    p = jnp.einsum("pi,ij->pj", rel, R_b, precision=_HI)
    half = params_b * 0.5
    clipped = jnp.clip(p, -half, half)
    inside = jnp.all((p <= half) & (p >= -half), axis=-1)
    d_hi = half[None, :] - p
    d_lo = p + half[None, :]
    four = jnp.stack([d_hi[:, 0], d_lo[:, 0], d_hi[:, 1], d_lo[:, 1]], axis=-1)
    idx = jnp.argmin(four, axis=-1)
    # four[argmin] == min: avoids a row-bound take_along_axis gather
    dist = jnp.min(four, axis=-1)
    axis_i = idx // 2
    sign = jnp.where(idx % 2 == 0, 1.0, -1.0)
    delta = sign[:, None] * dist[:, None] * (
        jnp.arange(2)[None, :] == axis_i[:, None]
    )
    pushed = p + delta
    new_local = jnp.where(
        flip_b == 1, clipped, jnp.where(inside[:, None], pushed, p)
    )
    changed = (flip_b == 1) | inside
    new_world = (
        jnp.einsum("pj,ij->pi", new_local, R_b, precision=_HI) + t_b[None, :]
    )
    return jnp.where(changed[:, None], new_world, points)


def project_2d(rb, points):
    shape = points.shape
    pts = points.reshape(-1, 2)
    kind, flip, params, t, R, _ = _decode(rb)
    B = rb.shape[0]
    if B == 0:
        return points
    try:
        codes = np.asarray(rb[:, 0, 0])
        static = True
    except Exception:
        static = False
    if static:
        for i in range(B):
            if int(codes[i]) // 2 == 0:
                pts = _project_sphere_2d(pts, t[i], params[i], flip[i])
            else:
                pts = _project_box_2d(pts, t[i], R[i], params[i], flip[i])
    else:
        for i in range(B):
            s = _project_sphere_2d(pts, t[i], params[i], flip[i])
            b = _project_box_2d(pts, t[i], R[i], params[i], flip[i])
            pts = jnp.where(kind[i] == 0, s, b)
    return pts.reshape(shape)
