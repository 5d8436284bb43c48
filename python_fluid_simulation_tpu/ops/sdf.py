"""Analytic rigid-body signed-distance fields (3D): evaluate & project.

TPU-native replacement for the reference's ``solver/sdf3D.py`` (13 Numba-CUDA
device fns/kernels).  The rigid-body *table encoding* is kept bit-compatible
with the reference (sdf3D.py:294-327):

  rb: (B, 10, 4) float32
    row 0      : [type, p0, p1, p2]  type: 0/1 sphere(+flip), 2/3 box,
                 4/5 cylinder;  sphere p0=radius; box p0..p2=xyz scale;
                 cylinder p0=radius, p1=height
    rows 1:5   : 4x4 translation matrix T
    rows 5:9   : 4x4 rotation matrix R
    row 9      : [vx, vy, vz, 0] body velocity

but the math is branch-light vectorized jnp over (points × bodies) —
no per-point loops, no atomics.  Evaluation of all primitive types runs
unconditionally and is combined with ``jnp.where`` (cheap on the VPU; the
reference's per-thread ``if type`` chains, sdf3D.py:229-236, would be
divergent control flow on TPU).

Divergences from the reference (documented per SURVEY §7):
  * ``cylinder_eval``'s use of ``y_clip`` before assignment when the point
    is inside the slab (sdf3D.py:154-160) is fixed by initialising
    ``y_clip = clamp(y, -hh, hh)`` as ``cylinder_project`` (:182) does.
  * normalisation guards against |p - t| == 0 (reference would emit NaN).
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_FAR = 100.0  # reference seeds min-distance searches at 100 (sdf3D.py:228)


# ---------------------------------------------------------------------------
# Table construction (host side, mirrors sdf3D.generate_rb / transform_rb)
# ---------------------------------------------------------------------------

def _rotation_matrix(axis: Sequence[float], angle_deg: float) -> np.ndarray:
    """Rodrigues rotation; reference uses scipy Rotation (sdf3D.py:286-291)."""
    m = np.eye(4)
    if angle_deg:
        a = np.asarray(axis, dtype=np.float64)
        a = a / np.linalg.norm(a)
        t = math.radians(angle_deg)
        K = np.array(
            [[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]],
            dtype=np.float64,
        )
        m[:3, :3] = np.eye(3) + math.sin(t) * K + (1 - math.cos(t)) * (K @ K)
    return m


_TYPE_CODES = {"sphere": 0, "box": 2, "cylinder": 4}


def make_body(
    kind: str,
    params: Sequence[float],
    flip: bool = False,
    center: Sequence[float] = (0.0, 0.0, 0.0),
    axis: Sequence[float] = (0.0, 1.0, 0.0),
    angle: float = 0.0,
    velocity: Sequence[float] = (0.0, 0.0, 0.0),
) -> np.ndarray:
    """One (10,4) rigid-body block. Reference: generate_rb sdf3D.py:294-327."""
    if kind not in _TYPE_CODES:
        raise ValueError(f"unknown rigid body kind {kind!r}")
    rb = np.zeros((10, 4), dtype=np.float32)
    rb[0, 0] = _TYPE_CODES[kind] + (1 if flip else 0)
    p = list(params)
    rb[0, 1 : 1 + len(p)] = p
    t = np.eye(4)
    t[0:3, 3] = np.asarray(center)
    rb[1:5, :] = t
    rb[5:9, :] = _rotation_matrix(axis, angle)
    rb[9, :3] = np.asarray(velocity)
    return rb


class RigidBodySet:
    """Named collection of rigid bodies -> a single (B,10,4) device table.

    Mirrors the reference's (rb_d, rb_map) pair and its generate_rb /
    transform_rb / set_vel_rb host API (sdf3D.py:294-336).
    """

    def __init__(self):
        self._blocks: List[np.ndarray] = []
        self.name_to_index: Dict[str, int] = {}

    def add(self, name: str, kind: str, params, **kw) -> int:
        idx = len(self._blocks)
        self._blocks.append(make_body(kind, params, **kw))
        self.name_to_index[name] = idx
        return idx

    def transform(self, name_or_index, center=None, axis=None, angle=None):
        i = (
            self.name_to_index[name_or_index]
            if isinstance(name_or_index, str)
            else name_or_index
        )
        if center is not None:
            t = np.eye(4)
            t[0:3, 3] = np.asarray(center)
            self._blocks[i][1:5, :] = t
        if axis is not None and angle is not None:
            self._blocks[i][5:9, :] = _rotation_matrix(axis, angle)

    def set_velocity(self, name_or_index, vel):
        i = (
            self.name_to_index[name_or_index]
            if isinstance(name_or_index, str)
            else name_or_index
        )
        self._blocks[i][9, :3] = np.asarray(vel)

    def table(self, dtype=jnp.float32) -> jnp.ndarray:
        if not self._blocks:
            return jnp.zeros((0, 10, 4), dtype=dtype)
        return jnp.asarray(np.stack(self._blocks), dtype=dtype)


def advance_rigid_bodies(rb: jnp.ndarray, dt) -> jnp.ndarray:
    """Advance every body's translation by its velocity row: T += v·dt.

    The jit-compatible core of per-step body animation.  The reference
    exposes host-side ``transform_rb``/``set_vel_rb`` (sdf3D.py:329-336)
    but never drives them per step; here linear motion runs inside the
    jitted step (``SimConfig.moving_solid``), and arbitrary host-driven
    transforms remain available via `RigidBodySet.transform` between
    simulate() blocks (geometry is re-evaluated on re-entry)."""
    if rb.shape[0] == 0:
        return rb
    vel = rb[:, 9, 0:3]
    return rb.at[:, 1:4, 3].add(vel * dt)


# ---------------------------------------------------------------------------
# Decoding helpers
# ---------------------------------------------------------------------------

def _decode(rb: jnp.ndarray):
    """Split the packed table into (kind, flip, params, t, R, vel)."""
    type_code = rb[:, 0, 0]
    kind = jnp.floor_divide(type_code.astype(jnp.int32), 2)
    flip = jnp.mod(type_code.astype(jnp.int32), 2)
    params = rb[:, 0, 1:4]  # (B,3)
    t = rb[:, 1:5, :][:, 0:3, 3]  # (B,3)
    R = rb[:, 5:9, :][:, 0:3, 0:3]  # (B,3,3)
    vel = rb[:, 9, 0:3]  # (B,3)
    return kind, flip, params, t, R, vel


_HI = jax.lax.Precision.HIGHEST

# The 3x3 rigid transforms are written as explicit elementwise
# multiply-adds, NOT einsum/dot: a (K,3)x(3,3) contraction lowers to an
# MXU matmul using 3 of 128 lanes plus relayouts on both sides — at
# ~356k particles x 6 bodies x 2 transforms each, those tiny matmuls
# made the advect+project phase ~43 ms/step at 128^3-class (measured,
# benchmarks/phase_bench.py).  Elementwise VPU arithmetic fuses with the
# surrounding primitive math instead.


def _rot_cols(v, R):
    """R^T v (apply columns): out_i = sum_j v_j R[j, i]; v (..., 3)."""
    return jnp.stack(
        [
            v[..., 0] * R[0, i] + v[..., 1] * R[1, i] + v[..., 2] * R[2, i]
            for i in range(3)
        ],
        axis=-1,
    )


def _rot_rows(v, R):
    """R v (apply rows): out_i = sum_j R[i, j] v_j; v (..., 3)."""
    return jnp.stack(
        [
            v[..., 0] * R[i, 0] + v[..., 1] * R[i, 1] + v[..., 2] * R[i, 2]
            for i in range(3)
        ],
        axis=-1,
    )


def _to_local(points, t, R):
    """p_local = R^T (p - t) for all (point, body) pairs -> (P,B,3).

    Reference: inv_rigid + matvecmul4 (sdf3D.py:30-38,20-28).
    """
    rel = points[:, None, :] - t[None, :, :]  # (P,B,3)
    return jnp.stack(
        [
            rel[..., 0] * R[None, :, 0, i]
            + rel[..., 1] * R[None, :, 1, i]
            + rel[..., 2] * R[None, :, 2, i]
            for i in range(3)
        ],
        axis=-1,
    )


def _to_world(p_local, t, R):
    return (
        jnp.stack(
            [
                p_local[..., 0] * R[None, :, i, 0]
                + p_local[..., 1] * R[None, :, i, 1]
                + p_local[..., 2] * R[None, :, i, 2]
                for i in range(3)
            ],
            axis=-1,
        )
        + t[None, :, :]
    )


# ---------------------------------------------------------------------------
# Per-primitive signed distance (vectorized over P x B)
# ---------------------------------------------------------------------------

def _sphere_sd(points, t, params):
    rel = points[:, None, :] - t[None, :, :]
    dist = jnp.linalg.norm(rel, axis=-1)
    return dist - params[None, :, 0]


def _box_sd(p_local, params):
    half = params[None, :, :] * 0.5  # (1,B,3)
    d = jnp.abs(p_local) - half
    outside = jnp.linalg.norm(jnp.maximum(d, 0.0), axis=-1)
    max_d = jnp.max(d, axis=-1)
    return outside + jnp.minimum(max_d, 0.0)


def _cylinder_sd(p_local, params):
    r = params[None, :, 0]
    hh = params[None, :, 1] * 0.5
    y = p_local[..., 1]
    y_clip = jnp.clip(y, -hh, hh)
    above_below = jnp.abs(y) > hh
    sd_r = jnp.sqrt(p_local[..., 0] ** 2 + p_local[..., 2] ** 2) - r
    dy = jnp.abs(y_clip - y)
    inside_sd = jnp.maximum(sd_r, jnp.maximum(y - hh, -(y + hh)))
    sd_neg = jnp.where(above_below, dy, inside_sd)
    sd_pos = jnp.where(above_below, jnp.sqrt(sd_r**2 + dy**2), sd_r)
    return jnp.where(sd_r < 0, sd_neg, sd_pos)


def eval_per_body(rb: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Signed distance of every point to every body: (P, B)."""
    kind, flip, params, t, R, _ = _decode(rb)
    p_local = _to_local(points, t, R)
    sd_sphere = _sphere_sd(points, t, params)
    sd_box = _box_sd(p_local, params)
    sd_cyl = _cylinder_sd(p_local, params)
    sd = jnp.where(
        kind[None, :] == 0,
        sd_sphere,
        jnp.where(kind[None, :] == 1, sd_box, sd_cyl),
    )
    return jnp.where(flip[None, :] == 1, -sd, sd)


def evaluate(rb: jnp.ndarray, points: jnp.ndarray):
    """min-over-bodies SDF + velocity of the owning body where inside.

    Reference: evaluate_kernel (sdf3D.py:218-242): min_sd seeded at
    ``100``; velocity written only when min_sd <= 0 (zero elsewhere).

    Args:
      rb: (B,10,4) table;  points: (..., 3).
    Returns:
      sd: (...,), vel: (..., 3)
    """
    shape = points.shape[:-1]
    pts = points.reshape(-1, 3)
    if rb.shape[0] == 0:
        sd = jnp.full(pts.shape[0], _FAR, dtype=points.dtype)
        vel = jnp.zeros_like(pts)
        return sd.reshape(shape), vel.reshape(*shape, 3)
    _, _, _, _, _, bvel = _decode(rb)
    sd_all = eval_per_body(rb, pts)  # (P,B)
    min_sd = jnp.minimum(jnp.min(sd_all, axis=1), _FAR)
    owner = jnp.argmin(sd_all, axis=1)
    vel = jnp.where((min_sd <= 0)[:, None], bvel[owner], 0.0)
    return min_sd.reshape(shape), vel.reshape(*shape, 3).astype(points.dtype)


# ---------------------------------------------------------------------------
# Projection (push points out of solids), applied per body in table order
# ---------------------------------------------------------------------------

def _safe_normalize(v, axis=-1, eps=1e-12):
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(n, eps)


def _project_sphere(points, t_b, params_b, flip_b):
    rel = points - t_b[None, :]
    dist = jnp.linalg.norm(rel, axis=-1)
    sd = dist - params_b[0]
    sd = jnp.where(flip_b == 1, -sd, sd)
    surf = _safe_normalize(rel) * params_b[0] + t_b[None, :]
    return jnp.where((sd < 0)[:, None], surf, points)


def _project_box(points, t_b, R_b, params_b, flip_b):
    rel = points - t_b[None, :]
    p_local = _rot_cols(rel, R_b)  # R^T p
    half = params_b * 0.5
    clipped = jnp.clip(p_local, -half, half)
    # flipped container: clamp into the box (no-op when already inside);
    # reference box_project's `flipped and ~(in_out)` is truthy for any
    # in_out (sdf3D.py:123) so the clamp applies unconditionally.
    flipped_new = clipped
    # non-flipped: if strictly inside, push out through the nearest face.
    inside = jnp.all((p_local <= half) & (p_local >= -half), axis=-1)
    d_hi = half[None, :] - p_local  # distance to +faces
    d_lo = p_local + half[None, :]  # distance to -faces
    # interleave to match the reference's tie-break order
    # (0:+x,1:-x,2:+y,3:-y,4:+z,5:-z with strict < updates, sdf3D.py:132-141)
    six = jnp.stack(
        [d_hi[:, 0], d_lo[:, 0], d_hi[:, 1], d_lo[:, 1], d_hi[:, 2], d_lo[:, 2]],
        axis=-1,
    )
    idx = jnp.argmin(six, axis=-1)
    # six[argmin] == min: jnp.min avoids a per-row take_along_axis
    # gather (row-bound on TPU — 12.6 ms/step at 128^3, round-3 profile)
    dist = jnp.min(six, axis=-1)
    axis_i = idx // 2
    sign = jnp.where(idx % 2 == 0, 1.0, -1.0)
    delta = sign[:, None] * dist[:, None] * (
        jnp.arange(3)[None, :] == axis_i[:, None]
    )
    pushed = p_local + delta
    new_local = jnp.where(
        flip_b == 1, flipped_new, jnp.where(inside[:, None], pushed, p_local)
    )
    changed = (flip_b == 1) | inside
    new_world = _rot_rows(new_local, R_b) + t_b[None, :]
    return jnp.where(changed[:, None], new_world, points)


def _project_cylinder(points, t_b, R_b, params_b, flip_b):
    rel = points - t_b[None, :]
    p = _rot_cols(rel, R_b)
    r = params_b[0]
    hh = params_b[1] * 0.5
    y = p[:, 1]
    y_clip = jnp.clip(y, -hh, hh)
    radial = jnp.sqrt(p[:, 0] ** 2 + p[:, 2] ** 2)
    sd_r = radial - r
    at_cap = jnp.abs(y) >= hh  # |y_clip| == hh
    safe_radial = jnp.maximum(radial, 1e-12)
    side_x = p[:, 0] / safe_radial * r
    side_z = p[:, 2] / safe_radial * r
    # flipped: project outside-points onto the cylinder (sdf3D.py:188-199)
    out_flip = at_cap | (sd_r > 0)
    fx = jnp.where(out_flip & (sd_r >= 0), side_x, p[:, 0])
    fz = jnp.where(out_flip & (sd_r >= 0), side_z, p[:, 2])
    fy = jnp.where(out_flip, y_clip, y)
    flipped_new = jnp.stack([fx, fy, fz], axis=-1)
    # non-flipped: push inside-points to the nearest of side/top/bottom
    inside = (sd_r < 0) & ~at_cap
    cand = jnp.stack([sd_r, y - hh, -(y + hh)], axis=-1)
    which = jnp.argmax(cand, axis=-1)
    nx = jnp.where(which == 0, side_x, p[:, 0])
    nz = jnp.where(which == 0, side_z, p[:, 2])
    ny = jnp.where(which == 1, hh, jnp.where(which == 2, -hh, y))
    pushed = jnp.stack([nx, ny, nz], axis=-1)
    new_local = jnp.where(
        flip_b == 1, flipped_new, jnp.where(inside[:, None], pushed, p)
    )
    changed = (flip_b == 1) | inside
    new_world = _rot_rows(new_local, R_b) + t_b[None, :]
    return jnp.where(changed[:, None], new_world, points)


def project(rb: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Push points out of every solid, body by body in table order.

    Reference: project_kernel (sdf3D.py:245-260) — each body's projection
    is applied sequentially to the (possibly already-moved) position.
    B is a static table dimension, so the loop unrolls at trace time.
    """
    shape = points.shape
    pts = points.reshape(-1, 3)
    kind, flip, params, t, R, _ = _decode(rb)
    B = rb.shape[0]
    if B == 0:
        return points
    # Static dispatch when the table is concrete (host data): run only the
    # matching primitive per body.  Under jit the table is traced, so all
    # three primitives are evaluated and where-combined (branch-light VPU
    # work — the TPU analogue of the reference's per-thread type switch,
    # sdf3D.py:252-260).
    import numpy as _np

    try:
        codes = _np.asarray(rb[:, 0, 0])  # concrete if rb is host data
        static = True
    except Exception:  # traced table under jit
        static = False
    if static:
        for i in range(B):
            k = int(codes[i]) // 2
            if k == 0:
                pts = _project_sphere(pts, t[i], params[i], flip[i])
            elif k == 1:
                pts = _project_box(pts, t[i], R[i], params[i], flip[i])
            else:
                pts = _project_cylinder(pts, t[i], R[i], params[i], flip[i])
    else:
        for i in range(B):
            s = _project_sphere(pts, t[i], params[i], flip[i])
            b = _project_box(pts, t[i], R[i], params[i], flip[i])
            c = _project_cylinder(pts, t[i], R[i], params[i], flip[i])
            pts = jnp.where(
                kind[i] == 0, s, jnp.where(kind[i] == 1, b, c)
            )
    return pts.reshape(shape)
