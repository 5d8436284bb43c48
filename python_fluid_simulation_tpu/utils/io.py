"""Artifact IO: particle-position series + surface export.

Reference counterparts: the per-snapshot particle series pickled at run
end (cell 13 :4665-4670, one snapshot every int(1/DT/20) steps with the
k3d [x,z,y] axis shuffle) and k3d marching-cubes visualisation of the
solid SDF (cell 10 :785-795).
"""

from __future__ import annotations

import pickle
from typing import Dict, Optional

import numpy as np


class ParticleSeries:
    """Snapshot store matching the reference's pickle layout:
    {time: positions[N,3] float32 in [x,z,y] order}."""

    def __init__(self, k3d_axis_order: bool = True):
        self._order = [0, 2, 1] if k3d_axis_order else [0, 1, 2]
        self.series: Dict[float, np.ndarray] = {}

    def snapshot(self, t: float, positions) -> None:
        pos = np.asarray(positions, dtype=np.float32)
        if pos.shape[-1] == len(self._order):
            pos = pos[:, self._order]
        self.series[float(t)] = pos

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            pickle.dump(self.series, f)

    @staticmethod
    def load(path: str) -> "ParticleSeries":
        out = ParticleSeries()
        with open(path, "rb") as f:
            out.series = pickle.load(f)
        return out


def snapshot_interval(dt: float, per_second: int = 20) -> int:
    """Reference: int(1/DT/20) steps between snapshots (cell 13 :4665)."""
    return max(1, int(1.0 / dt / per_second))


def export_levelset_obj(
    phi: np.ndarray,
    path: str,
    level: float = 0.0,
    origin=(0.0, 0.0, 0.0),
    spacing=(1.0, 1.0, 1.0),
) -> int:
    """Triangulate the `level` isosurface of a 3D scalar field to OBJ.

    The reference renders with k3d.marching_cubes in-notebook (cell 10
    :785-795); this produces an equivalent offline artifact.  Uses the
    native C++ marching-cubes extension when built, else a NumPy
    fallback.  Returns the triangle count.
    """
    verts, tris = triangulate_levelset(phi, level, origin, spacing)
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for t in tris:
            f.write(f"f {t[0]+1} {t[1]+1} {t[2]+1}\n")
    return len(tris)


def triangulate_levelset(
    phi: np.ndarray,
    level: float = 0.0,
    origin=(0.0, 0.0, 0.0),
    spacing=(1.0, 1.0, 1.0),
):
    """(verts (V,3) f32 in world units, tris (T,3) int) of the `level`
    isosurface — native C++ marching cubes when built, NumPy fallback."""
    phi = np.ascontiguousarray(np.asarray(phi, dtype=np.float32))
    try:
        from python_fluid_simulation_tpu.native import marching_cubes as mc

        verts, tris = mc.run(phi, level)
    except Exception:
        verts, tris = _marching_cubes_numpy(phi, level)
    verts = np.asarray(verts, np.float32) * np.asarray(
        spacing, np.float32
    ) + np.asarray(origin, np.float32)
    return verts, np.asarray(tris)


def _marching_cubes_numpy(phi: np.ndarray, level: float):
    """Minimal tetrahedra-based surface extraction (fallback).

    Splits each cube into 6 tetrahedra and emits triangles where the
    level set crosses — simple, robust, vectorisation-light (the C++
    extension is the fast path).
    """
    verts = []
    tris = []
    nx, ny, nz = phi.shape
    TETS = [
        (0, 5, 1, 6), (0, 1, 2, 6), (0, 2, 3, 6),
        (0, 3, 7, 6), (0, 7, 4, 6), (0, 4, 5, 6),
    ]
    CORNERS = [
        (0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
        (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1),
    ]
    # only visit cubes whose value range straddles the level
    f = phi - level
    sign = f > 0
    import itertools as it

    straddle = np.zeros((nx - 1, ny - 1, nz - 1), bool)
    all_pos = np.ones_like(straddle)
    all_neg = np.ones_like(straddle)
    for dx, dy, dz in CORNERS:
        s = sign[dx : nx - 1 + dx, dy : ny - 1 + dy, dz : nz - 1 + dz]
        all_pos &= s
        all_neg &= ~s
    straddle = ~(all_pos | all_neg)
    for x, y, z in zip(*np.nonzero(straddle)):
        corner_pos = [
            np.array([x + c[0], y + c[1], z + c[2]], np.float32)
            for c in CORNERS
        ]
        corner_val = [f[x + c[0], y + c[1], z + c[2]] for c in CORNERS]
        for tet in TETS:
            vals = [corner_val[i] for i in tet]
            pos = [corner_pos[i] for i in tet]
            inside = [v < 0 for v in vals]
            n_in = sum(inside)
            if n_in == 0 or n_in == 4:
                continue
            ins = [i for i in range(4) if inside[i]]
            outs = [i for i in range(4) if not inside[i]]

            def ip(i, j):
                a, b = vals[i], vals[j]
                t = a / (a - b) if a != b else 0.5
                return pos[i] + t * (pos[j] - pos[i])

            base = len(verts)
            if n_in == 1:
                i = ins[0]
                pts = [ip(i, j) for j in outs]
                verts.extend(pts)
                tris.append((base, base + 1, base + 2))
            elif n_in == 3:
                i = outs[0]
                pts = [ip(j, i) for j in ins]
                verts.extend(pts)
                tris.append((base, base + 1, base + 2))
            else:  # 2 in, 2 out -> quad
                i0, i1 = ins
                o0, o1 = outs
                pts = [ip(i0, o0), ip(i0, o1), ip(i1, o1), ip(i1, o0)]
                verts.extend(pts)
                tris.append((base, base + 1, base + 2))
                tris.append((base, base + 2, base + 3))
    if not verts:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    return np.asarray(verts, np.float32), np.asarray(tris, np.int32)
