"""Independent loop-based oracles for the solver formula layer.

Each oracle re-implements the reference kernel's documented math with
plain Python loops over a tiny random grid — an implementation style as
far as possible from the vectorised parity/shift code under test
(SURVEY §4: unit tests for every field op against tiny NumPy oracles).
"""

import numpy as np
import jax.numpy as jnp

from python_fluid_simulation_tpu.ops.fractions import compute_solid_frac_3d
from python_fluid_simulation_tpu.solvers.pressure import (
    apply_pressure_3d,
    pressure_matvec_3d,
    pressure_rhs_3d,
)
from python_fluid_simulation_tpu.solvers.viscosity import (
    viscosity_matvec_3d,
    viscosity_rhs_3d,
)

N = (5, 6, 5)
DUAL = tuple(2 * k + 1 for k in N)
H = (0.1, 0.1, 0.1)


def _rand(seed):
    rng = np.random.default_rng(seed)
    sphi = rng.standard_normal(DUAL).astype(np.float32)
    sv = rng.standard_normal(DUAL + (3,)).astype(np.float32)
    lphi = rng.standard_normal(N).astype(np.float32)
    shapes = [
        tuple(n + (1 if i == a else 0) for i, n in enumerate(N))
        for a in range(3)
    ]
    v = [rng.standard_normal(s).astype(np.float32) for s in shapes]
    return sphi, sv, lphi, v, shapes, rng


def _clip_frac(phi, nphi):
    diff = phi - nphi
    f = phi / diff if diff != 0 else phi
    return min(1.0, max(0.01, f))


def test_pressure_rhs_oracle():
    sphi, sv, lphi, v, shapes, _ = _rand(0)
    w = [np.asarray(x) for x in compute_solid_frac_3d(jnp.asarray(sphi))]
    got = np.asarray(
        pressure_rhs_3d(
            [jnp.asarray(x) for x in v], jnp.asarray(sv), jnp.asarray(lphi),
            [jnp.asarray(x) for x in w], H,
        )
    )
    # loop oracle per initialize_solver_kernel (PressureCGSolver3D.py:6-50)
    want = np.zeros(N, np.float32)
    for x in range(1, N[0] - 1):
        for y in range(1, N[1] - 1):
            for z in range(1, N[2] - 1):
                if lphi[x, y, z] >= 0:
                    continue
                b = 0.0
                b += w[0][x + 1, y, z] * v[0][x + 1, y, z] / H[0]
                if w[0][x + 1, y, z] < 1:
                    b -= w[0][x + 1, y, z] * sv[2 * x + 2, 2 * y + 1, 2 * z + 1, 0] / H[0]
                b -= w[0][x, y, z] * v[0][x, y, z] / H[0]
                if w[0][x, y, z] < 1:
                    b += w[0][x, y, z] * sv[2 * x, 2 * y + 1, 2 * z + 1, 0] / H[0]
                b += w[1][x, y + 1, z] * v[1][x, y + 1, z] / H[1]
                if w[1][x, y + 1, z] < 1:
                    b -= w[1][x, y + 1, z] * sv[2 * x + 1, 2 * y + 2, 2 * z + 1, 1] / H[1]
                b -= w[1][x, y, z] * v[1][x, y, z] / H[1]
                if w[1][x, y, z] < 1:
                    b += w[1][x, y, z] * sv[2 * x + 1, 2 * y, 2 * z + 1, 1] / H[1]
                b += w[2][x, y, z + 1] * v[2][x, y, z + 1] / H[2]
                if w[2][x, y, z + 1] < 1:
                    b -= w[2][x, y, z + 1] * sv[2 * x + 1, 2 * y + 1, 2 * z + 2, 2] / H[2]
                b -= w[2][x, y, z] * v[2][x, y, z] / H[2]
                if w[2][x, y, z] < 1:
                    b += w[2][x, y, z] * sv[2 * x + 1, 2 * y + 1, 2 * z, 2] / H[2]
                want[x, y, z] = b
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pressure_matvec_oracle():
    sphi, sv, lphi, v, shapes, rng = _rand(1)
    w = [np.asarray(x) for x in compute_solid_frac_3d(jnp.asarray(sphi))]
    p = rng.standard_normal(N).astype(np.float32)
    got = np.asarray(
        pressure_matvec_3d(
            jnp.asarray(p), [jnp.asarray(x) for x in w], jnp.asarray(lphi)
        )
    )
    want = np.zeros(N, np.float32)
    for x in range(1, N[0] - 1):
        for y in range(1, N[1] - 1):
            for z in range(1, N[2] - 1):
                phi = lphi[x, y, z]
                if phi >= 0:
                    continue
                val, diag = 0.0, 0.0
                nbrs = [
                    ((x + 1, y, z), w[0][x + 1, y, z]),
                    ((x - 1, y, z), w[0][x, y, z]),
                    ((x, y + 1, z), w[1][x, y + 1, z]),
                    ((x, y - 1, z), w[1][x, y, z]),
                    ((x, y, z + 1), w[2][x, y, z + 1]),
                    ((x, y, z - 1), w[2][x, y, z]),
                ]
                for (i, j, k), ww in nbrs:
                    nphi = lphi[i, j, k]
                    if nphi < 0:
                        val -= ww * p[i, j, k]
                        diag += ww
                    else:
                        diag += ww / _clip_frac(phi, nphi)
                want[x, y, z] = val + diag * p[x, y, z]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def _edge_frac(l, r):
    li, ri = l < 0, r < 0
    if li and ri:
        return 1.0
    if not li and not ri:
        return 0.0
    diff = -abs(l - r)
    return (l if li else r) / diff


def test_apply_pressure_oracle():
    sphi, sv, lphi, v, shapes, rng = _rand(2)
    w = [np.asarray(x) for x in compute_solid_frac_3d(jnp.asarray(sphi))]
    p = rng.standard_normal(N).astype(np.float32)
    got = apply_pressure_3d(
        [jnp.asarray(x) for x in v], jnp.asarray(p),
        [jnp.asarray(x) for x in w], jnp.asarray(sv), jnp.asarray(lphi), H,
    )
    want = [x.copy() for x in v]
    # x-faces (apply_pressure_kernel :139-143); ranges x in [1, N-1]
    for x in range(1, N[0]):
        for y in range(1, N[1]):
            for z in range(1, N[2]):
                if x <= N[0] - 1 and y <= N[1] - 1 and z <= N[2] - 1:
                    if lphi[x, y, z] < 0 or lphi[x - 1, y, z] < 0:
                        th = min(1, max(0.01, _edge_frac(lphi[x, y, z], lphi[x - 1, y, z])))
                        nv = v[0][x, y, z] + (p[x, y, z] - p[x - 1, y, z]) * H[0] / th
                        want[0][x, y, z] = (
                            w[0][x, y, z] * nv
                            + (1 - w[0][x, y, z]) * sv[2 * x, 2 * y + 1, 2 * z + 1, 0]
                        )
                    if lphi[x, y, z] < 0 or lphi[x, y - 1, z] < 0:
                        th = min(1, max(0.01, _edge_frac(lphi[x, y, z], lphi[x, y - 1, z])))
                        nv = v[1][x, y, z] + (p[x, y, z] - p[x, y - 1, z]) * H[1] / th
                        want[1][x, y, z] = (
                            w[1][x, y, z] * nv
                            + (1 - w[1][x, y, z]) * sv[2 * x + 1, 2 * y, 2 * z + 1, 1]
                        )
                    if lphi[x, y, z] < 0 or lphi[x, y, z - 1] < 0:
                        th = min(1, max(0.01, _edge_frac(lphi[x, y, z], lphi[x, y, z - 1])))
                        nv = v[2][x, y, z] + (p[x, y, z] - p[x, y, z - 1]) * H[2] / th
                        want[2][x, y, z] = (
                            w[2][x, y, z] * nv
                            + (1 - w[2][x, y, z]) * sv[2 * x + 1, 2 * y + 1, 2 * z, 2]
                        )
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(got[a]), want[a], rtol=1e-4, atol=1e-4
        )


def test_viscosity_matvec_x_oracle():
    """Loop transcription of matvecmul_x_kernel (ViscosityCGSolver3D.py
    :248-316) vs the term-table implementation."""
    sphi, sv, lphi, v, shapes, rng = _rand(3)
    vol = rng.random(DUAL).astype(np.float32)
    s_mu = 0.23
    got = viscosity_matvec_3d(
        tuple(jnp.asarray(x) for x in v), s_mu, jnp.asarray(sphi),
        jnp.asarray(vol),
    )[0]
    vx, vy, vz = v
    want = np.zeros(shapes[0], np.float32)
    for x in range(1, shapes[0][0] - 1):
        for y in range(1, shapes[0][1] - 1):
            for z in range(1, shapes[0][2] - 1):
                if sphi[2 * x, 2 * y + 1, 2 * z + 1] < 0:
                    continue
                vc = vol[2 * x, 2 * y + 1, 2 * z + 1]
                vr = vol[2 * x + 1, 2 * y + 1, 2 * z + 1]
                vl = vol[2 * x - 1, 2 * y + 1, 2 * z + 1]
                vt = vol[2 * x, 2 * y + 2, 2 * z + 1]
                vb = vol[2 * x, 2 * y, 2 * z + 1]
                vf = vol[2 * x, 2 * y + 1, 2 * z + 2]
                vk = vol[2 * x, 2 * y + 1, 2 * z]
                diag = vc + s_mu * (2 * vr + 2 * vl + vt + vb + vf + vk)
                val = diag * vx[x, y, z]
                S = sphi
                if S[2 * x + 2, 2 * y + 1, 2 * z + 1] >= 0:
                    val -= 2 * s_mu * vr * vx[x + 1, y, z]
                if S[2 * x - 2, 2 * y + 1, 2 * z + 1] >= 0:
                    val -= 2 * s_mu * vl * vx[x - 1, y, z]
                if S[2 * x, 2 * y + 3, 2 * z + 1] >= 0:
                    val -= s_mu * vt * vx[x, y + 1, z]
                if S[2 * x, 2 * y - 1, 2 * z + 1] >= 0:
                    val -= s_mu * vb * vx[x, y - 1, z]
                if S[2 * x, 2 * y + 1, 2 * z + 3] >= 0:
                    val -= s_mu * vf * vx[x, y, z + 1]
                if S[2 * x, 2 * y + 1, 2 * z - 1] >= 0:
                    val -= s_mu * vk * vx[x, y, z - 1]
                if S[2 * x + 1, 2 * y + 2, 2 * z + 1] >= 0:
                    val -= s_mu * vt * vy[x, y + 1, z]
                if S[2 * x - 1, 2 * y + 2, 2 * z + 1] >= 0:
                    val += s_mu * vt * vy[x - 1, y + 1, z]
                if S[2 * x + 1, 2 * y, 2 * z + 1] >= 0:
                    val += s_mu * vb * vy[x, y, z]
                if S[2 * x - 1, 2 * y, 2 * z + 1] >= 0:
                    val -= s_mu * vb * vy[x - 1, y, z]
                if S[2 * x + 1, 2 * y + 1, 2 * z + 2] >= 0:
                    val -= s_mu * vf * vz[x, y, z + 1]
                if S[2 * x - 1, 2 * y + 1, 2 * z + 2] >= 0:
                    val += s_mu * vf * vz[x - 1, y, z + 1]
                if S[2 * x + 1, 2 * y + 1, 2 * z] >= 0:
                    val += s_mu * vk * vz[x, y, z]
                if S[2 * x - 1, 2 * y + 1, 2 * z] >= 0:
                    val -= s_mu * vk * vz[x - 1, y, z]
                want[x, y, z] = val
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_viscosity_rhs_y_oracle():
    """Loop transcription of initialize_solver_y_kernel
    (ViscosityCGSolver3D.py:111-177)."""
    sphi, sv, lphi, v, shapes, rng = _rand(4)
    vol = rng.random(DUAL).astype(np.float32)
    s_mu = 0.4
    got = viscosity_rhs_3d(
        tuple(jnp.asarray(x) for x in v), s_mu, jnp.asarray(sphi),
        jnp.asarray(vol),
    )[1]
    vx, vy, vz = v
    want = np.zeros(shapes[1], np.float32)
    for x in range(1, shapes[1][0] - 1):
        for y in range(1, shapes[1][1] - 1):
            for z in range(1, shapes[1][2] - 1):
                S = sphi
                if S[2 * x + 1, 2 * y, 2 * z + 1] < 0:
                    continue
                vc = vol[2 * x + 1, 2 * y, 2 * z + 1]
                vr = vol[2 * x + 2, 2 * y, 2 * z + 1]
                vl = vol[2 * x, 2 * y, 2 * z + 1]
                vt = vol[2 * x + 1, 2 * y + 1, 2 * z + 1]
                vb = vol[2 * x + 1, 2 * y - 1, 2 * z + 1]
                vf = vol[2 * x + 1, 2 * y, 2 * z + 2]
                vk = vol[2 * x + 1, 2 * y, 2 * z]
                b = vc * vy[x, y, z]
                if S[2 * x + 3, 2 * y, 2 * z + 1] < 0:
                    b += s_mu * vr * vy[x + 1, y, z]
                if S[2 * x - 1, 2 * y, 2 * z + 1] < 0:
                    b += s_mu * vl * vy[x - 1, y, z]
                if S[2 * x + 1, 2 * y + 2, 2 * z + 1] < 0:
                    b += 2 * s_mu * vt * vy[x, y + 1, z]
                if S[2 * x + 1, 2 * y - 2, 2 * z + 1] < 0:
                    b += 2 * s_mu * vb * vy[x, y - 1, z]
                if S[2 * x + 1, 2 * y, 2 * z + 3] < 0:
                    b += s_mu * vf * vy[x, y, z + 1]
                if S[2 * x + 1, 2 * y, 2 * z - 1] < 0:
                    b += s_mu * vk * vy[x, y, z - 1]
                if S[2 * x + 2, 2 * y + 1, 2 * z + 1] < 0:
                    b += s_mu * vr * vx[x + 1, y, z]
                if S[2 * x + 2, 2 * y - 1, 2 * z + 1] < 0:
                    b -= s_mu * vr * vx[x + 1, y - 1, z]
                if S[2 * x, 2 * y + 1, 2 * z + 1] < 0:
                    b -= s_mu * vl * vx[x, y, z]
                if S[2 * x, 2 * y - 1, 2 * z + 1] < 0:
                    b += s_mu * vl * vx[x, y - 1, z]
                if S[2 * x + 1, 2 * y + 1, 2 * z + 2] < 0:
                    b += s_mu * vf * vz[x, y, z + 1]
                if S[2 * x + 1, 2 * y - 1, 2 * z + 2] < 0:
                    b -= s_mu * vf * vz[x, y - 1, z + 1]
                if S[2 * x + 1, 2 * y + 1, 2 * z] < 0:
                    b -= s_mu * vk * vz[x, y, z]
                if S[2 * x + 1, 2 * y - 1, 2 * z] < 0:
                    b += s_mu * vk * vz[x, y - 1, z]
                want[x, y, z] = b
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)
