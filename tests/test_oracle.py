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


def test_viscosity_matvec_y_oracle():
    """Loop transcription of matvecmul_y_kernel (ViscosityCGSolver3D.py
    :318-386)."""
    sphi, sv, lphi, v, shapes, rng = _rand(5)
    vol = rng.random(DUAL).astype(np.float32)
    s_mu = 0.31
    got = viscosity_matvec_3d(
        tuple(jnp.asarray(x) for x in v), s_mu, jnp.asarray(sphi),
        jnp.asarray(vol),
    )[1]
    vx, vy, vz = v
    want = np.zeros(shapes[1], np.float32)
    S = sphi
    for x in range(1, shapes[1][0] - 1):
        for y in range(1, shapes[1][1] - 1):
            for z in range(1, shapes[1][2] - 1):
                if S[2 * x + 1, 2 * y, 2 * z + 1] < 0:
                    continue
                vc = vol[2 * x + 1, 2 * y, 2 * z + 1]
                vt = vol[2 * x + 1, 2 * y + 1, 2 * z + 1]
                vb = vol[2 * x + 1, 2 * y - 1, 2 * z + 1]
                vr = vol[2 * x + 2, 2 * y, 2 * z + 1]
                vl = vol[2 * x, 2 * y, 2 * z + 1]
                vf = vol[2 * x + 1, 2 * y, 2 * z + 2]
                vk = vol[2 * x + 1, 2 * y, 2 * z]
                diag = vc + s_mu * (2 * vt + 2 * vb + vr + vl + vf + vk)
                val = diag * vy[x, y, z]
                if S[2 * x + 1, 2 * y + 2, 2 * z + 1] >= 0:
                    val -= 2 * s_mu * vt * vy[x, y + 1, z]
                if S[2 * x + 1, 2 * y - 2, 2 * z + 1] >= 0:
                    val -= 2 * s_mu * vb * vy[x, y - 1, z]
                if S[2 * x + 3, 2 * y, 2 * z + 1] >= 0:
                    val -= s_mu * vr * vy[x + 1, y, z]
                if S[2 * x - 1, 2 * y, 2 * z + 1] >= 0:
                    val -= s_mu * vl * vy[x - 1, y, z]
                if S[2 * x + 1, 2 * y, 2 * z + 3] >= 0:
                    val -= s_mu * vf * vy[x, y, z + 1]
                if S[2 * x + 1, 2 * y, 2 * z - 1] >= 0:
                    val -= s_mu * vk * vy[x, y, z - 1]
                if S[2 * x + 2, 2 * y + 1, 2 * z + 1] >= 0:
                    val -= s_mu * vr * vx[x + 1, y, z]
                if S[2 * x + 2, 2 * y - 1, 2 * z + 1] >= 0:
                    val += s_mu * vr * vx[x + 1, y - 1, z]
                if S[2 * x, 2 * y + 1, 2 * z + 1] >= 0:
                    val += s_mu * vl * vx[x, y, z]
                if S[2 * x, 2 * y - 1, 2 * z + 1] >= 0:
                    val -= s_mu * vl * vx[x, y - 1, z]
                if S[2 * x + 1, 2 * y + 1, 2 * z + 2] >= 0:
                    val -= s_mu * vf * vz[x, y, z + 1]
                if S[2 * x + 1, 2 * y - 1, 2 * z + 2] >= 0:
                    val += s_mu * vf * vz[x, y - 1, z + 1]
                if S[2 * x + 1, 2 * y + 1, 2 * z] >= 0:
                    val += s_mu * vk * vz[x, y, z]
                if S[2 * x + 1, 2 * y - 1, 2 * z] >= 0:
                    val -= s_mu * vk * vz[x, y - 1, z]
                want[x, y, z] = val
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_viscosity_matvec_z_oracle():
    """Loop transcription of matvecmul_z_kernel (ViscosityCGSolver3D.py
    :388-456) — completes the per-axis oracle matrix."""
    sphi, sv, lphi, v, shapes, rng = _rand(6)
    vol = rng.random(DUAL).astype(np.float32)
    s_mu = 0.17
    got = viscosity_matvec_3d(
        tuple(jnp.asarray(x) for x in v), s_mu, jnp.asarray(sphi),
        jnp.asarray(vol),
    )[2]
    vx, vy, vz = v
    want = np.zeros(shapes[2], np.float32)
    S = sphi
    for x in range(1, shapes[2][0] - 1):
        for y in range(1, shapes[2][1] - 1):
            for z in range(1, shapes[2][2] - 1):
                if S[2 * x + 1, 2 * y + 1, 2 * z] < 0:
                    continue
                vc = vol[2 * x + 1, 2 * y + 1, 2 * z]
                vf = vol[2 * x + 1, 2 * y + 1, 2 * z + 1]
                vk = vol[2 * x + 1, 2 * y + 1, 2 * z - 1]
                vr = vol[2 * x + 2, 2 * y + 1, 2 * z]
                vl = vol[2 * x, 2 * y + 1, 2 * z]
                vt = vol[2 * x + 1, 2 * y + 2, 2 * z]
                vb = vol[2 * x + 1, 2 * y, 2 * z]
                diag = vc + s_mu * (2 * vf + 2 * vk + vr + vl + vt + vb)
                val = diag * vz[x, y, z]
                if S[2 * x + 1, 2 * y + 1, 2 * z + 2] >= 0:
                    val -= 2 * s_mu * vf * vz[x, y, z + 1]
                if S[2 * x + 1, 2 * y + 1, 2 * z - 2] >= 0:
                    val -= 2 * s_mu * vk * vz[x, y, z - 1]
                if S[2 * x + 3, 2 * y + 1, 2 * z] >= 0:
                    val -= s_mu * vr * vz[x + 1, y, z]
                if S[2 * x - 1, 2 * y + 1, 2 * z] >= 0:
                    val -= s_mu * vl * vz[x - 1, y, z]
                if S[2 * x + 1, 2 * y + 3, 2 * z] >= 0:
                    val -= s_mu * vt * vz[x, y + 1, z]
                if S[2 * x + 1, 2 * y - 1, 2 * z] >= 0:
                    val -= s_mu * vb * vz[x, y - 1, z]
                if S[2 * x + 2, 2 * y + 1, 2 * z + 1] >= 0:
                    val -= s_mu * vr * vx[x + 1, y, z]
                if S[2 * x + 2, 2 * y + 1, 2 * z - 1] >= 0:
                    val += s_mu * vr * vx[x + 1, y, z - 1]
                if S[2 * x, 2 * y + 1, 2 * z + 1] >= 0:
                    val += s_mu * vl * vx[x, y, z]
                if S[2 * x, 2 * y + 1, 2 * z - 1] >= 0:
                    val -= s_mu * vl * vx[x, y, z - 1]
                if S[2 * x + 1, 2 * y + 2, 2 * z + 1] >= 0:
                    val -= s_mu * vt * vy[x, y + 1, z]
                if S[2 * x + 1, 2 * y + 2, 2 * z - 1] >= 0:
                    val += s_mu * vt * vy[x, y + 1, z - 1]
                if S[2 * x + 1, 2 * y, 2 * z + 1] >= 0:
                    val += s_mu * vb * vy[x, y, z]
                if S[2 * x + 1, 2 * y, 2 * z - 1] >= 0:
                    val -= s_mu * vb * vy[x, y, z - 1]
                want[x, y, z] = val
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_density_matvec_oracle():
    """Loop transcription of the density matvecmul_kernel
    (DensityCGSolver3D.py:117-194): unit-weight diagonal, -w off-diagonal;
    both the fixed -z face weight (default) and the reference's wz bug
    (reads wz[x,y,z+1] for the -z face, :184)."""
    from python_fluid_simulation_tpu.solvers.density import density_matvec

    sphi, sv, lphi, v, shapes, rng = _rand(7)
    w = [np.asarray(x) for x in compute_solid_frac_3d(jnp.asarray(sphi))]
    p = rng.standard_normal(N).astype(np.float32)
    for wz_bug in (False, True):
        got = np.asarray(
            density_matvec(
                jnp.asarray(p), [jnp.asarray(x) for x in w],
                jnp.asarray(lphi), wz_bug=wz_bug,
            )
        )
        want = np.zeros(N, np.float32)
        for x in range(1, N[0] - 1):
            for y in range(1, N[1] - 1):
                for z in range(1, N[2] - 1):
                    phi = lphi[x, y, z]
                    if phi >= 0:
                        continue
                    wz_minus = w[2][x, y, z + 1] if wz_bug else w[2][x, y, z]
                    nbrs = [
                        ((x + 1, y, z), w[0][x + 1, y, z]),
                        ((x - 1, y, z), w[0][x, y, z]),
                        ((x, y + 1, z), w[1][x, y + 1, z]),
                        ((x, y - 1, z), w[1][x, y, z]),
                        ((x, y, z + 1), w[2][x, y, z + 1]),
                        ((x, y, z - 1), wz_minus),
                    ]
                    val, diag = 0.0, 0.0
                    for nbr, ww in nbrs:
                        nphi = lphi[nbr]
                        if nphi < 0:
                            val -= ww * p[nbr]
                            diag += 1.0
                        else:
                            diag += 1.0 / _clip_frac(phi, nphi)
                    want[x, y, z] = val + diag * p[x, y, z]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_density_fix_volume_rhs_displacement_oracle():
    """The density pipeline kernels vs their oracle3d transliterations
    (fix_volume_kernel :38-84, initialize_solver_kernel :86-115,
    compute_displacement_kernel :196-209, apply_displacement :211-238)."""
    import oracle3d

    from python_fluid_simulation_tpu.ops.indexing import split_parity
    from python_fluid_simulation_tpu.solvers.density import (
        apply_displacement,
        compute_displacement,
        density_rhs,
        fix_volume,
    )

    rng = np.random.default_rng(8)
    sphi = rng.standard_normal(DUAL).astype(np.float32)
    lphi = rng.standard_normal(N).astype(np.float32)
    gvol = (rng.random(N) * 1e-3).astype(np.float32)
    gm = (rng.random(N) * 1e-2).astype(np.float32)
    w = [np.asarray(x) for x in compute_solid_frac_3d(jnp.asarray(sphi))]
    sphi_c = split_parity(jnp.asarray(sphi), 3)

    got_fix = np.asarray(
        fix_volume(
            jnp.asarray(gvol), sphi_c, jnp.asarray(lphi),
            [jnp.asarray(x) for x in w], H,
        )
    )
    want_fix = oracle3d.fix_volume(
        gvol.astype(np.float64), sphi.astype(np.float64),
        lphi.astype(np.float64), [x.astype(np.float64) for x in w], H,
    )
    np.testing.assert_allclose(got_fix, want_fix, rtol=1e-4, atol=1e-6)

    dt = 1.0 / 60
    got_rhs = np.asarray(
        density_rhs(
            1000.0, dt, jnp.asarray(gm), jnp.asarray(got_fix),
            jnp.asarray(lphi), [jnp.asarray(x) for x in w], H,
        )
    )
    want_rhs = oracle3d.density_rhs(
        1000.0, dt, gm.astype(np.float64), want_fix,
        lphi.astype(np.float64), [x.astype(np.float64) for x in w], H,
    )
    np.testing.assert_allclose(got_rhs, want_rhs, rtol=1e-3, atol=1e-4)

    p = rng.standard_normal(N).astype(np.float32)
    fshapes = [
        tuple(n + (1 if i == a else 0) for i, n in enumerate(N))
        for a in range(3)
    ]
    got_disp = [
        np.asarray(d)
        for d in compute_displacement(jnp.asarray(p), jnp.asarray(lphi), dt, H, fshapes)
    ]
    want_disp = oracle3d.displacement(
        p.astype(np.float64), lphi.astype(np.float64), dt, H
    )
    for a in range(3):
        np.testing.assert_allclose(
            got_disp[a], want_disp[a], rtol=1e-4, atol=1e-5
        )

    px = (rng.random((40, 3)) * np.array([0.45, 0.55, 0.45]) + 0.02).astype(
        np.float32
    )
    got_px = np.asarray(
        apply_displacement(
            jnp.asarray(px), [jnp.asarray(d) for d in got_disp],
            (0.0, 0.0, 0.0), H,
        )
    )
    want_px = oracle3d.apply_displacement(
        px.astype(np.float64), want_disp, (0.0, 0.0, 0.0), H
    )
    np.testing.assert_allclose(got_px, want_px, rtol=1e-4, atol=1e-5)
