"""Pin the two SURVEY §7 tracked quirks left open by VERDICT r3 (weak #5).

1. BC index mixing (cell 5 :315 ``giz = z + iy`` in the x-kernel, :346
   ``gix = x + iz`` in the y-kernel, :406 ``giy = y + ix`` in the
   z-kernel).  The mixed loop variable still pairs with the other loop
   variable, so the sampled set is the full {0,1}x{0,1} cross product —
   the literal reference indexing and the clean unmixed indexing visit
   the SAME four faces per transverse group.  The quirk is cosmetic
   (misleading variable names), not behavioural; `ops/boundary.py`
   implements the clean form.  `test_bc_index_mixing_is_neutral` proves
   the equivalence by transliterating the reference kernels mixed-index-
   for-mixed-index and comparing against the clean oracle.

2. Anisotropic pressure cell_size (cell 10 :778): the notebook passes the
   SCALAR ``GDX`` as PressureCGSolver3D's ``bound_size``, so the
   reference's pressure solve runs with cell_size = GDX/GRES =
   (2.6e-4, 1.56e-4, 2.6e-4) — unintended anisotropic h that scales the
   y-flux terms of the RHS by GRES_y/GRES_x and the y apply by its
   inverse.  Because the matvec is h-free, the projection only matches
   the uniform-h variational projection when h is uniform; at the
   buckling GRES=[48,80,48] it genuinely differs.  This build passes the
   true uniform cell_size (bound_size/res) — documented divergence #7 in
   docs/PARITY.md; `test_pressure_anisotropic_h_quirk` pins both facts.
"""

import numpy as np
import pytest

from tests import oracle3d


def _min0(a):
    # numba device min(0, nan) resolves to the first argument; python's
    # builtin min has the same first-wins NaN semantics
    return min(0.0, a)


def _bc_mixed_reference(gvs, gms, sphi, sv, dx):
    """Literal transliteration of cell 5's three kernels, INCLUDING the
    index mixing, NaN division semantics and all."""
    gvx, gvy, gvz = [g.astype(np.float64) for g in gvs]
    gmx, gmy, gmz = [g.astype(np.float64) for g in gms]
    out = [gvx.copy(), gvy.copy(), gvz.copy()]

    # -- boundary_condition_x (cell 5 :281-324)
    sh = gvx.shape
    for x in range(1, sh[0] - 1):
        for y in range(1, sh[1] - 1):
            for z in range(1, sh[2] - 1):
                ndist = sphi[2 * x, 2 * y + 1, 2 * z + 1] / dx
                if ndist >= 1:
                    continue
                vx = gvx[x, y, z]
                vy = vz = 0.0
                my = mz = 0.0
                for ix in range(2):
                    for iy in range(2):
                        gix = x - ix
                        giy = y + iy
                        giz = z + iy  # the :315 quirk
                        my += gmy[gix, giy, z]
                        vy += gvy[gix, giy, z] * gmy[gix, giy, z]
                        mz += gmz[gix, y, giz]
                        vz += gvz[gix, y, giz] * gmz[gix, y, giz]
                with np.errstate(invalid="ignore", divide="ignore"):
                    vy = vy / my
                    vz = vz / mz
                vx -= sv[2 * x, 2 * y + 1, 2 * z + 1, 0]
                vy -= sv[2 * x, 2 * y + 1, 2 * z + 1, 1]
                vz -= sv[2 * x, 2 * y + 1, 2 * z + 1, 2]
                snx = sphi[2 * x + 1, 2 * y + 1, 2 * z + 1] - sphi[2 * x - 1, 2 * y + 1, 2 * z + 1]
                sny = sphi[2 * x, 2 * y + 2, 2 * z + 1] - sphi[2 * x, 2 * y, 2 * z + 1]
                snz = sphi[2 * x, 2 * y + 1, 2 * z + 2] - sphi[2 * x, 2 * y + 1, 2 * z]
                sn_inv = 1.0 / (snx**2 + sny**2 + snz**2)
                gvx_sn = _min0(snx * vx + sny * vy + snz * vz) * snx * sn_inv
                out[0][x, y, z] += -gvx_sn * (1.0 - ndist)

    # -- boundary_condition_y (cell 5 :326-369)
    sh = gvy.shape
    for x in range(1, sh[0] - 1):
        for y in range(1, sh[1] - 1):
            for z in range(1, sh[2] - 1):
                ndist = sphi[2 * x + 1, 2 * y, 2 * z + 1] / dx
                if ndist >= 1:
                    continue
                vy = gvy[x, y, z]
                vx = vz = 0.0
                mx = mz = 0.0
                for iy in range(2):
                    for iz in range(2):
                        gix = x + iz  # the :346 quirk
                        giy = y - iy
                        giz = z + iz
                        mx += gmx[gix, giy, z]
                        vx += gvx[gix, giy, z] * gmx[gix, giy, z]
                        mz += gmz[x, giy, giz]
                        vz += gvz[x, giy, giz] * gmz[x, giy, giz]
                with np.errstate(invalid="ignore", divide="ignore"):
                    vx = vx / mx
                    vz = vz / mz
                vx -= sv[2 * x + 1, 2 * y, 2 * z + 1, 0]
                vy -= sv[2 * x + 1, 2 * y, 2 * z + 1, 1]
                vz -= sv[2 * x + 1, 2 * y, 2 * z + 1, 2]
                snx = sphi[2 * x + 2, 2 * y, 2 * z + 1] - sphi[2 * x, 2 * y, 2 * z + 1]
                sny = sphi[2 * x + 1, 2 * y + 1, 2 * z + 1] - sphi[2 * x + 1, 2 * y - 1, 2 * z + 1]
                snz = sphi[2 * x + 1, 2 * y, 2 * z + 2] - sphi[2 * x + 1, 2 * y, 2 * z]
                sn_inv = 1.0 / (snx**2 + sny**2 + snz**2)
                gvy_sn = _min0(snx * vx + sny * vy + snz * vz) * sny * sn_inv
                out[1][x, y, z] += -gvy_sn * (1.0 - ndist)

    # -- boundary_condition_z (cell 5 :371-417)
    sh = gvz.shape
    for x in range(1, sh[0] - 1):
        for y in range(1, sh[1] - 1):
            for z in range(1, sh[2] - 1):
                ndist = sphi[2 * x + 1, 2 * y + 1, 2 * z] / dx
                if ndist >= 1:
                    continue
                vz = gvz[x, y, z]
                vx = vy = 0.0
                mx = my = 0.0
                for iz in range(2):
                    for ix in range(2):
                        gix = x + ix
                        giy = y + ix  # the :406 quirk
                        giz = z - iz
                        mx += gmx[gix, y, giz]
                        vx += gvx[gix, y, giz] * gmx[gix, y, giz]
                        my += gmy[x, giy, giz]
                        vy += gvy[x, giy, giz] * gmy[x, giy, giz]
                with np.errstate(invalid="ignore", divide="ignore"):
                    vx = vx / mx
                    vy = vy / my
                vx -= sv[2 * x + 1, 2 * y + 1, 2 * z, 0]
                vy -= sv[2 * x + 1, 2 * y + 1, 2 * z, 1]
                vz -= sv[2 * x + 1, 2 * y + 1, 2 * z, 2]
                snx = sphi[2 * x + 2, 2 * y + 1, 2 * z] - sphi[2 * x, 2 * y + 1, 2 * z]
                sny = sphi[2 * x + 1, 2 * y + 2, 2 * z] - sphi[2 * x + 1, 2 * y, 2 * z]
                snz = sphi[2 * x + 1, 2 * y + 1, 2 * z + 1] - sphi[2 * x + 1, 2 * y + 1, 2 * z - 1]
                sn_inv = 1.0 / (snx**2 + sny**2 + snz**2)
                gvz_sn = _min0(snx * vx + sny * vy + snz * vz) * snz * sn_inv
                out[2][x, y, z] += -gvz_sn * (1.0 - ndist)

    return out


def _random_bc_inputs(res, seed=0):
    rng = np.random.default_rng(seed)
    nx, ny, nz = res
    dual = (2 * nx + 1, 2 * ny + 1, 2 * nz + 1)
    dx = 0.1
    # smooth-ish solid SDF with values straddling [0, dx) so a mix of
    # faces is active, and non-degenerate gradients
    sphi = rng.uniform(-0.2 * dx, 1.8 * dx, size=dual)
    sv = rng.normal(size=dual + (3,)) * 0.3
    fshapes = [
        (nx + (a == 0), ny + (a == 1), nz + (a == 2)) for a in range(3)
    ]
    gvs = [rng.normal(size=s) for s in fshapes]
    # masses with zeros sprinkled in to exercise the NaN branch
    gms = [rng.uniform(0, 1, size=s) * (rng.uniform(size=s) > 0.3)
           for s in fshapes]
    return gvs, gms, sphi, sv, dx


def test_bc_index_mixing_is_neutral():
    gvs, gms, sphi, sv, dx = _random_bc_inputs((5, 7, 6))
    mixed = _bc_mixed_reference(gvs, gms, sphi, sv, dx)
    clean = oracle3d.boundary_condition(gvs, gms, sphi, sv, dx)
    for a in range(3):
        np.testing.assert_allclose(
            mixed[a], clean[a], rtol=0, atol=1e-12,
            err_msg=f"axis {a}: mixed-index reference != clean indexing",
        )


def test_bc_clean_impl_matches_mixed_reference():
    """The production jax op == the literal mixed-index reference kernels
    (fp32 vs f64 tolerance)."""
    import jax.numpy as jnp

    from python_fluid_simulation_tpu.ops.boundary import (
        apply_boundary_condition,
    )

    gvs, gms, sphi, sv, dx = _random_bc_inputs((5, 6, 5), seed=3)
    mixed = _bc_mixed_reference(gvs, gms, sphi, sv, dx)
    got = apply_boundary_condition(
        [jnp.asarray(g, jnp.float32) for g in gvs],
        [jnp.asarray(m, jnp.float32) for m in gms],
        jnp.asarray(sphi, jnp.float32),
        jnp.asarray(sv, jnp.float32),
        dx,
    )
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(got[a]), mixed[a], rtol=2e-4, atol=2e-4
        )


def test_pressure_anisotropic_h_quirk():
    """Documented divergence #7: the engine's pressure solve uses the
    true uniform cell_size; the reference's accidental GDX/GRES
    anisotropic h produces a genuinely different system at GRES with
    unequal extents (the buckling scene is [48, 80, 48])."""
    import jax.numpy as jnp

    from python_fluid_simulation_tpu.config import GridConfig3D
    from python_fluid_simulation_tpu.solvers.pressure import (
        pressure_rhs_3d,
    )

    # 1. the config derives a UNIFORM cell_size from bound_size/res
    g = GridConfig3D(
        bound_min=(0.0, 0.0, 0.0), bound_size=(0.6, 1.0, 0.6), dx=0.1
    )
    assert g.res == (6, 10, 6)
    assert np.allclose(g.cell_size, 0.1), g.cell_size

    # 2. the reference's accident: cell_size = GDX / GRES per axis
    rng = np.random.default_rng(7)
    res = (6, 10, 6)
    dual = tuple(2 * n + 1 for n in res)
    lphi = rng.normal(size=res).astype(np.float32)
    sv = np.zeros(dual + (3,), np.float32)
    fshapes = [tuple(n + (i == a) for i, n in enumerate(res))
               for a in range(3)]
    v_faces = [jnp.asarray(rng.normal(size=s), jnp.float32)
               for s in fshapes]
    w_faces = [jnp.asarray(rng.uniform(0.5, 1.0, size=s), jnp.float32)
               for s in fshapes]
    gdx = 0.1
    uniform = pressure_rhs_3d(
        v_faces, jnp.asarray(sv), jnp.asarray(lphi), w_faces,
        (gdx, gdx, gdx),
    )
    aniso = pressure_rhs_3d(
        v_faces, jnp.asarray(sv), jnp.asarray(lphi), w_faces,
        tuple(gdx / n for n in res),
    )
    # the anisotropic system is NOT a scalar multiple of the uniform one
    # when extents differ (y-terms scale by n_y, x/z by n_x): normalise
    # by the x-axis factor and check the fields still differ
    rescaled = np.asarray(aniso) / res[0]
    assert not np.allclose(
        rescaled, np.asarray(uniform), rtol=1e-3, atol=1e-6
    ), "anisotropic-h RHS unexpectedly matched the uniform-h RHS"


def test_pressure_uniform_h_is_h_invariant():
    """Why uniform h is the right pin: the *velocity update* of the full
    projection is invariant to the uniform h value (RHS 1/h cancels
    apply h through the linear solve), so any uniform h gives the
    reference's intended projection — only ANISOTROPY changes it."""
    import jax.numpy as jnp

    from python_fluid_simulation_tpu.solvers.pressure import (
        pressure_solve_3d,
    )

    rng = np.random.default_rng(11)
    res = (6, 8, 6)
    dual = tuple(2 * n + 1 for n in res)
    # fluid blob in the middle
    lphi = np.full(res, 1.0, np.float32)
    lphi[2:4, 2:6, 2:4] = -1.0
    sv = np.zeros(dual + (3,), np.float32)
    fshapes = [tuple(n + (i == a) for i, n in enumerate(res))
               for a in range(3)]
    v_faces = tuple(
        jnp.asarray(rng.normal(size=s), jnp.float32) for s in fshapes
    )
    w_faces = [jnp.ones(s, jnp.float32) for s in fshapes]

    outs = []
    for h in (0.05, 0.2):
        r = pressure_solve_3d(
            v_faces, jnp.asarray(sv), jnp.asarray(lphi), w_faces,
            (h, h, h), tol=1e-10, rel_tol=1e-7, max_iter=500,
        )
        outs.append([np.asarray(v) for v in r.v_faces])
    for a in range(3):
        np.testing.assert_allclose(
            outs[0][a], outs[1][a], rtol=5e-3, atol=5e-5
        )
