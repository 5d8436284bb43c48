"""Density/position projection: operator symmetry (with the wz bug fixed),
scatter conservation, compression relief."""

import numpy as np
import jax.numpy as jnp

from python_fluid_simulation_tpu.ops.fractions import compute_solid_frac_3d
from python_fluid_simulation_tpu.solvers.density import (
    apply_displacement,
    compute_displacement,
    density_matvec,
    density_solve_3d,
    scatter_mass_volume,
)

N = (8, 8, 8)
H = (0.125, 0.125, 0.125)
BMIN = (0.0, 0.0, 0.0)


def test_scatter_mass_conserved():
    rng = np.random.default_rng(0)
    px = jnp.asarray(0.2 + 0.6 * rng.random((150, 3)), jnp.float32)
    pm = jnp.asarray(rng.random(150) + 0.5, jnp.float32)
    gm, gvol = scatter_mass_volume(px, pm, 0.001, N, BMIN, H)
    np.testing.assert_allclose(float(gm.sum()), float(pm.sum()), rtol=1e-5)
    np.testing.assert_allclose(float(gvol.sum()), 150 * 0.001, rtol=1e-5)


def _geometry(seed=1):
    rng = np.random.default_rng(seed)
    dual = tuple(2 * k + 1 for k in N)
    sphi = jnp.asarray(rng.standard_normal(dual).astype(np.float32))
    lphi_np = rng.standard_normal(N).astype(np.float32)
    return sphi, jnp.asarray(lphi_np)


def test_matvec_symmetry_fixed_wz():
    sphi, lphi = _geometry()
    w = compute_solid_frac_3d(sphi)
    rng = np.random.default_rng(2)
    # symmetry holds on the operator's domain: interior fluid cells (CG
    # iterates vanish on boundary cells, so couplings to them never act)
    mask = (np.asarray(lphi) < 0).astype(np.float32)
    mask[0, :, :] = mask[-1, :, :] = 0
    mask[:, 0, :] = mask[:, -1, :] = 0
    mask[:, :, 0] = mask[:, :, -1] = 0
    x = jnp.asarray(rng.standard_normal(N).astype(np.float32) * mask)
    y = jnp.asarray(rng.standard_normal(N).astype(np.float32) * mask)
    ax = density_matvec(x, w, lphi, wz_bug=False)
    ay = density_matvec(y, w, lphi, wz_bug=False)
    lhs = float(jnp.vdot(ax, y))
    rhs = float(jnp.vdot(x, ay))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-3, atol=1e-4)


def test_wz_bug_flag_changes_matvec():
    sphi, lphi = _geometry(3)
    w = compute_solid_frac_3d(sphi)
    x = jnp.asarray(
        np.random.default_rng(4).standard_normal(N).astype(np.float32)
    )
    a0 = density_matvec(x, w, lphi, wz_bug=False)
    a1 = density_matvec(x, w, lphi, wz_bug=True)
    assert float(jnp.abs(a0 - a1).max()) > 0


def test_displacement_gather_roundtrip():
    # constant pressure field -> zero displacement -> particles unmoved
    lphi = jnp.full(N, -1.0, jnp.float32)
    p = jnp.full(N, 3.3, jnp.float32)
    fshapes = [
        tuple(n + (1 if i == a else 0) for i, n in enumerate(N))
        for a in range(3)
    ]
    disp = compute_displacement(p, lphi, 0.01, H, fshapes)
    for d in disp:
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)
    px = jnp.asarray(
        0.3 + 0.4 * np.random.default_rng(5).random((50, 3)), jnp.float32
    )
    out = apply_displacement(px, disp, BMIN, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(px), atol=1e-7)


def test_compressed_cluster_expands():
    """Particles piled into one cell get pushed apart by the projection."""
    rng = np.random.default_rng(6)
    # a dense clump at the domain center + fluid levelset marking a blob
    n_p = 400
    px = jnp.asarray(
        0.5 + 0.05 * rng.standard_normal((n_p, 3)), jnp.float32
    )
    pdx = H[0] / 2
    pm = jnp.full((n_p,), 1000.0 * pdx**3, jnp.float32)
    dual = tuple(2 * k + 1 for k in N)
    sphi = jnp.full(dual, 1.0, jnp.float32)  # no solids
    lphi_np = np.ones(N, np.float32)
    lphi_np[2:-2, 2:-2, 2:-2] = -1.0
    lphi = jnp.asarray(lphi_np)
    w = compute_solid_frac_3d(sphi)
    res = density_solve_3d(
        1000.0, 1 / 300.0, px, pm, pdx**3, sphi, lphi, w, BMIN, H,
        tol=1e-5, max_iter=2000,
    )
    spread0 = float(jnp.std(px, axis=0).mean())
    spread1 = float(jnp.std(res.px, axis=0).mean())
    assert spread1 > spread0 * 1.01, (spread0, spread1)
    assert int(res.stats.iters) > 0


def test_apply_displacement_all_matches_per_axis():
    """Segment-broadcast displacement apply == the per-corner gather
    path (original positions for all axes) to fp summation order."""
    from python_fluid_simulation_tpu.solvers.density import (
        apply_displacement,
        apply_displacement_all,
        scatter_mass_volume,
    )

    rng = np.random.default_rng(13)
    gres = (7, 9, 6)
    bmin = (-0.2, 0.0, -0.1)
    h = (0.1, 0.1, 0.1)
    n = 800
    px = np.stack(
        [
            rng.uniform(bmin[a] + 1e-4, bmin[a] + gres[a] * h[a] - 1e-4, n)
            for a in range(3)
        ],
        -1,
    ).astype(np.float32)
    pm = (rng.random(n) + 0.5).astype(np.float32)
    px_j = jnp.asarray(px)
    _, _, si = scatter_mass_volume(
        px_j, jnp.asarray(pm), 1e-5, gres, bmin, h, with_sort_info=True
    )
    fsh = [
        tuple(nn + (1 if i == a else 0) for i, nn in enumerate(gres))
        for a in range(3)
    ]
    disp = [
        jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.01)
        for s in fsh
    ]
    ref = apply_displacement(px_j, disp, bmin, h)
    new = px_j + apply_displacement_all(disp, si, bmin, h)
    np.testing.assert_allclose(
        np.asarray(new), np.asarray(ref), rtol=1e-5, atol=1e-6
    )
