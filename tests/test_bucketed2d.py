"""2D (x,z)-mesh bucketed particle sharding: parity vs the global path
(VERDICT r4 #6; parallel/particles2d.py).  All on the 8-virtual-CPU mesh
arranged (4, 2)."""

import numpy as np
import jax
import jax.numpy as jnp

from python_fluid_simulation_tpu.ops.levelset import compute_fluid_levelset
from python_fluid_simulation_tpu.ops.transfers import g2p_axis, p2g_all
from python_fluid_simulation_tpu.parallel.mesh import make_mesh2d
from python_fluid_simulation_tpu.parallel.particles2d import (
    bucket_particles_2d,
    make_bucket_spec_2d,
    rebucket_2d,
    sharded_apply_displacement_2d,
    sharded_fluid_levelset_2d,
    sharded_g2p_all_2d,
    sharded_p2g_all_2d,
    sharded_scatter_mass_volume_2d,
)
from python_fluid_simulation_tpu.solvers.density import (
    apply_displacement,
    scatter_mass_volume,
)
from python_fluid_simulation_tpu.state import Particles

MESH_SHAPE = (4, 2)
GRES = (16, 9, 8)
BMIN = (-0.3, 0.0, -0.2)
H = (0.05, 0.05, 0.05)
BIAS = ((0.0, 0.5, 0.5), (0.5, 0.0, 0.5), (0.5, 0.5, 0.0))
FSH = [
    tuple(n + (1 if i == a else 0) for i, n in enumerate(GRES))
    for a in range(3)
]


def _setup(k=3000, seed=5):
    mesh = make_mesh2d(MESH_SHAPE)
    rng = np.random.default_rng(seed)
    x = np.stack(
        [
            rng.uniform(BMIN[a] + 1e-4, BMIN[a] + GRES[a] * H[a] - 1e-4, k)
            for a in range(3)
        ],
        -1,
    ).astype(np.float32)
    p = Particles(
        x=jnp.asarray(x),
        v=jnp.asarray(rng.normal(size=(k, 3)).astype(np.float32)),
        c=jnp.asarray(rng.normal(size=(k, 3, 3)).astype(np.float32)),
        m=jnp.asarray((rng.random(k) + 0.5).astype(np.float32)),
    )
    spec = make_bucket_spec_2d(MESH_SHAPE, GRES[0], GRES[2], k)
    b = bucket_particles_2d(p, mesh, spec, BMIN, H)
    return mesh, spec, p, b, rng


def _residency(b, spec):
    bx = np.asarray(b.x)
    bm = np.asarray(b.m)
    sx = np.clip(
        np.floor((bx[:, 0] - BMIN[0]) / H[0]).astype(int), 0, GRES[0] - 1
    ) // spec.slab_wx
    sz = np.clip(
        np.floor((bx[:, 2] - BMIN[2]) / H[2]).astype(int), 0, GRES[2] - 1
    ) // spec.slab_wz
    dev = np.arange(spec.n_x * spec.n_z).repeat(spec.cap)
    return np.all((bm == 0) | (sx * spec.n_z + sz == dev))


def test_bucket2d_rebucket_conserves_and_stays_resident():
    mesh, spec, p, b, rng = _setup()
    assert _residency(b, spec)
    assert int((np.asarray(b.m) > 0).sum()) == p.x.shape[0]
    # move every particle by up to ~1 cell in BOTH x and z (exercising
    # diagonal crossers through the x-then-z phases) and rebucket
    k = b.x.shape[0]
    dx = (rng.uniform(-0.9, 0.9, (k, 3)) * H[0]).astype(np.float32)
    dx[:, 1] = 0.0
    moved = Particles(
        x=jnp.clip(
            b.x + jnp.where(b.m[:, None] > 0, jnp.asarray(dx), 0.0),
            jnp.asarray(BMIN) + 1e-4,
            jnp.asarray(BMIN) + jnp.asarray(GRES) * jnp.asarray(H) - 1e-4,
        ),
        v=b.v,
        c=b.c,
        m=b.m,
    )
    b2, lost = jax.jit(
        lambda pp: rebucket_2d(pp, mesh, spec, BMIN, H)
    )(moved)
    assert int(lost) == 0
    assert _residency(b2, spec)
    for a in (0, 2):
        s0 = np.sort(np.asarray(moved.x)[np.asarray(moved.m) > 0, a])
        s1 = np.sort(np.asarray(b2.x)[np.asarray(b2.m) > 0, a])
        np.testing.assert_allclose(s0, s1)


def test_sharded2d_p2g_levelset_match_global():
    mesh, spec, p, b, rng = _setup()
    vol = (1e-5, tuple(hh / 2 for hh in H))
    gms_g, gvs_g, cls_g, _ = p2g_all(
        p.x, p.m, p.v, p.c, GRES, FSH, BIAS, BMIN, H, volume=vol,
        with_sort_info=True,
    )
    gms_s, gvs_s, cls_s, _ = jax.jit(
        lambda bp: sharded_p2g_all_2d(
            bp, mesh, spec, GRES, FSH, BIAS, BMIN, H, volume=vol
        )
    )(b)
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(gms_s[a]), np.asarray(gms_g[a]), atol=5e-4
        )
        np.testing.assert_allclose(
            np.asarray(gvs_s[a]), np.asarray(gvs_g[a]), atol=5e-4
        )
    for k in cls_g:
        assert cls_s[k].shape == cls_g[k].shape, (k, cls_s[k].shape)
        np.testing.assert_allclose(
            np.asarray(cls_s[k]), np.asarray(cls_g[k]), atol=1e-8,
            err_msg=f"class {k}",
        )
    lphi_g = compute_fluid_levelset(p.x, GRES, BMIN, H, H[0], pm=p.m)
    lphi_s = jax.jit(
        lambda bp: sharded_fluid_levelset_2d(
            bp.x, bp.m, mesh, spec, GRES, BMIN, H, H[0]
        )
    )(b)
    np.testing.assert_allclose(
        np.asarray(lphi_s), np.asarray(lphi_g), atol=1e-6
    )


def test_sharded2d_g2p_and_displacement_match_global():
    mesh, spec, p, b, rng = _setup(seed=6)
    _, _, si = jax.jit(
        lambda bp: sharded_p2g_all_2d(
            bp, mesh, spec, GRES, FSH, BIAS, BMIN, H
        )
    )(b)
    gvs = [
        jnp.asarray(rng.normal(size=s).astype(np.float32)) for s in FSH
    ]
    pv_s, pc_s = jax.jit(
        lambda s_: sharded_g2p_all_2d(
            gvs, mesh, spec, GRES, BIAS, BMIN, H, s_
        )
    )(si)
    live = np.asarray(b.m) > 0
    for a in range(3):
        pva, pca = g2p_axis(b.x, gvs[a], a, GRES, BIAS[a], BMIN, H)
        np.testing.assert_allclose(
            np.asarray(pv_s)[live, a], np.asarray(pva)[live], atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(pc_s)[live, a], np.asarray(pca)[live], atol=1e-3
        )

    gm_g, gvol_g = scatter_mass_volume(b.x, b.m, 1e-5, GRES, BMIN, H)
    gm_s, gvol_s, si_d = jax.jit(
        lambda bp: sharded_scatter_mass_volume_2d(
            bp.x, bp.m, mesh, spec, GRES, 1e-5, BMIN, H
        )
    )(b)
    np.testing.assert_allclose(
        np.asarray(gm_s), np.asarray(gm_g), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(gvol_s), np.asarray(gvol_g), atol=1e-8
    )
    disp = [
        jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.01)
        for s in FSH
    ]
    ref = apply_displacement(b.x, disp, BMIN, H)
    got = b.x + jax.jit(
        lambda s_: sharded_apply_displacement_2d(
            disp, mesh, spec, GRES, BMIN, H, s_
        )
    )(si_d)
    np.testing.assert_allclose(
        np.asarray(got)[live], np.asarray(ref)[live], atol=1e-5
    )
