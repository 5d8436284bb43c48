"""Spatially-bucketed particle sharding: primitive + transfer parity
(SURVEY §2.4(b); parallel/particles.py).  All on the 8-virtual-CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from python_fluid_simulation_tpu.ops.levelset import compute_fluid_levelset
from python_fluid_simulation_tpu.ops.transfers import g2p_axis, p2g_all
from python_fluid_simulation_tpu.parallel.mesh import make_mesh
from python_fluid_simulation_tpu.parallel.particles import (
    bucket_particles,
    make_bucket_spec,
    rebucket,
    sharded_apply_displacement,
    sharded_fluid_levelset,
    sharded_g2p_all,
    sharded_p2g_all,
    sharded_scatter_mass_volume,
)
from python_fluid_simulation_tpu.solvers.density import (
    apply_displacement,
    scatter_mass_volume,
)
from python_fluid_simulation_tpu.state import Particles

GRES = (16, 9, 7)
BMIN = (-0.3, 0.0, -0.2)
H = (0.05, 0.05, 0.05)
BIAS = ((0.0, 0.5, 0.5), (0.5, 0.0, 0.5), (0.5, 0.5, 0.0))
FSH = [
    tuple(n + (1 if i == a else 0) for i, n in enumerate(GRES))
    for a in range(3)
]


def _setup(k=3000, seed=5):
    mesh = make_mesh(8)
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
    spec = make_bucket_spec(8, GRES[0], k)
    b = bucket_particles(p, mesh, spec, BMIN, H)
    return mesh, spec, p, b, rng


def _residency(b, spec):
    bx = np.asarray(b.x)
    bm = np.asarray(b.m)
    slab = np.clip(
        np.floor((bx[:, 0] - BMIN[0]) / H[0]).astype(int), 0, GRES[0] - 1
    ) // spec.slab_w
    dev = np.arange(spec.n_dev).repeat(spec.cap)
    return np.all((bm == 0) | (slab == dev))


def test_bucket_and_rebucket_conserve_and_stay_resident():
    mesh, spec, p, b, rng = _setup()
    assert _residency(b, spec)
    assert int((np.asarray(b.m) > 0).sum()) == p.x.shape[0]
    # move every particle by up to ~1 cell and rebucket
    shift = jnp.asarray(
        (rng.uniform(-0.9, 0.9, (b.x.shape[0],)) * H[0]).astype(np.float32)
    )
    moved = Particles(
        x=jnp.clip(
            b.x.at[:, 0].add(jnp.where(b.m > 0, shift, 0.0)),
            jnp.asarray(BMIN) + 1e-4,
            jnp.asarray(BMIN) + jnp.asarray(GRES) * jnp.asarray(H) - 1e-4,
        ),
        v=b.v,
        c=b.c,
        m=b.m,
    )
    b2, lost = jax.jit(
        lambda pp: rebucket(pp, mesh, spec, BMIN, H)
    )(moved)
    assert int(lost) == 0
    assert _residency(b2, spec)
    s0 = np.sort(np.asarray(moved.x)[np.asarray(moved.m) > 0, 0])
    s1 = np.sort(np.asarray(b2.x)[np.asarray(b2.m) > 0, 0])
    np.testing.assert_allclose(s0, s1)


def test_sharded_p2g_levelset_match_global():
    mesh, spec, p, b, rng = _setup()
    vol = (1e-5, tuple(hh / 2 for hh in H))
    gms_g, gvs_g, cls_g, _ = p2g_all(
        p.x, p.m, p.v, p.c, GRES, FSH, BIAS, BMIN, H, volume=vol,
        with_sort_info=True,
    )
    gms_s, gvs_s, cls_s, _ = jax.jit(
        lambda bp: sharded_p2g_all(
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
        np.testing.assert_allclose(
            np.asarray(cls_s[k]), np.asarray(cls_g[k]), atol=1e-8
        )
    lphi_g = compute_fluid_levelset(p.x, GRES, BMIN, H, H[0], pm=p.m)
    lphi_s = jax.jit(
        lambda bp: sharded_fluid_levelset(
            bp.x, bp.m, mesh, spec, GRES, BMIN, H, H[0]
        )
    )(b)
    np.testing.assert_allclose(
        np.asarray(lphi_s), np.asarray(lphi_g), atol=1e-6
    )


def test_sharded_g2p_and_displacement_match_global():
    mesh, spec, p, b, rng = _setup(seed=6)
    _, _, si = jax.jit(
        lambda bp: sharded_p2g_all(bp, mesh, spec, GRES, FSH, BIAS, BMIN, H)
    )(b)
    gvs = [
        jnp.asarray(rng.normal(size=s).astype(np.float32)) for s in FSH
    ]
    pv_s, pc_s = jax.jit(
        lambda s_: sharded_g2p_all(gvs, mesh, spec, GRES, BIAS, BMIN, H, s_)
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

    # density scatter + displacement gather
    gm_g, gvol_g = scatter_mass_volume(b.x, b.m, 1e-5, GRES, BMIN, H)
    gm_s, gvol_s, si_d = jax.jit(
        lambda bp: sharded_scatter_mass_volume(
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
        lambda s_: sharded_apply_displacement(
            disp, mesh, spec, GRES, BMIN, H, s_
        )
    )(si_d)
    np.testing.assert_allclose(
        np.asarray(got)[live], np.asarray(ref)[live], atol=1e-5
    )
