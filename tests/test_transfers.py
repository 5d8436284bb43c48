"""APIC transfer properties: partition of unity, mass/momentum
conservation, rigid-motion round trip (SURVEY §4 plan)."""

import numpy as np
import jax.numpy as jnp

from python_fluid_simulation_tpu.ops.transfers import g2p_axis, p2g_axis

GRES = (8, 8, 8)
BMIN = (0.0, 0.0, 0.0)
H = (1.0 / 8, 1.0 / 8, 1.0 / 8)
BIAS = ((0.0, 0.5, 0.5), (0.5, 0.0, 0.5), (0.5, 0.5, 0.0))


def _face_shape(a):
    return tuple(n + (1 if i == a else 0) for i, n in enumerate(GRES))


def _rand_particles(n, seed=0, margin=0.2):
    rng = np.random.default_rng(seed)
    x = margin + (1 - 2 * margin) * rng.random((n, 3))
    v = rng.standard_normal((n, 3))
    m = rng.random(n) + 0.5
    return (
        jnp.asarray(x, jnp.float32),
        jnp.asarray(v, jnp.float32),
        jnp.asarray(m, jnp.float32),
    )


def test_p2g_mass_conservation():
    x, v, m = _rand_particles(200)
    c = jnp.zeros((200, 3))
    for a in range(3):
        gm, _ = p2g_axis(x, m, v, c, a, GRES, _face_shape(a), BIAS[a], BMIN, H)
        np.testing.assert_allclose(
            float(jnp.sum(gm)), float(jnp.sum(m)), rtol=1e-5
        )


def test_p2g_momentum_conservation():
    x, v, m = _rand_particles(200, seed=1)
    c = jnp.zeros((200, 3))
    for a in range(3):
        gm, gv = p2g_axis(x, m, v, c, a, GRES, _face_shape(a), BIAS[a], BMIN, H)
        grid_mom = float(jnp.sum(gm * gv))
        part_mom = float(jnp.sum(m * v[:, a]))
        np.testing.assert_allclose(grid_mom, part_mom, rtol=1e-4)


def test_p2g_apic_affine_momentum():
    # with nonzero affine c, scattered momentum includes the affine term:
    # sum_i w m (v + c.(gx - x)) — total still equals m v + m c.(x_cm-x)
    x, v, m = _rand_particles(100, seed=2)
    rng = np.random.default_rng(3)
    c = jnp.asarray(rng.standard_normal((100, 3, 3)), jnp.float32)
    for a in range(3):
        gm, gv = p2g_axis(
            x, m, v, c[:, a, :], a, GRES, _face_shape(a), BIAS[a], BMIN, H
        )
        grid_mom = float(jnp.sum(gm * gv))
        # oracle: direct per-particle sum of w*m*(v+cv) over corners
        xx, vv, mm, cc = map(np.asarray, (x, v, m, c[:, a, :]))
        bias = np.array(BIAS[a])
        h = np.array(H)
        gi = np.floor((xx - np.array(BMIN)) / h - bias)
        gx = (gi + bias) * h
        disp = gx - xx
        w = np.abs(disp) / h
        total = 0.0
        import itertools

        for offs in itertools.product((0, 1), repeat=3):
            weight = np.ones(len(xx))
            for d, o in enumerate(offs):
                weight *= w[:, d] if o == 1 else 1 - w[:, d]
            cv = ((disp + np.array(offs) * h) * cc).sum(-1)
            total += (weight * mm * (vv[:, a] + cv)).sum()
        np.testing.assert_allclose(grid_mom, total, rtol=1e-4)


def test_round_trip_constant_velocity():
    # a constant velocity field survives p2g -> g2p exactly
    # (partition of unity + affine term vanishing for c=0 scatter)
    x, _, m = _rand_particles(300, seed=4)
    v = jnp.tile(jnp.asarray([[0.3, -0.2, 0.1]], jnp.float32), (300, 1))
    c = jnp.zeros((300, 3))
    for a in range(3):
        gm, gv = p2g_axis(x, m, v, c, a, GRES, _face_shape(a), BIAS[a], BMIN, H)
        # fill faces that received no mass with the same constant so the
        # gather (which reads all 8 corners) sees a complete field
        gv = jnp.where(gm > 0, gv, v[0, a])
        pv, pc = g2p_axis(x, gv, a, GRES, BIAS[a], BMIN, H)
        np.testing.assert_allclose(np.asarray(pv), float(v[0, a]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(pc), 0.0, atol=1e-3)


def test_g2p_gradient_of_linear_field():
    # gv varying linearly along x => pc[:,0] = slope, pv = field value
    x, _, _ = _rand_particles(100, seed=5)
    a = 0
    shape = _face_shape(a)
    ix = jnp.arange(shape[0], dtype=jnp.float32).reshape(-1, 1, 1)
    pos_x = (ix + BIAS[a][0]) * H[0]  # face x-positions
    slope = 2.0
    gv = jnp.broadcast_to(slope * pos_x, shape)
    pv, pc = g2p_axis(x, gv, a, GRES, BIAS[a], BMIN, H)
    np.testing.assert_allclose(
        np.asarray(pv), slope * np.asarray(x)[:, 0], atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(pc)[:, 0], slope, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pc)[:, 1:], 0.0, atol=1e-4)


def test_p2g_all_matches_per_axis():
    """The merged one-sort/one-scatter transfer (engine path) equals the
    three per-axis transfers up to fp32 summation order (exact in f64:
    verified at development time; here fp32 tolerances)."""
    from python_fluid_simulation_tpu.ops.transfers import p2g_all

    rng = np.random.default_rng(7)
    n = 600
    x = jnp.asarray(0.05 + 0.9 * rng.random((n, 3)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
    m = jnp.asarray(rng.random(n) + 0.5, jnp.float32)
    pc = jnp.asarray(rng.standard_normal((n, 3, 3)), jnp.float32)
    fsh = [_face_shape(a) for a in range(3)]
    gms, gvs = p2g_all(x, m, v, pc, GRES, fsh, BIAS, BMIN, H)
    for a in range(3):
        gm_r, gv_r = p2g_axis(
            x, m, v, pc[:, a, :], a, GRES, fsh[a], BIAS[a], BMIN, H
        )
        np.testing.assert_allclose(
            np.asarray(gms[a]), np.asarray(gm_r), rtol=3e-4, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(gvs[a]), np.asarray(gv_r), rtol=1e-3, atol=3e-4
        )


def test_p2g_all_volume_channels_match_dense():
    """volume=(pvol, fine_h) rides the p2g placement and must equal
    split_parity(compute_fluid_volume(...)) to summation order."""
    from python_fluid_simulation_tpu.ops.indexing import split_parity
    from python_fluid_simulation_tpu.ops.levelset import (
        compute_fluid_volume,
    )
    from python_fluid_simulation_tpu.ops.transfers import p2g_all

    rng = np.random.default_rng(9)
    n = 600
    x = jnp.asarray(0.05 + 0.9 * rng.random((n, 3)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
    m = jnp.asarray(rng.random(n) + 0.5, jnp.float32)
    pc = jnp.asarray(rng.standard_normal((n, 3, 3)), jnp.float32)
    fsh = [_face_shape(a) for a in range(3)]
    fine = tuple(h / 2 for h in H)
    pvol = 1e-5
    _, _, classes = p2g_all(
        x, m, v, pc, GRES, fsh, BIAS, BMIN, H, volume=(pvol, fine)
    )
    dual = tuple(2 * k + 1 for k in GRES)
    ref = split_parity(
        compute_fluid_volume(x, pvol, dual, BMIN, fine, pm=m), 3
    )
    for p in ref:
        np.testing.assert_allclose(
            np.asarray(classes[p]), np.asarray(ref[p]),
            rtol=2e-4, atol=1e-9,
        )


def test_g2p_all_matches_per_axis():
    """The gather-free segment-broadcast G2P equals d× g2p_axis to fp
    summation order — including particles at domain edges where the
    corner clamp engages."""
    from python_fluid_simulation_tpu.ops.transfers import g2p_all, p2g_all

    rng = np.random.default_rng(11)
    n = 700
    # margin 0 exercises the clip(gi + o, 0, gres-1) edge behaviour
    x, v, m = _rand_particles(n, seed=11, margin=0.001)
    pc = jnp.asarray(rng.standard_normal((n, 3, 3)), jnp.float32)
    fsh = [_face_shape(a) for a in range(3)]
    _, _, si = p2g_all(
        x, m, v, pc, GRES, fsh, BIAS, BMIN, H, with_sort_info=True
    )
    gvs = [
        jnp.asarray(rng.standard_normal(s).astype(np.float32))
        for s in fsh
    ]
    pv, pcn = g2p_all(gvs, GRES, BIAS, BMIN, H, si)
    for a in range(3):
        pva, pca = g2p_axis(x, gvs[a], a, GRES, BIAS[a], BMIN, H)
        np.testing.assert_allclose(
            np.asarray(pv[:, a]), np.asarray(pva), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(pcn[:, a]), np.asarray(pca), rtol=1e-4, atol=1e-4
        )


def test_p2g_all_grouped_matches_ungrouped(monkeypatch):
    """The big-grid channel-grouped placement (peak-memory bound for
    8M-cell grids) is numerically the single-table path."""
    import os

    from python_fluid_simulation_tpu.ops.transfers import p2g_all

    rng = np.random.default_rng(17)
    n = 900
    x, v, m = _rand_particles(n, seed=17, margin=0.01)
    pc = jnp.asarray(rng.standard_normal((n, 3, 3)), jnp.float32)
    fsh = [_face_shape(a) for a in range(3)]
    vol = (1e-5, tuple(hh / 2 for hh in H))
    gm0, gv0, cl0 = p2g_all(
        x, m, v, pc, GRES, fsh, BIAS, BMIN, H, volume=vol
    )
    monkeypatch.setenv("PFS_GROUP_CELLS", "1")
    gm1, gv1, cl1 = p2g_all(
        x, m, v, pc, GRES, fsh, BIAS, BMIN, H, volume=vol
    )
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(gm1[a]), np.asarray(gm0[a]), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(gv1[a]), np.asarray(gv0[a]), atol=1e-6
        )
    for k in cl0:
        np.testing.assert_allclose(
            np.asarray(cl1[k]), np.asarray(cl0[k]), atol=1e-9
        )


def test_levelset_grouped_matches_ungrouped(monkeypatch):
    from python_fluid_simulation_tpu.ops.levelset import (
        compute_fluid_levelset,
    )

    x, _, m = _rand_particles(700, seed=18, margin=0.01)
    ref = compute_fluid_levelset(x, GRES, BMIN, H, H[0], pm=m)
    monkeypatch.setenv("PFS_GROUP_CELLS", "1")
    got = compute_fluid_levelset(x, GRES, BMIN, H, H[0], pm=m)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-6
    )


def test_external_sort_info_matches_internal():
    """p2g_all and compute_fluid_levelset riding one make_sort_info sort
    must equal their self-sorting paths — including zero-mass padding
    rows mixed through the array (the engine's shared-sort fast path)."""
    from python_fluid_simulation_tpu.ops.levelset import (
        compute_fluid_levelset,
    )
    from python_fluid_simulation_tpu.ops.transfers import (
        make_sort_info,
        p2g_all,
    )

    x, v, m = _rand_particles(300, seed=11)
    # pad every 5th row (engine m=0 convention), park them at one spot
    m = m.at[::5].set(0.0)
    x = x.at[::5].set(jnp.asarray([0.51, 0.52, 0.53]))
    rng = np.random.default_rng(12)
    pc = jnp.asarray(rng.standard_normal((300, 3, 3)) * 0.1, jnp.float32)
    fsh = [_face_shape(a) for a in range(3)]
    hdual = tuple(hh / 2 for hh in H)
    vol = (0.001, hdual)

    si = make_sort_info(x, m, GRES, BMIN, H)
    gms0, gvs0, cls0 = p2g_all(
        x, m, v, pc, GRES, fsh, BIAS, BMIN, H, volume=vol
    )
    gms1, gvs1, cls1 = p2g_all(
        x, m, v, pc, GRES, fsh, BIAS, BMIN, H, volume=vol, sort_info=si
    )
    for a in range(3):
        np.testing.assert_allclose(gms0[a], gms1[a], atol=1e-5)
        np.testing.assert_allclose(gvs0[a], gvs1[a], atol=1e-5)
    for k in cls0:
        np.testing.assert_allclose(cls0[k], cls1[k], atol=1e-5)

    l0 = compute_fluid_levelset(x, GRES, BMIN, H, H[0], pm=m)
    l1 = compute_fluid_levelset(x, GRES, BMIN, H, H[0], pm=m, sort_info=si)
    np.testing.assert_allclose(l0, l1, atol=1e-6)
