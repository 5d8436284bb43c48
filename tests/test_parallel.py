"""Multi-device tests on the 8-way virtual CPU mesh: halo exchange,
shard_map'd stencil matvec vs single-device oracle, distributed CG dots,
and the GSPMD-sharded full step."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
import pytest

from python_fluid_simulation_tpu.ops.fractions import compute_solid_frac_3d
from python_fluid_simulation_tpu.parallel.halo import (
    halo_exchange,
    psum_dot,
    sharded_pressure_matvec,
)
from python_fluid_simulation_tpu.parallel.mesh import make_mesh, shard_state

try:
    from jax import shard_map
except ImportError:
    from jax.experimental.shard_map import shard_map

N = (16, 8, 8)  # x divides 8 devices


def test_halo_exchange_roundtrip():
    mesh = make_mesh(8)

    def f(x):
        return halo_exchange(x, "x", 1)

    x = jnp.arange(16, dtype=jnp.float32).reshape(16, 1)
    out = shard_map(
        f, mesh=mesh, in_specs=P("x", None), out_specs=P("x", None)
    )(x)
    out = np.asarray(out).reshape(8, 4)  # 8 shards x (1 + 2 + 1)
    # shard i owns rows [2i, 2i+2); halo-extended: [2i-1 .. 2i+2]
    for i in range(8):
        lo = out[i, 0]
        assert lo == (2 * i - 1 if i > 0 else 0.0)
        assert out[i, 1] == 2 * i and out[i, 2] == 2 * i + 1
        hi = out[i, 3]
        assert hi == (2 * i + 2 if i < 7 else 0.0)


def _random_geometry(seed=0):
    rng = np.random.default_rng(seed)
    dual = tuple(2 * k + 1 for k in N)
    sphi = jnp.asarray(rng.standard_normal(dual).astype(np.float32))
    lphi = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    return sphi, lphi


def test_sharded_pressure_matvec_matches_single_device():
    mesh = make_mesh(8)
    sphi, lphi = _random_geometry()
    w = compute_solid_frac_3d(sphi)
    from python_fluid_simulation_tpu.solvers.pressure import (
        pressure_matvec_3d,
    )

    rng = np.random.default_rng(1)
    p = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    want = np.asarray(pressure_matvec_3d(p, w, lphi))
    mv = sharded_pressure_matvec(mesh, w, lphi)
    got = np.asarray(mv(p))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_psum_dot_matches_global():
    mesh = make_mesh(8)
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.standard_normal((16, 4)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((16, 4)).astype(np.float32))

    def f(x, y):
        return psum_dot(x, y, "x")

    out = shard_map(
        f, mesh=mesh, in_specs=(P("x", None), P("x", None)),
        out_specs=P(),
    )(a, b)
    np.testing.assert_allclose(
        float(out), float(jnp.vdot(a, b)), rtol=1e-5
    )


@pytest.mark.slow
def test_gspmd_sharded_full_step():
    """The full engine step runs with particles sharded over 8 devices."""
    from python_fluid_simulation_tpu.config import (
        GridConfig3D,
        PhysicsConfig,
        SimConfig,
        SolverConfig,
    )
    from python_fluid_simulation_tpu.engine.scenes import dam_break_scene
    from python_fluid_simulation_tpu.engine.step import make_step

    cfg = SimConfig(
        grid=GridConfig3D(
            bound_min=(0.0, 0.0, 0.0),
            bound_size=(1.0, 1.0, 1.0),
            dx=1.0 / 8,
        ),
        physics=PhysicsConfig(mu=0.2, dt=1.0 / 60.0),
        solver=SolverConfig(max_iter=200),
        particle_dx=1.0 / 16,
    )
    state = dam_break_scene(cfg)
    # pad particle count to a multiple of 8 for even sharding
    n = state.particles.x.shape[0]
    pad = (-n) % 8
    if pad:
        import jax.numpy as jnp

        from python_fluid_simulation_tpu.state import Particles, SimState

        pts = state.particles
        state = SimState(
            particles=Particles(
                x=jnp.concatenate([pts.x, pts.x[:pad]]),
                v=jnp.concatenate([pts.v, pts.v[:pad]]),
                c=jnp.concatenate([pts.c, pts.c[:pad]]),
                m=jnp.concatenate([pts.m, jnp.zeros(pad)]),
            ),
            solid=state.solid,
            t=state.t,
            step_idx=state.step_idx,
        )
    mesh = make_mesh(8)
    sharded = shard_state(state, mesh)
    step = make_step(cfg)
    out, metrics = step(sharded)
    x = np.asarray(out.particles.x)
    assert np.all(np.isfinite(x))
    # compare against unsharded execution
    out1, _ = step(state)
    np.testing.assert_allclose(
        x, np.asarray(out1.particles.x), atol=1e-4
    )


@pytest.mark.slow
def test_spatially_sharded_full_step():
    """step_3d with mesh=: grid fields slab-sharded end-to-end, all three
    implicit solves running as shard_map distributed PCG — matches the
    single-device step (VERDICT item 2)."""
    from python_fluid_simulation_tpu.config import (
        GridConfig3D,
        PhysicsConfig,
        SimConfig,
        SolverConfig,
    )
    from python_fluid_simulation_tpu.engine.scenes import dam_break_scene
    from python_fluid_simulation_tpu.engine.step import make_step

    cfg = SimConfig(
        grid=GridConfig3D(
            bound_min=(0.0, 0.0, 0.0),
            bound_size=(1.0, 1.0, 1.0),
            dx=1.0 / 8,
        ),
        physics=PhysicsConfig(mu=0.2, dt=1.0 / 60.0),
        solver=SolverConfig(max_iter=200),
        particle_dx=1.0 / 16,
    )
    state = dam_break_scene(cfg)
    n = state.particles.x.shape[0]
    mesh = make_mesh(8)
    sharded = shard_state(state, mesh)  # pads particles with inert m=0
    step_m = make_step(cfg, mesh=mesh)
    out, metrics = step_m(sharded)
    x = np.asarray(out.particles.x)
    assert np.all(np.isfinite(x))
    # a grid-solve phase actually iterated (pressure legitimately takes 0
    # iterations on this uniformly-falling first step)
    assert int(metrics["density_iters"]) > 0
    # compare against unsharded execution (solver paths differ only by
    # distribution; padding particles are inert by the m=0 convention)
    step_s = make_step(cfg)
    out1, _ = step_s(state)
    np.testing.assert_allclose(
        x[:n], np.asarray(out1.particles.x), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.particles.v)[:n],
        np.asarray(out1.particles.v),
        atol=2e-3,
    )


def test_distributed_pcg_nondividing_extent():
    """x-extent NOT divisible by the mesh (pad path): 11 cells over 8
    devices — the flagship 77x128x77 case class (VERDICT item 6)."""
    from python_fluid_simulation_tpu.parallel.halo import (
        sharded_cell_poisson_cg,
    )
    from python_fluid_simulation_tpu.solvers.pressure import (
        pressure_coefficients,
        pressure_rhs_3d,
        solve_cell_poisson,
    )

    nn = (11, 8, 7)
    mesh = make_mesh(8)
    rng = np.random.default_rng(7)
    dual = tuple(2 * k + 1 for k in nn)
    sphi = jnp.ones(dual, jnp.float32)
    lphi_np = np.ones(nn, np.float32)
    lphi_np[2:-2, 2:-2, 2:-2] = -1.0
    lphi = jnp.asarray(lphi_np)
    w = compute_solid_frac_3d(sphi)
    shapes = [
        tuple(k + (1 if i == a else 0) for i, k in enumerate(nn))
        for a in range(3)
    ]
    v = tuple(
        jnp.asarray(rng.standard_normal(s).astype(np.float32))
        for s in shapes
    )
    sv = jnp.zeros(dual + (3,), jnp.float32)
    b = pressure_rhs_3d(v, sv, lphi, w, (0.1,) * 3)
    diag, coefs, pd = pressure_coefficients(w, lphi)

    x_d, iters_d, res_d = sharded_cell_poisson_cg(
        mesh, b, diag, coefs, pd, tol=1e-5, rel_tol=1e-5, max_iter=800
    )
    x_s, st = solve_cell_poisson(
        b, w, lphi, tol=1e-5, rel_tol=1e-5, max_iter=800, use_pallas="off"
    )
    assert x_d.shape == x_s.shape
    np.testing.assert_allclose(
        np.asarray(x_d), np.asarray(x_s), rtol=2e-3, atol=2e-4
    )


def test_distributed_viscosity_matches_single_device():
    """The distributed coupled 3-field CG (halo exchange of vx/vy/vz +
    psum dots) reproduces the single-device viscosity solve (VERDICT
    item 3; reference hot kernel ViscosityCGSolver3D.py:248-456)."""
    from python_fluid_simulation_tpu.solvers.viscosity import (
        viscosity_solve_3d,
    )

    nn = (10, 8, 7)  # deliberately non-dividing x-extent (faces: 11)
    mesh = make_mesh(8)
    rng = np.random.default_rng(11)
    dual = tuple(2 * k + 1 for k in nn)
    # mixed solid/fluid geometry + positive control volumes
    sphi = jnp.asarray(
        rng.standard_normal(dual).astype(np.float32) + 0.5
    )
    lvol = jnp.asarray(
        np.abs(rng.standard_normal(dual)).astype(np.float32) * 1e-4
    )
    shapes = [
        tuple(k + (1 if i == a else 0) for i, k in enumerate(nn))
        for a in range(3)
    ]
    v = tuple(
        jnp.asarray(rng.standard_normal(s).astype(np.float32))
        for s in shapes
    )
    kw = dict(
        tol=1e-6, rel_tol=1e-6, max_iter=400, use_pallas="off",
    )
    res_s = viscosity_solve_3d(
        1.0 / 60, 1.0, 1000.0, v, sphi, lvol, 0.1**3, **kw
    )
    res_d = viscosity_solve_3d(
        1.0 / 60, 1.0, 1000.0, v, sphi, lvol, 0.1**3, mesh=mesh, **kw
    )
    assert abs(int(res_d.stats.iters) - int(res_s.stats.iters)) <= 3
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(res_d.v_faces[a]),
            np.asarray(res_s.v_faces[a]),
            rtol=5e-3,
            atol=5e-4,
        )


def test_distributed_pcg_matches_single_device():
    """The full shard_map'd PCG (halo matvec + psum dots) reproduces the
    single-device solve."""
    from python_fluid_simulation_tpu.parallel.halo import (
        sharded_cell_poisson_cg,
    )
    from python_fluid_simulation_tpu.solvers.pressure import (
        pressure_coefficients,
        pressure_rhs_3d,
        solve_cell_poisson,
    )

    mesh = make_mesh(8)
    rng = np.random.default_rng(3)
    dual = tuple(2 * k + 1 for k in N)
    sphi = jnp.ones(dual, jnp.float32)
    lphi_np = np.ones(N, np.float32)
    lphi_np[2:-2, 2:-3, 2:-2] = -1.0
    lphi = jnp.asarray(lphi_np)
    w = compute_solid_frac_3d(sphi)
    shapes = [
        tuple(k + (1 if i == a else 0) for i, k in enumerate(N))
        for a in range(3)
    ]
    v = tuple(
        jnp.asarray(rng.standard_normal(s).astype(np.float32)) for s in shapes
    )
    sv = jnp.zeros(dual + (3,), jnp.float32)
    b = pressure_rhs_3d(v, sv, lphi, w, (0.1,) * 3)
    diag, coefs, pd = pressure_coefficients(w, lphi)

    x_d, iters_d, res_d = sharded_cell_poisson_cg(
        mesh, b, diag, coefs, pd, tol=1e-5, rel_tol=1e-5, max_iter=800
    )
    x_s, st = solve_cell_poisson(
        b, w, lphi, tol=1e-5, rel_tol=1e-5, max_iter=800, use_pallas="off"
    )
    assert abs(int(iters_d) - int(st.iters)) <= 2
    np.testing.assert_allclose(
        np.asarray(x_d), np.asarray(x_s), rtol=2e-3, atol=2e-4
    )


def test_bucketed_full_step_matches_single_device():
    """Spatially-bucketed particle mode (SURVEY §2.4(b)): the full step
    with shard-local transfers + bounded rebucket exchange matches the
    single-device step.  Particle masses are made unique so rows can be
    matched across the rebucket permutation."""
    from python_fluid_simulation_tpu.config import (
        GridConfig3D,
        PhysicsConfig,
        SimConfig,
        SolverConfig,
    )
    from python_fluid_simulation_tpu.engine.scenes import dam_break_scene
    from python_fluid_simulation_tpu.engine.step import make_step
    from python_fluid_simulation_tpu.parallel.particles import (
        bucket_particles,
        make_bucket_spec,
    )
    from python_fluid_simulation_tpu.state import Particles, SimState

    cfg = SimConfig(
        grid=GridConfig3D(
            bound_min=(0.0, 0.0, 0.0),
            bound_size=(1.0, 1.0, 1.0),
            dx=1.0 / 16,  # slab_w = 2 on the 8-device mesh
        ),
        physics=PhysicsConfig(mu=0.2, dt=1.0 / 60.0),
        solver=SolverConfig(max_iter=200),
        particle_dx=1.0 / 32,
    )
    state = dam_break_scene(cfg)
    n = state.particles.x.shape[0]
    pm = np.asarray(state.particles.m) * (
        1.0 + 1e-4 * np.arange(n, dtype=np.float32)
    )
    state = SimState(
        particles=Particles(
            x=state.particles.x,
            v=state.particles.v,
            c=state.particles.c,
            m=jnp.asarray(pm),
        ),
        solid=state.solid,
        t=state.t,
        step_idx=state.step_idx,
    )
    mesh = make_mesh(8)
    spec = make_bucket_spec(
        8, cfg.grid.res[0], n, positions=np.asarray(state.particles.x),
        bound_min=cfg.grid.bound_min, cell_size=cfg.grid.cell_size,
    )
    bstate = SimState(
        particles=bucket_particles(
            state.particles, mesh, spec, cfg.grid.bound_min,
            cfg.grid.cell_size,
        ),
        solid=state.solid,
        t=state.t,
        step_idx=state.step_idx,
    )

    out_b, metrics = make_step(cfg, mesh=mesh, bucketed=True)(bstate)
    assert int(metrics["bucket_lost"]) == 0
    out_s, _ = make_step(cfg)(state)

    mb = np.asarray(out_b.particles.m)
    xb = np.asarray(out_b.particles.x)[mb > 0]
    vb = np.asarray(out_b.particles.v)[mb > 0]
    kb = mb[mb > 0]
    xs = np.asarray(out_s.particles.x)
    vs = np.asarray(out_s.particles.v)
    ks = np.asarray(out_s.particles.m)
    assert kb.shape == ks.shape
    ob = np.argsort(kb)
    os_ = np.argsort(ks)
    np.testing.assert_array_equal(kb[ob], ks[os_])  # same particle set
    np.testing.assert_allclose(xb[ob], xs[os_], atol=2e-4)
    np.testing.assert_allclose(vb[ob], vs[os_], atol=2e-3)

    # residency: no full-particle-array collective in the bucketed HLO —
    # only collective-permutes (halos + the bounded exchange buffers)
    import jax

    lowered = jax.jit(
        lambda s: make_step(cfg, mesh=mesh, bucketed=True)(s)
    ).lower(bstate)
    hlo = lowered.compile().as_text()
    import re

    for m in re.finditer(r"all-(gather|to-all)[^\n]*", hlo):
        line = m.group(0)
        # particle-array-sized collectives would carry the cap dim
        assert f"{spec.cap * 8}" not in line, line


# ---------------------------------------------------------------------------
# 2D (x, z) mesh — SURVEY §7's "GSPMD mesh over (x,z) grid axes"
# (VERDICT r3 missing #1): halos along two axes, psums over the whole mesh
# ---------------------------------------------------------------------------


def test_distributed_pcg_2d_mesh_matches_single_device():
    from python_fluid_simulation_tpu.parallel.halo import (
        sharded_cell_poisson_cg,
    )
    from python_fluid_simulation_tpu.parallel.mesh import make_mesh2d
    from python_fluid_simulation_tpu.solvers.pressure import (
        pressure_coefficients,
        pressure_rhs_3d,
        solve_cell_poisson,
    )

    mesh = make_mesh2d((4, 2))
    nn = (10, 8, 7)  # x AND z deliberately non-dividing
    rng = np.random.default_rng(5)
    dual = tuple(2 * k + 1 for k in nn)
    sphi = jnp.ones(dual, jnp.float32)
    lphi_np = np.ones(nn, np.float32)
    lphi_np[2:-2, 2:-3, 2:-2] = -1.0
    lphi = jnp.asarray(lphi_np)
    w = compute_solid_frac_3d(sphi)
    shapes = [
        tuple(k + (1 if i == a else 0) for i, k in enumerate(nn))
        for a in range(3)
    ]
    v = tuple(
        jnp.asarray(rng.standard_normal(s).astype(np.float32))
        for s in shapes
    )
    sv = jnp.zeros(dual + (3,), jnp.float32)
    b = pressure_rhs_3d(v, sv, lphi, w, (0.1,) * 3)
    diag, coefs, pd = pressure_coefficients(w, lphi)

    x_d, iters_d, res_d = sharded_cell_poisson_cg(
        mesh, b, diag, coefs, pd, tol=1e-5, rel_tol=1e-5, max_iter=800
    )
    x_s, st = solve_cell_poisson(
        b, w, lphi, tol=1e-5, rel_tol=1e-5, max_iter=800,
        use_pallas="off",
    )
    assert abs(int(iters_d) - int(st.iters)) <= 2
    np.testing.assert_allclose(
        np.asarray(x_d), np.asarray(x_s), rtol=2e-3, atol=2e-4
    )


def test_distributed_coupled_cg_2d_mesh_matches_single_device():
    """Coupled viscosity CG on the (4, 2) mesh: cross-axis couplings
    (nonzero x AND z offsets) exercise the corner halos the sequential
    two-axis exchange materialises."""
    from python_fluid_simulation_tpu.parallel.mesh import make_mesh2d
    from python_fluid_simulation_tpu.solvers.viscosity import (
        viscosity_solve_3d,
    )

    nn = (10, 8, 7)
    mesh = make_mesh2d((4, 2))
    rng = np.random.default_rng(11)
    dual = tuple(2 * k + 1 for k in nn)
    sphi = jnp.asarray(
        rng.standard_normal(dual).astype(np.float32) + 0.5
    )
    lvol = jnp.asarray(
        np.abs(rng.standard_normal(dual)).astype(np.float32) * 1e-4
    )
    shapes = [
        tuple(k + (1 if i == a else 0) for i, k in enumerate(nn))
        for a in range(3)
    ]
    v = tuple(
        jnp.asarray(rng.standard_normal(s).astype(np.float32))
        for s in shapes
    )
    kw = dict(tol=1e-6, rel_tol=1e-6, max_iter=400, use_pallas="off")
    res_s = viscosity_solve_3d(
        1.0 / 60, 1.0, 1000.0, v, sphi, lvol, 0.1**3, **kw
    )
    res_d = viscosity_solve_3d(
        1.0 / 60, 1.0, 1000.0, v, sphi, lvol, 0.1**3, mesh=mesh, **kw
    )
    assert abs(int(res_d.stats.iters) - int(res_s.stats.iters)) <= 3
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(res_d.v_faces[a]),
            np.asarray(res_s.v_faces[a]),
            rtol=5e-3,
            atol=5e-4,
        )


def test_rdma_halo_matches_ppermute():
    """parallel/halo_rdma.py (VERDICT r3 missing #3): the Pallas
    remote-DMA halo exchange reproduces the ppermute halo bit-for-bit
    on the 8-device mesh (distributed interpret mode — the same
    fake-backend strategy as the rest of this file; on hardware it
    lowers to ICI RDMAs)."""
    from python_fluid_simulation_tpu.parallel.halo_rdma import (
        halo_exchange_rdma,
    )

    mesh = make_mesh(8)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((32, 6, 5)).astype(
            np.float32
        )
    )
    f_ref = shard_map(
        lambda a: halo_exchange(a, "x"), mesh=mesh, in_specs=P("x"),
        out_specs=P("x"),
    )
    f_rdma = shard_map(
        lambda a: halo_exchange_rdma(a, "x"), mesh=mesh,
        in_specs=P("x"), out_specs=P("x"), check_vma=False,
    )
    np.testing.assert_array_equal(
        np.asarray(f_rdma(x)), np.asarray(f_ref(x))
    )
