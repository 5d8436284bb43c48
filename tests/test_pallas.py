"""Pallas fused stencil kernels vs the XLA reference path (interpret mode
on CPU; the same code compiles with Mosaic on TPU)."""

import numpy as np
import jax.numpy as jnp

from python_fluid_simulation_tpu.ops.fractions import compute_solid_frac_3d
from python_fluid_simulation_tpu.ops.indexing import split_parity
from python_fluid_simulation_tpu.solvers.pressure import (
    prepare_pressure_matvec,
)
from python_fluid_simulation_tpu.solvers.viscosity import (
    prepare_viscosity_matvec,
)

N = (8, 10, 12)
DUAL = tuple(2 * k + 1 for k in N)


def _geom(seed=0):
    rng = np.random.default_rng(seed)
    sphi = jnp.asarray(rng.standard_normal(DUAL).astype(np.float32))
    lphi = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    return sphi, lphi, rng


def test_pressure_pallas_matches_xla():
    sphi, lphi, rng = _geom()
    w = compute_solid_frac_3d(sphi)
    mv_x, d_x = prepare_pressure_matvec(w, lphi, use_pallas="off")
    mv_p, d_p = prepare_pressure_matvec(w, lphi, use_pallas="on")
    p = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(mv_p(p)), np.asarray(mv_x(p)), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_x))


def test_viscosity_pallas_matches_xla():
    sphi, lphi, rng = _geom(1)
    vol = jnp.asarray(rng.random(DUAL).astype(np.float32))
    shapes = [
        tuple(n + (1 if i == a else 0) for i, n in enumerate(N))
        for a in range(3)
    ]
    sphi_c = split_parity(sphi, 3)
    vol_c = split_parity(vol, 3)
    mv_x, _ = prepare_viscosity_matvec(
        0.3, sphi_c, vol_c, shapes, use_pallas="off"
    )
    mv_p, _ = prepare_viscosity_matvec(
        0.3, sphi_c, vol_c, shapes, use_pallas="on"
    )
    v = tuple(
        jnp.asarray(rng.standard_normal(s).astype(np.float32))
        for s in shapes
    )
    out_x = mv_x(v)
    out_p = mv_p(v)
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(out_p[a]), np.asarray(out_x[a]), rtol=1e-5, atol=1e-5
        )


def test_fused_cg_solver_matches_generic(
):
    """The single-kernel Pallas PCG vs the generic while_loop CG."""
    from python_fluid_simulation_tpu.solvers.pressure import (
        pressure_rhs_3d,
        solve_cell_poisson,
    )

    sphi, lphi, rng = _geom(5)
    lphi = jnp.asarray(
        np.where(
            np.random.default_rng(6).random(N) < 0.5, -1.0, 1.0
        ).astype(np.float32)
    )
    w = compute_solid_frac_3d(sphi)
    shapes = [
        tuple(n + (1 if i == a else 0) for i, n in enumerate(N))
        for a in range(3)
    ]
    v = tuple(
        jnp.asarray(rng.standard_normal(s).astype(np.float32)) for s in shapes
    )
    sv = jnp.zeros(DUAL + (3,), jnp.float32)
    b = pressure_rhs_3d(v, sv, lphi, w, (0.1, 0.1, 0.1))
    x_ref, st_ref = solve_cell_poisson(
        b, w, lphi, tol=1e-5, rel_tol=1e-5, max_iter=500, use_pallas="off"
    )
    x_pal, st_pal = solve_cell_poisson(
        b, w, lphi, tol=1e-5, rel_tol=1e-5, max_iter=500, use_pallas="on"
    )
    np.testing.assert_allclose(
        np.asarray(x_pal), np.asarray(x_ref), rtol=2e-3, atol=2e-4
    )
    assert abs(int(st_pal.iters) - int(st_ref.iters)) <= 2


def test_multigrid_preconditioner_cuts_iterations():
    """MG-PCG converges in far fewer iterations than Jacobi-PCG on a
    water-tank pressure system, to the same solution."""
    from python_fluid_simulation_tpu.solvers.pressure import (
        pressure_rhs_3d,
        solve_cell_poisson,
    )

    n = (24, 24, 24)
    dual = tuple(2 * k + 1 for k in n)
    rng = np.random.default_rng(0)
    sphi = jnp.ones(dual, jnp.float32)  # no solids: free-surface box
    lphi_np = np.ones(n, np.float32)
    lphi_np[2:-2, 2:-8, 2:-2] = -1.0
    lphi = jnp.asarray(lphi_np)
    w = compute_solid_frac_3d(sphi)
    shapes = [
        tuple(k + (1 if i == a else 0) for i, k in enumerate(n))
        for a in range(3)
    ]
    v = tuple(
        jnp.asarray(rng.standard_normal(s).astype(np.float32)) for s in shapes
    )
    sv = jnp.zeros(dual + (3,), jnp.float32)
    b = pressure_rhs_3d(v, sv, lphi, w, (0.05,) * 3)
    x_j, st_j = solve_cell_poisson(
        b, w, lphi, tol=1e-4, rel_tol=3e-6, max_iter=4000,
        use_pallas="off", precond_kind="jacobi",
    )
    x_m, st_m = solve_cell_poisson(
        b, w, lphi, tol=1e-4, rel_tol=3e-6, max_iter=4000,
        use_pallas="off", precond_kind="mg",
    )
    assert bool(st_m.converged) and bool(st_j.converged)
    assert int(st_m.iters) < int(st_j.iters) // 2, (
        int(st_m.iters), int(st_j.iters),
    )
    mask = lphi_np < 0
    np.testing.assert_allclose(
        np.asarray(x_m)[mask], np.asarray(x_j)[mask], atol=5e-3
    )


def test_blocked_pressure_matvec_matches_xla():
    """The grid-partitioned (x-slab streaming) kernel — the 128^3+ path —
    vs the XLA reference, on a deliberately awkward shape (odd extents,
    x not a multiple of the block)."""
    n = (13, 9, 17)
    dual = tuple(2 * k + 1 for k in n)
    rng = np.random.default_rng(7)
    sphi = jnp.asarray(rng.standard_normal(dual).astype(np.float32))
    lphi = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    w = compute_solid_frac_3d(sphi)
    mv_x, d_x = prepare_pressure_matvec(w, lphi, use_pallas="off")
    mv_b, d_b = prepare_pressure_matvec(w, lphi, use_pallas="blocked")
    p = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(mv_b(p)), np.asarray(mv_x(p)), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(d_b), np.asarray(d_x))


def test_blocked_coupled_matvec_matches_xla():
    n = (11, 7, 9)
    dual = tuple(2 * k + 1 for k in n)
    rng = np.random.default_rng(8)
    sphi = jnp.asarray(rng.standard_normal(dual).astype(np.float32))
    vol = jnp.asarray(rng.random(dual).astype(np.float32))
    shapes = [
        tuple(k + (1 if i == a else 0) for i, k in enumerate(n))
        for a in range(3)
    ]
    sphi_c = split_parity(sphi, 3)
    vol_c = split_parity(vol, 3)
    mv_x, _ = prepare_viscosity_matvec(
        0.3, sphi_c, vol_c, shapes, use_pallas="off"
    )
    mv_b, _ = prepare_viscosity_matvec(
        0.3, sphi_c, vol_c, shapes, use_pallas="blocked"
    )
    v = tuple(
        jnp.asarray(rng.standard_normal(s).astype(np.float32))
        for s in shapes
    )
    out_x = mv_x(v)
    out_b = mv_b(v)
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(out_b[a]), np.asarray(out_x[a]),
            rtol=1e-5, atol=1e-5,
        )


def test_blocked_solve_matches_generic():
    """solve_cell_poisson with the blocked matvec inside the generic CG."""
    from python_fluid_simulation_tpu.solvers.pressure import (
        pressure_rhs_3d,
        solve_cell_poisson,
    )

    n = (12, 10, 14)
    dual = tuple(2 * k + 1 for k in n)
    rng = np.random.default_rng(9)
    sphi = jnp.asarray(rng.standard_normal(dual).astype(np.float32))
    lphi = jnp.asarray(
        np.where(rng.random(n) < 0.5, -1.0, 1.0).astype(np.float32)
    )
    w = compute_solid_frac_3d(sphi)
    shapes = [
        tuple(k + (1 if i == a else 0) for i, k in enumerate(n))
        for a in range(3)
    ]
    v = tuple(
        jnp.asarray(rng.standard_normal(s).astype(np.float32)) for s in shapes
    )
    sv = jnp.zeros(dual + (3,), jnp.float32)
    b = pressure_rhs_3d(v, sv, lphi, w, (0.1, 0.1, 0.1))
    x_ref, st_ref = solve_cell_poisson(
        b, w, lphi, tol=1e-5, rel_tol=1e-5, max_iter=500, use_pallas="off"
    )
    x_blk, st_blk = solve_cell_poisson(
        b, w, lphi, tol=1e-5, rel_tol=1e-5, max_iter=500,
        use_pallas="blocked",
    )
    np.testing.assert_allclose(
        np.asarray(x_blk), np.asarray(x_ref), rtol=2e-3, atol=2e-4
    )
    assert abs(int(st_blk.iters) - int(st_ref.iters)) <= 2


def test_fused_mg_level_kernels_match_xla_vcycle():
    """make_mg_preconditioner with the fused Pallas tail-level smoothers
    (interpret mode) == the pure-XLA V-cycle, unbatched and batched."""
    from python_fluid_simulation_tpu.ops import pallas_mg
    from python_fluid_simulation_tpu.solvers import multigrid as mgmod
    from python_fluid_simulation_tpu.solvers.pressure import (
        pressure_coefficients,
    )

    n = (24, 20, 22)
    rng = np.random.default_rng(0)
    lphi = jnp.asarray(rng.standard_normal(n).astype(np.float32)) - 0.5
    w = [
        jnp.asarray(
            rng.uniform(
                0.2,
                1.0,
                tuple(k + (1 if i == a else 0) for i, k in enumerate(n)),
            ).astype(np.float32)
        )
        for a in range(3)
    ]
    diag, coefs, _ = pressure_coefficients(w, lphi)
    r = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    z_ref = mgmod.make_mg_preconditioner(diag, coefs)(r)

    orig_avail = pallas_mg.level_kernels_available
    orig_make = pallas_mg.make_level_kernels
    pallas_mg.level_kernels_available = lambda s: True
    pallas_mg.make_level_kernels = (
        lambda d, c, **kw: orig_make(d, c, **{**kw, "interpret": True})
    )
    try:
        z_fused = mgmod.make_mg_preconditioner(diag, coefs)(r)
        np.testing.assert_allclose(
            np.asarray(z_fused), np.asarray(z_ref), rtol=1e-5, atol=1e-6
        )

        # batched: three jittered copies of the same stencil family
        systems = []
        for s in range(3):
            lp = jnp.asarray(
                rng.standard_normal(n).astype(np.float32)
            ) - 0.5
            d2, c2, _ = pressure_coefficients(w, lp)
            systems.append((d2, c2))
        rs = [
            jnp.asarray(rng.standard_normal(n).astype(np.float32))
            for _ in range(3)
        ]
        pallas_mg.level_kernels_available = orig_avail
        zb_ref = mgmod.make_batched_mg_preconditioner(systems)(rs)
        pallas_mg.level_kernels_available = lambda s: True
        zb_fused = mgmod.make_batched_mg_preconditioner(systems)(rs)
        for a, b in zip(zb_fused, zb_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            )
    finally:
        pallas_mg.level_kernels_available = orig_avail
        pallas_mg.make_level_kernels = orig_make


def test_fused_coupled_cg_matches_generic():
    """The fused blocked coupled Jacobi-PCG (ops/pallas_cg.py) solves the
    viscosity system to the same solution as the generic XLA cg() with
    the same tolerance, with iteration counts within +-2."""
    from python_fluid_simulation_tpu.ops.pallas_cg import (
        make_fused_coupled_cg,
    )
    from python_fluid_simulation_tpu.solvers.cg import cg
    from python_fluid_simulation_tpu.solvers.viscosity import (
        viscosity_rhs_3d,
        viscosity_term_fields,
    )

    n = (10, 8, 12)
    dual = tuple(2 * k + 1 for k in n)
    rng = np.random.default_rng(12)
    # mostly-fluid interior (positive sphi) with a solid floor, so the
    # operator has real structure but stays well-conditioned
    ys = np.broadcast_to(
        np.arange(dual[1], dtype=np.float32)[None, :, None], dual
    )
    sphi = jnp.asarray(ys - 2.5)
    vol = jnp.asarray(rng.uniform(0.2, 1.0, dual).astype(np.float32))
    shapes = [
        tuple(k + (1 if i == a else 0) for i, k in enumerate(n))
        for a in range(3)
    ]
    sphi_c = split_parity(sphi, 3)
    vol_c = split_parity(vol, 3)
    diags, per_axis, pdiags = viscosity_term_fields(
        0.4, sphi_c, vol_c, shapes, False
    )
    v = tuple(
        jnp.asarray(rng.standard_normal(s).astype(np.float32))
        for s in shapes
    )
    b = viscosity_rhs_3d(v, 0.4, sphi_c, vol_c, False)
    x0 = v

    from python_fluid_simulation_tpu.ops.indexing import sample

    def matvec(vs):
        out = []
        for a in range(3):
            acc = diags[a] * vs[a]
            for field, voff, coef in per_axis[a]:
                acc = acc + coef * sample(vs[field], voff, vs[a].shape, 0.0)
            out.append(acc)
        return tuple(out)

    x_ref, st = cg(
        matvec, b, x0, tol=1e-5, rel_tol=1e-6, max_iter=400,
        precond=lambda rs: tuple(r / d for r, d in zip(rs, pdiags)),
    )

    solve = make_fused_coupled_cg(
        diags, per_axis, shapes, pdiags,
        tol=1e-5, rel_tol=1e-6, max_iter=400, interpret=True,
    )
    x_f, iters, res, res0, thr = solve(b, x0)

    assert bool(res < thr)
    assert abs(int(iters) - int(st.iters)) <= 2, (int(iters), int(st.iters))
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(x_f[a]), np.asarray(x_ref[a]), rtol=2e-3, atol=2e-4
        )


def test_geom_cg_matvec_bitexact_vs_materialised():
    """One matvec of the geometry-recompute kernel (pallas_cg v2)
    matches the XLA matvec over the materialised coefficient fields to
    ~1 ulp: the same f32 products in the same association order; the
    only freedom left is XLA fusing mul+add chains into FMAs inside
    the compiled kernel (the eager reference rounds each op)."""
    from python_fluid_simulation_tpu.ops.indexing import sample
    from python_fluid_simulation_tpu.ops.pallas_cg import (
        make_fused_coupled_cg_geom,
    )
    from python_fluid_simulation_tpu.solvers.viscosity import (
        viscosity_term_fields,
    )

    n = (9, 11, 10)
    dual = tuple(2 * k + 1 for k in n)
    rng = np.random.default_rng(21)
    sphi = jnp.asarray(rng.standard_normal(dual).astype(np.float32))
    vol = jnp.asarray(rng.random(dual).astype(np.float32))
    shapes = [
        tuple(k + (1 if i == a else 0) for i, k in enumerate(n))
        for a in range(3)
    ]
    sphi_c = split_parity(sphi, 3)
    vol_c = split_parity(vol, 3)
    # s_mu as a traced-style f32 scalar, as the engine passes it — the
    # Python-float path folds sign*factor*s_mu in double and would
    # differ in the last ulp
    s_mu = jnp.float32(0.37)
    diags, per_axis, pdiags = viscosity_term_fields(
        s_mu, sphi_c, vol_c, shapes, False
    )
    v = tuple(
        jnp.asarray(rng.standard_normal(s).astype(np.float32))
        for s in shapes
    )

    solve = make_fused_coupled_cg_geom(
        sphi_c, vol_c, s_mu, shapes, pdiags,
        tol=0.0, rel_tol=0.0, max_iter=1, interpret=True,
    )
    lay = solve.layout
    q_pad, _ = solve.matvec_dq([lay.pad3(x) for x in v])
    q_geom = [
        qq[: s[0], : s[1], : s[2]] for qq, s in zip(q_pad, shapes)
    ]

    for a in range(3):
        acc = diags[a] * v[a]
        for field, voff, coef in per_axis[a]:
            acc = acc + coef * sample(v[field], voff, v[a].shape, 0.0)
        np.testing.assert_allclose(
            np.asarray(q_geom[a]), np.asarray(acc),
            rtol=1e-5, atol=1e-6,
        )


def test_geom_cg_solves_like_generic():
    """Full geometry-kernel CG vs the generic XLA cg() on a physical
    configuration (fluid interior over a solid floor)."""
    from python_fluid_simulation_tpu.ops.indexing import sample
    from python_fluid_simulation_tpu.ops.pallas_cg import (
        make_fused_coupled_cg_geom,
    )
    from python_fluid_simulation_tpu.solvers.cg import cg
    from python_fluid_simulation_tpu.solvers.viscosity import (
        viscosity_rhs_3d,
        viscosity_term_fields,
    )

    n = (10, 8, 12)
    dual = tuple(2 * k + 1 for k in n)
    rng = np.random.default_rng(31)
    ys = np.broadcast_to(
        np.arange(dual[1], dtype=np.float32)[None, :, None], dual
    )
    sphi = jnp.asarray(ys - 2.5)
    vol = jnp.asarray(rng.uniform(0.2, 1.0, dual).astype(np.float32))
    shapes = [
        tuple(k + (1 if i == a else 0) for i, k in enumerate(n))
        for a in range(3)
    ]
    sphi_c = split_parity(sphi, 3)
    vol_c = split_parity(vol, 3)
    s_mu = 0.4
    diags, per_axis, pdiags = viscosity_term_fields(
        s_mu, sphi_c, vol_c, shapes, False
    )
    v = tuple(
        jnp.asarray(rng.standard_normal(s).astype(np.float32))
        for s in shapes
    )
    b = viscosity_rhs_3d(v, s_mu, sphi_c, vol_c, False)

    def matvec(vs):
        out = []
        for a in range(3):
            acc = diags[a] * vs[a]
            for field, voff, coef in per_axis[a]:
                acc = acc + coef * sample(vs[field], voff, vs[a].shape, 0.0)
            out.append(acc)
        return tuple(out)

    x_ref, st = cg(
        matvec, b, v, tol=1e-5, rel_tol=1e-6, max_iter=400,
        precond=lambda rs: tuple(r / d for r, d in zip(rs, pdiags)),
    )
    solve = make_fused_coupled_cg_geom(
        sphi_c, vol_c, s_mu, shapes, pdiags,
        tol=1e-5, rel_tol=1e-6, max_iter=400, interpret=True,
    )
    x_f, iters, res, res0, thr = solve(b, v)
    assert bool(res < thr)
    assert abs(int(iters) - int(st.iters)) <= 2, (int(iters), int(st.iters))
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(x_f[a]), np.asarray(x_ref[a]), rtol=2e-3, atol=2e-4
        )


def test_fused_poisson_cg_matches_generic():
    """The fused blocked single-field Jacobi-PCG (the big-grid Poisson
    path of solve_cell_poisson) solves a ghost-fluid pressure system to
    the same solution as the generic XLA cg(), iterations within +-2."""
    from python_fluid_simulation_tpu.ops.indexing import shift
    from python_fluid_simulation_tpu.ops.pallas_cg import (
        make_fused_poisson_cg,
    )
    from python_fluid_simulation_tpu.solvers.cg import cg
    from python_fluid_simulation_tpu.solvers.pressure import (
        pressure_coefficients,
        pressure_rhs_3d,
    )

    sphi, _, rng = _geom(9)
    # mixed fluid/air interior so ghost-fluid fractions take both branches
    lphi = jnp.asarray(
        np.where(
            np.random.default_rng(10).random(N) < 0.6, -1.0, 1.0
        ).astype(np.float32)
    )
    w = compute_solid_frac_3d(sphi)
    shapes = [
        tuple(n + (1 if i == a else 0) for i, n in enumerate(N))
        for a in range(3)
    ]
    v = tuple(
        jnp.asarray(rng.standard_normal(s).astype(np.float32))
        for s in shapes
    )
    sv = jnp.zeros(DUAL + (3,), jnp.float32)
    b = pressure_rhs_3d(v, sv, lphi, w, (0.1, 0.1, 0.1))
    diag, coefs, pdiag = pressure_coefficients(w, lphi)

    def matvec(p):
        out = diag * p
        for off, c in coefs:
            out = out + c * shift(p, off, 0.0)
        return out

    x_ref, st = cg(
        matvec, b, jnp.zeros_like(b), tol=1e-5, rel_tol=1e-5,
        max_iter=500, precond=lambda r: r / pdiag,
    )
    solve = make_fused_poisson_cg(
        diag, coefs, pdiag,
        tol=1e-5, rel_tol=1e-5, max_iter=500, interpret=True,
    )
    x_f, iters, res, res0, thr = solve(b)
    assert bool(res < thr)
    assert abs(int(iters) - int(st.iters)) <= 2, (int(iters), int(st.iters))
    np.testing.assert_allclose(
        np.asarray(x_f), np.asarray(x_ref), rtol=2e-3, atol=2e-4
    )


def test_blocked_coupled_matvec_geom_matches_direct():
    """The standalone geometry-recompute coupled matvec (the big-grid
    MG route's outer operator) matches viscosity_matvec_3d."""
    from python_fluid_simulation_tpu.ops.pallas_cg import (
        make_blocked_coupled_matvec_geom,
    )
    from python_fluid_simulation_tpu.solvers.viscosity import (
        viscosity_matvec_3d,
    )

    sphi, _, rng = _geom(21)
    vol = jnp.asarray(rng.uniform(0.1, 1.0, DUAL).astype(np.float32))
    shapes = [
        tuple(n + (1 if i == a else 0) for i, n in enumerate(N))
        for a in range(3)
    ]
    sphi_c = split_parity(sphi, 3)
    vol_c = split_parity(vol, 3)
    v = tuple(
        jnp.asarray(rng.standard_normal(s).astype(np.float32))
        for s in shapes
    )
    ref = viscosity_matvec_3d(v, 0.7, sphi_c, vol_c, False)
    mv = make_blocked_coupled_matvec_geom(
        sphi_c, vol_c, 0.7, shapes, interpret=True
    )
    out = mv(v)
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(out[a]), np.asarray(ref[a]), rtol=1e-5, atol=1e-5
        )


def test_same_axis_geom_matvec_matches_block_stencil():
    """same_axis_only=True geometry kernel == the XLA apply of the
    materialised same-axis 7-point sub-operator (the exact fields the
    MG block preconditioner smooths/coarsens)."""
    from python_fluid_simulation_tpu.ops.indexing import sample
    from python_fluid_simulation_tpu.ops.pallas_cg import (
        make_blocked_coupled_matvec_geom,
    )
    from python_fluid_simulation_tpu.solvers.viscosity import (
        viscosity_axis_block_stencil,
    )

    sphi, _, rng = _geom(23)
    vol = jnp.asarray(rng.uniform(0.1, 1.0, DUAL).astype(np.float32))
    shapes = [
        tuple(n + (1 if i == a else 0) for i, n in enumerate(N))
        for a in range(3)
    ]
    sphi_c = split_parity(sphi, 3)
    vol_c = split_parity(vol, 3)
    v = tuple(
        jnp.asarray(rng.standard_normal(s).astype(np.float32))
        for s in shapes
    )
    mv = make_blocked_coupled_matvec_geom(
        sphi_c, vol_c, 0.7, shapes, interpret=True, same_axis_only=True
    )
    out = mv(v)
    for a in range(3):
        diag, coefs, _, _ = viscosity_axis_block_stencil(
            a, 0.7, sphi_c, vol_c, shapes[a]
        )
        ref = diag * v[a]
        for voff, coef in coefs:
            ref = ref + coef * sample(v[a], voff, shapes[a], 0.0)
        np.testing.assert_allclose(
            np.asarray(out[a]), np.asarray(ref), rtol=1e-5, atol=1e-5
        )


def _lean_mg_setup(seed=29, mu=0.7):
    sphi, _, rng = _geom(seed)
    vol = jnp.asarray(rng.uniform(0.1, 1.0, DUAL).astype(np.float32))
    shapes = [
        tuple(n + (1 if i == a else 0) for i, n in enumerate(N))
        for a in range(3)
    ]
    sphi_c = split_parity(sphi, 3)
    vol_c = split_parity(vol, 3)
    from python_fluid_simulation_tpu.ops.pallas_cg import (
        make_blocked_coupled_matvec_geom,
    )
    from python_fluid_simulation_tpu.solvers.viscosity import (
        make_viscosity_mg_preconditioner_lean,
        viscosity_matvec_3d,
    )

    blk = make_blocked_coupled_matvec_geom(
        sphi_c, vol_c, mu, shapes, interpret=True, same_axis_only=True
    )
    precond = make_viscosity_mg_preconditioner_lean(
        mu, sphi_c, vol_c, shapes, False, blk
    )

    def full_mv(vs):
        return viscosity_matvec_3d(vs, mu, sphi_c, vol_c, False)

    def actives():
        from python_fluid_simulation_tpu.solvers.viscosity import (
            viscosity_axis_block_stencil,
        )

        return [
            viscosity_axis_block_stencil(a, mu, sphi_c, vol_c, shapes[a])[3]
            for a in range(3)
        ]

    return rng, shapes, precond, full_mv, actives()


def test_lean_viscosity_mg_preconditioner_is_symmetric():
    """<M^-1 u, v> == <u, M^-1 v> on active-supported vectors: the lean
    two-grid cycle must stay a fixed symmetric operator to sit inside
    plain PCG."""
    rng, shapes, precond, _, act = _lean_mg_setup()

    def rand_masked():
        return tuple(
            jnp.where(
                a, jnp.asarray(rng.standard_normal(s).astype(np.float32)),
                0.0,
            )
            for s, a in zip(shapes, act)
        )

    u = rand_masked()
    w = rand_masked()
    mu_ = precond(u)
    mw = precond(w)
    lhs = sum(float(jnp.vdot(x, y)) for x, y in zip(mu_, w))
    rhs = sum(float(jnp.vdot(x, y)) for x, y in zip(u, mw))
    scale = sum(float(jnp.vdot(x, x)) ** 0.5 for x in mu_)
    assert abs(lhs - rhs) < 1e-4 * max(scale, 1.0), (lhs, rhs)


def test_lean_viscosity_mg_pcg_matches_jacobi_pcg():
    """CG with the lean two-grid preconditioner reaches the same solution
    as Jacobi-PCG on the coupled system, in no more iterations."""
    from python_fluid_simulation_tpu.solvers.cg import cg

    rng, shapes, precond, full_mv, act = _lean_mg_setup()
    # SPD-consistent RHS: b = A x_true on an active-supported x_true
    x_true = tuple(
        jnp.where(
            a, jnp.asarray(rng.standard_normal(s).astype(np.float32)), 0.0
        )
        for s, a in zip(shapes, act)
    )
    b = full_mv(x_true)
    x0 = tuple(jnp.zeros(s, jnp.float32) for s in shapes)
    x_mg, st_mg = cg(
        full_mv, b, x0, tol=1e-6, rel_tol=1e-8, max_iter=600,
        precond=precond,
    )
    x_j, st_j = cg(
        full_mv, b, x0, tol=1e-6, rel_tol=1e-8, max_iter=600,
        precond=None,
    )
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(x_mg[a]), np.asarray(x_j[a]), rtol=2e-3, atol=2e-4
        )
    assert int(st_mg.iters) <= int(st_j.iters), (
        int(st_mg.iters), int(st_j.iters),
    )


def test_permuted_geom_matvec_equivariance():
    """Coordinate-relabelled geom kernel (tall-grid route) == original
    XLA matvec: permute geometry/fields, apply, unpermute."""
    from python_fluid_simulation_tpu.ops.pallas_cg import (
        make_blocked_coupled_matvec_geom,
    )
    from python_fluid_simulation_tpu.solvers.viscosity import (
        _permute_cls,
        _permute_fields,
        _permute_shapes,
        _unpermute_fields,
        viscosity_matvec_3d,
    )

    sphi, _, rng = _geom(31)
    vol = jnp.asarray(rng.uniform(0.1, 1.0, DUAL).astype(np.float32))
    shapes = [
        tuple(n + (1 if i == a else 0) for i, n in enumerate(N))
        for a in range(3)
    ]
    sphi_c = split_parity(sphi, 3)
    vol_c = split_parity(vol, 3)
    v = tuple(
        jnp.asarray(rng.standard_normal(s).astype(np.float32))
        for s in shapes
    )
    ref = viscosity_matvec_3d(v, 0.7, sphi_c, vol_c, False)
    for perm in ((1, 0, 2), (2, 1, 0), (1, 2, 0)):
        pshapes = _permute_shapes(perm, shapes)
        mv_p = make_blocked_coupled_matvec_geom(
            _permute_cls(sphi_c, perm), _permute_cls(vol_c, perm),
            0.7, pshapes, interpret=True,
        )
        out = _unpermute_fields(perm, mv_p(_permute_fields(perm, v)))
        for a in range(3):
            np.testing.assert_allclose(
                np.asarray(out[a]), np.asarray(ref[a]),
                rtol=1e-5, atol=1e-5,
                err_msg=f"perm={perm} axis={a}",
            )


def test_binned_segment_reduce_matches_numpy():
    """ops/pallas_binned (the default TPU reduce+placement engine):
    interpret-mode parity for sum and min, incl. padding dump rows and
    chunk-spanning segments."""
    import numpy as np

    from python_fluid_simulation_tpu.ops.pallas_binned import (
        binned_segment_reduce,
    )

    rng = np.random.default_rng(7)
    K, C, M = 9000, 30, 5000
    ids = np.sort(rng.integers(0, M, K)).astype(np.int32)
    ids[-100:] = M + 7 + np.arange(100)  # padding dump rows
    # a long segment to exercise chunk-partial accumulation
    ids[1000:1400] = ids[1000]
    ids = np.sort(ids)
    vals = rng.standard_normal((K, C)).astype(np.float32)
    live = ids < M

    out = binned_segment_reduce(
        jnp.asarray(vals), jnp.asarray(ids), M, op="add", fill=0.0,
        interpret=True,
    )
    ref = np.zeros((M, C), np.float64)
    np.add.at(ref, ids[live], vals[live].astype(np.float64))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)

    outm = binned_segment_reduce(
        jnp.asarray(vals), jnp.asarray(ids), M, op="min", fill=9.5,
        interpret=True,
    )
    refm = np.full((M, C), 9.5, np.float64)
    np.minimum.at(refm, ids[live], vals[live].astype(np.float64))
    np.testing.assert_allclose(np.asarray(outm), refm, atol=0)


def test_binned_segment_broadcast_matches_numpy():
    """ops/pallas_binned broadcast (the reduce's mirror): interpret-mode
    parity incl. padding dump rows (-> zeros), chunk-boundary segments,
    and empty table rows."""
    import numpy as np

    from python_fluid_simulation_tpu.ops.pallas_binned import (
        binned_segment_broadcast,
    )

    rng = np.random.default_rng(11)
    K, C, M = 9000, 54, 5000
    ids = np.sort(rng.integers(0, M, K)).astype(np.int32)
    ids[-100:] = M + 7 + np.arange(100)  # padding dump rows
    ids[1000:1400] = ids[1000]  # a segment spanning chunk partials
    ids = np.sort(ids)
    table = rng.standard_normal((M, C)).astype(np.float32)
    live = ids < M

    out = np.asarray(
        binned_segment_broadcast(
            jnp.asarray(table), jnp.asarray(ids), interpret=True
        )
    )
    ref = np.zeros((K, C), np.float32)
    ref[live] = table[ids[live]]
    np.testing.assert_array_equal(out, ref)


def test_segment_min_clamps_at_fill_on_all_routes():
    """r4 advisor low: segment_min_sorted's contract is
    min(fill, segment min) on EVERY route — values above fill (level-set
    distances past the 3*gdx background) must clamp identically on the
    XLA fallback and the binned kernel (which inits tiles at fill)."""
    import numpy as np

    from python_fluid_simulation_tpu.ops.pallas_binned import (
        binned_segment_reduce,
    )
    from python_fluid_simulation_tpu.ops.scatter import (
        segment_min_sorted,
    )

    rng = np.random.default_rng(3)
    K, C, M = 600, 8, 40
    fill = 0.5
    ids = np.sort(rng.integers(0, M, K)).astype(np.int32)
    # values straddle the fill: some segments' true min EXCEEDS fill
    vals = rng.uniform(0.2, 1.5, (K, C)).astype(np.float32)
    ref = np.full((M, C), fill, np.float32)
    np.minimum.at(ref, ids, np.minimum(vals, fill))

    got_xla = np.asarray(
        segment_min_sorted(jnp.asarray(vals), jnp.asarray(ids), M, fill)
    )
    np.testing.assert_array_equal(got_xla, ref)

    got_binned = np.asarray(
        binned_segment_reduce(
            jnp.asarray(vals), jnp.asarray(ids), M, op="min",
            fill=fill, interpret=True,
        )
    )
    np.testing.assert_array_equal(got_binned, ref)


def test_binned_reduce_channels_first_matches():
    """cf mode (kernel-side per-tile transpose) == transpose of the
    row-major result, for add and min."""
    import numpy as np

    from python_fluid_simulation_tpu.ops.pallas_binned import (
        binned_segment_reduce,
    )

    rng = np.random.default_rng(5)
    K, C, M = 9000, 30, 5000
    ids = np.sort(rng.integers(0, M, K)).astype(np.int32)
    ids[-50:] = M + np.arange(50)
    vals = rng.standard_normal((K, C)).astype(np.float32)
    for op, fill in (("add", 0.0), ("min", 9.5)):
        rm = np.asarray(
            binned_segment_reduce(
                jnp.asarray(vals), jnp.asarray(ids), M, op=op,
                fill=fill, interpret=True,
            )
        )
        cf = np.asarray(
            binned_segment_reduce(
                jnp.asarray(vals), jnp.asarray(ids), M, op=op,
                fill=fill, interpret=True, channels_first=True,
            )
        )
        np.testing.assert_array_equal(cf, rm.T)


def test_binned_reduce_scan_mode_matches_serial():
    """The opt-in two-phase scan kernel (PFS_SCAN_REDUCE=1, recorded
    in-step loss) stays bit-identical to the serial row loop."""
    import os

    import numpy as np

    from python_fluid_simulation_tpu.ops.pallas_binned import (
        binned_segment_reduce,
    )

    rng = np.random.default_rng(9)
    K, C, M = 9000, 54, 5000
    ids = np.sort(rng.integers(0, M, K)).astype(np.int32)
    ids[1000:1600] = ids[1000]  # chunk-spanning segment
    ids = np.sort(ids)
    vals = rng.standard_normal((K, C)).astype(np.float32)
    args = (jnp.asarray(vals), jnp.asarray(ids), M)
    for op, fill in (("add", 0.0), ("min", 9.5)):
        for cf in (False, True):
            serial = np.asarray(
                binned_segment_reduce(
                    *args, op=op, fill=fill, interpret=True,
                    channels_first=cf,
                )
            )
            os.environ["PFS_SCAN_REDUCE"] = "1"
            try:
                binned_segment_reduce._clear_cache()
                scan = np.asarray(
                    binned_segment_reduce(
                        *args, op=op, fill=fill, interpret=True,
                        channels_first=cf,
                    )
                )
            finally:
                del os.environ["PFS_SCAN_REDUCE"]
                binned_segment_reduce._clear_cache()
            np.testing.assert_array_equal(scan, serial)
