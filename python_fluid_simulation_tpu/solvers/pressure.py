"""Variational cut-cell pressure projection, matrix-free (2D & 3D).

TPU-native replacement for ``solver/PressureCGSolver3D.py`` and its 2D
twin ``PressureCGSolver2D.py`` (3 CUDA kernels + host CG loop each) — all
functions are dimension-generic (d inferred from lphi.ndim); the ``_3d``
suffix is kept for call-site clarity with ``_2d`` aliases below.  The 7-point ghost-fluid matvec, RHS build and velocity
update are pure XLA stencils (shifts + where); the CG loop is the shared
on-device solver in ``cg.py``.  The dt-scaled variational assembly flag
reproduces the *intent* of the abandoned ``PressureCGSolver3D_batty.py``
(term = w·dt/√dx, :220-294) — same linear system, scaled — without its
bugs (SURVEY §2.1).

Solution convention matches the reference: x = -pressure · dt / (ρ·V_cell)
(PressureCGSolver3D.py:225).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax.numpy as jnp

from python_fluid_simulation_tpu.ops.fractions import edge_in_fraction
from python_fluid_simulation_tpu.ops.indexing import (
    dual_sample,
    face_parity,
    interior_mask,
    sample,
    shift,
)
from python_fluid_simulation_tpu.solvers.cg import SolveStats, cg

_GHOST_CLIP = (0.01, 1.0)  # frac = clamp(phi/(phi-nphi), 0.01, 1)


def _ghost_frac(phi, nphi):
    denom = phi - nphi
    safe = jnp.where(denom == 0, 1.0, denom)
    return jnp.clip(phi / safe, *_GHOST_CLIP)


def _sv_component(sv, a):
    """sv is either the raw (dual..., d) array or a per-component list of
    pre-split parity-class dicts (one strided split per step, reused)."""
    return sv[a] if isinstance(sv, (list, tuple)) else sv[..., a]


def _face_w_v(arrs, axis, side, cell_shape):
    """Face-array value seen from cells: side=+1 the high face (idx+1),
    side=-1 the low face (idx)."""
    off = [0] * len(cell_shape)
    if side > 0:
        off[axis] = 1
    return sample(arrs, tuple(off), cell_shape, 0.0)


def pressure_rhs_3d(
    v_faces: Sequence[jnp.ndarray],
    sv: jnp.ndarray,
    lphi: jnp.ndarray,
    w_faces: Sequence[jnp.ndarray],
    cell_size: Sequence[float],
) -> jnp.ndarray:
    """Divergence RHS with solid-velocity flux correction.

    Reference: initialize_solver_kernel (PressureCGSolver3D.py:6-50).
    """
    shape = lphi.shape
    d = len(shape)
    b = jnp.zeros(shape, dtype=v_faces[0].dtype)
    for a in range(d):
        h = cell_size[a]
        for side in (+1, -1):
            w = _face_w_v(w_faces[a], a, side, shape)
            v = _face_w_v(v_faces[a], a, side, shape)
            sgn = 1.0 if side > 0 else -1.0
            b = b + sgn * w * v / h
            # solid-velocity flux where the face is partially solid (w<1):
            # sv sampled at the face site, e.g. sv[2x+2, 2y+1, 2z+1, 0]
            off = [0] * d
            off[a] = side
            svf = dual_sample(_sv_component(sv, a), (1,) * d, tuple(off), shape, 0.0)
            b = b - jnp.where(w < 1, sgn * w * svf / h, 0.0)
    active = interior_mask(shape) & (lphi < 0)
    return jnp.where(active, b, 0.0)


def pressure_matvec_3d(
    p: jnp.ndarray,
    w_faces: Sequence[jnp.ndarray],
    lphi: jnp.ndarray,
    unit_diag_weight: bool = False,
) -> jnp.ndarray:
    """7-point ghost-fluid matvec.

    Reference: matvecmul_kernel (PressureCGSolver3D.py:52-130).  With
    ``unit_diag_weight=True`` the diagonal accumulates 1 (or 1/frac)
    instead of w — that is the density solver's variant
    (DensityCGSolver3D.py:117-194).
    """
    shape = lphi.shape
    d = len(shape)
    phi = lphi
    val = jnp.zeros(shape, dtype=p.dtype)
    diag = jnp.zeros(shape, dtype=p.dtype)
    for a in range(d):
        for side in (+1, -1):
            off = [0] * d
            off[a] = side
            nphi = shift(lphi, tuple(off), 1.0)  # out of range: non-fluid
            w = _face_w_v(w_faces[a], a, side, shape)
            nv = shift(p, tuple(off), 0.0)
            fluid_n = nphi < 0
            frac = _ghost_frac(phi, nphi)
            dw = jnp.ones_like(w) if unit_diag_weight else w
            val = val - jnp.where(fluid_n, w * nv, 0.0)
            diag = diag + jnp.where(fluid_n, dw, dw / frac)
    out = val + diag * p
    active = interior_mask(shape) & (lphi < 0)
    return jnp.where(active, out, 0.0)


def pressure_diag_3d(
    w_faces: Sequence[jnp.ndarray],
    lphi: jnp.ndarray,
    unit_diag_weight: bool = False,
) -> jnp.ndarray:
    """Operator diagonal (for Jacobi preconditioning); 1 outside the domain."""
    shape = lphi.shape
    d = len(shape)
    diag = jnp.zeros(shape, dtype=lphi.dtype)
    for a in range(d):
        for side in (+1, -1):
            off = [0] * d
            off[a] = side
            nphi = shift(lphi, tuple(off), 1.0)
            w = _face_w_v(w_faces[a], a, side, shape)
            frac = _ghost_frac(lphi, nphi)
            dw = jnp.ones_like(w) if unit_diag_weight else w
            diag = diag + jnp.where(nphi < 0, dw, dw / frac)
    active = interior_mask(shape) & (lphi < 0)
    return jnp.where(active & (diag > 0), diag, 1.0)


def apply_pressure_3d(
    v_faces: Sequence[jnp.ndarray],
    p: jnp.ndarray,
    w_faces: Sequence[jnp.ndarray],
    sv: jnp.ndarray,
    lphi: jnp.ndarray,
    cell_size: Sequence[float],
) -> Tuple[jnp.ndarray, ...]:
    """Velocity update v += ∇x·h/θ with solid-velocity blending.

    Reference: apply_pressure_kernel (PressureCGSolver3D.py:132-153).
    Faces are active for axis-index in [1, gres-1] — the trailing face
    plane (index gres) is never updated, matching the kernel bounds (:135).
    """
    gres = lphi.shape
    d = len(gres)
    out = []
    for a in range(d):
        fshape = v_faces[a].shape
        off_m = [0] * d
        off_m[a] = -1
        phi_c = sample(lphi, (0,) * d, fshape, 1.0)
        phi_m = sample(lphi, tuple(off_m), fshape, 1.0)
        p_c = sample(p, (0,) * d, fshape, 0.0)
        p_m = sample(p, tuple(off_m), fshape, 0.0)
        theta = jnp.clip(edge_in_fraction(phi_c, phi_m), *_GHOST_CLIP)
        new_v = v_faces[a] + (p_c - p_m) * cell_size[a] / theta
        w = w_faces[a]
        svf = dual_sample(_sv_component(sv, a), face_parity(a, d), (0,) * d, fshape, 0.0)
        blended = w * new_v + (1.0 - w) * svf
        active = (
            interior_mask(fshape, active_hi=gres)
            & ((phi_c < 0) | (phi_m < 0))
        )
        out.append(jnp.where(active, blended, v_faces[a]))
    return tuple(out)


def pressure_coefficients(
    w_faces: Sequence[jnp.ndarray],
    lphi: jnp.ndarray,
    unit_diag_weight: bool = False,
):
    """Loop-invariant stencil coefficient fields: (diag, [(off, coef)],
    precond_diag).  The geometry terms are computed once; the CG loop body
    is then pure shift/multiply-add."""
    shape = lphi.shape
    d = len(shape)
    active = interior_mask(shape) & (lphi < 0)
    diag = jnp.zeros(shape, dtype=lphi.dtype)
    coefs = []
    for a in range(d):
        for side in (+1, -1):
            off = [0] * d
            off[a] = side
            nphi = shift(lphi, tuple(off), 1.0)
            w = _face_w_v(w_faces[a], a, side, shape)
            fluid_n = nphi < 0
            frac = _ghost_frac(lphi, nphi)
            dw = jnp.ones_like(w) if unit_diag_weight else w
            diag = diag + jnp.where(fluid_n, dw, dw / frac)
            coefs.append(
                (tuple(off), jnp.where(active & fluid_n, -w, 0.0))
            )
    diag = jnp.where(active, diag, 0.0)
    precond_diag = jnp.where(active & (diag > 0), diag, 1.0)
    return diag, coefs, precond_diag


def prepare_pressure_matvec(
    w_faces: Sequence[jnp.ndarray],
    lphi: jnp.ndarray,
    unit_diag_weight: bool = False,
    use_pallas: str = "auto",
):
    """(matvec_fn, precond_diag) with matvec_fn == pressure_matvec_3d."""
    d = lphi.ndim
    diag, coefs, precond_diag = pressure_coefficients(
        w_faces, lphi, unit_diag_weight
    )

    if d == 3 and use_pallas != "off":
        from python_fluid_simulation_tpu.ops.pallas_stencils import (
            blocked_pallas_available,
            make_blocked_stencil_matvec,
            make_stencil_matvec,
            pallas_available,
        )

        if use_pallas == "on" or (
            use_pallas != "blocked" and pallas_available(lphi.shape, 4)
        ):
            return make_stencil_matvec(diag, coefs), precond_diag
        # too big for the VMEM-resident kernel: stream x-slabs instead
        if use_pallas == "blocked" or blocked_pallas_available(
            lphi.shape, n_ops=14
        ):
            return make_blocked_stencil_matvec(diag, coefs), precond_diag

    def matvec(p):
        out = diag * p
        for off, c in coefs:
            out = out + c * shift(p, off, 0.0)
        return out

    return matvec, precond_diag


class PressureResult(NamedTuple):
    v_faces: Tuple[jnp.ndarray, ...]
    pressure: jnp.ndarray  # x = -p dt/(rho Vcell)
    stats: SolveStats


def pressure_solve_3d(
    v_faces: Sequence[jnp.ndarray],
    sv: jnp.ndarray,
    lphi: jnp.ndarray,
    w_faces: Sequence[jnp.ndarray],
    cell_size: Sequence[float],
    *,
    tol: float = 1e-3,
    rel_tol: float = 1e-6,
    max_iter: int = 2000,
    jacobi_precond: bool = True,
    dt_scale: float | None = None,
    use_pallas: str = "auto",
    precond_kind: str = "jacobi",
    mg_opts=None,
    mesh=None,
) -> PressureResult:
    """Full projection: RHS → CG → apply.

    Reference: PressureCGSolver3D.solve (:192-226); initial guess x = 0
    (:198).  ``dt_scale`` engages the Batty-style dt-scaled assembly
    (PressureCGSolver3D_batty.py intent): both sides scale by dt so the
    solution is identical after unscaling.
    """
    b = pressure_rhs_3d(v_faces, sv, lphi, w_faces, cell_size)
    x, stats = solve_cell_poisson(
        b, w_faces, lphi,
        tol=tol, rel_tol=rel_tol, max_iter=max_iter,
        jacobi_precond=jacobi_precond, dt_scale=dt_scale,
        use_pallas=use_pallas, precond_kind=precond_kind,
        mg_opts=mg_opts, mesh=mesh,
    )
    new_v = apply_pressure_3d(v_faces, x, w_faces, sv, lphi, cell_size)
    return PressureResult(new_v, x, stats)


def solve_cell_poisson(
    b: jnp.ndarray,
    w_faces: Sequence[jnp.ndarray],
    lphi: jnp.ndarray,
    *,
    tol: float,
    rel_tol: float,
    max_iter: int,
    jacobi_precond: bool = True,
    dt_scale: float | None = None,
    unit_diag_weight: bool = False,
    use_pallas: str = "auto",
    wz_bug_coefs=None,
    precond_kind: str = "jacobi",
    mg_opts=None,
    mesh=None,
):
    """Shared CG driver for the cell-centred ghost-fluid systems
    (pressure & density).  With a ``mesh`` the solve runs as the
    distributed shard_map PCG over x-slabs (1 halo exchange + 2 psums per
    iteration, parallel/halo.py); single-device it uses the single-kernel
    Pallas PCG (the whole solve as one fused kernel, vectors
    VMEM-resident) when available, else the generic on-device
    while_loop CG."""
    from python_fluid_simulation_tpu.solvers.cg import SolveStats

    d = lphi.ndim
    if wz_bug_coefs is not None:
        diag, coefs, precond_diag = wz_bug_coefs
    else:
        diag, coefs, precond_diag = pressure_coefficients(
            w_faces, lphi, unit_diag_weight
        )
    s = 1.0 if dt_scale is None else dt_scale

    if mesh is not None and d == 3:
        from python_fluid_simulation_tpu.parallel.halo import (
            distributed_cell_poisson,
        )

        pd = precond_diag if jacobi_precond else jnp.ones_like(precond_diag)
        x, iters, res, res0 = distributed_cell_poisson(
            mesh,
            s * b,
            s * diag,
            [(off, s * c) for off, c in coefs],
            s * pd,
            tol=tol,
            rel_tol=rel_tol,
            max_iter=max_iter,
        )
        thresh = jnp.maximum(
            jnp.float32(tol) ** 2, jnp.float32(rel_tol) ** 2 * res0
        )
        return x, SolveStats(
            iters=iters, residual=res, initial_residual=res0,
            converged=res < thresh,
        )

    if (
        d == 3
        and dt_scale is None
        and jacobi_precond
        and precond_kind == "jacobi"
        and use_pallas != "off"
    ):
        from python_fluid_simulation_tpu.ops.pallas_stencils import (
            make_stencil_cg,
            pallas_available,
        )

        if use_pallas == "on" or pallas_available(lphi.shape, 8):
            solve = make_stencil_cg(
                diag, coefs, precond_diag,
                tol=tol, rel_tol=rel_tol, max_iter=max_iter,
            )
            x, iters, res, res0 = solve(b)
            thresh = jnp.maximum(
                jnp.float32(tol) ** 2, jnp.float32(rel_tol) ** 2 * res0
            )
            return x, SolveStats(
                iters=iters, residual=res, initial_residual=res0,
                converged=res < thresh,
            )

    if (
        d == 3
        and jacobi_precond
        and precond_kind == "jacobi"
        and use_pallas != "off"
    ):
        # big-grid Jacobi regime (full-VMEM residency unavailable): the
        # fused blocked PCG keeps the CG state in the padded blocked
        # layout for the whole solve — no pad/slice round trip and no
        # separate XLA vector ops per iteration.  dt_scale rides along
        # as a uniform system scaling ((sA)x = sb, same solution; the
        # XLA fallback below solves the scaled system too, so residual
        # thresholds are comparable).
        from python_fluid_simulation_tpu.ops.pallas_cg import (
            fused_poisson_cg_available,
            make_fused_poisson_cg,
        )

        if fused_poisson_cg_available(lphi.shape):
            solve = make_fused_poisson_cg(
                s * diag,
                [(off, s * c) for off, c in coefs],
                s * precond_diag,
                tol=tol, rel_tol=rel_tol, max_iter=max_iter,
            )
            x, iters, res, res0, thr = solve(s * b)
            return x, SolveStats(
                iters=iters, residual=res, initial_residual=res0,
                converged=res < thr,
            )

    blocked_mv = None
    if d == 3 and use_pallas != "off":
        from python_fluid_simulation_tpu.ops.pallas_stencils import (
            blocked_pallas_available,
            make_blocked_stencil_matvec,
        )

        if use_pallas == "blocked" or blocked_pallas_available(
            lphi.shape, n_ops=14
        ):
            blocked_mv = make_blocked_stencil_matvec(diag, coefs)

    if blocked_mv is not None:

        def matvec(p):
            return s * blocked_mv(p) if dt_scale is not None else blocked_mv(p)

    else:

        def matvec(p):
            out = diag * p
            for off, c in coefs:
                out = out + c * shift(p, off, 0.0)
            return s * out

    precond = None
    if precond_kind == "mg":
        from python_fluid_simulation_tpu.solvers.multigrid import (
            make_mg_preconditioner,
        )

        # mg_opts: optional (n_smooth, min_dim, coarse_iters) cycle-shape
        # override (SolverConfig.mg_opts); level-0 smoothing rides the
        # blocked Pallas matvec when the grid qualifies for it.
        kw = {}
        if mg_opts is not None:
            kw = dict(
                n_smooth=int(mg_opts[0]),
                min_dim=int(mg_opts[1]),
                coarse_iters=int(mg_opts[2]),
            )
        mg = make_mg_preconditioner(
            diag, coefs, matvec0=blocked_mv, **kw
        )

        def precond(r):  # noqa: F811
            return mg(r) / s

    elif jacobi_precond:
        sdiag = s * precond_diag

        def precond(r):  # noqa: F811
            return r / sdiag

    return cg(
        matvec,
        s * b,
        jnp.zeros_like(b),
        tol=tol,
        rel_tol=rel_tol,
        max_iter=max_iter,
        precond=precond,
    )


# Dimension-generic: 2D aliases (reference: PressureCGSolver2D.py — same
# stencil structure with 5 points; kernel bounds and ghost-fluid clamp
# are identical, :46-120)
pressure_rhs_2d = pressure_rhs_3d
pressure_matvec_2d = pressure_matvec_3d
pressure_diag_2d = pressure_diag_3d
apply_pressure_2d = apply_pressure_3d
pressure_solve_2d = pressure_solve_3d
