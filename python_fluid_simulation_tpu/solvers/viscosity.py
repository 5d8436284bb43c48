"""Variational implicit viscosity (3D): coupled (vx,vy,vz) solve.

TPU-native replacement for ``solver/ViscosityCGSolver3D.py`` (8 CUDA
kernels + host CG) — the reference's hottest stencil (SURVEY §3.1): per
axis 6 same-field + 8 cross-field couplings, with control volumes sampled
from the dual-lattice fluid-volume field.

The three per-axis kernels are generated from ONE term table exploiting
the operator's cyclic symmetry; the table was verified literal-by-literal
against matvecmul_{x,y,z}_kernel (:248-456) and
initialize_solver_{x,y,z}_kernel (:41-246).  In dual-lattice offsets from
a face site (e_k = one dual step along axis k):

  diag  = vol(0) + s·( 2·vol(+e_a) + 2·vol(-e_a) + Σ_{t≠a} vol(+e_t)+vol(-e_t) )
  same-field a-dir:  cond ±2e_a  → -2s·vol(±e_a)·v_a(±1_a)
  same-field t-dir:  cond ±2e_t  → -s·vol(±e_t)·v_a(±1_t)
  cross-field t, hi: cond  e_a+e_t → -s·vol(+e_t)·v_t(+1_t)
                     cond -e_a+e_t → +s·vol(+e_t)·v_t(+1_t,-1_a)
  cross-field t, lo: cond  e_a-e_t → +s·vol(-e_t)·v_t(0)
                     cond -e_a-e_t → -s·vol(-e_t)·v_t(-1_a)

Matvec couples where the neighbour face site is fluid (sphi >= 0,
3D sign convention — note the 2D solver uses sphi > 0, SURVEY §2.1);
the RHS moves solid (Dirichlet) neighbour contributions to b with the
opposite sign, evaluated on velocities first extrapolated 3 Jacobi layers
into the solid (solve :573, extrapolate_kernel :8-39).

scale = dt/(cell_vol·rho); vol = lvol/(cell_vol·0.125)  (solve :567-568).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from python_fluid_simulation_tpu.ops.extrapolate import extrapolate
from python_fluid_simulation_tpu.ops.indexing import (
    dual_sample,
    face_parity,
    interior_mask,
    sample,
    split_parity,
)
from python_fluid_simulation_tpu.solvers.cg import SolveStats, cg


def _terms_for_axis(a: int, d: int = 3):
    """(cond_dual_offset, field, v_face_offset, vol_dual_offset, factor, sign)

    sign/factor are the MATVEC convention: val += sign*factor*s*vol*v.
    The RHS uses -sign with the solid-side condition.
    """
    terms = []

    def e(k, n=1):
        v = [0] * d
        v[k] = n
        return tuple(v)

    def add(cond, field, voff, vol, factor, sign):
        terms.append((cond, field, voff, vol, factor, sign))

    # same-field, face-axis direction (factor 2)
    for sgn in (+1, -1):
        add(e(a, 2 * sgn), a, e(a, sgn), e(a, sgn), 2.0, -1.0)
    # same-field, transverse directions
    for t in range(d):
        if t == a:
            continue
        for sgn in (+1, -1):
            add(e(t, 2 * sgn), a, e(t, sgn), e(t, sgn), 1.0, -1.0)
    # cross-field couplings
    for t in range(d):
        if t == a:
            continue
        ea, et = e(a), e(t)

        def plus(u, v):
            return tuple(x + y for x, y in zip(u, v))

        def minus(u, v):
            return tuple(x - y for x, y in zip(u, v))

        # hi side (+e_t volume)
        add(plus(ea, et), t, et, et, 1.0, -1.0)
        add(plus(tuple(-x for x in ea), et), t, minus(et, ea), et, 1.0, +1.0)
        # lo side (-e_t volume)
        add(minus(ea, et), t, (0,) * d, tuple(-x for x in et), 1.0, +1.0)
        add(
            minus(tuple(-x for x in ea), et),
            t,
            tuple(-x for x in ea),
            tuple(-x for x in et),
            1.0,
            -1.0,
        )
    return terms


def _is_fluid(sphi_vals, strict):
    """3D convention: fluid = sphi >= 0 (ViscosityCGSolver3D.py:272);
    2D convention: fluid = sphi > 0 (ViscosityCGSolver2D.py:129) —
    SURVEY §2.1 sign-convention divergence, preserved faithfully."""
    return sphi_vals > 0 if strict else sphi_vals >= 0


def _axis_fields(a, sphi, vol, shape):
    parity = face_parity(a, len(shape))

    def sph(off):
        return dual_sample(sphi, parity, off, shape, fill=-1.0)

    def vl(off):
        return dual_sample(vol, parity, off, shape, fill=0.0)

    return parity, sph, vl


def _diag_axis(a, s_mu, sphi, vol, shape):
    d = len(shape)
    _, sph, vl = _axis_fields(a, sphi, vol, shape)
    acc = vl((0,) * d)
    extra = jnp.zeros(shape, dtype=acc.dtype)
    for k in range(d):
        factor = 2.0 if k == a else 1.0
        for sgn in (+1, -1):
            off = [0] * d
            off[k] = sgn
            extra = extra + factor * vl(tuple(off))
    return acc + s_mu * extra


def viscosity_matvec_3d(
    v_faces: Sequence[jnp.ndarray],
    s_mu,
    sphi: jnp.ndarray,
    vol: jnp.ndarray,
    strict_fluid: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """One application of the coupled operator to (vx, vy[, vz])."""
    d = len(v_faces)
    out = []
    for a in range(d):
        shape = v_faces[a].shape
        _, sph, _ = _axis_fields(a, sphi, vol, shape)
        diag = _diag_axis(a, s_mu, sphi, vol, shape)
        val = diag * v_faces[a]
        for cond_off, field, voff, vol_off, factor, sign in _terms_for_axis(a, d):
            fluid_n = _is_fluid(
                dual_sample(sphi, face_parity(a, d), cond_off, shape, -1.0),
                strict_fluid,
            )
            vv = sample(v_faces[field], voff, shape, 0.0)
            vcoef = dual_sample(vol, face_parity(a, d), vol_off, shape, 0.0)
            val = val + jnp.where(
                fluid_n, sign * factor * s_mu * vcoef * vv, 0.0
            )
        active = interior_mask(shape) & _is_fluid(sph((0,) * d), strict_fluid)
        out.append(jnp.where(active, val, 0.0))
    return tuple(out)


def viscosity_rhs_3d(
    v_faces: Sequence[jnp.ndarray],
    s_mu,
    sphi: jnp.ndarray,
    vol: jnp.ndarray,
    strict_fluid: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """b_a = vol_c·v_a + Σ solid-neighbour Dirichlet terms.

    Reference: initialize_solver_{x,y,z}_kernel (:41-246); the input
    velocities must already be extrapolated into the solid.
    """
    d = len(v_faces)
    out = []
    for a in range(d):
        shape = v_faces[a].shape
        _, sph, vl = _axis_fields(a, sphi, vol, shape)
        b = vl((0,) * d) * v_faces[a]
        for cond_off, field, voff, vol_off, factor, sign in _terms_for_axis(a, d):
            solid_n = ~_is_fluid(
                dual_sample(sphi, face_parity(a, d), cond_off, shape, -1.0),
                strict_fluid,
            )
            vv = sample(v_faces[field], voff, shape, 0.0)
            vcoef = dual_sample(vol, face_parity(a, d), vol_off, shape, 0.0)
            b = b + jnp.where(
                solid_n, -sign * factor * s_mu * vcoef * vv, 0.0
            )
        active = interior_mask(shape) & _is_fluid(sph((0,) * d), strict_fluid)
        out.append(jnp.where(active, b, 0.0))
    return tuple(out)


def viscosity_diag_3d(s_mu, sphi, vol, face_shapes, strict_fluid=False):
    """Operator diagonal for Jacobi preconditioning (1 where inactive)."""
    d = len(face_shapes)
    out = []
    for a in range(d):
        shape = face_shapes[a]
        _, sph, _ = _axis_fields(a, sphi, vol, shape)
        diag = _diag_axis(a, s_mu, sphi, vol, shape)
        active = interior_mask(shape) & _is_fluid(sph((0,) * d), strict_fluid)
        out.append(jnp.where(active & (diag > 0), diag, 1.0))
    return tuple(out)


def viscosity_term_fields(
    s_mu,
    sphi: jnp.ndarray,
    vol: jnp.ndarray,
    face_shapes,
    strict_fluid: bool = False,
):
    """Materialise the 14-term coefficient fields per axis once, so each
    CG iteration is 42 shift/multiply-adds on face arrays (the geometry
    samples of the big (2N+1)^d dual lattice are loop invariants).

    Returns (diags, per_axis, pdiags) where per_axis[a] is a list of
    (field, voff, coef) with coef shaped like face array a.
    """
    d = len(face_shapes)
    per_axis = []
    diags = []
    pdiags = []
    for a in range(d):
        shape = face_shapes[a]
        _, sph, _ = _axis_fields(a, sphi, vol, shape)
        active = interior_mask(shape) & _is_fluid(
            sph((0,) * d), strict_fluid
        )
        diag_raw = _diag_axis(a, s_mu, sphi, vol, shape)
        diag = jnp.where(active, diag_raw, 0.0)
        terms = []
        for cond_off, field, voff, vol_off, factor, sign in _terms_for_axis(a, d):
            fluid_n = _is_fluid(
                dual_sample(sphi, face_parity(a, d), cond_off, shape, -1.0),
                strict_fluid,
            )
            vcoef = dual_sample(vol, face_parity(a, d), vol_off, shape, 0.0)
            coef = jnp.where(
                active & fluid_n, sign * factor * s_mu * vcoef, 0.0
            )
            terms.append((field, voff, coef))
        per_axis.append(terms)
        diags.append(diag)
        pdiags.append(jnp.where(active & (diag_raw > 0), diag_raw, 1.0))
    return diags, per_axis, pdiags


def make_viscosity_mg_preconditioner(diags, per_axis):
    """Block-diagonal multigrid preconditioner for the coupled system.

    The preconditioner drops the cross-field couplings and runs one
    Galerkin-MG V-cycle per axis on the same-field 7-point sub-operator
    (diagonal blocks of an SPD matrix are SPD, and each is exactly the
    stencil form solvers/multigrid.py coarsens).  The reference runs
    unpreconditioned CG on this system (ViscosityCGSolver3D.py:588-612) —
    its iteration counts grow with resolution; this keeps them ~flat,
    which is what makes 128^3+ viscosity affordable (VERDICT round-1
    item 9).
    """
    from python_fluid_simulation_tpu.solvers.multigrid import (
        make_batched_mg_preconditioner,
    )

    systems = []
    for a in range(len(diags)):
        same = [
            (voff, coef)
            for field, voff, coef in per_axis[a]
            if field == a and sum(abs(o) for o in voff) == 1
        ]
        systems.append((diags[a], same))
    # ONE batched V-cycle for the three axis blocks: the per-axis cycles
    # tripled the op count of an op-count-bound computation (measured
    # ~74 ms per PCG iteration on 64x256x64 coiling)
    return make_batched_mg_preconditioner(systems)


def _perm_inv(perm):
    inv = [0] * len(perm)
    for j, p in enumerate(perm):
        inv[p] = j
    return tuple(inv)


def _permute_shapes(perm, face_shapes):
    """Face shapes of the axis-relabelled problem: new field j is old
    field perm[j] with its array axes transposed by perm."""
    return [
        tuple(face_shapes[perm[j]][ax] for ax in perm)
        for j in range(len(perm))
    ]


def _permute_cls(cls_dict, perm):
    """Parity-class dict under axis relabelling: keys permute with the
    axes, arrays transpose."""
    return {
        tuple(c[ax] for ax in perm): jnp.transpose(a, perm)
        for c, a in cls_dict.items()
    }


def _permute_fields(perm, vs):
    return tuple(
        jnp.transpose(vs[perm[j]], perm) for j in range(len(vs))
    )


def _unpermute_fields(perm, vs):
    inv = _perm_inv(perm)
    return tuple(
        jnp.transpose(vs[inv[i]], inv) for i in range(len(vs))
    )


# The coupled viscosity operator is equivariant under coordinate
# relabelling: _terms_for_axis/_diag_axis are generated from the (face
# axis, transverse axes) roles only, so solving the transposed problem
# with fields reordered by the same permutation and transposing back is
# exact (same per-element products).  This is how the blocked Pallas
# kernels reach TALL grids: they stream along axis 0 with one
# (1, Yp, Zp) row per operand resident in VMEM, so a 126x504x126 grid
# pays 258 KB rows x ~35 operands = over Mosaic's 16 MiB scoped limit —
# but permuted to (504, 126, 127)-class layout the row is 65.5 KB and
# everything fits.  Transposes happen once per solve (not per
# iteration): the CG loop runs entirely in the permuted layout.
_PERM_CANDIDATES = ((1, 0, 2), (2, 1, 0), (1, 2, 0), (2, 0, 1), (0, 2, 1))


def _neighbour_interior(shape, voff):
    """interior_mask of the site at f + voff, as a mask over f."""
    m = None
    for j, s in enumerate(shape):
        idx = jnp.arange(s) + voff[j]
        mj = (idx >= 1) & (idx < s - 1)
        bshape = [1] * len(shape)
        bshape[j] = s
        mj = mj.reshape(bshape)
        m = mj if m is None else (m & mj)
    return m


def viscosity_axis_block_stencil(
    a, s_mu, sphi, vol, shape, strict_fluid: bool = False,
    symmetrize: bool = False,
):
    """Same-axis 7-point sub-operator of one velocity component: the
    diagonal block the MG preconditioner smooths and Galerkin-coarsens.

    Bit-identical to viscosity_term_fields filtered to ``field == a``
    (all six such couplings have |voff| == 1), but built per axis so the
    lean MG route's transient peak is 7 fields of ONE face array instead
    of the full 45-field set (round-3: the 8M-cell coiling_504 MG flip
    exceeded HBM with the all-axes build).

    ``symmetrize=True`` additionally masks each coupling with the
    NEIGHBOUR's interior test, making the stencil exactly
    Pi A Pi (Pi = diag(active)) — the operator the lean MG cycle
    effectively smooths (its vectors are active-supported, so columns
    into non-interior fluid sites read zeros anyway); coarsening the
    symmetrized form keeps every Galerkin level symmetric, which plain
    PCG requires of its preconditioner.
    Returns (diag, [(voff, coef)] * 6, pdiag, active)."""
    d = len(shape)
    _, sph, _ = _axis_fields(a, sphi, vol, shape)
    active = interior_mask(shape) & _is_fluid(sph((0,) * d), strict_fluid)
    diag_raw = _diag_axis(a, s_mu, sphi, vol, shape)
    diag = jnp.where(active, diag_raw, 0.0)
    coefs = []
    for cond_off, field, voff, vol_off, factor, sign in _terms_for_axis(a, d):
        if field != a:
            continue
        fluid_n = _is_fluid(
            dual_sample(sphi, face_parity(a, d), cond_off, shape, -1.0),
            strict_fluid,
        )
        mask = active & fluid_n
        if symmetrize:
            mask = mask & _neighbour_interior(shape, voff)
        vcoef = dual_sample(vol, face_parity(a, d), vol_off, shape, 0.0)
        coefs.append(
            (voff, jnp.where(mask, sign * factor * s_mu * vcoef, 0.0))
        )
    pdiag = jnp.where(active & (diag_raw > 0), diag_raw, 1.0)
    return diag, coefs, pdiag, active


def make_viscosity_mg_preconditioner_lean(
    s_mu,
    sphi,
    vol,
    face_shapes,
    strict_fluid,
    fine_matvec,
    *,
    omega: float = 0.8,
):
    """Two-grid-entry MG preconditioner with NO persistent fine-level
    stencil fields — the big-grid (8M-cell) viscosity route.

    make_viscosity_mg_preconditioner keeps 21 fine coefficient fields
    live across the whole CG loop (~680 MB at 8M cells) plus a stacked
    padded copy of them as batched level 0 (~680 MB more); at coiling_504
    that flip exceeded a 16 GB chip.  Here the fine level is handled by
    ``fine_matvec`` — the same-axis geometry-recompute Pallas kernel
    (ops/pallas_cg.make_blocked_coupled_matvec_geom(same_axis_only=True)),
    whose operands (the parity-class geometry) are already live for the
    outer solve — and the batched Galerkin hierarchy starts at level 1
    (1/8 the cells).  The level-1 stencils are built from per-axis
    transient fine stencils (7 fields of one face array at a time).

    Apply (a symmetric two-grid cycle; 1 damped-Jacobi pre/post smooth,
    inner correction = the existing batched V-cycle on the Galerkin
    level-1 operator — itself symmetric, so the composite stays a fixed
    SPD operator valid inside plain PCG):

      x1 = w r / pd                     (pre-smooth from zero guess)
      r1 = r - A_blk x1                 (fine residual: 1 fine matvec)
      e  = Vcycle_1(restrict(r1))
      x2 = x1 + prolong(e)
      x3 = x2 + w (r - A_blk x2) / pd   (post-smooth: 1 fine matvec)
    """
    from python_fluid_simulation_tpu.solvers.multigrid import (
        _coarsen,
        _prolong,
        _restrict,
        make_batched_mg_preconditioner,
    )

    d = len(face_shapes)
    level1 = []
    pdiags = []
    actives = []
    for a in range(d):
        # symmetrize=True: coarsen Pi A Pi, the operator the cycle
        # actually smooths (vectors below stay active-supported), so
        # every Galerkin level is exactly symmetric
        diag, coefs, pdiag, active = viscosity_axis_block_stencil(
            a, s_mu, sphi, vol, face_shapes[a], strict_fluid,
            symmetrize=True,
        )
        level1.append(_coarsen(diag, coefs))
        pdiags.append(pdiag)
        actives.append(active)
    inner = make_batched_mg_preconditioner(level1)

    def precond(rs):
        x1 = tuple(omega * r / pd for r, pd in zip(rs, pdiags))
        q1 = fine_matvec(x1)
        r1 = tuple(r - q for r, q in zip(rs, q1))
        rc = tuple(
            _restrict(r, tuple((s + 1) // 2 for s in r.shape)) for r in r1
        )
        ec = inner(rc)
        # mask the prolonged correction to active rows: keeps every
        # vector active-supported, so the fine matvec acts as the exact
        # symmetric Pi A Pi (couplings into non-interior fluid columns
        # read zeros) and the composite cycle stays SPD
        x2 = tuple(
            x + jnp.where(act, _prolong(e, x.shape), 0.0)
            for x, e, act in zip(x1, ec, actives)
        )
        q2 = fine_matvec(x2)
        x3 = tuple(
            x + omega * (r - q) / pd
            for x, r, q, pd in zip(x2, rs, q2, pdiags)
        )
        return tuple(
            jnp.where(act, x, r) for x, r, act in zip(x3, rs, actives)
        )

    return precond


def prepare_viscosity_matvec(
    s_mu,
    sphi: jnp.ndarray,
    vol: jnp.ndarray,
    face_shapes,
    strict_fluid: bool = False,
    use_pallas: str = "auto",
    fields=None,
):
    """(matvec_fn, diag_tuple) from the materialised term fields;
    matvec_fn matches viscosity_matvec_3d."""
    d = len(face_shapes)
    diags, per_axis, pdiags = fields or viscosity_term_fields(
        s_mu, sphi, vol, face_shapes, strict_fluid
    )

    if d == 3 and use_pallas != "off":
        from python_fluid_simulation_tpu.ops.pallas_stencils import (
            blocked_pallas_available,
            make_blocked_coupled_matvec,
            make_coupled_stencil_matvec,
            pallas_available,
        )

        common = tuple(max(s[i] for s in face_shapes) for i in range(3))
        # the coupled kernel holds all 14d coefficient operands + the d
        # fields + temporaries live (Mosaic does not reliably stream them
        # inside a scan body) — gate on the full set
        if use_pallas == "on" or (
            use_pallas != "blocked" and pallas_available(common, 16 * d + 8)
        ):
            return (
                make_coupled_stencil_matvec(diags, per_axis, face_shapes),
                tuple(pdiags),
            )
        # 128^3+: stream x-slabs through VMEM instead of falling back to
        # the XLA shift/fma chain (VERDICT round-1 item 4)
        if use_pallas == "blocked" or blocked_pallas_available(common):
            return (
                make_blocked_coupled_matvec(diags, per_axis, face_shapes),
                tuple(pdiags),
            )

    def matvec(vs):
        out = []
        for a in range(d):
            acc = diags[a] * vs[a]
            for field, voff, coef in per_axis[a]:
                acc = acc + coef * sample(vs[field], voff, vs[a].shape, 0.0)
            out.append(acc)
        return tuple(out)

    return matvec, tuple(pdiags)


class ViscosityResult(NamedTuple):
    v_faces: Tuple[jnp.ndarray, ...]
    stats: SolveStats


def viscosity_solve_3d(
    dt,
    mu: float,
    rho: float,
    v_faces: Sequence[jnp.ndarray],
    sphi: jnp.ndarray,
    lvol: jnp.ndarray,
    cell_vol: float,
    *,
    tol: float = 1e-3,
    rel_tol: float = 1e-6,
    max_iter: int = 2000,
    jacobi_precond: bool = True,
    extrap_iters: int = 3,
    strict_fluid: bool = False,
    use_pallas: str = "auto",
    mesh=None,
    precond_kind: str = "jacobi",
    warm_start=None,
    auto_use_mg=None,
) -> ViscosityResult:
    """Full implicit viscosity solve.

    Reference: ViscosityCGSolver3D.solve (:566-613): velocities are copied,
    extrapolated 3 Jacobi layers into the solid (valid = sphi >= 0 at face
    sites), the RHS is built from the extrapolated field, CG runs with the
    extrapolated field as the initial guess (warm start), and the solution
    is written back only at non-solid faces (apply_viscosity_kernel
    :458-470).

    ``warm_start`` (optional face-array tuple, e.g. velocities corrected
    by the learned operator's Δv prediction) replaces the CG initial
    guess ONLY — the linear system itself (RHS, coefficients) is still
    built from ``v_faces``, so the solve converges to the same solution,
    just in fewer iterations when the guess is good (BASELINE config 4:
    "warm-starting ViscosityCGSolver3D" with the UNet prediction).
    """
    d = len(v_faces)
    scale = dt / cell_vol / rho
    s_mu = scale * mu
    # control volumes normalised by cell_vol/8 in BOTH 2D and 3D — the 2D
    # reference also divides by 0.125 (ViscosityCGSolver2D.py:278), not
    # 0.25; preserved for parity.  ``lvol`` may arrive pre-split as a
    # parity-class dict (ops/levelset.compute_fluid_volume_classes — the
    # engine path, which never materialises the (2N+1)^d array).
    if isinstance(lvol, dict):
        vol = {k: v / (cell_vol * 0.125) for k, v in lvol.items()}
    else:
        vol = lvol / (cell_vol * 0.125)

    # split the dual lattices into parity classes ONCE (strided slices
    # relayout on TPU; the stencil terms below sample them ~100 times)
    sphi_c = split_parity(sphi, d)
    vol_c = split_parity(vol, d)

    def _extrapolated(fields):
        out = []
        for a in range(d):
            if extrap_iters > 0:
                valid = _is_fluid(sphi_c[face_parity(a, d)], strict_fluid)
                v_e, _ = extrapolate(fields[a], valid, extrap_iters)
            else:
                v_e = fields[a]
            out.append(v_e)
        return tuple(out)

    ext = _extrapolated(v_faces)
    x0 = _extrapolated(warm_start) if warm_start is not None else ext

    b = viscosity_rhs_3d(ext, s_mu, sphi_c, vol_c, strict_fluid)

    def _rescaled_warm_start(matvec):
        """One-shot residual line search along the predicted correction:
        x0 = ext + α·(warm − ext) with α = ⟨r_ext, Ap⟩/⟨Ap, Ap⟩.

        Learned Δv predictions tend to be direction-accurate but
        amplitude-miscalibrated (a Tanh UNet trained on masked MSE
        underpredicts magnitudes); the optimal scalar step along the
        prediction fixes that for the cost of two extra matvecs and
        guarantees the warm start never has a larger initial residual
        than the cold start (α is a minimiser over a line through it)."""
        p_dir = tuple(w - e for w, e in zip(x0, ext))
        ap = matvec(p_dir)
        r_ext = tuple(bb - q for bb, q in zip(b, matvec(ext)))
        num = sum(
            jnp.vdot(r, a, precision=jax.lax.Precision.HIGHEST)
            for r, a in zip(r_ext, ap)
        )
        den = sum(
            jnp.vdot(a, a, precision=jax.lax.Precision.HIGHEST)
            for a in ap
        )
        alpha = jnp.where(den > 0, num / jnp.maximum(den, 1e-30), 0.0)
        return tuple(e + alpha * p for e, p in zip(ext, p_dir))

    if mesh is not None:
        # distributed coupled solve: each device owns an x-slab of all
        # three face arrays; 3 halo exchanges + 2 psums per iteration
        from python_fluid_simulation_tpu.parallel.halo import (
            distributed_coupled_cg,
        )

        diags, per_axis, pdiags = viscosity_term_fields(
            s_mu, sphi_c, vol_c, [v.shape for v in v_faces], strict_fluid
        )
        if not jacobi_precond:
            pdiags = [jnp.ones_like(p) for p in pdiags]
        if warm_start is not None:

            def _plain_mv(vs):
                out = []
                for a in range(d):
                    acc = diags[a] * vs[a]
                    for field, voff, coef in per_axis[a]:
                        from python_fluid_simulation_tpu.ops.indexing import (
                            sample as _sample,
                        )

                        acc = acc + coef * _sample(
                            vs[field], voff, vs[a].shape, 0.0
                        )
                    out.append(acc)
                return tuple(out)

            x0 = _rescaled_warm_start(_plain_mv)
        x, iters, res, res0 = distributed_coupled_cg(
            mesh, b, x0, diags, per_axis, pdiags,
            tol=tol, rel_tol=rel_tol, max_iter=max_iter,
        )
        thresh = jnp.maximum(
            jnp.float32(tol) ** 2, jnp.float32(rel_tol) ** 2 * res0
        )
        stats = SolveStats(
            iters=iters,
            residual=res,
            initial_residual=res0,
            converged=res < thresh,
        )
    else:
        face_shapes = [v.shape for v in v_faces]

        # fused blocked Jacobi-PCG (ops/pallas_cg.py): the whole CG state
        # stays in the padded blocked layout, each iteration is 3 Pallas
        # calls with in-kernel coefficient recompute + dot accumulation.
        # TPU-only (CPU keeps the XLA path so golden/oracle baselines are
        # bit-stable).  When it engages, the 42 term-coefficient fields
        # are NOT materialised on the Jacobi path (the kernel rebuilds
        # them from the raw parity classes) — at 8M-cell grids the
        # coefficient set alone is ~1.3 GB and materialising it next to
        # the fused path's geometry copies OOMed a 16 GB chip under the
        # auto-mode lax.cond (both branches' captures are live).
        fused_solve = None
        geom_mv = None
        perm = None
        psphi_c = pvol_c = pshapes = None
        if d == 3 and use_pallas != "off":
            from python_fluid_simulation_tpu.ops.pallas_cg import (
                fused_coupled_cg_available,
                make_blocked_coupled_matvec_geom,
                make_fused_coupled_cg_geom,
            )

            if fused_coupled_cg_available(face_shapes):
                perm = (0, 1, 2)
                psphi_c, pvol_c, pshapes = sphi_c, vol_c, face_shapes
            else:
                # tall/wide grids whose (1, Yp, Zp) operand rows exceed
                # Mosaic's scoped-VMEM limit: relabel axes so the stream
                # axis is the long one (see _PERM_CANDIDATES note)
                for cand in sorted(
                    _PERM_CANDIDATES,
                    key=lambda c: -face_shapes[0][c[0]],
                ):
                    cshapes = _permute_shapes(cand, face_shapes)
                    if fused_coupled_cg_available(cshapes):
                        perm = cand
                        psphi_c = _permute_cls(sphi_c, cand)
                        pvol_c = _permute_cls(vol_c, cand)
                        pshapes = cshapes
                        break

            if perm is not None:
                geom_mv_p = make_blocked_coupled_matvec_geom(
                    psphi_c, pvol_c, s_mu, pshapes,
                    strict_fluid=strict_fluid,
                )
                if perm == (0, 1, 2):
                    geom_mv = geom_mv_p
                else:
                    def geom_mv(vs, _p=perm, _mv=geom_mv_p):
                        return _unpermute_fields(
                            _p, _mv(_permute_fields(_p, vs))
                        )

                if jacobi_precond and precond_kind != "mg":
                    pdiags_p = viscosity_diag_3d(
                        s_mu, psphi_c, pvol_c, pshapes, strict_fluid
                    )
                    fused_solve_p = make_fused_coupled_cg_geom(
                        psphi_c, pvol_c, s_mu, pshapes,
                        pdiags_p, strict_fluid=strict_fluid,
                        tol=tol, rel_tol=rel_tol, max_iter=max_iter,
                    )
                    if perm == (0, 1, 2):
                        fused_solve = fused_solve_p
                        pdiags = pdiags_p
                    else:
                        def fused_solve(bb, xx0, _p=perm,
                                        _s=fused_solve_p):
                            xs, it, res, res0, thr = _s(
                                _permute_fields(_p, bb),
                                _permute_fields(_p, xx0),
                            )
                            return (
                                _unpermute_fields(_p, xs),
                                it, res, res0, thr,
                            )

                        pdiags = _unpermute_fields(perm, pdiags_p)

        if fused_solve is not None:
            fields = None
            diag = pdiags

            def matvec(vs):
                # only applied O(1) times per solve (warm-start rescale);
                # samples the pre-split classes directly
                return viscosity_matvec_3d(
                    vs, s_mu, sphi_c, vol_c, strict_fluid
                )

        elif geom_mv is not None and precond_kind == "mg":
            # fixed-MG route on TPU: the outer operator recomputes its
            # coefficients in-kernel, so no term fields stay live
            fields = None
            diag = None
            matvec = geom_mv
        else:
            fields = viscosity_term_fields(
                s_mu, sphi_c, vol_c, face_shapes, strict_fluid
            )
            matvec, diag = prepare_viscosity_matvec(
                s_mu, sphi_c, vol_c, face_shapes, strict_fluid,
                use_pallas=use_pallas, fields=fields,
            )

        def _term_fields():
            return fields if fields is not None else (
                viscosity_term_fields(
                    s_mu, sphi_c, vol_c, face_shapes, strict_fluid
                )
            )

        def _mg_solve(bb, xx0):
            # Big grids (>4M cells): the lean two-grid route — fine
            # level handled by the same-axis geometry-recompute kernel
            # (NO persistent stencil fields), batched Galerkin V-cycle
            # from level 1 down.  The materialised route below keeps
            # ~1.4 GB of fine stencils + stacked level-0 live across
            # the CG loop, which exceeded HBM at coiling_504 (8M cells)
            # when the auto-mode hysteresis flipped to MG.
            import math

            big = math.prod(face_shapes[0]) > 4_000_000
            if perm is not None and big:
                from python_fluid_simulation_tpu.ops.pallas_cg import (
                    make_blocked_coupled_matvec_geom as _mk_geom,
                )

                blk_mv = _mk_geom(
                    psphi_c, pvol_c, s_mu, pshapes,
                    strict_fluid=strict_fluid, same_axis_only=True,
                )
                mg_lean = make_viscosity_mg_preconditioner_lean(
                    s_mu, psphi_c, pvol_c, pshapes, strict_fluid,
                    blk_mv,
                )
                if perm == (0, 1, 2):
                    return cg(
                        geom_mv, bb, xx0,
                        tol=tol, rel_tol=rel_tol, max_iter=max_iter,
                        precond=mg_lean,
                    )
                # permuted layout: transpose the CG state at the solve
                # boundary only; every iteration runs in kernel layout
                geom_mv_full = _mk_geom(
                    psphi_c, pvol_c, s_mu, pshapes,
                    strict_fluid=strict_fluid,
                )
                xp, stats = cg(
                    geom_mv_full,
                    _permute_fields(perm, bb),
                    _permute_fields(perm, xx0),
                    tol=tol, rel_tol=rel_tol, max_iter=max_iter,
                    precond=mg_lean,
                )
                return _unpermute_fields(perm, xp), stats
            # <=4M cells: MG-PCG with materialised same-axis stencils —
            # the outer matvec is the geometry-recompute kernel (no
            # materialised coefficients) and the block preconditioner
            # coarsens only the same-axis 7-point sub-operators, so of
            # the 45 term fields built here only the 21 same-axis ones
            # survive DCE.
            flds = _term_fields()
            if geom_mv is not None:
                mv = geom_mv
            elif fields is not None:
                mv = matvec
            else:
                mv, _ = prepare_viscosity_matvec(
                    s_mu, sphi_c, vol_c, face_shapes, strict_fluid,
                    use_pallas=use_pallas, fields=flds,
                )
            mg = make_viscosity_mg_preconditioner(flds[0], flds[1])
            return cg(
                mv, bb, xx0,
                tol=tol, rel_tol=rel_tol, max_iter=max_iter,
                precond=mg,
            )

        def _jacobi_cg(bb, xx0):
            if fused_solve is not None:
                xs, iters, res, res0, thr = fused_solve(bb, xx0)
                return xs, SolveStats(
                    iters=iters,
                    residual=res,
                    initial_residual=res0,
                    converged=res < thr,
                )
            return cg(
                matvec, bb, xx0,
                tol=tol, rel_tol=rel_tol, max_iter=max_iter,
                precond=jac,
            )

        def jac(rs):
            return tuple(r / dd for r, dd in zip(rs, diag))

        if warm_start is not None:
            x0 = _rescaled_warm_start(matvec)

        if precond_kind == "auto" and auto_use_mg is not None:
            # Hysteresis preconditioner selection, driven by the caller
            # (the engine carries the previous step's iteration count in
            # SimState.visc_mg).  Jacobi-PCG is ~2x faster per iteration
            # than the batched-MG block preconditioner and wins in the
            # early regime, but its iteration count explodes once the
            # high-mu fluid pools (410+ hitting the cap = silently
            # under-solved steps) while MG stays ~flat — the regime is
            # persistent, so last step's count is the reliable signal.
            # (An in-step rate probe was tried first and misfires:
            # Jacobi's early-iteration plateau projects inflated counts
            # and MG is ~2x WORSE in the early regime — measured 640 vs
            # 253 ms/step on TPU coiling-256.)
            # The cond wraps the WHOLE solve, not the precond apply:
            # with a per-iteration cond the Galerkin hierarchy build is
            # a captured operand computed unconditionally EVERY step —
            # the Jacobi regime paid the full MG setup without using it
            # (measured 5x step blowup on coiling-256).  Inside the
            # branch it runs only when MG is actually selected.
            def solve_mg(_):
                # term fields are (re)built INSIDE the branch so the
                # Jacobi regime never holds them live (see the HBM note
                # above)
                return _mg_solve(b, x0)

            def solve_jac(_):
                return _jacobi_cg(b, x0)

            x, stats = jax.lax.cond(
                auto_use_mg, solve_mg, solve_jac, 0
            )
        elif precond_kind != "mg" and jacobi_precond:
            x, stats = _jacobi_cg(b, x0)
        elif precond_kind == "mg":
            x, stats = _mg_solve(b, x0)
        else:
            x, stats = cg(
                matvec,
                b,
                x0,
                tol=tol,
                rel_tol=rel_tol,
                max_iter=max_iter,
                precond=jac if jacobi_precond else None,
            )

    out = []
    for a in range(d):
        nonsolid = _is_fluid(sphi_c[face_parity(a, d)], strict_fluid)
        active = (
            interior_mask(
                v_faces[a].shape,
                active_hi=tuple(
                    s - (1 if i == a else 0)
                    for i, s in enumerate(v_faces[a].shape)
                ),
            )
            & nonsolid
        )
        out.append(jnp.where(active, x[a], v_faces[a]))
    return ViscosityResult(tuple(out), stats)


# 2D aliases: same generic operators with the 2D reference's conventions —
# solid = sphi <= 0 (strict fluid test), NO pre-extrapolation, tol 1e-4
# default (ViscosityCGSolver2D.solve :275-318)
viscosity_matvec_2d = viscosity_matvec_3d
viscosity_rhs_2d = viscosity_rhs_3d
viscosity_diag_2d = viscosity_diag_3d


def viscosity_solve_2d(
    dt, mu, rho, v_faces, sphi, lvol, cell_vol, *, tol=1e-4,
    rel_tol=1e-6, max_iter=2000, jacobi_precond=True,
):
    return viscosity_solve_3d(
        dt, mu, rho, v_faces, sphi, lvol, cell_vol, tol=tol,
        rel_tol=rel_tol, max_iter=max_iter, jacobi_precond=jacobi_precond,
        extrap_iters=0, strict_fluid=True,
    )
