"""Fused blocked Jacobi-PCG for the coupled viscosity system.

The coupled implicit-viscosity solve (3 velocity fields, 14 masked
stencil terms each; reference ViscosityCGSolver3D.py:566-613 runs it
unpreconditioned on the GPU) is the dominant byte-mover of the big-grid
step: the roofline model attributes 89% of coiling-504's modeled traffic
to it (artifacts/BENCH_BIG.json).  Run through the generic `solvers.cg`
while_loop, every iteration pays

  * a pad -> blocked-Pallas-matvec -> slice round trip whose pad/slice
    are minor-dim relayouts (measured 1.17 + 1.14 ms per call at
    128^3-class — more than the 3 stencil kernels themselves),
  * ~10 separate XLA elementwise/dot ops over the 3-field state, and
  * 45 materialised f32 coefficient fields re-read per iteration —
    3x per-axis re-reads of the velocity slabs on top.

This module keeps the WHOLE CG state (x, d, r, q) in the padded blocked
layout for the life of the solve and fuses each iteration into three
Pallas calls:

  A : q = A d for ALL 3 axes in one sweep, the 42 stencil coefficients
      RECOMPUTED in-register from the 10 shared parity-class geometry
      fields (7 vol + 3 sphi classes; 19 x-slab operands instead of the
      45 coefficient + 27 velocity-slab fetches of the materialised
      per-axis kernels), plus the d.q partial dot
  B : x += alpha d; r -= alpha q; partial dots r.r and r.(r/pd)
  C : d = r/pd + beta d

Coefficient recomputation reproduces the materialised path's f32
products in the same association order
(w = (sign*factor)*s_mu; term = where(mask, w*vol, 0) * v); the only
remaining freedom is FMA fusion inside the compiled kernel, so the two
operators agree to ~1 ulp (verified by test_pallas.py).

Dots accumulate across the sequential TPU grid into (1,1) SMEM outputs
(initialised at program_id 0), so no extra reduction passes run.  The
scalar CG recurrences (alpha, beta, the convergence test) stay in the
XLA while_loop — they are O(1).

Numerics: identical recurrences to solvers/cg.py::cg; dots associate
block-sequentially instead of jnp.vdot's tree, so iteration counts can
differ by +-1 at equal tolerance.  The engine enables this path on TPU
only (interpret-mode execution is available for tests); CPU runs keep
the XLA path, so golden/oracle parity baselines are unchanged.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from python_fluid_simulation_tpu.ops.pallas_stencils import (
    _pad_lanes,
    _pad_sublanes,
    _pick_bx,
    _roll3,
    _xshift_block,
    blocked_pallas_available,
)


def fused_coupled_cg_available(field_shapes, interpret: bool = False) -> bool:
    """Gate for the geometry-recompute coupled kernels (v2): live rows =
    geometry slab operands + 9 velocity slabs + 3 outputs + scratch."""
    if len(field_shapes) != 3:
        return False
    common = tuple(max(s[i] for s in field_shapes) for i in range(3))
    if interpret:
        return True
    n_ops = len(_geom_plan()[0]) + 9 + 3 + 4
    return blocked_pallas_available(common, n_ops=n_ops)


def _smem_scalar_spec():
    return pl.BlockSpec(
        (1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
    )


class _Layout:
    """Common padded-block geometry shared by the three passes."""

    def __init__(self, field_shapes, n_live_matvec):
        self.F = len(field_shapes)
        self.field_shapes = [tuple(s) for s in field_shapes]
        common = tuple(
            max(s[i] for s in field_shapes) for i in range(3)
        )
        X, Y, Z = common
        self.Yp, self.Zp = _pad_sublanes(Y), _pad_lanes(Z)
        self.bx = _pick_bx(X, self.Yp, self.Zp, n_live=n_live_matvec)
        # elementwise passes hold fewer operands -> bigger blocks; both
        # are powers of two, so padding X to the larger tiles both
        self.bx_e = max(
            self.bx, _pick_bx(X, self.Yp, self.Zp, n_live=7 * self.F + 4)
        )
        m = max(self.bx, self.bx_e)
        self.Xp = -(-X // m) * m
        self.nblocks = self.Xp // self.bx
        self.nblocks_e = self.Xp // self.bx_e
        self.fshape = jax.ShapeDtypeStruct(
            (self.Xp, self.Yp, self.Zp), jnp.float32
        )
        self.sshape = jax.ShapeDtypeStruct((1, 1), jnp.float32)
        blk = (self.bx, self.Yp, self.Zp)
        blk_e = (self.bx_e, self.Yp, self.Zp)
        nb = self.nblocks

        def spec(b, imap):
            return pl.BlockSpec(b, imap, memory_space=pltpu.VMEM)

        self.cur = spec(blk, lambda i: (i, 0, 0))
        self.prev = spec(blk, lambda i: (jnp.maximum(i - 1, 0), 0, 0))
        self.nxt = spec(
            blk, lambda i: (jnp.minimum(i + 1, nb - 1), 0, 0)
        )
        self.cur_e = spec(blk_e, lambda i: (i, 0, 0))
        self.smem_out = pl.BlockSpec(
            (1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
        )

    def pad3(self, a, fill=0.0):
        return jnp.pad(
            a,
            (
                (0, self.Xp - a.shape[0]),
                (0, self.Yp - a.shape[1]),
                (0, self.Zp - a.shape[2]),
            ),
            constant_values=fill,
        )


def _make_bc_passes(lay: _Layout, interpret: bool):
    """Pass B (x/r update + dots) and pass C (direction update)."""
    F = lay.F

    def b_kernel(*refs):
        xs = refs[0:F]
        rs = refs[F : 2 * F]
        ds = refs[2 * F : 3 * F]
        qs = refs[3 * F : 4 * F]
        pds = refs[4 * F : 5 * F]
        alpha_ref = refs[5 * F]
        xo = refs[5 * F + 1 : 6 * F + 1]
        ro = refs[6 * F + 1 : 7 * F + 1]
        delta_ref, res_ref = refs[7 * F + 1], refs[7 * F + 2]

        @pl.when(pl.program_id(0) == 0)
        def _init():
            delta_ref[0, 0] = 0.0
            res_ref[0, 0] = 0.0

        alpha = alpha_ref[0, 0]
        pdelta = 0.0
        pres = 0.0
        for f in range(F):
            xo[f][:] = xs[f][:] + alpha * ds[f][:]
            r = rs[f][:] - alpha * qs[f][:]
            ro[f][:] = r
            pdelta += jnp.sum(r * (r / pds[f][:]))
            pres += jnp.sum(r * r)
        delta_ref[0, 0] += pdelta
        res_ref[0, 0] += pres

    b_call = pl.pallas_call(
        b_kernel,
        grid=(lay.nblocks_e,),
        out_shape=(lay.fshape,) * (2 * F) + (lay.sshape, lay.sshape),
        in_specs=[lay.cur_e] * (5 * F) + [_smem_scalar_spec()],
        out_specs=(lay.cur_e,) * (2 * F) + (lay.smem_out, lay.smem_out),
        interpret=interpret,
    )

    def c_kernel(*refs):
        rs, pds, ds = refs[0:F], refs[F : 2 * F], refs[2 * F : 3 * F]
        beta_ref = refs[3 * F]
        do = refs[3 * F + 1 :]
        beta = beta_ref[0, 0]
        for f in range(F):
            do[f][:] = rs[f][:] / pds[f][:] + beta * ds[f][:]

    c_call = pl.pallas_call(
        c_kernel,
        grid=(lay.nblocks_e,),
        out_shape=(lay.fshape,) * F,
        in_specs=[lay.cur_e] * (3 * F) + [_smem_scalar_spec()],
        out_specs=(lay.cur_e,) * F,
        interpret=interpret,
    )
    return b_call, c_call


def _scal(v):
    return jnp.asarray(v, jnp.float32).reshape(1, 1)


def _make_driver(lay, matvec_dq, pd_ps, b_call, c_call, tol, rel_tol,
                 max_iter):
    F = lay.F

    def solve(b_fields, x0_fields):
        bp = [lay.pad3(b) for b in b_fields]
        xp = [lay.pad3(x) for x in x0_fields]
        q0, _ = matvec_dq(xp)
        rp = [bb - qq for bb, qq in zip(bp, q0)]
        zp = [rr / pp for rr, pp in zip(rp, pd_ps)]
        delta0 = sum(
            jnp.vdot(r, z, precision=jax.lax.Precision.HIGHEST)
            for r, z in zip(rp, zp)
        )
        res0 = sum(
            jnp.vdot(r, r, precision=jax.lax.Precision.HIGHEST)
            for r in rp
        )
        thresh = jnp.maximum(
            jnp.asarray(tol, res0.dtype) ** 2, rel_tol**2 * res0
        )

        def cond(carry):
            _, _, _, res, k, delta = carry
            return (res >= thresh) & (k < max_iter) & (delta != 0)

        def body(carry):
            x, d, r, res, k, delta = carry
            q, dq = matvec_dq(d)
            alpha = jnp.where(dq != 0, delta / dq, 0.0)
            outs = b_call(*x, *r, *d, *q, *pd_ps, _scal(alpha))
            x = tuple(outs[0:F])
            r = tuple(outs[F : 2 * F])
            new_delta = outs[2 * F][0, 0]
            new_res = outs[2 * F + 1][0, 0]
            beta = jnp.where(delta != 0, new_delta / delta, 0.0)
            d = c_call(*r, *pd_ps, *d, _scal(beta))
            return (x, tuple(d), r, new_res, k + 1, new_delta)

        carry0 = (
            tuple(xp),
            tuple(zp),
            tuple(rp),
            res0,
            jnp.int32(0),
            delta0,
        )
        x, _, _, res, iters, _ = jax.lax.while_loop(cond, body, carry0)
        out = tuple(
            xx[: s[0], : s[1], : s[2]]
            for xx, s in zip(x, lay.field_shapes)
        )
        return out, iters, res, res0, thresh

    # exposed for bit-exactness tests against the XLA matvec
    solve.matvec_dq = matvec_dq
    solve.layout = lay
    return solve


def make_fused_coupled_cg(
    diags,
    per_axis_terms,
    field_shapes,
    pdiags,
    *,
    tol: float,
    rel_tol: float,
    max_iter: int,
    interpret: bool | None = None,
):
    """Fused CG over MATERIALISED coefficient fields (one pallas call
    per output axis, as pallas_stencils.make_blocked_coupled_matvec).

    Prefer `make_fused_coupled_cg_geom` (recomputes coefficients
    in-kernel, ~2.4x fewer bytes per iteration); this variant remains
    for systems given only as term tables.

    Returns solve(b_fields, x0_fields) ->
    (x_fields, iters, residual, initial_residual, threshold).
    """
    F = len(field_shapes)
    assert 1 <= F <= 3
    max_coefs = max(len(t) for t in per_axis_terms)
    lay = _Layout(field_shapes, n_live_matvec=3 * F + 1 + max_coefs + 5)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    diag_ps = [lay.pad3(d) for d in diags]
    # padded preconditioner rows divide the (zero) padded residual: pad 1
    # pad rows must carry pd=1 (identity) — pad with the FILL, never the
    # (p - 1) + 1 trick: f32 absorbs tiny diagonals (1.8e-8 - 1 + 1 == 0),
    # and a zeroed pd turns z = r/pd into Inf -> NaN one iteration in
    # (hit at the funnel pile-up once exact segmented sums produced
    # genuinely tiny control volumes)
    pd_ps = [lay.pad3(p, fill=1.0) for p in pdiags]
    coef_ps = []
    table = []
    for a in range(F):
        entries = []
        cps = []
        for field, off, coef in per_axis_terms[a]:
            assert abs(off[0]) <= 1
            entries.append((field, tuple(int(o) for o in off)))
            cps.append(lay.pad3(coef))
        table.append(tuple(entries))
        coef_ps.append(cps)

    bx = lay.bx

    def make_axis_kernel(a):
        n_c = len(table[a])

        def kernel(*refs):
            vs = [
                (refs[3 * f], refs[3 * f + 1], refs[3 * f + 2])
                for f in range(F)
            ]
            diag_ref = refs[3 * F]
            coef_refs = refs[3 * F + 1 : 3 * F + 1 + n_c]
            out_ref = refs[3 * F + 1 + n_c]
            dq_ref = refs[3 * F + 2 + n_c]
            curs = [vs[f][1][:] for f in range(F)]
            xcache = {}

            def get(field, sx):
                key = (field, sx)
                if key not in xcache:
                    prev_ref, _, next_ref = vs[field]
                    xcache[key] = _xshift_block(
                        curs[field], prev_ref, next_ref, sx, bx
                    )
                return xcache[key]

            acc = diag_ref[:] * curs[a]
            for k, (field, off) in enumerate(table[a]):
                q = get(field, off[0])
                if off[1]:
                    q = _roll3(q, off[1], 1)
                if off[2]:
                    q = _roll3(q, off[2], 2)
                acc = acc + coef_refs[k][:] * q
            out_ref[:] = acc

            @pl.when(pl.program_id(0) == 0)
            def _init():
                dq_ref[0, 0] = 0.0

            dq_ref[0, 0] += jnp.sum(curs[a] * acc)

        return kernel

    axis_calls = []
    for a in range(F):
        field_specs = []
        for _ in range(F):
            field_specs += [lay.prev, lay.cur, lay.nxt]
        specs = field_specs + [lay.cur] * (1 + len(coef_ps[a]))
        call = pl.pallas_call(
            make_axis_kernel(a),
            grid=(lay.nblocks,),
            out_shape=(lay.fshape, lay.sshape),
            in_specs=specs,
            out_specs=(lay.cur, lay.smem_out),
            interpret=interpret,
        )
        axis_calls.append(call)

    def matvec_dq(d_ps):
        field_ins = []
        for f in range(F):
            field_ins += [d_ps[f], d_ps[f], d_ps[f]]
        qs, dq = [], 0.0
        for a in range(F):
            q, dqa = axis_calls[a](*field_ins, diag_ps[a], *coef_ps[a])
            qs.append(q)
            dq = dq + dqa[0, 0]
        return tuple(qs), dq

    b_call, c_call = _make_bc_passes(lay, interpret)
    return _make_driver(
        lay, matvec_dq, pd_ps, b_call, c_call, tol, rel_tol, max_iter
    )


def fused_poisson_cg_available(shape, interpret: bool = False) -> bool:
    # F=1: pass A holds 7 stencil fields + 3 field slabs + out + dots
    if interpret:
        return True
    return blocked_pallas_available(shape, n_ops=16)


def make_fused_poisson_cg(
    diag,
    coefs,
    pdiag,
    *,
    tol: float,
    rel_tol: float,
    max_iter: int,
    interpret: bool | None = None,
):
    """Fused blocked Jacobi-PCG for a single-field cell-centred system
    (the ghost-fluid Poisson solves of pressure & density,
    reference PressureCGSolver3D.py / DensityCGSolver3D.py CG loops).

    Same 3-pass iteration as the coupled solver (matvec+d·q, x/r update
    + dots, direction update) specialised to F=1: the big-grid Jacobi
    regime otherwise pays a pad → blocked-matvec → slice round trip plus
    ~9 separate XLA vector ops per iteration (solvers/cg.py::cg).

    ``coefs`` is the [(offset, coefficient-field)] term table from
    pressure_coefficients; offsets must be within ±1 per axis (the
    7-point stencil is).  Returns solve(b, x0=None) ->
    (x, iters, residual, initial_residual, threshold).
    """
    shape = tuple(diag.shape)
    per_axis = [tuple((0, off, c) for off, c in coefs)]
    inner = make_fused_coupled_cg(
        [diag], per_axis, [shape], [pdiag],
        tol=tol, rel_tol=rel_tol, max_iter=max_iter,
        interpret=interpret,
    )

    def solve(b, x0=None):
        if x0 is None:
            x0 = jnp.zeros_like(b)
        xs, iters, res, res0, thr = inner((b,), (x0,))
        return xs[0], iters, res, res0, thr

    solve.inner = inner
    return solve


# ---------------------------------------------------------------------------
# v2: coefficients recomputed in-kernel from parity-class geometry
# ---------------------------------------------------------------------------


def _geom_plan(same_axis_only: bool = False):
    """Static metadata for the all-axes geometry kernel.

    Returns (inputs, per_axis) where
      inputs: ordered list of (kind, cls, kx) slab operands
              (kind in {vol, sphi}; cls a parity triple; kx in {-1,0,1})
      per_axis[a]: dict with
        'active_cls': sphi class of the face-center fluid test
        'diag': [(vol_cls, k3, factor)] — center first (factor None
                marks the unscaled vl(0) term), then the 6 neighbours
                in _diag_axis's loop order
        'terms': [(field, voff, sphi_cls, ck3, vol_cls, vk3, sf)] in
                 _terms_for_axis order

    ``same_axis_only`` keeps only the 6 same-field couplings per axis
    (field == a): the block-diagonal sub-operator the viscosity MG
    preconditioner smooths/coarsens (make_viscosity_mg_preconditioner's
    filter) — the kernel then IS that block operator, so the big-grid
    MG route needs no materialised fine-level stencil fields at all.
    """
    from python_fluid_simulation_tpu.ops.indexing import face_parity
    from python_fluid_simulation_tpu.solvers.viscosity import (
        _terms_for_axis,
    )

    used = {}

    def dual(kind, pa, off):
        q = [p + o for p, o in zip(pa, off)]
        cls = tuple(c % 2 for c in q)
        k = tuple((c - c % 2) // 2 for c in q)
        used.setdefault((kind, cls), set()).add(k[0])
        return cls, k

    per_axis = []
    for a in range(3):
        pa = face_parity(a, 3)
        diag = []
        cls, k = dual("vol", pa, (0, 0, 0))
        diag.append((cls, k, None))
        for ax in range(3):
            factor = 2.0 if ax == a else 1.0
            for sgn in (+1, -1):
                off = [0, 0, 0]
                off[ax] = sgn
                cls, k = dual("vol", pa, tuple(off))
                diag.append((cls, k, factor))
        active_cls, _ = dual("sphi", pa, (0, 0, 0))
        terms = []
        for cond, field, voff, voloff, factor, sign in _terms_for_axis(
            a, 3
        ):
            if same_axis_only and field != a:
                continue
            ccls, ck = dual("sphi", pa, cond)
            vcls, vk = dual("vol", pa, voloff)
            terms.append(
                (field, tuple(voff), ccls, tuple(ck), vcls, tuple(vk),
                 sign * factor)
            )
        per_axis.append(
            {"active_cls": active_cls, "diag": diag, "terms": terms}
        )

    inputs = []
    for (kind, cls), kxs in sorted(used.items()):
        for kx in (0, -1, 1):  # cur first, then the halo slabs
            if kx == 0 or kx in kxs:
                inputs.append((kind, cls, kx))
    return inputs, per_axis


def _make_geom_matvec(
    sphi_c: dict,
    vol_c: dict,
    s_mu,
    face_shapes,
    strict_fluid: bool,
    interpret: bool,
    same_axis_only: bool = False,
):
    """(lay, matvec_dq) for the all-axes geometry kernel: coefficients
    rebuilt in-register from the 10 parity-class geometry fields (bit
    exact same f32 products/order as viscosity_term_fields).
    matvec_dq consumes/produces PADDED blocked fields."""
    F = len(face_shapes)
    assert F == 3
    inputs, per_axis = _geom_plan(same_axis_only)
    # live set: geometry slabs + F fields x 3 + outs + temps
    lay = _Layout(
        face_shapes, n_live_matvec=len(inputs) + 3 * F + F + 10
    )
    bx = lay.bx
    nblocks = lay.nblocks

    geom_arrays = []
    geom_specs = []
    geom_slot = {}
    for kind, cls, kx in inputs:
        src = (vol_c if kind == "vol" else sphi_c)[cls]
        fill = 0.0 if kind == "vol" else -1.0
        geom_arrays.append(lay.pad3(src, fill=fill))
        geom_specs.append(
            {0: lay.cur, -1: lay.prev, 1: lay.nxt}[kx]
        )
        geom_slot[(kind, cls, kx)] = len(geom_arrays) - 1

    fluid = (
        (lambda v: v > 0.0) if strict_fluid else (lambda v: v >= 0.0)
    )

    def kernel(*refs):
        ng = len(geom_arrays)
        grefs = refs[0:ng]
        vs = [
            (refs[ng + 3 * f], refs[ng + 3 * f + 1], refs[ng + 3 * f + 2])
            for f in range(F)
        ]
        smu_ref = refs[ng + 3 * F]
        outs = refs[ng + 3 * F + 1 : ng + 3 * F + 1 + F]
        dq_ref = refs[ng + 3 * F + 1 + F]
        s_mu_v = smu_ref[0, 0]

        curs = [vs[f][1][:] for f in range(F)]
        vcache = {}

        def getv(field, off):
            key = (field, off)
            if key not in vcache:
                prev_ref, _, next_ref = vs[field]
                q = _xshift_block(
                    curs[field], prev_ref, next_ref, off[0], bx
                )
                if off[1]:
                    q = _roll3(q, off[1], 1)
                if off[2]:
                    q = _roll3(q, off[2], 2)
                vcache[key] = q
            return vcache[key]

        gcache = {}

        def getg(kind, cls, k):
            key = (kind, cls, k)
            if key not in gcache:
                cur_ref = grefs[geom_slot[(kind, cls, 0)]]
                if k[0] == 0:
                    base = cur_ref[:]
                else:
                    halo = grefs[geom_slot[(kind, cls, k[0])]]
                    # _xshift_block reads prev for s=-1, next for s=+1;
                    # pass the halo slab on the side it will touch
                    base = _xshift_block(
                        cur_ref[:], halo, halo, k[0], bx
                    )
                if k[1]:
                    base = _roll3(base, k[1], 1)
                if k[2]:
                    base = _roll3(base, k[2], 2)
                gcache[key] = base
            return gcache[key]

        # global indices for the interior mask
        gx = (
            pl.program_id(0) * bx
            + jax.lax.broadcasted_iota(
                jnp.int32, (bx, lay.Yp, lay.Zp), 0
            )
        )
        gy = jax.lax.broadcasted_iota(jnp.int32, (bx, lay.Yp, lay.Zp), 1)
        gz = jax.lax.broadcasted_iota(jnp.int32, (bx, lay.Yp, lay.Zp), 2)

        dq = 0.0
        for a in range(F):
            meta = per_axis[a]
            s = lay.field_shapes[a]
            interior = (
                (gx >= 1) & (gx <= s[0] - 2)
                & (gy >= 1) & (gy <= s[1] - 2)
                & (gz >= 1) & (gz <= s[2] - 2)
            )
            active = interior & fluid(
                getg("sphi", meta["active_cls"], (0, 0, 0))
            )
            # diagonal, exactly _diag_axis's association order
            (ccls, ck, _), rest = meta["diag"][0], meta["diag"][1:]
            center = getg("vol", ccls, ck)
            extra = jnp.zeros_like(center)
            for vcls, vk, factor in rest:
                extra = extra + factor * getg("vol", vcls, vk)
            diag_raw = center + s_mu_v * extra
            acc = jnp.where(active, diag_raw, 0.0) * curs[a]
            for field, voff, ccls, ck, vcls, vk, sf in meta["terms"]:
                w = sf * s_mu_v
                coef = jnp.where(
                    active & fluid(getg("sphi", ccls, ck)),
                    w * getg("vol", vcls, vk),
                    0.0,
                )
                acc = acc + coef * getv(field, voff)
            outs[a][:] = acc
            dq += jnp.sum(curs[a] * acc)

        @pl.when(pl.program_id(0) == 0)
        def _init():
            dq_ref[0, 0] = 0.0

        dq_ref[0, 0] += dq

    field_specs = []
    for _ in range(F):
        field_specs += [lay.prev, lay.cur, lay.nxt]
    call = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        out_shape=(lay.fshape,) * F + (lay.sshape,),
        in_specs=geom_specs + field_specs + [_smem_scalar_spec()],
        out_specs=(lay.cur,) * F + (lay.smem_out,),
        interpret=interpret,
    )

    def matvec_dq(d_ps):
        field_ins = []
        for f in range(F):
            field_ins += [d_ps[f], d_ps[f], d_ps[f]]
        *qs, dq = call(*geom_arrays, *field_ins, _scal(s_mu))
        return tuple(qs), dq[0, 0]

    return lay, matvec_dq


def make_fused_coupled_cg_geom(
    sphi_c: dict,
    vol_c: dict,
    s_mu,
    face_shapes,
    pdiags,
    *,
    strict_fluid: bool = False,
    tol: float,
    rel_tol: float,
    max_iter: int,
    interpret: bool | None = None,
):
    """Fused coupled Jacobi-PCG with in-kernel coefficient recomputation.

    The 42 stencil coefficients and 3 diagonals are rebuilt inside the
    matvec pass from the 10 parity-class geometry fields (bit-exact
    same f32 products/order as solvers.viscosity.viscosity_term_fields)
    — per iteration the kernel streams 19 geometry + 9 velocity slab
    operands instead of 45 coefficient + 27 velocity fetches.

    Returns solve(b_fields, x0_fields) ->
    (x_fields, iters, residual, initial_residual, threshold).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    lay, matvec_dq = _make_geom_matvec(
        sphi_c, vol_c, s_mu, face_shapes, strict_fluid, interpret
    )
    # pad rows must carry pd=1 (identity) — pad with the FILL, never the
    # (p - 1) + 1 trick: f32 absorbs tiny diagonals (1.8e-8 - 1 + 1 == 0),
    # and a zeroed pd turns z = r/pd into Inf -> NaN one iteration in
    # (hit at the funnel pile-up once exact segmented sums produced
    # genuinely tiny control volumes)
    pd_ps = [lay.pad3(p, fill=1.0) for p in pdiags]
    b_call, c_call = _make_bc_passes(lay, interpret)
    return _make_driver(
        lay, matvec_dq, pd_ps, b_call, c_call, tol, rel_tol, max_iter
    )


def make_blocked_coupled_matvec_geom(
    sphi_c: dict,
    vol_c: dict,
    s_mu,
    face_shapes,
    *,
    strict_fluid: bool = False,
    interpret: bool | None = None,
    same_axis_only: bool = False,
):
    """Standalone coupled viscosity matvec on UNPADDED face arrays with
    in-kernel coefficient recomputation (the fused CG's pass A behind a
    pad -> kernel -> slice round trip).

    This is what makes the big-grid MG-preconditioned solve fit in HBM:
    the outer CG's operator needs NO materialised term-coefficient
    fields (~1.3 GB at 8M cells).  ``same_axis_only=True`` yields the
    block-diagonal sub-operator instead (6 same-field couplings per
    axis) — the fine-level smoother/residual operator of the lean
    viscosity MG route, again with zero materialised stencils."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    lay, matvec_dq = _make_geom_matvec(
        sphi_c, vol_c, s_mu, face_shapes, strict_fluid, interpret,
        same_axis_only=same_axis_only,
    )

    def matvec(vs):
        v_ps = [lay.pad3(v) for v in vs]
        qs, _ = matvec_dq(v_ps)
        return tuple(
            q[: s[0], : s[1], : s[2]]
            for q, s in zip(qs, lay.field_shapes)
        )

    return matvec
