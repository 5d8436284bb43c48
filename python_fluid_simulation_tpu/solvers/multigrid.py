"""Geometric multigrid V-cycle preconditioner for the cell-centred
ghost-fluid Poisson systems (pressure & density projections).

The reference runs UNPRECONDITIONED CG (PressureCGSolver3D.py:207-221);
iteration counts grow ~linearly with resolution, which is what makes its
128^3+ configs unreachable.  Jacobi-PCG (our default) helps by a constant;
multigrid makes iteration counts resolution-independent (~10-20), the
standard production choice for fluid pressure solves.

Construction is Galerkin with piecewise-constant transfers, which for the
7-point operator stays 7-point on every level and reduces to sums of the
coefficient fields — no matrix assembly:

  coarse offdiag(I, I+e_a) = Σ of the 4 fine couplings crossing the face
  coarse diag(I)           = Σ children diag + 2 Σ internal couplings

Transfers: restrict = 8-child sum (P^T), prolong = parent injection (P);
smoother: damped Jacobi (symmetric), same count pre/post — the V-cycle is
a fixed SPD operator, safe inside plain PCG.

Everything is the same shift/coefficient machinery as the solvers, so it
runs as pure XLA on any backend and fuses on TPU.
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax.numpy as jnp

from python_fluid_simulation_tpu.ops.indexing import shift


class _Level(NamedTuple):
    diag: jnp.ndarray
    coefs: Tuple  # ((off, coef), ...) both signs per axis
    safe_diag: jnp.ndarray


def _pad_even(a):
    pads = [(0, s % 2) for s in a.shape]
    if any(p[1] for p in pads):
        a = jnp.pad(a, pads)
    return a


def _matvec(level: _Level, p):
    out = level.diag * p
    for off, c in level.coefs:
        out = out + c * shift(p, off, 0.0)
    return out


def _axis_halve(a, axis, parity):
    """Halve one axis: parity=None sums both children, 0/1 selects the
    even/odd child.  Minor two axes (sublane/lane) ride the MXU with
    0/1 selection matrices; leading axes use free-major reshape ops —
    the (…,2)-local-axes transpose form this replaces materialised
    ~0.3 ms relayouts per field at 128^3 (the MG solve's per-step
    Galerkin setup was ~4 ms, rivaling its whole PCG loop)."""
    d = a.ndim
    s = a.shape[axis]
    if axis >= d - 2:
        if parity is None:
            m = _half_mat(s)
        else:
            import numpy as np

            sel = np.zeros((s, (s + 1) // 2), np.float32)
            idx = np.arange(parity, s, 2)
            sel[idx, idx // 2] = 1.0
            m = jnp.asarray(sel)
        import jax

        if axis == d - 1:
            return jnp.einsum(
                "...z,zv->...v", a, m,
                precision=jax.lax.Precision.HIGHEST,
            )
        return jnp.einsum(
            "...yz,yu->...uz", a, m,
            precision=jax.lax.Precision.HIGHEST,
        )
    # leading (major) axis: free reshape
    if s % 2:
        pad = [(0, 0)] * d
        pad[axis] = (0, 1)
        a = jnp.pad(a, pad)
    shp = (
        list(a.shape[:axis]) + [a.shape[axis] // 2, 2]
        + list(a.shape[axis + 1:])
    )
    r = a.reshape(shp)
    if parity is None:
        return r.sum(axis=axis + 1)
    return jnp.take(r, parity, axis=axis + 1)


def _coarsen(diag, coefs):
    """Galerkin RAP with piecewise-constant transfers (see module doc).

    Expressed as separable per-axis halvings (sum / even-child /
    odd-child), which keep the minor axes on the MXU (`_axis_halve`):

      coarse diag        = Σ_children diag + 2 Σ_axis (even-child along
                           axis, summed along the others) coef(+axis)
      coarse coef(±axis) = (odd/even-child along axis, summed along the
                           others) coef(±axis)
    """
    d = diag.ndim

    def halve(a, parities):
        for axis in range(d):
            a = _axis_halve(a, axis, parities[axis])
        return a

    cmap = dict(coefs)
    diag_c = halve(diag, (None,) * d)
    for axis in range(d):
        plus = tuple(1 if k == axis else 0 for k in range(d))
        par = tuple(0 if k == axis else None for k in range(d))
        diag_c = diag_c + 2.0 * halve(cmap[plus], par)

    coefs_c = []
    for axis in range(d):
        for sgn in (+1, -1):
            off = tuple(sgn if k == axis else 0 for k in range(d))
            par = tuple(
                (1 if sgn > 0 else 0) if k == axis else None
                for k in range(d)
            )
            coefs_c.append((off, halve(cmap[off], par)))
    return diag_c, coefs_c


def build_hierarchy(
    diag: jnp.ndarray, coefs, min_dim: int = 4, max_levels: int = 10
) -> List[_Level]:
    levels = []
    cur_diag, cur_coefs = diag, list(coefs)
    for _ in range(max_levels):
        safe = jnp.where(cur_diag > 0, cur_diag, 1.0)
        levels.append(_Level(cur_diag, tuple(cur_coefs), safe))
        if min(cur_diag.shape) <= min_dim:
            break
        cur_diag, cur_coefs = _coarsen(cur_diag, cur_coefs)
    return levels


_HALF_MATS: dict = {}


def _half_mat(fine: int):
    """(fine, ceil(fine/2)) 0/1 aggregation matrix: column j sums fine
    rows {2j, 2j+1}.  Cached as numpy; materialised as an XLA constant
    at trace time."""
    m = _HALF_MATS.get(fine)
    if m is None:
        import numpy as np

        a = np.zeros((fine, (fine + 1) // 2), np.float32)
        a[np.arange(fine), np.arange(fine) // 2] = 1.0
        _HALF_MATS[fine] = m = a
    return jnp.asarray(m)


def _hmm(q, spec, fine):
    """Halving/doubling matmul at HIGHEST precision: with a 0/1 operand
    and <=2 nonzeros per contraction the fp32 product is EXACT — default
    (bf16-input) MXU precision would round the residual itself."""
    import jax

    return jnp.einsum(
        spec, q, _half_mat(fine), precision=jax.lax.Precision.HIGHEST
    )


def _restrict(r, coarse_shape):
    """P^T r: 2^d-child sum onto the coarse grid.

    TPU layout note: the two MINOR axes (sublane/lane) are halved via MXU
    matmuls against 0/1 aggregation matrices; only leading (major) axes
    use the free-reshape pair sum.  The all-axes reshape-(…,2)-sum form
    splits the lane dimension, which XLA materialises as relayout ops —
    the round-3 trace showed L0 restrict+prolong at 1.14 ms of the
    1.59 ms MG-PCG iteration at 128^3 (reshape.1830/broadcast_in_dim.380
    at ~0.3 ms each, ~170x off bandwidth)."""
    d = r.ndim
    assert all(
        c == (s + 1) // 2 for s, c in zip(r.shape, coarse_shape)
    ), (r.shape, coarse_shape)
    # leading axes: pad-even + free-major reshape pair sum
    lead = r.shape[:-2]
    if lead:
        pads = [(0, s % 2) for s in lead] + [(0, 0), (0, 0)]
        if any(p[1] for p in pads):
            r = jnp.pad(r, pads)
        shp = []
        for s_ in r.shape[: d - 2]:
            shp += [s_ // 2, 2]
        shp += list(r.shape[-2:])
        r = r.reshape(shp).sum(axis=tuple(range(1, 2 * (d - 2), 2)))
    # minor two axes: MXU
    y, z = r.shape[-2:]
    r = _hmm(r, "...yz,zv->...yv", z)
    r = _hmm(r, "...yv,yu->...uv", y)
    return r


def _prolong(e, fine_shape):
    """P e: inject the parent value into all children.  Minor two axes
    via MXU matmuls (transposed aggregation), leading axes via a free
    broadcast+reshape (see `_restrict` for why)."""
    d = e.ndim
    fy, fz = fine_shape[-2:]
    out = _hmm(e, "...uv,zv->...uz", fz)
    out = _hmm(out, "...uz,yu->...yz", fy)
    lead = fine_shape[:-2]
    if lead:
        shp = []
        view = []
        for s_ in out.shape[: d - 2]:
            shp += [s_, 2]
            view += [s_, 1]
        shp += list(out.shape[-2:])
        view += list(out.shape[-2:])
        out = jnp.broadcast_to(out.reshape(view), shp).reshape(
            tuple(2 * s_ for s_ in out.shape[: d - 2])
            + tuple(out.shape[-2:])
        )
        out = out[tuple(slice(0, s_) for s_ in lead) + (Ellipsis,)]
    return out


def _smooth(level: _Level, x, b, iters: int, omega: float):
    for _ in range(iters):
        r = b - _matvec(level, x)
        x = x + omega * r / level.safe_diag
    return x


def make_mg_preconditioner(
    diag: jnp.ndarray,
    coefs,
    *,
    n_smooth: int = 2,
    omega: float = 0.8,
    coarse_iters: int = 24,
    min_dim: int = 4,
    matvec0=None,
):
    """Returns M^{-1}: r -> z, one symmetric V-cycle with zero initial
    guess (a fixed SPD linear operator, valid inside plain PCG).

    ``matvec0``: optional fused replacement for the level-0 stencil apply
    (e.g. the blocked Pallas matvec already built for the CG loop) — the
    level-0 smoother/residual is the V-cycle's only bandwidth-significant
    work, so it gets the same kernel the solver itself uses.

    On TPU every tail level (k >= 1) runs its smoothing chains as single
    fused Pallas kernels (ops/pallas_mg.py): the unfused cycle was ~700
    small latency-bound XLA ops per application, which is why MG lost to
    Jacobi end-to-end at 128^3 despite an 8x iteration cut (round-2
    DESIGN.md §9)."""
    levels = build_hierarchy(diag, coefs, min_dim=min_dim)

    from python_fluid_simulation_tpu.ops import pallas_mg

    fused = {}
    for k in range(1, len(levels)):
        if not pallas_mg.level_kernels_available(levels[k].diag.shape):
            continue
        fused[k] = pallas_mg.make_level_kernels(
            levels[k].diag,
            levels[k].coefs,
            omega=omega,
            n_smooth=n_smooth,
            coarse_iters=coarse_iters,
        )

    def lmatvec(k, p):
        if k == 0 and matvec0 is not None:
            return matvec0(p)
        return _matvec(levels[k], p)

    def lsmooth(k, x, b, iters, x_is_zero=False):
        level = levels[k]
        for i in range(iters):
            if i == 0 and x_is_zero:
                # A·0 = 0: the first relaxation from a zero guess is just
                # the scaled residual — skip the stencil apply
                x = omega * b / level.safe_diag
                continue
            r = b - lmatvec(k, x)
            x = x + omega * r / level.safe_diag
        return x

    def vcycle(k: int, b):
        if k == len(levels) - 1:
            if k in fused:
                return fused[k].coarse_solve(b)
            return lsmooth(
                k, jnp.zeros_like(b), b, coarse_iters, x_is_zero=True
            )
        if k in fused:
            x, r = fused[k].presmooth_resid(b)
        else:
            x = lsmooth(k, jnp.zeros_like(b), b, n_smooth, x_is_zero=True)
            r = b - lmatvec(k, x)
        rc = _restrict(r, levels[k + 1].diag.shape)
        ec = vcycle(k + 1, rc)
        x = x + _prolong(ec, b.shape)
        if k in fused:
            return fused[k].postsmooth(x, b)
        return lsmooth(k, x, b, n_smooth)

    active = levels[0].diag > 0

    def precond(r):
        # restrict M^{-1} to the active rows: prolongation injects parent
        # corrections into zero-diagonal (inactive) rows, where A's row
        # AND column are zero — x would drift there invisibly to the
        # residual, and downstream consumers (apply masks wider than the
        # CG-active set) would read the drift.  Identity on inactive rows
        # keeps M symmetric positive definite.
        return jnp.where(active, vcycle(0, r), r)

    return precond


# ---------------------------------------------------------------------------
# Batched V-cycle: one cycle for several same-shaped independent systems
# (the per-axis diagonal blocks of the coupled viscosity operator).  The
# un-batched per-axis cycles tripled the op count — and the V-cycle is
# op-count bound on TPU (many small pad/slice/arith ops per level), so
# batching the axes into a leading dim cuts most of its wall-clock.
# ---------------------------------------------------------------------------


def _pad_to(a, shape, fill=0.0):
    pads = [(0, t - s) for s, t in zip(a.shape, shape)]
    if not any(p[1] for p in pads):
        return a
    return jnp.pad(a, pads, constant_values=fill)


def _bshift(a, off, fill):
    return shift(a, (0,) + tuple(off), fill)


def _brestrict(r):
    """Child-sum over the trailing d dims (leading dim = batch).  Same
    minor-axes-via-MXU layout trick as `_restrict`."""
    d = r.ndim - 1
    # middle axes (batch-major, before the minor two): free pair sum
    mid = r.shape[1:-2]
    if mid:
        pads = [(0, 0)] + [(0, s % 2) for s in mid] + [(0, 0), (0, 0)]
        if any(p[1] for p in pads):
            r = jnp.pad(r, pads)
        shp = [r.shape[0]]
        for s_ in r.shape[1:-2]:
            shp += [s_ // 2, 2]
        shp += list(r.shape[-2:])
        r = r.reshape(shp).sum(axis=tuple(range(2, 2 * len(mid) + 1, 2)))
    y, z = r.shape[-2:]
    r = _hmm(r, "...yz,zv->...yv", z)
    r = _hmm(r, "...yv,yu->...uv", y)
    return r


def _pad_even_trailing(a):
    pads = [(0, 0)] + [(0, s % 2) for s in a.shape[1:]]
    if any(p[1] for p in pads):
        return jnp.pad(a, pads)
    return a


def _bprolong(e, fine_shape):
    """Parent injection over the trailing d dims (leading dim = batch).
    Minor two axes via MXU (see `_prolong`)."""
    fy, fz = fine_shape[-2:]
    out = _hmm(e, "...uv,zv->...uz", fz)
    out = _hmm(out, "...uz,yu->...yz", fy)
    mid = fine_shape[:-2]
    if mid:
        shp = [out.shape[0]]
        view = [out.shape[0]]
        for s_ in out.shape[1:-2]:
            shp += [s_, 2]
            view += [s_, 1]
        shp += list(out.shape[-2:])
        view += list(out.shape[-2:])
        out = jnp.broadcast_to(out.reshape(view), shp).reshape(
            (out.shape[0],)
            + tuple(2 * s_ for s_ in out.shape[1:-2])
            + tuple(out.shape[-2:])
        )
        out = out[
            (slice(None),)
            + tuple(slice(0, s_) for s_ in mid)
            + (Ellipsis,)
        ]
    return out


def make_batched_mg_preconditioner(
    systems,
    *,
    n_smooth: int = 2,
    omega: float = 0.8,
    coarse_iters: int = 24,
    min_dim: int = 4,
):
    """M^{-1} for B independent same-stencil systems in ONE V-cycle.

    ``systems``: list of (diag, coefs) — e.g. the per-axis same-field
    sub-operators of the viscosity block preconditioner.  Hierarchies are
    built per system (their shapes differ by ±1 face plane) and stacked
    per level onto the common padded shape; padded rows carry diag=0
    (inactive) and identity preconditioning.  Returns a function mapping
    a list of B residual arrays to B corrected arrays.
    """
    def canon(coefs):
        # canonical (+x,-x,+y,-y,...) order — matches _coarsen's output,
        # so every level of every hierarchy lines up for stacking
        def key(item):
            off = item[0]
            axis = next(i for i, o in enumerate(off) if o)
            return (axis, 0 if off[axis] > 0 else 1)

        return sorted(coefs, key=key)

    hiers = [
        build_hierarchy(diag, canon(coefs), min_dim=min_dim)
        for diag, coefs in systems
    ]
    n_lev = min(len(h) for h in hiers)
    b = len(hiers)
    blevels = []
    for k in range(n_lev):
        common = tuple(
            max(h[k].diag.shape[i] for h in hiers)
            for i in range(hiers[0][k].diag.ndim)
        )
        diag = jnp.stack([_pad_to(h[k].diag, common) for h in hiers])
        safe = jnp.stack(
            [_pad_to(h[k].safe_diag, common, 1.0) for h in hiers]
        )
        # offset ordering is PER LEVEL: level 0 keeps the caller's order,
        # _coarsen emits (+x,-x,+y,-y,...) — read it from each level
        offs_k = [off for off, _ in hiers[0][k].coefs]
        for h in hiers:
            assert [off for off, _ in h[k].coefs] == offs_k
        coefs = []
        for j, off in enumerate(offs_k):
            coefs.append(
                (
                    off,
                    jnp.stack(
                        [_pad_to(h[k].coefs[j][1], common) for h in hiers]
                    ),
                )
            )
        blevels.append(_Level(diag, tuple(coefs), safe))

    from python_fluid_simulation_tpu.ops import pallas_mg

    fused = {}
    for k in range(1, n_lev):
        if not pallas_mg.level_kernels_available(blevels[k].diag.shape):
            continue
        fused[k] = pallas_mg.make_level_kernels(
            blevels[k].diag,
            blevels[k].coefs,
            omega=omega,
            n_smooth=n_smooth,
            coarse_iters=coarse_iters,
        )

    def bmatvec(level, p):
        out = level.diag * p
        for off, c in level.coefs:
            out = out + c * _bshift(p, off, 0.0)
        return out

    def bsmooth(level, x, rhs, iters):
        for _ in range(iters):
            r = rhs - bmatvec(level, x)
            x = x + omega * r / level.safe_diag
        return x

    def vcycle(k, rhs):
        level = blevels[k]
        if k == n_lev - 1:
            if k in fused:
                return fused[k].coarse_solve(rhs)
            return bsmooth(level, jnp.zeros_like(rhs), rhs, coarse_iters)
        if k in fused:
            x, r = fused[k].presmooth_resid(rhs)
        else:
            x = bsmooth(level, jnp.zeros_like(rhs), rhs, n_smooth)
            r = rhs - bmatvec(level, x)
        rc = _brestrict(r)[
            (slice(None),)
            + tuple(slice(0, s_) for s_ in blevels[k + 1].diag.shape[1:])
        ]
        ec = vcycle(k + 1, rc)
        x = x + _bprolong(ec, rhs.shape[1:])
        if k in fused:
            return fused[k].postsmooth(x, rhs)
        return bsmooth(level, x, rhs, n_smooth)

    active = blevels[0].diag > 0
    shapes = [h[0].diag.shape for h in hiers]
    common0 = blevels[0].diag.shape[1:]

    def precond(rs):
        rb = jnp.stack(
            [_pad_to(r, common0) for r in rs]
        )
        zb = jnp.where(active, vcycle(0, rb), rb)
        return tuple(
            zb[i][tuple(slice(0, s_) for s_ in shapes[i])]
            for i in range(b)
        )

    return precond
