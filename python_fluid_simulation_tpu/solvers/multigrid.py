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


def _coarsen(diag, coefs):
    """Galerkin RAP with piecewise-constant transfers (see module doc).

    All per-parity (::2) child selections go through one free reshape
    (row-major (X,Y,Z) -> (X/2,2,...)) per field instead of 2^d strided
    gathers; masked reductions over the local-index axes express the
    internal/boundary-children sums."""
    d = diag.ndim

    def kids(a):
        """(coarse..., 2^d) local-child-index-last view, free reshape +
        one transpose of the tiny local axes."""
        a = _pad_even(a)
        shp = []
        for s_ in a.shape:
            shp += [s_ // 2, 2]
        r = a.reshape(shp)
        # move the d local axes (1,3,5,..) to the back
        perm = list(range(0, 2 * d, 2)) + list(range(1, 2 * d, 2))
        return r.transpose(perm)

    kd = kids(diag)
    kcoefs = {off: kids(c) for off, c in coefs}

    # coarse diag: sum of child diags + 2 * internal couplings
    diag_c = kd.sum(axis=tuple(range(d, 2 * d)))
    for axis in range(d):
        plus = tuple(1 if k == axis else 0 for k in range(d))
        cplus = kcoefs[plus]
        # children with even local index along `axis` couple to their
        # odd sibling through cplus
        diag_c = diag_c + 2.0 * jnp.take(cplus, 0, axis=d + axis).sum(
            axis=tuple(range(d, 2 * d - 1))
        )

    # coarse off-diagonals: sum of the 2^(d-1) fine couplings crossing
    # the coarse face (boundary children: local index 1 for +dir, 0 for
    # -dir along `axis`)
    coefs_c = []
    for axis in range(d):
        for sgn in (+1, -1):
            off = tuple(sgn if k == axis else 0 for k in range(d))
            sel = jnp.take(
                kcoefs[off], 1 if sgn > 0 else 0, axis=d + axis
            )
            coefs_c.append(
                (off, sel.sum(axis=tuple(range(d, 2 * d - 1))))
            )
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


def _restrict(r, coarse_shape):
    """P^T r: 2^d-child sum onto the (padded-even) coarse grid.

    Implemented as one free reshape (row-major (X,Y,Z) ->
    (X/2,2,Y/2,2,Z/2,2)) + one fused reduction.  The per-parity strided
    (::2) views this replaces compile to 2^d gather ops on TPU — at the
    top level of a 128^3 hierarchy they alone cost several ms per
    V-cycle (and the V-cycle runs once per PCG iteration)."""
    d = r.ndim
    r = _pad_even(r)
    shp = []
    for s_ in r.shape:
        shp += [s_ // 2, 2]
    return r.reshape(shp).sum(axis=tuple(range(1, 2 * d, 2)))


def _prolong(e, fine_shape):
    """P e: inject the parent value into all children (one broadcast +
    free reshape instead of d successive jnp.repeat relayouts)."""
    d = e.ndim
    shp = []
    for s_ in e.shape:
        shp += [s_, 2]
    out = jnp.broadcast_to(
        e.reshape(tuple(x for s_ in e.shape for x in (s_, 1))),
        tuple(shp),
    ).reshape(tuple(2 * s_ for s_ in e.shape))
    return out[tuple(slice(0, s_) for s_ in fine_shape)]


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
    work, so it gets the same kernel the solver itself uses."""
    levels = build_hierarchy(diag, coefs, min_dim=min_dim)

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
            return lsmooth(
                k, jnp.zeros_like(b), b, coarse_iters, x_is_zero=True
            )
        x = lsmooth(k, jnp.zeros_like(b), b, n_smooth, x_is_zero=True)
        r = b - lmatvec(k, x)
        rc = _restrict(r, levels[k + 1].diag.shape)
        ec = vcycle(k + 1, rc)
        x = x + _prolong(ec, b.shape)
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
    """Child-sum over the trailing d dims (leading dim = batch)."""
    d = r.ndim - 1
    r = _pad_even_trailing(r)
    shp = [r.shape[0]]
    for s_ in r.shape[1:]:
        shp += [s_ // 2, 2]
    return r.reshape(shp).sum(axis=tuple(range(2, 2 * d + 1, 2)))


def _pad_even_trailing(a):
    pads = [(0, 0)] + [(0, s % 2) for s in a.shape[1:]]
    if any(p[1] for p in pads):
        return jnp.pad(a, pads)
    return a


def _bprolong(e, fine_shape):
    shp = [e.shape[0]]
    view = [e.shape[0]]
    for s_ in e.shape[1:]:
        shp += [s_, 2]
        view += [s_, 1]
    out = jnp.broadcast_to(e.reshape(view), shp).reshape(
        (e.shape[0],) + tuple(2 * s_ for s_ in e.shape[1:])
    )
    return out[(slice(None),) + tuple(slice(0, s_) for s_ in fine_shape)]


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
            return bsmooth(level, jnp.zeros_like(rhs), rhs, coarse_iters)
        x = bsmooth(level, jnp.zeros_like(rhs), rhs, n_smooth)
        r = rhs - bmatvec(level, x)
        rc = _brestrict(r)[
            (slice(None),)
            + tuple(slice(0, s_) for s_ in blevels[k + 1].diag.shape[1:])
        ]
        ec = vcycle(k + 1, rc)
        x = x + _bprolong(ec, rhs.shape[1:])
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
