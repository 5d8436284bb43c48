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
    """Galerkin RAP with piecewise-constant transfers (see module doc)."""
    d = diag.ndim
    diag = _pad_even(diag)
    coefs = {off: _pad_even(c) for off, c in coefs}
    shape = diag.shape

    def children(a):  # (2^d) stride-2 views stacked on a new axis
        views = []
        import itertools

        for par in itertools.product((0, 1), repeat=d):
            idx = tuple(slice(p, None, 2) for p in par)
            views.append(a[idx])
        return views

    # coarse diag: sum of child diags + 2 * internal couplings
    diag_c = sum(children(diag))
    for axis in range(d):
        plus = tuple(1 if k == axis else 0 for k in range(d))
        cplus = coefs[plus]
        # internal faces: from children with even local index along axis
        # to their odd sibling: coupling cplus at cells with local par=0
        import itertools

        for par in itertools.product((0, 1), repeat=d):
            if par[axis] != 0:
                continue
            idx = tuple(slice(p, None, 2) for p in par)
            diag_c = diag_c + 2.0 * cplus[idx]

    # coarse off-diagonals: sum of the 4 fine couplings crossing the face
    coefs_c = []
    for axis in range(d):
        for sgn in (+1, -1):
            off = tuple(sgn if k == axis else 0 for k in range(d))
            cf = coefs[off]
            acc = None
            import itertools

            for par in itertools.product((0, 1), repeat=d):
                # boundary children: local index 1 for +dir, 0 for -dir
                if par[axis] != (1 if sgn > 0 else 0):
                    continue
                idx = tuple(slice(p, None, 2) for p in par)
                acc = cf[idx] if acc is None else acc + cf[idx]
            coefs_c.append((off, acc))
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
    """P^T r: 8-child sum onto the (padded-even) coarse grid."""
    d = r.ndim
    r = _pad_even(r)
    out = None
    import itertools

    for par in itertools.product((0, 1), repeat=d):
        idx = tuple(slice(p, None, 2) for p in par)
        out = r[idx] if out is None else out + r[idx]
    return out


def _prolong(e, fine_shape):
    """P e: inject the parent value into all children."""
    d = e.ndim
    out = e
    for axis in range(d):
        out = jnp.repeat(out, 2, axis=axis)
    return out[tuple(slice(0, s) for s in fine_shape)]


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
):
    """Returns M^{-1}: r -> z, one symmetric V-cycle with zero initial
    guess (a fixed SPD linear operator, valid inside plain PCG)."""
    levels = build_hierarchy(diag, coefs, min_dim=min_dim)

    def vcycle(k: int, b):
        level = levels[k]
        if k == len(levels) - 1:
            return _smooth(level, jnp.zeros_like(b), b, coarse_iters, omega)
        x = _smooth(level, jnp.zeros_like(b), b, n_smooth, omega)
        r = b - _matvec(level, x)
        rc = _restrict(r, levels[k + 1].diag.shape)
        ec = vcycle(k + 1, rc)
        x = x + _prolong(ec, b.shape)
        return _smooth(level, x, b, n_smooth, omega)

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
