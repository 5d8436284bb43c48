"""Fully on-device (preconditioned) conjugate gradients over pytrees.

The reference drives CG from the host: every iteration does two
``.item()`` device→host round-trips plus ``cuda.synchronize()``
(PressureCGSolver3D.py:207-221, ViscosityCGSolver3D.py:588-610) — the
dominant latency structure of the whole engine (SURVEY §3.1).  Here the
loop is a ``lax.while_loop`` with carry (x, d, r, [z,] delta, k): the
entire solve is one XLA computation, and under multi-device sharding the
two dot products become ``psum``-style all-reduces XLA inserts
automatically — the only global communication in the algorithm
(SURVEY §2.4).

Non-convergence is *reported*, not raised: the while_loop is capped at
``max_iter`` and the final (iters, delta) travel in `SolveStats`
(the reference raises ValueError mid-run, PressureCGSolver3D.py:223).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class SolveStats(NamedTuple):
    iters: jnp.ndarray  # int32
    residual: jnp.ndarray  # final ||r||^2 (f32)
    initial_residual: jnp.ndarray  # ||r0||^2
    converged: jnp.ndarray  # bool


def _tree_dot(a, b):
    leaves = [
        jnp.vdot(x, y, precision=jax.lax.Precision.HIGHEST)
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    ]
    return sum(leaves)


def _axpy(alpha, x, y):
    return jax.tree.map(lambda a, b: alpha * a + b, x, y)


def cg(
    matvec: Callable,
    b,
    x0,
    *,
    tol: float = 1e-3,
    rel_tol: float = 1e-6,
    max_iter: int = 1000,
    precond: Callable | None = None,
):
    """Solve A x = b.  Returns (x, SolveStats).

    Matches the reference's update order and exit rule (break when
    ||r||^2 < tol^2; PressureCGSolver3D.py:206-221) with an added relative
    floor rel_tol^2 * ||r0||^2 against fp32 stagnation, and optional
    (Jacobi) preconditioning — ``precond`` maps r -> M^{-1} r.
    """
    r0 = jax.tree.map(lambda bb, q: bb - q, b, matvec(x0))
    z0 = precond(r0) if precond is not None else r0
    delta0 = _tree_dot(r0, z0)
    res0 = _tree_dot(r0, r0) if precond is not None else delta0
    thresh = jnp.maximum(
        jnp.asarray(tol, res0.dtype) ** 2, rel_tol**2 * res0
    )

    def cond(carry):
        _, _, _, _, res, k, delta = carry
        return (res >= thresh) & (k < max_iter) & (delta != 0)

    def body(carry):
        x, d, r, z, res, k, delta = carry
        q = matvec(d)
        dq = _tree_dot(d, q)
        alpha = jnp.where(dq != 0, delta / dq, 0.0)
        x = _axpy(alpha, d, x)
        r = _axpy(-alpha, q, r)
        z = precond(r) if precond is not None else r
        new_delta = _tree_dot(r, z)
        new_res = _tree_dot(r, r) if precond is not None else new_delta
        beta = jnp.where(delta != 0, new_delta / delta, 0.0)
        d = _axpy(beta, d, z)
        return (x, d, r, z, new_res, k + 1, new_delta)

    carry0 = (x0, z0, r0, z0, res0, jnp.int32(0), delta0)
    x, _, r, _, res, iters, _ = jax.lax.while_loop(cond, body, carry0)
    stats = SolveStats(
        iters=iters,
        residual=res,
        initial_residual=res0,
        converged=res < thresh,
    )
    return x, stats
