"""On-device CG vs dense oracle; pytree (multi-field) systems."""

import numpy as np
import jax.numpy as jnp

from python_fluid_simulation_tpu.solvers.cg import cg


def _spd(n, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n))
    return (a @ a.T + n * np.eye(n)).astype(np.float32)


def test_cg_dense_spd():
    n = 40
    a = _spd(n)
    b = np.random.default_rng(1).standard_normal(n).astype(np.float32)
    aj = jnp.asarray(a)
    x, stats = cg(
        lambda v: aj @ v,
        jnp.asarray(b),
        jnp.zeros(n, jnp.float32),
        tol=1e-5,
        rel_tol=1e-7,
        max_iter=500,
    )
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(a, b), rtol=2e-3, atol=2e-4
    )
    assert bool(stats.converged)
    assert int(stats.iters) <= 500


def test_cg_jacobi_precond_fewer_iters():
    n = 60
    rng = np.random.default_rng(2)
    d = rng.random(n).astype(np.float32) * 100 + 1
    a = _spd(n, 3) + np.diag(d)
    b = rng.standard_normal(n).astype(np.float32)
    aj = jnp.asarray(a)
    diag = jnp.asarray(np.diag(a))
    x0 = jnp.zeros(n, jnp.float32)
    _, s_plain = cg(lambda v: aj @ v, jnp.asarray(b), x0, tol=1e-5, max_iter=500)
    x, s_pc = cg(
        lambda v: aj @ v,
        jnp.asarray(b),
        x0,
        tol=1e-5,
        max_iter=500,
        precond=lambda r: r / diag,
    )
    assert int(s_pc.iters) <= int(s_plain.iters)
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(np.asarray(a), b), rtol=2e-3, atol=2e-4
    )


def test_cg_pytree_system():
    # block-diagonal SPD system over a tuple of two fields
    a1, a2 = _spd(16, 4), _spd(24, 5)
    rng = np.random.default_rng(6)
    b1 = rng.standard_normal(16).astype(np.float32)
    b2 = rng.standard_normal(24).astype(np.float32)
    aj1, aj2 = jnp.asarray(a1), jnp.asarray(a2)

    def mv(t):
        return (aj1 @ t[0], aj2 @ t[1])

    x, stats = cg(
        mv,
        (jnp.asarray(b1), jnp.asarray(b2)),
        (jnp.zeros(16, jnp.float32), jnp.zeros(24, jnp.float32)),
        tol=1e-5,
        max_iter=500,
    )
    np.testing.assert_allclose(np.asarray(x[0]), np.linalg.solve(a1, b1), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(x[1]), np.linalg.solve(a2, b2), rtol=2e-3, atol=2e-4)


def test_cg_zero_rhs_immediate():
    a = jnp.eye(8)
    x, stats = cg(lambda v: a @ v, jnp.zeros(8), jnp.zeros(8), tol=1e-6)
    assert int(stats.iters) == 0
    assert bool(stats.converged)
    np.testing.assert_allclose(np.asarray(x), 0.0)


def test_cg_reports_nonconvergence():
    n = 50
    a = _spd(n, 7)
    b = np.random.default_rng(8).standard_normal(n).astype(np.float32)
    aj = jnp.asarray(a)
    _, stats = cg(
        lambda v: aj @ v, jnp.asarray(b), jnp.zeros(n, jnp.float32),
        tol=1e-12, rel_tol=0.0, max_iter=2,
    )
    assert int(stats.iters) == 2
    assert not bool(stats.converged)
