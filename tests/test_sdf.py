"""Analytic SDF evaluate/project vs closed forms (SURVEY §4 plan)."""

import numpy as np
import jax.numpy as jnp
import pytest

from python_fluid_simulation_tpu.ops import sdf


def test_sphere_eval():
    rbs = sdf.RigidBodySet()
    rbs.add("s", "sphere", [0.5], center=[1.0, 0.0, 0.0])
    pts = jnp.array([[2.0, 0, 0], [1.0, 0, 0], [1.0, 0.5, 0]])
    sd, vel = sdf.evaluate(rbs.table(), pts)
    np.testing.assert_allclose(sd, [0.5, -0.5, 0.0], atol=1e-6)
    assert np.all(np.asarray(vel)[0] == 0)


def test_sphere_velocity_written_only_inside():
    rbs = sdf.RigidBodySet()
    rbs.add("s", "sphere", [1.0], velocity=[1.0, 2.0, 3.0])
    pts = jnp.array([[0.0, 0, 0], [3.0, 0, 0]])
    _, vel = sdf.evaluate(rbs.table(), pts)
    np.testing.assert_allclose(vel[0], [1, 2, 3], atol=1e-6)
    np.testing.assert_allclose(vel[1], [0, 0, 0], atol=1e-6)


def test_box_eval_axis_aligned():
    rbs = sdf.RigidBodySet()
    rbs.add("b", "box", [2.0, 2.0, 2.0])  # half-size 1
    pts = jnp.array(
        [[0, 0, 0], [2, 0, 0], [0, 1.5, 0], [1, 1, 1], [2, 2, 0]],
        dtype=jnp.float32,
    )
    sd, _ = sdf.evaluate(rbs.table(), pts)
    np.testing.assert_allclose(
        sd, [-1.0, 1.0, 0.5, 0.0, np.sqrt(2.0)], atol=1e-6
    )


def test_box_flip():
    rbs = sdf.RigidBodySet()
    rbs.add("b", "box", [2.0, 2.0, 2.0], flip=True)
    pts = jnp.array([[0, 0, 0], [2, 0, 0]], dtype=jnp.float32)
    sd, _ = sdf.evaluate(rbs.table(), pts)
    np.testing.assert_allclose(sd, [1.0, -1.0], atol=1e-6)


def test_box_rotated():
    rbs = sdf.RigidBodySet()
    rbs.add("b", "box", [2.0, 2.0, 2.0], axis=[0, 0, 1], angle=45)
    # corner of the rotated box is at (sqrt(2),0,0)
    pts = jnp.array([[2.0, 0, 0]], dtype=jnp.float32)
    sd, _ = sdf.evaluate(rbs.table(), pts)
    np.testing.assert_allclose(sd, [2.0 - np.sqrt(2.0)], atol=1e-5)


def test_cylinder_eval():
    rbs = sdf.RigidBodySet()
    rbs.add("c", "cylinder", [1.0, 2.0])  # radius 1, height 2
    pts = jnp.array(
        [[0, 0, 0], [2, 0, 0], [0, 2, 0], [2, 2, 0]], dtype=jnp.float32
    )
    sd, _ = sdf.evaluate(rbs.table(), pts)
    np.testing.assert_allclose(
        sd, [-1.0, 1.0, 1.0, np.sqrt(2.0)], atol=1e-6
    )


def test_min_over_bodies_and_owner_velocity():
    rbs = sdf.RigidBodySet()
    rbs.add("a", "sphere", [1.0], center=[0, 0, 0], velocity=[1, 0, 0])
    rbs.add("b", "sphere", [1.0], center=[3, 0, 0], velocity=[0, 1, 0])
    pts = jnp.array([[2.5, 0, 0]], dtype=jnp.float32)
    sd, vel = sdf.evaluate(rbs.table(), pts)
    np.testing.assert_allclose(sd, [-0.5], atol=1e-6)
    np.testing.assert_allclose(vel[0], [0, 1, 0], atol=1e-6)


def test_project_sphere():
    rbs = sdf.RigidBodySet()
    rbs.add("s", "sphere", [1.0])
    pts = jnp.array([[0.5, 0, 0], [2.0, 0, 0]], dtype=jnp.float32)
    out = sdf.project(rbs.table(), pts)
    np.testing.assert_allclose(out[0], [1.0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[1], [2.0, 0, 0], atol=1e-6)


def test_project_flipped_box_clamps():
    rbs = sdf.RigidBodySet()
    rbs.add("b", "box", [2.0, 2.0, 2.0], flip=True)
    pts = jnp.array([[1.7, 0.2, -3.0], [0.2, 0.1, 0.0]], dtype=jnp.float32)
    out = sdf.project(rbs.table(), pts)
    np.testing.assert_allclose(out[0], [1.0, 0.2, -1.0], atol=1e-6)
    np.testing.assert_allclose(out[1], [0.2, 0.1, 0.0], atol=1e-6)


def test_project_box_pushes_out_nearest_face():
    rbs = sdf.RigidBodySet()
    rbs.add("b", "box", [2.0, 2.0, 2.0])
    pts = jnp.array([[0.8, 0.1, 0.0]], dtype=jnp.float32)
    out = sdf.project(rbs.table(), pts)
    np.testing.assert_allclose(out[0], [1.0, 0.1, 0.0], atol=1e-6)


def test_project_cylinder():
    rbs = sdf.RigidBodySet()
    rbs.add("c", "cylinder", [1.0, 2.0])
    pts = jnp.array([[0.9, 0.0, 0.0], [0.0, 0.95, 0.0]], dtype=jnp.float32)
    out = sdf.project(rbs.table(), pts)
    np.testing.assert_allclose(out[0], [1.0, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(out[1], [0.0, 1.0, 0.0], atol=1e-6)


def test_project_under_jit_traced_table():
    import jax

    rbs = sdf.RigidBodySet()
    rbs.add("s", "sphere", [1.0])
    rbs.add("b", "box", [2.0, 2.0, 2.0], flip=True, center=[0, 5, 0])
    pts = jnp.array([[0.5, 0, 0]], dtype=jnp.float32)
    out_static = sdf.project(rbs.table(), pts)
    out_jit = jax.jit(sdf.project)(rbs.table(), pts)
    np.testing.assert_allclose(out_static, out_jit, atol=1e-6)
