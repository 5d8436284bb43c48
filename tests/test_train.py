"""Learned-viscosity training pipeline: capture -> loss decreases."""

import numpy as np
import jax
import jax.numpy as jnp

from python_fluid_simulation_tpu.config import (
    GridConfig3D,
    PhysicsConfig,
    SimConfig,
)
from python_fluid_simulation_tpu.models.train import (
    capture_viscosity_pair,
    make_trainer,
    masked_mse,
)
from python_fluid_simulation_tpu.models.unet3d import UNet3D


def _tiny_cfg():
    return SimConfig(
        grid=GridConfig3D(
            bound_min=(0.0, 0.0, 0.0), bound_size=(1.0, 1.0, 1.0),
            dx=1.0 / 6,
        ),
        physics=PhysicsConfig(dt=1.0 / 60.0),
        particle_dx=1.0 / 12,
    )


def _example(cfg, seed=0):
    rng = np.random.default_rng(seed)
    n = cfg.grid.res
    dual = cfg.grid.dual_res
    shapes = [
        tuple(k + (1 if i == a else 0) for i, k in enumerate(n))
        for a in range(3)
    ]
    gv0 = [jnp.asarray(rng.standard_normal(s).astype(np.float32)) for s in shapes]
    gv1 = [v * 0.9 for v in gv0]  # fake "after viscosity" velocities
    sphi = jnp.asarray(rng.standard_normal(dual).astype(np.float32))
    lvol = jnp.asarray(rng.random(dual).astype(np.float32)) * cfg.grid.dx**3
    return capture_viscosity_pair(tuple(gv0), tuple(gv1), sphi, lvol, cfg)


def test_capture_shapes_and_mask():
    cfg = _tiny_cfg()
    ex = _example(cfg)
    assert ex.x.shape[-1] == 11
    assert ex.y.shape == ex.x.shape[:-1] + (3,)
    # mask marks exactly the face-parity sites
    n = cfg.grid.res
    expected = sum(
        np.prod([k + (1 if i == a else 0) for i, k in enumerate(n)])
        for a in range(3)
    )
    assert int(ex.mask.sum()) == expected


def test_train_step_reduces_loss():
    cfg = _tiny_cfg()
    ex = _example(cfg)
    model = UNet3D(width=4)
    init, train_step = make_trainer(model, lr=3e-4)
    ts = init(jax.random.PRNGKey(0), ex.x)
    _, loss0 = train_step(ts, ex)
    for _ in range(15):
        ts, loss = train_step(ts, ex)
    assert float(loss) < float(loss0)


def test_masked_mse_ignores_padding():
    pred = jnp.ones((1, 4, 4, 4, 3))
    target = jnp.zeros((1, 4, 4, 4, 3))
    mask = jnp.zeros((1, 4, 4, 4, 3)).at[0, 1, 1, 1, 0].set(1.0)
    assert float(masked_mse(pred, target, mask)) == 1.0


def test_generate_training_data_from_engine():
    from python_fluid_simulation_tpu.engine.scenes import dam_break_scene
    from python_fluid_simulation_tpu.models.train import (
        generate_training_data,
    )
    import dataclasses
    from python_fluid_simulation_tpu.config import SolverConfig

    cfg = _tiny_cfg()
    cfg = dataclasses.replace(
        cfg,
        physics=dataclasses.replace(cfg.physics, mu=0.5),
        solver=SolverConfig(max_iter=200),
    )
    state = dam_break_scene(cfg)
    pairs = list(generate_training_data(state, cfg, 2))
    assert len(pairs) == 2
    ex = pairs[0]
    assert ex.x.shape[-1] == 11 and ex.y.shape[-1] == 3
    assert np.isfinite(np.asarray(ex.y)).all()
