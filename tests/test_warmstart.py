"""BASELINE config 4 demonstration: a UNet trained on self-generated
(state, Δv) pairs warm-starts the viscosity CG and measurably reduces its
iteration count — the paper's data-driven-viscosity claim, plumbed
end-to-end (capture → train → unet_warm step).

The reference uses its UNet INSTEAD of the CG solve (cell 13 :4632-4640);
warm-starting keeps the classical solve (same solution to tolerance) and
banks the prediction as a better initial iterate.  A narrow (width-4)
UNet trained ~in-sample is enough to show the effect; the full-width
production model only improves the guess.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from python_fluid_simulation_tpu.engine.scenes import (
    buckling_config,
    buckling_scene,
)
from python_fluid_simulation_tpu.engine.step import step_3d
from python_fluid_simulation_tpu.models.train import (
    capture_viscosity_pair,
    train,
)
from python_fluid_simulation_tpu.models.unet3d import UNet3D


@pytest.mark.slow
def test_unet_warm_start_reduces_viscosity_iterations():
    cfg = buckling_config(dx=0.0625, mu=8.0)
    import dataclasses

    cfg = dataclasses.replace(
        cfg,
        solver=dataclasses.replace(
            cfg.solver, tol=1e-5, rel_tol=1e-5, max_iter=500, pallas="off"
        ),
        dt_mode="fixed",
    )
    state = buckling_scene(cfg)

    # --- generate training pairs from the classical engine (the 'apic'
    # ml_data capture, cell 13 :4611-4630)
    @functools.partial(jax.jit, static_argnums=(1,))
    def _cap_step(s, _cfg):
        return step_3d(s, _cfg, capture_ml=True)

    pairs = []
    states = [state]
    for _ in range(4):
        state, metrics = _cap_step(state, cfg)
        pairs.append(jax.tree.map(np.asarray, metrics["ml_pair"]))
        states.append(state)

    # --- briefly train a narrow UNet on the captured pairs (in-sample —
    # demonstrating the mechanism, not generalisation)
    model = UNet3D(width=8)

    def epochs():
        while True:
            for p in pairs:
                yield jax.tree.map(jnp.asarray, p)

    # width 8 / 600 steps trains to ~0.01x the initial loss in-sample;
    # a width-4/200-step model only halved the loss and its Δv prediction
    # was ~3x under-scaled — direction-accurate (corr 0.9) but worth <1
    # CG iteration, which made the iteration assert below flaky.
    params, losses = train(model, epochs(), num_steps=600, lr=2e-3,
                           log_every=1000)
    # compare full example cycles (per-example losses differ; [-1] vs [0]
    # would compare different examples)
    first_cycle = float(np.mean(losses[: len(pairs)]))
    last_cycle = float(np.mean(losses[-len(pairs):]))
    assert last_cycle < 0.2 * first_cycle, (first_cycle, last_cycle)

    # --- same step, cold vs warm: identical linear system, different x0
    eval_state = states[2]

    @functools.partial(jax.jit, static_argnums=(1, 3))
    def _step(s, _cfg, p, apply_fn):
        return step_3d(s, _cfg, apply_fn, p)

    _, m_cold = _step(eval_state, cfg, None, None)
    warm_cfg = dataclasses.replace(
        cfg,
        solver=dataclasses.replace(cfg.solver, viscosity_mode="unet_warm"),
    )
    _, m_warm = _step(eval_state, warm_cfg, params, model.apply)

    cold = int(m_cold["viscosity_iters"])
    warm = int(m_warm["viscosity_iters"])
    print(f"viscosity CG iterations: cold {cold} -> warm {warm}")
    assert cold > 0
    assert warm < cold, (cold, warm)
    # warm start must not change the converged answer
    out_cold, _ = _step(eval_state, cfg, None, None)
    out_warm, _ = _step(eval_state, warm_cfg, params, model.apply)
    np.testing.assert_allclose(
        np.asarray(out_warm.particles.v),
        np.asarray(out_cold.particles.v),
        atol=2e-3,
    )
