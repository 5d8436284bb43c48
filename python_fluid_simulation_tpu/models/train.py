"""Training pipeline for the learned viscosity operator.

The reference trains its UNet offline on pairs captured from the classical
solver: in 'apic' mode the notebook stores (vx,vy,vz, sphi, lphi, lvol,
mu, dt) before the viscosity CG solve and (vx_new,...) after it
(cell 13 :4611-4630, the ``ml_data`` dict — note its lvol/lphi keys are
swapped relative to their contents, SURVEY §2.2).  Ground truth is the CG
solve itself (SURVEY §4).

Here the capture runs inside the jitted step (`capture_viscosity_pair`),
examples are the 11-channel feature boxes of features.py with Δv·(1/DT)
targets at face parities, and training is a standard optax loop.
"""

from __future__ import annotations

from typing import Dict, Iterator, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from python_fluid_simulation_tpu.config import SimConfig
from python_fluid_simulation_tpu.models.features import (
    _FACE_PARITY,
    _embed,
    build_unet_input,
    padded_box,
)
from python_fluid_simulation_tpu.models.unet3d import UNet3D


class ViscosityExample(NamedTuple):
    """One training pair: features + parity-embedded Δv target + mask."""

    x: jnp.ndarray  # (1, D, H, W, 11)
    y: jnp.ndarray  # (1, D, H, W, 3) Δv·(1/dt) at face parities
    mask: jnp.ndarray  # (1, D, H, W, 3) 1 at face parities


def capture_viscosity_pair(
    gv_before, gv_after, sphi, lvol, cfg: SimConfig
) -> ViscosityExample:
    """Build (features, target) from velocities around the CG solve."""
    dual = sphi.shape
    data_size, pad = padded_box(dual)
    x = build_unet_input(gv_before, sphi, lvol, cfg.grid.dx**3)
    inv_dt = float(int(round(1.0 / cfg.physics.dt)))
    chans = []
    masks = []
    for a in range(3):
        dv = (gv_after[a] - gv_before[a]) * inv_dt
        chans.append(_embed(dv, data_size, pad, _FACE_PARITY[a]))
        masks.append(
            _embed(jnp.ones_like(dv), data_size, pad, _FACE_PARITY[a])
        )
    y = jnp.stack(chans, axis=-1)[None]
    mask = jnp.stack(masks, axis=-1)[None]
    return ViscosityExample(x=x, y=y, mask=mask)


def masked_mse(pred, target, mask):
    """Loss on face-parity sites only (other lattice sites are padding)."""
    se = (pred - target) ** 2 * mask
    return jnp.sum(se) / jnp.maximum(jnp.sum(mask), 1.0)


class TrainState(NamedTuple):
    params: Dict
    opt_state: optax.OptState
    step: jnp.ndarray


def make_trainer(
    model: UNet3D, lr: float = 1e-4, weight_decay: float = 0.0
):
    tx = (
        optax.adamw(lr, weight_decay=weight_decay)
        if weight_decay
        else optax.adam(lr)
    )

    def init(rng, example_x) -> TrainState:
        params = model.init(rng, example_x)
        return TrainState(params, tx.init(params), jnp.int32(0))

    @jax.jit
    def train_step(ts: TrainState, ex: ViscosityExample):
        def loss_fn(p):
            pred = model.apply(p, ex.x)
            return masked_mse(pred, ex.y, ex.mask)

        loss, grads = jax.value_and_grad(loss_fn)(ts.params)
        updates, opt_state = tx.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        return TrainState(params, opt_state, ts.step + 1), loss

    return init, train_step


def train(
    model: UNet3D,
    examples: Iterator[ViscosityExample],
    num_steps: int,
    lr: float = 1e-4,
    seed: int = 0,
    log_every: int = 50,
) -> Tuple[Dict, list]:
    """Minimal offline loop; returns (params, loss history)."""
    init, train_step = make_trainer(model, lr)
    first = next(examples)
    ts = init(jax.random.PRNGKey(seed), first.x)
    losses = []
    ex = first
    for k in range(num_steps):
        ts, loss = train_step(ts, ex)
        losses.append(float(loss))
        if (k + 1) % log_every == 0:
            print(f"train step {k+1}: loss {np.mean(losses[-log_every:]):.3e}")
        try:
            ex = next(examples)
        except StopIteration:
            break
    return ts.params, losses


def generate_training_data(state, cfg, num_steps: int):
    """Run the classical ('apic') engine capturing one training pair per
    step — the offline data-generation pipeline behind the paper's UNet
    (reference: the 'apic' branch of cell 13 dumps ml_data per step).

    Yields ViscosityExample per step; the state advances normally.
    """
    import functools

    import jax

    from python_fluid_simulation_tpu.engine.step import step_3d

    @functools.partial(jax.jit, static_argnums=(1,))
    def _step(s, _cfg):
        return step_3d(s, _cfg, capture_ml=True)

    for _ in range(num_steps):
        state, metrics = _step(state, cfg)
        yield metrics["ml_pair"]
