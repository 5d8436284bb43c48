"""Checkpoint / resume of full simulation state.

The reference has NO mid-run checkpointing — only a final pickle of the
particle-position series (cell 13 :4669-4670) and torch model weights
loaded from disk; resume is impossible (SURVEY §5).  Here the full
SimState pytree (particles + solid geometry + clock) plus the SimConfig
round-trips through Orbax, giving elastic restart (the TPU-native answer
to failure recovery).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import jax
import numpy as np

from python_fluid_simulation_tpu.config import SimConfig
from python_fluid_simulation_tpu.state import Particles, SimState, SolidState

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


def _state_to_numpy(state: SimState):
    return jax.tree.map(np.asarray, state)


def _config_to_json(cfg) -> str:
    """Serialize SimConfig (frozen dataclass) or SimConfig2D (NamedTuple)."""
    import dataclasses as dc

    def conv(o):
        if dc.is_dataclass(o):
            return {k: conv(v) for k, v in dc.asdict(o).items()}
        if hasattr(o, "_asdict"):
            return {k: conv(v) for k, v in o._asdict().items()}
        if isinstance(o, tuple):
            return list(o)
        return o

    return json.dumps(conv(cfg), indent=2)


def save_checkpoint(path: str, state: SimState, cfg, step: int):
    """Write state + config; `path` is a directory."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        f.write(_config_to_json(cfg))
    if _HAS_ORBAX:
        ckpt = ocp.StandardCheckpointer()
        ckpt.save(
            os.path.abspath(os.path.join(path, f"state_{step}")),
            _state_to_numpy(state),
            force=True,  # same-step re-saves overwrite (end-of-run save)
        )
        ckpt.wait_until_finished()
    else:  # portable fallback
        flat = jax.tree.leaves(_state_to_numpy(state))
        np.savez(os.path.join(path, f"state_{step}.npz"), *flat)


def latest_step(path: str) -> Optional[int]:
    if not os.path.isdir(path):
        return None
    steps = []
    for name in os.listdir(path):
        if name.startswith("state_"):
            stem = name[len("state_"):].split(".")[0]
            if stem.isdigit():
                steps.append(int(stem))
    return max(steps) if steps else None


def restore_checkpoint(
    path: str, step: Optional[int] = None
) -> Tuple[SimState, SimConfig, int]:
    with open(os.path.join(path, "config.json")) as f:
        text = f.read()
    if len(json.loads(text).get("grid", {}).get("bound_min", [0] * 3)) == 2:
        from python_fluid_simulation_tpu.config import GridConfig2D
        from python_fluid_simulation_tpu.engine.step2d import SimConfig2D
        from python_fluid_simulation_tpu.config import (
            PhysicsConfig,
            SolverConfig,
        )

        d = json.loads(text)
        g = d["grid"]
        cfg = SimConfig2D(
            grid=GridConfig2D(
                bound_min=tuple(g["bound_min"]),
                bound_size=tuple(g["bound_size"]),
                dx=g["dx"],
            ),
            physics=PhysicsConfig(**d["physics"]),
            solver=SolverConfig(**d["solver"]),
            particle_dx=d["particle_dx"],
            dt_mode=d["dt_mode"],
            duration=d["duration"],
        )
    else:
        cfg = SimConfig.from_json(text)
    if step is None:
        step = latest_step(path)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
    # build an abstract target from the config is overkill here: restore
    # raw pytrees and rebuild the NamedTuples
    if _HAS_ORBAX and os.path.isdir(os.path.join(path, f"state_{step}")):
        ckpt = ocp.StandardCheckpointer()
        raw = ckpt.restore(os.path.abspath(os.path.join(path, f"state_{step}")))
        state = _rebuild(raw)
    else:
        data = np.load(os.path.join(path, f"state_{step}.npz"))
        flat = [data[k] for k in data.files]
        template = _template_treedef()
        if len(flat) == template.num_leaves - 1:
            flat.append(np.int32(0))  # pre-visc_mg checkpoints
        state = jax.tree.unflatten(template, flat)
    return state, cfg, step


def _template_treedef():
    dummy = SimState(
        particles=Particles(x=0, v=0, c=0, m=0),
        solid=SolidState(phi=0, v=0, rb=0),
        t=0,
        step_idx=0,
        visc_mg=0,
    )
    return jax.tree.structure(dummy)


def _rebuild(raw) -> SimState:
    if isinstance(raw, SimState):
        return raw
    p = raw["particles"]
    s = raw["solid"]
    return SimState(
        particles=Particles(x=p["x"], v=p["v"], c=p["c"], m=p["m"]),
        solid=SolidState(phi=s["phi"], v=s["v"], rb=s["rb"]),
        t=raw["t"],
        step_idx=raw["step_idx"],
        visc_mg=raw.get("visc_mg", 0),
    )
