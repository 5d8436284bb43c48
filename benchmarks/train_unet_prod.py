"""Production-width learned viscosity operator: capture -> train -> eval.

The reference's headline capability is a trained full-width UNet that
REPLACES the viscosity CG solve (model_3d.py:9-136; used in cell 13
:4632-4640).  Its published checkpoint is not available in this
environment (the download of README.md:5 / cell 1 :85 needs egress), so
this script reproduces the capability end-to-end on the flagship
buckling scene:

  capture   run the classical ('apic') engine, dumping the raw fields
            around each viscosity CG solve (step_3d(capture_ml="raw"))
            as one .npz per step — the engine-side ml_data dump
            (cell 13 :4611-4630) at ~10 MB/step instead of ~150.
  train     full-width (width=64, 68.7M param) UNet3D on the captured
            pairs, bf16 compute / fp32 params, batch 1 over shuffled
            steps; saves flax msgpack params + loss curve.
  eval      three runs from the same initial state: 'apic' (ground
            truth), 'unet' (CG replaced by the net, the reference's
            mode), 'unet_warm' (net warm-starts CG).  Reports per-step
            fluid-surface IoU (lphi<0) of unet vs apic and the
            warm-start viscosity-iteration cut; writes
            artifacts/unet_prod/metrics.json.

  python benchmarks/train_unet_prod.py capture --steps 300
  python benchmarks/train_unet_prod.py train --epochs 12
  python benchmarks/train_unet_prod.py eval --steps 120
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(HERE, "artifacts", "unet_prod")
DATA = os.path.join(OUT, "pairs")
CKPT = os.path.join(OUT, "unet_width64.msgpack")


def _cfg():
    import dataclasses

    from python_fluid_simulation_tpu.engine.scenes import buckling_config

    cfg = buckling_config(dx=0.0125, mu=1.0, viscosity_mode="apic")
    # fixed dt: the captured targets are scaled by 1/DT
    # (capture_viscosity_pair), and the reference's unet mode always
    # steps at DT (cell 13 :4572-4576) — train and eval consistently
    return dataclasses.replace(cfg, dt_mode="fixed")


def capture(steps: int):
    import functools

    import jax

    from python_fluid_simulation_tpu.engine.scenes import buckling_scene
    from python_fluid_simulation_tpu.engine.step import _geom_jit, step_3d

    os.makedirs(DATA, exist_ok=True)
    cfg = _cfg()
    state = buckling_scene(cfg)
    geom = _geom_jit(state.solid, None)

    @functools.partial(jax.jit, static_argnums=(1,))
    def _step(s, _cfg, g):
        return step_3d(s, _cfg, capture_ml="raw", geom=g)

    np.save(
        os.path.join(OUT, "sphi.npy"), np.asarray(state.solid.phi)
    )
    t0 = time.perf_counter()
    for k in range(steps):
        state, metrics = _step(state, cfg, geom)
        pair = metrics["ml_pair"]
        gvb = [np.asarray(v, np.float32) for v in pair["gv_before"]]
        dv = [
            np.asarray(a, np.float32) - b
            for a, b in zip(pair["gv_after"], gvb)
        ]
        np.savez(
            os.path.join(DATA, f"pair_{k:04d}.npz"),
            gvx=gvb[0], gvy=gvb[1], gvz=gvb[2],
            dvx=dv[0], dvy=dv[1], dvz=dv[2],
            lvol=np.asarray(pair["lvol"], np.float16),
            visc_iters=np.asarray(metrics["viscosity_iters"]),
        )
        if (k + 1) % 25 == 0:
            dt_s = (time.perf_counter() - t0) / (k + 1)
            print(f"captured {k+1}/{steps} ({dt_s*1000:.0f} ms/step)", flush=True)
    print(f"done: {steps} pairs in {DATA}")


def _load_pair(path, sphi, cfg, jit_build):
    import jax.numpy as jnp

    z = np.load(path)
    gvb = tuple(jnp.asarray(z[k]) for k in ("gvx", "gvy", "gvz"))
    gva = tuple(
        jnp.asarray(z["gv" + a] + z["dv" + a]) for a in ("x", "y", "z")
    )
    lvol = jnp.asarray(z["lvol"].astype(np.float32))
    return jit_build(gvb, gva, sphi, lvol)


def train(epochs: int, lr: float, width: int, resume: bool,
          steps_cap: int | None = None):
    import flax.serialization
    import jax
    import jax.numpy as jnp

    from python_fluid_simulation_tpu.models.train import (
        capture_viscosity_pair,
        make_trainer,
    )
    from python_fluid_simulation_tpu.models.unet3d import UNet3D

    cfg = _cfg()
    sphi = jnp.asarray(np.load(os.path.join(OUT, "sphi.npy")))
    files = sorted(
        os.path.join(DATA, f) for f in os.listdir(DATA)
        if f.startswith("pair_")
    )
    if steps_cap:
        files = files[:steps_cap]
    assert files, "run `capture` first"
    print(f"{len(files)} pairs, width={width}, epochs={epochs}")

    model = UNet3D(width=width, dtype=jnp.bfloat16)
    jit_build = jax.jit(
        lambda gvb, gva, s, lv: capture_viscosity_pair(
            gvb, gva, s, lv, cfg
        )
    )
    init, train_step = make_trainer(model, lr)
    ex0 = _load_pair(files[0], sphi, cfg, jit_build)
    if resume and os.path.exists(CKPT):
        params = model.init(jax.random.PRNGKey(0), ex0.x)
        with open(CKPT, "rb") as f:
            params = flax.serialization.from_bytes(params, f.read())
        import optax

        ts = init(jax.random.PRNGKey(0), ex0.x)._replace(params=params)
        print("resumed from", CKPT)
    else:
        ts = init(jax.random.PRNGKey(0), ex0.x)
    n_params = sum(
        int(np.prod(p.shape)) for p in jax.tree.leaves(ts.params)
    )
    print(f"params: {n_params/1e6:.1f}M")

    rng = np.random.default_rng(0)
    losses = []
    t0 = time.perf_counter()
    it = 0
    for ep in range(epochs):
        order = rng.permutation(len(files))
        for j in order:
            ex = _load_pair(files[j], sphi, cfg, jit_build)
            ts, loss = train_step(ts, ex)
            losses.append(float(loss))
            it += 1
            if it % 50 == 0:
                dt_s = (time.perf_counter() - t0) / it
                print(
                    f"ep {ep} it {it}: loss {np.mean(losses[-50:]):.4e}"
                    f" ({dt_s*1000:.0f} ms/it)",
                    flush=True,
                )
        # checkpoint every epoch
        with open(CKPT, "wb") as f:
            f.write(flax.serialization.to_bytes(ts.params))
        np.save(os.path.join(OUT, "loss_curve.npy"), np.asarray(losses))
    print("saved", CKPT)


def _surface_iou(a_phi, b_phi):
    a = a_phi < 0
    b = b_phi < 0
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    return float(inter) / max(1, int(union))


def load_params(width: int = 64):
    import flax.serialization
    import jax
    import jax.numpy as jnp

    from python_fluid_simulation_tpu.models.unet3d import UNet3D

    model = UNet3D(width=width, dtype=jnp.bfloat16)
    cfg = _cfg()
    from python_fluid_simulation_tpu.engine.scenes import buckling_scene

    state = buckling_scene(cfg)
    dual = state.solid.phi.shape
    from python_fluid_simulation_tpu.models.features import padded_box

    data_size, _ = padded_box(dual)
    x0 = jnp.zeros((1,) + data_size + (11,), jnp.float32)
    params = jax.eval_shape(
        lambda: UNet3D(width=width).init(jax.random.PRNGKey(0), x0)
    )
    params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), params
    )
    with open(CKPT, "rb") as f:
        params = flax.serialization.from_bytes(params, f.read())
    return model, params


def evaluate(steps: int, width: int):
    import functools

    import jax
    import jax.numpy as jnp

    from python_fluid_simulation_tpu.engine.scenes import buckling_scene
    from python_fluid_simulation_tpu.engine.step import _geom_jit, step_3d
    from python_fluid_simulation_tpu.ops.levelset import (
        compute_fluid_levelset,
    )

    cfg = _cfg()
    model, params = load_params(width)
    g = cfg.grid

    lphi_of = jax.jit(
        lambda px, pm: compute_fluid_levelset(
            px, g.res, g.bound_min, g.cell_size, g.dx, pm=pm
        )
    )

    import dataclasses

    def run(mode):
        c = dataclasses.replace(
            cfg,
            solver=dataclasses.replace(cfg.solver, viscosity_mode=mode),
        )
        state = buckling_scene(c)
        geom = _geom_jit(state.solid, None)

        @functools.partial(jax.jit, static_argnums=(1, 3))
        def _step(s, _cfg, p, a, gm):
            return step_3d(s, _cfg, a, p, geom=gm)

        apply_fn = model.apply if mode != "apic" else None
        p = params if mode != "apic" else None
        phis, iters = [], []
        for _ in range(steps):
            state, metrics = _step(state, c, p, apply_fn, geom)
            phis.append(
                np.asarray(lphi_of(state.particles.x, state.particles.m))
            )
            iters.append(int(metrics["viscosity_iters"]))
        return phis, iters

    t0 = time.perf_counter()
    apic_phis, apic_iters = run("apic")
    print(f"apic run: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    unet_phis, _ = run("unet")
    print(f"unet run: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    _, warm_iters = run("unet_warm")
    print(f"warm run: {time.perf_counter()-t0:.1f}s", flush=True)

    ious = [
        _surface_iou(a, u) for a, u in zip(apic_phis, unet_phis)
    ]
    rec = {
        "steps": steps,
        "grid": list(cfg.grid.res),
        "width": width,
        "iou_series_every_10": [round(v, 4) for v in ious[::10]],
        "iou_final": round(ious[-1], 4),
        "iou_min": round(min(ious), 4),
        "apic_visc_iters_mean": float(np.mean(apic_iters)),
        "warm_visc_iters_mean": float(np.mean(warm_iters)),
        "warm_iter_cut": float(np.mean(apic_iters) - np.mean(warm_iters)),
    }
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "metrics.json"), "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec, indent=1))


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("capture")
    c.add_argument("--steps", type=int, default=300)
    t = sub.add_parser("train")
    t.add_argument("--epochs", type=int, default=12)
    t.add_argument("--lr", type=float, default=1e-4)
    t.add_argument("--width", type=int, default=64)
    t.add_argument("--resume", action="store_true")
    t.add_argument("--steps-cap", type=int, default=None)
    e = sub.add_parser("eval")
    e.add_argument("--steps", type=int, default=120)
    e.add_argument("--width", type=int, default=64)
    args = p.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    if args.cmd == "capture":
        capture(args.steps)
    elif args.cmd == "train":
        train(args.epochs, args.lr, args.width, args.resume,
              args.steps_cap)
    else:
        evaluate(args.steps, args.width)


if __name__ == "__main__":
    main()
