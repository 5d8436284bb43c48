"""Torch checkpoint -> Flax params for the learned viscosity UNet.

The reference stores weights as ``{'net': state_dict}`` torch files and
reloads them from disk EVERY simulation step (cell 12 :904-906 — the
dominant cost of its 'unet' mode, BASELINE.md).  Here conversion happens
once; params live in the step as ordinary pytree leaves.

Layout maps (channels-first torch -> channels-last flax):
  Conv3d          weight (O, I, kD, kH, kW) -> kernel (kD, kH, kW, I, O)
  ConvTranspose3d weight (I, O, kD, kH, kW) -> kernel (kD, kH, kW, I, O)
    (flax ConvTranspose with transpose_kernel=False convolves with the
    kernel directly; torch's transposed conv scatters — for a k2/s2
    non-overlapping unpool these coincide after flipping... verified
    numerically in tests/test_unet.py against torch CPU.)
"""

from __future__ import annotations

from typing import Dict

import numpy as np

_CBR_NAMES = [
    "enc1_1", "enc1_2", "enc2_1", "enc2_2", "enc3_1", "enc3_2",
    "enc4_1", "enc4_2", "enc5_1", "dec5_1", "dec4_2", "dec4_1",
    "dec3_2", "dec3_1", "dec2_2", "dec2_1", "dec1_2", "dec1_1",
]
_UNPOOL_NAMES = ["unpool4", "unpool3", "unpool2", "unpool1"]


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    # torch Conv3d (O, I, kD, kH, kW) -> flax (kD, kH, kW, I, O)
    return np.transpose(w, (2, 3, 4, 1, 0))


def _convT_kernel(w: np.ndarray) -> np.ndarray:
    # torch ConvTranspose3d (I, O, kD, kH, kW) -> flax (kD, kH, kW, I, O),
    # spatially flipped (torch transposed conv == conv-transpose with a
    # flipped kernel in flax's direct-convolution formulation)
    w = np.transpose(w, (2, 3, 4, 0, 1))
    return w[::-1, ::-1, ::-1]


def torch_state_dict_to_flax(sd: Dict[str, "np.ndarray"]) -> Dict:
    """Map the reference UNet state_dict (possibly under 'net') to the
    UNet3D params pytree."""
    if "net" in sd and isinstance(sd["net"], dict):
        sd = sd["net"]

    def arr(key):
        v = sd[key]
        if hasattr(v, "detach"):  # torch tensor
            v = v.detach().cpu().numpy()
        return np.asarray(v, dtype=np.float32)

    params: Dict = {}
    for name in _CBR_NAMES:
        params[name] = {
            "conv": {
                "kernel": _conv_kernel(arr(f"{name}.0.weight")),
                "bias": arr(f"{name}.0.bias"),
            }
        }
    for name in _UNPOOL_NAMES:
        params[name] = {
            "kernel": _convT_kernel(arr(f"{name}.weight")),
            "bias": arr(f"{name}.bias"),
        }
    params["fc"] = {
        "kernel": _conv_kernel(arr("fc.weight")),
        "bias": arr("fc.bias"),
    }
    return {"params": params}


def load_torch_checkpoint(path: str) -> Dict:
    import torch

    sd = torch.load(path, map_location="cpu")
    return torch_state_dict_to_flax(sd)
