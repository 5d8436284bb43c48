"""Learned-viscosity model: Flax UNet parity vs the torch reference
architecture (random weights, CPU), feature builder round trips."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from python_fluid_simulation_tpu.models.convert import (
    torch_state_dict_to_flax,
)
from python_fluid_simulation_tpu.models.features import (
    _embed,
    build_unet_input,
    extract_delta_v,
    padded_box,
)
from python_fluid_simulation_tpu.models.unet3d import UNet3D

torch = pytest.importorskip("torch")


def _torch_reference_unet(in_channels):
    """The reference architecture rebuilt in torch for conversion parity
    (independent construction following model_3d.py:9-136)."""
    import torch.nn as nn

    def cbr(i, o):
        return nn.Sequential(
            nn.Conv3d(i, o, 3, 1, 1, bias=True), nn.Tanh()
        )

    class Ref(nn.Module):
        def __init__(self):
            super().__init__()
            w = 8  # narrow width for test speed; same topology
            self.w = w
            self.enc1_1, self.enc1_2 = cbr(in_channels, w), cbr(w, w)
            self.pool = nn.AvgPool3d(2)
            self.enc2_1, self.enc2_2 = cbr(w, 2 * w), cbr(2 * w, 2 * w)
            self.enc3_1, self.enc3_2 = cbr(2 * w, 4 * w), cbr(4 * w, 4 * w)
            self.enc4_1, self.enc4_2 = cbr(4 * w, 8 * w), cbr(8 * w, 8 * w)
            self.enc5_1 = cbr(8 * w, 16 * w)
            self.dec5_1 = cbr(16 * w, 8 * w)
            self.unpool4 = nn.ConvTranspose3d(8 * w, 8 * w, 2, 2, 0)
            self.dec4_2, self.dec4_1 = cbr(16 * w, 8 * w), cbr(8 * w, 4 * w)
            self.unpool3 = nn.ConvTranspose3d(4 * w, 4 * w, 2, 2, 0)
            self.dec3_2, self.dec3_1 = cbr(8 * w, 4 * w), cbr(4 * w, 2 * w)
            self.unpool2 = nn.ConvTranspose3d(2 * w, 2 * w, 2, 2, 0)
            self.dec2_2, self.dec2_1 = cbr(4 * w, 2 * w), cbr(2 * w, w)
            self.unpool1 = nn.ConvTranspose3d(w, w, 2, 2, 0)
            self.dec1_2, self.dec1_1 = cbr(2 * w, w), cbr(w, w)
            self.fc = nn.Conv3d(w, 3, 1, 1, 0)

        def forward(self, x):
            e12 = self.enc1_2(self.enc1_1(x))
            e22 = self.enc2_2(self.enc2_1(self.pool(e12)))
            e32 = self.enc3_2(self.enc3_1(self.pool(e22)))
            e42 = self.enc4_2(self.enc4_1(self.pool(e32)))
            e51 = self.enc5_1(self.pool(e42))
            d51 = self.dec5_1(e51)
            d41 = self.dec4_1(
                self.dec4_2(torch.cat([self.unpool4(d51), e42], 1))
            )
            d31 = self.dec3_1(
                self.dec3_2(torch.cat([self.unpool3(d41), e32], 1))
            )
            d21 = self.dec2_1(
                self.dec2_2(torch.cat([self.unpool2(d31), e22], 1))
            )
            d11 = self.dec1_1(
                self.dec1_2(torch.cat([self.unpool1(d21), e12], 1))
            )
            return self.fc(d11)

    return Ref()


def test_flax_unet_matches_torch_reference():
    torch.manual_seed(0)
    in_ch = 11
    ref = _torch_reference_unet(in_ch).eval()
    params = torch_state_dict_to_flax(
        {k: v for k, v in ref.state_dict().items()}
    )
    model = UNet3D(width=8)
    x = np.random.default_rng(0).standard_normal((1, 16, 16, 16, in_ch))
    x = x.astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3))))
    want = np.transpose(want.numpy(), (0, 2, 3, 4, 1))
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_unet_init_shapes():
    model = UNet3D(width=8)
    x = jnp.zeros((1, 16, 16, 16, 11))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, 16, 16, 16, 3)


def test_embed_extract_roundtrip():
    n = (4, 6, 4)
    dual = tuple(2 * k + 1 for k in n)
    data, pad = padded_box(dual)
    assert all(d % 16 == 0 for d in data)
    fshapes = [
        tuple(k + (1 if i == a else 0) for i, k in enumerate(n))
        for a in range(3)
    ]
    rng = np.random.default_rng(1)
    fields = [
        jnp.asarray(rng.standard_normal(s).astype(np.float32))
        for s in fshapes
    ]
    parities = ((0, 1, 1), (1, 0, 1), (1, 1, 0))
    embedded = jnp.stack(
        [_embed(fields[a], data, pad, parities[a]) for a in range(3)],
        axis=-1,
    )[None]
    out = extract_delta_v(embedded, dual, fshapes)
    for a in range(3):
        np.testing.assert_array_equal(np.asarray(out[a]), np.asarray(fields[a]))
    # the strided-slice form must agree with the parity-reshape default
    out_s = extract_delta_v(embedded, dual, fshapes, via_reshape=False)
    for a in range(3):
        np.testing.assert_array_equal(np.asarray(out[a]), np.asarray(out_s[a]))


def test_build_unet_input_channels():
    n = (4, 4, 4)
    dual = tuple(2 * k + 1 for k in n)
    fshapes = [
        tuple(k + (1 if i == a else 0) for i, k in enumerate(n))
        for a in range(3)
    ]
    gv = [jnp.ones(s, jnp.float32) for s in fshapes]
    sphi = jnp.full(dual, -0.5, jnp.float32)  # all solid
    lvol = jnp.full(dual, 2.0, jnp.float32)
    x = build_unet_input(gv, sphi, lvol, 4.0)
    data, pad = padded_box(dual)
    assert x.shape == (1, *data, 11)
    # solid mask channel is 1 inside the window and 1 in the padding
    np.testing.assert_allclose(np.asarray(x[0, ..., 9]), 1.0)
    # lvol channel normalised by cell volume
    win = tuple(slice(p, p + s) for p, s in zip(pad, dual))
    np.testing.assert_allclose(np.asarray(x[0][win + (10,)]), 0.5)
    # gradient of a constant embedded field: neighbours two apart are both
    # the constant -> lo - hi = 0
    np.testing.assert_allclose(np.asarray(x[0, ..., 0]), 0.0)


def test_unet_bf16_compute_path():
    """dtype=bfloat16 runs the conv stack in bf16 (MXU-native) with fp32
    params and fp32 output, staying close to the fp32 reference — the
    production inference configuration on TPU."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from python_fluid_simulation_tpu.models.unet3d import UNet3D

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 16, 11)).astype(np.float32))
    m32 = UNet3D(width=4)
    params = m32.init(jax.random.PRNGKey(0), x)
    y32 = m32.apply(params, x)
    m16 = UNet3D(width=4, dtype=jnp.bfloat16)
    y16 = m16.apply(params, x)  # same fp32 params, bf16 compute
    assert y16.dtype == jnp.float32  # output cast back
    assert np.all(np.isfinite(np.asarray(y16)))
    # bf16 has ~3 decimal digits; tanh keeps activations O(1)
    np.testing.assert_allclose(
        np.asarray(y16), np.asarray(y32), atol=0.05
    )


def test_fast_unpool_matches_convtranspose():
    """FastUnpool (matmul + depth-to-space) is numerically the
    ConvTranspose(k=2,s=2,VALID) it replaces, on the same params."""
    import flax.linen as nn
    import jax

    from python_fluid_simulation_tpu.models.unet3d import FastUnpool

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 4, 6, 5, 7)).astype(np.float32))
    ref = nn.ConvTranspose(
        3, kernel_size=(2, 2, 2), strides=(2, 2, 2), padding="VALID"
    )
    params = ref.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(FastUnpool(3).apply(params, x)),
        np.asarray(ref.apply(params, x)),
        atol=1e-5,
    )
