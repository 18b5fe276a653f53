"""Conv geometry parity vs PyTorch (the four geometries of networks.py)."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn as tnn
import pytest

from deepinpainting_tpu.ops import convs as C


def to_nhwc(x_nchw):
    return jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))


def from_nhwc(y):
    return np.transpose(np.asarray(y), (0, 3, 1, 2))


@pytest.mark.parametrize("k,s,p,d,hw", [
    (4, 2, 1, 1, 32),   # standard halving conv (networks.py:404)
    (4, 2, 3, 2, 32),   # dilated halving conv (networks.py:227)
    (3, 1, 1, 1, 16),   # same-size conv (networks.py:220)
    (4, 2, 1, 1, 17),   # odd size
    (4, 2, 3, 2, 17),
    (4, 1, 1, 1, 14),   # PatchGAN stride-1 tail (networks.py:489,495)
])
def test_conv2d_parity(k, s, p, d, hw):
    rng = np.random.default_rng(0)
    cin, cout = 5, 7
    x = rng.standard_normal((2, cin, hw, hw)).astype(np.float32)
    tconv = tnn.Conv2d(cin, cout, k, s, p, dilation=d)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x)).numpy()
    w = tconv.weight.detach().numpy()          # [out,in,kh,kw]
    b = tconv.bias.detach().numpy()
    kern = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))  # HWIO
    ours = C.conv2d(to_nhwc(x), kern, jnp.asarray(b), s, p, d)
    np.testing.assert_allclose(from_nhwc(ours), ref, atol=2e-5)


@pytest.mark.parametrize("k,s,p,hw", [
    (4, 2, 1, 16),   # doubling deconv (networks.py:246)
    (3, 1, 1, 16),   # same-size deconv (networks.py:238)
    (4, 2, 1, 1),    # innermost 1 -> 2
])
def test_conv_transpose2d_parity(k, s, p, hw):
    rng = np.random.default_rng(1)
    cin, cout = 6, 4
    x = rng.standard_normal((2, cin, hw, hw)).astype(np.float32)
    tconv = tnn.ConvTranspose2d(cin, cout, k, s, p)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x)).numpy()
    w = tconv.weight.detach().numpy()          # [in,out,kh,kw]
    b = tconv.bias.detach().numpy()
    kern = jnp.asarray(np.transpose(w, (2, 3, 0, 1)))  # [kh,kw,in,out]
    ours = C.conv_transpose2d(to_nhwc(x), kern, jnp.asarray(b), s, p)
    assert from_nhwc(ours).shape == ref.shape
    np.testing.assert_allclose(from_nhwc(ours), ref, atol=2e-5)


def test_instance_norm_parity():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 8, 16, 16)).astype(np.float32)
    tin = tnn.InstanceNorm2d(8, affine=True)
    with torch.no_grad():
        tin.weight.copy_(torch.from_numpy(
            rng.standard_normal(8).astype(np.float32)))
        tin.bias.copy_(torch.from_numpy(
            rng.standard_normal(8).astype(np.float32)))
        ref = tin(torch.from_numpy(x)).numpy()
    ours = C.instance_norm(to_nhwc(x),
                           jnp.asarray(tin.weight.detach().numpy()),
                           jnp.asarray(tin.bias.detach().numpy()))
    np.testing.assert_allclose(from_nhwc(ours), ref, atol=1e-4)


def test_bilinear_resize_parity():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 3, 7, 7)).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x), (12, 12), mode="bilinear",
        align_corners=False).numpy()
    ours = C.bilinear_resize(to_nhwc(x), 12, 12)
    np.testing.assert_allclose(from_nhwc(ours), ref, atol=1e-5)


def test_leaky_relu():
    x = jnp.asarray([-2.0, 0.0, 3.0])
    np.testing.assert_allclose(np.asarray(C.leaky_relu(x)), [-0.4, 0.0, 3.0])


def test_module_init_distribution():
    import jax
    m = C.TorchConv(features=16, kernel_size=4, stride=2, padding=1)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8)))
    k = params["params"]["kernel"]
    assert abs(float(k.std()) - 0.02) < 0.005
    assert float(jnp.abs(params["params"]["bias"]).max()) == 0.0
