"""Discriminators: image PatchGAN (netD) and VGG-feature PatchGAN (netF).

Parity targets:
  * NLayerDiscriminator — models/networks.py:459-503.  n_layers=3 hardcoded
    at the define_D call site (networks.py:112).  With InstanceNorm the
    convs keep their bias (use_bias=True, networks.py:462-465).
    2,766,529 params at ndf=64 (train.ipynb cell-1 output).
  * PFDiscriminator — models/networks.py:504-520: three Conv4x4 s2 layers
    256->512->512->512 on VGG relu3_3 features, middle InstanceNorm is
    affine=False (plain nn.InstanceNorm2d default).  10,487,296 params.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.convs import TorchConv, leaky_relu, make_norm


class NLayerDiscriminator(nn.Module):
    """70x70-receptive-field PatchGAN on images.

    `train` matters only for norm='batch' (running-stats updates); the
    reference's discriminator forwards in optimize_parameters all run with
    the module in train mode.
    """
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    use_sigmoid: bool = False
    norm: str = "instance"
    init_gain: float = 0.02
    init_type: str = "normal"

    @nn.compact
    def __call__(self, x, train: bool = False):
        g, it = self.init_gain, self.init_type
        Norm = make_norm(self.norm, g)
        # use_bias = (norm_layer == InstanceNorm2d) for the middle convs;
        # the first and last convs always keep bias (networks.py:461-465,
        # 469-496).
        use_bias = self.norm == "instance"
        y = TorchConv(self.ndf, 4, stride=2, padding=1, name="conv0",
                      init_gain=g, init_type=it)(x)
        y = leaky_relu(y, 0.2)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            y = TorchConv(self.ndf * nf, 4, stride=2, padding=1,
                          name=f"conv{n}", use_bias=use_bias,
                          init_gain=g, init_type=it)(y)
            y = Norm(name=f"norm{n}")(y, train)
            y = leaky_relu(y, 0.2)
        nf = min(2 ** self.n_layers, 8)
        y = TorchConv(self.ndf * nf, 4, stride=1, padding=1,
                      name=f"conv{self.n_layers}", use_bias=use_bias,
                      init_gain=g, init_type=it)(y)
        y = Norm(name=f"norm{self.n_layers}")(y, train)
        y = leaky_relu(y, 0.2)
        y = TorchConv(1, 4, stride=1, padding=1, name="head",
                      init_gain=g, init_type=it)(y)
        if self.use_sigmoid:
            y = nn.sigmoid(y)
        return y


class PFDiscriminator(nn.Module):
    """Feature PatchGAN on VGG relu3_3 features (256 channels in).

    width != 512 is used only by scaled-down test configs.
    """
    width: int = 512
    init_gain: float = 0.02
    init_type: str = "normal"

    @nn.compact
    def __call__(self, x):
        # Three 4x4 s2 p1 convs need >=8x8 input to emit >=1 patch; below
        # that (only sub-64px debug configs — relu3_3 is fine_size/8) the
        # last conv would produce a zero-sized map and mean() over it NaNs
        # the whole GAN loss.  Zero-pad up to the minimum instead.
        g, it = self.init_gain, self.init_type
        pad_h = max(0, 8 - x.shape[1])
        pad_w = max(0, 8 - x.shape[2])
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        y = TorchConv(self.width, 4, stride=2, padding=1, name="conv0",
                      init_gain=g, init_type=it)(x)
        y = leaky_relu(y, 0.2)
        y = TorchConv(self.width, 4, stride=2, padding=1, name="conv1",
                      init_gain=g, init_type=it)(y)
        # affine=False InstanceNorm: normalize only, no learned scale/offset
        mean = jnp.mean(y, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(y - mean), axis=(1, 2), keepdims=True)
        y = (y - mean) / jnp.sqrt(var + 1e-5)
        y = leaky_relu(y, 0.2)
        y = TorchConv(self.width, 4, stride=2, padding=1, name="conv2",
                      init_gain=g, init_type=it)(y)
        return y
