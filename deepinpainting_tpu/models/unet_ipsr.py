"""Refinement U-Net generator (netG) — `unet_ipsr` with the IPSR attention
level and InnerCos feature taps.

Capability parity with models/networks.py:187-366 (UnetGeneratorIPSR,
UnetSkipConnectionBlock_3, IPSR block):

  * non-outermost down: LeakyReLU -> dilated Conv4x4 s2 p3 d2 (keeps
    channels) -> IN -> LeakyReLU -> Conv3x3 s1 p1 (expands) -> IN
    (networks.py:227,220,260)
  * non-outermost up: ReLU -> ConvT3x3 s1 p1 (halves the skip concat) ->
    IN -> ReLU -> ConvT4x4 s2 p1 -> IN (networks.py:238,254,261)
  * outermost: Conv3x3 s1 p1 in, ReLU -> ConvT3x3 s1 p1 out — NO tanh, and
    no downsample, so this level runs at full resolution (networks.py:241-243)
  * innermost: LeakyReLU -> dilated conv down; ReLU -> ConvT4x4 s2 -> IN up
    (networks.py:249-251)
  * at the ngf*4 level (32x32 for 256 inputs) the down path is
    [..., Conv3x3 256->512, IPSR attention, InnerCos tap, IN] and the up
    path starts with the InnerCos2 tap on the 1024-ch skip concat
    (networks.py:347-348)

77,692,291 params at default widths (train.ipynb cell-1 output).

TPU-native redesign: the reference wires the attention layer and both loss
taps into an nn.Sequential and communicates with the trainer through mutated
module attributes and registry lists (networks.py:87-103,307-319).  Here the
forward is a pure function: the reference features and dense masked flags
come in as arguments, and the InnerCos tap features come back in the return
value.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.attention import ipsr_attention_batched
from ..ops.convs import (TorchConv, TorchConvTranspose, bilinear_resize,
                         constrain_unshardable_spatial, leaky_relu,
                         make_norm)


class UnetBlock3(nn.Module):
    """One level of the refinement U-Net (UnetSkipConnectionBlock_3 /
    the IPSR block when with_attention=True)."""
    outer_nc: int
    inner_nc: int
    input_nc: Optional[int] = None
    submodule: Optional[nn.Module] = None
    outermost: bool = False
    innermost: bool = False
    use_dropout: bool = False
    with_attention: bool = False
    triple_weight: float = 1.0
    truncate_backward: bool = True
    attention_impl: str = "lax"
    known_replacement: bool = True
    norm: str = "instance"
    init_gain: float = 0.02
    init_type: str = "normal"

    @nn.compact
    def __call__(self, x, aux: Dict[str, Any], train: bool = False
                 ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """aux carries {'ref_feat': [B,h,w,C], 'flag': [B,h*w]} for the
        attention level; returns (output, taps) with the InnerCos features.

        `train` is positional (not keyword-only) so nn.remat can pin it
        static (static_argnums=(3,)); a traced bool would break Dropout's
        `not train` under remat.
        """
        input_nc = self.input_nc if self.input_nc is not None else self.outer_nc
        Norm = make_norm(self.norm, self.init_gain)
        taps: Dict[str, jnp.ndarray] = {}

        # ---- down ----
        if self.outermost:
            y = TorchConv(self.inner_nc, 3, stride=1, padding=1,
                          name="down_conv3", init_gain=self.init_gain,
                          init_type=self.init_type)(x)
        else:
            y = leaky_relu(x, 0.2)
            y = TorchConv(input_nc, 4, stride=2, padding=3, dilation=2,
                          name="down_dilconv", init_gain=self.init_gain,
                          init_type=self.init_type)(y)
            # under SP, pin bottleneck-small heights to an explicit
            # sharding so GSPMD doesn't warn about involuntary resharding
            y = constrain_unshardable_spatial(y)
            if not self.innermost:
                y = Norm(name="down_norm")(y, train)
                y = leaky_relu(y, 0.2)
                y = TorchConv(self.inner_nc, 3, stride=1, padding=1,
                              name="down_conv3",
                              init_gain=self.init_gain,
                          init_type=self.init_type)(y)
                if self.with_attention:
                    # IPSR shift attention on the 512-ch feature
                    # (networks.py:347: [..., conv3, ipsr, innerCos, IN]).
                    y = ipsr_attention_batched(
                        y, aux["ref_feat"].astype(y.dtype), aux["flag"],
                        self.triple_weight, self.truncate_backward,
                        self.attention_impl, self.known_replacement)
                    taps["inner_cos"] = y  # InnerCos tap, pre-norm
                y = Norm(name="down_norm3")(y, train)

        # ---- submodule ----
        if self.submodule is not None:
            y, sub_taps = self.submodule(y, aux, train)
            taps.update(sub_taps)

        # ---- up ----
        if self.outermost:
            y = nn.relu(y)
            y = TorchConvTranspose(self.outer_nc, 3, stride=1, padding=1,
                                   name="up_conv3",
                                   init_gain=self.init_gain,
                          init_type=self.init_type)(y)
            return y, taps
        if self.innermost:
            y = nn.relu(y)
            y = TorchConvTranspose(self.outer_nc, 4, stride=2, padding=1,
                                   name="up_conv",
                                   init_gain=self.init_gain,
                          init_type=self.init_type)(y)
            y = constrain_unshardable_spatial(y)
            y = Norm(name="up_norm")(y, train)
        else:
            if self.with_attention:
                # InnerCos2 tap: first 512 channels of the skip concat
                # (InnerCos2.forward narrow(1,0,512), models/InnerCos2.py:38).
                taps["inner_cos2"] = y[..., :self.inner_nc]
            y = nn.relu(y)
            y = TorchConvTranspose(self.outer_nc, 3, stride=1, padding=1,
                                   name="up_conv3",
                                   init_gain=self.init_gain,
                          init_type=self.init_type)(y)
            y = Norm(name="up_norm3")(y, train)
            y = nn.relu(y)
            y = TorchConvTranspose(self.outer_nc, 4, stride=2, padding=1,
                                   name="up_conv",
                                   init_gain=self.init_gain,
                          init_type=self.init_type)(y)
            y = constrain_unshardable_spatial(y)
            y = Norm(name="up_norm")(y, train)
        if self.use_dropout:
            y = nn.Dropout(0.5, deterministic=not train)(y)

        if y.shape[1:3] != x.shape[1:3]:
            y = bilinear_resize(y, x.shape[1], x.shape[2])
        return jnp.concatenate([y, x], axis=-1), taps


class UnetGeneratorIPSR(nn.Module):
    """`unet_ipsr` refinement generator (networks.py:187-209).

    Ladder for 256 inputs: 256 (outermost, no downsample) -> 128 -> 64 ->
    32 (attention, 512ch) -> 16 -> 8 -> 4 -> 2 -> 1.
    """
    input_nc: int = 6
    output_nc: int = 3
    num_downs: int = 8
    ngf: int = 64
    use_dropout: bool = False
    triple_weight: float = 1.0
    truncate_backward: bool = True
    attention_impl: str = "lax"
    known_replacement: bool = True
    norm: str = "instance"
    init_gain: float = 0.02
    init_type: str = "normal"
    remat: bool = False
    remat_depth: int = 3

    def setup(self):
        ngf, g = self.ngf, self.init_gain
        # remat: checkpoint the outer `remat_depth` levels (0 = all) — see
        # UnetGenerator.setup for the memory/recompute tradeoff.  This
        # ladder has an extra full-resolution outermost level (no
        # downsample, networks.py:241-243), so its outer levels hold even
        # more of the activation bytes than the rough net's.
        def Block(level_from_outer, *a, **kw):
            kw.setdefault("init_type", self.init_type)
            kw.setdefault("norm", self.norm)
            cls = UnetBlock3
            if self.remat and (self.remat_depth == 0
                               or level_from_outer < self.remat_depth):
                cls = nn.remat(UnetBlock3, static_argnums=(3,))  # train
            return cls(*a, **kw)
        i = self.num_downs  # blocks constructed inner -> outer; outermost=0
        block = Block(i, ngf * 8, ngf * 8, innermost=True, init_gain=g)
        for _ in range(self.num_downs - 5):
            i -= 1
            block = Block(i, ngf * 8, ngf * 8, submodule=block,
                          use_dropout=self.use_dropout, init_gain=g)
        block = Block(4, ngf * 8, ngf * 8, submodule=block,
                      use_dropout=self.use_dropout, init_gain=g)
        block = Block(3, ngf * 4, ngf * 8, submodule=block,
                      with_attention=True,
                      triple_weight=self.triple_weight,
                      truncate_backward=self.truncate_backward,
                      attention_impl=self.attention_impl,
                      known_replacement=self.known_replacement, init_gain=g)
        block = Block(2, ngf * 2, ngf * 4, submodule=block, init_gain=g)
        block = Block(1, ngf, ngf * 2, submodule=block, init_gain=g)
        self.model = Block(0, self.output_nc, ngf, input_nc=self.input_nc,
                           submodule=block, outermost=True, init_gain=g)

    def __call__(self, x, ref_feat, flag, *, train: bool = False):
        """x: [B,H,W,6] (coarse composite ++ masked input); ref_feat:
        [B,H/8,W/8,512] VGG relu4_3 of the reference image; flag:
        [B,(H/8)*(W/8)] dense masked flags.

        Returns (out [B,H,W,3] — linear, no tanh; taps {'inner_cos',
        'inner_cos2'} [B,H/8,W/8,512]).
        """
        return self.model(x, {"ref_feat": ref_feat, "flag": flag}, train)
