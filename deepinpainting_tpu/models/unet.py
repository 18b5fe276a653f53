"""Rough-stage U-Net generator (netP) — pix2pix `unet_256`.

Capability parity with models/networks.py:371-452 (UnetGenerator +
UnetSkipConnectionBlock): 8 downsampling levels, down = LeakyReLU(0.2) ->
Conv4x4 s2 p1 -> InstanceNorm, up = ReLU -> ConvT4x4 s2 p1 -> InstanceNorm,
outermost ends in Tanh, skips are channel concats [up(x), x], size mismatch
fixed with bilinear resize (networks.py:450-451).  Channels
64->128->256->512x4; Dropout(0.5) in the three middle 512-blocks when
use_dropout (networks.py:378-379).  54,419,459 params at default widths
(train.ipynb cell-1 output).

TPU-native: NHWC activations, pure functional linen modules — no Sequential,
no stateful registries.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops.convs import (TorchConv, TorchConvTranspose, bilinear_resize,
                         constrain_unshardable_spatial, leaky_relu,
                         make_norm)


class UnetSkipBlock(nn.Module):
    """One skip level of the rough U-Net (networks.py:395-452)."""
    outer_nc: int
    inner_nc: int
    input_nc: Optional[int] = None
    submodule: Optional[nn.Module] = None
    outermost: bool = False
    innermost: bool = False
    use_dropout: bool = False
    norm: str = "instance"
    init_gain: float = 0.02
    init_type: str = "normal"

    @nn.compact
    def __call__(self, x, train: bool = False):
        # `train` is positional so nn.remat can pin it static
        # (static_argnums=(2,)); a traced bool breaks Dropout's `not train`.
        input_nc = self.input_nc if self.input_nc is not None else self.outer_nc
        Norm = make_norm(self.norm, self.init_gain)

        # ---- down ----
        y = x
        if not self.outermost:
            y = leaky_relu(y, 0.2)
        y = TorchConv(self.inner_nc, 4, stride=2, padding=1, name="down_conv",
                      init_gain=self.init_gain, init_type=self.init_type)(y)
        # under SP, pin bottleneck-small heights to an explicit sharding so
        # GSPMD doesn't warn about involuntary resharding (no-op otherwise)
        y = constrain_unshardable_spatial(y)
        if not (self.outermost or self.innermost):
            y = Norm(name="down_norm")(y, train)

        # ---- submodule ----
        if self.submodule is not None:
            y = self.submodule(y, train)

        # ---- up ----
        y = nn.relu(y)
        y = TorchConvTranspose(self.outer_nc, 4, stride=2, padding=1,
                               name="up_conv", init_gain=self.init_gain,
                               init_type=self.init_type)(y)
        y = constrain_unshardable_spatial(y)
        if self.outermost:
            return jnp.tanh(y)
        y = Norm(name="up_norm")(y, train)
        if self.use_dropout:
            y = nn.Dropout(0.5, deterministic=not train)(y)

        if y.shape[1:3] != x.shape[1:3]:
            y = bilinear_resize(y, x.shape[1], x.shape[2])
        return jnp.concatenate([y, x], axis=-1)


class UnetGenerator(nn.Module):
    """`unet_256` rough generator (networks.py:371-388)."""
    input_nc: int = 3
    output_nc: int = 3
    num_downs: int = 8
    ngf: int = 64
    use_dropout: bool = False
    norm: str = "instance"
    init_gain: float = 0.02
    init_type: str = "normal"
    remat: bool = False
    remat_depth: int = 3

    def setup(self):
        ngf, g = self.ngf, self.init_gain
        # remat: checkpoint the outer `remat_depth` levels (0 = all) —
        # backward recomputes them instead of storing their activations.
        # Activation bytes halve per depth, so the outer levels hold most
        # of the memory; each checkpointed level's backward re-runs its
        # whole SUBTREE (the submodule call is inside the block), i.e.
        # ~1 extra full forward per checkpointed outer level — measured
        # tradeoffs in BENCH_NOTES.md.
        n_levels = self.num_downs  # blocks constructed inner -> outer
        def Block(level_from_outer, *a, **kw):
            kw.setdefault("init_type", self.init_type)
            kw.setdefault("norm", self.norm)
            cls = UnetSkipBlock
            if self.remat and (self.remat_depth == 0
                               or level_from_outer < self.remat_depth):
                cls = nn.remat(UnetSkipBlock, static_argnums=(2,))  # train
            return cls(*a, **kw)
        i = n_levels - 1
        block = Block(i, ngf * 8, ngf * 8, innermost=True, init_gain=g)
        for _ in range(self.num_downs - 5):
            i -= 1
            block = Block(i, ngf * 8, ngf * 8, submodule=block,
                          use_dropout=self.use_dropout, init_gain=g)
        block = Block(3, ngf * 4, ngf * 8, submodule=block, init_gain=g)
        block = Block(2, ngf * 2, ngf * 4, submodule=block, init_gain=g)
        block = Block(1, ngf, ngf * 2, submodule=block, init_gain=g)
        self.model = Block(0, self.output_nc, ngf,
                           input_nc=self.input_nc, submodule=block,
                           outermost=True, init_gain=g)

    def __call__(self, x, *, train: bool = False):
        """x: [B, H, W, input_nc] in [-1, 1] -> [B, H, W, output_nc]."""
        return self.model(x, train)
