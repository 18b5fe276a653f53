"""NN primitives with exact PyTorch conv geometry, NHWC / TPU-native.

The reference's networks (models/networks.py) use four conv geometries whose
output-size arithmetic must be reproduced exactly (SURVEY.md §7.3 item 1):

  * Conv2d k4 s2 p1              — halving downsample (networks.py:404)
  * Conv2d k4 s2 p3 d2 (dilated) — halving downsample, keeps channels (:227)
  * Conv2d k3 s1 p1              — same-size (:220)
  * ConvTranspose2d k4 s2 p1     — doubling upsample (:246,254)
  * ConvTranspose2d k3 s1 p1     — same-size (:238)

Everything is expressed on NHWC activations with HWIO kernels so XLA tiles
directly onto the MXU; ConvTranspose is lowered to `conv_general_dilated`
with lhs (input) dilation rather than an explicit gradient op.

Weight init parity: normal(0, 0.02) for all conv kernels, zero bias
(models/networks.py:49-70, init_type='normal'); InstanceNorm affine scale=1,
offset=0 (torch defaults — the reference's init_func does not touch
InstanceNorm weights).
"""

from __future__ import annotations

import contextlib
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

DIMENSION_NUMBERS = ("NHWC", "HWIO", "NHWC")

# Trace-time int8 switch (ops/quant.py).  `int8_mode` is entered *inside*
# the functions the caller jits, so whenever XLA traces the forward the flag
# is live and conv2d/conv_transpose2d emit the s8xs8->s32 MXU path for every
# eligible kernel — the compiled graph is static, no runtime branching.
_INT8_TRACING = False


@contextlib.contextmanager
def int8_mode(enabled: bool = True):
    """Enable dynamic-int8 convs for ops traced inside this block."""
    global _INT8_TRACING
    prev = _INT8_TRACING
    _INT8_TRACING = bool(enabled)
    try:
        yield
    finally:
        _INT8_TRACING = prev


def normal_init(gain: float = 0.02):
    """normal(0, gain) kernel init — parity with networks.py:53-54."""
    def init(key, shape, dtype=jnp.float32):
        return gain * jax.random.normal(key, shape, dtype)
    return init


def conv2d(x: jnp.ndarray, kernel: jnp.ndarray, bias: Optional[jnp.ndarray],
           stride: int = 1, padding: int = 0, dilation: int = 1) -> jnp.ndarray:
    """PyTorch-geometry Conv2d.  x: [N,H,W,Cin], kernel: [kh,kw,Cin,Cout]."""
    if _INT8_TRACING:
        from . import quant
        if quant.eligible(kernel.shape):
            return quant.conv2d_int8(x, kernel, bias, stride, padding,
                                     dilation)
    # bf16 operands accumulate in f32 on the TPU MXU natively and round once
    # at the output — there, numerically identical to
    # preferred_element_type=f32 followed by the downcast below, but unlike
    # it, differentiable: an explicit f32 preferred breaks jax's conv
    # transpose_rhs (the kernel-gradient conv is built with bf16 lhs x f32
    # cotangent and rejects the mixed dtypes), which made every bf16
    # TRAINING step fail.  NOTE this guarantee is TPU-specific: on other
    # backends (CPU tests, pallas interpret) bf16 convs may accumulate at
    # lower precision.  All parity/quality paths run f32 (cfg.dtype default),
    # so bf16-on-CPU only arises in explicitly-bf16 experiments.
    y = lax.conv_general_dilated(
        x, kernel,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=DIMENSION_NUMBERS,
    ).astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def conv_transpose2d(x: jnp.ndarray, kernel: jnp.ndarray,
                     bias: Optional[jnp.ndarray], stride: int = 1,
                     padding: int = 0) -> jnp.ndarray:
    """PyTorch-geometry ConvTranspose2d (output_padding=0).

    out = (H-1)*stride - 2*padding + k, implemented as a correlation of the
    spatially-flipped kernel over the lhs-dilated input with edge padding
    k-1-padding.  kernel: [kh, kw, Cin, Cout] (already in forward
    orientation; we flip here).
    """
    if _INT8_TRACING:
        from . import quant
        if quant.eligible(kernel.shape):
            return quant.conv_transpose2d_int8(x, kernel, bias, stride,
                                               padding)
    k = kernel.shape[0]
    pad = k - 1 - padding
    # no preferred_element_type: see conv2d — f32 accumulation is MXU-native
    # for bf16 and the explicit flag breaks the conv transpose under grad.
    y = lax.conv_general_dilated(
        x, jnp.flip(kernel, axis=(0, 1)),
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        lhs_dilation=(stride, stride),
        dimension_numbers=DIMENSION_NUMBERS,
    ).astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def instance_norm(x: jnp.ndarray, scale: jnp.ndarray, offset: jnp.ndarray,
                  eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm2d(affine=True), biased variance over H,W per (N, C).

    Parity: torch nn.InstanceNorm2d defaults (eps=1e-5, no running stats).
    x: [N,H,W,C].
    """
    xf = x.astype(jnp.float32)  # stats in f32 for bf16 activations
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
    y = ((xf - mean) * lax.rsqrt(var + eps)).astype(x.dtype)
    return y * scale.astype(y.dtype) + offset.astype(y.dtype)


def bilinear_resize(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """F.upsample(..., mode='bilinear', align_corners=False) equivalent.

    Used only when a skip connection's spatial size mismatches
    (networks.py:276-277, :450-451).  x: [N,H,W,C].
    """
    n, _, _, c = x.shape
    return jax.image.resize(x, (n, height, width, c), method="bilinear")


class TorchConv(nn.Module):
    """Conv2d with PyTorch geometry and normal(0, 0.02) init."""
    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_bias: bool = True
    init_gain: float = 0.02

    @nn.compact
    def __call__(self, x):
        # Computes in the activation dtype (params stay f32, cast per-call;
        # cfg.dtype='bfloat16' casts activations at the forward boundary).
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", normal_init(self.init_gain),
            (self.kernel_size, self.kernel_size, cin, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        return conv2d(x, kernel.astype(x.dtype),
                      bias, self.stride, self.padding, self.dilation)


class TorchConvTranspose(nn.Module):
    """ConvTranspose2d with PyTorch geometry and normal(0, 0.02) init."""
    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    init_gain: float = 0.02

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", normal_init(self.init_gain),
            (self.kernel_size, self.kernel_size, cin, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        return conv_transpose2d(x, kernel.astype(x.dtype),
                                bias, self.stride, self.padding)


class InstanceNorm(nn.Module):
    """InstanceNorm2d(affine=True) as a linen module."""
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        offset = self.param("offset", nn.initializers.zeros, (c,))
        return instance_norm(x, scale, offset, self.eps)


def make_norm(norm: str):
    """Norm-layer factory mirroring get_norm_layer (networks.py:20-29).

    'batch' is intentionally mapped to InstanceNorm at construction time with
    a loud error instead: the reference always runs with 'instance'
    (app.py:27), and BatchNorm's running stats are antithetical to pure
    functional training steps.  'none' returns identity.
    """
    if norm == "instance":
        return InstanceNorm
    if norm == "none":
        return lambda: (lambda x: x)
    raise NotImplementedError(
        f"norm '{norm}' not supported (reference configs use 'instance')")


def leaky_relu(x, negative_slope: float = 0.2):
    return nn.leaky_relu(x, negative_slope)
