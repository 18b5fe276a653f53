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
import functools
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


# Trace-time small-Cin conv packing (Config.pack_small_cin).  The MXU
# contracts 128-wide lanes; a conv whose reduction dim is Cin<=8 per tap
# (netP's 3->64 k4s2 first conv, VGG's 3->64 k3s1 conv1_1) pads 3 real
# channels to a full lane tile and runs at ~2% MFU (BENCH_NOTES.md round-2
# op table: enc1 4.3 TF/s vs 131-191 for the wide layers).  Packing the
# kernel taps into the channel dim multiplies the reduction width by
# kh*kw (3 -> 27/48) at zero extra FLOPs — an exact algebraic rewrite
# (identical sums, reassociated), not an approximation.
_PACK_SMALL_CIN_TRACING = False
_PACK_CIN_MAX = 8


@contextlib.contextmanager
def pack_small_cin_mode(enabled: bool = True):
    """Enable small-Cin conv packing for ops traced inside this block."""
    global _PACK_SMALL_CIN_TRACING
    prev = _PACK_SMALL_CIN_TRACING
    _PACK_SMALL_CIN_TRACING = bool(enabled)
    try:
        yield
    finally:
        _PACK_SMALL_CIN_TRACING = prev


# Trace-time output-pixel packing (Config.pack_out).  The round-2 op table
# (BENCH_NOTES.md) leaves the high-res k3s1 VGG convs at ~33% MFU and the
# small-Cout k4s2 deconvs at ~44% while same-kernel deeper shapes hit
# 86-99% — the deficit is spatial-tile/output-lane geometry at large H,W,
# not arithmetic.  Packing 2-4 neighboring OUTPUT pixels into the channel
# dim (a strided conv with a row/phase-stacked kernel + an unpack reshape)
# multiplies output lanes per MXU pass at 4/3x zero-padded MACs — exact
# rewrites (identical sums), verified vs the direct ops in tests/test_convs.
_PACK_OUT_TRACING = False
_PACK_OUT_MIN_HW = 128     # direct convs are already >=86% MFU below this
_PACK_OUT_MIN_CIN = 32     # tiny-Cin convs are pack_small_cin's regime
_PACK_OUT_DECONV_MAX_COUT = 64   # only sub-lane-width deconv outputs lose


@contextlib.contextmanager
def pack_out_mode(enabled: bool = True):
    """Enable output-pixel conv packing for ops traced inside this block."""
    global _PACK_OUT_TRACING
    prev = _PACK_OUT_TRACING
    _PACK_OUT_TRACING = bool(enabled)
    try:
        yield
    finally:
        _PACK_OUT_TRACING = prev


# Trace-time spatial-partitioning hint (parallel/spatial.py).  Under SP the
# [B,H,W,C] activations are H-sharded over the mesh's sp axis; GSPMD cannot
# shard a level whose height is smaller than (or not divisible by) the sp
# axis size, so without an explicit annotation it falls back to
# "involuntary full rematerialization" resharding on the U-Net bottleneck
# ([B,1,1,C] — and [B,2,2,C] on a 4-wide sp axis), warning on every compile
# (MULTICHIP_r03.json tail; VERDICT r3 weak #4).  The SP step builders
# enter this hint around their traced bodies; the U-Net blocks then pin
# every unshardable-height activation to an explicit batch-only sharding,
# which is where GSPMD would land anyway — same collectives, stated intent,
# no warning.
_SP_HINT = None  # (mesh, sp_axis, data_axis or None)


@contextlib.contextmanager
def sp_hint_mode(mesh, sp_axis: str, data_axis: Optional[str] = None):
    """Declare the active SP mesh for ops traced inside this block."""
    global _SP_HINT
    prev = _SP_HINT
    _SP_HINT = (mesh, sp_axis, data_axis)
    try:
        yield
    finally:
        _SP_HINT = prev


def constrain_batch_only(x):
    """Pin a [B,...] tensor to batch-only sharding (no spatial sharding)
    under `sp_hint_mode`; no-op otherwise.  Used to keep the whole
    discriminator data-parallel when norm='batch': its stride chain hits
    H values (e.g. 3) that never divide the sp axis, and GSPMD's
    last-resort replicate-then-repartition of the unevenly-sharded tail
    (xla b/433785288) leaks pad rows into the BatchNorm (N,H,W) reduction
    (measured 1.55x on the tracked mean).  The discriminator is a tiny
    conv stack, so forgoing its H-sharding costs nothing measurable."""
    if _SP_HINT is None:
        return x
    mesh, sp_axis, data_axis = _SP_HINT
    from jax.sharding import NamedSharding, PartitionSpec
    spec = PartitionSpec(data_axis) if data_axis else PartitionSpec()
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def constrain_unshardable_spatial(x):
    """Pin a [B,H,W,C] activation too small to H-shard to an explicit
    (batch-sharded, spatially-replicated) sharding.  No-op unless traced
    under `sp_hint_mode` and H actually fails to divide over the sp axis."""
    if _SP_HINT is None or x.ndim != 4:
        return x
    mesh, sp_axis, data_axis = _SP_HINT
    n_sp = mesh.shape[sp_axis]
    if x.shape[1] >= n_sp and x.shape[1] % n_sp == 0:
        return x
    from jax.sharding import NamedSharding, PartitionSpec
    spec = PartitionSpec(data_axis) if data_axis else PartitionSpec()
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


@contextlib.contextmanager
def conv_modes(cfg):
    """Enter every trace-time conv mode a Config selects (int8 PTQ,
    small-Cin packing, output packing).  The single wrapper the engine's
    step/inference builders use around their traced bodies."""
    with int8_mode(getattr(cfg, "quant", "none") == "int8"), \
            pack_small_cin_mode(getattr(cfg, "pack_small_cin", False)), \
            pack_out_mode(getattr(cfg, "pack_out", False)):
        yield


def _conv2d_space_to_depth(x, kernel, stride, padding):
    """k4 s2 conv as space-to-depth(2) + k2 s1 conv — exact rewrite.

    out[h] reads padded rows 2h..2h+3 = 2x2-pixel blocks h..h+1, so after
    packing each 2x2 block into channels the window is 2x2 at stride 1.
    Reduction width per tap goes Cin -> 4*Cin.  (The MLPerf-ResNet TPU
    first-conv trick, applied to netP's enc1, networks.py:404 geometry.)
    """
    n, h, w, c = x.shape
    cout = kernel.shape[3]
    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    h2, w2 = xp.shape[1] // 2, xp.shape[2] // 2
    x2 = xp.reshape(n, h2, 2, w2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    x2 = x2.reshape(n, h2, w2, 4 * c)
    # kernel [kh,kw,C,Cout] -> [block_i, in_block_i, block_j, in_block_j,
    # C, Cout] -> [2, 2, (di,dj,C), Cout] matching x2's channel packing
    k2 = kernel.reshape(2, 2, 2, 2, c, cout).transpose(0, 2, 1, 3, 4, 5)
    k2 = k2.reshape(2, 2, 4 * c, cout)
    return lax.conv_general_dilated(
        x2, k2, window_strides=(1, 1), padding="VALID",
        dimension_numbers=DIMENSION_NUMBERS).astype(x.dtype)


def _conv2d_tap_stack(x, kernel, padding):
    """k x k s1 conv as kh*kw shifted tap planes + a 1x1 conv (matmul) —
    exact rewrite.  Reduction width goes Cin -> kh*kw*Cin (VGG conv1_1,
    models/vgg16.py:14 geometry: 3 -> 27).  The stacked planes cost
    kh*kw x the input's HBM bytes, negligible at Cin<=8 next to the MXU
    utilization win."""
    kh, kw, c, cout = kernel.shape
    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    h = xp.shape[1] - kh + 1
    w = xp.shape[2] - kw + 1
    taps = [xp[:, dh:dh + h, dw:dw + w, :]
            for dh in range(kh) for dw in range(kw)]
    xs = jnp.concatenate(taps, axis=-1)          # channel order (dh, dw, c)
    k1 = kernel.reshape(1, 1, kh * kw * c, cout)  # same (dh, dw, c) order
    return lax.conv_general_dilated(
        xs, k1, window_strides=(1, 1), padding="VALID",
        dimension_numbers=DIMENSION_NUMBERS).astype(x.dtype)


def _packed_small_cin(x, kernel, stride, padding, dilation):
    """Route an eligible tiny-Cin conv to its packed rewrite, else None."""
    kh, kw, cin, _ = kernel.shape
    if cin > _PACK_CIN_MAX or dilation != 1 or kh != kw or kh == 1:
        return None
    if stride == 1:
        return _conv2d_tap_stack(x, kernel, padding)
    if (stride == 2 and kh == 4
            and (x.shape[1] + 2 * padding) % 2 == 0
            and (x.shape[2] + 2 * padding) % 2 == 0):
        return _conv2d_space_to_depth(x, kernel, stride, padding)
    return None


def _conv2d_hpack2(x, kernel):
    """k3 s1 p1 conv as a [4,3] stride-(2,1) conv packing output rows
    2i, 2i+1 into 2*Cout channels — exact rewrite (4/3x zero-padded MACs).

    Output row r of the strided conv reads padded rows 2r..2r+3; kernel
    taps 0..2 of that window reproduce direct-output row 2r, taps 1..3
    reproduce row 2r+1.  The unpack reshape/transpose restores NHWC."""
    kh, kw, c, co = kernel.shape
    z = jnp.zeros((1, kw, c, co), kernel.dtype)
    k2 = jnp.concatenate([jnp.concatenate([kernel, z], axis=0),
                          jnp.concatenate([z, kernel], axis=0)], axis=3)
    n, h, w, _ = x.shape
    y = lax.conv_general_dilated(
        x, k2, window_strides=(2, 1), padding=((1, 2), (1, 1)),
        dimension_numbers=DIMENSION_NUMBERS)
    y = y.reshape(n, h // 2, w, 2, co).transpose(0, 1, 3, 2, 4)
    return y.reshape(n, h, w, co).astype(x.dtype)


def _packed_out_conv(x, kernel, stride, padding, dilation):
    """Route an eligible high-res k3s1 conv to the hpack2 rewrite."""
    kh, kw, cin, _ = kernel.shape
    if (stride != 1 or dilation != 1 or kh != 3 or kw != 3 or padding != 1
            or cin < _PACK_OUT_MIN_CIN or x.shape[1] < _PACK_OUT_MIN_HW
            or x.shape[1] % 2 != 0):
        return None
    return _conv2d_hpack2(x, kernel)


def _deconv_dpack4(x, kernel):
    """ConvTranspose2d k4 s2 p1 as a k2 s1 VALID conv over pad(x,1) with
    the 2x2 output phase packed into 4*Cout channels — exact sub-pixel
    decomposition (zero extra real MACs; kernel taps are regrouped).

    Per axis (torch deconv semantics, p=1 k=4 s=2):
      out[2m+1] = x[m]*K[2] + x[m+1]*K[0]
      out[2m+2] = x[m]*K[3] + x[m+1]*K[1]
    Both phases read window x[m..m+1]; one k2 VALID conv over pad(x,1)
    emits positions m' = -1..H-1 and the final slice drops the two
    out-of-range border rows/cols."""
    _, _, c, co = kernel.shape
    t = {1: (2, 0), 2: (3, 1)}  # phase -> (tap at m', tap at m'+1)
    blocks = []
    for rh in (1, 2):
        for rw in (1, 2):
            rows = [jnp.stack([kernel[t[rh][u], t[rw][v]] for v in (0, 1)],
                              axis=0) for u in (0, 1)]
            blocks.append(jnp.stack(rows, axis=0))  # [2,2,C,Co]
    k2 = jnp.concatenate(blocks, axis=3)            # [2,2,C,4Co]
    n, h, w, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = lax.conv_general_dilated(
        xp, k2, window_strides=(1, 1), padding="VALID",
        dimension_numbers=DIMENSION_NUMBERS)
    y = y.reshape(n, h + 1, w + 1, 2, 2, co).transpose(0, 1, 3, 2, 4, 5)
    y = y.reshape(n, 2 * h + 2, 2 * w + 2, co)
    return y[:, 1:2 * h + 1, 1:2 * w + 1, :].astype(x.dtype)


def _packed_out_deconv(x, kernel, stride, padding):
    """Route an eligible deconv to its packed rewrite, else None.

    k4 s2 p1 with sub-lane Cout -> dpack4.  k3 s1 p1 (netG's halving /
    outermost ConvTranspose, networks.py:238-242,261) is algebraically a
    plain k3s1p1 conv of the spatially-flipped kernel -> hpack2."""
    kh, kw, cin, cout = kernel.shape
    if (stride == 2 and padding == 1 and kh == 4 and kw == 4
            and cout <= _PACK_OUT_DECONV_MAX_COUT
            and cin >= _PACK_OUT_MIN_CIN
            and 2 * x.shape[1] >= _PACK_OUT_MIN_HW):
        return _deconv_dpack4(x, kernel)
    if (stride == 1 and padding == 1 and kh == 3 and kw == 3
            and cin >= _PACK_OUT_MIN_CIN and x.shape[1] >= _PACK_OUT_MIN_HW
            and x.shape[1] % 2 == 0):
        return _conv2d_hpack2(x, jnp.flip(kernel, axis=(0, 1)))
    return None


def normal_init(gain: float = 0.02):
    """normal(0, gain) kernel init — parity with networks.py:53-54."""
    def init(key, shape, dtype=jnp.float32):
        return gain * jax.random.normal(key, shape, dtype)
    return init


def make_init(init_type: str = "normal", gain: float = 0.02,
              transposed: bool = False):
    """Kernel initializer matching init_weights (networks.py:49-70).

    torch fan semantics (`_calculate_fan_in_and_fan_out`): fan_in =
    weight.size(1) * kh * kw.  For Conv2d (weight [Cout,Cin,kh,kw]) that is
    Cin*kh*kw; for ConvTranspose2d (weight [Cin,Cout,kh,kw]) it is
    Cout*kh*kw — hence `transposed`.  Our kernels are HWIO [kh,kw,Cin,Cout]
    for both, so the fans are computed here, not by a generic helper.

      * normal:     N(0, gain)                       (networks.py:53-54)
      * xavier:     N(0, gain*sqrt(2/(fan_in+fan_out)))      (:55-56)
      * kaiming:    N(0, sqrt(2/fan_in))  — a=0, mode='fan_in',
                    torch default leaky_relu gain sqrt(2)     (:57-58)
      * orthogonal: rows of the torch-flattened [size(0), rest] matrix
                    orthonormal, scaled by gain               (:59-60)
    """
    def fans(shape):
        kh, kw, cin, cout = shape
        rf = kh * kw
        return (cout * rf, cin * rf) if transposed else (cin * rf, cout * rf)

    if init_type == "normal":
        def init(key, shape, dtype=jnp.float32):
            return gain * jax.random.normal(key, shape, dtype)
    elif init_type == "xavier":
        def init(key, shape, dtype=jnp.float32):
            fan_in, fan_out = fans(shape)
            std = gain * (2.0 / (fan_in + fan_out)) ** 0.5
            return std * jax.random.normal(key, shape, dtype)
    elif init_type == "kaiming":
        def init(key, shape, dtype=jnp.float32):
            fan_in, _ = fans(shape)
            std = (2.0 / fan_in) ** 0.5
            return std * jax.random.normal(key, shape, dtype)
    elif init_type == "orthogonal":
        def init(key, shape, dtype=jnp.float32):
            kh, kw, cin, cout = shape
            rows = cin if transposed else cout  # torch weight.size(0)
            cols = (kh * kw * cin * cout) // rows
            big, small = max(rows, cols), min(rows, cols)
            a = jax.random.normal(key, (big, small), jnp.float32)
            q, r = jnp.linalg.qr(a)
            # sign fix makes the distribution Haar-uniform (torch does the
            # same in nn.init.orthogonal_)
            q = q * jnp.sign(jnp.diagonal(r))
            m = q.T if rows < cols else q  # [rows, cols]
            if transposed:  # torch layout [Cin,Cout,kh,kw] -> HWIO
                k = m.reshape(cin, cout, kh, kw).transpose(2, 3, 0, 1)
            else:           # torch layout [Cout,Cin,kh,kw] -> HWIO
                k = m.reshape(cout, cin, kh, kw).transpose(2, 3, 1, 0)
            return (gain * k).astype(dtype)
    else:
        # init_weights raises for unknown init methods (networks.py:66-67)
        raise NotImplementedError(
            f"initialization method [{init_type}] is not implemented")
    return init


def conv2d(x: jnp.ndarray, kernel: jnp.ndarray, bias: Optional[jnp.ndarray],
           stride: int = 1, padding: int = 0, dilation: int = 1) -> jnp.ndarray:
    """PyTorch-geometry Conv2d.  x: [N,H,W,Cin], kernel: [kh,kw,Cin,Cout]."""
    if _INT8_TRACING:
        from . import quant
        if quant.eligible(kernel.shape):
            return quant.conv2d_int8(x, kernel, bias, stride, padding,
                                     dilation)
    if _PACK_SMALL_CIN_TRACING:
        y = _packed_small_cin(x, kernel, stride, padding, dilation)
        if y is not None:
            return y if bias is None else y + bias.astype(y.dtype)
    if _PACK_OUT_TRACING:
        y = _packed_out_conv(x, kernel, stride, padding, dilation)
        if y is not None:
            return y if bias is None else y + bias.astype(y.dtype)
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
    if _PACK_OUT_TRACING:
        y = _packed_out_deconv(x, kernel, stride, padding)
        if y is not None:
            return y if bias is None else y + bias.astype(y.dtype)
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
    init_type: str = "normal"

    @nn.compact
    def __call__(self, x):
        # Computes in the activation dtype (params stay f32, cast per-call;
        # cfg.dtype='bfloat16' casts activations at the forward boundary).
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", make_init(self.init_type, self.init_gain),
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
    init_type: str = "normal"

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", make_init(self.init_type, self.init_gain,
                                transposed=True),
            (self.kernel_size, self.kernel_size, cin, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        return conv_transpose2d(x, kernel.astype(x.dtype),
                                bias, self.stride, self.padding)


class InstanceNorm(nn.Module):
    """InstanceNorm2d(affine=True) as a linen module.

    `train` is accepted (and ignored) so every make_norm product shares one
    call signature; torch InstanceNorm2d defaults track no running stats.
    """
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        offset = self.param("offset", nn.initializers.zeros, (c,))
        return instance_norm(x, scale, offset, self.eps)


class TorchBatchNorm(nn.Module):
    """BatchNorm2d(affine=True) with exact torch semantics (norm='batch',
    get_norm_layer at networks.py:21-22).

    Parity with torch.nn.BatchNorm2d defaults (eps=1e-5, momentum=0.1,
    track_running_stats=True):
      * train: normalize with the BIASED batch variance over (N, H, W);
        update running stats with torch's momentum convention
        (new = (1 - momentum) * old + momentum * batch) where the variance
        contribution is the UNBIASED estimate (n / (n - 1) correction) —
        torch normalizes with biased but tracks unbiased.
      * eval: normalize with the tracked running mean / var.
    Affine init parity: init_weights' BatchNorm2d branch draws the scale
    from N(1.0, gain) and zeroes the offset for EVERY init_type
    (networks.py:65-67), unlike InstanceNorm which torch leaves at the
    ones/zeros defaults.

    Deliberate deviation: eval/inference here uses the tracked running
    stats (train=False).  The reference never calls .eval() anywhere, so
    its test() would normalize by TEST batch statistics had anyone run it
    with norm='batch' — but no shipped reference config does (app.py:27),
    and eval-mode-at-test is the semantics a torch user switching over
    expects from a framework that does call eval().

    Running stats live in the flax 'batch_stats' collection; train-mode
    callers apply with mutable=["batch_stats"] and thread the returned
    collection (engine/inpaint.py).  Stats and normalization are computed
    in f32 regardless of the activation dtype, like instance_norm.  Under
    spatial partitioning the (N, H, W) mean is a global reduction — GSPMD
    inserts the cross-device psum, so sharded batch statistics are exact
    (stronger than torch DataParallel's per-replica stats).
    """
    eps: float = 1e-5
    momentum: float = 0.1
    init_gain: float = 0.02

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        gain = self.init_gain

        def scale_init(key, shape):
            return 1.0 + gain * jax.random.normal(key, shape, jnp.float32)

        scale = self.param("scale", scale_init, (c,))
        offset = self.param("offset", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        # Under spatial partitioning, pin H-unshardable inputs to a clean
        # batch-only sharding BEFORE the global (N,H,W) reduction: GSPMD's
        # involuntary handling of an unevenly-H-sharded operand miscounts
        # the mean (measured 2.0x on a [B,1,1,C] bottleneck and 1.55x on
        # the discriminator's [B,3,3,C] tail over a 2x4 data x sp mesh —
        # losses are immune since BN output is shift/scale-invariant in
        # its own stats, but the tracked running stats are not).  No-op
        # outside sp_hint_mode.
        x = constrain_unshardable_spatial(x)
        xf = x.astype(jnp.float32)
        if train:
            mean = jnp.mean(xf, axis=(0, 1, 2))
            var = jnp.mean(jnp.square(xf - mean), axis=(0, 1, 2))
            if not self.is_initializing():
                n = x.shape[0] * x.shape[1] * x.shape[2]
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = ((1.0 - m) * ra_mean.value
                                 + m * lax.stop_gradient(mean))
                ra_var.value = ((1.0 - m) * ra_var.value
                                + m * lax.stop_gradient(unbiased))
        else:
            mean, var = ra_mean.value, ra_var.value
        y = ((xf - mean) * lax.rsqrt(var + self.eps)).astype(x.dtype)
        return y * scale.astype(y.dtype) + offset.astype(y.dtype)


class IdentityNorm(nn.Module):
    """norm='none' placeholder sharing the norm call signature."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        return x


def make_norm(norm: str, init_gain: float = 0.02):
    """Norm-layer factory mirroring get_norm_layer (networks.py:20-29).

    Returns a linen module class/factory with the uniform signature
    __call__(x, train).  'batch' is TorchBatchNorm (running stats in the
    'batch_stats' collection — the engine threads them, see
    engine/inpaint.py); init_gain feeds its N(1, gain) scale init
    (networks.py:65-67).  'none' is identity (the reference returns
    norm_layer=None, which its own U-Net constructors then crash on —
    networks.py:223 calls None(...); here it is a usable no-op).
    """
    if norm == "instance":
        return InstanceNorm
    if norm == "batch":
        return functools.partial(TorchBatchNorm, init_gain=init_gain)
    if norm == "none":
        return IdentityNorm
    raise NotImplementedError(
        f"normalization layer [{norm}] is not found")


def leaky_relu(x, negative_slope: float = 0.2):
    return nn.leaky_relu(x, negative_slope)
