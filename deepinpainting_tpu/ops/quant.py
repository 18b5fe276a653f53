"""Dynamic int8 post-training quantization for the conv stacks.

Beyond-reference capability (the reference has no quantized path): TPU MXUs
run s8 x s8 -> s32 at 2x the bf16 FLOP rate (v5e: 394 TOPS int8 vs 197
TFLOPS bf16), and the inpainting pipeline is conv-MXU-bound at the
throughput operating point (BENCH_NOTES.md single-op roofline), so int8
inference is the one large perf lever left after bf16 + Pallas attention.

Scheme — chosen so no calibration pass, no checkpoint-format change, and no
model-tree change is needed:

  * weights:     per-output-channel symmetric int8, computed from the live
                 f32 params at trace time (XLA hoists the quantization out
                 of serving loops since params are invariant; at the
                 throughput batch the cost is <0.1 ms/call regardless)
  * activations: per-tensor symmetric int8 with a dynamic (per-call) scale;
                 InstanceNorm after nearly every conv keeps ranges tight
  * accumulate:  int32 on the MXU, dequantize to f32, add bias, cast back
                 to the activation dtype
  * eligibility: only convs with min(Cin, Cout) >= 16 quantize. The
                 3-channel stems/heads are MXU-padding-bound (no int8 win)
                 and are the accuracy-critical first/last layers — standard
                 PTQ practice keeps them in high precision.

Inference-only: `make_train_step` rejects cfg.quant != "none" (gradients
through round() are zero; QAT is out of scope).  Enabled via
`Config.quant="int8"` on `make_inference_fn` / `make_eval_step` /
`make_coarse_fn`, which wrap the forward in `convs.int8_mode()` — a
trace-time flag, so the jitted graph is fully static.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from jax import lax

DIMENSION_NUMBERS = ("NHWC", "HWIO", "NHWC")

#: convs narrower than this on either side stay in the activation dtype
MIN_QUANT_CHANNELS = 16


def quantize_activation(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-tensor symmetric int8: returns (q, scale) with x ~= q * scale."""
    xf = x.astype(jnp.float32)
    # initial=0 is identity for an abs-max and keeps zero-size tensors legal
    # (tiny-config U-Nets can carry 0-width activations at the innermost
    # level; the conv itself handles them, the reduction must too)
    scale = jnp.max(jnp.abs(xf), initial=0.0) / 127.0 + 1e-12
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_weight(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-Cout symmetric int8 for an HWIO kernel: w ~= q * scale[None,...]."""
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=(0, 1, 2), initial=0.0) / 127.0 + 1e-12
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def conv2d_int8(x: jnp.ndarray, kernel: jnp.ndarray,
                bias: Optional[jnp.ndarray], stride: int = 1,
                padding: int = 0, dilation: int = 1) -> jnp.ndarray:
    """PyTorch-geometry Conv2d on the int8 MXU path.

    Same geometry contract as convs.conv2d; zero padding is exact under
    symmetric quantization (0 quantizes to 0).
    """
    xq, sx = quantize_activation(x)
    wq, sw = quantize_weight(kernel)
    y = lax.conv_general_dilated(
        xq, wq,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=DIMENSION_NUMBERS,
        preferred_element_type=jnp.int32,
    )
    y = (y.astype(jnp.float32) * (sx * sw)).astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def conv_transpose2d_int8(x: jnp.ndarray, kernel: jnp.ndarray,
                          bias: Optional[jnp.ndarray], stride: int = 1,
                          padding: int = 0) -> jnp.ndarray:
    """PyTorch-geometry ConvTranspose2d on the int8 MXU path.

    lhs-dilation inserts exact zeros, which symmetric int8 represents
    exactly, so the geometry matches convs.conv_transpose2d bit-for-bit in
    the index domain.
    """
    k = kernel.shape[0]
    pad = k - 1 - padding
    xq, sx = quantize_activation(x)
    wq, sw = quantize_weight(jnp.flip(kernel, axis=(0, 1)))
    y = lax.conv_general_dilated(
        xq, wq,
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        lhs_dilation=(stride, stride),
        dimension_numbers=DIMENSION_NUMBERS,
        preferred_element_type=jnp.int32,
    )
    y = (y.astype(jnp.float32) * (sx * sw)).astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def eligible(kernel_shape) -> bool:
    """True when an HWIO kernel's (Cin, Cout) both reach the quant floor."""
    return min(kernel_shape[2], kernel_shape[3]) >= MIN_QUANT_CHANNELS
