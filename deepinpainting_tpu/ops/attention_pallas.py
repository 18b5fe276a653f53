"""Fused Pallas TPU kernel for the IPSR coherence-propagation scan + decode.

Semantics identical to the lax path in attention.py (reference algorithm:
models/IPSRFunction.py:82-133).  Kernel split, chosen for the hardware:

  * scores matmul + argmax + best-patch gather stay in XLA — one batched
    [B,N,C]x[B,C,N] MXU contraction and a column reduction, which XLA
    already schedules optimally; their small outputs (flag/ind/vmax) are
    the per-step scalars the kernel consumes.
  * the N-step data-dependent recurrence + the [N,N]x[N,C] decode matmul
    fuse into ONE Pallas kernel, grid over the batch: the carry (running
    patch [1,C], running attention row [1,N]) and the kbar matrix live
    entirely in VMEM, so the sequential loop never round-trips HBM, and
    the decode reads kbar straight out of VMEM onto the MXU.  Per-step
    control scalars (flag, ind, vmax) arrive via scalar prefetch in SMEM.

VMEM budget per grid step at the production shape (N=1024, C=512):
Pn/known/P 3x2MB + kbar 4MB + out 2MB = 12MB < 16MB/core.  Larger grids
(512x512 inputs -> N=4096) exceed VMEM; callers fall back to the lax path
(attention.py) for those shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NORM_EPS = 1e-8  # parity: NonparametricShift.py:39

# VMEM ceiling for the fused path (f32 words): Pn + known + P + kbar + out.
_VMEM_WORD_BUDGET = (16 * 1024 * 1024) // 4


def fused_fits(n: int, c: int) -> bool:
    words = 3 * n * c + n * n + n * c + 2 * (n + c)
    return words <= _VMEM_WORD_BUDGET


def _scan_decode_kernel(flag_ref, ind_ref, vmax_ref,   # SMEM [B,N] (prefetch)
                        pn_ref, known_ref, p_ref,      # VMEM [1,N,C]
                        kbar_ref, out_ref,             # VMEM [1,N,N],[1,N,C]
                        out_s, row_s):                 # VMEM scratch
    b = pl.program_id(0)
    n, c = pn_ref.shape[1], pn_ref.shape[2]
    out_s[0:1, :] = jnp.zeros((1, c), jnp.float32)
    row_s[0:1, :] = jnp.zeros((1, n), jnp.float32)
    col_ids = lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def body(q, seen):
        masked = flag_ref[b, q] > 0
        ind_q = ind_ref[b, q]
        v = vmax_ref[b, q]
        onehot = (col_ids == ind_q).astype(jnp.float32)
        known_q = known_ref[0, pl.ds(q, 1), :]
        prev_out = out_s[0:1, :]
        prev_row = row_s[0:1, :]

        # at = <Pn[q], out_prev>  (IPSRFunction.py:104-116)
        at = jnp.sum(pn_ref[0, pl.ds(q, 1), :] * prev_out)
        denom = at + v
        a = at / denom
        bb = v / denom
        first = jnp.logical_and(masked, seen == 0)
        out_m = jnp.where(first, known_q, a * prev_out + bb * known_q)
        row_m = jnp.where(first, onehot, a * prev_row + bb * onehot)

        kbar_ref[0, pl.ds(q, 1), :] = jnp.where(masked, row_m, onehot)

        @pl.when(masked)
        def _():
            out_s[0:1, :] = out_m
            row_s[0:1, :] = row_m

        return jnp.where(masked, jnp.int32(1), seen)

    lax.fori_loop(0, n, body, jnp.int32(0))

    # Decode straight from VMEM onto the MXU (IPSRFunction.py:130-133).
    out_ref[0] = jnp.dot(kbar_ref[0], p_ref[0],
                         preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _scan_decode(flag_i, ind, vmax, pn, known, p, *, interpret: bool):
    """flag_i/ind: [B,N] int32; vmax: [B,N] f32; pn/known/p: [B,N,C] f32.
    Returns (kbar [B,N,N], out [B,N,C])."""
    bsz, n, c = pn.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(bsz,),
        in_specs=[pl.BlockSpec((1, n, c), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=(pl.BlockSpec((1, n, n), lambda b, *_: (b, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, n, c), lambda b, *_: (b, 0, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((8, c), jnp.float32),
                        pltpu.VMEM((8, n), jnp.float32)],
    )

    return pl.pallas_call(
        _scan_decode_kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((bsz, n, n), jnp.float32),
                   jax.ShapeDtypeStruct((bsz, n, c), jnp.float32)),
        interpret=interpret,
    )(flag_i, ind, vmax, pn, known, p)


def _prep(feat: jnp.ndarray, ref: jnp.ndarray):
    """Batched XLA pre-stage: normalize, scores, argmax, gather."""
    bsz, h, w, c = feat.shape
    n = h * w
    P = feat.reshape(bsz, n, c).astype(jnp.float32)
    R = ref.reshape(bsz, n, c).astype(jnp.float32)
    Pn = P * (1.0 / (jnp.linalg.norm(P, axis=2, keepdims=True) + _NORM_EPS))
    scores = jnp.einsum("bpc,bqc->bpq", Pn, R,
                        preferred_element_type=jnp.float32)
    ind = jnp.argmax(scores, axis=1).astype(jnp.int32)         # [B,N] over patches
    vmax = jnp.max(scores, axis=1)                             # [B,N]
    known = jnp.take_along_axis(P, ind[..., None], axis=1)     # [B,N,C]
    return P, Pn, ind, vmax, known


def attention_core_pallas_batched(feat: jnp.ndarray, ref: jnp.ndarray,
                                  flag: jnp.ndarray, *, interpret=None):
    """Batched forward with the fused kernel.

    feat/ref: [B,H,W,C]; flag: [B,H*W].  Returns (out [B,H,W,C],
    kbar [B,N,N]).  Matches vmap of attention.py::_attention_core exactly.
    """
    bsz, h, w, c = feat.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    P, Pn, ind, vmax, known = _prep(feat, ref)
    kbar, out = _scan_decode(flag.astype(jnp.int32), ind, vmax,
                             Pn, known, P, interpret=bool(interpret))
    return out.astype(feat.dtype).reshape(bsz, h, w, c), kbar


def attention_core_pallas(feat: jnp.ndarray, ref: jnp.ndarray,
                          flag: jnp.ndarray, *, interpret=None):
    """Single-sample wrapper.  feat/ref: [H,W,C]; flag: [H*W]."""
    out, kbar = attention_core_pallas_batched(
        feat[None], ref[None], flag[None], interpret=interpret)
    return out[0], kbar[0]
