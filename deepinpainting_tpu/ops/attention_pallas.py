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


# ---------------------------------------------------------------------------
# v2: kbar-free batch-vectorized scan (inference primal)
# ---------------------------------------------------------------------------

def _scan_v2_kernel(flag_ref, vmax_ref,        # VMEM [K,N,1]
                    pn_ref, known_ref,         # VMEM [K,N,C]
                    out_ref):                  # VMEM out [K,N,C]
    k, n, c = pn_ref.shape

    def body(q, carry):
        prev_out, seen = carry                      # [K,C] f32, [K,1] f32
        # N sits in the sublane dim: Mosaic allows dynamic sublane slices
        # but not dynamic lane (last-dim) slices.
        f = flag_ref[:, pl.ds(q, 1), 0]             # [K,1]
        v = vmax_ref[:, pl.ds(q, 1), 0]
        pn_q = pn_ref[:, pl.ds(q, 1), :].reshape(k, c).astype(jnp.float32)
        known_q = known_ref[:, pl.ds(q, 1), :].reshape(k, c).astype(
            jnp.float32)
        masked = f > 0
        first = jnp.logical_and(masked, seen == 0)
        at = jnp.sum(pn_q * prev_out, axis=1, keepdims=True)
        denom = at + v
        blend = (at / denom) * prev_out + (v / denom) * known_q
        out_m = jnp.where(first, known_q, blend)
        new_out = jnp.where(masked, out_m, prev_out)
        out_ref[:, pl.ds(q, 1), :] = jnp.where(
            masked, out_m, known_q).astype(out_ref.dtype)[:, None, :]
        return new_out, jnp.maximum(seen, f.astype(jnp.float32))

    init = (jnp.zeros((k, c), jnp.float32), jnp.zeros((k, 1), jnp.float32))
    lax.fori_loop(0, n, body, init)


def scan_chunk_size(n: int, c: int, itemsize: int) -> int:
    """Largest per-grid-step batch chunk whose working set fits VMEM:
    Pn + known + out = 3*K*N*C words of the storage dtype."""
    budget = 12 * 1024 * 1024  # leave headroom below the 16MB core limit
    k = budget // max(1, 3 * n * c * itemsize)
    return max(1, min(8, int(k)))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _scan_v2(flag, vmax, pn, known, *, interpret: bool):
    """flag/vmax: [B,N] f32; pn/known: [B,N,C] (f32 or bf16).
    Returns out [B,N,C] in pn.dtype; grid over batch chunks of size K,
    the recurrence vectorized across the chunk inside the kernel."""
    bsz, n, c = pn.shape
    k = scan_chunk_size(n, c, pn.dtype.itemsize)
    pad = (-bsz) % k
    if pad:
        flag = jnp.pad(flag, ((0, pad), (0, 0)))
        vmax = jnp.pad(vmax, ((0, pad), (0, 0)), constant_values=1.0)
        pn = jnp.pad(pn, ((0, pad), (0, 0), (0, 0)))
        known = jnp.pad(known, ((0, pad), (0, 0), (0, 0)))
    nb = pn.shape[0] // k
    # [B,N,1] so the blocks' trailing two dims equal the full array dims
    # (Mosaic requires trailing block dims divisible by (8,128) or full)
    # and q indexes the sublane dim (dynamic lane slices don't lower).
    flag3 = flag[:, :, None]
    vmax3 = vmax[:, :, None]

    out = pl.pallas_call(
        _scan_v2_kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((k, n, 1), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((k, n, 1), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((k, n, c), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((k, n, c), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((k, n, c), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(pn.shape, pn.dtype),
        interpret=interpret,
    )(flag3, vmax3, pn, known)
    return out[:bsz]


def attention_primal_pallas_batched(feat: jnp.ndarray, ref: jnp.ndarray,
                                    flag: jnp.ndarray, *, interpret=None
                                    ) -> jnp.ndarray:
    """kbar-free batched inference forward with the vectorized v2 kernel.

    Matches vmap of attention.py::_attention_core_primal.  Scores/argmax/
    gather stay in XLA.  Storage stays f32 even for bf16 models: Mosaic
    cannot lower the unaligned dynamic sublane slices the scan needs for
    16-bit element types (2-sublane packing), so bf16 storage fails to
    compile on real TPUs.
    """
    bsz, h, w, c = feat.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    P, Pn, ind, vmax, known = _prep(feat, ref)
    out = _scan_v2(flag.astype(jnp.float32), vmax, Pn, known,
                   interpret=bool(interpret))
    return out.astype(feat.dtype).reshape(bsz, h, w, c)
