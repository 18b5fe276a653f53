"""Pallas TPU kernels for the IPSR coherence-propagation attention.

Semantics identical to the lax path in attention.py (reference algorithm:
models/IPSRFunction.py:82-133).  Kernel split, chosen for the hardware:

  * scores matmul + argmax + best-patch gather stay in XLA — one batched
    [B,N,C]x[B,C,N] MXU contraction and a column reduction, which XLA
    already schedules optimally; their small outputs (flag/ind/vmax) are
    the per-step control values the kernels consume.

  * **propagation kernel** (`_scan_stream_kernel`): the N-step
    data-dependent recurrence, vectorized over a K-sample batch chunk
    (the [K,C] carry update is a native VPU tile at K=8) and *streamed*
    over N in Q-row blocks — the grid is (batch-chunks, N-chunks) with the
    carry persisting in VMEM scratch across the sequential grid, so
    Mosaic's block pipeline double-buffers the patch rows from HBM and no
    shape ever has to fit VMEM whole.  This covers every production size,
    including N=4096 (512x512 inputs), which the previous whole-N kernel
    could not.  Besides the kbar-free output rows it emits the per-step
    blend coefficients (a_q, b_q), which the training path reuses.

  * **kbar builder** (`_kbar_kernel`, training only): given (a, b, ind,
    flag), the attention-row recurrence row_q = a_q*row_{q-1} +
    b_q*onehot(ind_q) is *linear per column*, so the [N,N] matrix is built
    in [K,N,W] column tiles — batch-vectorized, embarrassingly parallel
    over tiles, each step a [K,W] VPU-aligned update.  The decode matmul
    (kbar @ P) runs in XLA on the MXU.

Mosaic constraints honored: dynamic slices index the *sublane* dim only
(never the lane dim); storage stays f32 (16-bit types pack 2/sublane and
cannot take unaligned dynamic sublane slices); iota is >=2D; and —
learned the hard way — per-position scalars are PACKED into the lane dim
of the big blocks rather than carried as [K,*,1] specs: VMEM lane-pads
every trailing dim to 128, so a "scalar" [K,N,1] block costs as much as a
full 128-channel block and blows the 16MB scoped-VMEM limit.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NORM_EPS = 1e-8  # parity: NonparametricShift.py:39

# Total VMEM the planners may spend across all (double-buffered) blocks of
# one kernel — comfortably inside the 16MB/core scoped limit.
_VMEM_BUDGET = 12 * 1024 * 1024


def _roundup(x: int, m: int) -> int:
    return -(-x // m) * m


def _largest_divisor_leq(n: int, cap: int) -> int:
    cap = max(1, min(n, cap))
    for d in range(cap, 0, -1):
        if n % d == 0:
            return d
    return 1


def plan_tiles(bsz: int, n: int, c: int) -> Tuple[int, int]:
    """(K batch-chunk, Q row-chunk) for the propagation kernel.

    Blocks per grid step: pn [K,Q,C], aux [K,Q,C+2] (known‖flag‖vmax),
    out_aug [K,Q,C+2] (out‖a‖b) — each lane-padded to a multiple of 128
    and double-buffered by the pipeline.  K prefers the 8 VPU sublanes,
    Q divides N.
    """
    k = _largest_divisor_leq(bsz, 8)  # divides bsz: no padded batch slots
    per_row = (_roundup(c, 128) + 2 * _roundup(c + 2, 128)) * 4
    max_rows = max(1, _VMEM_BUDGET // (2 * per_row))
    q = _largest_divisor_leq(n, max(1, max_rows // k))
    return k, q


def plan_kbar_tiles(bsz: int, n: int) -> Tuple[int, int]:
    """(K batch-chunk, W column-tile) for the kbar builder.

    Blocks per grid step: scalars [K,N,4] (lane-padded to 128) and the
    kbar column tile [K,N,W], both double-buffered.
    """
    w = _largest_divisor_leq(n, 128)
    while w > 1 and n * (128 + w) * 4 * 2 > _VMEM_BUDGET:
        w = _largest_divisor_leq(n, w - 1)
    cap = max(1, _VMEM_BUDGET // (n * (128 + w) * 4 * 2))
    k = _largest_divisor_leq(bsz, min(8, cap))
    return k, w


def fused_fits(n: int, c: int) -> bool:
    """The streamed kernels cover any shape with workable tiles (always
    true for this model family; kept as the dispatch gate)."""
    return plan_tiles(8, n, c)[1] >= 1 and n * (128 + 1) * 8 <= 2 ** 31


# ---------------------------------------------------------------------------
# propagation kernel: out rows + blend coefficients, streamed over N
# ---------------------------------------------------------------------------

def _scan_stream_kernel(pn_ref,                  # VMEM [K,Q,C]
                        aux_ref,                 # VMEM [K,Q,C+2] known|flag|vmax
                        out_ref,                 # VMEM [K,Q,C+2] out|a|b
                        carry_ref, seen_ref):    # VMEM scratch [K,C],[K,1]
    t = pl.program_id(1)
    k, q, c = pn_ref.shape

    @pl.when(t == 0)
    def _():
        carry_ref[:, :] = jnp.zeros((k, c), jnp.float32)
        seen_ref[:, :] = jnp.zeros((k, 1), jnp.float32)

    def body(i, carry):
        prev_out, seen = carry                       # [K,C], [K,1]
        pn_q = pn_ref[:, pl.ds(i, 1), :].reshape(k, c)
        aux_q = aux_ref[:, pl.ds(i, 1), :].reshape(k, c + 2)
        known_q = aux_q[:, :c]
        f = aux_q[:, c:c + 1]                        # [K,1]
        v = aux_q[:, c + 1:c + 2]
        masked = f > 0
        first = jnp.logical_and(masked, seen == 0)
        at = jnp.sum(pn_q * prev_out, axis=1, keepdims=True)
        denom = at + v
        # first masked position: copy the best patch => (a,b) = (0,1)
        # (IPSRFunction.py:98-101); later: the coherence blend (:104-125).
        a = jnp.where(first, 0.0, at / denom)
        b = jnp.where(first, 1.0, v / denom)
        out_m = a * prev_out + b * known_q
        new_out = jnp.where(masked, out_m, prev_out)
        row = jnp.concatenate(
            [jnp.where(masked, out_m, known_q),
             jnp.where(masked, a, 1.0),              # kbar-row coefficients:
             jnp.where(masked, b, 0.0)], axis=1)     # unmasked keeps => (1,0)
        out_ref[:, pl.ds(i, 1), :] = row[:, None, :]
        return new_out, jnp.maximum(seen, f)

    init = (carry_ref[:, :], seen_ref[:, :])
    final_out, final_seen = lax.fori_loop(0, q, body, init)
    carry_ref[:, :] = final_out
    seen_ref[:, :] = final_seen


@functools.partial(jax.jit, static_argnames=("k", "q", "interpret"))
def _scan_stream(flag, vmax, pn, known, *, k: int, q: int, interpret: bool):
    """flag/vmax: [B,N] f32; pn/known: [B,N,C] f32.  (k, q) from plan_tiles.
    Returns (out [B,N,C], a [B,N], b [B,N])."""
    bsz, n, c = pn.shape
    pad = (-bsz) % k
    if pad:
        flag = jnp.pad(flag, ((0, pad), (0, 0)))
        vmax = jnp.pad(vmax, ((0, pad), (0, 0)), constant_values=1.0)
        pn = jnp.pad(pn, ((0, pad), (0, 0), (0, 0)))
        known = jnp.pad(known, ((0, pad), (0, 0), (0, 0)))
    nb, nt = pn.shape[0] // k, n // q
    aux = jnp.concatenate(
        [known, flag[:, :, None], vmax[:, :, None]], axis=2)

    spec_c = pl.BlockSpec((k, q, c), lambda b, t: (b, t, 0),
                          memory_space=pltpu.VMEM)
    spec_a = pl.BlockSpec((k, q, c + 2), lambda b, t: (b, t, 0),
                          memory_space=pltpu.VMEM)
    out_aug = pl.pallas_call(
        _scan_stream_kernel,
        grid=(nb, nt),
        in_specs=[spec_c, spec_a],
        out_specs=spec_a,
        out_shape=jax.ShapeDtypeStruct((pn.shape[0], n, c + 2), jnp.float32),
        scratch_shapes=[pltpu.VMEM((k, c), jnp.float32),
                        pltpu.VMEM((k, 1), jnp.float32)],
        interpret=interpret,
    )(pn, aux)
    return (out_aug[:bsz, :, :c], out_aug[:bsz, :, c],
            out_aug[:bsz, :, c + 1])


# ---------------------------------------------------------------------------
# kbar builder: linear row recurrence, column-tiled (training path)
# ---------------------------------------------------------------------------

def _kbar_kernel(sc_ref,      # VMEM [K,N,4]: flag | ind(as f32) | a | b
                 kbar_ref):   # VMEM [K,N,W]
    k, n, w = kbar_ref.shape
    col0 = pl.program_id(1) * w
    # exact float compare: ind values are integers < 2^24
    col_ids = (col0 + lax.broadcasted_iota(jnp.int32, (k, w), 1)
               ).astype(jnp.float32)

    def body(i, row):
        sc = sc_ref[:, pl.ds(i, 1), :].reshape(k, 4)
        f, ind_q, a, b = (sc[:, 0:1], sc[:, 1:2], sc[:, 2:3], sc[:, 3:4])
        onehot = (col_ids == ind_q).astype(jnp.float32)
        new_row = a * row + b * onehot               # (1,0) on unmasked
        kbar_ref[:, pl.ds(i, 1), :] = jnp.where(
            f > 0, new_row, onehot)[:, None, :]      # known pos: one-hot
        return new_row

    lax.fori_loop(0, n, body, jnp.zeros((k, w), jnp.float32))


@functools.partial(jax.jit, static_argnames=("k", "w", "interpret"))
def _kbar_build(flag, ind, a, b, *, k: int, w: int, interpret: bool):
    """flag/a/b: [B,N] f32; ind: [B,N] int32.  (k, w) from plan_kbar_tiles.
    Returns kbar [B,N,N] f32."""
    bsz, n = flag.shape
    pad = (-bsz) % k
    if pad:
        flag = jnp.pad(flag, ((0, pad), (0, 0)))
        ind = jnp.pad(ind, ((0, pad), (0, 0)))
        a = jnp.pad(a, ((0, pad), (0, 0)))
        b = jnp.pad(b, ((0, pad), (0, 0)))
    nb, nt = flag.shape[0] // k, n // w
    scalars = jnp.stack(
        [flag, ind.astype(jnp.float32), a, b], axis=2)   # [B,N,4]

    kbar = pl.pallas_call(
        _kbar_kernel,
        grid=(nb, nt),
        in_specs=[pl.BlockSpec((k, n, 4), lambda bi, t: (bi, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((k, n, w), lambda bi, t: (bi, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((flag.shape[0], n, n), jnp.float32),
        interpret=interpret,
    )(scalars)
    return kbar[:bsz]


# ---------------------------------------------------------------------------
# public entry points
# ---------------------------------------------------------------------------

def _prep(feat: jnp.ndarray, ref: jnp.ndarray, flag: jnp.ndarray,
          known_replacement: bool = True):
    """Batched XLA pre-stage: normalize, scores, argmax, gather.

    `known_replacement=False` is the corrected identity-on-known mode
    (attention.py::_apply_known_replacement): ind[q] := q at unmasked
    positions, so the gathered best patch AND the kbar one-hot at those
    positions become the identity.  Masked positions are untouched.
    """
    bsz, h, w, c = feat.shape
    n = h * w
    P = feat.reshape(bsz, n, c).astype(jnp.float32)
    R = ref.reshape(bsz, n, c).astype(jnp.float32)
    Pn = P * (1.0 / (jnp.linalg.norm(P, axis=2, keepdims=True) + _NORM_EPS))
    scores = jnp.einsum("bpc,bqc->bpq", Pn, R,
                        preferred_element_type=jnp.float32)
    ind = jnp.argmax(scores, axis=1).astype(jnp.int32)         # [B,N] patches
    vmax = jnp.max(scores, axis=1)                             # [B,N]
    if not known_replacement:
        ind = jnp.where(flag.reshape(bsz, n) > 0.5, ind,
                        jnp.arange(n, dtype=jnp.int32)[None, :])
    known = jnp.take_along_axis(P, ind[..., None], axis=1)     # [B,N,C]
    return P, Pn, ind, vmax, known


def _default_interpret(interpret):
    if interpret is None:
        return jax.default_backend() != "tpu"
    return bool(interpret)


def attention_core_pallas_batched(feat: jnp.ndarray, ref: jnp.ndarray,
                                  flag: jnp.ndarray, *, interpret=None,
                                  known_replacement: bool = True):
    """Batched training-path forward: (out [B,H,W,C], kbar [B,N,N]).

    Matches vmap of attention.py::_attention_core exactly: the propagation
    kernel yields the blend coefficients, the column-tiled kernel builds
    kbar, and the decode (kbar @ P, IPSRFunction.py:130-133) runs as one
    batched MXU einsum.
    """
    bsz, h, w, c = feat.shape
    interpret = _default_interpret(interpret)
    P, Pn, ind, vmax, known = _prep(feat, ref, flag, known_replacement)
    flag_f = flag.astype(jnp.float32)
    n = h * w
    k, q = plan_tiles(bsz, n, c)
    k2, w2 = plan_kbar_tiles(bsz, n)
    _, a, b = _scan_stream(flag_f, vmax, Pn, known, k=k, q=q,
                           interpret=interpret)
    kbar = _kbar_build(flag_f, ind, a, b, k=k2, w=w2, interpret=interpret)
    out = jnp.einsum("bqp,bpc->bqc", kbar, P,
                     preferred_element_type=jnp.float32)
    return out.astype(feat.dtype).reshape(bsz, h, w, c), kbar


def attention_core_pallas(feat: jnp.ndarray, ref: jnp.ndarray,
                          flag: jnp.ndarray, *, interpret=None,
                          known_replacement: bool = True):
    """Single-sample wrapper.  feat/ref: [H,W,C]; flag: [H*W]."""
    out, kbar = attention_core_pallas_batched(
        feat[None], ref[None], flag[None], interpret=interpret,
        known_replacement=known_replacement)
    return out[0], kbar[0]


def attention_primal_pallas_batched(feat: jnp.ndarray, ref: jnp.ndarray,
                                    flag: jnp.ndarray, *, interpret=None,
                                    known_replacement: bool = True
                                    ) -> jnp.ndarray:
    """kbar-free batched inference forward (matches vmap of
    attention.py::_attention_core_primal).  Scores/argmax/gather stay in
    XLA; the streamed kernel covers every grid size incl. N=4096 (512px).
    Storage stays f32 even for bf16 models: Mosaic cannot lower unaligned
    dynamic sublane slices for 16-bit element types."""
    bsz, h, w, c = feat.shape
    interpret = _default_interpret(interpret)
    P, Pn, ind, vmax, known = _prep(feat, ref, flag, known_replacement)
    k, q = plan_tiles(bsz, h * w, c)
    out, _, _ = _scan_stream(flag.astype(jnp.float32), vmax, Pn, known,
                             k=k, q=q, interpret=interpret)
    return out.astype(feat.dtype).reshape(bsz, h, w, c)
