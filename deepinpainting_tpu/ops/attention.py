"""IPSR coherent-semantic shift-attention — the framework's hot kernel.

Reference algorithm (reimplemented from scratch; behavior cites into
/root/reference — models/IPSRFunction.py:13-140 forward, :144-178 backward,
util/NonparametricShift.py:10-73, util/MaxCoord.py:16-28):

Given a decoder feature map `feat` [H, W, C] and the VGG relu4_3 features of
a *reference image* `ref` [H, W, C] (models/IPSRFunction.py:49), with a
per-position masked flag vector:

  1. View every 1x1 spatial position of `feat` as a patch P[p] in R^C and
     L2-normalize a copy Pn (NonparametricShift.py:36-40).
  2. Cross-correlate every input patch against the reference feature at every
     position: scores[p, q] = <Pn[p], ref[q]>  (the reference builds a 1x1
     conv with 1024 kernels — IPSRFunction.py:59; here it is one [N,C]x[C,N]
     matmul on the MXU).
  3. Per position q, argmax over patches: ind[q], vmax[q] (MaxCoord.py:16-28).
  4. Raster-order coherence propagation over positions (the reference's
     Python double loop, IPSRFunction.py:82-129), a *data-dependent nonlinear
     recurrence* expressed here as one `lax.scan`:
       masked q, first:  out = P[ind[q]];            row = onehot(ind[q])
       masked q, later:  at  = <Pn[q], out_prev>
                         a = at/(at+vmax[q]); b = vmax[q]/(at+vmax[q])
                         out = a*out_prev + b*P[ind[q]]
                         row = a*row_prev + b*onehot(ind[q])
       known  q:         column = onehot(ind[q])   (note: even known positions
                         are replaced by their best ref-matching patch, not
                         identity — IPSRFunction.py:127-129)
     The carry (out_prev, row_prev) only advances on masked positions.
  5. Decode: output[q] = sum_p kbar[q, p] * P[p]  (the reference's 1x1
     ConvTranspose, IPSRFunction.py:130-133; here a second MXU matmul).

Backward (custom_vjp, reference-faithful): grad_in = g + triple_w * Kt^T g
where Kt is the attention matrix *truncated toward zero* — the reference
stores the float rows into a LongTensor (IPSRFunction.py:36,134), so
fractional masked-position weights mostly become 0 and only the one-hot
entries survive.  `truncate_backward=False` gives the corrected float
backward.  No gradients flow to `ref` or the mask (IPSRFunction.py:178
returns None for every other input).

TPU-native redesign vs the reference (SURVEY.md §7.1): dense static-shape
formulation gated by `flag` (no dynamic index sets), batch via `vmap`, the
two matmuls run on the MXU in one fused jit graph, and the scan is the only
sequential part.  A fused Pallas kernel with identical semantics lives in
attention_pallas.py.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

_NORM_EPS = 1e-8  # parity: NonparametricShift.py:39, IPSRFunction.py:109


def _apply_known_replacement(ind: jnp.ndarray, flag: jnp.ndarray,
                             known_replacement: bool) -> jnp.ndarray:
    """Reference quirk (IPSRFunction.py:127-129): even KNOWN (unmasked)
    positions are replaced by their best-ref-matching patch, so the whole
    feature map outside the hole is rewritten.  `known_replacement=False`
    is the corrected identity-on-known mode: unmasked positions keep their
    own patch (ind[q] := q), which makes both the decoded output and the
    kbar row at unmasked q the identity.  Masked positions are untouched
    either way — the coherence blend only ever consumes masked-position
    inds.  Works on [N] (single) and [B, N] (batched) operands alike.
    """
    if known_replacement:
        return ind
    iota = jnp.arange(ind.shape[-1], dtype=ind.dtype)
    return jnp.where(flag > 0.5, ind, jnp.broadcast_to(iota, ind.shape))


def _propagate_scan(P: jnp.ndarray, Pn: jnp.ndarray, flag: jnp.ndarray,
                    ind: jnp.ndarray, vmax: jnp.ndarray) -> jnp.ndarray:
    """Sequential coherence propagation; returns kbar [N_pos, N_patch]."""
    n, c = P.shape
    iota = jnp.arange(n)
    known = jnp.take(P, ind, axis=0)              # [N, C] best patch per pos

    def body(carry, x):
        prev_out, prev_row, seen = carry
        f, v, ind_q, p_n, known_q = x
        masked = f > 0.5
        first = jnp.logical_and(masked, jnp.logical_not(seen))
        onehot = (iota == ind_q).astype(P.dtype)

        at = jnp.dot(p_n, prev_out)
        denom = at + v
        a = at / denom
        b = v / denom
        out_later = a * prev_out + b * known_q
        row_later = a * prev_row + b * onehot

        out_m = jnp.where(first, known_q, out_later)
        row_m = jnp.where(first, onehot, row_later)

        new_out = jnp.where(masked, out_m, prev_out)
        new_row = jnp.where(masked, row_m, prev_row)
        new_seen = jnp.logical_or(seen, masked)
        col = jnp.where(masked, row_m, onehot)
        return (new_out, new_row, new_seen), col

    init = (jnp.zeros((c,), P.dtype), jnp.zeros((n,), P.dtype),
            jnp.zeros((), jnp.bool_))
    _, kbar = lax.scan(body, init, (flag, vmax, ind, Pn, known))
    return kbar  # kbar[q, p]


def _blend_step(prev_out, p_n, v, known_q, is_first):
    """One propagation update (IPSRFunction.py:104-125): blend the previous
    running patch with the best-match patch by the coherence weights."""
    at = jnp.dot(p_n, prev_out)
    denom = at + v
    out_later = (at / denom) * prev_out + (v / denom) * known_q
    return jnp.where(is_first, known_q, out_later)


def _scan_out_only_compacted(P: jnp.ndarray, Pn: jnp.ndarray,
                             flag: jnp.ndarray, ind: jnp.ndarray,
                             vmax: jnp.ndarray) -> jnp.ndarray:
    """kbar-free propagation over a masked-compacted permutation.

    Only masked positions advance the recurrence, so the sequential loop
    runs with a *dynamic* trip count m = number of masked positions (the
    latency floor scales with the hole size, not the grid size); unmasked
    outputs are the best-match patches, produced vectorized.  Kept only as
    a correctness-tested alternative formulation: measured SLOWER than the
    dense scan on v5e at b8 everywhere, INCLUDING its hypothesized
    best-case regime — at N=4096 (512px grid) with a 3.7% hole it is
    ~3.7x slower (32.0 vs 8.5 ms/iter, BENCH_NOTES.md round 3): the
    argsort/gather/scatter and the while-lowered dynamic trip count cost
    more than every skipped step.  Do not wire into the production path.
    """
    n, c = P.shape
    known = jnp.take(P, ind, axis=0)
    idx = jnp.arange(n)
    masked = flag > 0.5
    # masked positions first, raster order preserved within each group
    order = jnp.argsort(jnp.where(masked, idx, idx + n))
    m = jnp.sum(masked.astype(jnp.int32))
    Pn_o = jnp.take(Pn, order, axis=0)
    known_o = jnp.take(known, order, axis=0)
    vmax_o = jnp.take(vmax, order, axis=0)

    def body(i, carry):
        prev_out, out_buf = carry
        out_m = _blend_step(prev_out, Pn_o[i], vmax_o[i], known_o[i], i == 0)
        return out_m, out_buf.at[i].set(out_m)

    init = (jnp.zeros((c,), P.dtype), jnp.zeros((n, c), P.dtype))
    _, out_masked = lax.fori_loop(0, m, body, init)
    vals = jnp.where((idx < m)[:, None], out_masked, known_o)
    return jnp.zeros((n, c), P.dtype).at[order].set(vals)  # [N, C]


def _scan_out_only(P: jnp.ndarray, Pn: jnp.ndarray, flag: jnp.ndarray,
                   ind: jnp.ndarray, vmax: jnp.ndarray) -> jnp.ndarray:
    """Propagation WITHOUT materializing the attention matrix (the primal).

    Identity (provable by induction over masked positions): the decoded
    output row_q @ P of the reference's decode matmul (IPSRFunction.py:
    130-133) equals the scan's running patch `out_q` for masked q —
    row_q = a*row_{q-1} + b*onehot(ind_q)  =>  row_q @ P = a*(row_{q-1}@P)
    + b*P[ind_q] = out_q — and equals the best-match patch P[ind_q] for
    unmasked q (one-hot rows).  So inference needs no [N,N] kbar and no
    decode matmul: the scan carries only [C] state.  kbar is materialized
    only under differentiation (_ipsr_fwd), where the backward consumes it.

    Measured on v5e: this vmapped dense scan beats the masked-compacted
    dynamic-length variant above (373 vs 330 img/s e2e at b8) — the
    argsort/gather/scatter and the while-lowered dynamic trip count cost
    more than the skipped unmasked steps.  BENCH_NOTES.md has the data.
    """
    n, c = P.shape
    known = jnp.take(P, ind, axis=0)

    def body(carry, x):
        prev_out, seen = carry
        f, v, p_n, known_q = x
        masked = f > 0.5
        first = jnp.logical_and(masked, jnp.logical_not(seen))
        out_m = _blend_step(prev_out, p_n, v, known_q, first)
        new_out = jnp.where(masked, out_m, prev_out)
        return (new_out, jnp.logical_or(seen, masked)), \
            jnp.where(masked, out_m, known_q)

    init = (jnp.zeros((c,), P.dtype), jnp.zeros((), jnp.bool_))
    _, out = lax.scan(body, init, (flag, vmax, Pn, known))
    return out  # [N, C]


def _attention_core_primal(feat: jnp.ndarray, ref: jnp.ndarray,
                           flag: jnp.ndarray,
                           known_replacement: bool = True) -> jnp.ndarray:
    """Inference-only forward: no kbar, no decode matmul."""
    h, w, c = feat.shape
    n = h * w
    P = feat.reshape(n, c)
    R = ref.reshape(n, c)
    Pn = P * (1.0 / (jnp.linalg.norm(P, axis=1, keepdims=True) + _NORM_EPS))
    scores = jnp.dot(Pn, R.T, preferred_element_type=jnp.float32)
    ind = jnp.argmax(scores, axis=0)
    vmax = jnp.max(scores, axis=0).astype(P.dtype)
    ind = _apply_known_replacement(ind, flag, known_replacement)
    out = _scan_out_only(P, Pn, flag, ind, vmax)
    return out.astype(feat.dtype).reshape(h, w, c)


def _attention_core(feat: jnp.ndarray, ref: jnp.ndarray,
                    flag: jnp.ndarray, known_replacement: bool = True
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-sample forward.  feat/ref: [H, W, C]; flag: [H*W].

    Returns (out [H, W, C], kbar [N_pos, N_patch]).
    """
    h, w, c = feat.shape
    n = h * w
    P = feat.reshape(n, c)
    R = ref.reshape(n, c)
    Pn = P * (1.0 / (jnp.linalg.norm(P, axis=1, keepdims=True) + _NORM_EPS))

    # Cross-correlation of every input patch with the ref feature (MXU).
    scores = jnp.dot(Pn, R.T, preferred_element_type=jnp.float32)  # [patch,pos]
    ind = jnp.argmax(scores, axis=0)
    vmax = jnp.max(scores, axis=0).astype(P.dtype)
    ind = _apply_known_replacement(ind, flag, known_replacement)

    kbar = _propagate_scan(P, Pn, flag, ind, vmax)

    out = jnp.dot(kbar, P, preferred_element_type=jnp.float32)  # [pos, C]
    return out.astype(feat.dtype).reshape(h, w, c), kbar


def _core(feat, ref, flag, impl: str, known_replacement: bool = True):
    """Dispatch to the lax formulation or the fused Pallas kernels
    (attention_pallas.py).  The streamed kernels cover every production
    grid size (incl. N=4096 / 512x512 inputs); the fused_fits gate only
    rejects degenerate shapes."""
    if impl == "pallas":
        from . import attention_pallas as ap
        n = feat.shape[0] * feat.shape[1]
        if ap.fused_fits(n, feat.shape[2]):
            return ap.attention_core_pallas(
                feat, ref, flag, known_replacement=known_replacement)
    return _attention_core(feat, ref, flag, known_replacement)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def ipsr_attention(feat: jnp.ndarray, ref: jnp.ndarray, flag: jnp.ndarray,
                   triple_weight: float = 1.0,
                   truncate_backward: bool = True,
                   impl: str = "lax",
                   known_replacement: bool = True) -> jnp.ndarray:
    """Single-sample IPSR attention.  feat/ref [H,W,C], flag [H*W] (1=masked).

    The primal (inference) path is kbar-free (_scan_out_only); kbar is
    only materialized under differentiation (the fwd rule below).
    `known_replacement` is the Config.faithful_known_replacement quirk
    switch (IPSRFunction.py:127-129 — see _apply_known_replacement).
    """
    return _attention_core_primal(feat, ref, flag, known_replacement)


def _ipsr_fwd(feat, ref, flag, triple_weight, truncate_backward, impl,
              known_replacement):
    out, kbar = _core(feat, ref, flag, impl, known_replacement)
    K = jnp.trunc(kbar) if truncate_backward else kbar
    return out, (K, feat.shape, flag.shape)


def _ipsr_bwd(triple_weight, truncate_backward, impl, known_replacement,
              res, g):
    K, shape, flag_shape = res
    h, w, c = shape
    gf = g.reshape(h * w, c)
    # grad at patch/position p: g[p] + tw * sum_q K[q, p] * g[q]
    # (reference backward, IPSRFunction.py:160-173).
    extra = jnp.dot(K.T, gf, preferred_element_type=jnp.float32).astype(g.dtype)
    grad_feat = (gf + triple_weight * extra).reshape(h, w, c)
    return (grad_feat, jnp.zeros(shape, g.dtype),
            jnp.zeros(flag_shape, g.dtype))


ipsr_attention.defvjp(_ipsr_fwd, _ipsr_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _attention_batched_pallas(feat, ref, flag, triple_weight,
                              truncate_backward, known_replacement):
    # primal = kbar-free batch-vectorized v2 kernel; the kbar-building
    # kernel only runs under differentiation (fwd rule below).
    from . import attention_pallas as ap
    return ap.attention_primal_pallas_batched(
        feat, ref, flag, known_replacement=known_replacement)


def _batched_pallas_fwd(feat, ref, flag, triple_weight, truncate_backward,
                        known_replacement):
    from . import attention_pallas as ap
    out, kbar = ap.attention_core_pallas_batched(
        feat, ref, flag, known_replacement=known_replacement)
    K = jnp.trunc(kbar) if truncate_backward else kbar
    return out, (K, feat.shape, flag.shape)


def _batched_pallas_bwd(triple_weight, truncate_backward, known_replacement,
                        res, g):
    K, shape, flag_shape = res
    b, h, w, c = shape
    gf = g.reshape(b, h * w, c)
    extra = jnp.einsum("bqp,bqc->bpc", K, gf,
                       preferred_element_type=jnp.float32).astype(g.dtype)
    grad_feat = (gf + triple_weight * extra).reshape(b, h, w, c)
    return (grad_feat, jnp.zeros(shape, g.dtype),
            jnp.zeros(flag_shape, g.dtype))


_attention_batched_pallas.defvjp(_batched_pallas_fwd, _batched_pallas_bwd)


def ipsr_attention_batched(feat: jnp.ndarray, ref: jnp.ndarray,
                           flag: jnp.ndarray, triple_weight: float = 1.0,
                           truncate_backward: bool = True,
                           impl: str = "lax",
                           known_replacement: bool = True) -> jnp.ndarray:
    """Batched attention: feat/ref [B,H,W,C], flag [B, H*W].

    The reference hard-requires batch size 1 (models/IPSR.py:35-36, a Python
    loop over the batch in IPSRFunction.py:46); here per-sample masks batch
    natively: the pallas path grids the fused kernel over the batch, the
    lax path vmaps the per-sample formulation.
    """
    if impl == "pallas":
        from . import attention_pallas as ap
        n = feat.shape[1] * feat.shape[2]
        if ap.fused_fits(n, feat.shape[3]):
            return _attention_batched_pallas(feat, ref, flag, triple_weight,
                                             truncate_backward,
                                             known_replacement)
    return jax.vmap(
        lambda f, r, m: ipsr_attention(f, r, m, triple_weight,
                                       truncate_backward, "lax",
                                       known_replacement)
    )(feat, ref, flag)


def attention_matrix(feat: jnp.ndarray, ref: jnp.ndarray,
                     flag: jnp.ndarray,
                     known_replacement: bool = True) -> jnp.ndarray:
    """Expose kbar [N_pos, N_patch] for tests/visualization."""
    _, kbar = _attention_core(feat, ref, flag, known_replacement)
    return kbar
