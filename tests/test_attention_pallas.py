"""Fused Pallas attention kernel vs the lax reference formulation.

The Pallas kernel (ops/attention_pallas.py) must match the lax path
(ops/attention.py) bit-for-bit in semantics: same kbar, same output, same
custom-vjp backward.  On CPU the kernel runs in interpreter mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepinpainting_tpu.ops import attention as A
from deepinpainting_tpu.ops import attention_pallas as AP

H = W = 8
C = 16
N = H * W


def sample(seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    feat = jax.random.normal(k1, (H, W, C), jnp.float32)
    ref = jax.random.normal(k2, (H, W, C), jnp.float32)
    flag = np.zeros((N,), np.float32)
    flag[18:40] = 1.0  # a contiguous masked run mid-raster
    return feat, ref, jnp.asarray(flag)


def test_forward_matches_lax():
    feat, ref, flag = sample()
    out_lax, kbar_lax = A._attention_core(feat, ref, flag)
    out_pl, kbar_pl = AP.attention_core_pallas(feat, ref, flag,
                                               interpret=True)
    np.testing.assert_allclose(np.asarray(kbar_pl), np.asarray(kbar_lax),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_lax),
                               rtol=1e-4, atol=1e-4)


def test_no_mask_and_full_mask():
    feat, ref, _ = sample(1)
    # empty mask: kbar is pure one-hots — exact.  full mask: the recurrence
    # chains all N steps and |a| can exceed 1, so ulp-level differences in
    # FMA contraction between the two pipelines amplify; kbar rows then
    # cancel in the decode, loosening the output further.  Same algebra.
    for flag, tol in ((jnp.zeros((N,)), dict(rtol=1e-5, atol=1e-5)),
                      (jnp.ones((N,)), dict(rtol=1e-3, atol=5e-3))):
        out_lax, kbar_lax = A._attention_core(feat, ref, flag)
        out_pl, kbar_pl = AP.attention_core_pallas(feat, ref, flag,
                                                   interpret=True)
        np.testing.assert_allclose(np.asarray(kbar_pl),
                                   np.asarray(kbar_lax), **tol)
        np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_lax),
                                   rtol=2e-3, atol=1e-2)


def test_gradients_match_lax():
    feat, ref, flag = sample(2)

    def loss(impl):
        def f(x):
            y = A.ipsr_attention(x, ref, flag, 1.0, True, impl)
            return jnp.sum(y ** 2)
        return jax.grad(f)(feat)

    g_lax = loss("lax")
    g_pl = loss("pallas")
    # the two pipelines round the recurrence differently; isolated trunc
    # boundary flips move single elements by ~1e-3
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_lax),
                               rtol=1e-4, atol=1e-3)


def test_batched_vmap_pallas():
    feat, ref, flag = sample(3)
    fb = jnp.stack([feat, feat * 0.5])
    rb = jnp.stack([ref, ref])
    mb = jnp.stack([flag, flag])
    out = A.ipsr_attention_batched(fb, rb, mb, impl="pallas")
    ref_out = A.ipsr_attention_batched(fb, rb, mb, impl="lax")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=1e-4, atol=1e-4)


def test_known_replacement_corrected_matches_lax():
    """known_replacement=False (corrected identity-on-known mode) must
    agree between the pallas and lax pipelines — forward, kbar, primal,
    and the custom-vjp backward — and keep unmasked positions identity."""
    feat, ref, flag = sample(4)
    out_lax, kbar_lax = A._attention_core(feat, ref, flag,
                                          known_replacement=False)
    out_pl, kbar_pl = AP.attention_core_pallas(feat, ref, flag,
                                               interpret=True,
                                               known_replacement=False)
    # masked-row blend coefficients differ at ulp level between the two
    # pipelines (batched [K,C] reduction vs per-sample dot) — ~3e-5 max
    np.testing.assert_allclose(np.asarray(kbar_pl), np.asarray(kbar_lax),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_lax),
                               rtol=1e-4, atol=1e-4)
    m = np.asarray(flag) > 0.5
    np.testing.assert_array_equal(
        np.asarray(out_pl).reshape(N, C)[~m],
        np.asarray(feat).reshape(N, C)[~m])
    # primal kernel
    prim = AP.attention_primal_pallas_batched(feat[None], ref[None],
                                              flag[None], interpret=True,
                                              known_replacement=False)
    np.testing.assert_allclose(np.asarray(prim[0]), np.asarray(out_lax),
                               rtol=1e-4, atol=1e-4)

    # batched custom-vjp backward, both impls
    def g(impl):
        def f(x):
            y = A.ipsr_attention_batched(x, ref[None], flag[None], 1.0,
                                         True, impl, False)
            return jnp.sum(y ** 2)
        return jax.grad(f)(feat[None])

    np.testing.assert_allclose(np.asarray(g("pallas")), np.asarray(g("lax")),
                               rtol=1e-4, atol=1e-3)


def test_fused_fits_production_shapes():
    assert AP.fused_fits(1024, 512)        # 256x256 production shape
    assert AP.fused_fits(4096, 512)        # 512x512: streamed kernel covers it


def _scan_block_bytes(k, q, c):
    rup = lambda x: -(-x // 128) * 128
    return 2 * k * q * (rup(c) + 2 * rup(c + 2)) * 4


def test_tile_planners():
    # 256px shape: full 8-sample chunk, Q divides N, blocks under budget
    k, q = AP.plan_tiles(8, 1024, 512)
    assert k == 8 and 1024 % q == 0
    assert _scan_block_bytes(k, q, 512) <= AP._VMEM_BUDGET
    # 512px shape still yields workable tiles
    k, q = AP.plan_tiles(1, 4096, 512)
    assert k == 1 and 4096 % q == 0 and q >= 128
    # kbar tiles: both (double-buffered) blocks under the budget
    k2, w = AP.plan_kbar_tiles(8, 1024)
    assert 1024 % w == 0 and 8 % k2 == 0
    assert k2 * 1024 * (128 + w) * 4 * 2 <= AP._VMEM_BUDGET
    # tiny test grids
    k3, w3 = AP.plan_kbar_tiles(2, 64)
    assert w3 <= 64 and 64 % w3 == 0


def test_streamed_chunking_matches_lax(monkeypatch):
    # Shrink the VMEM budget so this small grid is forced through
    # multiple batch-chunks, N-chunks, and kbar column tiles — the
    # cross-grid-step carry persistence is what's under test.
    monkeypatch.setattr(AP, "_VMEM_BUDGET", 90_000)
    k, q = AP.plan_tiles(3, N, C)
    assert q < N, (k, q)
    k2, w = AP.plan_kbar_tiles(3, N)
    assert w < N, (k2, w)
    feat, ref, flag = sample(9)
    flags = np.zeros((3, N), np.float32)
    flags[0, 18:40] = 1
    flags[1, ::5] = 1
    fb = jnp.stack([feat, feat * 0.3, feat + 0.1])
    rb = jnp.stack([ref, ref * 0.5, ref])
    out, kbar = AP.attention_core_pallas_batched(fb, rb, jnp.asarray(flags),
                                                 interpret=True)
    # batched [K,C] reductions order FP ops differently from the per-sample
    # lax dot, and the nonlinear recurrence amplifies the ulp-level input
    # differences over masked chains — same algebra, looser tolerance (the
    # B=1 comparison in test_forward_matches_lax holds at 1e-5).
    for i in range(3):
        want_out, want_kbar = A._attention_core(fb[i], rb[i],
                                                jnp.asarray(flags[i]))
        np.testing.assert_allclose(np.asarray(kbar[i]),
                                   np.asarray(want_kbar),
                                   rtol=1e-3, atol=5e-3)
        np.testing.assert_allclose(np.asarray(out[i]), np.asarray(want_out),
                                   rtol=1e-3, atol=5e-3)


def test_primal_kbar_free_matches_decode():
    # The inference path computes output without kbar; it must match the
    # kbar-decode formulation (algebraically identical, FP-tolerance).
    for seed in range(3):
        feat, ref, flag = sample(seed)
        out_decode, _ = A._attention_core(feat, ref, flag)
        out_primal = A._attention_core_primal(feat, ref, flag)
        np.testing.assert_allclose(np.asarray(out_primal),
                                   np.asarray(out_decode),
                                   rtol=1e-4, atol=1e-5)
    # edge cases: empty and full masks.  A fully-masked grid chains the
    # recurrence N steps, so FP rounding of recurrence-vs-matmul drifts to
    # ~3e-3 relative — still the same algebraic value.
    feat, ref, _ = sample(7)
    for flag in (jnp.zeros((N,)), jnp.ones((N,))):
        out_decode, _ = A._attention_core(feat, ref, flag)
        out_primal = A._attention_core_primal(feat, ref, flag)
        np.testing.assert_allclose(np.asarray(out_primal),
                                   np.asarray(out_decode),
                                   rtol=1e-2, atol=1e-3)


def _scan_inputs(seed, flag):
    feat, ref, _ = sample(seed)
    c = feat.shape[-1]
    P = feat.reshape(-1, c)
    Pn = P / (jnp.linalg.norm(P, axis=1, keepdims=True) + 1e-8)
    scores = Pn @ ref.reshape(-1, c).T
    return P, Pn, jnp.asarray(flag), jnp.argmax(scores, axis=0), \
        jnp.max(scores, axis=0)


def _flag_patterns():
    contiguous = np.zeros((N,), np.float32)
    contiguous[18:40] = 1
    scattered = np.zeros((N,), np.float32)
    scattered[::7] = 1  # non-contiguous holes
    return {
        "contiguous": contiguous,
        "scattered": scattered,
        "empty": np.zeros((N,), np.float32),   # m = 0
        "full": np.ones((N,), np.float32),     # m = N
    }


def test_compacted_loop_matches_dense_scan():
    # The masked-compacted dynamic-length loop must equal the dense N-step
    # scan over every mask regime (m=0, m=N, contiguous, scattered).
    for seed in range(2):
        for name, flag in _flag_patterns().items():
            P, Pn, f, ind, vmax = _scan_inputs(seed, flag)
            dense = A._scan_out_only(P, Pn, f, ind, vmax)
            fast = A._scan_out_only_compacted(P, Pn, f, ind, vmax)
            # scan vs fori_loop compile to different FMA contractions; both
            # sit ~1e-3 from the kbar-decode truth on long masked chains
            np.testing.assert_allclose(np.asarray(fast), np.asarray(dense),
                                       rtol=1e-2, atol=5e-3, err_msg=name)


def test_compacted_loop_vmap_heterogeneous_m():
    # The variant's stated purpose: batched while_loop with per-sample
    # dynamic trip counts.  Stack all four mask regimes into one vmap.
    patterns = list(_flag_patterns().values())
    ins = [_scan_inputs(3, f) for f in patterns]
    stack = lambda i: jnp.stack([x[i] for x in ins])
    batched = jax.jit(jax.vmap(A._scan_out_only_compacted))(
        stack(0), stack(1), stack(2), stack(3), stack(4))
    for k, (P, Pn, f, ind, vmax) in enumerate(ins):
        dense = A._scan_out_only(P, Pn, f, ind, vmax)
        np.testing.assert_allclose(np.asarray(batched[k]),
                                   np.asarray(dense), rtol=1e-2, atol=5e-3)


def test_primal_vmap_heterogeneous_masks():
    feat, ref, flag = sample(5)
    flags = np.zeros((3, N), np.float32)
    flags[0, :0] = 1          # empty
    flags[1, 10:20] = 1       # small hole
    flags[2, :] = 1           # full
    fb = jnp.stack([feat] * 3)
    rb = jnp.stack([ref] * 3)
    out = jax.jit(jax.vmap(A._attention_core_primal))(fb, rb,
                                                      jnp.asarray(flags))
    ref_out = jnp.stack([A._attention_core(feat, ref, jnp.asarray(f))[0]
                         for f in flags])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=1e-2, atol=1e-3)


def test_v2_primal_kernel_matches_lax(monkeypatch):
    # the batch-vectorized kbar-free kernel vs the lax primal, incl. a
    # batch size that forces chunk padding
    feat, ref, flag = sample(6)
    flags = np.zeros((3, N), np.float32)
    flags[0, 18:40] = 1
    flags[1, ::5] = 1
    flags[2, :0] = 1
    fb = jnp.stack([feat, feat * 0.3, feat + 0.1])
    rb = jnp.stack([ref, ref * 0.5, ref])
    out = AP.attention_primal_pallas_batched(fb, rb, jnp.asarray(flags),
                                             interpret=True)
    want = jax.vmap(A._attention_core_primal)(fb, rb, jnp.asarray(flags))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_v2_kernel_bf16_storage():
    feat, ref, flag = sample(8)
    fb = feat[None].astype(jnp.bfloat16)
    rb = ref[None].astype(jnp.bfloat16)
    out = AP.attention_primal_pallas_batched(fb, rb, flag[None],
                                             interpret=True)
    want = jax.vmap(A._attention_core_primal)(fb, rb, flag[None])
    assert out.dtype == jnp.bfloat16
    a = np.asarray(out, np.float32)
    b = np.asarray(want, np.float32)
    assert np.isfinite(a).all()
    # bf16 rounding differs between the two pipelines before the argmax,
    # so a few positions legitimately pick different best patches; require
    # the overwhelming majority to agree elementwise.
    close = np.isclose(a, b, rtol=0.05, atol=0.05).mean()
    assert close > 0.9, close


def test_n4096_shape_streams(monkeypatch):
    # A tall-N grid (the 512px regime, scaled down in C for CPU) must run
    # through the streamed kernel with multiple N-chunks and match lax.
    h = w = 16  # N = 256
    c = 8
    monkeypatch.setattr(AP, "_VMEM_BUDGET", 200_000)  # force Q < N
    k, q = AP.plan_tiles(1, h * w, c)
    assert q < h * w
    k1, k2 = jax.random.split(jax.random.PRNGKey(11))
    feat = jax.random.normal(k1, (1, h, w, c), jnp.float32)
    ref = jax.random.normal(k2, (1, h, w, c), jnp.float32)
    flag = np.zeros((1, h * w), np.float32)
    flag[0, 30:200:3] = 1
    out = AP.attention_primal_pallas_batched(feat, ref, jnp.asarray(flag),
                                             interpret=True)
    want = jax.vmap(A._attention_core_primal)(feat, ref, jnp.asarray(flag))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
