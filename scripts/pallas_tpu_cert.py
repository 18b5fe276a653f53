"""Certify COMPILED Pallas attention kernels against the lax path on TPU.

VERDICT r4 missing #3: every Pallas kernel test runs interpret-mode on
CPU; on the TPU the kernels were exercised only through bench timings and
training convergence — indirect evidence that would not localize a Mosaic
lowering discrepancy.  This script runs ON THE TPU (detached, per
CLAUDE.md) and directly compares compiled pallas vs lax.

Why not one big elementwise assert: the coherence recurrence
out_i = a_i*out_{i-1} + b_i*best_i with a_i = f(<Pn_i, out_{i-1}>) is
CHAOTIC over long masked chains — |a| can exceed 1, so ulp-level
FMA-contraction differences between any two compilations amplify
exponentially with chain length (measured: ~1e4 output magnitudes at
N=1024 with a 380-step chain; the production model tolerates this
because InstanceNorm immediately follows the attention output,
models/unet_ipsr.py:104).  Elementwise parity at production chain
lengths is therefore impossible for ANY two implementations — including
lax vs itself under an ulp-perturbed input.  The certification is
instead three-legged, all legs computed on device (only scalars cross
the tunnel):

  1. SHORT-CHAIN DIRECT: 9 masked positions split into 3 mini-holes
     spread across the streamed kernel's N-chunks (q=64 at N=1024, so
     the VMEM carry crosses ~13 chunk boundaries mid-chain).  Before
     amplification sets in the two impls must agree elementwise:
     max|Δout| <= 2e-3, max|Δkbar| <= 2e-3, max|Δgrad| <= 2e-3.
     (Chain length is deliberately 9: the faithful recurrence amplifies
     ~1.3x/step — a 24-step chain already reaches |out|~6e2 and
     intrinsic ulp-chaos ~2.4, measured, so 24 is past the elementwise
     horizon while 9 stays ~10x magnitudes / ~1e-6 noise.)
  2. CHAOS ENVELOPE at production holes (25% @ N=1024, 3.7% @ N=4096):
     pallas-vs-lax divergence must sit INSIDE the intrinsic chaos
     envelope, measured as lax(feat) vs lax(feat*(1+1e-6)) in the same
     graph: max|pl - lax| <= 8 * max|lax - lax_perturbed| and the same
     for the mean.  A Mosaic bug (misaligned slice, wrong tile, garbage
     lane) would blow past the envelope; rounding noise cannot.
  3. STRUCTURAL INVARIANTS at full production shape (chaos-free): every
     UNMASKED position's kbar row is exactly one-hot(ind) at atol 1e-5,
     its output row is pallas==lax elementwise at 2e-3 (unmasked rows
     never touch the recurrence, so this is a DIRECT cross-impl check at
     full shape), and both impls' unmasked outputs match the gathered
     best patch (IPSRFunction.py:127-129) at selection scale
     (0.05*max(1,|P|max) — the decode matmul runs at the TPU's default
     bf16-pass matmul precision, so exact-gather agreement is ~2^-8*|P|,
     measured 7.8e-3; a WRONG patch errs at O(2*|P|max)).  97%/75% of
     all rows at the two hole sizes; any streaming/alignment defect
     corrupts these.

Inputs are production-conditioned: spatially smooth feature fields
(bilinear-upsampled low-res noise — conv features correlate spatially)
and non-negative refs (relu4_3 is post-ReLU).

Results: artifacts/pallas_tpu_cert/RESULTS.json; summary in
BENCH_NOTES.md.  Usage (detached):

  nohup python scripts/pallas_tpu_cert.py > /tmp/pallas_cert.log 2>&1 &

`--smoke` runs the same logic on CPU (forced platform, interpret-mode
pallas, C=64) to validate the harness without burning TPU compiles; it
writes RESULTS_smoke.json and certifies nothing about Mosaic.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIRECT_TOL = 2e-3
ENVELOPE_K = 8.0
STRUCT_TOL = 1e-5
PERTURB = 1e-6


def main():
    smoke = "--smoke" in sys.argv
    if smoke:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from deepinpainting_tpu.ops import attention as A
    from deepinpainting_tpu.ops import attention_pallas as AP

    dev = jax.devices()[0]
    print(f"[cert] backend={dev.platform} kind={dev.device_kind}"
          f"{' (SMOKE: interpret-mode, certifies nothing)' if smoke else ''}",
          flush=True)
    if dev.platform != "tpu" and not smoke:
        print("[cert] WARNING: not a TPU — pallas will run interpret-mode "
              "and this certifies nothing new", flush=True)
    interpret = True if smoke else False

    def smooth(rng, b, h, w, c, base=4):
        lo = rng.standard_normal((b, base, base, c)).astype(np.float32)
        x = jax.image.resize(jnp.asarray(lo), (b, h, w, c), "linear")
        return np.asarray(x) + 0.05 * rng.standard_normal(
            (b, h, w, c)).astype(np.float32)

    def make_case(seed, b, h, w, c, holes):
        """holes: list of (y0, x0, hh, ww) rectangles per ALL samples
        (shifted by sample index for heterogeneity)."""
        rng = np.random.default_rng(seed)
        feat = smooth(rng, b, h, w, c)
        ref = np.abs(smooth(rng, b, h, w, c))     # relu4_3 is non-negative
        fm = np.zeros((b, h, w), np.float32)
        for i in range(b):
            for (y0, x0, hh, ww) in holes:
                y, x = min(y0 + i, h - hh), min(x0 + i, w - ww)
                fm[i, y:y + hh, x:x + ww] = 1.0
        return (jnp.asarray(feat), jnp.asarray(ref),
                jnp.asarray(fm.reshape(b, h * w)))

    def compare_case(feat, ref, flag, known_replacement):
        """Both impls + the perturbed-lax chaos probe in ONE graph;
        returns scalar stats only."""
        n = flag.shape[1]
        out_pl, kbar_pl = AP.attention_core_pallas_batched(
            feat, ref, flag, interpret=interpret,
            known_replacement=known_replacement)
        core = jax.vmap(lambda f, r, m: A._attention_core(
            f, r, m, known_replacement))
        out_lax, kbar_lax = core(feat, ref, flag)
        out_lp, _ = core(feat * (1.0 + PERTURB), ref, flag)

        prim_pl = AP.attention_primal_pallas_batched(
            feat, ref, flag, interpret=interpret,
            known_replacement=known_replacement)
        # apples-to-apples primal reference: the lax primal emits unmasked
        # rows by GATHER (like the pallas primal), not by the decode
        # matmul, so this pair is directly comparable at short chains
        prim_lax = jax.vmap(lambda f, r, m: A._attention_core_primal(
            f, r, m, known_replacement))(feat, ref, flag)

        def loss_fn(impl):
            def f(x):
                y = A.ipsr_attention_batched(x, ref, flag, 1.0, True, impl,
                                             known_replacement)
                return jnp.sum(y.astype(jnp.float32) ** 2) / y.size
            return f

        g_pl = jax.grad(loss_fn("pallas"))(feat)
        g_lax = jax.grad(loss_fn("lax"))(feat)
        g_lp = jax.grad(loss_fn("lax"))(feat * (1.0 + PERTURB))

        # structural invariants (chaos-free), per impl: unmasked rows
        P = feat.reshape(feat.shape[0], n, -1).astype(jnp.float32)
        Pn = P / (jnp.linalg.norm(P, axis=2, keepdims=True) + 1e-8)
        R = ref.reshape(ref.shape[0], n, -1).astype(jnp.float32)
        scores = jnp.einsum("bpc,bqc->bpq", Pn, R)
        ind = jnp.argmax(scores, axis=1)
        if not known_replacement:
            ind = jnp.where(flag > 0.5, ind, jnp.arange(n)[None])
        onehot = jax.nn.one_hot(ind, n, dtype=jnp.float32)  # [B,N,N]
        known = jnp.take_along_axis(P, ind[..., None], axis=1)
        um = (flag <= 0.5)[:, :, None]                      # unmasked rows
        res = {"p_mag": jnp.max(jnp.abs(P))}
        for impl, kbar, out in (("pallas", kbar_pl,
                                 out_pl.reshape(P.shape)),
                                ("lax", kbar_lax, out_lax.reshape(P.shape))):
            res[f"struct_kbar_{impl}"] = jnp.max(
                jnp.where(um, jnp.abs(kbar - onehot), 0.0))
            res[f"struct_out_{impl}"] = jnp.max(
                jnp.where(um, jnp.abs(out.astype(jnp.float32) - known), 0.0))
        # chaos-free DIRECT cross-impl check at full shape: unmasked rows
        # never consume the recurrence carry
        res["d_out_unmasked"] = jnp.max(jnp.where(
            um, jnp.abs(out_pl.reshape(P.shape).astype(jnp.float32)
                        - out_lax.reshape(P.shape).astype(jnp.float32)), 0.0))

        def mx(a, b_):
            return jnp.max(jnp.abs(a.astype(jnp.float32)
                                   - b_.astype(jnp.float32)))

        def mean(a, b_):
            return jnp.mean(jnp.abs(a.astype(jnp.float32)
                                    - b_.astype(jnp.float32)))

        res.update(
            d_out=mx(out_pl, out_lax), d_out_mean=mean(out_pl, out_lax),
            d_kbar=mx(kbar_pl, kbar_lax),
            d_kbar_mean=mean(kbar_pl, kbar_lax),
            d_primal=mx(prim_pl, prim_lax),
            d_grad=mx(g_pl, g_lax), d_grad_mean=mean(g_pl, g_lax),
            chaos_out=mx(out_lax, out_lp),
            chaos_out_mean=mean(out_lax, out_lp),
            chaos_grad=mx(g_lax, g_lp),
            chaos_grad_mean=mean(g_lax, g_lp),
            out_mag=jnp.max(jnp.abs(out_lax)),
        )
        return res

    # (name, seed, b, h, w, holes, known_replacement, criterion)
    short_holes = [(3, 4, 1, 3), (15, 20, 1, 3), (28, 10, 1, 3)]  # 9 pos
    cases = [
        ("short_chain_direct", 0, 8, 32, 32, short_holes, True, "direct"),
        ("short_chain_corrected", 1, 8, 32, 32, short_holes, False,
         "direct"),
        ("prod_hole_25pct", 2, 8, 32, 32, [(6, 8, 16, 16)], True,
         "envelope"),
        ("n4096_hole_3.7pct", 3, 8, 64, 64, [(20, 24, 13, 12)], True,
         "envelope"),
    ]
    C = 64 if smoke else 512
    results = {}
    ok_all = True
    for name, seed, b, h, w, holes, kr, crit in cases:
        feat, ref, flag = make_case(seed, b, h, w, C, holes)
        t0 = time.time()
        fn = jax.jit(lambda f_, r_, m_, kr=kr: compare_case(f_, r_, m_, kr))
        res = {k: float(v)
               for k, v in jax.device_get(fn(feat, ref, flag)).items()}
        res["wall_s"] = round(time.time() - t0, 1)
        res["masked_frac"] = round(float(jnp.mean(flag)), 4)
        # selection-scale tolerance for the gather comparison: the decode
        # matmul runs at the TPU's default bf16-pass precision (measured
        # ~2^-8*|P| vs the exact gather); a wrong patch errs at O(2*|P|max)
        sel_tol = 0.05 * max(1.0, res["p_mag"])
        checks = {
            "struct_kbar_pallas": res["struct_kbar_pallas"] <= STRUCT_TOL,
            "struct_out_pallas": res["struct_out_pallas"] <= sel_tol,
            "struct_kbar_lax": res["struct_kbar_lax"] <= STRUCT_TOL,
            "struct_out_lax": res["struct_out_lax"] <= sel_tol,
            "d_out_unmasked": res["d_out_unmasked"] <= DIRECT_TOL,
        }
        if crit == "direct":
            checks.update(
                d_out=res["d_out"] <= DIRECT_TOL,
                d_kbar=res["d_kbar"] <= DIRECT_TOL,
                d_primal=res["d_primal"] <= DIRECT_TOL,
                d_grad=res["d_grad"] <= DIRECT_TOL,
            )
        else:
            # chaos envelope: pallas-lax within k x the lax self-chaos;
            # max(.., floor) guards a near-zero probe — the floors sit at
            # cross-impl matmul-tiling noise (measured d_grad_mean 1.0e-7
            # at N=4096 while the input-perturbation probe read 1.0e-8:
            # the truncated-K backward is insensitive to input ulps but
            # not to MXU tiling order)
            env_out = max(res["chaos_out"], 1e-6) * ENVELOPE_K
            env_gr = max(res["chaos_grad"], 1e-6) * ENVELOPE_K
            env_om = max(res["chaos_out_mean"], 1e-2) * ENVELOPE_K
            env_gm = max(res["chaos_grad_mean"], 1e-5) * ENVELOPE_K
            checks.update(
                out_in_envelope=res["d_out"] <= env_out,
                grad_in_envelope=res["d_grad"] <= env_gr,
                out_mean_in_envelope=res["d_out_mean"] <= env_om,
                grad_mean_in_envelope=res["d_grad_mean"] <= env_gm,
                primal_in_envelope=res["d_primal"] <= env_out,
            )
        passed = all(checks.values())
        ok_all &= passed
        res["checks"] = checks
        res["passed"] = passed
        results[name] = res
        print(f"[cert] {name} (masked {res['masked_frac']:.1%}, "
              f"max|out| {res['out_mag']:.3g}): "
              f"d_out={res['d_out']:.2e} d_kbar={res['d_kbar']:.2e} "
              f"d_grad={res['d_grad']:.2e} chaos_out={res['chaos_out']:.2e} "
              f"struct_pl={res['struct_kbar_pallas']:.1e}/"
              f"{res['struct_out_pallas']:.1e} -> "
              f"{'PASS' if passed else 'FAIL ' + str([k for k, v in checks.items() if not v])}"
              f" ({res['wall_s']:.0f}s)", flush=True)

    out = {"device_kind": dev.device_kind, "platform": dev.platform,
           "criteria": {"direct_tol": DIRECT_TOL, "envelope_k": ENVELOPE_K,
                        "struct_tol": STRUCT_TOL, "perturb": PERTURB},
           "cases": results, "all_passed": ok_all,
           "batch": 8, "channels": C}
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "pallas_tpu_cert")
    os.makedirs(out_dir, exist_ok=True)
    fname = "RESULTS_smoke.json" if smoke else "RESULTS.json"
    with open(os.path.join(out_dir, fname), "w") as f:
        json.dump(out, f, indent=2)
    print(f"[cert] {'ALL PASS' if ok_all else 'FAILURES'} -> "
          f"{out_dir}/{fname}", flush=True)
    return 0 if ok_all else 1


if __name__ == "__main__":
    sys.exit(main())
