"""Certify COMPILED Pallas attention kernels against the lax path on TPU.

VERDICT r4 missing #3: every Pallas kernel test runs interpret-mode on
CPU; on the TPU the kernels were exercised only through bench timings and
training convergence — indirect evidence that would not localize a Mosaic
lowering discrepancy.  This script runs ON THE TPU (detached, per
CLAUDE.md) and directly compares, per shape:

  * `attention_primal_pallas_batched`  vs vmap'd lax `_attention_core_primal`
  * `attention_core_pallas_batched`    vs vmap'd lax `_attention_core`
    (both the output and the full [B,N,N] kbar)
  * the custom-vjp backward: grad of sum(out^2) through
    `ipsr_attention_batched(impl='pallas')` vs impl='lax'

at the two production grid sizes — N=1024 (256px, C=512, b8) and N=4096
(512px, C=512, b8) — plus the corrected known_replacement=False mode at
N=1024.  All diffs are reduced ON DEVICE (one jit per case: both impls in
one graph; only scalar stats are fetched, so the N=4096 kbar's 512 MB
never crosses the tunnel).

Pre-registered tolerances (from the CPU-interpret suite, where the same
two formulations sit at 1e-4..5e-3 on long masked chains — the recurrence
out_i = a_i*out_{i-1} + b_i*best_i amplifies ulp-level FMA-contraction
differences; tests/test_attention_pallas.py):

  PASS iff  max|Δout|   <= 5e-3,  max|Δkbar| <= 5e-3,  max|Δgrad| <= 1e-2

Results land in artifacts/pallas_tpu_cert/RESULTS.json and are summarized
in BENCH_NOTES.md.  Usage (detached):

  nohup python scripts/pallas_tpu_cert.py > /tmp/pallas_cert.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOL = {"out": 5e-3, "kbar": 5e-3, "grad": 1e-2}


def main():
    import jax
    import jax.numpy as jnp
    from deepinpainting_tpu.ops import attention as A
    from deepinpainting_tpu.ops import attention_pallas as AP

    dev = jax.devices()[0]
    print(f"[cert] backend={dev.platform} kind={dev.device_kind}",
          flush=True)
    if dev.platform != "tpu":
        print("[cert] WARNING: not a TPU — pallas will run interpret-mode "
              "and this certifies nothing new", flush=True)

    def make_case(seed, b, h, w, c, frac=0.25):
        rng = np.random.default_rng(seed)
        feat = rng.standard_normal((b, h, w, c)).astype(np.float32)
        ref = rng.standard_normal((b, h, w, c)).astype(np.float32)
        n = h * w
        flag = np.zeros((b, n), np.float32)
        # per-sample heterogeneous masks: contiguous block + scattered
        for i in range(b):
            lo = int(n * 0.2) + i * 3
            flag[i, lo:lo + int(n * frac)] = 1.0
            flag[i, :: 17 + i] = 1.0
        return jnp.asarray(feat), jnp.asarray(ref), jnp.asarray(flag)

    def stats(d):
        d = jnp.abs(d)
        return jnp.max(d), jnp.mean(d)

    def compare_case(feat, ref, flag, known_replacement):
        """Both impls in ONE graph; returns scalar diff stats only."""
        out_pl, kbar_pl = AP.attention_core_pallas_batched(
            feat, ref, flag, interpret=False,
            known_replacement=known_replacement)
        core = jax.vmap(lambda f, r, m: A._attention_core(
            f, r, m, known_replacement))
        out_lax, kbar_lax = core(feat, ref, flag)

        prim_pl = AP.attention_primal_pallas_batched(
            feat, ref, flag, interpret=False,
            known_replacement=known_replacement)
        prim_lax = jax.vmap(lambda f, r, m: A._attention_core_primal(
            f, r, m, known_replacement))(feat, ref, flag)

        def loss(impl):
            def f(x):
                y = A.ipsr_attention_batched(x, ref, flag, 1.0, True, impl,
                                             known_replacement)
                return jnp.sum(y.astype(jnp.float32) ** 2) / y.size
            return jax.grad(f)(feat)

        g_pl, g_lax = loss("pallas"), loss("lax")
        res = {}
        for name, a, b_ in (("out", out_pl, out_lax),
                            ("kbar", kbar_pl, kbar_lax),
                            ("primal", prim_pl, prim_lax),
                            ("grad", g_pl, g_lax)):
            mx, mean = stats(a - b_)
            # scale context: the operands' own magnitude
            res[name] = (mx, mean, jnp.max(jnp.abs(b_)))
        return res

    cases = [
        ("N1024_faithful", 0, 8, 32, 32, 512, True),
        ("N1024_corrected", 1, 8, 32, 32, 512, False),
        ("N4096_faithful", 2, 8, 64, 64, 512, True),
    ]
    results = {}
    ok_all = True
    for name, seed, b, h, w, c, faithful in cases:
        feat, ref, flag = make_case(seed, b, h, w, c)
        t0 = time.time()
        fn = jax.jit(lambda f_, r_, m_, kr=faithful: compare_case(
            f_, r_, m_, kr))
        res = jax.device_get(fn(feat, ref, flag))
        dt = time.time() - t0
        row = {}
        for k, (mx, mean, ref_mag) in res.items():
            row[k] = {"max_abs_diff": float(mx), "mean_abs_diff": float(mean),
                      "ref_max_abs": float(ref_mag)}
        tol_keys = {"out": "out", "kbar": "kbar", "primal": "out",
                    "grad": "grad"}
        passed = all(row[k]["max_abs_diff"] <= TOL[tol_keys[k]]
                     for k in row)
        ok_all &= passed
        row["passed"] = passed
        row["compile_plus_run_s"] = round(dt, 1)
        results[name] = row
        print(f"[cert] {name}: "
              + ", ".join(f"{k} max|Δ|={v['max_abs_diff']:.2e}"
                          for k, v in row.items()
                          if isinstance(v, dict))
              + f" -> {'PASS' if passed else 'FAIL'} ({dt:.0f}s)",
              flush=True)

    out = {"device_kind": dev.device_kind, "platform": dev.platform,
           "tolerances": TOL, "cases": results, "all_passed": ok_all,
           "batch": 8, "channels": 512}
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "pallas_tpu_cert")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "RESULTS.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(f"[cert] {'ALL PASS' if ok_all else 'FAILURES'} -> "
          f"{out_dir}/RESULTS.json", flush=True)
    return 0 if ok_all else 1


if __name__ == "__main__":
    sys.exit(main())
