"""Single-op TPU roofline probe.

Times individual convolution/norm ops at the pipeline's real shapes and
prints achieved TFLOP/s vs the chip peak, to locate which layers hold the
conv stacks at ~10% MFU (BENCH_NOTES.md round 2).

Timing: dynamic-trip-count chained fori_loop, long/short differencing
(tunnel overhead cancels) — same method as bench.py.

Usage: python scripts/op_probe.py [--ops conv1 conv2 ...] [--batch 8]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ops", nargs="*", default=None)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--pack", action="store_true",
                    help="trace convs under pack_small_cin_mode (the "
                         "Config.pack_small_cin rewrite) for an A/B")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from deepinpainting_tpu.ops.convs import (conv2d, conv_transpose2d,
                                              instance_norm)

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    b = args.batch
    rng = np.random.default_rng(0)

    def t(*shape):
        return jnp.asarray(rng.normal(0, 1, shape) * 0.1, dt)

    # (name, fn(x, k) -> y, x, k, MACs) — MACs exclude bias adds.
    def conv_case(name, hw, cin, cout, k, stride, pad, dil=1):
        out_hw = (hw + 2 * pad - dil * (k - 1) - 1) // stride + 1
        macs = b * out_hw * out_hw * k * k * cin * cout
        return (name,
                lambda x, w: conv2d(x, w, None, stride, pad, dil),
                t(b, hw, hw, cin), t(k, k, cin, cout), macs)

    def deconv_case(name, hw, cin, cout, k, stride, pad):
        out_hw = (hw - 1) * stride - 2 * pad + k
        # /stride^2: the lhs-dilated input is (s^2-1)/s^2 zeros and XLA
        # decomposes the deconv into s^2 dense subkernels — counting the
        # zeros reads >chip-peak TF/s.
        macs = b * out_hw * out_hw * k * k * cin * cout // (stride * stride)
        return (name,
                lambda x, w: conv_transpose2d(x, w, None, stride, pad),
                t(b, hw, hw, cin), t(k, k, cin, cout), macs)

    cases = [
        # U-Net encoder ladder (k4 s2 p1)
        conv_case("unet_enc1_3->64@256", 256, 3, 64, 4, 2, 1),
        # first convs with tiny Cin (pack_small_cin targets)
        conv_case("vgg_3->64@256", 256, 3, 64, 3, 1, 1),
        conv_case("unetg_6->64@256", 256, 6, 64, 3, 1, 1),
        conv_case("unet_enc2_64->128@128", 128, 64, 128, 4, 2, 1),
        conv_case("unet_enc3_128->256@64", 64, 128, 256, 4, 2, 1),
        conv_case("unet_enc4_256->512@32", 32, 256, 512, 4, 2, 1),
        conv_case("unet_enc6_512->512@8", 8, 512, 512, 4, 2, 1),
        # IPSR dilated halving (k4 s2 p3 d2)
        conv_case("ipsr_dil_512->512@32", 32, 512, 512, 4, 2, 3, 2),
        # decoder deconvs (k4 s2 p1)
        deconv_case("unet_dec_1024->256@32", 32, 1024, 256, 4, 2, 1),
        deconv_case("unet_dec_512->64@128", 128, 512, 64, 4, 2, 1),
        deconv_case("unet_dec_1024->512@2", 2, 1024, 512, 4, 2, 1),
        # VGG 3x3 s1 p1 convs
        conv_case("vgg_64->64@256", 256, 64, 64, 3, 1, 1),
        conv_case("vgg_128->128@128", 128, 128, 128, 3, 1, 1),
        conv_case("vgg_256->256@64", 64, 256, 256, 3, 1, 1),
        conv_case("vgg_512->512@32", 32, 512, 512, 3, 1, 1),
        # ---- 512px operating point (VERDICT r3 weak #3: the 256px-only
        # op table couldn't say whether 512px MFU 0.35 vs 0.40 is the same
        # layout floor or an addressable deficit).  Same layers, doubled
        # spatial; the attention level moves to 64x64 (N=4096).
        conv_case("unet_enc1_3->64@512", 512, 3, 64, 4, 2, 1),
        conv_case("vgg_3->64@512", 512, 3, 64, 3, 1, 1),
        conv_case("unetg_6->64@512", 512, 6, 64, 3, 1, 1),
        conv_case("unet_enc2_64->128@256", 256, 64, 128, 4, 2, 1),
        conv_case("unet_enc3_128->256@128", 128, 128, 256, 4, 2, 1),
        conv_case("unet_enc4_256->512@64", 64, 256, 512, 4, 2, 1),
        conv_case("ipsr_dil_512->512@64", 64, 512, 512, 4, 2, 3, 2),
        deconv_case("unet_dec_1024->256@64", 64, 1024, 256, 4, 2, 1),
        deconv_case("unet_dec_512->64@256", 256, 512, 64, 4, 2, 1),
        deconv_case("unet_dec_128->64@512", 512, 128, 64, 4, 2, 1),
        conv_case("vgg_64->64@512", 512, 64, 64, 3, 1, 1),
        conv_case("vgg_128->128@256", 256, 128, 128, 3, 1, 1),
        conv_case("vgg_256->256@128", 128, 256, 256, 3, 1, 1),
        conv_case("vgg_512->512@64", 64, 512, 512, 3, 1, 1),
    ]

    # IPSR attention (inference primal) at both grid sizes: scores +
    # decode are 2*N*N*C MACs each; the N-step sequential scan is the
    # latency floor in between (SURVEY.md §7.3).  TF/s here is "useful
    # matmul flops / wall", so the gap to the conv lines above is the
    # scan's share — exactly the number the 512px MFU question needs.
    def attn_case(name, hw, impl):
        from deepinpainting_tpu.ops.attention import ipsr_attention_batched
        c, n_tok = 512, hw * hw
        x, ref = t(b, hw, hw, c), t(b, hw, hw, c)
        flag = np.zeros((b, hw, hw), np.float32)
        q = hw // 4
        flag[:, q:3 * q, q:3 * q] = 1.0  # center-quarter hole, bench-like
        flag = jnp.asarray(flag.reshape(b, n_tok))
        macs = b * 2 * n_tok * n_tok * c

        def fn(x, ref):
            return ipsr_attention_batched(x, ref, flag, 1.0, True, impl)

        return (name, fn, x, ref, macs)

    cases += [attn_case("attn_pallas@32", 32, "pallas"),
              attn_case("attn_pallas@64", 64, "pallas"),
              attn_case("attn_lax@64", 64, "lax")]
    # instance norm at a large and a small shape (flops ~0; bandwidth test)
    def in_case(name, hw, c):
        x = t(b, hw, hw, c)
        sc = jnp.ones((c,), jnp.float32)
        of = jnp.zeros((c,), jnp.float32)
        return (name, lambda x, _: instance_norm(x, sc, of), x,
                jnp.zeros((1,), dt), 0)
    cases += [in_case("inorm_64@128", 128, 64), in_case("inorm_512@8", 8, 512)]

    names = [c[0] for c in cases]
    sel = args.ops or names
    for name, fn, x, w, macs in cases:
        if name not in sel:
            continue
        if args.pack:
            from deepinpainting_tpu.ops.convs import pack_small_cin_mode

            def fn(x, w, _orig=fn):
                with pack_small_cin_mode():
                    return _orig(x, w)

        @jax.jit
        def chained(x, w, n):
            def body(i, c):
                y = fn(c, w)
                # value-preserving resize back to the input shape to chain.
                # quadratic consumer: XLA folds reduce(conv) algebraically
                # (it never runs the conv, probe reads >peak TF/s), but
                # reduce(conv^2) has no such rewrite.
                if y.shape != c.shape:
                    z = jnp.mean(y * y).astype(c.dtype) * 1e-30
                    return c * (1.0 + z)
                return y * 1e-30 + c * (1.0 - 1e-30)
            return jax.lax.fori_loop(0, n, body, x)

        t0 = time.time()
        np.asarray(chained(x, w, args.iters))
        compile_s = time.time() - t0
        # Auto-scale the trip count so the LONG window is ~2 s of device
        # time: a fixed 32-iter window is ~0.1 s for the fast ops, the
        # same order as a single tunnel stall, so stalls that survive the
        # <=0 censoring (long-window hits) inflate the median badly
        # (observed: a 2 ms/iter deconv reading 189 ms/iter).  The trip
        # count is a dynamic argument — rescaling costs no recompile.
        # Calibrate by DIFFERENCING two trip counts so the ~32 ms fixed
        # per-call tunnel overhead doesn't inflate `rough` (undifferenced,
        # a 20 us/iter op reads ~520 us/iter and the window stays
        # stall-sized); retry while a stall makes the difference negative.
        rough = 0.0
        for _ in range(8):
            t1 = time.time()
            np.asarray(chained(x, w, args.iters))
            t2 = time.time()
            np.asarray(chained(x, w, 3 * args.iters))
            t3 = time.time()
            rough = ((t3 - t2) - (t2 - t1)) / (2 * args.iters)
            if rough > 0:
                break
        rough = max(rough, 1e-6)
        n = int(min(max(2.0 / rough, args.iters), 65536))
        ns = max(2, n // 8)
        per, stalls = [], 0
        while len(per) < args.repeats:
            a = time.time()
            np.asarray(chained(x, w, ns))
            m = time.time()
            np.asarray(chained(x, w, ns + n))
            z = time.time()
            est = ((z - m) - (m - a)) / n
            if est <= 0:
                # physically impossible: a tunnel stall landed inside the
                # SHORT window (bench.py's censoring rule) — discard, retry
                stalls += 1
                if stalls >= 4 * args.repeats:
                    print(f"[op] {name}: UNSTABLE ({stalls} impossible "
                          "estimates) — skipping", file=sys.stderr,
                          flush=True)
                    per = []
                    break
                continue
            per.append(est)
        if not per:
            continue
        per.sort()
        med = per[len(per) // 2]
        tf = 2 * macs / med / 1e12 if macs else 0.0
        gb = (x.nbytes * 2) / med / 1e9  # rough in+out traffic
        print(f"[op] {name}: {med * 1e6:.0f} us  "
              f"{tf:.1f} TF/s  (~{gb:.0f} GB/s io)  compile {compile_s:.0f}s",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
