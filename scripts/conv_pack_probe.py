"""Experimental k3s1 output-packing probe.

The round-2 roofline (BENCH_NOTES.md) has the two high-res VGG-style
k3s1 convs (64->64@256, 128->128@128) at ~33% MFU while the deeper k3s1
convs hit 86-99%.  Hypothesis: output-lane padding / spatial tiling at
large H,W.  Candidate exact rewrites, all packing 2 or 4 neighboring
output pixels into the channel dim so each MXU pass produces 2-4x the
output lanes at 4/3x (or 16/9x) zero-padded MACs:

  wpack2 : kernel [3,4,C,2Co], stride (1,2) — cols 2j,2j+1 stacked
  hpack2 : kernel [4,3,C,2Co], stride (2,1) — rows 2i,2i+1 stacked
  hwpack4: kernel [4,4,C,4Co], stride (2,2) — the 2x2 block stacked

All are algebraically exact (verified vs the direct conv with --check on
CPU and on device).  Timing: op_probe methodology — chained fori_loop,
long/short differencing, quadratic-free chaining (y*1e-30 + c).

Usage: python scripts/conv_pack_probe.py [--cpu] [--check] [--iters 128]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_wpack(k):
    kh, kw, c, co = k.shape
    k2 = np.zeros((kh, kw + 1, c, 2 * co), k.dtype)
    k2[:, 0:kw, :, :co] = k
    k2[:, 1:kw + 1, :, co:] = k
    return k2


def build_hpack(k):
    kh, kw, c, co = k.shape
    k2 = np.zeros((kh + 1, kw, c, 2 * co), k.dtype)
    k2[0:kh, :, :, :co] = k
    k2[1:kh + 1, :, :, co:] = k
    return k2


def build_hwpack(k):
    kh, kw, c, co = k.shape
    k4 = np.zeros((kh + 1, kw + 1, c, 4 * co), k.dtype)
    for di in range(2):
        for dj in range(2):
            b = (2 * di + dj) * co
            k4[di:di + kh, dj:dj + kw, :, b:b + co] = k
    return k4


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--iters", type=int, default=128)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--check", action="store_true",
                    help="assert exactness vs the direct conv (f32)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from jax import lax

    DN = ("NHWC", "HWIO", "NHWC")
    dt = jnp.dtype(args.dtype)

    def direct(x, k):
        return lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=DN)

    def wpack2(x, k2):
        n, h, w, _ = x.shape
        co = k2.shape[3] // 2
        y = lax.conv_general_dilated(
            x, k2, (1, 2), ((1, 1), (1, 2)), dimension_numbers=DN)
        return y.reshape(n, h, w // 2, 2, co).reshape(n, h, w, co)

    def hpack2(x, k2):
        n, h, w, _ = x.shape
        co = k2.shape[3] // 2
        y = lax.conv_general_dilated(
            x, k2, (2, 1), ((1, 2), (1, 1)), dimension_numbers=DN)
        y = y.reshape(n, h // 2, w, 2, co).transpose(0, 1, 3, 2, 4)
        return y.reshape(n, h, w, co)

    def hwpack4(x, k4):
        n, h, w, _ = x.shape
        co = k4.shape[3] // 4
        y = lax.conv_general_dilated(
            x, k4, (2, 2), ((1, 2), (1, 2)), dimension_numbers=DN)
        y = y.reshape(n, h // 2, w // 2, 2, 2, co).transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(n, h, w, co)

    variants = [("direct", direct, lambda k: k),
                ("wpack2", wpack2, build_wpack),
                ("hpack2", hpack2, build_hpack),
                ("hwpack4", hwpack4, build_hwpack)]

    rng = np.random.default_rng(0)
    if args.check:
        for hw, c in ((16, 8), (32, 64)):
            x = rng.normal(0, 1, (2, hw, hw, c)).astype(np.float32)
            k = rng.normal(0, 0.1, (3, 3, c, c)).astype(np.float32)
            ref = np.asarray(direct(jnp.asarray(x), jnp.asarray(k)))
            for name, fn, bk in variants[1:]:
                got = np.asarray(fn(jnp.asarray(x), jnp.asarray(bk(k))))
                err = np.abs(got - ref).max()
                assert err < 1e-4, (name, hw, c, err)
                print(f"[check] {name}@{hw}x{c}: max|err| {err:.2e} OK",
                      flush=True)
        if args.cpu:
            return

    b = args.batch
    cases = [("vgg64@256", 256, 64), ("vgg128@128", 128, 128)]
    for cname, hw, c in cases:
        x = jnp.asarray(rng.normal(0, 1, (b, hw, hw, c)) * 0.1, dt)
        k0 = rng.normal(0, 0.02, (3, 3, c, c)).astype(np.float32)
        macs = b * hw * hw * 9 * c * c
        for name, fn, bk in variants:
            kk = jnp.asarray(bk(k0), dt)

            @jax.jit
            def chained(x, kk, n, fn=fn):
                def body(i, carry):
                    y = fn(carry, kk)
                    return y * dt.type(1e-30) + carry * dt.type(1 - 1e-30)
                return lax.fori_loop(0, n, body, x)

            n, ns = args.iters, max(2, args.iters // 8)
            t0 = time.time()
            np.asarray(chained(x, kk, n))
            compile_s = time.time() - t0
            per = []
            for _ in range(args.repeats):
                a = time.time()
                np.asarray(chained(x, kk, ns))
                m = time.time()
                np.asarray(chained(x, kk, ns + n))
                z = time.time()
                per.append(((z - m) - (m - a)) / n)
            per.sort()
            med = per[len(per) // 2]
            print(f"[pack] {cname} {name}: {med * 1e6:.0f} us  "
                  f"{2 * macs / med / 1e12:.1f} T/s  compile {compile_s:.0f}s",
                  flush=True)


if __name__ == "__main__":
    main()
