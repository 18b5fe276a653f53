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


def build_dpack(k):
    """ConvTranspose2d k4 s2 p1 -> k2 s1 conv with the 2x2 output phase
    packed into 4*Cout channels (sub-pixel decomposition, zero padded MACs).

    Derivation (per axis, torch deconv semantics, pad p=1, k=4, s=2):
      out[o] = sum_i x[i] * K[o + 1 - 2i],  kernel index in 0..3
      o = 2m + 1: taps x[m]*K[2] + x[m+1]*K[0]
      o = 2m + 2: taps x[m]*K[3] + x[m+1]*K[1]
    Both phases read the window x[m..m+1] -> one k2 VALID conv over
    pad(x, 1) emits o = -1..2H at positions m' = -1..H-1; slice [1:2H+1].
    """
    _, _, c, co = k.shape
    k2 = np.zeros((2, 2, c, 4 * co), k.dtype)
    taps = {1: (2, 0), 2: (3, 1)}  # r -> (tap at m', tap at m'+1)
    for rh in (1, 2):
        for rw in (1, 2):
            b = ((rh - 1) * 2 + (rw - 1)) * co
            for u in (0, 1):
                for v in (0, 1):
                    k2[u, v, :, b:b + co] = k[taps[rh][u], taps[rw][v]]
    return k2


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--iters", type=int, default=128)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--check", action="store_true",
                    help="assert exactness vs the direct conv (f32)")
    ap.add_argument("--only", default="",
                    help="substring filter on case name (re-run one case)")
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

    def dpack4(x, k2):
        n, h, w, _ = x.shape
        co = k2.shape[3] // 4
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        y = lax.conv_general_dilated(
            xp, k2, (1, 1), "VALID", dimension_numbers=DN)
        y = y.reshape(n, h + 1, w + 1, 2, 2, co).transpose(0, 1, 3, 2, 4, 5)
        y = y.reshape(n, 2 * h + 2, 2 * w + 2, co)
        return y[:, 1:2 * h + 1, 1:2 * w + 1, :]

    variants = [("direct", direct, lambda k: k),
                ("wpack2", wpack2, build_wpack),
                ("hpack2", hpack2, build_hpack),
                ("hwpack4", hwpack4, build_hwpack)]

    from deepinpainting_tpu.ops.convs import conv_transpose2d

    def direct_deconv(x, k):
        return conv_transpose2d(x, k, None, stride=2, padding=1)

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
            kd = rng.normal(0, 0.1, (4, 4, c, c // 2)).astype(np.float32)
            ref = np.asarray(direct_deconv(jnp.asarray(x), jnp.asarray(kd)))
            got = np.asarray(dpack4(jnp.asarray(x), jnp.asarray(build_dpack(kd))))
            err = np.abs(got - ref).max()
            assert got.shape == ref.shape and err < 1e-4, (hw, c, err)
            print(f"[check] dpack4@{hw}x{c}: max|err| {err:.2e} OK", flush=True)
        if args.cpu:
            return

    b = args.batch
    # (case, variant list, input hw/c, kernel builder args, useful MACs)
    conv_cases = [("vgg64@256", 256, 64), ("vgg128@128", 128, 128)]
    runs = []
    for cname, hw, c in conv_cases:
        k0 = rng.normal(0, 0.02, (3, 3, c, c)).astype(np.float32)
        macs = b * hw * hw * 9 * c * c
        for name, fn, bk in variants:
            runs.append((cname, name, fn, (hw, c), bk(k0), macs))
    # deconv cases: the 44%-MFU small-Cout upsample and the 97% big one
    for cname, hw, cin, cout in (("deconv512->64@128", 128, 512, 64),
                                 ("deconv1024->256@32", 32, 1024, 256)):
        kd = rng.normal(0, 0.02, (4, 4, cin, cout)).astype(np.float32)
        macs = b * (2 * hw) ** 2 * 16 * cin * cout // 4
        runs.append((cname, "direct", direct_deconv, (hw, cin), kd, macs))
        runs.append((cname, "dpack4", dpack4, (hw, cin), build_dpack(kd), macs))

    for cname, name, fn, (hw, c), k0, macs in runs:
        if args.only and args.only not in cname:
            continue
        x = jnp.asarray(rng.normal(0, 1, (b, hw, hw, c)) * 0.1, dt)
        kk = jnp.asarray(k0, dt)

        @jax.jit
        def chained(x, kk, n, fn=fn):
            def body(i, carry):
                y = fn(carry, kk)
                if y.shape != carry.shape:
                    # quadratic consumer (op_probe methodology): linear
                    # reduce-of-conv gets folded by XLA and never runs
                    z = jnp.mean((y * y).astype(jnp.float32)) * 1e-30
                    return carry * (1.0 + z.astype(carry.dtype))
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
        spread = (per[-1] - per[0]) / abs(med) * 100 if med else float("inf")
        print(f"[pack] {cname} {name}: {med * 1e6:.0f} us  "
              f"{2 * macs / med / 1e12:.1f} T/s  compile {compile_s:.0f}s  "
              f"spread {spread:.0f}%", flush=True)


if __name__ == "__main__":
    main()
