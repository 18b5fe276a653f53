"""int8 conv feasibility probe: does XLA:TPU lower s8xs8->s32 convolutions
onto the MXU at ~2x the bf16 rate on this chip?

Times the pipeline's heavy conv shapes (see op_probe.py) in bf16 vs a full
dynamic-int8 path (per-tensor activation quant + per-Cout weight quant +
int8 conv + dequant), INCLUDING the quant/dequant elementwise work the real
pipeline would pay per layer.  Timing: dynamic-trip-count chained fori_loop
with long/short differencing (tunnel overhead cancels) — bench.py method.

Usage: python scripts/int8_probe.py [--batch 8] [--cpu]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
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
    b = args.batch
    rng = np.random.default_rng(0)

    def conv_bf16(x, w, stride, pad, dil):
        return lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            (stride, stride), ((pad, pad), (pad, pad)),
            rhs_dilation=(dil, dil), dimension_numbers=DN)

    def conv_int8(x, w, stride, pad, dil):
        # dynamic per-tensor activation scale, per-Cout weight scale
        sx = jnp.max(jnp.abs(x)) / 127.0 + 1e-12
        xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
        sw = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0 + 1e-12
        wq = jnp.clip(jnp.round(w / sw), -127, 127).astype(jnp.int8)
        y = lax.conv_general_dilated(
            xq, wq, (stride, stride), ((pad, pad), (pad, pad)),
            rhs_dilation=(dil, dil), dimension_numbers=DN,
            preferred_element_type=jnp.int32)
        return y.astype(jnp.float32) * (sx * sw)

    def case(name, hw, cin, cout, k, stride, pad, dil=1):
        out_hw = (hw + 2 * pad - dil * (k - 1) - 1) // stride + 1
        macs = b * out_hw * out_hw * k * k * cin * cout
        x = jnp.asarray(rng.normal(0, 1, (b, hw, hw, cin)) * 0.1, jnp.float32)
        w = jnp.asarray(rng.normal(0, 0.02, (k, k, cin, cout)), jnp.float32)
        return name, x, w, (stride, pad, dil), macs

    cases = [
        case("vgg_64->64@256", 256, 64, 64, 3, 1, 1),
        case("vgg_128->128@128", 128, 128, 128, 3, 1, 1),
        case("vgg_256->256@64", 64, 256, 256, 3, 1, 1),
        case("unet_enc3_128->256@64", 64, 128, 256, 4, 2, 1),
        case("ipsr_dil_512->512@32", 32, 512, 512, 4, 2, 3, 2),
    ]

    for name, x, w, (stride, pad, dil), macs in cases:
        if args.only and args.only not in name:
            continue
        for tag, conv in (("bf16", conv_bf16), ("int8", conv_int8)):
            @jax.jit
            def chained(x, w, n, conv=conv):
                def body(i, c):
                    y = conv(c, w, stride, pad, dil)
                    # quadratic consumer + value-preserving chain (op_probe)
                    z = jnp.mean((y * y).astype(jnp.float32)) * 1e-30
                    return c * (1.0 + z.astype(c.dtype))
                return jax.lax.fori_loop(0, n, body, x)

            n, ns = args.iters, max(2, args.iters // 8)
            t0 = time.time()
            try:
                np.asarray(chained(x, w, n))
            except Exception as e:
                print(f"[int8] {name} {tag}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", file=sys.stderr, flush=True)
                break
            compile_s = time.time() - t0
            per = []
            for _ in range(args.repeats):
                a = time.time()
                np.asarray(chained(x, w, ns))
                m = time.time()
                np.asarray(chained(x, w, ns + n))
                z = time.time()
                per.append(((z - m) - (m - a)) / n)
            per.sort()
            med = per[len(per) // 2]
            tf = 2 * macs / med / 1e12
            spread = ((per[-1] - per[0]) / abs(med) * 100 if med
                      else float("inf"))
            print(f"[int8] {name} {tag}: {med * 1e6:.0f} us  {tf:.1f} T/s  "
                  f"compile {compile_s:.0f}s  spread {spread:.0f}%",
                  file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
