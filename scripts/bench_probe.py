"""Stage-level TPU timing probe (batch-cliff bisection).

Times one pipeline stage in isolation with the same chained-fori_loop
method as bench.py, so per-stage costs at different batch sizes can be
compared (used to locate the b16 throughput cliff, BENCH_NOTES.md).

Usage:
  python scripts/bench_probe.py --stage netP --batch 8 16 --dtype bfloat16
Stages: full | netP | netG | vgg | mask
"""

import argparse
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--stage", required=True,
                    choices=["full", "netP", "netG", "vgg", "mask", "attn"])
    ap.add_argument("--batch", type=int, nargs="+", default=[8])
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--attn", default="pallas")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from deepinpainting_tpu.config import Config
    from deepinpainting_tpu.engine import init_params, make_inference_fn
    from deepinpainting_tpu.engine.inpaint import build_models, prepare_masks
    from deepinpainting_tpu.models.vgg16 import apply_vgg16
    from deepinpainting_tpu.ops import masks as M

    cfg = Config(fine_size=args.size, is_train=False, use_dropout=False,
                 dtype=args.dtype, attention_impl=args.attn)
    params = init_params(cfg, jax.random.PRNGKey(0))
    models = build_models(cfg)
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    s = args.size
    fs = s // 8

    # Params/aux are passed as jit ARGUMENTS (never closure constants):
    # captured arrays are inlined into the serialized module sent to the
    # remote compile server, which rejects oversized programs (HTTP 413).
    def build(stage, b):
        rng = np.random.default_rng(0)
        if stage == "full":
            infer = make_inference_fn(cfg)
            img = jnp.asarray(rng.uniform(-1, 1, (b, s, s, 3)), jnp.float32)
            mask = np.zeros((b, s, s), np.float32)
            q = s // 4
            mask[:, q:3 * q, q:3 * q] = 1.0
            mask = jnp.asarray(mask)
            p = (params["G"], params["P"], params["vgg"], mask)

            def body(p, i, x):
                # honest chaining: gt = ref = carry, mask recomputed through
                # a value-preserving data dependence (matches bench.py)
                m = p[3] * (1.0 + jnp.mean(x) * 1e-30)
                fake_B, _ = infer(p[0], p[1], p[2], x, m, x)
                return fake_B
            return body, p, img
        if stage == "netP":
            x = jnp.asarray(rng.uniform(-1, 1, (b, s, s, 3)), dt)

            def body(p, i, x):
                return models.P.apply({"params": p}, x, train=False
                                      ).astype(dt)
            return body, params["P"], x
        if stage == "netG":
            x = jnp.asarray(rng.uniform(-1, 1, (b, s, s, 6)), dt)
            ref_feat = jnp.asarray(rng.uniform(-1, 1, (b, fs, fs, 512)), dt)
            flag = jnp.zeros((b, fs * fs), jnp.float32
                             ).at[:, fs * fs // 3:2 * fs * fs // 3].set(1.0)
            p = (params["G"], ref_feat, flag)

            def body(p, i, x):
                y, _ = models.G.apply({"params": p[0]}, x, p[1], p[2],
                                      train=False)
                return jnp.concatenate([y, y], axis=-1).astype(dt)
            return body, p, x
        if stage == "vgg":
            x = jnp.asarray(rng.uniform(-1, 1, (b, s, s, 3)), dt)

            def body(p, i, x):
                f = apply_vgg16(p, x)
                # quadratic consumer so reduce(...) cannot fold through the convs
                return x * (1.0 + (f.relu4_3 * f.relu4_3).mean().astype(dt) * 1e-30)
            return body, params["vgg"], x
        if stage == "attn":
            # isolated IPSR attention at the fine_size/8 grid
            from deepinpainting_tpu.ops.attention import ipsr_attention_batched
            g = s // 8
            feat = t = jnp.asarray(rng.normal(0, 1, (b, g, g, 512)) * 0.5, dt)
            ref_feat = jnp.asarray(rng.normal(0, 1, (b, g, g, 512)) * 0.5, dt)
            flag = jnp.zeros((b, g * g), jnp.float32
                             ).at[:, g * g // 3:2 * g * g // 3].set(1.0)

            def body(p, i, x):
                return ipsr_attention_batched(x, p[0], p[1],
                                              impl=args.attn)
            return body, (ref_feat, flag), feat
        if stage == "mask":
            mask = np.zeros((b, s, s), np.float32)
            q = s // 4
            mask[:, q:3 * q, q:3 * q] = 1.0
            mask = jnp.asarray(mask)

            def body(p, i, m):
                fmask, flag = prepare_masks(cfg, m)
                return m * (1.0 + flag.mean() * 1e-30)
            return body, jnp.zeros(()), mask
        raise ValueError(stage)

    # Timing: dynamic trip count (one compile per batch size) and
    # long/short differencing so the ~32 ms per-call tunnel overhead
    # cancels (same method as bench.py).
    for b in args.batch:
        body, p0, x0 = build(args.stage, b)

        @jax.jit
        def chained(p, x, n):
            return jax.lax.fori_loop(
                0, n, lambda i, c: body(p, i, c), x)

        n = args.iters
        ns = max(2, n // 8)
        t0 = time.time()
        np.asarray(chained(p0, x0, n))  # compile + warm
        compile_s = time.time() - t0
        per = []
        for _ in range(args.repeats):
            t0 = time.time()
            np.asarray(chained(p0, x0, ns))
            t1 = time.time()
            np.asarray(chained(p0, x0, ns + n))
            t2 = time.time()
            per.append(((t2 - t1) - (t1 - t0)) / n)
        per.sort()
        med = per[len(per) // 2]
        print(f"[probe] stage={args.stage} b={b} dtype={args.dtype}: "
              f"{med * 1000:.2f} ms/iter = {med / b * 1000:.3f} ms/img "
              f"({b / med:.1f} img/s; compile+warm {compile_s:.0f}s; "
              f"spread {(per[-1] - per[0]) / med * 100:.1f}%)",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
