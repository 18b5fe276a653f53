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
                    choices=["full", "netP", "netG", "vgg", "mask"])
    ap.add_argument("--batch", type=int, nargs="+", default=[8])
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=16)
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

    def build(stage, b):
        rng = np.random.default_rng(0)
        if stage == "full":
            infer = make_inference_fn(cfg)
            img = jnp.asarray(rng.uniform(-1, 1, (b, s, s, 3)), jnp.float32)
            mask = np.zeros((b, s, s), np.float32)
            q = s // 4
            mask[:, q:3 * q, q:3 * q] = 1.0
            mask = jnp.asarray(mask)
            p3 = (params["G"], params["P"], params["vgg"])

            def body(i, x):
                fake_B, _ = infer(p3[0], p3[1], p3[2], x, mask, img)
                return fake_B
            return body, img
        if stage == "netP":
            x = jnp.asarray(rng.uniform(-1, 1, (b, s, s, 3)), dt)
            pP = params["P"]

            def body(i, x):
                return models.P.apply({"params": pP}, x, train=False
                                      ).astype(dt)
            return body, x
        if stage == "netG":
            x = jnp.asarray(rng.uniform(-1, 1, (b, s, s, 6)), dt)
            ref_feat = jnp.asarray(rng.uniform(-1, 1, (b, fs, fs, 512)), dt)
            flag = jnp.zeros((b, fs * fs), jnp.float32
                             ).at[:, fs * fs // 3:2 * fs * fs // 3].set(1.0)
            pG = params["G"]

            def body(i, x):
                y, _ = models.G.apply({"params": pG}, x, ref_feat, flag,
                                      train=False)
                return jnp.concatenate([y, y], axis=-1).astype(dt)
            return body, x
        if stage == "vgg":
            x = jnp.asarray(rng.uniform(-1, 1, (b, s, s, 3)), dt)
            pv = params["vgg"]

            def body(i, x):
                f = apply_vgg16(pv, x)
                return x * (1.0 + f.relu4_3.mean().astype(dt) * 1e-30)
            return body, x
        if stage == "mask":
            mask = np.zeros((b, s, s), np.float32)
            q = s // 4
            mask[:, q:3 * q, q:3 * q] = 1.0
            mask = jnp.asarray(mask)

            def body(i, m):
                fmask, flag = prepare_masks(cfg, m)
                return m * (1.0 + flag.mean() * 1e-30)
            return body, mask
        raise ValueError(stage)

    for b in args.batch:
        body, x0 = build(args.stage, b)

        @partial(jax.jit, static_argnums=(1,))
        def chained(x, n):
            return jax.lax.fori_loop(0, n, body, x)

        t0 = time.time()
        np.asarray(chained(x0, args.iters))  # compile + warm
        compile_s = time.time() - t0
        per = []
        for _ in range(args.repeats):
            t = time.time()
            np.asarray(chained(x0, args.iters))
            per.append((time.time() - t) / args.iters)
        per.sort()
        med = per[len(per) // 2]
        print(f"[probe] stage={args.stage} b={b} dtype={args.dtype}: "
              f"{med * 1000:.2f} ms/iter = {med / b * 1000:.3f} ms/img "
              f"({b / med:.1f} img/s; compile {compile_s:.0f}s; "
              f"spread {(per[-1] - per[0]) / med * 100:.1f}%)",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
