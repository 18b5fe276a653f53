"""Honest train-step timing (full GAN step: D-then-G, four adam updates).

Same methodology as bench.py: dynamic-trip-count chained loop, long/short
differencing (tunnel overhead cancels), and every batch tensor perturbed
by a value-preserving function of the previous step's loss so XLA cannot
hoist the VGG/mask work across iterations.

Usage:
  python scripts/train_step_probe.py --batch 8 --size 256 --attn pallas
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
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--attn", default="pallas")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--remat_depth", type=int, default=3)
    ap.add_argument("--grad_accum", type=int, default=1)
    ap.add_argument("--norm", default="instance",
                    help="instance|batch (BN threads running stats through the step)")
    ap.add_argument("--mem", action="store_true",
                    help="also compile the bare (un-chained) step and print "
                         "memory_analysis() temp/argument/output bytes — "
                         "one extra jit variant (~4 min remote compile)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from deepinpainting_tpu.config import Config
    from deepinpainting_tpu.engine import create_state
    from deepinpainting_tpu.engine.inpaint import make_train_step

    cfg = Config(fine_size=args.size, batch_size=args.batch,
                 dtype=args.dtype, attention_impl=args.attn,
                 remat=args.remat, remat_depth=args.remat_depth,
                 grad_accum=args.grad_accum, norm=args.norm)
    state = create_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg)
    b, s = args.batch, args.size

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(-1, 1, (b, s, s, 3)), jnp.float32)
    ref = jnp.asarray(rng.uniform(-1, 1, (b, s, s, 3)), jnp.float32)
    mask = np.zeros((b, s, s), np.float32)
    q = s // 4
    mask[:, q:3 * q, q:3 * q] = 1.0
    mask = jnp.asarray(mask)

    @jax.jit
    def chained(state, img, mask, ref, key, n):
        def body(i, carry):
            st, sc, key = carry
            key, sub = jax.random.split(key)
            eps = 1.0 + sc * 1e-30   # rounds to exactly 1.0
            batch = {"image": img * eps, "mask": mask * eps, "ref": ref * eps}
            st, metrics = step(st, batch, sub)
            return st, metrics["loss"], key
        st, sc, _ = jax.lax.fori_loop(
            0, n, body, (state, jnp.float32(0), key))
        return sc

    key = jax.random.PRNGKey(1)

    if args.mem:
        batch = {"image": img, "mask": mask, "ref": ref}
        t0 = time.time()
        comp = jax.jit(step).lower(state, batch, key).compile()
        ma = comp.memory_analysis()
        gib = 1024 ** 3
        print(f"[train-probe] mem (b={b} size={s} dtype={args.dtype} "
              f"remat={args.remat}/{args.remat_depth} "
              f"accum={args.grad_accum}): "
              f"temp {ma.temp_size_in_bytes / gib:.2f} GiB, "
              f"args {ma.argument_size_in_bytes / gib:.2f} GiB, "
              f"out {ma.output_size_in_bytes / gib:.2f} GiB "
              f"(compile {time.time() - t0:.0f}s)",
              file=sys.stderr, flush=True)

    n, ns = args.iters, max(2, args.iters // 8)
    t0 = time.time()
    np.asarray(chained(state, img, mask, ref, key, n))
    print(f"[train-probe] compile+warm {time.time() - t0:.0f}s",
          file=sys.stderr, flush=True)
    per = []
    for _ in range(args.repeats):
        a = time.time()
        np.asarray(chained(state, img, mask, ref, key, ns))
        m = time.time()
        np.asarray(chained(state, img, mask, ref, key, ns + n))
        z = time.time()
        per.append(((z - m) - (m - a)) / n)
    per.sort()
    med = per[len(per) // 2]
    print(f"[train-probe] b={b} size={s} dtype={args.dtype} "
          f"attn={args.attn} remat={args.remat}/{args.remat_depth} "
          f"accum={args.grad_accum} norm={args.norm}: "
          f"{med * 1000:.2f} ms/step = "
          f"{b / med:.1f} img/s "
          f"(spread {(per[-1] - per[0]) / med * 100:.1f}%)",
          file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
