"""Trainer wall-clock probe: ms/step of the REAL Trainer.train_epoch loop.

This measures the full host path — loader workers, uint8 transport,
host->device placement (overlapped in the prefetch thread since
data/iterator.py::device_batches), step dispatch, windowed metrics fetch —
not just the device step (scripts/train_step_probe.py measures that).
Epoch 1 pays the compile; epochs 2+ are timed.  The BENCH_NOTES.md round-3
"trainer wall-clock" table rows come from this probe.

Usage:
  python scripts/wall_probe.py --size 256 --batch 8 [--epochs 3]
         [--metrics_every 10] [--cpu] [--data /tmp/synth_wall]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n_images", type=int, default=304)
    ap.add_argument("--epochs", type=int, default=3,
                    help="total epochs run; epoch 1 (compile) is untimed")
    ap.add_argument("--metrics_every", type=int, default=10)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--data", default="/tmp/synth_wall")
    ap.add_argument("--out", default="/tmp/wall_probe_out")
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    img_dir = os.path.join(args.data, "img")
    if not os.path.isdir(img_dir) or \
            len(os.listdir(img_dir)) < args.n_images:
        import subprocess
        subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(__file__), "make_synth_data.py"),
             "--out", args.data, "--n", str(args.n_images),
             "--size", str(args.size)],
            check=True)

    import jax
    from deepinpainting_tpu.config import Config
    from deepinpainting_tpu.data.dataset import SelfRefDataset
    from deepinpainting_tpu.engine.trainer import Trainer

    cfg = Config(fine_size=args.size, batch_size=args.batch,
                 dtype=args.dtype, metrics_every=args.metrics_every,
                 display_freq=0, data_workers=args.workers,
                 checkpoints_dir=args.out, name="wall_probe")
    ds = SelfRefDataset(img_dir, os.path.join(args.data, "mask"),
                        fine_size=args.size)
    tr = Trainer(cfg, ds, out_dir=os.path.join(args.out, "run"))
    state = tr.init_state()
    rng = jax.random.PRNGKey(0)
    total = 0
    steps_per_epoch = len(ds) // args.batch
    for ep in range(1, args.epochs + 1):
        rng, sub = jax.random.split(rng)
        t0 = time.time()
        state, loss, total = tr.train_epoch(state, ep, sub, total)
        jax.block_until_ready(state.params_G)
        dt = time.time() - t0
        tag = "compile epoch" if ep == 1 else "timed"
        print(f"[wall] epoch {ep}: {dt:.1f} s, {steps_per_epoch} steps, "
              f"{dt / steps_per_epoch * 1e3:.0f} ms/step  ({tag}, "
              f"loss {loss:.3f})", flush=True)
    tr.logger.close()


if __name__ == "__main__":
    main()
