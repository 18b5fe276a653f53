#!/usr/bin/env python
"""Evaluate a trained checkpoint: PSNR/SSIM over a test set.

CLI replacement for the reference's test.ipynb (cells 2-3): loads an epoch
checkpoint, runs the two-stage model with ref = the image itself, reports
per-image and average PSNR/SSIM (PSNR = 10*log10(4/MSE) on [-1,1]).

Example:
  python scripts/evaluate.py --dataroot data/test --maskroot data/mask \
      --checkpoints_dir checkpoints --which_epoch 60 --max_images 500
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataroot", required=True)
    ap.add_argument("--maskroot", required=True)
    ap.add_argument("--checkpoints_dir", default="checkpoints")
    ap.add_argument("--name", default="IPSR_inpainting")
    ap.add_argument("--which_epoch", type=int, required=True)
    ap.add_argument("--max_images", type=int, default=500)
    ap.add_argument("--batch_size", type=int, default=0,
                    help="override the checkpoint config's batch size")
    ap.add_argument("--save_dir", default="", help="dump 2x2 eval grids here")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    from deepinpainting_tpu.config import Config
    from deepinpainting_tpu.data.dataset import SelfRefDataset
    from deepinpainting_tpu.engine import create_state
    from deepinpainting_tpu.engine.checkpoint import CheckpointManager
    from deepinpainting_tpu.engine.evaluator import evaluate

    cfg_path = os.path.join(args.checkpoints_dir, args.name, "config.json")
    cfg = Config.load(cfg_path).replace(
        checkpoints_dir=args.checkpoints_dir, name=args.name, is_train=False)
    if args.batch_size:
        cfg = cfg.replace(batch_size=args.batch_size)

    mgr = CheckpointManager(cfg)
    state = mgr.restore(args.which_epoch,
                        create_state(cfg, jax.random.PRNGKey(0)))
    ds = SelfRefDataset(args.dataroot, args.maskroot, cfg.fine_size)
    print(f"test images: {len(ds)}")
    evaluate(cfg, state, ds, max_images=args.max_images,
             save_dir=args.save_dir or None)


if __name__ == "__main__":
    main()
