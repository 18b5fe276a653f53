#!/usr/bin/env python
"""Train the two-stage inpainting model.

CLI replacement for the reference's train.ipynb: same option surface as
the notebook's Option class (cell 0), same epoch mechanics (cell 2), with
TPU-native additions (real batches, device-mesh data parallelism, bf16).

Example:
  python scripts/train.py --dataroot data/img --maskroot data/mask \
      --refroot data/ref --validroot data/val --validrefroot data/val_ref \
      --batch_size 8 --checkpoints_dir checkpoints
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from deepinpainting_tpu.config import Config  # noqa: E402


def add_config_flags(parser: argparse.ArgumentParser) -> None:
    """Every Config field becomes a --flag with its default."""
    for f in dataclasses.fields(Config):
        typ = f.type if callable(f.type) else type(f.default)
        if typ is bool or isinstance(f.default, bool):
            parser.add_argument(f"--{f.name}", type=lambda s: s.lower() in
                                ("1", "true", "yes"), default=f.default)
        else:
            parser.add_argument(f"--{f.name}", type=type(f.default),
                                default=f.default)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataroot", required=True, help="training images dir")
    ap.add_argument("--maskroot", required=True, help="mask png dir")
    ap.add_argument("--refroot", required=True, help="reference images dir")
    ap.add_argument("--validroot", default="", help="validation images dir")
    ap.add_argument("--validrefroot", default="", help="validation refs dir")
    ap.add_argument("--profile_dir", default="",
                    help="emit a jax.profiler trace here")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (debug)")
    add_config_flags(ap)
    args = ap.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    field_names = {f.name for f in dataclasses.fields(Config)}
    cfg = Config(**{k: v for k, v in vars(args).items() if k in field_names})

    from deepinpainting_tpu.data import InpaintDataset
    from deepinpainting_tpu.engine.trainer import Trainer

    train_ds = InpaintDataset(args.dataroot, args.maskroot, args.refroot,
                              cfg.fine_size, seed=cfg.seed)
    valid_ds = None
    if args.validroot:
        valid_ds = InpaintDataset(args.validroot, args.maskroot,
                                  args.validrefroot or args.refroot,
                                  cfg.fine_size, seed=cfg.seed + 1)
    print(f"train images: {len(train_ds)}"
          + (f", valid images: {len(valid_ds)}" if valid_ds else ""))

    trainer = Trainer(cfg, train_ds, valid_ds)
    trainer.fit(profile_dir=args.profile_dir or None)


if __name__ == "__main__":
    main()
