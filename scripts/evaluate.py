#!/usr/bin/env python
"""Evaluate a trained checkpoint: PSNR/SSIM over a test set
(see deepinpainting_tpu/_cli.py).

CLI replacement for the reference's test.ipynb (cells 2-3): loads an epoch
checkpoint, runs the two-stage model with ref = the image itself, reports
per-image and average PSNR/SSIM (PSNR = 10*log10(4/MSE) on [-1,1]).

Example:
  python scripts/evaluate.py --dataroot data/test --maskroot data/mask \
      --checkpoints_dir checkpoints --which_epoch 60 --max_images 500
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from deepinpainting_tpu._cli import evaluate  # noqa: E402

if __name__ == "__main__":
    evaluate()
