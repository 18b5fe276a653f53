#!/usr/bin/env python
"""Train the two-stage inpainting model (see deepinpainting_tpu/_cli.py).

CLI replacement for the reference's train.ipynb: same option surface as
the notebook's Option class (cell 0), same epoch mechanics (cell 2), with
TPU-native additions (real batches, device-mesh data parallelism, bf16).

Example:
  python scripts/train.py --dataroot data/img --maskroot data/mask \
      --refroot data/ref --validroot data/val --validrefroot data/val_ref \
      --batch_size 8 --checkpoints_dir checkpoints
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from deepinpainting_tpu._cli import train  # noqa: E402

if __name__ == "__main__":
    train()
