#!/usr/bin/env python
"""Export a checkpoint's serving function as an AOT deployment artifact
(see deepinpainting_tpu/_cli.py and engine/export_model.py).

The artifact directory holds the serialized StableHLO serving graph
(jax.export), the config, and flat .npz weights; `dip-serve
--from_export DIR` (or engine.export_model.load_serving) runs it with no
model-construction code and no tracing.

Example:
  python scripts/export.py --checkpoints_dir checkpoints --name run1 \
      --which_epoch 60 --out artifacts/serving_v1
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from deepinpainting_tpu._cli import export  # noqa: E402

if __name__ == "__main__":
    export()
