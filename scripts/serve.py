#!/usr/bin/env python
"""Run the inpainting web demo (see deepinpainting_tpu/_cli.py).

CLI replacement for the reference's `python app.py` (app.py:171-172):
loads a checkpoint, jits inference once, and serves the mask-painting UI.

Example:
  python scripts/serve.py --checkpoints_dir checkpoints --which_epoch 46 \
      --host 127.0.0.1 --port 5000
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from deepinpainting_tpu._cli import serve  # noqa: E402

if __name__ == "__main__":
    serve()
