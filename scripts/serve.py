#!/usr/bin/env python
"""Run the inpainting web demo.

CLI replacement for the reference's `python app.py` (app.py:171-172):
loads a checkpoint, jits inference once, and serves the mask-painting UI.

Example:
  python scripts/serve.py --checkpoints_dir checkpoints --which_epoch 46 \
      --host 127.0.0.1 --port 5000
"""

import argparse
import os
import sys
from wsgiref.simple_server import make_server

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoints_dir", default="checkpoints")
    ap.add_argument("--name", default="IPSR_inpainting")
    ap.add_argument("--which_epoch", type=int, default=None,
                    help="epoch checkpoint to serve (default 46, like "
                         "app.py:53; omit + --random_weights for a smoke run)")
    ap.add_argument("--random_weights", action="store_true",
                    help="serve randomly-initialized weights (no checkpoint)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=5000)
    ap.add_argument("--static_dir", default="")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from deepinpainting_tpu.config import Config
    from deepinpainting_tpu.serve import make_app

    cfg_path = os.path.join(args.checkpoints_dir, args.name, "config.json")
    if os.path.exists(cfg_path):
        cfg = Config.load(cfg_path)
    else:
        cfg = Config()
    cfg = cfg.replace(checkpoints_dir=args.checkpoints_dir, name=args.name)

    epoch = args.which_epoch
    if epoch is None and not args.random_weights:
        epoch = 46  # reference default, app.py:53
    print("compiling inference...", flush=True)
    app = make_app(cfg, epoch, args.static_dir or None)
    print(f"serving on http://{args.host}:{args.port}", flush=True)
    make_server(args.host, args.port, app).serve_forever()


if __name__ == "__main__":
    main()
