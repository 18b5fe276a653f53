"""Console entry points (dip-train / dip-evaluate / dip-serve).

The same argument surfaces as scripts/train.py, scripts/evaluate.py and
scripts/serve.py, importable when the package is installed.
"""

import argparse
import dataclasses
import os
import sys

from .config import Config


def add_config_flags(parser: argparse.ArgumentParser) -> None:
    """Every Config field becomes a --flag with its default."""
    for f in dataclasses.fields(Config):
        if isinstance(f.default, bool):
            parser.add_argument(f"--{f.name}", type=lambda s: s.lower() in
                                ("1", "true", "yes"), default=f.default)
        else:
            parser.add_argument(f"--{f.name}", type=type(f.default),
                                default=f.default)



def train(argv=None):
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
    ap.add_argument("--multihost", action="store_true",
                    help="pod-slice training: run this same command on "
                         "every host; jax.distributed.initialize() picks "
                         "up the cluster from the environment (or "
                         "--coordinator/--num_processes/--process_id). "
                         "Each process decodes only its rows of the "
                         "global batch; process 0 writes metrics/config; "
                         "checkpoint saves are collective")
    ap.add_argument("--coordinator", default="",
                    help="coordinator address host:port (multihost; "
                         "omit to autodetect from the environment)")
    ap.add_argument("--num_processes", type=int, default=0,
                    help="total process count (multihost autodetect if 0)")
    ap.add_argument("--process_id", type=int, default=-1,
                    help="this process's id (multihost autodetect if -1)")
    add_config_flags(ap)
    args = ap.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    if args.multihost:
        import jax
        # the trio is all-or-none: jax.distributed.initialize with a
        # partial set (e.g. --process_id without --coordinator) fails deep
        # inside JAX with an obscure error, so catch it at argparse level
        # (ADVICE r4)
        given = [bool(args.coordinator), args.num_processes > 0,
                 args.process_id >= 0]
        if any(given) and not all(given):
            ap.error(
                "--coordinator/--num_processes/--process_id must be given "
                "together (or all omitted, in which case "
                "jax.distributed.initialize autodetects the cluster from "
                "the environment)")
        kw = {}
        if args.coordinator:
            kw["coordinator_address"] = args.coordinator
        if args.num_processes:
            kw["num_processes"] = args.num_processes
        if args.process_id >= 0:
            kw["process_id"] = args.process_id
        if args.cpu:  # CPU pods need the gloo cross-process collectives
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(**kw)
        print(f"[deepinpainting] multihost: process "
              f"{jax.process_index()}/{jax.process_count()}, "
              f"{jax.local_device_count()} local device(s)")

    field_names = {f.name for f in dataclasses.fields(Config)}
    cfg = Config(**{k: v for k, v in vars(args).items() if k in field_names})

    from .data import InpaintDataset
    from .engine.trainer import Trainer

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



def evaluate(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataroot", required=True)
    ap.add_argument("--maskroot", required=True)
    ap.add_argument("--checkpoints_dir", default="checkpoints")
    ap.add_argument("--name", default="IPSR_inpainting")
    ap.add_argument("--which_epoch", type=int, required=True)
    ap.add_argument("--max_images", type=int, default=500)
    ap.add_argument("--batch_size", type=int, default=0,
                    help="override the checkpoint config's batch size")
    ap.add_argument("--vgg_weights", default="",
                    help="override the checkpoint config's vgg npz path "
                         "(e.g. when the converted file moved)")
    ap.add_argument("--save_dir", default="", help="dump 2x2 eval grids here")
    ap.add_argument("--quant", default="", choices=["", "none", "int8"],
                    help="override the checkpoint config's quant mode "
                         "(int8 = dynamic-int8 convs, ops/quant.py)")
    ap.add_argument("--faithful_known_replacement", default="",
                    choices=["", "true", "false"],
                    help="override the checkpoint config's known-position "
                         "replacement quirk (an inference-time behavior — "
                         "see Config.faithful_known_replacement); useful "
                         "for A/B-ing an existing checkpoint under both "
                         "modes")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    from .config import Config
    from .data.dataset import SelfRefDataset
    from .engine import create_state
    from .engine.checkpoint import CheckpointManager
    from .engine.evaluator import evaluate as run_eval

    cfg_path = os.path.join(args.checkpoints_dir, args.name, "config.json")
    cfg = Config.load(cfg_path).replace(
        checkpoints_dir=args.checkpoints_dir, name=args.name, is_train=False)
    if args.batch_size:
        cfg = cfg.replace(batch_size=args.batch_size)
    if args.vgg_weights:
        cfg = cfg.replace(vgg_weights=args.vgg_weights)
    if args.quant:
        cfg = cfg.replace(quant=args.quant)
    if args.faithful_known_replacement:
        cfg = cfg.replace(
            faithful_known_replacement=args.faithful_known_replacement == "true")

    mgr = CheckpointManager(cfg)
    state = mgr.restore(args.which_epoch,
                        create_state(cfg, jax.random.PRNGKey(0)))
    ds = SelfRefDataset(args.dataroot, args.maskroot, cfg.fine_size)
    print(f"test images: {len(ds)}")
    run_eval(cfg, state, ds, max_images=args.max_images,
             save_dir=args.save_dir or None)



def export(argv=None):
    """Export a checkpoint's serving function as an AOT artifact
    (engine/export_model.py): serialized StableHLO + config + npz weights.
    Loadable with load_serving / `dip-serve --from_export` with no model
    code and no tracing."""
    ap = argparse.ArgumentParser(description=export.__doc__)
    ap.add_argument("--checkpoints_dir", default="checkpoints")
    ap.add_argument("--name", default="IPSR_inpainting")
    ap.add_argument("--which_epoch", type=int, default=None,
                    help="epoch checkpoint to export (omit + "
                         "--random_weights for a smoke artifact)")
    ap.add_argument("--random_weights", action="store_true")
    ap.add_argument("--out", required=True, help="artifact directory")
    ap.add_argument("--platforms", default="",
                    help="comma-separated lowering platforms, e.g. "
                         "'tpu,cpu' (default: current backend)")
    ap.add_argument("--quant", default="", choices=["", "none", "int8"],
                    help="override the checkpoint config's quant mode")
    ap.add_argument("--attention_impl", default="",
                    choices=["", "pallas", "lax"],
                    help="override the checkpoint config's attention impl "
                         "(pallas embeds a TPU custom call; use lax for "
                         "CPU-portable artifacts — export_model.py)")
    ap.add_argument("--batches", default="",
                    help="comma-separated batch sizes to export as a fixed "
                         "set, e.g. '1,8' (default: a symbolic batch "
                         "dimension, one graph for any batch, falling back "
                         "to 1,8 when the graph can't lower symbolically)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    from .config import Config
    from .engine import create_state
    from .engine.checkpoint import CheckpointManager
    from .engine.export_model import export_serving

    cfg_path = os.path.join(args.checkpoints_dir, args.name, "config.json")
    if os.path.exists(cfg_path):
        cfg = Config.load(cfg_path)
    else:
        cfg = Config()
    cfg = cfg.replace(checkpoints_dir=args.checkpoints_dir, name=args.name,
                      is_train=False)
    if args.quant:
        cfg = cfg.replace(quant=args.quant)
    if args.attention_impl:
        cfg = cfg.replace(attention_impl=args.attention_impl)

    state = create_state(cfg, jax.random.PRNGKey(cfg.seed))
    if not args.random_weights:
        mgr = CheckpointManager(cfg)
        # 46 = the reference serving default (app.py:53), same as dip-serve
        # (`is None`, not truthiness: --which_epoch 0 is a valid epoch)
        epoch = 46 if args.which_epoch is None else args.which_epoch
        state = mgr.restore(epoch, state)
        mgr.close()
    platforms = [p for p in args.platforms.split(",") if p] or None
    batches = [int(b) for b in args.batches.split(",") if b] or None
    out = export_serving(cfg, state, args.out, platforms=platforms,
                         batch_sizes=batches)
    print(f"exported serving artifact -> {out}")


def serve(argv=None):
    from socketserver import ThreadingMixIn
    from wsgiref.simple_server import WSGIServer, make_server

    class ThreadingWSGIServer(ThreadingMixIn, WSGIServer):
        """Concurrent request handling — required for --max_batch > 1 to
        actually coalesce (wsgiref's default server is serial)."""
        daemon_threads = True

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
    ap.add_argument("--max_batch", type=int, default=1,
                    help="coalesce up to N concurrent requests into one "
                         "device call (serve/batcher.py); 1 disables")
    ap.add_argument("--batch_wait_ms", type=float, default=2.0,
                    help="max straggler wait when coalescing")
    ap.add_argument("--sp", action="store_true",
                    help="spatially partition each request's image over all "
                         "devices (parallel/spatial.py) — cuts batch-1 "
                         "latency on multi-chip hosts; no-op on one chip")
    ap.add_argument("--quant", default="", choices=["", "none", "int8"],
                    help="override the checkpoint config's quant mode "
                         "(int8 = dynamic-int8 convs, ops/quant.py)")
    ap.add_argument("--from_export", default="",
                    help="serve a pre-exported AOT artifact directory "
                         "(dip-export) instead of a checkpoint — no model "
                         "code, no tracing")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    if args.from_export and (args.quant or args.sp
                             or args.which_epoch is not None
                             or args.random_weights):
        # the artifact is a pre-traced graph; these knobs must be chosen
        # at `dip-export` time (see InferenceSession.from_export) —
        # silently ignoring them would mislead operators.  This includes
        # the explicit `--quant none` (deliberate, ADVICE r3): on an
        # artifact exported WITH int8 it would be a real trace-time
        # override we cannot honor, so every explicit value is rejected
        # uniformly rather than special-casing the one that happens to
        # match a float export.  --max_batch IS allowed: artifacts are
        # batch-polymorphic (export_model.py), so request coalescing
        # works on the exported graph too.
        ap.error("--from_export serves the artifact exactly as exported; "
                 "it cannot be combined with --quant/--sp/"
                 "--which_epoch/--random_weights (re-export with the "
                 "wanted options instead)")

    from .config import Config
    from .serve import make_app

    cfg_path = os.path.join(args.checkpoints_dir, args.name, "config.json")
    if os.path.exists(cfg_path):
        cfg = Config.load(cfg_path)
    else:
        cfg = Config()
    cfg = cfg.replace(checkpoints_dir=args.checkpoints_dir, name=args.name)
    if args.quant:
        cfg = cfg.replace(quant=args.quant)

    epoch = args.which_epoch
    if epoch is None and not args.random_weights:
        epoch = 46  # reference default, app.py:53
    print("compiling inference...", flush=True)
    app = make_app(cfg, epoch, args.static_dir or None,
                   max_batch=args.max_batch,
                   batch_wait_ms=args.batch_wait_ms, sp=args.sp,
                   from_export=args.from_export or None)
    print(f"serving on http://{args.host}:{args.port}"
          + (f" (coalescing up to {args.max_batch} requests)"
             if args.max_batch > 1 else ""), flush=True)
    make_server(args.host, args.port, app,
                server_class=ThreadingWSGIServer).serve_forever()


