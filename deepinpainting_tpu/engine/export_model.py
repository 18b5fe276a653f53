"""AOT serving artifact (jax.export): trace once, deploy as data.

Beyond-reference capability.  The reference rebuilds the whole torch
model at server import time and re-reads per-net ``.pt`` files in every
process (``/root/reference/app.py:79-83``); here ``export_serving``
serializes the jitted uint8 serving function to portable StableHLO
(``jax.export``) next to the config and flat-``.npz`` weights, and
``load_serving`` reconstructs a ready callable from that directory with
NO model-construction code and NO re-tracing — only jax + numpy.
Use cases: shipping a serving container without the training stack,
pinning the exact lowered graph for reproducible deployments, and
multi-platform lowering (``platforms=["tpu", "cpu"]``) so one artifact
runs on either backend.

Artifact directory layout::

    serving.jaxexp    serialized jax.export.Exported (StableHLO)
    config.json       the Config the function was traced with
    params_G.npz / params_P.npz / vgg.npz
                      flat weights (engine.checkpoint.export_network_npz
                      key format — the same interop files the torch
                      converter reads/writes)

Portability note: the Pallas attention kernel lowers to a TPU custom
call, so artifacts traced with ``attention_impl='pallas'`` must be
exported on (and run on) TPU; use ``attention_impl='lax'`` in the config
for CPU-portable artifacts.  ``Config.quant='int8'`` is a trace-time
switch and exports like any other graph.
"""

from __future__ import annotations

import os
from types import SimpleNamespace
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..config import Config
from .checkpoint import export_network_npz
from .inpaint import make_serving_fn

FN_FILE = "serving.jaxexp"
CFG_FILE = "config.json"
NPZ_FILES = ("params_G.npz", "params_P.npz", "vgg.npz")


def export_serving(cfg: Config, state, out_dir: str,
                   platforms: Optional[Sequence[str]] = None) -> str:
    """Serialize the serving function + weights of `state` into `out_dir`.

    `platforms` follows jax.export semantics (e.g. ["tpu"], ["cpu"],
    or both); None lowers for the current default backend.  Returns
    `out_dir`.
    """
    cfg = cfg.replace(is_train=False, batch_size=1)
    s = cfg.fine_size
    fn = jax.jit(make_serving_fn(cfg))
    shapes = jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                          (state.params_G, state.params_P, state.vgg))
    u8img = jax.ShapeDtypeStruct((1, s, s, 3), jnp.uint8)
    u8mask = jax.ShapeDtypeStruct((1, s, s), jnp.uint8)
    exported = jax.export.export(fn, platforms=platforms)(
        *shapes, u8img, u8mask, u8img)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, FN_FILE), "wb") as f:
        f.write(exported.serialize())
    cfg.save(os.path.join(out_dir, CFG_FILE))
    for name, params in zip(NPZ_FILES,
                            (state.params_G, state.params_P, state.vgg)):
        export_network_npz(params, os.path.join(out_dir, name))
    return out_dir


def _unflatten_npz(path: str):
    """Rebuild the nested-dict param pytree from a flat npz.

    Inverse of export_network_npz without needing a template: every param
    tree in this framework is nested string-keyed dicts, and jax flattens
    dicts in sorted-key order, so the rebuilt tree flattens identically
    to the one the function was exported with.
    """
    raw = np.load(path)
    tree: dict = {}
    for name in raw.files:
        parts = name.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = raw[name]
    return tree


def load_serving(artifact_dir: str) -> SimpleNamespace:
    """Load an export_serving artifact into a ready-to-call session.

    Returns a namespace with `.cfg`, `.params_G/.params_P/.vgg` (numpy
    pytrees), `.exported` (the jax.export.Exported), and `.call` — a
    jitted callable with the make_serving_fn signature
    (params_G, params_P, vgg, image_u8, mask_u8, ref_u8) -> uint8.
    No model code runs: the graph comes from the serialized StableHLO.
    """
    fn_path = os.path.join(artifact_dir, FN_FILE)
    if not os.path.exists(fn_path):
        raise FileNotFoundError(
            f"no serving artifact at [{artifact_dir}] (missing {FN_FILE}); "
            "create one with export_serving / scripts/export.py")
    with open(fn_path, "rb") as f:
        exported = jax.export.deserialize(bytearray(f.read()))
    cfg = Config.load(os.path.join(artifact_dir, CFG_FILE))
    # Weights live on device from load time: jit does NOT cache numpy
    # argument transfers, so leaving these as host arrays would re-upload
    # the whole parameter set on every .call (catastrophic over a remote
    # tunnel; real PCIe traffic on a local host).  Per-request inputs stay
    # numpy — their transfer rides the one execute dispatch (serve/app.py).
    trees = jax.device_put([_unflatten_npz(os.path.join(artifact_dir, n))
                            for n in NPZ_FILES])
    return SimpleNamespace(cfg=cfg, params_G=trees[0], params_P=trees[1],
                           vgg=trees[2], exported=exported,
                           call=jax.jit(exported.call))
