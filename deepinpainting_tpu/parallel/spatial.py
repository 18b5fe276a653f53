"""Spatial partitioning (SP): shard the image height axis across chips.

DP (mesh.py) scales throughput but cannot reduce the latency of a single
image: with batch=1 every chip but one idles.  SP is the latency story —
the [B, H, W, C] activations are sharded over H across the mesh, so every
conv in both U-Nets runs on a 1/n-height slab per chip and XLA's SPMD
partitioner inserts the halo exchanges (collective-permutes of the
kernel-overlap rows, riding ICI) that a hand-written distributed conv
would need.  This is the "annotate shardings, let XLA insert collectives"
recipe (scaling-book); no model code changes.

The reference has no distributed support at all (SURVEY.md §2.4), and no
way to cut single-image latency other than a faster GPU; SP is a
TPU-native capability beyond reference parity.

What partitions how (verified against the compiled HLO on an 8-device
virtual mesh, tests/test_parallel.py::test_sp_inference_matches_single):

  * all convs / transposed convs / instance-norms: spatially partitioned
    with halo exchange; per-chip FLOPs drop ~n×.
  * instance-norm means and the mask mean-fill become cross-chip
    all-reduces over the H shards.
  * the IPSR attention level and the VGG16 ref-feature extraction operate
    on global [B, h, w, C] grids (h = fine_size/8): the partitioner
    all-gathers their operands and re-shards after — at ngf*4 the gathered
    tensor is small (32×32×512 bf16 = 1 MiB at 256px), so the gather is
    cheap relative to the conv savings at full resolution.

SP composes with DP on a 2-D mesh ("data", "sp"): batch over "data",
height over "sp" — `make_dp_sp_train_step` shards both, which is how a
pod slice would train at 512px+ where per-chip HBM can't hold the b8
activations.  Gradients of the halo-exchanged convs partition the same
way in reverse (XLA derives the transposed collectives).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from .. import engine as E
from ..ops.convs import sp_hint_mode
from .mesh import replicated


def make_sp_mesh(devices: Optional[Sequence[jax.Device]] = None,
                 axis: str = "sp") -> Mesh:
    """1-D mesh over all chips with the spatial axis name."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def make_dp_sp_mesh(n_data: int, n_sp: int,
                    devices: Optional[Sequence[jax.Device]] = None,
                    axes: Sequence[str] = ("data", "sp")) -> Mesh:
    """2-D mesh: batch parallelism × spatial parallelism.

    `n_sp` should map to the fastest ICI dimension (halo exchanges are
    nearest-neighbor and happen at every conv); "data" gradients
    all-reduce once per step and tolerate the slower dimension.
    """
    devices = list(devices) if devices is not None else jax.devices()
    assert len(devices) >= n_data * n_sp, (
        f"need {n_data * n_sp} devices, have {len(devices)}")
    grid = np.asarray(devices[: n_data * n_sp]).reshape(n_data, n_sp)
    return Mesh(grid, tuple(axes))


def spatial_sharding(mesh: Mesh, axis: str = "sp",
                     data_axis: Optional[str] = None) -> NamedSharding:
    """[B, H, W, ...] sharding: H over `axis`, optionally B over `data_axis`."""
    return NamedSharding(mesh, P(data_axis, axis))


def make_sp_inference_fn(cfg: Config, mesh: Mesh, axis: str = "sp"):
    """Latency-oriented inference: one image's rows spread over the mesh.

    Returns a jitted (params_G, params_P, vgg, gt, mask, ref) ->
    (fake_B, fake_P) with gt/mask/ref H-sharded and parameters replicated.
    The mask/image specs only name leading axes, so they apply to both
    [B,H,W,C] images and [B,H,W] masks.  Outputs stay H-sharded; a host
    fetch assembles them (one extra gather only if the caller re-shards).
    """
    infer = E.make_inference_fn(cfg)
    rep = replicated(mesh)
    sp = spatial_sharding(mesh, axis)

    def hinted(*args):
        # sp_hint_mode is live whenever XLA traces the body, so the U-Net
        # blocks pin their unshardable-height bottleneck activations to an
        # explicit sharding instead of GSPMD's warned involuntary reshard.
        with sp_hint_mode(mesh, axis):
            return infer(*args)

    return jax.jit(hinted,
                   in_shardings=(rep, rep, rep, sp, sp, sp),
                   out_shardings=(sp, sp))


def make_dp_sp_train_step(cfg: Config, mesh: Mesh,
                          data_axis: str = "data", sp_axis: str = "sp"):
    """Train step on a 2-D mesh: batch over `data_axis`, H over `sp_axis`.

    Params/opt replicated; per-batch loss means become all-reduces over
    both axes (the DDP gradient all-reduce role, played by XLA collectives
    over ICI).  Backward halo exchanges for the spatially-sharded convs
    are derived by XLA from the forward shardings.
    """
    step = E.make_train_step(cfg)
    rep = replicated(mesh)
    bsh = spatial_sharding(mesh, sp_axis, data_axis)

    def hinted(*args):
        with sp_hint_mode(mesh, sp_axis, data_axis):
            return step(*args)

    return jax.jit(
        hinted,
        in_shardings=(rep, {"image": bsh, "mask": bsh, "ref": bsh}, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def make_dp_sp_eval_step(cfg: Config, mesh: Mesh,
                         data_axis: str = "data", sp_axis: str = "sp"):
    """Eval step on the 2-D mesh (mirror of mesh.make_dp_eval_step)."""
    step = E.make_eval_step(cfg)
    rep = replicated(mesh)
    bsh = spatial_sharding(mesh, sp_axis, data_axis)

    def hinted(*args):
        with sp_hint_mode(mesh, sp_axis, data_axis):
            return step(*args)

    return jax.jit(
        hinted,
        in_shardings=(rep, {"image": bsh, "mask": bsh, "ref": bsh}),
    )


def place_spatial(batch: Dict[str, Any], mesh: Mesh, axis: str = "sp",
                  data_axis: Optional[str] = None) -> Dict[str, Any]:
    """One device_put of the whole pytree with H (and optionally B) sharded."""
    return jax.device_put(batch, spatial_sharding(mesh, axis, data_axis))
