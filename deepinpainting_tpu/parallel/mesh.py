"""Device-mesh data parallelism.

The reference has no distributed support at all (SURVEY.md §2.4: single
process, single GPU, batchSize=1, no torch.distributed/NCCL anywhere);
multi-chip DP is a new first-class capability here.

Design (scaling-book recipe): a 1-D mesh over all chips with axis
`cfg.data_axis`; the batch is sharded over that axis, parameters and
optimizer state are replicated, and the train step is `jit`-ed with those
shardings — XLA inserts the gradient all-reduces (they ride ICI).  The
models are <100M params (SURVEY.md §2.4), so TP/PP/EP would only add
latency; DP is the whole story at this scale, with batch>1 per chip coming
from the vmap-batched attention kernel.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from .. import engine as E


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis: str = "data") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def data_axis_size(mesh: Mesh, axis: str = "data") -> int:
    return dict(mesh.shape).get(axis, 1)


def check_batch_divisible(batch_size: int, mesh: Mesh,
                          axis: str = "data") -> None:
    """Fail fast with a readable sentence instead of device_put's raw
    ValueError deep inside the prefetch thread when the batch can't split
    evenly over the mesh's data axis."""
    n = data_axis_size(mesh, axis)
    if batch_size % n:
        raise ValueError(
            f"batch_size={batch_size} is not divisible by the mesh's "
            f"'{axis}' axis of {n} device(s); change batch_size, or pass a "
            f"mesh whose data axis divides it (make_mesh_for_batch shrinks "
            f"one automatically)")


def make_mesh_for_batch(batch_size: int, axis: str = "data",
                        devices: Optional[Sequence[jax.Device]] = None
                        ) -> Mesh:
    """1-D data mesh auto-shrunk to gcd(batch, devices).

    The default Config has batch_size=1: on a multi-chip host a naive
    all-devices mesh would make every device_put fail, so the default
    Trainer/evaluate mesh uses the largest device count that divides the
    batch and says so when devices are left out.
    """
    devices = list(devices) if devices is not None else jax.devices()
    import math
    n = math.gcd(max(1, batch_size), len(devices))
    if n != len(devices):
        print(f"[deepinpainting] batch_size={batch_size} not divisible by "
              f"{len(devices)} devices; data-parallel over {n} device(s)")
    return make_mesh(devices[:n], axis)


def _check_sp_rows_process_local(mesh: Mesh, data_axis: str = "data") -> None:
    """Multi-host + SP precondition: one batch shard's H slabs on one host.

    `jax.make_array_from_process_local_data` is fed full-height local rows,
    which is only consistent when, for every index along the data axis, all
    the devices of that mesh row (its "sp" slabs) belong to a single
    process.  A mesh that spreads one image's H slabs across hosts would
    also route every conv halo exchange over DCN — refuse it readably.
    """
    grid = mesh.devices  # ndarray shaped like mesh.axis_names
    names = list(mesh.axis_names)
    if data_axis not in names:
        raise NotImplementedError(
            "multi-host + pure spatial partitioning (no data axis) would "
            "shard one image's height across hosts (conv halos over DCN); "
            "use a 2-D (data x sp) mesh with the sp axis inside each host")
    d = names.index(data_axis)
    moved = np.moveaxis(grid, d, 0)
    for i in range(moved.shape[0]):
        procs = {dev.process_index
                 for dev in np.atleast_1d(moved[i]).ravel()}
        if len(procs) > 1:
            raise ValueError(
                f"multi-host + SP needs each data-axis row on one process; "
                f"row {i} spans processes {sorted(procs)}.  Lay the mesh out "
                f"process-major (make_dp_sp_mesh over jax.devices() does)")


def _assemble_multihost_sp(batch: Dict[str, Any], mesh: Mesh,
                           sharding: NamedSharding, data_axis: str = "data"
                           ) -> Dict[str, Any]:
    """Multi-host DP x SP: global H-sharded arrays from full-height local rows.

    The canonical pod topology (MIGRATION.md non-goals): the data axis
    spans hosts, the sp axis stays host-local, so every conv halo exchange
    rides intra-host ICI and never DCN.  Each process loads only its
    contiguous rows of the global batch AT FULL HEIGHT; the H split onto
    that process's own devices ("cutting the H-shards on-process") is done
    here by `jax.make_array_from_process_local_data`, which slices the
    local rows per the sharding's device->index map.  Verified by
    tests/test_multihost.py (2 processes x 2 local devices on a
    (2 data x 2 sp) mesh).
    """
    _check_sp_rows_process_local(mesh, data_axis)
    return {k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
            for k, v in batch.items()}


def process_batch_rows(mesh: Mesh, batch_size: int,
                       axis: str = "data") -> tuple:
    """[lo, hi) rows of the global batch held by THIS process's devices.

    Multi-host training (`dip-train --multihost`): every process walks the
    identical seed-driven epoch stream but decodes only these rows; the
    sharded global batch is then assembled by `shard_batch`.  Derived from
    the mesh's device->process map, so it is correct for any process-major
    layout and fails loudly on interleaved ones.
    """
    names = list(mesh.axis_names)
    if axis not in names:
        return 0, batch_size  # batch axis unsharded: every process loads all
    n = dict(mesh.shape)[axis]
    check_batch_divisible(batch_size, mesh, axis)
    per = batch_size // n
    me = jax.process_index()
    moved = np.moveaxis(mesh.devices, names.index(axis), 0)
    mine = [i for i in range(n)
            if any(d.process_index == me
                   for d in np.atleast_1d(moved[i]).ravel())]
    if not mine:
        # Reachable from a plain `dip-train --multihost` whenever the
        # auto-shrunk mesh (make_mesh_for_batch's gcd, or the sp branch's
        # n_data gcd) drops whole hosts — and a mesh excluding an entire
        # process couldn't run the collective step anyway.  Fail with the
        # actionable sentence instead of handing (0, 0) to BatchIterator's
        # rows validation (ADVICE r4).
        raise ValueError(
            f"process {me}'s devices hold no rows of the '{axis}' axis: "
            f"multi-host training requires every process's devices in the "
            f"mesh, but batch_size={batch_size} over {n} data-parallel "
            f"group(s) left this process out (typically the mesh was "
            f"auto-shrunk because batch_size is not divisible by the "
            f"global device count — raise batch_size or shrink the slice)")
    if mine != list(range(mine[0], mine[-1] + 1)):
        raise ValueError(
            f"process {me} holds non-contiguous data rows {mine}; lay the "
            f"mesh out process-major (make_mesh/make_dp_sp_mesh over "
            f"jax.devices() do)")
    # a data row split across processes (each holding part of its sp slabs)
    # is rejected by _check_sp_rows_process_local at placement time
    return mine[0] * per, (mine[-1] + 1) * per


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh,
                axis: str = "data") -> Dict[str, Any]:
    """Place a host batch with the leading axis split across the mesh.

    Multi-host (pod-slice) DP: every process loads only its own slice of
    the global batch, and `jax.make_array_from_process_local_data`
    assembles the global sharded array from the per-process locals
    (SURVEY.md §5 distributed row).  Single-process keeps the direct
    device_put, which produces an identical global array (asserted by
    tests/test_parallel.py::test_process_local_data_path_matches).
    """
    if "sp" in mesh.axis_names:
        # 2-D (data x sp) training mesh (parallel/spatial.py): the image
        # height is sharded too.
        from .spatial import spatial_sharding
        sh = spatial_sharding(mesh, "sp", axis if axis in mesh.axis_names else None)
        if jax.process_count() > 1:
            return _assemble_multihost_sp(batch, mesh, sh, axis)
        return jax.device_put(batch, sh)
    sh = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        return {k: jax.make_array_from_process_local_data(sh, np.asarray(v))
                for k, v in batch.items()}
    # single-process: the local batch IS the global batch — fail readably
    # before device_put does so obscurely (VERDICT r3 weak #2)
    check_batch_divisible(next(iter(batch.values())).shape[0], mesh, axis)
    # one device_put of the whole pytree (the spec only names the leading
    # axis, so it applies to every leaf rank): a single host->device
    # dispatch instead of one per tensor — the per-call overhead is ~32 ms
    # over a remote-TPU tunnel (BENCH_NOTES.md round 2)
    return jax.device_put(batch, sh)


def replicate_state(state, mesh: Mesh):
    """Replicate a host-local state pytree onto every device of `mesh`.

    Multi-host: leaves restored from a checkpoint are jax.Arrays
    COMMITTED to this process's devices (orbax restores into a local
    sharding), and `device_put` of a committed array onto a multi-host
    sharding demands a DCN cross-host transfer the CPU/TPU backends here
    refuse (`jax_cross_host_transfer_socket_address`).  No transfer is
    actually needed — every process restored the identical full value —
    so drop committed leaves to host numpy first; `device_put` of a host
    buffer onto a replicated sharding just uploads each process's local
    copy.  (Fresh `create_state` leaves are *uncommitted* and never hit
    this; exercised by tests/test_multihost.py's collective-resume leg.)
    """
    if jax.process_count() > 1:
        state = jax.tree_util.tree_map(
            lambda x: np.asarray(x) if isinstance(x, jax.Array) else x,
            state)
    return jax.device_put(state, replicated(mesh))


def make_dp_train_step(cfg: Config, mesh: Mesh):
    """Data-parallel train step: params/opt replicated, batch sharded.

    The per-batch mean reductions inside the losses become cross-chip
    all-reduces under SPMD partitioning — the role NCCL gradient all-reduce
    plays in torch DDP, played here by XLA collectives over ICI.
    """
    step = E.make_train_step(cfg)
    rep = replicated(mesh)
    bsh = batch_sharding(mesh, cfg.data_axis)
    return jax.jit(
        step,
        in_shardings=(rep, {"image": bsh, "mask": bsh, "ref": bsh}, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def make_dp_eval_step(cfg: Config, mesh: Mesh):
    step = E.make_eval_step(cfg)
    rep = replicated(mesh)
    bsh = batch_sharding(mesh, cfg.data_axis)
    return jax.jit(
        step,
        in_shardings=(rep, {"image": bsh, "mask": bsh, "ref": bsh}),
    )
