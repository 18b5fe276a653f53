"""Checkpoint / resume: one orbax checkpoint per epoch of the whole
TrainState pytree.

Replaces the reference's per-network `{epoch}_net_{G,P,D,F}.pt` files with
a cpu round-trip (models/base_model.py:43-64) and its partial `load` that
restores only G and P (models/IPSR.py:300-308).  Here the full state —
all four param trees, all four optimizer states, the step counter, and the
frozen VGG — is saved atomically, so resume (`opt.continue_train` /
`which_epoch`, models/IPSR.py:71-77) is exact.  Per-network .npz export is
kept for parity tooling and torch interop.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..config import Config


class CheckpointManager:
    def __init__(self, cfg: Config, directory: Optional[str] = None,
                 max_to_keep: Optional[int] = None,
                 async_save: bool = False):
        # {checkpoints_dir}/{name} layout, like base_model.py:12-16.
        directory = directory or os.path.join(cfg.checkpoints_dir, cfg.name)
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        # Training managers record config.json at construction so a run
        # that crashes before its first epoch save still leaves its config
        # for post-mortem reproduction (ADVICE r3) — but only when none
        # exists yet: a RESUME constructs the manager before the restore is
        # validated, and writing then would destroy the original run's
        # recorded config on a failed resume (typo'd epoch, wrong --ngf).
        # The first successful save still records what actually ran.
        # Restore-only managers (dip-evaluate / dip-serve / dip-export,
        # is_train=False) never write at all, so they can't clobber a
        # training run's config with their transient CLI overrides.
        # config.json is process-0's to write (multi-host runs share the
        # directory; orbax coordinates the checkpoint files themselves)
        self._cfg = cfg
        self._config_written = jax.process_index() != 0
        cfg_path = os.path.join(self.directory, "config.json")
        if cfg.is_train and not self._config_written \
                and not os.path.exists(cfg_path):
            cfg.save(cfg_path)
            self._config_written = True
        # async_save: orbax's save copies device->host synchronously (so
        # later donated-buffer reuse by the next train step is safe) and
        # only the serialization/disk write proceeds in the background;
        # save() then overlaps with the trainer's validation pass.  Reads
        # and close() synchronize first.
        self.async_save = async_save
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, epoch: int, state: Any) -> None:
        """model.save(epoch) parity (models/IPSR.py:300-304), all nets."""
        if not self._config_written:
            self._cfg.save(os.path.join(self.directory, "config.json"))
            self._config_written = True
        self._mgr.save(epoch, args=ocp.args.StandardSave(state))
        if not self.async_save:
            self._mgr.wait_until_finished()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def restore(self, epoch: int, state_template: Any) -> Any:
        """Restore the full TrainState; template supplies pytree structure,
        shapes and shardings (pass a freshly-initialized state)."""
        self._mgr.wait_until_finished()  # an in-flight save may be this epoch
        if epoch not in self._mgr.all_steps():
            raise FileNotFoundError(
                f"no checkpoint for epoch {epoch} under {self.directory}; "
                f"available: {sorted(self._mgr.all_steps())}")
        abstract = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, state_template)
        return self._mgr.restore(epoch,
                                 args=ocp.args.StandardRestore(abstract))

    def latest_epoch(self) -> Optional[int]:
        self._mgr.wait_until_finished()
        return self._mgr.latest_step()

    def all_epochs(self):
        self._mgr.wait_until_finished()
        return sorted(self._mgr.all_steps())

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()


def export_network_npz(params: Any, path: str) -> None:
    """Flatten one network's param pytree to a flat .npz keyed by path —
    the interop role of the reference's per-net state_dict .pt files."""
    flat = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in keypath)
        flat[name] = np.asarray(leaf)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)


def import_network_npz(params_template: Any, path: str) -> Any:
    """Inverse of export_network_npz onto a matching pytree structure."""
    raw = np.load(path)
    leaves_kp, treedef = jax.tree_util.tree_flatten_with_path(params_template)
    new_leaves = []
    for keypath, leaf in leaves_kp:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in keypath)
        arr = raw[name]
        assert arr.shape == leaf.shape, (name, arr.shape, leaf.shape)
        new_leaves.append(arr.astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
