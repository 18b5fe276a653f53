"""Parameter accounting — the role of print_network (networks.py:122-127).

The reference prints each network's total parameter count at construction
("Total number of parameters: %d"); these helpers do the same for param
pytrees, and summarize a whole TrainState.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def count_params(params: Any) -> int:
    return int(sum(np.prod(np.asarray(leaf).shape)
                   for leaf in jax.tree_util.tree_leaves(params)))


def print_network(params: Any, name: str = "net") -> int:
    """networks.py:122-127 parity (per-network total)."""
    n = count_params(params)
    print(f"[{name}] Total number of parameters: {n}")
    return n


def summarize_state(state) -> dict:
    """Param counts for all four networks + frozen VGG of a TrainState."""
    out = {}
    for net in ("G", "P", "D", "F"):
        out[net] = count_params(getattr(state, f"params_{net}"))
    out["vgg"] = count_params(state.vgg)
    return out
