"""torch -> jax weight importer for the reference's networks.

Lets a user of the reference bring their trained checkpoints
({epoch}_net_{G,P,D,F}.pt state_dicts, models/base_model.py:43-58) into
this framework.  Strategy: the reference builds each net as nested
`nn.Sequential`s whose pre-order module traversal visits the parametrized
layers (Conv2d / ConvTranspose2d / InstanceNorm2d) in execution order
(networks.py:395-452 for unet_256, :212-366 for unet_ipsr, :459-520 for
the discriminators); our flax modules execute the same layers in the same
order, so aligning the two ordered walks by layer kind + shape gives an
exact mapping without any name-level coupling.

Tensor layout conversions:
  Conv2d weight         [O,I,kh,kw] -> HWIO [kh,kw,I,O]
  ConvTranspose2d weight[I,O,kh,kw] -> [kh,kw,I,O] (forward orientation;
                         ops/convs.py flips spatially at apply time)
  InstanceNorm2d weight/bias -> scale/offset

Validated by end-to-end output-parity tests against the live reference
networks (tests/test_net_import.py).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import numpy as np

# (our param-name pair, torch class name) per layer kind
_KIND_BY_TORCH_CLASS = {
    "Conv2d": "conv",
    "ConvTranspose2d": "convT",
    "InstanceNorm2d": "norm",
    "BatchNorm2d": "norm",   # affine weight/bias -> scale/offset, same as
                             # instance; running buffers are mapped by
                             # torch_module_to_variables
}


def collect_torch_layers(module) -> List[Tuple[str, np.ndarray, np.ndarray]]:
    """Pre-order walk of a torch module -> [(kind, weight, bias)] in
    execution order (nn.Sequential children are visited in index order)."""
    out = []
    for m in module.modules():
        kind = _KIND_BY_TORCH_CLASS.get(type(m).__name__)
        if kind is None:
            continue
        if kind == "norm" and m.weight is None:
            continue  # affine=False InstanceNorm carries no params
        w = m.weight.detach().cpu().numpy() if m.weight is not None else None
        b = m.bias.detach().cpu().numpy() if m.bias is not None else None
        out.append((kind, w, b))
    return out


def _kind_of_flax_scope(scope: Dict[str, Any]) -> str:
    keys = set(scope.keys())
    if keys == {"scale", "offset"}:
        return "norm"
    if "kernel" in keys:
        return "conv-any"  # conv vs convT resolved by the torch side
    raise ValueError(f"unrecognized param scope: {sorted(keys)}")


# Execution-order priority of flax scope names (jax pytrees sort dict keys
# alphabetically, which does NOT match execution order — e.g. a
# discriminator runs conv1 before norm1 but 'norm1' sorts after 'conv3').
# Names that never co-occur may share an index.
_EXEC_ORDER = {
    # U-Net blocks (unet.py / unet_ipsr.py)
    "down_conv": 0, "down_dilconv": 0, "down_norm": 1, "down_conv3": 2,
    "down_norm3": 3, "submodule": 4, "model": 4,
    "up_conv3": 5, "up_norm3": 6, "up_conv": 7, "up_norm": 8,
    # discriminators (convN runs before normN runs before conv(N+1))
    "conv0": 0, "conv1": 2, "norm1": 3, "conv2": 4, "norm2": 5,
    "conv3": 6, "norm3": 7, "head": 10,
}


def _exec_sorted(names):
    try:
        return sorted(names, key=lambda n: (_EXEC_ORDER[n], n))
    except KeyError as e:
        raise ValueError(f"scope name {e} has no execution-order entry; "
                         f"extend _EXEC_ORDER in net_import.py") from e


def collect_flax_slots(params: Dict[str, Any], prefix=()) -> List[Tuple[Tuple[str, ...], str]]:
    """Execution-ordered walk of our param tree -> [(path, kind)].

    Scopes are visited in _EXEC_ORDER, which reproduces each network's
    __call__ execution order — the same order the torch pre-order module
    walk yields (validated by the output-parity tests)."""
    slots = []
    for name in _exec_sorted(params.keys()):
        sub = params[name]
        if isinstance(sub, dict) and any(isinstance(v, dict)
                                         for v in sub.values()):
            slots.extend(collect_flax_slots(sub, prefix + (name,)))
        elif isinstance(sub, dict):
            slots.append((prefix + (name,), _kind_of_flax_scope(sub)))
        else:
            raise ValueError(f"unexpected leaf at {prefix + (name,)}")
    return slots


def _convert(kind: str, w: np.ndarray, b, target_scope: Dict[str, Any]):
    if kind == "norm":
        assert set(target_scope) == {"scale", "offset"}, target_scope
        return {"scale": w.astype(np.float32),
                "offset": b.astype(np.float32)}
    # conv / convT
    if kind == "conv":
        kernel = w.transpose(2, 3, 1, 0)  # OIHW -> HWIO
    else:  # convT: torch [I,O,kh,kw] -> [kh,kw,I,O]
        kernel = w.transpose(2, 3, 0, 1)
    out = {"kernel": kernel.astype(np.float32)}
    if "bias" in target_scope:
        assert b is not None, "torch layer has no bias but target expects one"
        out["bias"] = b.astype(np.float32)
    return out


def torch_module_to_params(torch_module, params_template: Dict[str, Any]
                           ) -> Dict[str, Any]:
    """Map a live reference torch net onto our param-tree template."""
    layers = collect_torch_layers(torch_module)
    slots = collect_flax_slots(params_template)
    if len(layers) != len(slots):
        raise ValueError(
            f"layer count mismatch: torch has {len(layers)}, template has "
            f"{len(slots)} — architectures disagree")

    new_params = jax.tree_util.tree_map(lambda x: x, params_template)

    def set_path(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node[k]
        node[path[-1]] = value

    for (kind, w, b), (path, slot_kind) in zip(layers, slots):
        if (kind == "norm") != (slot_kind == "norm"):
            raise ValueError(f"kind mismatch at {path}: torch {kind} vs "
                             f"template {slot_kind}")
        node = new_params
        for k in path[:-1]:
            node = node[k]
        target_scope = node[path[-1]]
        converted = _convert(kind, w, b, target_scope)
        for pname, arr in converted.items():
            want = np.asarray(target_scope[pname]).shape
            if arr.shape != want:
                raise ValueError(
                    f"shape mismatch at {path + (pname,)}: torch {arr.shape} "
                    f"vs template {want}")
        set_path(new_params, path, converted)
    return new_params


def _collect_torch_bn_stats(module) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Pre-order walk -> [(running_mean, running_var)] of every BatchNorm2d
    (torch registers them as buffers, not parameters — base_model's
    state_dict .pt files persist them alongside the weights)."""
    out = []
    for m in module.modules():
        if type(m).__name__ == "BatchNorm2d" and m.running_mean is not None:
            out.append((m.running_mean.detach().cpu().numpy(),
                        m.running_var.detach().cpu().numpy()))
    return out


def _collect_stats_slots(stats_tree: Dict[str, Any], prefix=()
                         ) -> List[Tuple[str, ...]]:
    """Execution-ordered walk of a flax batch_stats tree -> [path] of each
    {'mean','var'} scope (same _EXEC_ORDER as the params walk, so the
    torch pre-order BN visit and this walk align one-to-one)."""
    slots = []
    for name in _exec_sorted(stats_tree.keys()):
        sub = stats_tree[name]
        if isinstance(sub, dict) and set(sub.keys()) == {"mean", "var"}:
            slots.append(prefix + (name,))
        elif isinstance(sub, dict):
            slots.extend(_collect_stats_slots(sub, prefix + (name,)))
        else:
            raise ValueError(f"unexpected leaf at {prefix + (name,)}")
    return slots


def torch_module_to_variables(torch_module, variables_template
                              ) -> Dict[str, Any]:
    """Map a live reference torch net onto a full flax variables dict.

    For norm='instance' templates (bare params trees) this is
    torch_module_to_params; for norm='batch' templates
    ({'params', 'batch_stats'}) the BatchNorm running buffers are mapped
    into the batch_stats collection as well."""
    if "batch_stats" not in variables_template:
        return torch_module_to_params(torch_module, variables_template)
    params = torch_module_to_params(torch_module,
                                    variables_template["params"])
    stats = jax.tree_util.tree_map(lambda x: x,
                                   variables_template["batch_stats"])
    bn = _collect_torch_bn_stats(torch_module)
    slots = _collect_stats_slots(stats)
    if len(bn) != len(slots):
        raise ValueError(
            f"BatchNorm count mismatch: torch has {len(bn)}, template has "
            f"{len(slots)} batch_stats scopes — architectures disagree")
    for (mean, var), path in zip(bn, slots):
        node = stats
        for k in path[:-1]:
            node = node[k]
        want = np.asarray(node[path[-1]]["mean"]).shape
        if mean.shape != want:
            raise ValueError(f"stats shape mismatch at {path}: torch "
                             f"{mean.shape} vs template {want}")
        node[path[-1]] = {"mean": mean.astype(np.float32),
                          "var": var.astype(np.float32)}
    return {"params": params, "batch_stats": stats}


def torch_state_dict_to_params(state_dict, builder, params_template):
    """Load a reference `{epoch}_net_X.pt` state_dict: `builder()` must
    construct the matching reference torch module (e.g. via define_G with
    the right flags), which is then populated and mapped."""
    module = builder()
    module.load_state_dict(state_dict)
    return torch_module_to_params(module, params_template)
