"""Training state: one pytree holding all four networks + optimizers.

Replaces the reference's four torch optimizers + scheduler lists
(models/IPSR.py:86-102) and its per-network .pt checkpoint files
(models/base_model.py:43-64) with a single functional TrainState that
orbax checkpoints atomically (SURVEY.md §5 checkpoint/resume row).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..config import Config


def has_stats(v: Any) -> bool:
    """True when a network's state entry is a full flax variables dict
    ({'params', 'batch_stats'}, norm='batch') rather than a bare params
    tree.  Bare trees are keyed by submodule names, which never collide
    with flax's reserved collection names."""
    return isinstance(v, dict) and "batch_stats" in v


def variables_of(v: Any) -> dict:
    """Wrap a state entry into the flax `apply` variables dict."""
    return dict(v) if has_stats(v) else {"params": v}


def params_of(v: Any) -> Any:
    """The trainable params subtree of a state entry (what the optimizer
    sees; running stats are not optimized — torch registers them as
    buffers, not parameters)."""
    return v["params"] if has_stats(v) else v


def rebuild_vars(old: Any, new_params: Any, mutated=None) -> Any:
    """Reassemble a state entry from updated params + (optionally) the
    mutated collections an apply returned.  Bare entries pass through."""
    if not has_stats(old):
        return new_params
    stats = old["batch_stats"]
    if mutated and "batch_stats" in mutated:
        stats = mutated["batch_stats"]
    return {"params": new_params, "batch_stats": stats}


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Adam(lr, betas=(beta1, 0.999)) — models/IPSR.py:89-96 — with the
    learning rate injected as a mutable hyperparam so epoch-level schedules
    (networks.py:32-46) update it without rebuilding the optimizer."""
    return optax.inject_hyperparams(optax.adam)(
        learning_rate=cfg.lr, b1=cfg.beta1, b2=0.999, eps=1e-8)


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params_G: Any
    params_P: Any
    params_D: Any
    params_F: Any
    opt_G: Any
    opt_P: Any
    opt_D: Any
    opt_F: Any
    vgg: Any  # frozen feature-extractor params


def create_train_state(cfg: Config, params: Dict[str, Any]) -> TrainState:
    # With norm='batch' the G/P/D entries are full variables dicts; the
    # optimizer state covers only their params subtree (running stats are
    # assigned by the train step, never stepped).
    tx = make_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params_G=params["G"], params_P=params["P"],
        params_D=params["D"], params_F=params["F"],
        opt_G=tx.init(params_of(params["G"])),
        opt_P=tx.init(params_of(params["P"])),
        opt_D=tx.init(params_of(params["D"])),
        opt_F=tx.init(params_of(params["F"])),
        vgg=params["vgg"],
    )


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Set the lr hyperparam on all four optimizer states (the reference
    steps all four schedulers together, models/base_model.py:66-70)."""
    def set_one(opt_state):
        hp = dict(opt_state.hyperparams)
        hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
        return opt_state._replace(hyperparams=hp)
    return state.replace(opt_G=set_one(state.opt_G), opt_P=set_one(state.opt_P),
                         opt_D=set_one(state.opt_D), opt_F=set_one(state.opt_F))


def current_learning_rate(state: TrainState) -> float:
    return float(state.opt_G.hyperparams["learning_rate"])
