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
    tx = make_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params_G=params["G"], params_P=params["P"],
        params_D=params["D"], params_F=params["F"],
        opt_G=tx.init(params["G"]), opt_P=tx.init(params["P"]),
        opt_D=tx.init(params["D"]), opt_F=tx.init(params["F"]),
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
