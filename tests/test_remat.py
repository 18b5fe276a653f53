"""Rematerialization (Config.remat): per-level jax.checkpoint on both
U-Nets must be semantically invisible — same losses, same updated params —
while bounding activation memory to O(largest level) for >=512px training.
(The reference has no memory story at all beyond torch's default autograd
caching; remat is a TPU-native capability, prompt: "use jax.checkpoint /
rematerialisation to trade FLOPs for memory".)
"""

import numpy as np
import jax
import pytest

from deepinpainting_tpu.config import Config
from deepinpainting_tpu.engine import create_state, make_train_step

TINY = Config(fine_size=64, ngf=8, ndf=8, batch_size=2, use_dropout=False,
              vgg_width_scale=1 / 8, mask_type="random")


def batch_of(n, seed):
    rng = np.random.default_rng(seed)
    img = rng.uniform(-1, 1, (n, 64, 64, 3)).astype(np.float32)
    ref = rng.uniform(-1, 1, (n, 64, 64, 3)).astype(np.float32)
    mask = np.zeros((n, 64, 64), np.float32)
    mask[:, 16:48, 20:44] = 1.0
    return {"image": img, "mask": mask, "ref": ref}


@pytest.mark.slow
def test_remat_train_step_matches_plain():
    # remat recomputes each level's forward during backward instead of
    # storing it — identical arithmetic, so params/metrics must agree.
    # Fusion differences can reorder reductions at ulp level, which the
    # updated-D + Adam-sign path amplifies discretely (see
    # test_parallel.py::test_dp_sp_train_step_matches_single), so the
    # post-D-update G_GAN and params get the structural Adam-bound checks.
    batch = batch_of(2, seed=3)
    plain_out, plain_m = jax.jit(make_train_step(TINY))(
        create_state(TINY, jax.random.PRNGKey(0)), batch,
        jax.random.PRNGKey(7))

    cfg_r = TINY.replace(remat=True)
    r_state = create_state(cfg_r, jax.random.PRNGKey(0))
    # remat is transparent to the param tree: same names, same init
    assert (jax.tree_util.tree_structure(r_state.params_G)
            == jax.tree_util.tree_structure(plain_out.params_G))
    r_out, r_m = jax.jit(make_train_step(cfg_r))(
        r_state, batch, jax.random.PRNGKey(7))

    for k in ("G_L1", "D", "F", "cosis"):
        if k in plain_m:
            np.testing.assert_allclose(float(r_m[k]), float(plain_m[k]),
                                       rtol=1e-4, err_msg=k)
    np.testing.assert_allclose(float(r_m["G_GAN"]), float(plain_m["G_GAN"]),
                               rtol=0.1, err_msg="G_GAN (updated-D path)")
    a = np.concatenate([np.asarray(x).ravel() for x in
                        jax.tree_util.tree_leaves(r_out.params_G)])
    b = np.concatenate([np.asarray(x).ravel() for x in
                        jax.tree_util.tree_leaves(plain_out.params_G)])
    assert np.abs(a - b).max() <= 2.2 * TINY.lr, "non-Adam-shaped divergence"
    assert np.isclose(a, b, rtol=1e-3, atol=1e-5).mean() > 0.95


@pytest.mark.slow
def test_remat_batch_norm_matches_plain():
    # norm='batch' composes with remat: the checkpointed levels' forwards
    # re-run during backward, but flax threads each level's batch_stats
    # mutation out of nn.remat once — the remat step's running stats and
    # losses must equal the plain step's.
    cfg = Config(fine_size=32, ngf=8, ndf=8, batch_size=2, norm="batch",
                 use_dropout=False, vgg_width_scale=1 / 8,
                 mask_type="random")
    batch = batch_of(2, seed=3)
    batch = {k: v[:, :32, :32] for k, v in batch.items()}
    plain_out, plain_m = jax.jit(make_train_step(cfg))(
        create_state(cfg, jax.random.PRNGKey(0)), batch,
        jax.random.PRNGKey(7))

    cfg_r = cfg.replace(remat=True)
    r_out, r_m = jax.jit(make_train_step(cfg_r))(
        create_state(cfg_r, jax.random.PRNGKey(0)), batch,
        jax.random.PRNGKey(7))

    for k in ("G_L1", "D", "F", "cosis"):
        np.testing.assert_allclose(float(r_m[k]), float(plain_m[k]),
                                   rtol=1e-4, err_msg=k)
    for net in ("params_G", "params_P", "params_D"):
        for (kp, a), (_, b) in zip(
                jax.tree_util.tree_flatten_with_path(
                    getattr(r_out, net)["batch_stats"])[0],
                jax.tree_util.tree_flatten_with_path(
                    getattr(plain_out, net)["batch_stats"])[0]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
                err_msg=f"{net}{jax.tree_util.keystr(kp)}")
