"""Data-parallel training over the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepinpainting_tpu.config import Config
from deepinpainting_tpu import parallel as PP
from deepinpainting_tpu.engine import create_state, make_train_step

TINY = Config(fine_size=64, ngf=8, ndf=8, batch_size=8, use_dropout=False,
              vgg_width_scale=1 / 8, mask_type="random")


def batch_of(b, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.uniform(-1, 1, (b, 64, 64, 3)).astype(np.float32)
    ref = rng.uniform(-1, 1, (b, 64, 64, 3)).astype(np.float32)
    mask = np.zeros((b, 64, 64), np.float32)
    mask[:, 16:48, 20:44] = 1.0
    return {"image": jnp.asarray(img), "mask": jnp.asarray(mask),
            "ref": jnp.asarray(ref)}


def test_dp_step_runs_on_8_devices():
    mesh = PP.make_mesh()
    assert mesh.devices.size == 8
    state = create_state(TINY, jax.random.PRNGKey(0))
    state = PP.replicate_state(state, mesh)
    step = PP.make_dp_train_step(TINY, mesh)
    batch = PP.shard_batch(batch_of(8), mesh)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["G_L1"]))
    assert int(new_state.step) == 1


def test_process_local_data_path_matches():
    # The multi-host assembly (make_array_from_process_local_data) must
    # produce the same global sharded array as the single-process
    # device_put path; with process_count()==1 the "local" data is the
    # full batch, so the two are directly comparable.
    mesh = PP.make_mesh()
    batch = batch_of(8, seed=5)
    sh = PP.batch_sharding(mesh)
    via_put = PP.shard_batch(batch, mesh)
    via_local = {k: jax.make_array_from_process_local_data(sh, np.asarray(v))
                 for k, v in batch.items()}
    for k in batch:
        assert via_local[k].sharding == via_put[k].sharding, k
        np.testing.assert_array_equal(np.asarray(via_local[k]),
                                      np.asarray(via_put[k]))


def test_dp_matches_single_device_grad_semantics():
    # One DP step over 8 devices == the same jitted step on one device with
    # the same global batch (XLA all-reduce == global-batch mean).
    mesh = PP.make_mesh()
    state0 = create_state(TINY, jax.random.PRNGKey(0))
    batch = batch_of(8, seed=3)

    dp_state = PP.replicate_state(state0, mesh)
    dp_step = PP.make_dp_train_step(TINY, mesh)
    dp_out, dp_metrics = dp_step(dp_state, PP.shard_batch(batch, mesh),
                                 jax.random.PRNGKey(7))

    single = jax.jit(make_train_step(TINY))
    s_out, s_metrics = single(create_state(TINY, jax.random.PRNGKey(0)),
                              batch, jax.random.PRNGKey(7))
    np.testing.assert_allclose(float(dp_metrics["G_L1"]),
                               float(s_metrics["G_L1"]), rtol=2e-4)
    # Adam's first update is exactly +/-lr per element, so elements whose
    # gradient is ~0 flip sign under any FP jitter between the sharded and
    # unsharded compilations (e.g. different pallas chunking).  Require
    # near-total agreement rather than elementwise equality.
    a = np.concatenate([np.asarray(x).ravel() for x in
                        jax.tree_util.tree_leaves(dp_out.params_G)])
    b = np.concatenate([np.asarray(x).ravel() for x in
                        jax.tree_util.tree_leaves(s_out.params_G)])
    agree = np.isclose(a, b, rtol=1e-3, atol=1e-5).mean()
    assert agree > 0.995, f"only {agree:.4%} of params agree"
