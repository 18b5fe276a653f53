"""End-to-end trainer/evaluator tests on a miniature config (CPU).

Covers the reference's train driver mechanics (train.ipynb cell 2): epoch
loop, validation, early stopping, per-epoch checkpointing, lr schedule
step, visual dumps — and the eval harness (test.ipynb cell 3).
"""

import os

import jax
import numpy as np
import pytest
from PIL import Image

from deepinpainting_tpu.config import Config
from deepinpainting_tpu.data import InpaintDataset
from deepinpainting_tpu.data.dataset import SelfRefDataset
from deepinpainting_tpu.engine.evaluator import evaluate
from deepinpainting_tpu.engine.schedules import lr_for_epoch
from deepinpainting_tpu.engine.state import current_learning_rate
from deepinpainting_tpu.engine.trainer import Trainer
from deepinpainting_tpu.parallel import mesh as pmesh

S = 32


@pytest.fixture(scope="module")
def data_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("tdata")
    rng = np.random.default_rng(0)
    out = {}
    for name, n in [("img", 4), ("ref", 4), ("mask", 2), ("val", 2)]:
        d = root / name
        d.mkdir()
        for i in range(n):
            if name == "mask":
                a = np.zeros((S, S, 3), np.uint8)
                a[8:24, 8:24] = 255
                Image.fromarray(a).save(d / f"m{i}.png")
            else:
                a = rng.integers(0, 255, (S, S, 3), dtype=np.uint8)
                Image.fromarray(a).save(d / f"x{i}.jpg")
        out[name] = str(d)
    return out


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    ck = tmp_path_factory.mktemp("ck")
    return Config(fine_size=S, ngf=8, ndf=8, batch_size=2,
                  vgg_width_scale=1 / 8, mask_type="random",
                  checkpoints_dir=str(ck), niter=1, niter_decay=1,
                  display_freq=2, save_epoch_freq=1, seed=3)


@pytest.mark.slow
def test_trainer_fit_two_epochs(data_dirs, tiny_cfg):
    mesh = pmesh.make_mesh(jax.devices()[:2])
    train_ds = InpaintDataset(data_dirs["img"], data_dirs["mask"],
                              data_dirs["ref"], S)
    valid_ds = InpaintDataset(data_dirs["val"], data_dirs["mask"],
                              data_dirs["ref"], S)
    tr = Trainer(tiny_cfg, train_ds, valid_ds, mesh=mesh)
    state = tr.fit()
    # niter + niter_decay = 2 epochs x 2 steps each
    assert int(state.step) == 4
    # per-epoch checkpoints exist
    assert tr.ckpt.all_epochs() == [1, 2]
    # lr followed the lambda schedule after epoch steps
    assert current_learning_rate(state) == pytest.approx(
        lr_for_epoch(tiny_cfg, 2), rel=1e-5)
    # metrics CSV + loss plot + display_freq visual dumps on disk
    assert os.path.exists(tr.logger.path)
    dumps = os.listdir(os.path.join(tr.out_dir, "saveimg"))
    assert len(dumps) >= 1
    # resume from epoch 2 and run one more epoch
    cfg2 = tiny_cfg.replace(continue_train=True, which_epoch="2",
                            niter_decay=2)
    tr2 = Trainer(cfg2, train_ds, valid_ds, mesh=mesh)
    state2 = tr2.fit()
    assert int(state2.step) == 6
    # crash recovery: which_epoch="latest" resolves the newest checkpoint
    cfg3 = tiny_cfg.replace(continue_train=True, which_epoch="latest",
                            niter_decay=3)
    tr3 = Trainer(cfg3, train_ds, valid_ds, mesh=mesh)
    assert tr3.resume_epoch() == 3
    state3 = tr3.fit()
    assert int(state3.step) == 8  # one more epoch (4) from epoch 3


@pytest.mark.slow
def test_trainer_fit_resume_batch_norm(data_dirs, tiny_cfg, tmp_path):
    # norm='batch' through the full Trainer surface: orbax checkpoints the
    # variables-dict state entries per epoch, and a resume restores the
    # running batch_stats exactly (the reference persists BN buffers in
    # its state_dict .pt files), then keeps updating them.
    cfg = tiny_cfg.replace(norm="batch", checkpoints_dir=str(tmp_path),
                           name="bn")
    mesh = pmesh.make_mesh(jax.devices()[:2])
    train_ds = InpaintDataset(data_dirs["img"], data_dirs["mask"],
                              data_dirs["ref"], S)
    tr = Trainer(cfg, train_ds, mesh=mesh)
    state = tr.fit()
    assert int(state.step) == 4
    stats_end = jax.tree_util.tree_leaves(state.params_G["batch_stats"])
    assert any(float(np.abs(np.asarray(x)).max()) > 0 for x in stats_end)
    cfg2 = cfg.replace(continue_train=True, which_epoch="2", niter_decay=2)
    tr2 = Trainer(cfg2, train_ds, mesh=mesh)
    restored = tr2.init_state()
    for a, b in zip(jax.tree_util.tree_leaves(state.params_G),
                    jax.tree_util.tree_leaves(restored.params_G)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    state2 = tr2.fit()  # one more epoch (3) from the restore
    assert int(state2.step) == 6
    assert any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(
                   stats_end,
                   jax.tree_util.tree_leaves(state2.params_G["batch_stats"])))


def test_evaluator_exact_count_with_ragged_tail(data_dirs, tiny_cfg,
                                                tmp_path, tmp_path_factory):
    """batch_size 4 over 10 images must evaluate exactly 10 (VERDICT #8):
    the tail batch is padded, not dropped, and padded rows aren't counted."""
    d = tmp_path_factory.mktemp("ragged")
    rng = np.random.default_rng(7)
    for i in range(10):
        Image.fromarray(rng.integers(0, 255, (S, S, 3), dtype=np.uint8)
                        ).save(d / f"x{i}.jpg")
    mesh = pmesh.make_mesh(jax.devices()[:2])
    cfg = tiny_cfg.replace(batch_size=4)
    ds = SelfRefDataset(str(d), data_dirs["mask"], S)
    tr = Trainer(cfg, ds, mesh=mesh)
    res = evaluate(cfg, tr.init_state(), ds, max_images=500, mesh=mesh,
                   verbose=False)
    assert res["images"] == 10
    assert np.isfinite(res["psnr"])


def test_evaluator_metrics(data_dirs, tiny_cfg, tmp_path):
    mesh = pmesh.make_mesh(jax.devices()[:2])
    ds = SelfRefDataset(data_dirs["img"], data_dirs["mask"], S)
    tr = Trainer(tiny_cfg, ds, mesh=mesh)
    state = tr.init_state()
    res = evaluate(tiny_cfg, state, ds, max_images=4,
                   save_dir=str(tmp_path / "grids"), mesh=mesh,
                   verbose=False)
    assert res["images"] == 4
    assert np.isfinite(res["psnr"]) and -1 <= res["ssim"] <= 1
    assert len(os.listdir(tmp_path / "grids")) == 4


def test_debug_nan_guard_halts_on_windowed_flush(data_dirs, tiny_cfg,
                                                 tmp_path):
    """The NaN guard survives the windowed metrics fetch (metrics_every>1):
    a non-finite loss raises FloatingPointError naming the offending step,
    at most metrics_every-1 steps late."""
    import jax.numpy as jnp
    mesh = pmesh.make_mesh(jax.devices()[:2])
    cfg = tiny_cfg.replace(debug_nan=True, metrics_every=10,
                           checkpoints_dir=str(tmp_path))
    ds = InpaintDataset(data_dirs["img"], data_dirs["mask"],
                        data_dirs["ref"], S)
    tr = Trainer(cfg, ds, mesh=mesh)
    state = tr.init_state()

    def bad_step(state, batch, rng):  # no device work; poisoned metrics
        return state, {"loss": jnp.asarray(float("nan")),
                       "D": jnp.asarray(0.0)}

    tr.train_step = bad_step
    with pytest.raises(FloatingPointError, match="non-finite loss"):
        tr.train_epoch(state, 1, jax.random.PRNGKey(0), 0)


@pytest.mark.slow
def test_trainer_fit_sp_mesh(data_dirs, tiny_cfg, tmp_path):
    """cfg.sp_devices > 1: the Trainer self-builds the 2-D (data x sp)
    mesh, shards the batch over data AND the image height over sp
    (parallel/spatial.py), and a one-epoch fit runs end-to-end with a
    finite loss and a saved checkpoint."""
    from deepinpainting_tpu.parallel import spatial as pspatial

    cfg = tiny_cfg.replace(checkpoints_dir=str(tmp_path), niter_decay=0,
                           display_freq=0, sp_devices=2)
    mesh = pspatial.make_dp_sp_mesh(2, 2, jax.devices()[:4],
                                    axes=(cfg.data_axis, "sp"))
    train_ds = InpaintDataset(data_dirs["img"], data_dirs["mask"],
                              data_dirs["ref"], S)
    valid_ds = InpaintDataset(data_dirs["val"], data_dirs["mask"],
                              data_dirs["ref"], S)
    # self-built mesh path (no compile happens at construction): 8 virtual
    # devices / sp_devices=2 leaves 4 data groups, but batch_size=2 can't
    # shard 4 ways, so the front-door divisibility guard (ddecd16)
    # auto-shrinks the data axis to gcd(batch, 4) = 2 with a printed note
    auto = Trainer(cfg, train_ds, valid_ds)
    assert dict(zip(auto.mesh.axis_names, auto.mesh.devices.shape)) == {
        cfg.data_axis: 2, "sp": 2}
    # with a divisible batch the full (4 data x 2 sp) mesh is kept
    auto4 = Trainer(cfg.replace(batch_size=4), train_ds, valid_ds)
    assert dict(zip(auto4.mesh.axis_names, auto4.mesh.devices.shape)) == {
        cfg.data_axis: 4, "sp": 2}
    with pytest.raises(ValueError, match="sp_devices"):
        Trainer(cfg.replace(sp_devices=3), train_ds, valid_ds)

    tr = Trainer(cfg, train_ds, valid_ds, mesh=mesh)
    assert "sp" in tr.mesh.axis_names  # sp step builders engaged
    state = tr.fit()
    assert int(state.step) == 2  # 1 epoch x 2 steps
    assert tr.ckpt.all_epochs() == [1]
