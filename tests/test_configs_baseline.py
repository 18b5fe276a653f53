"""BASELINE.json config-coverage tests (CPU, scaled widths).

Config 1: coarse-net forward on a center-masked image.
Config 3: batched irregular free-form-mask inference at 512x512 with
          on-device mask preprocessing (stroke masks generated on device;
          attention falls back to the lax path at N=4096 — the fused
          Pallas kernel's VMEM budget covers N<=1024, attention_pallas.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepinpainting_tpu.config import Config
from deepinpainting_tpu.engine import (create_state, make_coarse_fn,
                                       make_inference_fn)
from deepinpainting_tpu.ops import masks as M

TINY = Config(fine_size=64, ngf=8, ndf=8, vgg_width_scale=1 / 8,
              mask_type="center", overlap=4)


def test_coarse_only_center_mask():
    state = create_state(TINY, jax.random.PRNGKey(0))
    coarse = jax.jit(make_coarse_fn(TINY))
    gt = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3),
                            jnp.float32, -1, 1)
    dummy_mask = jnp.zeros((2, 64, 64))
    fake_P, composite = coarse(state.params_P, gt, dummy_mask)
    assert fake_P.shape == (2, 64, 64, 3)
    assert np.isfinite(np.asarray(fake_P)).all()
    # outside the center hole, the composite equals the input exactly
    cm = np.asarray(M.center_mask(64, TINY.overlap))
    outside = cm == 0
    np.testing.assert_allclose(np.asarray(composite)[0][outside],
                               np.asarray(gt)[0][outside], rtol=0, atol=0)
    # inside the hole, the composite is the coarse prediction
    np.testing.assert_allclose(np.asarray(composite)[0][~outside],
                               np.asarray(fake_P)[0][~outside])


def test_512_freeform_batched_inference():
    cfg = TINY.replace(fine_size=512, mask_type="random")
    state = create_state(cfg, jax.random.PRNGKey(0))
    infer = jax.jit(make_inference_fn(cfg))
    b = 2
    gt = jax.random.uniform(jax.random.PRNGKey(1), (b, 512, 512, 3),
                            jnp.float32, -1, 1)
    # free-form stroke masks generated on device, one per sample
    keys = jax.random.split(jax.random.PRNGKey(2), b)
    mask = jax.vmap(lambda k: M.random_stroke_mask(k, 512))(keys)
    assert float(mask.sum()) > 0
    fake_B, fake_P = infer(state.params_G, state.params_P, state.vgg,
                           gt, mask, gt)
    assert fake_B.shape == (b, 512, 512, 3)
    assert fake_P.shape == (b, 512, 512, 3)
    assert np.isfinite(np.asarray(fake_B)).all()


def test_nan_guard_halts_training(tmp_path):
    from deepinpainting_tpu.engine.trainer import Trainer

    class PoisonDataset:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            bad = np.full((64, 64, 3), np.nan, np.float32)
            mask = np.zeros((64, 64), np.float32)
            mask[16:48, 16:48] = 1
            return {"image": bad, "mask": mask, "ref": bad}

    from deepinpainting_tpu.parallel import mesh as pmesh
    cfg = TINY.replace(mask_type="random", debug_nan=True, batch_size=2,
                       niter=1, niter_decay=0,
                       checkpoints_dir=str(tmp_path))
    tr = Trainer(cfg, PoisonDataset(),
                 mesh=pmesh.make_mesh(jax.devices()[:2]))
    with pytest.raises(FloatingPointError, match="non-finite loss"):
        tr.fit()
