"""Mask math parity vs the reference (util/util.py) run on CPU torch."""

import numpy as np
import jax.numpy as jnp
import jax
import torch
import pytest

from deepinpainting_tpu.ops import masks as M
from reference_harness import load_reference


@pytest.fixture(scope="module")
def ref_util():
    load_reference()
    import util.util as util
    return util


def random_mask_np(rng, size):
    m = (rng.random((size, size)) < 0.25).astype(np.float32)
    return m


def test_center_mask_matches_reference_construction():
    # models/IPSR.py:40-41
    fine, overlap = 256, 4
    ref = torch.zeros(1, 1, fine, fine)
    ref[:, :, fine // 4 + overlap: fine // 2 + fine // 4 - overlap,
        fine // 4 + overlap: fine // 2 + fine // 4 - overlap] = 1
    ours = np.asarray(M.center_mask(fine, overlap))
    np.testing.assert_array_equal(ours, ref[0, 0].numpy())


@pytest.mark.parametrize("size", [256, 64])
def test_feat_mask_parity(ref_util, size):
    rng = np.random.default_rng(0)
    m = random_mask_np(rng, size)
    layers = 3
    thr = 5 / 16.0
    ref_out = ref_util.cal_feat_mask(
        torch.from_numpy(m)[None, None], layers, thr)
    ours = np.asarray(M.feat_mask(jnp.asarray(m), layers, thr))
    np.testing.assert_array_equal(ours, ref_out[0, 0].numpy().astype(np.float32))


def test_feat_mask_center():
    # Center 256 mask downsamples to a centered block at 32x32.
    fm = np.asarray(M.feat_mask(M.center_mask(256, 4), 3, 5 / 16.0))
    assert fm.shape == (32, 32)
    assert fm.sum() > 0
    # hole is centered: symmetric under 180-degree rotation
    np.testing.assert_array_equal(fm, fm[::-1, ::-1])


def test_patch_flags_parity(ref_util):
    rng = np.random.default_rng(1)
    m = random_mask_np(rng, 256)
    fm = M.feat_mask(jnp.asarray(m), 3, 5 / 16.0)
    flags = np.asarray(M.patch_flags(fm, 1, 1, 1.0))

    img = torch.zeros(512, 32, 32)
    ref_flag, nonmask_idx, _, mask_idx = ref_util.cal_mask_given_mask_thred(
        img, torch.from_numpy(np.asarray(fm)).byte(), 1, 1, 1)
    np.testing.assert_array_equal(flags, ref_flag.numpy().astype(np.float32))
    # reference quirk: nonmask indices are ALL positions (util/util.py:122-139)
    assert len(nonmask_idx) == 1024
    np.testing.assert_array_equal(np.flatnonzero(flags), mask_idx.numpy())


def test_fill_and_zero_hole():
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(-1, 1, (2, 8, 8, 3)).astype(np.float32))
    mask = jnp.zeros((2, 8, 8)).at[:, 2:5, 3:6].set(1.0)
    filled = M.fill_hole_with_mean(img, mask)
    np.testing.assert_allclose(
        np.asarray(filled[0, 3, 4]), np.asarray(M.HOLE_FILL_RGB), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(filled[0, 0, 0]),
                               np.asarray(img[0, 0, 0]))
    zeroed = M.zero_hole(img, mask)
    assert np.all(np.asarray(zeroed[0, 2:5, 3:6]) == 0)


def test_random_stroke_mask_static():
    key = jax.random.PRNGKey(0)
    m = M.random_stroke_mask(key, 128)
    assert m.shape == (128, 128)
    assert set(np.unique(np.asarray(m))) <= {0.0, 1.0}
    assert 0 < np.asarray(m).mean() < 0.5
