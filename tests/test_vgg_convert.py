"""VGG16 weight-converter tests: torch state_dict -> npz -> jax extractor,
with numerical parity against a torch recomputation of the reference's
slice structure (models/vgg16.py:13-24: convs 3x3 p1 + ReLU, maxpool at
block ends, slices split at features indices 5/10/17/23).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from deepinpainting_tpu.convert import (convert_vgg16_state_dict,
                                        torch_file_to_npz)
from deepinpainting_tpu.convert.vgg_import import VGG16_FEATURES_INDEX
from deepinpainting_tpu.models.vgg16 import apply_vgg16, load_params_npz

CHANNELS = {  # conv name -> (in, out), full VGG16 widths
    "conv1_1": (3, 64), "conv1_2": (64, 64),
    "conv2_1": (64, 128), "conv2_2": (128, 128),
    "conv3_1": (128, 256), "conv3_2": (256, 256), "conv3_3": (256, 256),
    "conv4_1": (256, 512), "conv4_2": (512, 512), "conv4_3": (512, 512),
}


@pytest.fixture(scope="module")
def fake_state_dict():
    g = torch.Generator().manual_seed(0)
    sd = {}
    for idx, name in VGG16_FEATURES_INDEX.items():
        cin, cout = CHANNELS[name]
        sd[f"features.{idx}.weight"] = torch.randn(
            (cout, cin, 3, 3), generator=g) * 0.05
        sd[f"features.{idx}.bias"] = torch.randn((cout,), generator=g) * 0.05
    # distractors the converter must skip
    sd["features.24.weight"] = torch.zeros((512, 512, 3, 3))
    sd["features.24.bias"] = torch.zeros((512,))
    sd["classifier.0.weight"] = torch.zeros((8, 8))
    return sd


def torch_vgg_slices(sd, x):
    """Reference slice structure recomputed in torch (NCHW)."""
    feats = []
    order = [(0, "conv1_1"), (2, "conv1_2"), ("pool", None),
             (5, "conv2_1"), (7, "conv2_2"), ("pool", None),
             (10, "conv3_1"), (12, "conv3_2"), (14, "conv3_3"),
             ("pool", None),
             (17, "conv4_1"), (19, "conv4_2"), (21, "conv4_3")]
    slice_ends = {"conv1_2", "conv2_2", "conv3_3"}  # after their pool
    for idx, name in order:
        if idx == "pool":
            x = F.max_pool2d(x, 2, 2)
            feats.append(x)
            continue
        x = F.relu(F.conv2d(x, sd[f"features.{idx}.weight"],
                            sd[f"features.{idx}.bias"], padding=1))
    feats.append(x)  # relu4_3 (no pool)
    return feats


def test_convert_shapes_and_distractor_skip(fake_state_dict):
    flat = convert_vgg16_state_dict(fake_state_dict)
    assert len(flat) == 20
    assert flat["conv1_1_kernel"].shape == (3, 3, 3, 64)
    assert flat["conv4_3_bias"].shape == (512,)
    assert "conv5_1_kernel" not in flat


def test_convert_missing_key_raises(fake_state_dict):
    sd = dict(fake_state_dict)
    del sd["features.10.weight"]
    with pytest.raises(ValueError, match="conv3_1"):
        convert_vgg16_state_dict(sd)


def test_torch_jax_numerical_parity(fake_state_dict, tmp_path):
    pth = str(tmp_path / "vgg16.pth")
    npz = str(tmp_path / "vgg16.npz")
    torch.save(fake_state_dict, pth)
    torch_file_to_npz(pth, npz)
    params = load_params_npz(npz)

    x = torch.randn((1, 3, 32, 32), generator=torch.Generator()
                    .manual_seed(1))
    want = torch_vgg_slices(fake_state_dict, x)
    got = apply_vgg16(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    for w, g, name in zip(want, got, ("relu1_2", "relu2_2", "relu3_3",
                                      "relu4_3")):
        w = w.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-4, atol=1e-4,
                                   err_msg=name)
