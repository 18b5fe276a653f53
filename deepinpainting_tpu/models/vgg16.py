"""VGG16 four-slice feature extractor for perceptual features.

Parity: models/vgg16.py:6-37 — torchvision vgg16 `features` split at indices
5/10/17/23.  Note the reference slices *include* the max-pools, so the
returned "relu" names are really post-pool activations except the last:

    relu1_2 = pool1 output,  64ch, H/2
    relu2_2 = pool2 output, 128ch, H/4
    relu3_3 = pool3 output, 256ch, H/8   (netF input)
    relu4_3 = conv4_3+ReLU, 512ch, H/8   (attention ref + InnerCos target)

Inputs are the [-1,1]-normalized images — NOT ImageNet-normalized
(models/IPSR.py:162-163,186-187 feed the 0.5/0.5 tensors straight in).

Weights: torchvision pretrained weights are imported offline via
convert/vgg_import.py into an .npz; when unavailable (this image has no
torchvision and zero egress) the extractor initializes deterministically
from a PRNG — a fixed random projection, sufficient for every structural
and training-mechanics test, swapped for the real weights via
`load_params_npz` when the file exists.  The extractor is frozen (no
gradients), matching models/vgg16.py:22-24.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.convs import conv2d


class VggFeatures(NamedTuple):
    relu1_2: jnp.ndarray
    relu2_2: jnp.ndarray
    relu3_3: jnp.ndarray
    relu4_3: jnp.ndarray


# (name, out_channels) per conv, grouped into the four slices.
_SLICES = (
    (("conv1_1", 64), ("conv1_2", 64)),
    (("conv2_1", 128), ("conv2_2", 128)),
    (("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256)),
    (("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512)),
)


def _max_pool_2x2(x):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 2, 2, 1),
                             (1, 2, 2, 1), "VALID")


class Vgg16(nn.Module):
    """Four-slice VGG16 feature extractor (NHWC).

    width_scale != 1 shrinks every channel count proportionally — used only
    by scaled-down test configs (real weights require width_scale=1).
    upto < 4 stops after that slice (later entries are None): callers that
    only need relu3_3 (the netF branch on fake images, models/IPSR.py:212)
    skip the three conv4_* layers entirely.
    """
    width_scale: float = 1.0
    upto: int = 4

    @nn.compact
    def __call__(self, x) -> VggFeatures:
        feats = []
        y = x
        for si, convs in enumerate(_SLICES):
            if si >= self.upto:
                feats.append(None)
                continue
            for name, c in convs:
                cout = max(1, int(c * self.width_scale))
                cin = y.shape[-1]
                k = self.param(name + "_kernel", nn.initializers.he_normal(),
                               (3, 3, cin, cout))
                b = self.param(name + "_bias", nn.initializers.zeros, (cout,))
                y = nn.relu(conv2d(y, k.astype(y.dtype), b, 1, 1, 1))
            if si < 3:
                y = _max_pool_2x2(y)  # slices 1-3 end in their pool
            feats.append(y)
        return VggFeatures(*feats)


def init_vgg16(rng: jax.Array, dtype=jnp.float32,
               width_scale: float = 1.0) -> Dict[str, Any]:
    """Deterministic random init (fallback when no pretrained npz exists)."""
    model = Vgg16(width_scale)
    variables = model.init(rng, jnp.zeros((1, 64, 64, 3), dtype))
    return variables["params"]


def load_params_npz(path: str) -> Dict[str, Any]:
    """Load converted torchvision weights (see convert/vgg_import.py).

    The npz stores '{name}_kernel' as HWIO and '{name}_bias' per conv.
    """
    raw = np.load(path)
    return {k: jnp.asarray(raw[k]) for k in raw.files}


def vgg16_params(cfg_vgg_weights: str, rng: jax.Array,
                 width_scale: float = 1.0) -> Dict[str, Any]:
    if cfg_vgg_weights and cfg_vgg_weights != "random":
        assert width_scale == 1.0, "pretrained weights require full width"
        return load_params_npz(cfg_vgg_weights)
    return init_vgg16(rng, width_scale=width_scale)


def apply_vgg16(params: Dict[str, Any], images: jnp.ndarray,
                width_scale: float = 1.0, upto: int = 4) -> VggFeatures:
    """images: [B,H,W,3] in [-1,1].  Gradients are blocked through the
    (frozen) VGG parameters but flow through `images`.  upto=3 computes
    only through relu3_3 (relu4_3 comes back None)."""
    frozen = jax.tree_util.tree_map(lax.stop_gradient, params)
    return Vgg16(width_scale, upto).apply({"params": frozen}, images)
