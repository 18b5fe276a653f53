"""SSIM numerical validation against IQA_pytorch semantics (VERDICT #4).

The reference's published 0.772 SSIM is defined by IQA_pytorch==0.1's
`SSIM(channels=3)(real_B, fake_B, as_loss=False)` on [-1,1] tensors
(test.ipynb cell 3; req.txt:21).  That library is not installed here, so
this file carries a line-by-line torch reimplementation of its forward —
fspecial_gauss window (11, 1.5), depthwise VALID conv, x*255 inputs with
C=(K*255)^2, and the relu(cs_map) clamp — used as the golden that
`utils.metrics.ssim` must match to <=1e-4 on a spread of image pairs.

The golden follows IQA_pytorch/SSIM.py (v0.1): gaussian_filter = grouped
F.conv2d stride 1 pad 0; ssim() computes
    cs_map  = relu((2*sigma12 + C2) / (sigma1_sq + sigma2_sq + C2))
    ssim_map = ((2*mu1_mu2 + C1) / (mu1_sq + mu2_sq + C1)) * cs_map
    ssim_val = ssim_map.mean([1,2,3])
with C1=(0.01*255)^2, C2=(0.03*255)^2 after X,Y *= 255.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from deepinpainting_tpu.utils.metrics import ssim as jnp_ssim


def _fspecial_gauss(size: int, sigma: float, channels: int) -> torch.Tensor:
    # IQA_pytorch/utils.py fspecial_gauss: MATLAB-style 2D gaussian.
    x, y = np.mgrid[-size // 2 + 1: size // 2 + 1,
                    -size // 2 + 1: size // 2 + 1]
    g = np.exp(-((x ** 2 + y ** 2) / (2.0 * sigma ** 2)))
    g = torch.from_numpy(g / g.sum()).float().unsqueeze(0).unsqueeze(0)
    return g.repeat(channels, 1, 1, 1)


def _gaussian_filter(x: torch.Tensor, win: torch.Tensor) -> torch.Tensor:
    return F.conv2d(x, win, stride=1, padding=0, groups=x.shape[1])


def iqa_ssim_golden(X: torch.Tensor, Y: torch.Tensor) -> torch.Tensor:
    """IQA_pytorch SSIM.forward(X, Y, as_loss=False), NCHW input."""
    win = _fspecial_gauss(11, 1.5, X.shape[1])
    C1 = (0.01 * 255) ** 2
    C2 = (0.03 * 255) ** 2
    X = X * 255
    Y = Y * 255
    mu1 = _gaussian_filter(X, win)
    mu2 = _gaussian_filter(Y, win)
    mu1_sq, mu2_sq, mu1_mu2 = mu1.pow(2), mu2.pow(2), mu1 * mu2
    sigma1_sq = _gaussian_filter(X * X, win) - mu1_sq
    sigma2_sq = _gaussian_filter(Y * Y, win) - mu2_sq
    sigma12 = _gaussian_filter(X * Y, win) - mu1_mu2
    cs_map = (2 * sigma12 + C2) / (sigma1_sq + sigma2_sq + C2)
    cs_map = F.relu(cs_map)
    ssim_map = ((2 * mu1_mu2 + C1) / (mu1_sq + mu2_sq + C1)) * cs_map
    return ssim_map.mean([1, 2, 3])


def _pairs():
    rng = np.random.default_rng(0)
    h = w = 64
    # 1) identical images
    a = rng.uniform(-1, 1, (1, h, w, 3)).astype(np.float32)
    yield "identical", a, a.copy()
    # 2) small noise perturbation (the eval regime: fake close to real)
    yield "noisy", a, np.clip(
        a + rng.normal(0, 0.05, a.shape).astype(np.float32), -1, 1)
    # 3) unrelated images
    b = rng.uniform(-1, 1, (1, h, w, 3)).astype(np.float32)
    yield "unrelated", a, b
    # 4) anticorrelated — exercises the relu(cs_map) clamp
    yield "anticorrelated", a, -a
    # 5) smooth gradients (structured, low variance)
    gx = np.linspace(-1, 1, w, dtype=np.float32)
    g1 = np.broadcast_to(gx, (1, h, w))[..., None].repeat(3, -1)
    g2 = np.transpose(g1, (0, 2, 1, 3)).copy()
    yield "gradients", np.ascontiguousarray(g1), g2
    # 6) constant vs constant (zero variance: the C-stabilized branch)
    yield "constant", np.full((1, h, w, 3), 0.3, np.float32), \
        np.full((1, h, w, 3), 0.31, np.float32)


@pytest.mark.parametrize("name,x,y", list(_pairs()))
def test_ssim_matches_iqa_pytorch_golden(name, x, y):
    golden = float(iqa_ssim_golden(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
        torch.from_numpy(np.transpose(y, (0, 3, 1, 2)))))
    ours = float(jnp_ssim(x, y))
    assert ours == pytest.approx(golden, abs=1e-4), (name, ours, golden)


def test_ssim_relu_clamp_active():
    """Anticorrelated inputs must clamp at the cs term: result >= 0 and
    strictly smaller than the unclamped formula would give."""
    rng = np.random.default_rng(1)
    a = rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    val = float(jnp_ssim(a, -a))
    assert val >= 0.0
    assert val < 0.05
