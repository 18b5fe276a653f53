"""Evaluation metrics (PSNR/SSIM) and a structured metrics logger.

Parity targets:
  * PSNR = 10*log10(2^2 / MSE) computed directly on [-1,1] tensors
    (test.ipynb cell 3: `psnr=10*torch.log10((2**2)/mse)`).
  * SSIM per IQA_pytorch defaults (test.ipynb cell 3: `SSIM(channels=3)`
    called on the [-1,1] tensors with `as_loss=False`): 11x11 Gaussian
    window sigma 1.5, K1=0.01, K2=0.03, and the library's internal x*255
    scaling — reproduced here so averages are comparable to the
    reference's published 0.772.
  * The logger replaces the reference's print-based observability
    (SURVEY.md §5 metrics row): per-step scalars to CSV + epoch summary,
    loss-curve PNG equivalent to the matplotlib plot in train.ipynb cell 2.
"""

from __future__ import annotations

import csv
import os
import time
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np
from jax import lax


def psnr(real: jnp.ndarray, fake: jnp.ndarray, peak: float = 2.0
         ) -> jnp.ndarray:
    """PSNR on [-1,1] images (peak-to-peak 2).  test.ipynb cell 3 formula."""
    mse = jnp.mean((real - fake) ** 2)
    return jnp.where(mse == 0, jnp.asarray(100.0),
                     10.0 * jnp.log10(peak ** 2 / mse))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    r = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(r ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return g[:, None] * g[None, :]


def _filter2(x: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 'valid' correlation of NHWC x with a [k,k] window."""
    c = x.shape[-1]
    k = win.shape[0]
    kernel = jnp.broadcast_to(win[:, :, None, None], (k, k, 1, c))
    return lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def ssim(real: jnp.ndarray, fake: jnp.ndarray, *, iqa_scale: bool = True,
         k1: float = 0.01, k2: float = 0.03, win_size: int = 11,
         sigma: float = 1.5) -> jnp.ndarray:
    """Mean SSIM over NHWC [-1,1] images.

    iqa_scale=True replicates IQA_pytorch's SSIM entry point (the library
    the reference eval drives, test.ipynb cell 3 / req.txt:21): inputs
    multiplied by 255 with C=(K*255)^2 — algebraically a no-op, since SSIM
    is invariant to scaling x,y by a when C scales by a^2 — plus the
    library's one *operative* quirk: the contrast-structure term
    cs = (2*sig_xy+C2)/(sig_x+sig_y+C2) is passed through relu() before
    multiplying the luminance term, clamping anticorrelated patches to 0
    instead of letting SSIM go negative.  Validated against a line-by-line
    torch reimplementation of the IQA_pytorch forward in
    tests/test_ssim_golden.py.  The reference feeds [-1,1] tensors rather
    than the [0,1] the library assumes; that too only changes the effective
    C relative to the data, and is reproduced exactly by computing on the
    raw [-1,1] values here.
    """
    x = real.astype(jnp.float32)
    y = fake.astype(jnp.float32)
    data_range = 255.0 if iqa_scale else 2.0
    if iqa_scale:
        x = x * 255.0
        y = y * 255.0
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    win = _gaussian_window(win_size, sigma)

    mu_x = _filter2(x, win)
    mu_y = _filter2(y, win)
    mu_xx, mu_yy, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sig_x = _filter2(x * x, win) - mu_xx
    sig_y = _filter2(y * y, win) - mu_yy
    sig_xy = _filter2(x * y, win) - mu_xy

    cs_map = (2 * sig_xy + c2) / (sig_x + sig_y + c2)
    if iqa_scale:
        cs_map = jnp.maximum(cs_map, 0.0)  # IQA_pytorch F.relu(cs_map)
    ssim_map = ((2 * mu_xy + c1) / (mu_xx + mu_yy + c1)) * cs_map
    return jnp.mean(ssim_map)


class MetricsLogger:
    """Per-step scalar metrics -> CSV, epoch summaries, loss-curve PNG."""

    def __init__(self, out_dir: str, filename: str = "metrics.csv"):
        os.makedirs(out_dir, exist_ok=True)
        self.out_dir = out_dir
        self.path = os.path.join(out_dir, filename)
        self._fields: Optional[List[str]] = None
        self._file = None
        self._writer = None
        self.epoch_train: List[float] = []
        self.epoch_valid: List[float] = []

    def log_step(self, step: int, metrics: Dict[str, float],
                 when: Optional[float] = None) -> None:
        """`when` lets a caller that buffers metrics (the trainer's
        windowed fetch) record the step's true wall time instead of the
        flush time."""
        row = {"step": step, "time": when if when is not None else
               time.time()}
        row.update({k: float(v) for k, v in metrics.items()})
        if self._writer is None:
            self._fields = list(row)
            self._file = open(self.path, "w", newline="")
            self._writer = csv.DictWriter(self._file, fieldnames=self._fields)
            self._writer.writeheader()
        self._writer.writerow({k: row.get(k, "") for k in self._fields})
        self._file.flush()

    def log_epoch(self, epoch: int, train_loss: float,
                  valid_loss: float) -> None:
        """train.ipynb cell 2 epoch print parity."""
        self.epoch_train.append(train_loss)
        self.epoch_valid.append(valid_loss)
        print("Epoch : %d -> Train loss : %f, Valid loss : %f"
              % (epoch, train_loss, valid_loss))

    def save_loss_plot(self, path: Optional[str] = None) -> Optional[str]:
        """Loss-curve figure with the early-stop checkpoint marker
        (train.ipynb cell 2 tail).  No-op if matplotlib is unavailable."""
        if not self.epoch_valid:
            return None
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            return None
        path = path or os.path.join(self.out_dir, "loss_plot.png")
        fig = plt.figure(figsize=(10, 8))
        xs = range(1, len(self.epoch_train) + 1)
        plt.plot(xs, self.epoch_train, label="Training Loss")
        plt.plot(xs, self.epoch_valid, label="Validation Loss")
        best = int(np.argmin(self.epoch_valid)) + 1
        plt.axvline(best, linestyle="--", color="r",
                    label="Early Stopping Checkpoint")
        plt.xlabel("epochs")
        plt.ylabel("loss")
        plt.grid(True)
        plt.legend()
        plt.tight_layout()
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
        return path

    def close(self) -> None:
        if self._file is not None:
            self._file.close()
            self._file = None
            self._writer = None
