"""Mask math, formulated as pure jnp ops with static shapes.

Capability parity targets in the reference (all file:line cites into
/root/reference):
  * center mask construction         — models/IPSR.py:36-41
  * feature-resolution mask pyramid  — util/util.py:68-84  (cal_feat_mask)
  * per-patch masked/known flags     — util/util.py:88-161 (cal_mask_given_mask_thred)

TPU-native redesign: the reference computes the flag sets with a 1024-iteration
Python loop on host per training step, and carries *dynamic-length* index
vectors (`mask_point_idx`).  Here everything is dense and static-shape: the
flag vector is computed for all H*W patch positions with a windowed reduction,
so the whole pipeline stays inside one jit-compiled graph for any mask.

Conventions: masks are float arrays with 1.0 = hole (region to inpaint),
layout [..., H, W] (a trailing channel axis is accepted and squeezed by
callers).  All functions operate on a single mask; batch via vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def center_mask(fine_size: int, overlap: int = 4) -> jnp.ndarray:
    """Square center mask, hole = 1.  Parity: models/IPSR.py:40-41.

    Hole spans [N/4 + overlap, 3N/4 - overlap) in both dimensions.
    Returns float32 [fine_size, fine_size].
    """
    lo = fine_size // 4 + overlap
    hi = fine_size // 2 + fine_size // 4 - overlap
    r = jnp.arange(fine_size)
    in_band = (r >= lo) & (r < hi)
    return (in_band[:, None] & in_band[None, :]).astype(jnp.float32)


def feat_mask(mask: jnp.ndarray, layers: int = 3,
              threshold: float = 5.0 / 16.0) -> jnp.ndarray:
    """Downsample a full-res mask to feature resolution and binarize.

    Parity: util/util.py:68-84 (cal_feat_mask) — `layers` stacked 4x4/stride-2/
    pad-1 convolutions with constant weight 1/16 (i.e. window-sum / 16, where
    zero padding contributes zeros), then threshold with a strict `>`.

    mask: float [H, W] with values in [0, 1].  Returns float32 [H/2^layers,
    H/2^layers] with values in {0, 1}.
    """
    x = mask.astype(jnp.float32)
    for _ in range(layers):
        x = lax.reduce_window(
            x, 0.0, lax.add,
            window_dimensions=(4, 4), window_strides=(2, 2),
            padding=((1, 1), (1, 1)),
        ) * (1.0 / 16.0)
    return (x > threshold).astype(jnp.float32)


def patch_flags(fmask: jnp.ndarray, patch_size: int = 1, stride: int = 1,
                mask_thred: float = 1.0) -> jnp.ndarray:
    """Dense per-patch masked flags over the feature-resolution mask.

    Parity: util/util.py:88-161 (cal_mask_given_mask_thred) — a patch position
    is flagged masked iff the mask sum inside its window is >= mask_thred.
    The reference additionally builds `nonmask_point_idx` (which, due to the
    commented-out exclusive branch at util/util.py:122-139, contains *all*
    positions) and `flatten_offsets` (unused downstream) — both disappear in
    the dense formulation: "known" patches are simply all patches.

    fmask: float [h, w].  Returns float32 flag vector of length
    nH*nW, raster order, where nH = (h - patch_size)//stride + 1.
    """
    if patch_size == 1 and stride == 1:
        sums = fmask
    else:
        sums = lax.reduce_window(
            fmask.astype(jnp.float32), 0.0, lax.add,
            window_dimensions=(patch_size, patch_size),
            window_strides=(stride, stride),
            padding="VALID",
        )
    return (sums >= mask_thred).astype(jnp.float32).reshape(-1)


def expand_mask(mask: jnp.ndarray, channels: int = 3) -> jnp.ndarray:
    """[H, W] -> [H, W, C] broadcast (reference `ex_mask`, models/IPSR.py:145)."""
    return jnp.broadcast_to(mask[..., None], mask.shape + (channels,))


# Per-channel fill constants for the hole: 2*mean/255 - 1 on [-1,1] images
# (ImageNet means 123/104/117 — models/IPSR.py:148-150).
HOLE_FILL_RGB = (2 * 123.0 / 255.0 - 1.0,
                 2 * 104.0 / 255.0 - 1.0,
                 2 * 117.0 / 255.0 - 1.0)


def fill_hole_with_mean(image: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Replace the hole region with the fixed per-channel constants.

    Parity: models/IPSR.py:148-150.  image: [..., H, W, 3] in [-1, 1];
    mask: [..., H, W] with 1 = hole.
    """
    fill = jnp.asarray(HOLE_FILL_RGB, dtype=image.dtype)
    m = mask[..., None]
    return image * (1.0 - m) + fill * m


def zero_hole(image: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Zero out the hole region (reference `knownregion`, models/IPSR.py:174)."""
    return image * (1.0 - mask[..., None])


def random_stroke_mask(key: jax.Array, fine_size: int,
                       num_strokes: int = 8, max_len: int = 48,
                       thickness: int = 8) -> jnp.ndarray:
    """Free-form stroke mask generator (on-device, static shapes).

    The reference pairs images with random mask *files* from a mask dataset
    (util/data_load.py:27); for self-contained training/benchmarks we also
    provide an on-device generator: independent thick line segments with
    random start/direction/length, rendered densely.  Returns float32
    [fine_size, fine_size], 1 = hole.
    """
    k1, k2, k3 = jax.random.split(key, 3)
    starts = jax.random.uniform(k1, (num_strokes, 2), minval=0.1, maxval=0.9)
    deltas = jax.random.uniform(k2, (num_strokes, 2), minval=-1.0, maxval=1.0)
    lengths = jax.random.uniform(k3, (num_strokes, 1), minval=0.2, maxval=1.0)
    deltas = deltas / (jnp.linalg.norm(deltas, axis=-1, keepdims=True) + 1e-8)
    ends = jnp.clip(starts + deltas * lengths * (max_len / fine_size), 0.0, 1.0)

    yy = jnp.linspace(0.0, 1.0, fine_size)
    grid = jnp.stack(jnp.meshgrid(yy, yy, indexing="ij"), axis=-1)  # [H,W,2]

    def dist_to_segment(p0, p1):
        d = p1 - p0
        denom = jnp.sum(d * d) + 1e-12
        t = jnp.clip(jnp.einsum("hwc,c->hw", grid - p0, d) / denom, 0.0, 1.0)
        proj = p0 + t[..., None] * d
        return jnp.linalg.norm(grid - proj, axis=-1)

    dists = jax.vmap(dist_to_segment)(starts, ends)  # [S,H,W]
    radius = thickness / (2.0 * fine_size)
    return (jnp.min(dists, axis=0) <= radius).astype(jnp.float32)
