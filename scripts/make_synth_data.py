"""Generate a self-contained synthetic inpainting dataset.

The reference trains on Paris StreetView-style photo folders
(train.ipynb cell 1: Data_load(img_root, mask_root, ref_root)); no such
dataset ships with either repo, so for reproducible end-to-end training
runs we synthesize structured scenes — smooth gradient backgrounds,
solid geometric shapes, periodic textures — which a two-stage inpainter
can genuinely learn to complete (unlike white noise, where L1 descent
would only reflect predicting the mean).

Layout written under --out:
  img/NNNN.jpg    train images        mask/NNNN.png  hole masks (255=hole)
  valid/NNNN.jpg  held-out images     (refs: pass img/ or valid/ as refroot —
                                       the model is self-reference-guided
                                       in the eval path)

Usage: python scripts/make_synth_data.py --out /tmp/synth --n 300 --size 256
"""

import argparse
import os

import numpy as np
from PIL import Image


def _gradient(rng, size):
    c0 = rng.uniform(0.1, 0.9, 3)
    c1 = rng.uniform(0.1, 0.9, 3)
    ang = rng.uniform(0, 2 * np.pi)
    yy, xx = np.mgrid[0:size, 0:size] / size
    t = (np.cos(ang) * xx + np.sin(ang) * yy + 1.0) / 2.0
    return c0[None, None] * (1 - t[..., None]) + c1[None, None] * t[..., None]


def _texture(rng, size):
    fx, fy = rng.uniform(2, 14, 2)
    ph = rng.uniform(0, 2 * np.pi, 2)
    yy, xx = np.mgrid[0:size, 0:size] / size
    tex = 0.5 + 0.5 * np.sin(2 * np.pi * fx * xx + ph[0]) * \
        np.sin(2 * np.pi * fy * yy + ph[1])
    return tex[..., None] * rng.uniform(0.05, 0.25)


def _shapes(rng, img, size):
    yy, xx = np.mgrid[0:size, 0:size]
    for _ in range(rng.integers(2, 6)):
        color = rng.uniform(0, 1, 3)
        cx, cy = rng.uniform(0.15, 0.85, 2) * size
        if rng.random() < 0.5:  # ellipse
            rx, ry = rng.uniform(0.06, 0.25, 2) * size
            m = ((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2 <= 1.0
        else:  # rotated bar
            w, h = rng.uniform(0.05, 0.3, 2) * size
            a = rng.uniform(0, np.pi)
            u = (xx - cx) * np.cos(a) + (yy - cy) * np.sin(a)
            v = -(xx - cx) * np.sin(a) + (yy - cy) * np.cos(a)
            m = (np.abs(u) <= w) & (np.abs(v) <= h)
        img[m] = 0.7 * color + 0.3 * img[m]
    return img


def make_image(rng, size):
    img = _gradient(rng, size)
    img = _shapes(rng, img, size)
    img = np.clip(img + _texture(rng, size), 0, 1)
    img += rng.normal(0, 0.01, img.shape)
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def make_mask(rng, size):
    """Hole mask: one central-ish rectangle plus a few thick strokes
    (matches the reference's mask-dataset style: contiguous blobs covering
    roughly 10-30% of the frame)."""
    m = np.zeros((size, size), np.uint8)
    w, h = (rng.uniform(0.2, 0.4, 2) * size).astype(int)
    x0 = rng.integers(size // 8, size - w - size // 8)
    y0 = rng.integers(size // 8, size - h - size // 8)
    m[y0:y0 + h, x0:x0 + w] = 255
    yy, xx = np.mgrid[0:size, 0:size]
    for _ in range(rng.integers(1, 4)):
        p0 = rng.uniform(0.1, 0.9, 2) * size
        d = rng.uniform(-1, 1, 2)
        d /= np.linalg.norm(d) + 1e-8
        ln = rng.uniform(0.2, 0.5) * size
        th = rng.uniform(0.02, 0.05) * size
        u = (xx - p0[0]) * d[0] + (yy - p0[1]) * d[1]
        v = np.abs((xx - p0[0]) * d[1] - (yy - p0[1]) * d[0])
        m[(u >= 0) & (u <= ln) & (v <= th)] = 255
    return m


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=300, help="train images")
    ap.add_argument("--n_valid", type=int, default=32)
    ap.add_argument("--n_masks", type=int, default=64)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    for sub in ("img", "valid", "mask"):
        os.makedirs(os.path.join(args.out, sub), exist_ok=True)
    for i in range(args.n):
        Image.fromarray(make_image(rng, args.size)).save(
            os.path.join(args.out, "img", f"{i:04d}.jpg"), quality=95)
    for i in range(args.n_valid):
        Image.fromarray(make_image(rng, args.size)).save(
            os.path.join(args.out, "valid", f"{i:04d}.jpg"), quality=95)
    for i in range(args.n_masks):
        Image.fromarray(make_mask(rng, args.size)).save(
            os.path.join(args.out, "mask", f"{i:04d}.png"))
    print(f"wrote {args.n} train + {args.n_valid} valid images, "
          f"{args.n_masks} masks under {args.out}")


if __name__ == "__main__":
    main()
