"""Loss functions: relativistic-average LSGAN, L1, InnerCos feature MSE.

Parity targets:
  * GANLoss — models/networks.py:135-183.  Both 'lsgan' and 'wgan_gp'
    select MSE; 'vanilla' selects BCE (networks.py:144-149).  The
    discriminator direction (`target_is_real=True`, called as
    criterionGAN(pred_fake, pred_real, True) — models/IPSR.py:221):

        errD = ( mean((real - mean(fake) - 1)^2)
               + mean((fake - mean(real) + 1)^2) ) / 2

    and the generator direction flips the signs (networks.py:181-183).
    The reference's fake-label branch fills targets with the *real* label
    (networks.py:167) — harmless since targets enter symmetrically as +-1;
    reproduced by always using label=1.
  * L1 terms — models/IPSR.py:247: (L1(fake_B, gt) + L1(fake_P, gt)) * lambda_A.
  * InnerCos / InnerCos2 — models/InnerCos.py:30-41, models/InnerCos2.py:34-46:
    MSE(feat * feat_mask * strength, vgg_gt_relu4_3) where the target is the
    *unmasked* full feature map.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _mse(a, b):
    return jnp.mean(jnp.square(a - b))


def _bce_with_labels(pred, label):
    """BCELoss on probabilities — DELIBERATE DEVIATION from the reference.

    The reference's 'vanilla' branch is broken as written: netD applies
    sigmoid (models/IPSR.py:58-61) but GANLoss then feeds nn.BCELoss the
    relativistic difference `pred - mean(pred_other)` (networks.py:175-183),
    which lies in (-1, 1) and makes BCELoss error (torch asserts inputs in
    [0, 1]) or produce log of a negative value.  No shipped config uses it
    (app.py:42 and both notebooks run 'lsgan').  We keep the capability
    usable by clipping the difference into [1e-7, 1-1e-7] before BCE —
    a corrected behavior, covered by tests/test_train_step.py's vanilla
    tests rather than a faithful_* flag (there is no working reference
    behavior to be faithful to).
    """
    p = jnp.clip(pred, 1e-7, 1 - 1e-7)
    return -jnp.mean(label * jnp.log(p) + (1 - label) * jnp.log(1 - p))


def ra_gan_loss(pred_fake: jnp.ndarray, pred_real: jnp.ndarray,
                target_is_real: bool, gan_type: str = "lsgan") -> jnp.ndarray:
    """Relativistic-average GAN loss, argument order as the reference call
    sites use it: (pred_on_fake, pred_on_real, D-direction?).
    """
    if gan_type in ("lsgan", "wgan_gp"):
        if target_is_real:   # discriminator direction
            return 0.5 * (_mse(pred_real - jnp.mean(pred_fake), 1.0)
                          + _mse(pred_fake - jnp.mean(pred_real), -1.0))
        else:                # generator direction
            return 0.5 * (_mse(pred_real - jnp.mean(pred_fake), -1.0)
                          + _mse(pred_fake - jnp.mean(pred_real), 1.0))
    elif gan_type == "vanilla":
        if target_is_real:
            return 0.5 * (_bce_with_labels(pred_real - jnp.mean(pred_fake), 1.0)
                          + _bce_with_labels(pred_fake - jnp.mean(pred_real), 0.0))
        else:
            return 0.5 * (_bce_with_labels(pred_real - jnp.mean(pred_fake), 0.0)
                          + _bce_with_labels(pred_fake - jnp.mean(pred_real), 1.0))
    raise ValueError(f"unknown gan_type {gan_type!r}")


def l1_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a - b))


def inner_cos_loss(feat: jnp.ndarray, feat_mask: jnp.ndarray,
                   target: jnp.ndarray, strength: float = 1.0) -> jnp.ndarray:
    """InnerCos feature-consistency MSE.

    feat: [B,h,w,C] tap from the generator; feat_mask: [B,h,w] (1=hole);
    target: [B,h,w,C] VGG relu4_3 of the ground truth (full, unmasked —
    models/InnerCos.py:36 compares masked features against the *whole*
    target).
    """
    masked = feat * feat_mask[..., None] * strength
    return _mse(masked, target)
