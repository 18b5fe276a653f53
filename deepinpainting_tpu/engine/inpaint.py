"""The inpainting engine: pure-functional two-stage forward, GAN train step,
and eval step.

Capability parity with the reference trainer models/IPSR.py (the `IPSR`
BaseModel subclass).  The reference drives four stateful networks with
side-channel mask/ref/target registries (models/IPSR.py:155-189); here one
jitted function takes (state, batch, rng) and returns (state, metrics) —
every intermediate is a value.

Reference-faithful data flow (incl. the aliasing the reference creates by
in-place masked_fill on `real_A` during forward, models/IPSR.py:172-176):

  netP input  : gt with the hole filled by fixed ImageNet-mean constants
                (models/IPSR.py:148-150)
  compose     : Syn = stop_grad(fake_P) * mask + gt * (1-mask)
                (Unknowregion/knownregion via .data — detached from netP)
  netG input  : concat([Syn, gt * (1-mask)], channels) — the second half is
                the *zero*-holed image because the reference's
                `masked_fill_(ex_mask, 0)` mutates the aliased input_A in
                place before the concat (models/IPSR.py:173-176)
  D step first, then G step against the *updated* discriminators
                (models/IPSR.py:267-278: backward_D, D/F step, backward_G)
  G's feature-GAN branch is constant w.r.t. G: the reference feeds
                vgg(fake_B.data) computed in backward_D (models/IPSR.py:212,236)
  InnerCos losses are added to loss_G as detached values (models/
                IPSR.py:255-263) — they contribute no gradients in faithful
                mode (cfg.faithful_detached_cosis); corrected mode makes
                them differentiable.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import lax

from ..config import Config
from ..losses import inner_cos_loss, l1_loss, ra_gan_loss
from ..models.discriminators import NLayerDiscriminator, PFDiscriminator
from ..models.unet import UnetGenerator
from ..models.unet_ipsr import UnetGeneratorIPSR
from ..models.vgg16 import Vgg16, apply_vgg16, vgg16_params
from ..ops import masks as M
from .state import (TrainState, create_train_state, has_stats,
                    make_optimizer, params_of, rebuild_vars, variables_of)


class Models(NamedTuple):
    G: UnetGeneratorIPSR
    P: UnetGenerator
    D: NLayerDiscriminator
    F: PFDiscriminator


def build_models(cfg: Config) -> Models:
    """Network factory — the role of define_G/define_D (networks.py:81-119).

    Only the reference's shipped architecture names are supported; unknown
    names raise, mirroring networks.py:96-97,115-117.
    """
    if cfg.which_model_netG != "unet_ipsr":
        raise NotImplementedError(cfg.which_model_netG)
    if cfg.which_model_netP != "unet_256":
        raise NotImplementedError(cfg.which_model_netP)
    if cfg.which_model_netD != "basic":
        raise NotImplementedError(cfg.which_model_netD)
    if cfg.which_model_netF != "feature":
        raise NotImplementedError(cfg.which_model_netF)
    if cfg.norm not in ("instance", "batch"):
        # get_norm_layer raises for unknown norms (networks.py:27-28).
        # 'none' is also rejected here: the reference returns
        # norm_layer=None for it and its own U-Net constructors then crash
        # calling None(...) (networks.py:223), so no runnable reference
        # config exists to be faithful to.
        raise NotImplementedError(
            f"normalization layer [{cfg.norm}] is not found "
            "(supported: 'instance', 'batch')")
    if cfg.init_type not in ("normal", "xavier", "kaiming", "orthogonal"):
        # init_weights raises for unknown init methods (networks.py:66-67).
        raise NotImplementedError(
            f"initialization method [{cfg.init_type}] is not implemented")
    if cfg.quant not in ("none", "int8"):
        raise NotImplementedError(
            f"quant mode [{cfg.quant}] is not implemented "
            "(only 'none' and 'int8' are supported; see ops/quant.py)")
    # unet_256 geometry generalized: one skip level per halving down to 1x1,
    # which keeps the attention level at fine_size/8 (networks.py:195 comment
    # notes the same depth rule for 512).
    import math
    num_downs = max(6, int(math.log2(cfg.fine_size)))
    feat_c = max(1, int(512 * cfg.vgg_width_scale))
    if cfg.ngf * 8 != feat_c:
        raise ValueError(
            f"attention requires ngf*8 ({cfg.ngf * 8}) == VGG relu4_3 "
            f"channels ({feat_c}); adjust ngf or vgg_width_scale")
    use_sigmoid = cfg.gan_type == "vanilla"  # models/IPSR.py:58-61
    return Models(
        G=UnetGeneratorIPSR(input_nc=cfg.input_nc_g, output_nc=cfg.output_nc,
                            num_downs=num_downs, ngf=cfg.ngf,
                            use_dropout=cfg.use_dropout,
                            triple_weight=cfg.triple_weight,
                            truncate_backward=cfg.faithful_backward_truncation,
                            attention_impl=cfg.attention_impl,
                            known_replacement=cfg.faithful_known_replacement,
                            norm=cfg.norm, init_gain=cfg.init_gain,
                            init_type=cfg.init_type, remat=cfg.remat,
                            remat_depth=cfg.remat_depth),
        P=UnetGenerator(input_nc=cfg.input_nc, output_nc=cfg.output_nc,
                        num_downs=num_downs, ngf=cfg.ngf,
                        use_dropout=cfg.use_dropout,
                        norm=cfg.norm, init_gain=cfg.init_gain,
                        init_type=cfg.init_type, remat=cfg.remat,
                        remat_depth=cfg.remat_depth),
        D=NLayerDiscriminator(input_nc=cfg.input_nc, ndf=cfg.ndf,
                              use_sigmoid=use_sigmoid,
                              norm=cfg.norm, init_gain=cfg.init_gain,
                              init_type=cfg.init_type),
        F=PFDiscriminator(width=max(1, int(512 * cfg.vgg_width_scale)),
                          init_gain=cfg.init_gain,
                          init_type=cfg.init_type),
    )


def init_params(cfg: Config, rng: jax.Array) -> Dict[str, Any]:
    models = build_models(cfg)
    s = cfg.fine_size
    fs = s // 8
    c4 = max(1, int(512 * cfg.vgg_width_scale))
    c3 = max(1, int(256 * cfg.vgg_width_scale))

    # One jitted init for everything: eager flax init would dispatch every
    # parameter op individually (very slow over a remote-TPU tunnel).
    @jax.jit
    def _init(rng):
        kG, kP, kD, kF, kV = jax.random.split(rng, 5)
        x6 = jnp.zeros((1, s, s, cfg.input_nc_g))
        x3 = jnp.zeros((1, s, s, cfg.input_nc))
        ref_feat = jnp.zeros((1, fs, fs, c4))
        flag = jnp.zeros((1, fs * fs))
        feat3 = jnp.zeros((1, fs, fs, c3))
        from ..models.vgg16 import init_vgg16

        def keep(variables):
            # norm='batch': the state entry is the full variables dict
            # ({'params', 'batch_stats'}); otherwise the bare params tree
            # (keeps instance-mode checkpoints bit-compatible).
            variables = dict(variables)
            return (variables if "batch_stats" in variables
                    else variables["params"])

        return {
            "G": keep(models.G.init(kG, x6, ref_feat, flag)),
            "P": keep(models.P.init(kP, x3)),
            "D": keep(models.D.init(kD, x3)),
            "F": models.F.init(kF, feat3)["params"],
            "vgg": init_vgg16(kV, width_scale=cfg.vgg_width_scale),
        }

    params = _init(rng)
    if cfg.vgg_weights and cfg.vgg_weights != "random":
        params = dict(params)
        params["vgg"] = vgg16_params(cfg.vgg_weights, rng,
                                     cfg.vgg_width_scale)
    return params


def create_state(cfg: Config, rng: jax.Array) -> TrainState:
    return create_train_state(cfg, init_params(cfg, rng))


# ---------------------------------------------------------------------------
# input preparation (set_input / set_latent_mask equivalents)
# ---------------------------------------------------------------------------

def normalize_image(x: jnp.ndarray) -> jnp.ndarray:
    """uint8 transport -> reference tensor semantics, on device: ToTensor +
    Normalize(0.5,0.5) == x/127.5 - 1 (train.ipynb cell 1).  The same f32
    arithmetic as the host-side transforms.to_normalized_array, so both
    transports produce bit-identical training tensors.  f32 inputs pass
    through (already host-normalized)."""
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 127.5 - 1.0
    return x


def normalize_mask(m: jnp.ndarray) -> jnp.ndarray:
    """Mask `.bool()` binarization (train.ipynb cell 2) for uint8 transport;
    float masks (already binarized at load) pass through."""
    if m.dtype != jnp.float32:
        return (m > 0).astype(jnp.float32)
    return m


def normalize_batch(batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """On-device normalization of a host batch (either transport).  Runs at
    the top of every jitted step so uint8 batches upload 4x fewer bytes and
    XLA fuses the normalize into the first consumers."""
    out = dict(batch)
    for k in ("image", "ref"):
        if k in out:
            out[k] = normalize_image(out[k])
    if "mask" in out:
        out["mask"] = normalize_mask(out["mask"])
    return out


def prepare_masks(cfg: Config, mask: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """mask: [B,H,W] float 1=hole.  Returns (feat_mask [B,h,w], flag [B,h*w])
    — models/IPSR.py:155-158 pushing cal_feat_mask into the three layers."""
    fmask = jax.vmap(lambda m: M.feat_mask(m, 3, cfg.threshold))(mask)
    flag = jax.vmap(lambda f: M.patch_flags(f, cfg.shift_sz, cfg.stride,
                                            cfg.mask_thred))(fmask)
    return fmask, flag


def resolve_mask(cfg: Config, mask: jnp.ndarray) -> jnp.ndarray:
    """mask_type dispatch (models/IPSR.py:136-143): 'center' ignores the
    input mask and uses the fixed center square; 'random' uses it as-is."""
    if cfg.mask_type == "center":
        b, h, w = mask.shape
        return jnp.broadcast_to(M.center_mask(cfg.fine_size, cfg.overlap),
                                (b, h, w))
    if cfg.mask_type == "random":
        return mask
    raise ValueError(f"mask_type {cfg.mask_type!r} not recognized")


class ForwardOut(NamedTuple):
    fake_P: jnp.ndarray
    fake_B: jnp.ndarray
    taps: Dict[str, jnp.ndarray]
    masked_mean: jnp.ndarray   # netP input (real_A pre-aliasing)
    known: jnp.ndarray         # zero-holed gt (post-aliasing real_A)
    syn: jnp.ndarray
    # mutated flax collections from a TRAIN forward: {"G": {...}, "P": {...}}
    # — empty dicts unless norm='batch' (running batch_stats updates, which
    # the train step folds back into the state).  None for eval forwards.
    mutated: Any = None


def two_stage_forward(models: Models, params_G, params_P, gt, mask,
                      ref_feat, flag, *, train: bool, rng: jax.Array,
                      dtype=jnp.float32) -> ForwardOut:
    """Full two-stage forward (models/IPSR.py:168-182).

    `dtype` is the activation compute dtype (cfg.dtype): activations are
    cast at this boundary, convs accumulate in f32, outputs and taps are
    returned in f32 so losses and metrics stay full-precision.

    `params_G`/`params_P` are state entries: bare params trees, or full
    variables dicts when norm='batch' (running stats ride along; train
    forwards return the updated stats in ForwardOut.mutated).
    """
    masked_mean = M.fill_hole_with_mean(gt, mask)
    rng_p, rng_g = jax.random.split(rng)
    if train:
        fake_P, mut_P = models.P.apply(
            variables_of(params_P), masked_mean.astype(dtype), train=True,
            rngs={"dropout": rng_p}, mutable=["batch_stats"])
    else:
        fake_P = models.P.apply(variables_of(params_P),
                                masked_mean.astype(dtype), train=False)
        mut_P = {}
    fake_P = fake_P.astype(jnp.float32)
    known = M.zero_hole(gt, mask)
    m = mask[..., None]
    syn = lax.stop_gradient(fake_P) * m + known          # IPSR.py:172-175
    middle = jnp.concatenate([syn, known], axis=-1)      # IPSR.py:176 (aliased)
    if train:
        (fake_B, taps), mut_G = models.G.apply(
            variables_of(params_G), middle.astype(dtype),
            ref_feat.astype(dtype), flag, train=True,
            rngs={"dropout": rng_g}, mutable=["batch_stats"])
    else:
        fake_B, taps = models.G.apply(
            variables_of(params_G), middle.astype(dtype),
            ref_feat.astype(dtype), flag, train=False)
        mut_G = {}
    fake_B = fake_B.astype(jnp.float32)
    taps = {k: v.astype(jnp.float32) for k, v in taps.items()}
    mutated = {"G": mut_G, "P": mut_P} if train else None
    return ForwardOut(fake_P, fake_B, taps, masked_mean, known, syn, mutated)


# ---------------------------------------------------------------------------
# train / eval steps
# ---------------------------------------------------------------------------

def make_train_step(cfg: Config):
    """Build the jittable train step: optimize_parameters parity
    (models/IPSR.py:267-278) — D/F update first, then G/P against the
    updated discriminators."""
    models = build_models(cfg)
    tx = make_optimizer(cfg)
    dt = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    if cfg.quant != "none":
        # gradients through round() are zero — int8 is inference-only PTQ
        raise NotImplementedError(
            f"quant={cfg.quant!r} is inference-only (ops/quant.py); "
            "training runs full precision")
    if cfg.grad_accum > 1:
        return _make_accum_train_step(cfg, models, tx, dt)

    from ..ops.convs import constrain_batch_only, conv_modes

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   rng: jax.Array):
        with conv_modes(cfg):
            return _train_step(state, batch, rng)

    def _train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                    rng: jax.Array):
        batch = normalize_batch(batch)
        gt = batch["image"]
        ref = batch["ref"]
        mask = resolve_mask(cfg, batch["mask"])
        fmask, flag = prepare_masks(cfg, mask)

        vgg_ref = apply_vgg16(state.vgg, ref, cfg.vgg_width_scale)            # set_ref_latent
        vgg_gt = apply_vgg16(state.vgg, gt, cfg.vgg_width_scale)              # set_gt_latent
        ref_feat = vgg_ref.relu4_3
        gt_target = vgg_gt.relu4_3

        # ONE forward for the whole step (the reference also runs a single
        # forward per optimize_parameters, models/IPSR.py:267-278): jax.vjp
        # records the primal + residuals now, the D phase consumes the
        # (detached) primal outputs, and the G phase pulls its gradients
        # back through the stored residuals — no second forward.  With
        # norm='batch' the updated G/P running stats ride the aux output
        # (they get no gradients — torch updates buffers under no_grad).
        def fwd_fn(params_G, params_P):
            out = two_stage_forward(models, params_G, params_P, gt, mask,
                                    ref_feat, flag, train=True, rng=rng,
                                    dtype=dt)
            return (out.fake_B, out.fake_P, out.taps), out.mutated

        (fake_B, fake_P, taps), fwd_vjp, fwd_mut = jax.vjp(
            fwd_fn, state.params_G, state.params_P, has_aux=True)
        fake_B_const = lax.stop_gradient(fake_B)
        # IPSR.py:212 — only relu3_3 of the fake image is ever consumed
        # (netF input), so stop the extractor before the conv4_* block
        vgg_fake = apply_vgg16(state.vgg, fake_B_const, cfg.vgg_width_scale,
                               upto=3)

        # ---- D / F phase (backward_D, models/IPSR.py:209-231) ----
        # D forwards run train-mode, fake-then-real, chaining the running
        # stats exactly as the reference's two train-mode netD calls do
        # (IPSR.py:211-218); stats ride the aux, gradients don't see them.
        # With norm='batch' under SP, the discriminator runs batch-parallel
        # only (ops/convs.py constrain_batch_only: its uneven conv-tail
        # heights corrupt the GSPMD-sharded stat reductions); no-op
        # elsewhere.
        if cfg.norm == "batch":
            fake_for_D = constrain_batch_only(fake_B_const)
            gt_for_D = constrain_batch_only(gt)
        else:
            fake_for_D, gt_for_D = fake_B_const, gt

        def d_loss_fn(params_D, params_F):
            vD = variables_of(params_D)
            pred_fake, mutD = models.D.apply(vD, fake_for_D, True,
                                             mutable=["batch_stats"])
            pred_real, mutD = models.D.apply({**vD, **mutD}, gt_for_D, True,
                                             mutable=["batch_stats"])
            loss_D_img = ra_gan_loss(pred_fake, pred_real, True, cfg.gan_type)
            pred_fake_f = models.F.apply({"params": params_F},
                                         lax.stop_gradient(vgg_fake.relu3_3))
            pred_real_f = models.F.apply({"params": params_F},
                                         vgg_gt.relu3_3)
            loss_F_feat = ra_gan_loss(pred_fake_f, pred_real_f, True,
                                      cfg.gan_type)
            return 0.5 * loss_D_img + 0.5 * loss_F_feat, (loss_D_img,
                                                          loss_F_feat, mutD)

        (_, (loss_D_img, loss_F_feat, mutD)), (gD, gF) = jax.value_and_grad(
            d_loss_fn, argnums=(0, 1), has_aux=True)(
                state.params_D, state.params_F)
        updD, optD = tx.update(params_of(gD), state.opt_D,
                               params_of(state.params_D))
        updF, optF = tx.update(gF, state.opt_F, state.params_F)
        new_D = rebuild_vars(state.params_D,
                             optax.apply_updates(params_of(state.params_D),
                                                 updD), mutD)
        new_F = optax.apply_updates(state.params_F, updF)

        # ---- G / P phase (backward_G, models/IPSR.py:233-265) ----
        # Loss as a function of the forward *outputs*; its output-cotangents
        # are pulled back through fwd_vjp to reach params_G/params_P.  The
        # reference's backward_G runs two more train-mode netD forwards
        # AFTER optimizer_D.step() (IPSR.py:235-238), so D's running stats
        # continue from the D phase's and update twice more here.
        vD_g = variables_of(new_D)

        def g_loss_fn(fake_B, fake_P, taps):
            fake_in = (constrain_batch_only(fake_B)
                       if cfg.norm == "batch" else fake_B)
            pred_fake, mD = models.D.apply(vD_g, fake_in, True,
                                           mutable=["batch_stats"])
            pred_real, mD = models.D.apply({**vD_g, **mD}, gt_for_D, True,
                                           mutable=["batch_stats"])
            # feature branch is constant w.r.t. G (vgg of detached fake_B)
            pred_fake_f = models.F.apply({"params": new_F}, vgg_fake.relu3_3)
            pred_real_f = models.F.apply({"params": new_F}, vgg_gt.relu3_3)
            loss_G_GAN = (ra_gan_loss(pred_fake, pred_real, False, cfg.gan_type)
                          + ra_gan_loss(pred_fake_f, pred_real_f, False,
                                        cfg.gan_type))
            loss_G_L1 = (l1_loss(fake_B, gt)
                         + l1_loss(fake_P, gt)) * cfg.lambda_A
            loss_G = loss_G_L1 + loss_G_GAN * cfg.gan_weight
            cos = jnp.zeros(())
            if cfg.cosis and not cfg.skip:
                cos1 = inner_cos_loss(taps["inner_cos"], fmask,
                                      gt_target, cfg.strength)
                cos2 = inner_cos_loss(taps["inner_cos2"], fmask,
                                      gt_target, cfg.strength)
                cos = cos1 + cos2
                if cfg.faithful_detached_cosis:
                    cos = lax.stop_gradient(cos)  # IPSR.py:255-263
                loss_G = loss_G + cos
            return loss_G, (loss_G_GAN, loss_G_L1, cos, mD)

        ((_, (loss_G_GAN, loss_G_L1, loss_cos, mutD_g)),
         out_cots) = jax.value_and_grad(
            g_loss_fn, argnums=(0, 1, 2), has_aux=True)(fake_B, fake_P, taps)
        gG, gP = fwd_vjp(out_cots)
        updG, optG = tx.update(params_of(gG), state.opt_G,
                               params_of(state.params_G))
        updP, optP = tx.update(params_of(gP), state.opt_P,
                               params_of(state.params_P))
        new_G = rebuild_vars(state.params_G,
                             optax.apply_updates(params_of(state.params_G),
                                                 updG), fwd_mut["G"])
        new_P = rebuild_vars(state.params_P,
                             optax.apply_updates(params_of(state.params_P),
                                                 updP), fwd_mut["P"])
        new_D = rebuild_vars(new_D, params_of(new_D), mutD_g)

        new_state = state.replace(
            step=state.step + 1,
            params_G=new_G, params_P=new_P, params_D=new_D, params_F=new_F,
            opt_G=optG, opt_P=optP, opt_D=optD, opt_F=optF)
        # get_current_errors parity (models/IPSR.py:281-286) + extras
        metrics = {
            "G_GAN": loss_G_GAN, "G_L1": loss_G_L1,
            "D": loss_D_img, "F": loss_F_feat, "cosis": loss_cos,
            # validation-style L1 ("GAN" in get_loss, models/IPSR.py:205-207)
            "loss": loss_G_L1,
        }
        return new_state, metrics

    return train_step


def _make_accum_train_step(cfg: Config, models: Models, tx, dt):
    """Gradient-accumulated train step (Config.grad_accum = k > 1).

    Beyond-reference capability: splits the batch into k microbatches and
    averages gradients, so peak activation memory is ~1/k of the full
    batch — the complement of Config.remat for >=512px training.  The
    reference's optimize_parameters semantics (models/IPSR.py:267-278)
    are preserved exactly: D/F gradients come from the pre-update
    discriminators (scan 1), the D/F update applies, and the G/P phase
    (scan 2) scores against the UPDATED discriminators.  Because only
    one microbatch of forward residuals may live at a time, the G phase
    re-runs the forward (the k=1 step instead shares one jax.vjp forward
    between phases); the same per-microbatch rng is used in both scans,
    so dropout masks — and therefore fake_B — are identical across
    phases, like the reference's single forward.

    Note the relativistic-average GAN losses (networks.py:175-183) take
    batch means *inside* the loss, so a k-accumulated step is not
    mathematically identical to one k-times-larger batch (true of
    gradient accumulation in any relativistic-GAN trainer); L1 and
    InnerCos terms accumulate exactly.

    norm='batch' composes with torch-faithful semantics: each microbatch
    normalizes by ITS OWN batch statistics and the running stats update
    once per train-mode forward, sequentially in microbatch order —
    exactly what a torch trainer calling forward k times per
    optimizer.step() computes (and therefore a *different function* from
    the fused full-batch step; the pair used to be rejected for this
    reason, now it is implemented with the semantics stated here).  The
    G/P stats thread through the D-phase scan and commit from there (the
    G-phase scan re-runs the same forwards with the same rngs — BN
    train-mode outputs don't depend on the incoming running stats, so
    fake_B is identical and committing its duplicate updates would
    double-count); D's stats chain fake->real per microbatch in the D
    phase and twice more per microbatch in the G phase, generalizing the
    fused step's 4-updates-per-step call order (models/IPSR.py:211-238).
    """
    k = cfg.grad_accum
    bn = cfg.norm == "batch"

    def _stats_of(entry):
        return entry["batch_stats"] if has_stats(entry) else {}

    def _with_stats(entry, stats):
        if not has_stats(entry):
            return entry
        return {"params": entry["params"], "batch_stats": stats}

    def _mut_stats(mutated, prev):
        return (mutated["batch_stats"]
                if mutated and "batch_stats" in mutated else prev)

    def _prep(batch):
        batch = normalize_batch(batch)
        gt = batch["image"]
        ref = batch["ref"]
        mask = resolve_mask(cfg, batch["mask"])
        fmask, flag = prepare_masks(cfg, mask)
        return gt, ref, mask, fmask, flag

    def _d_grads(state, stats, mb, rng):
        stG, stP, stD = stats
        gt, ref, mask, _, flag = _prep(mb)
        # upto=3: the D phase consumes only relu3_3 of gt (gt's relu4_3 is
        # recomputed in the G phase anyway) — running the three 512-channel
        # conv4_* layers here would be dead compute k times per step.
        vgg_gt = apply_vgg16(state.vgg, gt, cfg.vgg_width_scale, upto=3)
        ref_feat = apply_vgg16(state.vgg, ref, cfg.vgg_width_scale).relu4_3
        out = two_stage_forward(models, _with_stats(state.params_G, stG),
                                _with_stats(state.params_P, stP),
                                gt, mask, ref_feat, flag, train=True,
                                rng=rng, dtype=dt)
        stG = _mut_stats(out.mutated["G"], stG)
        stP = _mut_stats(out.mutated["P"], stP)
        fake_B_const = lax.stop_gradient(out.fake_B)
        vgg_fake = apply_vgg16(state.vgg, fake_B_const, cfg.vgg_width_scale,
                               upto=3)
        if bn:
            fake_for_D = constrain_batch_only(fake_B_const)
            gt_for_D = constrain_batch_only(gt)
        else:
            fake_for_D, gt_for_D = fake_B_const, gt

        def d_loss_fn(params_D, params_F):
            vD = ({"params": params_D, "batch_stats": stD} if bn
                  else {"params": params_D})
            pred_fake, mutD = models.D.apply(vD, fake_for_D, True,
                                             mutable=["batch_stats"])
            pred_real, mutD = models.D.apply({**vD, **mutD}, gt_for_D, True,
                                             mutable=["batch_stats"])
            loss_D_img = ra_gan_loss(pred_fake, pred_real, True, cfg.gan_type)
            pred_fake_f = models.F.apply({"params": params_F},
                                         lax.stop_gradient(vgg_fake.relu3_3))
            pred_real_f = models.F.apply({"params": params_F},
                                         vgg_gt.relu3_3)
            loss_F_feat = ra_gan_loss(pred_fake_f, pred_real_f, True,
                                      cfg.gan_type)
            return 0.5 * loss_D_img + 0.5 * loss_F_feat, (loss_D_img,
                                                          loss_F_feat, mutD)

        (_, (loss_D_img, loss_F_feat, mutD)), grads = jax.value_and_grad(
            d_loss_fn, argnums=(0, 1), has_aux=True)(
                params_of(state.params_D), state.params_F)
        stD = _mut_stats(mutD, stD)
        return grads, (loss_D_img, loss_F_feat), (stG, stP, stD)

    def _g_grads(state, new_D, new_F, stD, mb, rng):
        gt, ref, mask, fmask, flag = _prep(mb)
        vgg_gt = apply_vgg16(state.vgg, gt, cfg.vgg_width_scale)
        ref_feat = apply_vgg16(state.vgg, ref, cfg.vgg_width_scale).relu4_3
        gt_target = vgg_gt.relu4_3

        def fwd_fn(params_G, params_P):
            out = two_stage_forward(models, params_G, params_P, gt, mask,
                                    ref_feat, flag, train=True, rng=rng,
                                    dtype=dt)
            # mutated G/P stats are deliberately dropped here: this scan
            # re-runs the D-phase forwards bit-identically (same rng; BN
            # train outputs don't read the running stats), so their stat
            # updates were already taken in the D phase.
            return out.fake_B, out.fake_P, out.taps

        (fake_B, fake_P, taps), fwd_vjp = jax.vjp(
            fwd_fn, state.params_G, state.params_P)
        vgg_fake = apply_vgg16(state.vgg, lax.stop_gradient(fake_B),
                               cfg.vgg_width_scale, upto=3)
        vD = {"params": new_D, "batch_stats": stD} if bn else {"params": new_D}
        gt_for_D = constrain_batch_only(gt) if bn else gt

        def g_loss_fn(fake_B, fake_P, taps):
            fake_in = constrain_batch_only(fake_B) if bn else fake_B
            pred_fake, mD = models.D.apply(vD, fake_in, True,
                                           mutable=["batch_stats"])
            pred_real, mD = models.D.apply({**vD, **mD}, gt_for_D, True,
                                           mutable=["batch_stats"])
            pred_fake_f = models.F.apply({"params": new_F}, vgg_fake.relu3_3)
            pred_real_f = models.F.apply({"params": new_F}, vgg_gt.relu3_3)
            loss_G_GAN = (ra_gan_loss(pred_fake, pred_real, False,
                                      cfg.gan_type)
                          + ra_gan_loss(pred_fake_f, pred_real_f, False,
                                        cfg.gan_type))
            loss_G_L1 = (l1_loss(fake_B, gt)
                         + l1_loss(fake_P, gt)) * cfg.lambda_A
            loss_G = loss_G_L1 + loss_G_GAN * cfg.gan_weight
            cos = jnp.zeros(())
            if cfg.cosis and not cfg.skip:
                cos1 = inner_cos_loss(taps["inner_cos"], fmask,
                                      gt_target, cfg.strength)
                cos2 = inner_cos_loss(taps["inner_cos2"], fmask,
                                      gt_target, cfg.strength)
                cos = cos1 + cos2
                if cfg.faithful_detached_cosis:
                    cos = lax.stop_gradient(cos)  # IPSR.py:255-263
                loss_G = loss_G + cos
            return loss_G, (loss_G_GAN, loss_G_L1, cos, mD)

        ((_, (loss_G_GAN, loss_G_L1, cos, mD)), out_cots) = jax.value_and_grad(
            g_loss_fn, argnums=(0, 1, 2), has_aux=True)(fake_B, fake_P, taps)
        grads = fwd_vjp(out_cots)
        return grads, (loss_G_GAN, loss_G_L1, cos), _mut_stats(mD, stD)

    def _mean_tree(tree):
        return jax.tree.map(lambda x: x / k, tree)

    from ..ops.convs import constrain_batch_only, conv_modes

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   rng: jax.Array):
        with conv_modes(cfg):
            return _train_step(state, batch, rng)

    def _train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                    rng: jax.Array):
        b = batch["image"].shape[0]
        if b % k:
            raise ValueError(
                f"batch_size {b} is not divisible by grad_accum {k}")
        micro = jax.tree.map(
            lambda x: x.reshape((k, b // k) + x.shape[1:]), batch)
        rngs = jax.random.split(rng, k)
        stats0 = (_stats_of(state.params_G), _stats_of(state.params_P),
                  _stats_of(state.params_D))

        # ---- scan 1: D/F gradients vs the pre-update discriminators ----
        # (running batch_stats — empty trees unless norm='batch' — thread
        # through the carry so microbatch i+1's updates chain off i's)
        zero_df = jax.tree.map(jnp.zeros_like,
                               (params_of(state.params_D), state.params_F))

        def d_body(carry, xs):
            mb, r = xs
            acc, aux_acc, stats = carry
            grads, aux, stats = _d_grads(state, stats, mb, r)
            acc = jax.tree.map(jnp.add, acc, grads)
            aux_acc = jax.tree.map(jnp.add, aux_acc, aux)
            return (acc, aux_acc, stats), None

        (((gD, gF), (loss_D_img, loss_F_feat),
          (stG, stP, stD)), _) = lax.scan(
            d_body, (zero_df, (jnp.zeros(()), jnp.zeros(())), stats0),
            (micro, rngs))
        gD, gF = _mean_tree((gD, gF))
        loss_D_img, loss_F_feat = loss_D_img / k, loss_F_feat / k
        updD, optD = tx.update(gD, state.opt_D, params_of(state.params_D))
        updF, optF = tx.update(gF, state.opt_F, state.params_F)
        new_D = optax.apply_updates(params_of(state.params_D), updD)
        new_F = optax.apply_updates(state.params_F, updF)

        # ---- scan 2: G/P gradients vs the UPDATED discriminators ----
        # D's stats continue from scan 1's final (the fused step's 4-call
        # chain, generalized); G/P stats were fully taken in scan 1.
        zero_gp = jax.tree.map(jnp.zeros_like,
                               (state.params_G, state.params_P))

        def g_body(carry, xs):
            mb, r = xs
            acc, aux_acc, st_d = carry
            grads, aux, st_d = _g_grads(state, new_D, new_F, st_d, mb, r)
            acc = jax.tree.map(jnp.add, acc, grads)
            aux_acc = jax.tree.map(jnp.add, aux_acc, aux)
            return (acc, aux_acc, st_d), None

        (((gG, gP), (loss_G_GAN, loss_G_L1, loss_cos), stD), _) = lax.scan(
            g_body, (zero_gp, (jnp.zeros(()), jnp.zeros(()), jnp.zeros(())),
                     stD),
            (micro, rngs))
        gG, gP = _mean_tree((params_of(gG), params_of(gP)))
        loss_G_GAN, loss_G_L1, loss_cos = (loss_G_GAN / k, loss_G_L1 / k,
                                           loss_cos / k)
        updG, optG = tx.update(gG, state.opt_G, params_of(state.params_G))
        updP, optP = tx.update(gP, state.opt_P, params_of(state.params_P))
        new_G = rebuild_vars(
            state.params_G,
            optax.apply_updates(params_of(state.params_G), updG),
            {"batch_stats": stG} if bn else None)
        new_P = rebuild_vars(
            state.params_P,
            optax.apply_updates(params_of(state.params_P), updP),
            {"batch_stats": stP} if bn else None)
        new_D = rebuild_vars(state.params_D, new_D,
                             {"batch_stats": stD} if bn else None)

        new_state = state.replace(
            step=state.step + 1,
            params_G=new_G, params_P=new_P, params_D=new_D, params_F=new_F,
            opt_G=optG, opt_P=optP, opt_D=optD, opt_F=optF)
        metrics = {
            "G_GAN": loss_G_GAN, "G_L1": loss_G_L1,
            "D": loss_D_img, "F": loss_F_feat, "cosis": loss_cos,
            "loss": loss_G_L1,
        }
        return new_state, metrics

    return train_step


def make_eval_step(cfg: Config):
    """model.test() parity (models/IPSR.py:192-207): deterministic forward,
    plus the GAN-style error (loss_IPSR) and the L1 validation loss."""
    models = build_models(cfg)
    dt = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    from ..ops.convs import conv_modes

    def eval_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        with conv_modes(cfg):
            return _eval_step(state, batch)

    def _eval_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        batch = normalize_batch(batch)
        gt = batch["image"]
        ref = batch["ref"]
        mask = resolve_mask(cfg, batch["mask"])
        _, flag = prepare_masks(cfg, mask)
        ref_feat = apply_vgg16(state.vgg, ref, cfg.vgg_width_scale).relu4_3
        fwd = two_stage_forward(models, state.params_G, state.params_P,
                                gt, mask, ref_feat, flag, train=False,
                                rng=jax.random.PRNGKey(0), dtype=dt)
        # loss_IPSR = criterionGAN(real_B, fake_B, False) — IPSR.py:203
        loss_ipsr = ra_gan_loss(gt, fwd.fake_B, False, cfg.gan_type)
        loss_valid = (l1_loss(fwd.fake_B, gt)
                      + l1_loss(fwd.fake_P, gt)) * cfg.lambda_A
        # per-sample PSNR/SSIM computed in-graph (test.ipynb cell 3
        # formulas): the evaluator then needs ONE device call per batch
        # instead of a metric dispatch per image.
        from ..utils.metrics import psnr, ssim
        psnr_v, ssim_v = jax.vmap(
            lambda a, b: (psnr(a[None], b[None]), ssim(a[None], b[None])))(
                gt, fwd.fake_B)
        visuals = {
            # get_current_visuals parity (models/IPSR.py:288-295); real_A is
            # the post-aliasing zero-holed input the reference would hold.
            "real_A": fwd.known, "real_Ref": ref, "fake_B": fwd.fake_B,
            "fake_P": fwd.fake_P, "real_B": gt,
        }
        return {"fake_B": fwd.fake_B, "fake_P": fwd.fake_P,
                "loss_ipsr": loss_ipsr, "loss_valid": loss_valid,
                "psnr": psnr_v, "ssim": ssim_v,
                "visuals": visuals}

    return eval_step


def make_coarse_fn(cfg: Config):
    """Coarse-stage-only inference: netP on a masked image (BASELINE
    config 1, the role of the reference's TestModel path — which is dead
    code there, models/test_model.py:17-23 calls define_G with a stale
    signature and is never constructed; see SURVEY.md §2.5).

    Returns fn(params_P, gt, mask) -> (fake_P, composite)."""
    models = build_models(cfg)
    dt = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    from ..ops.convs import conv_modes

    def coarse(params_P, gt, mask):
        with conv_modes(cfg):
            return _coarse(params_P, gt, mask)

    def _coarse(params_P, gt, mask):
        gt = normalize_image(gt)
        mask = resolve_mask(cfg, normalize_mask(mask))
        masked_mean = M.fill_hole_with_mean(gt, mask)
        fake_P = models.P.apply(variables_of(params_P),
                                masked_mean.astype(dt), train=False)
        fake_P = fake_P.astype(jnp.float32)
        m = mask[..., None]
        composite = fake_P * m + gt * (1.0 - m)
        return fake_P, composite

    return coarse


def make_inference_fn(cfg: Config):
    """Minimal jittable inference: (state-params, gt, mask, ref) -> fake_B."""
    models = build_models(cfg)
    dt = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    from ..ops.convs import conv_modes

    def infer(params_G, params_P, vgg, gt, mask, ref):
        with conv_modes(cfg):
            return _infer(params_G, params_P, vgg, gt, mask, ref)

    def _infer(params_G, params_P, vgg, gt, mask, ref):
        gt, ref = normalize_image(gt), normalize_image(ref)
        mask = resolve_mask(cfg, normalize_mask(mask))
        _, flag = prepare_masks(cfg, mask)
        # inference-only: VGG also runs in the compute dtype
        ref_feat = apply_vgg16(vgg, ref.astype(dt),
                               cfg.vgg_width_scale).relu4_3
        fwd = two_stage_forward(models, params_G, params_P, gt, mask,
                                ref_feat, flag, train=False,
                                rng=jax.random.PRNGKey(0), dtype=dt)
        return fwd.fake_B, fwd.fake_P

    return infer


def make_serving_fn(cfg: Config):
    """The uint8-in / uint8-out single-call serving primitive.

    Wraps make_inference_fn with device-side tensor2im quantization
    (util/util.py:15-20 math; floor matches numpy's truncating astype):
    the result crosses device->host as 1 byte/px instead of 4, which is
    the serving request critical path over a remote link (BENCH_NOTES.md
    "serving request-level latency").  Shared by the live WSGI session
    (serve/app.py) and the AOT export artifact (engine/export_model.py).
    """
    infer = make_inference_fn(cfg)

    def serve_fn(params_G, params_P, vgg, gt, mask, ref):
        fake_B, _ = infer(params_G, params_P, vgg, gt, mask, ref)
        return jnp.floor(jnp.clip((fake_B + 1.0) * 127.5,
                                  0.0, 255.0)).astype(jnp.uint8)

    return serve_fn
