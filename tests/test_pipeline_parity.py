"""Composed-pipeline parity vs the LIVE reference IPSR model (CPU).

Per-component parity (test_net_import.py, test_masks.py, test_attention.py)
cannot catch integration bugs in the *composition* — set_input's mean-fill
(models/IPSR.py:148-150), the in-place masked_fill aliasing of input_A
during forward (models/IPSR.py:172-176,196-200), the compose step, the
VGG-latent plumbing into attention and the InnerCos taps, and the
D-then-G loss bookkeeping of optimize_parameters (models/IPSR.py:267-278).
This file runs the reference's full composed chains on CPU (CUDA stubbed,
torchvision faked with a random-weight VGG16 whose weights are imported
into BOTH stacks) and asserts:

  (a) `test()` chain parity: set_input -> set_ref_latent -> set_gt_latent
      -> test() (models/IPSR.py:120-203, the test.ipynb cell 3 sequence)
      against our make_eval_step on identical weights/inputs — fake_P,
      fake_B, loss_IPSR and the L1 validation loss.
  (b) one `optimize_parameters()` step (models/IPSR.py:267-278) against
      our train_step: the loss scalars D, F, G_GAN, G_L1 and the InnerCos
      sum, including G_GAN's use of the *updated* discriminators.

Both run at the production scale (ngf=64 — the reference's InnerCos2
hardcodes narrow(1,0,512), models/InnerCos2.py:38 — at 256px, batch 1).
This is the strongest quality-parity evidence available in this image
(torch runs; pretrained VGG weights and the Paris StreetView data do not
exist here — see tests/test_quality_parity.py for the real-asset harness).
"""

import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from deepinpainting_tpu.config import Config
from deepinpainting_tpu.convert.net_import import torch_module_to_params
from deepinpainting_tpu.convert.vgg_import import convert_vgg16_state_dict
from deepinpainting_tpu.engine.inpaint import (build_models, make_eval_step,
                                               make_train_step)
from deepinpainting_tpu.engine.state import create_train_state

from reference_harness import load_reference

# ---------------------------------------------------------------------------
# reference import with CUDA + torchvision stubbed
# ---------------------------------------------------------------------------

_VGG_FEATURES = None


def _build_fake_vgg_features(seed: int = 11) -> torch.nn.Sequential:
    """The torchvision vgg16 `features` Sequential layout (conv/ReLU/pool
    indices 0..30 — the reference slices at 5/10/17/23, models/vgg16.py:
    13-20) with deterministic random weights: no pretrained weights exist
    in this image, but BOTH stacks get the SAME weights, so the composed
    pipelines remain comparable."""
    torch.manual_seed(seed)
    plan = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512, "M"]
    layers = []
    cin = 3
    for v in plan:
        if v == "M":
            layers.append(torch.nn.MaxPool2d(2, 2))
        else:
            conv = torch.nn.Conv2d(cin, v, 3, padding=1)
            # variance-preserving init: torch's default conv init decays
            # ReLU-chain activations ~6x per layer, which would leave
            # relu4_3 at denormal-ish magnitudes after 10 convs
            torch.nn.init.kaiming_normal_(conv.weight, nonlinearity="relu")
            layers.append(conv)
            layers.append(torch.nn.ReLU(inplace=True))
            cin = v
    return torch.nn.Sequential(*layers)


def _install_fake_torchvision():
    global _VGG_FEATURES
    if _VGG_FEATURES is not None:
        return
    _VGG_FEATURES = _build_fake_vgg_features()
    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")

    def vgg16(pretrained=True, **_kw):
        return types.SimpleNamespace(features=_VGG_FEATURES)

    tvm.vgg16 = vgg16
    tv.models = tvm
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.models", tvm)


load_reference()
_install_fake_torchvision()

from models.models import create_model  # noqa: E402  (the reference)


def _create_reference_model(opt):
    """models/IPSR.py:19 hardcodes torch.device('cuda'); on CPU-only torch
    the .to(device) calls would raise, so during construction every device
    request is routed to cpu, then the patch is restored (a session-long
    patch breaks torch modules whose `str | torch.device` annotations
    evaluate at import).  CPU .to(cpu) returns `self`, preserving the
    aliasing the reference's masked_fill_ mutations rely on — the exact
    behavior under test."""
    # pre-import everything initialize() touches lazily, while torch.device
    # is still the real type (Adam construction pulls in torch._dynamo,
    # whose annotations evaluate `str | torch.device` at import)
    import torch.optim  # noqa: F401
    import torch.optim.lr_scheduler  # noqa: F401
    try:
        import torch._dynamo  # noqa: F401
        import torch._dynamo.device_interface  # noqa: F401
    except Exception:
        pass
    orig = torch.device
    torch.device = lambda *a, **k: orig("cpu")
    try:
        model = create_model(opt)
    finally:
        torch.device = orig
    model.device = orig("cpu")
    return model


S = 256
NGF = 64


class Opt:
    """The reference Opion surface (app.py:1-60 field names) trimmed to the
    fields IPSR.initialize and networks.define_* actually read."""
    isTrain = True
    batchSize = 1
    input_nc = 3
    output_nc = 3
    input_nc_g = 6
    fineSize = S
    overlap = 4
    mask_type = "random"
    gpu_ids = []
    model = "ipsr_net"
    which_model_netG = "unet_ipsr"
    which_model_netP = "unet_256"
    which_model_netD = "basic"
    which_model_netF = "feature"
    norm = "instance"
    use_dropout = False
    init_type = "normal"
    init_gain = 0.02
    n_layers_D = "3"
    gan_type = "lsgan"
    gan_weight = 0.2
    lambda_A = 100
    cosis = 1
    strength = 1
    skip = 0
    threshold = 5 / 16.0
    stride = 1
    shift_sz = 1
    mask_thred = 1
    triple_weight = 1
    fixed_mask = 1
    lr = 2e-4
    beta1 = 0.5
    lr_policy = "lambda"
    lr_decay_iters = 50
    niter = 20
    niter_decay = 100
    epoch_count = 1
    continue_train = False
    which_epoch = ""
    checkpoints_dir = "/tmp/ref_ck"
    name = "parity"
    ngf = NGF
    ndf = NGF


CFG = Config(fine_size=S, ngf=NGF, ndf=NGF, batch_size=1,
             mask_type="random", attention_impl="lax")


def _batch(seed=0):
    r = np.random.default_rng(seed)
    img = r.uniform(-1, 1, (1, S, S, 3)).astype(np.float32)
    ref = r.uniform(-1, 1, (1, S, S, 3)).astype(np.float32)
    mask = np.zeros((1, S, S), np.float32)
    mask[:, 80:150, 96:170] = 1.0          # off-center rectangular hole
    mask[:, 180:200, 40:90] = 1.0          # plus a second component
    return {"image": img, "mask": mask, "ref": ref}


def nchw(x):
    return torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2))


def to_nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


@pytest.fixture(scope="module")
def stacks():
    """(reference IPSR model, our TrainState with the SAME weights, batch).

    ORDER CONSTRAINT: the train-step test runs reference
    optimize_parameters(), which mutates the torch weights in place, so
    the inference-parity test must run FIRST (pytest's definition order
    guarantees this within the file; our TrainState is never mutated)."""
    torch.manual_seed(7)
    with torch.no_grad():
        ref_model = _create_reference_model(Opt())

    models = build_models(CFG)
    s, fs = S, S // 8
    k = jax.random.PRNGKey(0)
    tG = models.G.init(k, jnp.zeros((1, s, s, 6)),
                       jnp.zeros((1, fs, fs, 512)),
                       jnp.zeros((1, fs * fs)))["params"]
    tP = models.P.init(k, jnp.zeros((1, s, s, 3)))["params"]
    tD = models.D.init(k, jnp.zeros((1, s, s, 3)))["params"]
    tF = models.F.init(k, jnp.zeros((1, fs, fs, 256)))["params"]
    sd = {"features." + n: p for n, p in _VGG_FEATURES.state_dict().items()}
    params = {
        "G": torch_module_to_params(ref_model.netG, tG),
        "P": torch_module_to_params(ref_model.netP, tP),
        "D": torch_module_to_params(ref_model.netD, tD),
        "F": torch_module_to_params(ref_model.netF, tF),
        "vgg": {kk: jnp.asarray(v)
                for kk, v in convert_vgg16_state_dict(sd).items()},
    }
    return ref_model, create_train_state(CFG, params), _batch()


def _run_reference_chain(ref_model, batch):
    """set_input -> set_ref_latent -> set_gt_latent (the train.ipynb cell 2
    / test.ipynb cell 3 per-item sequence, SURVEY.md §3.1-3.2)."""
    image = nchw(batch["image"]).clone()     # set_input mutates input_A
    ref = nchw(batch["ref"]).clone()
    mask = torch.from_numpy(batch["mask"])[:, None].bool()
    ref_model.set_input(image, mask, ref)
    ref_model.set_ref_latent()
    ref_model.set_gt_latent()


def test_composed_inference_parity(stacks):
    """(a) full test() chain vs our eval step — models/IPSR.py:120-203."""
    ref_model, state, batch = stacks
    _run_reference_chain(ref_model, batch)
    with torch.no_grad():
        ref_model.test()
    want_P = to_nhwc(ref_model.fake_P)
    want_B = to_nhwc(ref_model.fake_B)
    want_ipsr = float(ref_model.get_error())
    want_valid = float(ref_model.get_loss()["GAN"])

    out = make_eval_step(CFG)(state, {k: jnp.asarray(v)
                                      for k, v in batch.items()})
    got_P = np.asarray(out["fake_P"])
    got_B = np.asarray(out["fake_B"])

    np.testing.assert_allclose(got_P, want_P, rtol=1e-3, atol=2e-4)
    # fake_B compounds netP -> compose -> netG(+attention) float error
    np.testing.assert_allclose(got_B, want_B, rtol=1e-2, atol=5e-3)
    np.testing.assert_allclose(float(out["loss_ipsr"]), want_ipsr, rtol=1e-3)
    np.testing.assert_allclose(float(out["loss_valid"]), want_valid,
                               rtol=1e-3)


class _ArrayDataset:
    """In-memory dataset for the evaluator: ref = image itself (the
    SelfRefDataset semantics of test.ipynb cell 3)."""

    def __init__(self, imgs, masks):
        self.imgs, self.masks = imgs, masks

    def __len__(self):
        return len(self.imgs)

    def __getitem__(self, i):
        return {"image": self.imgs[i], "mask": self.masks[i],
                "ref": self.imgs[i]}


def _eval_protocol_data(n=30, seed=3):
    """n synthetic images with structure (smooth fields + shapes) and
    per-image random rectangular masks."""
    r = np.random.default_rng(seed)
    imgs, masks = [], []
    yy, xx = np.mgrid[0:S, 0:S] / S
    for i in range(n):
        a, b, c = r.uniform(-1, 1, 3)
        img = np.stack([np.sin(4 * a * xx + 2 * b * yy + c + ch)
                        for ch in range(3)], axis=-1)
        img += r.normal(0, 0.05, img.shape)
        imgs.append(np.clip(img, -1, 1).astype(np.float32))
        m = np.zeros((S, S), np.float32)
        y0, x0 = r.integers(40, 120, 2)
        m[y0:y0 + 80, x0:x0 + 90] = 1.0
        masks.append(m)
    return imgs, masks


@pytest.mark.slow
def test_eval_protocol_metric_parity(stacks):
    """VERDICT r4 missing #1: BOTH stacks' full eval loops — the torch
    test.ipynb cell-3 protocol (set_input(image, mask, image) ->
    set_ref_latent -> set_gt_latent -> test() -> PSNR=10*log10(4/mse),
    IQA_pytorch SSIM, running sums -> averages) vs engine/evaluator
    .evaluate over the SAME 30 images on identical injected weights.
    The averages must agree and the per-image series must correlate ~1 —
    after this, the reference's published 25.82 dB / 0.772 protocol
    differs from ours only by the assets (RUNBOOK.md)."""
    from test_ssim_golden import iqa_ssim_golden
    from deepinpainting_tpu.engine.evaluator import evaluate

    ref_model, state, _ = stacks
    imgs, masks = _eval_protocol_data()

    # ---- reference loop (test.ipynb cell 3, torch) ----
    want_psnr, want_ssim = [], []
    for img, m in zip(imgs, masks):
        image = nchw(img[None]).clone()
        mask = torch.from_numpy(m[None])[:, None].bool()
        with torch.no_grad():
            ref_model.set_input(image, mask, nchw(img[None]).clone())
            ref_model.set_ref_latent()
            ref_model.set_gt_latent()
            ref_model.test()
        real_B, fake_B = ref_model.real_B, ref_model.fake_B
        mse = torch.mean((real_B - fake_B) ** 2)
        want_psnr.append(float(10 * torch.log10((2 ** 2) / mse)))
        want_ssim.append(float(iqa_ssim_golden(real_B, fake_B)))

    # ---- our eval loop (engine/evaluator.evaluate, jitted DP steps,
    # batch 4 over 30 images exercises the ragged-tail padding) ----
    res = evaluate(CFG.replace(batch_size=4), state,
                   _ArrayDataset(imgs, masks), max_images=30,
                   verbose=False, return_per_image=True)

    assert res["images"] == 30
    got_psnr = np.asarray(res["psnr_per_image"])
    got_ssim = np.asarray(res["ssim_per_image"])
    # per-image series: tight agreement and ~1 correlation
    np.testing.assert_allclose(got_psnr, np.asarray(want_psnr), atol=0.2)
    np.testing.assert_allclose(got_ssim, np.asarray(want_ssim), atol=5e-3)
    assert np.corrcoef(got_psnr, want_psnr)[0, 1] > 0.999
    assert np.corrcoef(got_ssim, want_ssim)[0, 1] > 0.999
    # the headline averages (the 25.82/0.772 analogue on these assets)
    np.testing.assert_allclose(res["psnr"], np.mean(want_psnr), atol=0.05)
    np.testing.assert_allclose(res["ssim"], np.mean(want_ssim), atol=2e-3)


@pytest.mark.slow
def test_composed_train_step_loss_parity(stacks):
    """(b) one optimize_parameters() (models/IPSR.py:267-278) vs our
    train_step: loss scalars must match — D and F from the pre-update
    discriminators, G_GAN against the *updated* ones, G_L1 from the same
    forward, and the detached InnerCos sum."""
    ref_model, state, batch = stacks
    _run_reference_chain(ref_model, batch)
    ref_model.optimize_parameters()
    want = {
        "D": float(ref_model.loss_D_fake),
        "F": float(ref_model.loss_F_fake),
        "G_GAN": float(ref_model.loss_G_GAN),
        "G_L1": float(ref_model.loss_G_L1),
        "cosis": float(ref_model.ng_loss_value + ref_model.ng_loss_value2),
    }

    step = make_train_step(CFG)
    _, metrics = step(state, {k: jnp.asarray(v) for k, v in batch.items()},
                      jax.random.PRNGKey(0))
    for k, w in want.items():
        np.testing.assert_allclose(float(metrics[k]), w, rtol=2e-3,
                                   atol=2e-4, err_msg=k)


# ---------------------------------------------------------------------------
# norm='batch' twin: loss scalars AND running-stats threading vs torch
# ---------------------------------------------------------------------------

def _assert_stats_match(torch_net, our_stats, rtol, atol, label):
    """Zip torch's pre-order BatchNorm buffers against our exec-ordered
    batch_stats scopes (the same alignment torch_module_to_variables uses
    for import) and compare running mean/var."""
    from deepinpainting_tpu.convert.net_import import (_collect_stats_slots,
                                                       _collect_torch_bn_stats)
    bn = _collect_torch_bn_stats(torch_net)
    slots = _collect_stats_slots(our_stats)
    assert len(bn) == len(slots), label
    for (mean, var), path in zip(bn, slots):
        node = our_stats
        for k in path:
            node = node[k]
        np.testing.assert_allclose(np.asarray(node["mean"]), mean,
                                   rtol=rtol, atol=atol,
                                   err_msg=f"{label}/{'/'.join(path)}/mean")
        np.testing.assert_allclose(np.asarray(node["var"]), var,
                                   rtol=rtol, atol=atol,
                                   err_msg=f"{label}/{'/'.join(path)}/var")


@pytest.mark.slow
def test_composed_train_step_parity_batch_norm():
    """One optimize_parameters() with norm='batch' (get_norm_layer's other
    branch, networks.py:21-22) vs our train_step: beyond the loss scalars,
    the running batch_stats must reproduce torch's buffer updates —
    including the D-stat chaining order (fake-then-real in backward_D,
    IPSR.py:219-220, then fake-then-real AGAIN in backward_G after
    optimizer_D.step(), IPSR.py:238-241) and the single G/P update from
    forward().  A wrong chaining order shifts the tracked stats at the
    momentum (10%) scale, far outside the float-accumulation tolerance."""
    from deepinpainting_tpu.convert.net_import import torch_module_to_variables

    class BNOpt(Opt):
        norm = "batch"

    torch.manual_seed(7)
    with torch.no_grad():
        ref_model = _create_reference_model(BNOpt())

    cfg = CFG.replace(norm="batch")
    models = build_models(cfg)
    s, fs = S, S // 8
    k = jax.random.PRNGKey(0)
    vG = models.G.init(k, jnp.zeros((1, s, s, 6)),
                       jnp.zeros((1, fs, fs, 512)), jnp.zeros((1, fs * fs)))
    vP = models.P.init(k, jnp.zeros((1, s, s, 3)))
    vD = models.D.init(k, jnp.zeros((1, s, s, 3)))
    tF = models.F.init(k, jnp.zeros((1, fs, fs, 256)))["params"]
    sd = {"features." + n: p for n, p in _VGG_FEATURES.state_dict().items()}
    params = {
        "G": torch_module_to_variables(ref_model.netG, dict(vG)),
        "P": torch_module_to_variables(ref_model.netP, dict(vP)),
        "D": torch_module_to_variables(ref_model.netD, dict(vD)),
        "F": torch_module_to_variables(ref_model.netF, tF),
        "vgg": {kk: jnp.asarray(v)
                for kk, v in convert_vgg16_state_dict(sd).items()},
    }
    state = create_train_state(cfg, params)
    batch = _batch()

    _run_reference_chain(ref_model, batch)
    ref_model.optimize_parameters()
    want = {
        "D": float(ref_model.loss_D_fake),
        "F": float(ref_model.loss_F_fake),
        "G_GAN": float(ref_model.loss_G_GAN),
        "G_L1": float(ref_model.loss_G_L1),
        "cosis": float(ref_model.ng_loss_value + ref_model.ng_loss_value2),
    }

    new_state, metrics = make_train_step(cfg)(
        state, {kk: jnp.asarray(v) for kk, v in batch.items()},
        jax.random.PRNGKey(0))
    for kk, w in want.items():
        np.testing.assert_allclose(float(metrics[kk]), w, rtol=2e-3,
                                   atol=2e-4, err_msg=kk)
    # G/P: one train-mode forward's worth of stat updates; D: four chained
    # updates (two per phase).  fake_B carries the composed pipelines'
    # float divergence, so D gets the looser tolerance.
    _assert_stats_match(ref_model.netG, new_state.params_G["batch_stats"],
                        rtol=1e-2, atol=1e-3, label="G")
    _assert_stats_match(ref_model.netP, new_state.params_P["batch_stats"],
                        rtol=1e-2, atol=1e-3, label="P")
    _assert_stats_match(ref_model.netD, new_state.params_D["batch_stats"],
                        rtol=2e-2, atol=2e-3, label="D")
