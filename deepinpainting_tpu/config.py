"""Single frozen configuration object for the whole framework.

Replaces the reference's three duplicated plain-attribute option classes
(`app.py:1-60`, `train.ipynb` cell 0, `test.ipynb` cell 0) with one frozen
dataclass, JSON-serializable next to checkpoints.  Field names follow the
reference where they are meaningful; dead reference fields (`gp_lambda`,
`ncritic`, `bottleneck`, `constrain`, `n_layers_D`, `save_latest_freq`,
`print_freq` — see SURVEY.md §2.5) are intentionally dropped.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from typing import Optional, Tuple


@dataclass(frozen=True)
class Config:
    # ---- geometry ----------------------------------------------------------
    batch_size: int = 1
    data_workers: int = -1        # host decode worker processes (DataLoader
                                  # num_workers role): -1 auto (cores-1,
                                  # so 0/serial on a 1-core host), 0 serial
    fine_size: int = 256          # square image resolution (reference `fineSize`)
    input_nc: int = 3             # stage-1 (rough net) input channels
    input_nc_g: int = 6           # stage-2 (refinement net) input channels
    output_nc: int = 3
    ngf: int = 64                 # generator base width
    ndf: int = 64                 # discriminator base width

    # ---- model selection (reference `which_model_*`) -----------------------
    which_model_netG: str = "unet_ipsr"
    which_model_netP: str = "unet_256"
    which_model_netD: str = "basic"
    which_model_netF: str = "feature"
    norm: str = "instance"        # 'instance'|'batch' (get_norm_layer,
                                  # networks.py:20-29); build_models rejects
                                  # others loudly (networks.py:27-28)
    use_dropout: bool = False
    init_type: str = "normal"     # 'normal'|'xavier'|'kaiming'|'orthogonal'
                                  # (networks.py:49-62; unknown raises like
                                  # networks.py:66-67)
    init_gain: float = 0.02       # init gain (normal std / xavier+orthogonal
                                  # gain), threaded to every conv

    # ---- attention (IPSR / CSA shift layer) --------------------------------
    threshold: float = 5.0 / 16.0  # feature-mask binarization threshold
    stride: int = 1
    shift_sz: int = 1              # feature patch size
    mask_thred: float = 1.0        # per-patch mask-sum threshold for "masked"
    triple_weight: float = 1.0     # backward attention gradient weight
    # (the reference's `fixed_mask` knob is intentionally absent: its fast
    # path is dead — cal_fixed_flag is never False, models/IPSR_model.py:23,53)
    # Reference-quirk fidelity switches (SURVEY.md §7.3 item 4).  `True`
    # reproduces the reference bit-for-bit; `False` enables the corrected
    # behavior.
    faithful_backward_truncation: bool = True   # LongTensor-truncated attention rows in bwd
    faithful_detached_cosis: bool = True        # InnerCos losses detached from G grads
    faithful_known_replacement: bool = True     # attention rewrites KNOWN
    # (unmasked) positions with their best-ref-matching patch instead of
    # identity (IPSRFunction.py:127-129) — the one quirk that changes
    # INFERENCE output.  False = corrected identity-on-known mode
    # (ops/attention.py _apply_known_replacement).  Measured on the demo
    # protocol (artifacts/kr_ablation README: neutral both at eval time
    # and train time; corrected-trained must be served corrected) before
    # choosing the default.
    attention_impl: str = "pallas"              # 'pallas' | 'lax' (e2e a wash at 256px, pallas wins isolated + at 512px; interprets on CPU)
    remat: bool = False            # checkpoint U-Net levels (jax.checkpoint
    # via nn.remat): backward recomputes levels instead of storing their
    # activations — the headroom knob when activations must share HBM (XLA
    # auto-remats only once a schedule exceeds HBM).  See remat_depth and
    # BENCH_NOTES.md for the measured memory/FLOPs tradeoff.
    remat_depth: int = 1           # how many OUTERMOST levels to checkpoint
    # (0 = every level).  Activation bytes halve per depth, so the outer
    # levels hold most of the memory; BUT a checkpointed level's backward
    # re-runs its whole SUBTREE (the submodule call sits inside the block),
    # so each checkpointed outer level costs ~1 extra full forward.
    # Measured 512px b8 f32 (BENCH_NOTES.md): depth 1 -25% temp at 1.52x
    # step (default: the knee); depth 3 -32% at 2.6x; depth 0 -38% at 3.1x.

    # ---- masks -------------------------------------------------------------
    mask_type: str = "random"      # 'center' | 'random'
    overlap: int = 4               # center-mask inset (reference `overlap`)

    # ---- losses ------------------------------------------------------------
    lambda_A: float = 100.0
    gan_type: str = "lsgan"        # 'lsgan' | 'wgan_gp' (MSE) | 'vanilla' (BCE)
    gan_weight: float = 0.2
    cosis: int = 1                 # include InnerCos feature-consistency losses
    strength: float = 1.0          # InnerCos strength multiplier
    skip: int = 0                  # skip InnerCos losses entirely

    # ---- optimization ------------------------------------------------------
    lr: float = 2e-4
    beta1: float = 0.5
    lr_policy: str = "lambda"      # 'lambda' | 'step' | 'plateau' | 'cosine'
    lr_decay_iters: int = 50
    niter: int = 20
    niter_decay: int = 100
    epoch_count: int = 1

    # ---- bookkeeping -------------------------------------------------------
    name: str = "IPSR_inpainting"
    checkpoints_dir: str = "checkpoints"
    which_epoch: str = ""
    save_epoch_freq: int = 1
    display_freq: int = 1000
    continue_train: bool = False
    is_train: bool = True
    early_stop_patience: int = 20

    # ---- compute -----------------------------------------------------------
    dtype: str = "float32"         # activation compute dtype: 'float32' | 'bfloat16'
    quant: str = "none"            # 'none' | 'int8': dynamic int8 convs for
    # INFERENCE paths only (make_inference_fn / make_eval_step /
    # make_coarse_fn); the MXU runs s8xs8->s32 at 2x the bf16 rate.  Training
    # rejects it (PTQ, not QAT).  See ops/quant.py.
    pack_small_cin: bool = False   # exact small-Cin conv rewrite: pack kernel
    # taps into the channel dim (space-to-depth for the 3->64 k4s2 first
    # conv, tap stacking for VGG conv1_1) so the MXU reduction lane is
    # kh*kw*Cin wide instead of Cin<=8 (~2% MFU, BENCH_NOTES.md op table).
    # Same sums reassociated — bit-level-close, not bit-identical; measured
    # e2e LOSS on v5e (BENCH_NOTES.md round-3 packing section) — stays off.
    pack_out: bool = False         # exact output-pixel packing rewrites for
    # the below-roofline high-res convs (BENCH_NOTES.md op table): k3s1
    # convs at H>=128 run as a [4,3] stride-(2,1) conv packing 2 output
    # rows into channels (hpack2), and small-Cout k4s2 deconvs as a k2s1
    # conv packing the 2x2 sub-pixel phase (dpack4).  Same sums
    # reassociated; measured e2e LOSS on v5e like pack_small_cin (the
    # pack/unpack layout round trip costs more than the lane win —
    # BENCH_NOTES.md round-3 packing section) — stays off.  See
    # ops/convs.py _conv2d_hpack2/_deconv_dpack4.
    grad_accum: int = 1            # microbatches per optimizer step (beyond-
    # reference).  k>1 splits the batch into k microbatches and averages
    # gradients, cutting peak activation memory ~1/k at the cost of a second
    # forward pass (the k=1 step shares one forward between the D and G
    # phases via jax.vjp; the accumulated step cannot hold k microbatches of
    # residuals, so the G phase re-runs the forward).  D-then-G ordering and
    # G-sees-updated-D semantics (models/IPSR.py:267-278) are preserved
    # exactly.  batch_size must be divisible by grad_accum.  With
    # norm='batch' each microbatch normalizes by its own statistics and the
    # running stats chain sequentially (torch grad-accum semantics — see
    # engine/inpaint.py _make_accum_train_step).
    debug_nan: bool = False        # halt training on non-finite losses
    metrics_every: int = 10        # fetch step metrics to host every K steps
                                   # (amortizes the blocking device sync;
                                   # every step still lands in the CSV)
    seed: int = 0
    vgg_weights: str = "random"    # 'random' or a path to a converted .npz
    vgg_width_scale: float = 1.0   # <1 only for scaled-down test configs
    data_axis: str = "data"        # mesh axis name for data parallelism
    sp_devices: int = 1            # spatial-axis size of the training mesh:
    # 1 = pure DP; >1 builds a 2-D (data x sp) mesh and also shards the image
    # height over "sp" (parallel/spatial.py) — for when per-chip HBM can't
    # hold the batch's activations (>=512px).  Must divide the device count
    # and the image height.

    # ------------------------------------------------------------------------
    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, text: str) -> "Config":
        raw = json.loads(text)
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in raw.items() if k in fields})

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, path: str) -> "Config":
        with open(path) as f:
            return cls.from_json(f.read())
