"""Training-step mechanics on a scaled-down config (CPU).

Covers SURVEY.md §7.3 item 6: the D-then-G interleave, the stop_gradient
boundaries (compose detaches netP; the feature-GAN branch and the InnerCos
losses are constant w.r.t. G in faithful mode), and basic convergence of the
L1 path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepinpainting_tpu.config import Config
from deepinpainting_tpu.engine import (create_state, make_eval_step,
                                       make_train_step)

TINY = Config(fine_size=64, ngf=8, ndf=8, batch_size=2, use_dropout=True,
              vgg_width_scale=1 / 8, mask_type="random")


def tiny_batch(seed=0, b=2, s=64):
    rng = np.random.default_rng(seed)
    img = rng.uniform(-1, 1, (b, s, s, 3)).astype(np.float32)
    ref = rng.uniform(-1, 1, (b, s, s, 3)).astype(np.float32)
    mask = np.zeros((b, s, s), np.float32)
    mask[:, 16:48, 20:44] = 1.0
    return {"image": jnp.asarray(img), "mask": jnp.asarray(mask),
            "ref": jnp.asarray(ref)}


def leaves_delta(a, b):
    return sum(float(jnp.abs(x - y).sum()) for x, y in zip(
        jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))


@pytest.fixture(scope="module")
def state():
    return create_state(TINY, jax.random.PRNGKey(0))


def test_train_step_updates_all_networks(state):
    step = jax.jit(make_train_step(TINY))
    batch = tiny_batch()
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    for k in ["G_GAN", "G_L1", "D", "F", "cosis"]:
        assert np.isfinite(float(metrics[k])), k
    assert int(new_state.step) == 1
    for net in ["params_G", "params_P", "params_D", "params_F"]:
        assert leaves_delta(getattr(state, net), getattr(new_state, net)) > 0, net
    # vgg stays frozen
    assert leaves_delta(state.vgg, new_state.vgg) == 0


def test_netp_gets_no_gan_gradient(state):
    # With lambda_A=0 netP's only loss term vanishes; the compose step
    # detaches fake_P (models/IPSR.py:172-175 .data), and in faithful mode
    # the InnerCos terms are detached — so params_P must not move at all.
    cfg = TINY.replace(lambda_A=0.0)
    step = jax.jit(make_train_step(cfg))
    new_state, _ = step(state, tiny_batch(), jax.random.PRNGKey(1))
    assert leaves_delta(state.params_P, new_state.params_P) == 0
    # G still moves (GAN image branch is live)
    assert leaves_delta(state.params_G, new_state.params_G) > 0


@pytest.mark.slow
def test_detached_cosis_contributes_no_gradient(state):
    # Faithful mode: InnerCos losses are values only (models/IPSR.py:255-263).
    # Compare G updates with cosis on vs off under identical rngs: must match.
    base = TINY.replace(gan_weight=0.0, lambda_A=0.0)
    s_on, _ = jax.jit(make_train_step(base))(
        state, tiny_batch(), jax.random.PRNGKey(3))
    s_off, _ = jax.jit(make_train_step(base.replace(cosis=0)))(
        state, tiny_batch(), jax.random.PRNGKey(3))
    assert leaves_delta(s_on.params_G, s_off.params_G) == 0
    # Corrected mode: the cosis gradient is live and changes the update.
    s_corr, _ = jax.jit(make_train_step(
        base.replace(faithful_detached_cosis=False)))(
            state, tiny_batch(), jax.random.PRNGKey(3))
    assert leaves_delta(s_corr.params_G, s_on.params_G) > 0


def test_l1_descends_over_steps(state):
    cfg = TINY.replace(gan_weight=0.0)
    step = jax.jit(make_train_step(cfg))
    batch = tiny_batch()
    s = state
    first = last = None
    for i in range(8):
        s, m = step(s, batch, jax.random.PRNGKey(10 + i))
        if first is None:
            first = float(m["G_L1"])
        last = float(m["G_L1"])
    assert last < first


def test_eval_step_deterministic_and_shapes(state):
    ev = jax.jit(make_eval_step(TINY))
    batch = tiny_batch()
    o1 = ev(state, batch)
    o2 = ev(state, batch)
    np.testing.assert_array_equal(np.asarray(o1["fake_B"]),
                                  np.asarray(o2["fake_B"]))
    assert o1["fake_B"].shape == (2, 64, 64, 3)
    assert o1["fake_P"].shape == (2, 64, 64, 3)
    assert np.isfinite(float(o1["loss_ipsr"]))
    assert np.isfinite(float(o1["loss_valid"]))
    assert set(o1["visuals"]) == {"real_A", "real_Ref", "fake_B", "fake_P",
                                  "real_B"}


def test_center_mask_type(state):
    cfg = TINY.replace(mask_type="center")
    ev = jax.jit(make_eval_step(cfg))
    out = ev(state, tiny_batch())
    assert np.isfinite(float(out["loss_valid"]))


@pytest.mark.slow
@pytest.mark.parametrize("attn", ["lax", "pallas"])
def test_bf16_train_step_runs_and_is_finite(attn):
    # regression: preferred_element_type=f32 on bf16 conv operands broke
    # jax's conv transpose_rhs (mixed-dtype kernel-gradient conv), so every
    # bf16 TRAINING step failed to trace until round 2 (ops/convs.py).
    cfg = TINY.replace(dtype="bfloat16", attention_impl=attn,
                       fine_size=32, use_dropout=False)
    st = create_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))
    st2, metrics = step(st, tiny_batch(s=32), jax.random.PRNGKey(1))
    vals = {k: float(v) for k, v in metrics.items()}
    assert all(np.isfinite(v) for v in vals.values()), vals
    assert leaves_delta(st.params_G, st2.params_G) > 0


@pytest.mark.slow
def test_batch_norm_train_step_threads_running_stats():
    # norm='batch' (get_norm_layer's other branch, networks.py:21-22):
    # G/P/D state entries become full variables dicts; one train step must
    # update BOTH the params and the running batch_stats (the reference's
    # train-mode forwards update BatchNorm buffers), the optimizer must
    # never see the stats, and the eval step must consume them.
    cfg = Config(fine_size=32, ngf=8, ndf=8, batch_size=2, norm="batch",
                 vgg_width_scale=1 / 8)
    st = create_state(cfg, jax.random.PRNGKey(0))
    for net in ("params_G", "params_P", "params_D"):
        assert "batch_stats" in getattr(st, net), net
    assert "batch_stats" not in st.params_F  # PF norm is affine-less instance
    step = jax.jit(make_train_step(cfg))
    batch = tiny_batch(s=32)
    st2, metrics = step(st, batch, jax.random.PRNGKey(1))
    for k in ["G_GAN", "G_L1", "D", "F", "cosis"]:
        assert np.isfinite(float(metrics[k])), k
    for net in ("params_G", "params_P", "params_D"):
        assert leaves_delta(getattr(st, net)["batch_stats"],
                            getattr(st2, net)["batch_stats"]) > 0, net
        assert leaves_delta(getattr(st, net)["params"],
                            getattr(st2, net)["params"]) > 0, net
    # optimizer state trees mirror the params subtree only (no stats moments)
    for kp, _ in jax.tree_util.tree_flatten_with_path(st2.opt_G)[0]:
        assert "batch_stats" not in jax.tree_util.keystr(kp)
    # eval path consumes the tracked stats without mutating anything
    ev = jax.jit(make_eval_step(cfg))
    out = ev(st2, batch)
    assert np.isfinite(float(np.asarray(out["psnr"]).mean()))
    # a second identical train step keeps moving the stats toward the batch
    st3, _ = step(st2, batch, jax.random.PRNGKey(1))
    assert leaves_delta(st2.params_G["batch_stats"],
                        st3.params_G["batch_stats"]) > 0


@pytest.mark.slow
def test_batch_norm_bf16_step_finite_and_f32_stats():
    # bf16 activations compose with norm='batch': TorchBatchNorm computes
    # statistics in f32 regardless of the activation dtype, so the tracked
    # stats stay f32 and the step stays finite.
    cfg = Config(fine_size=32, ngf=8, ndf=8, batch_size=2, norm="batch",
                 dtype="bfloat16", vgg_width_scale=1 / 8)
    st = create_state(cfg, jax.random.PRNGKey(0))
    st2, m = jax.jit(make_train_step(cfg))(st, tiny_batch(s=32),
                                           jax.random.PRNGKey(1))
    for k in ["G_GAN", "G_L1", "D", "F"]:
        assert np.isfinite(float(m[k])), k
    for x in jax.tree_util.tree_leaves(st2.params_G["batch_stats"]):
        assert x.dtype == jnp.float32
    assert leaves_delta(st.params_G["batch_stats"],
                        st2.params_G["batch_stats"]) > 0


@pytest.mark.slow
def test_batch_norm_state_checkpoint_roundtrip(tmp_path):
    # orbax full-state save/restore and the npz interop are tree-generic —
    # with norm='batch' the G/P/D entries are variables dicts and the
    # running stats must survive both roundtrips exactly (the reference
    # persists BatchNorm buffers inside its state_dict .pt files).
    from deepinpainting_tpu.engine.checkpoint import (
        CheckpointManager, export_network_npz, import_network_npz)
    cfg = Config(fine_size=32, ngf=8, ndf=8, batch_size=2, norm="batch",
                 vgg_width_scale=1 / 8)
    st = create_state(cfg, jax.random.PRNGKey(0))
    pg = dict(st.params_G)  # perturb stats so the roundtrip carries state
    pg["batch_stats"] = jax.tree_util.tree_map(
        lambda x: x + 0.5, pg["batch_stats"])
    st = st.replace(params_G=pg)
    mgr = CheckpointManager(cfg, directory=str(tmp_path / "ckpt"))
    mgr.save(1, st)
    restored = mgr.restore(1, create_state(cfg, jax.random.PRNGKey(7)))
    mgr.close()
    assert leaves_delta(st.params_G, restored.params_G) == 0
    npz = str(tmp_path / "G.npz")
    export_network_npz(st.params_G, npz)
    back = import_network_npz(restored.params_G, npz)
    assert leaves_delta(st.params_G, back) == 0


@pytest.mark.slow
def test_batch_norm_grad_accum_semantics():
    """norm='batch' + grad_accum (torch grad-accum semantics: each
    microbatch normalizes by its own statistics; running stats chain
    sequentially in call order).  Three properties on a duplicated batch
    (k=2 identical microbatches), where per-microbatch batch statistics
    equal the fused half-batch statistics:

      (a) params after the accum step == params after the fused step on
          the half batch (grads are linear averages of identical terms);
      (b) G/P running stats follow the exact two-update closed form
          s2 = (1-m)^2 s0 + (1-(1-m)^2) b, with b recovered from the fused
          step's one-update result s1 = (1-m) s0 + m b;
      (c) D's committed stats equal an eager replication of the full call
          chain: per microbatch fake->real in the D phase, then twice more
          per microbatch against the updated D (generalizing the fused
          step's 4-call order, models/IPSR.py:211-238).
    """
    from deepinpainting_tpu.engine.inpaint import (
        build_models, normalize_batch, prepare_masks, resolve_mask,
        two_stage_forward)
    from deepinpainting_tpu.engine.state import params_of
    from deepinpainting_tpu.models.vgg16 import apply_vgg16

    cfg = Config(fine_size=32, ngf=8, ndf=8, batch_size=2, norm="batch",
                 use_dropout=False, mask_type="random", vgg_width_scale=1 / 8)
    state = create_state(cfg, jax.random.PRNGKey(0))
    half = tiny_batch(seed=5, b=2, s=32)
    dup = {k: jnp.concatenate([v, v], axis=0) for k, v in half.items()}
    key = jax.random.PRNGKey(3)

    s_out, s_m = jax.jit(make_train_step(cfg))(state, half, key)
    a_out, a_m = jax.jit(make_train_step(
        cfg.replace(batch_size=4, grad_accum=2)))(state, dup, key)

    for k_ in ["G_GAN", "G_L1", "D", "F", "cosis"]:
        np.testing.assert_allclose(float(a_m[k_]), float(s_m[k_]),
                                   rtol=2e-4, atol=1e-6, err_msg=k_)
    # (a) params agreement — same criterion as the instance-mode accum test
    for net in ["params_G", "params_P", "params_D", "params_F"]:
        a = np.concatenate([np.asarray(x).ravel() for x in
                            jax.tree_util.tree_leaves(
                                params_of(getattr(a_out, net)))])
        b = np.concatenate([np.asarray(x).ravel() for x in
                            jax.tree_util.tree_leaves(
                                params_of(getattr(s_out, net)))])
        agree = np.isclose(a, b, rtol=1e-3, atol=1e-5).mean()
        assert agree > 0.995, f"{net}: only {agree:.4%} agree"

    # (b) G/P stats: exact sequential two-update closed form
    m = 0.1  # TorchBatchNorm momentum (torch default)
    for net in ["params_G", "params_P"]:
        s0 = getattr(state, net)["batch_stats"]
        s1 = getattr(s_out, net)["batch_stats"]
        s2 = getattr(a_out, net)["batch_stats"]
        for k0, k1, k2 in zip(jax.tree_util.tree_leaves(s0),
                              jax.tree_util.tree_leaves(s1),
                              jax.tree_util.tree_leaves(s2)):
            b_ = (np.asarray(k1) - (1 - m) * np.asarray(k0)) / m
            want = ((1 - m) ** 2 * np.asarray(k0)
                    + (1 - (1 - m) ** 2) * b_)
            np.testing.assert_allclose(np.asarray(k2), want,
                                       rtol=1e-3, atol=5e-6)

    # (c) D stats: eager oracle replicating the exact call chain
    models = build_models(cfg)
    nb = normalize_batch(half)
    gt = nb["image"]
    mask = resolve_mask(cfg, nb["mask"])
    _, flag = prepare_masks(cfg, mask)
    ref_feat = apply_vgg16(state.vgg, nb["ref"], cfg.vgg_width_scale).relu4_3
    rngs = jax.random.split(key, 2)

    def d_chain(vD, fake, real):
        _, mut = models.D.apply(vD, fake, True, mutable=["batch_stats"])
        vD = {**vD, **mut}
        _, mut = models.D.apply(vD, real, True, mutable=["batch_stats"])
        return {**vD, **mut}

    vD = {"params": params_of(state.params_D),
          "batch_stats": state.params_D["batch_stats"]}
    fakes = []
    for i in range(2):  # D phase: fake->real per microbatch, pre-update D
        out = two_stage_forward(models, state.params_G, state.params_P, gt,
                                mask, ref_feat, flag, train=True,
                                rng=rngs[i])
        fakes.append(jax.lax.stop_gradient(out.fake_B))
        vD = d_chain(vD, fakes[-1], gt)
    vD = {"params": params_of(a_out.params_D),  # G phase: updated D
          "batch_stats": vD["batch_stats"]}
    for i in range(2):
        vD = d_chain(vD, fakes[i], gt)
    for got, want in zip(
            jax.tree_util.tree_leaves(a_out.params_D["batch_stats"]),
            jax.tree_util.tree_leaves(vD["batch_stats"])):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-3, atol=5e-6)


def test_vanilla_gan_branch_trains_finite():
    """The 'vanilla' gan_type — a deliberate corrected deviation (the
    reference's raw BCELoss on relativistic differences in (-1,1) is broken
    as written, networks.py:175-183; see losses._bce_with_labels).  The
    branch must trace, produce finite losses, and update all four nets."""
    cfg = TINY.replace(gan_type="vanilla")
    state = create_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))
    new_state, metrics = step(state, tiny_batch(), jax.random.PRNGKey(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    for net in ("params_G", "params_P", "params_D", "params_F"):
        assert leaves_delta(getattr(state, net), getattr(new_state, net)) > 0


def test_vanilla_gan_loss_formula():
    """Clipped-BCE formula check on hand values (D direction)."""
    from deepinpainting_tpu.losses import ra_gan_loss
    pf = jnp.array([0.2, 0.4])
    pr = jnp.array([0.9, 0.7])
    got = float(ra_gan_loss(pf, pr, True, "vanilla"))
    rel_r = np.clip(np.asarray(pr) - np.mean(pf), 1e-7, 1 - 1e-7)
    rel_f = np.clip(np.asarray(pf) - np.mean(pr), 1e-7, 1 - 1e-7)
    want = 0.5 * (-np.mean(np.log(rel_r)) - np.mean(np.log(1 - rel_f)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_eval_step_in_graph_metrics_match_host():
    """eval_step returns per-sample PSNR/SSIM vectors matching the host
    metric fns (the evaluator no longer dispatches per image)."""
    from deepinpainting_tpu.utils.metrics import psnr, ssim
    state = create_state(TINY, jax.random.PRNGKey(0))
    step = jax.jit(make_eval_step(TINY))
    batch = tiny_batch()
    out = step(state, batch)
    assert out["psnr"].shape == (2,) and out["ssim"].shape == (2,)
    gt = np.asarray(batch["image"])
    fake = np.asarray(out["fake_B"])
    for i in range(2):
        np.testing.assert_allclose(float(out["psnr"][i]),
                                   float(psnr(gt[i][None], fake[i][None])),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(out["ssim"][i]),
                                   float(ssim(gt[i][None], fake[i][None])),
                                   rtol=1e-5)


@pytest.mark.slow
def test_train_step_accepts_uint8_batch():
    """uint8 host transport: the step normalizes on device and produces the
    same update as the f32 batch (bit-identical inputs post-normalize)."""
    state = create_state(TINY, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(TINY))
    bf = tiny_batch()
    img8 = np.clip((np.asarray(bf["image"]) + 1) * 127.5, 0, 255).astype(
        np.uint8)
    ref8 = np.clip((np.asarray(bf["ref"]) + 1) * 127.5, 0, 255).astype(
        np.uint8)
    m8 = np.asarray(bf["mask"]).astype(np.uint8)
    b8 = {"image": jnp.asarray(img8), "mask": jnp.asarray(m8),
          "ref": jnp.asarray(ref8)}
    # equivalent f32 batch = the normalized uint8 (quantized) values
    bq = {"image": jnp.asarray(img8.astype(np.float32) / 127.5 - 1.0),
          "mask": jnp.asarray(m8.astype(np.float32)),
          "ref": jnp.asarray(ref8.astype(np.float32) / 127.5 - 1.0)}
    s8, m_8 = step(state, b8, jax.random.PRNGKey(1))
    sq, m_q = step(state, bq, jax.random.PRNGKey(1))
    for k in m_8:
        np.testing.assert_allclose(float(m_8[k]), float(m_q[k]), rtol=1e-6)
    # The normalized input VALUES are bit-identical (test_data_pipeline.py::
    # test_uint8_transport_bit_identical), but the two steps compile as
    # different XLA graphs (the uint8 cast/divide fuses into the consumers),
    # so gradients carry FP-contraction noise that adam's sign-normalizing
    # update amplifies to ~1e-7/param.  Require the divergence to be far
    # below the update itself.
    update = leaves_delta(state.params_G, sq.params_G)
    cross = leaves_delta(s8.params_G, sq.params_G)
    assert cross < 1e-3 * update, (cross, update)


def test_grad_accum_matches_single_step_on_duplicated_batch(state):
    """grad_accum=k over k identical microbatches == the k=1 step on one
    microbatch: same D/F grads (linear average of identical terms), same
    D update, and the G phase scores against the same updated D in both
    paths (models/IPSR.py:267-278 ordering preserved)."""
    cfg = TINY.replace(use_dropout=False)  # rng paths differ between the
    # fused and the scanned step; with dropout off both are rng-free
    half = tiny_batch(seed=5, b=1)
    dup = {k: jnp.concatenate([v, v], axis=0) for k, v in half.items()}

    s_out, s_m = jax.jit(make_train_step(cfg))(
        state, half, jax.random.PRNGKey(3))
    a_out, a_m = jax.jit(make_train_step(cfg.replace(grad_accum=2)))(
        state, dup, jax.random.PRNGKey(3))

    for key in ["G_GAN", "G_L1", "D", "F", "cosis"]:
        np.testing.assert_allclose(float(a_m[key]), float(s_m[key]),
                                   rtol=2e-4, atol=1e-6, err_msg=key)
    # Adam's first update is +/-lr where |g| >> eps, so near-zero-gradient
    # elements flip sign under FP jitter between the two compilations —
    # require near-total agreement (same criterion as the DP/SP tests).
    for net in ["params_G", "params_P", "params_D", "params_F"]:
        a = np.concatenate([np.asarray(x).ravel() for x in
                            jax.tree_util.tree_leaves(getattr(a_out, net))])
        b = np.concatenate([np.asarray(x).ravel() for x in
                            jax.tree_util.tree_leaves(getattr(s_out, net))])
        agree = np.isclose(a, b, rtol=1e-3, atol=1e-5).mean()
        assert agree > 0.995, f"{net}: only {agree:.4%} agree"


def test_grad_accum_rejects_indivisible_batch(state):
    step = make_train_step(TINY.replace(grad_accum=3))
    with pytest.raises(ValueError, match="divisible"):
        jax.jit(step)(state, tiny_batch(b=2), jax.random.PRNGKey(1))
