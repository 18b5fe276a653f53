"""Conv geometry parity vs PyTorch (the four geometries of networks.py)."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn as tnn
import pytest

from deepinpainting_tpu.ops import convs as C


def to_nhwc(x_nchw):
    return jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))


def from_nhwc(y):
    return np.transpose(np.asarray(y), (0, 3, 1, 2))


@pytest.mark.parametrize("k,s,p,d,hw", [
    (4, 2, 1, 1, 32),   # standard halving conv (networks.py:404)
    (4, 2, 3, 2, 32),   # dilated halving conv (networks.py:227)
    (3, 1, 1, 1, 16),   # same-size conv (networks.py:220)
    (4, 2, 1, 1, 17),   # odd size
    (4, 2, 3, 2, 17),
    (4, 1, 1, 1, 14),   # PatchGAN stride-1 tail (networks.py:489,495)
])
def test_conv2d_parity(k, s, p, d, hw):
    rng = np.random.default_rng(0)
    cin, cout = 5, 7
    x = rng.standard_normal((2, cin, hw, hw)).astype(np.float32)
    tconv = tnn.Conv2d(cin, cout, k, s, p, dilation=d)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x)).numpy()
    w = tconv.weight.detach().numpy()          # [out,in,kh,kw]
    b = tconv.bias.detach().numpy()
    kern = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))  # HWIO
    ours = C.conv2d(to_nhwc(x), kern, jnp.asarray(b), s, p, d)
    np.testing.assert_allclose(from_nhwc(ours), ref, atol=2e-5)


@pytest.mark.parametrize("k,s,p,hw", [
    (4, 2, 1, 16),   # doubling deconv (networks.py:246)
    (3, 1, 1, 16),   # same-size deconv (networks.py:238)
    (4, 2, 1, 1),    # innermost 1 -> 2
])
def test_conv_transpose2d_parity(k, s, p, hw):
    rng = np.random.default_rng(1)
    cin, cout = 6, 4
    x = rng.standard_normal((2, cin, hw, hw)).astype(np.float32)
    tconv = tnn.ConvTranspose2d(cin, cout, k, s, p)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x)).numpy()
    w = tconv.weight.detach().numpy()          # [in,out,kh,kw]
    b = tconv.bias.detach().numpy()
    kern = jnp.asarray(np.transpose(w, (2, 3, 0, 1)))  # [kh,kw,in,out]
    ours = C.conv_transpose2d(to_nhwc(x), kern, jnp.asarray(b), s, p)
    assert from_nhwc(ours).shape == ref.shape
    np.testing.assert_allclose(from_nhwc(ours), ref, atol=2e-5)


def test_instance_norm_parity():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 8, 16, 16)).astype(np.float32)
    tin = tnn.InstanceNorm2d(8, affine=True)
    with torch.no_grad():
        tin.weight.copy_(torch.from_numpy(
            rng.standard_normal(8).astype(np.float32)))
        tin.bias.copy_(torch.from_numpy(
            rng.standard_normal(8).astype(np.float32)))
        ref = tin(torch.from_numpy(x)).numpy()
    ours = C.instance_norm(to_nhwc(x),
                           jnp.asarray(tin.weight.detach().numpy()),
                           jnp.asarray(tin.bias.detach().numpy()))
    np.testing.assert_allclose(from_nhwc(ours), ref, atol=1e-4)


def test_bilinear_resize_parity():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 3, 7, 7)).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x), (12, 12), mode="bilinear",
        align_corners=False).numpy()
    ours = C.bilinear_resize(to_nhwc(x), 12, 12)
    np.testing.assert_allclose(from_nhwc(ours), ref, atol=1e-5)


def test_leaky_relu():
    x = jnp.asarray([-2.0, 0.0, 3.0])
    np.testing.assert_allclose(np.asarray(C.leaky_relu(x)), [-0.4, 0.0, 3.0])


def test_module_init_distribution():
    import jax
    m = C.TorchConv(features=16, kernel_size=4, stride=2, padding=1)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8)))
    k = params["params"]["kernel"]
    assert abs(float(k.std()) - 0.02) < 0.005
    assert float(jnp.abs(params["params"]["bias"]).max()) == 0.0


def test_batch_norm_parity_train_stats_eval():
    # TorchBatchNorm vs torch.nn.BatchNorm2d defaults (get_norm_layer's
    # 'batch' branch, networks.py:21-22): train-mode normalization uses the
    # biased batch variance, running stats accumulate the UNBIASED variance
    # under momentum 0.1, eval normalizes with the tracked stats.
    import jax
    rng = np.random.default_rng(4)
    c = 6
    tbn = tnn.BatchNorm2d(c)
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(
            rng.standard_normal(c).astype(np.float32)))
        tbn.bias.copy_(torch.from_numpy(
            rng.standard_normal(c).astype(np.float32)))
    m = C.TorchBatchNorm()
    x0 = rng.standard_normal((2, c, 8, 8)).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), to_nhwc(x0), True)
    params = {"scale": jnp.asarray(tbn.weight.detach().numpy()),
              "offset": jnp.asarray(tbn.bias.detach().numpy())}
    stats = variables["batch_stats"]
    tbn.train()
    for _ in range(3):  # momentum accumulation over several steps
        x = rng.standard_normal((2, c, 8, 8)).astype(np.float32)
        with torch.no_grad():
            ref = tbn(torch.from_numpy(x)).numpy()
        ours, mut = m.apply({"params": params, "batch_stats": stats},
                            to_nhwc(x), True, mutable=["batch_stats"])
        np.testing.assert_allclose(from_nhwc(ours), ref, atol=1e-4)
        stats = mut["batch_stats"]
    np.testing.assert_allclose(np.asarray(stats["mean"]),
                               tbn.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(stats["var"]),
                               tbn.running_var.numpy(), atol=1e-5)
    tbn.eval()
    xe = rng.standard_normal((2, c, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref = tbn(torch.from_numpy(xe)).numpy()
    ours = m.apply({"params": params, "batch_stats": stats}, to_nhwc(xe))
    np.testing.assert_allclose(from_nhwc(ours), ref, atol=1e-4)


def test_batch_norm_affine_init_distribution():
    # init_weights' BatchNorm2d branch draws weight ~ N(1, gain) and zeroes
    # bias for every init_type (networks.py:65-67).
    import jax
    c = 4096
    m = C.TorchBatchNorm(init_gain=0.02)
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, c)), True)
    s = variables["params"]["scale"]
    assert abs(float(s.mean()) - 1.0) < 0.005
    assert abs(float(s.std()) - 0.02) < 0.005
    assert float(jnp.abs(variables["params"]["offset"]).max()) == 0.0
    # init-phase applies must NOT move the running stats off torch's
    # zeros/ones buffers (init_weights never runs a forward).
    np.testing.assert_array_equal(
        np.asarray(variables["batch_stats"]["mean"]), np.zeros(c))
    np.testing.assert_array_equal(
        np.asarray(variables["batch_stats"]["var"]), np.ones(c))


def test_make_norm_factory():
    # get_norm_layer parity (networks.py:20-29): instance/batch/none, and
    # the unknown-norm error message.
    import jax
    assert C.make_norm("instance") is C.InstanceNorm
    bn = C.make_norm("batch", init_gain=0.5)()
    assert isinstance(bn, C.TorchBatchNorm) and bn.init_gain == 0.5
    ident = C.make_norm("none")()
    x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 2, 2, 3))
    y = ident.apply({}, x, True)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    with pytest.raises(NotImplementedError, match="normalization layer"):
        C.make_norm("spectral")


# ---- small-Cin packed rewrites (Config.pack_small_cin, ops/convs.py) -------

@pytest.mark.parametrize("cin,k,s,p,hw", [
    (3, 4, 2, 1, 256 // 4),   # netP enc1 geometry (networks.py:404)
    (6, 4, 2, 1, 32),         # same, 6-channel input
    (3, 3, 1, 1, 64),         # VGG conv1_1 geometry (models/vgg16.py:14)
    (6, 3, 1, 1, 33),         # odd spatial size, stride 1
])
def test_packed_small_cin_conv_matches_direct(cin, k, s, p, hw):
    import jax
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, hw, hw, cin)), jnp.float32)
    kern = jnp.asarray(rng.standard_normal((k, k, cin, 16)) * 0.1,
                       jnp.float32)
    bias = jnp.asarray(rng.standard_normal(16) * 0.1, jnp.float32)
    direct = C.conv2d(x, kern, bias, s, p)
    with C.pack_small_cin_mode():
        packed = C.conv2d(x, kern, bias, s, p)
    assert packed.shape == direct.shape
    # exact algebraic rewrite: same products, reassociated sums
    np.testing.assert_allclose(np.asarray(packed), np.asarray(direct),
                               rtol=1e-5, atol=1e-5)

    # gradients flow through the packed path and match the direct ones
    def loss(mode):
        def f(x, kern):
            with C.pack_small_cin_mode(mode):
                return jnp.sum(jnp.square(C.conv2d(x, kern, bias, s, p)))
        return jax.grad(f, argnums=(0, 1))(x, kern)
    gx_d, gk_d = loss(False)
    gx_p, gk_p = loss(True)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_d),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_d),
                               rtol=1e-4, atol=1e-4)


def test_packed_small_cin_ineligible_paths_fall_through():
    # wide Cin, dilated, 1x1, and odd-padded stride-2 convs must not rewrite
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 32)), jnp.float32)
    kern = jnp.asarray(rng.standard_normal((4, 4, 32, 8)), jnp.float32)
    with C.pack_small_cin_mode():
        assert C._packed_small_cin(x, kern, 2, 1, 1) is None  # cin > 8
        x3 = x[..., :3]
        k3 = kern[:, :, :3]
        assert C._packed_small_cin(x3, k3, 2, 1, 2) is None   # dilated
        assert C._packed_small_cin(x3, k3[:1, :1], 1, 0, 1) is None  # 1x1
        x_odd = x3[:, :15, :15]
        assert C._packed_small_cin(x_odd, k3, 2, 1, 1) is None  # odd H+2p


# ---- output-pixel packing rewrites (Config.pack_out, ops/convs.py) ---------

def test_hpack2_matches_direct():
    # hpack2 is an exact rewrite of the k3s1p1 conv at any even H
    import jax
    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.standard_normal((2, 20, 14, 33)), jnp.float32)
    kern = jnp.asarray(rng.standard_normal((3, 3, 33, 9)) * 0.1, jnp.float32)
    direct = C.conv2d(x, kern, None, 1, 1)
    packed = C._conv2d_hpack2(x, kern)
    assert packed.shape == direct.shape
    np.testing.assert_allclose(np.asarray(packed), np.asarray(direct),
                               rtol=1e-5, atol=1e-5)

    # gradients through the packed path match the direct ones
    def g(fn):
        return jax.grad(lambda x, k: jnp.sum(jnp.square(fn(x, k))),
                        argnums=(0, 1))(x, kern)
    (gx_d, gk_d) = g(lambda x, k: C.conv2d(x, k, None, 1, 1))
    (gx_p, gk_p) = g(C._conv2d_hpack2)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_d),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_d),
                               rtol=1e-4, atol=1e-4)


def test_dpack4_matches_direct_deconv():
    # dpack4 is an exact sub-pixel rewrite of ConvTranspose2d k4 s2 p1
    import jax
    rng = np.random.default_rng(22)
    x = jnp.asarray(rng.standard_normal((2, 9, 7, 34)), jnp.float32)
    kern = jnp.asarray(rng.standard_normal((4, 4, 34, 6)) * 0.1, jnp.float32)
    direct = C.conv_transpose2d(x, kern, None, stride=2, padding=1)
    packed = C._deconv_dpack4(x, kern)
    assert packed.shape == direct.shape
    np.testing.assert_allclose(np.asarray(packed), np.asarray(direct),
                               rtol=1e-5, atol=1e-5)

    def g(fn):
        return jax.grad(lambda x, k: jnp.sum(jnp.square(fn(x, k))),
                        argnums=(0, 1))(x, kern)
    (gx_d, gk_d) = g(lambda x, k: C.conv_transpose2d(x, k, None, 2, 1))
    (gx_p, gk_p) = g(C._deconv_dpack4)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_d),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_d),
                               rtol=1e-4, atol=1e-4)


def test_pack_out_routing_gates():
    # only the below-roofline shapes rewrite; everything else falls through
    rng = np.random.default_rng(23)
    hw = C._PACK_OUT_MIN_HW
    x = jnp.asarray(rng.standard_normal((1, hw, hw, 64)), jnp.float32)
    k3 = jnp.asarray(rng.standard_normal((3, 3, 64, 64)), jnp.float32)
    assert C._packed_out_conv(x, k3, 1, 1, 1) is not None      # eligible
    assert C._packed_out_conv(x, k3, 2, 1, 1) is None          # strided
    assert C._packed_out_conv(x, k3, 1, 1, 2) is None          # dilated
    assert C._packed_out_conv(x[:, :hw // 2], k3, 1, 1, 1) is None  # small H
    assert C._packed_out_conv(x[..., :8], k3[:, :, :8], 1, 1, 1) is None
    assert C._packed_out_conv(x[:, :hw - 1], k3, 1, 1, 1) is None   # odd H

    k4 = jnp.asarray(rng.standard_normal((4, 4, 64, 64)), jnp.float32)
    assert C._packed_out_deconv(x, k4, 2, 1) is not None       # eligible
    assert C._packed_out_deconv(x, k4, 1, 1) is None           # k4 stride 1
    wide = jnp.asarray(rng.standard_normal((4, 4, 64, 65)), jnp.float32)
    assert C._packed_out_deconv(x, wide, 2, 1) is None         # Cout > 64
    assert C._packed_out_deconv(x[:, :16, :16], k4, 2, 1) is None  # small

    kt3 = jnp.asarray(rng.standard_normal((3, 3, 64, 64)), jnp.float32)
    assert C._packed_out_deconv(x, kt3, 1, 1) is not None  # k3s1 -> hpack2
    assert C._packed_out_deconv(x, kt3, 1, 0) is None      # wrong padding


def test_pack_out_k3s1_deconv_matches_direct():
    # the k3s1p1 ConvTranspose routes through hpack2 on the flipped kernel
    rng = np.random.default_rng(25)
    x = jnp.asarray(rng.standard_normal((2, 12, 10, 35)), jnp.float32)
    kern = jnp.asarray(rng.standard_normal((3, 3, 35, 5)) * 0.1, jnp.float32)
    direct = C.conv_transpose2d(x, kern, None, stride=1, padding=1)
    packed = C._conv2d_hpack2(x, jnp.flip(kern, axis=(0, 1)))
    assert packed.shape == direct.shape
    np.testing.assert_allclose(np.asarray(packed), np.asarray(direct),
                               rtol=1e-5, atol=1e-5)


def test_pack_out_full_model_invariance(monkeypatch):
    # the full two-stage inference with pack_out on must match off.  The
    # tiny test config never reaches the production thresholds, so lower
    # them to make the rewrites fire inside the real model graph.
    import jax
    from deepinpainting_tpu.config import Config
    from deepinpainting_tpu.engine import init_params, make_inference_fn
    monkeypatch.setattr(C, "_PACK_OUT_MIN_HW", 16)
    monkeypatch.setattr(C, "_PACK_OUT_MIN_CIN", 4)
    base = dict(fine_size=32, ngf=8, ndf=8, vgg_width_scale=1 / 8,
                is_train=False, use_dropout=False)
    params = init_params(Config(**base), jax.random.PRNGKey(0))
    rng = np.random.default_rng(24)
    gt = rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    ref = rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    mask = np.zeros((1, 32, 32), np.float32)
    mask[:, 10:22, 10:22] = 1.0
    outs = []
    for pk in (False, True):
        infer = make_inference_fn(Config(pack_out=pk, **base))
        fake_B, _ = infer(params["G"], params["P"], params["vgg"],
                          jnp.asarray(gt), jnp.asarray(mask),
                          jnp.asarray(ref))
        outs.append(np.asarray(fake_B))
    np.testing.assert_allclose(outs[1], outs[0], rtol=1e-4, atol=1e-4)


def test_pack_small_cin_full_model_invariance():
    # the full two-stage inference with pack_small_cin on must match off
    # (netP enc1 s2d, netG outermost + VGG conv1_1 tap-stacked)
    import jax
    from deepinpainting_tpu.config import Config
    from deepinpainting_tpu.engine import init_params, make_inference_fn
    base = dict(fine_size=32, ngf=8, ndf=8, vgg_width_scale=1 / 8,
                is_train=False, use_dropout=False)
    params = init_params(Config(**base), jax.random.PRNGKey(0))
    rng = np.random.default_rng(13)
    gt = rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    ref = rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    mask = np.zeros((1, 32, 32), np.float32)
    mask[:, 10:22, 10:22] = 1.0
    outs = []
    for pk in (False, True):
        infer = make_inference_fn(Config(pack_small_cin=pk, **base))
        fake_B, _ = infer(params["G"], params["P"], params["vgg"],
                          jnp.asarray(gt), jnp.asarray(mask),
                          jnp.asarray(ref))
        outs.append(np.asarray(fake_B))
    np.testing.assert_allclose(outs[1], outs[0], rtol=1e-4, atol=1e-4)
