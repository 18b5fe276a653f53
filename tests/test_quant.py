"""Dynamic int8 inference path (ops/quant.py, Config.quant='int8').

Beyond-reference capability: correctness here is quantization-error bounds
against the f32 path (not reference parity — the reference has no quantized
path).  Shapes are tiny: XLA:CPU's int8 conv is a slow naive kernel, fine
for unit tests only (the perf claim is TPU-only, BENCH_NOTES.md).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepinpainting_tpu.config import Config
from deepinpainting_tpu.ops import convs as C
from deepinpainting_tpu.ops import quant as Q


def _rel_l2(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12))


def test_quantize_roundtrip_bounds():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 32)), jnp.float32)
    q, s = Q.quantize_activation(x)
    err = np.abs(np.asarray(q, np.float32) * float(s) - np.asarray(x))
    assert err.max() <= float(s) / 2 + 1e-6  # round-to-nearest bound
    w = jnp.asarray(rng.normal(0, 0.02, (3, 3, 32, 48)), jnp.float32)
    qw, sw = Q.quantize_weight(w)
    deq = np.asarray(qw, np.float32) * np.asarray(sw)
    assert np.abs(deq - np.asarray(w)).max() <= float(np.max(sw)) / 2 + 1e-7


@pytest.mark.parametrize("k,s,p,d", [
    (4, 2, 1, 1),   # halving (networks.py:404)
    (4, 2, 3, 2),   # dilated halving (networks.py:227)
    (3, 1, 1, 1),   # same-size (networks.py:220)
])
def test_conv2d_int8_close_and_same_geometry(k, s, p, d):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 0.5, (2, 16, 16, 32)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.02, (k, k, 32, 48)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.01, (48,)), jnp.float32)
    ref = C.conv2d(x, w, b, s, p, d)
    got = Q.conv2d_int8(x, w, b, s, p, d)
    assert got.shape == ref.shape and got.dtype == ref.dtype
    assert _rel_l2(got, ref) < 0.02


@pytest.mark.parametrize("k,s,p", [
    (4, 2, 1),      # doubling upsample (networks.py:246)
    (3, 1, 1),      # same-size (networks.py:238)
])
def test_conv_transpose2d_int8_close(k, s, p):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 0.5, (2, 8, 8, 32)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.02, (k, k, 32, 16)), jnp.float32)
    ref = C.conv_transpose2d(x, w, None, s, p)
    got = Q.conv_transpose2d_int8(x, w, None, s, p)
    assert got.shape == ref.shape
    assert _rel_l2(got, ref) < 0.02


def test_int8_mode_skips_narrow_convs():
    """Cin=3 stems / Cout=3 heads stay bit-identical under int8_mode."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 0.5, (1, 16, 16, 3)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.02, (4, 4, 3, 32)), jnp.float32)
    ref = C.conv2d(x, w, None, 2, 1)
    with C.int8_mode(True):
        got = C.conv2d(x, w, None, 2, 1)
    assert np.array_equal(np.asarray(got), np.asarray(ref))
    assert not Q.eligible((4, 4, 3, 32))
    assert Q.eligible((4, 4, 16, 16))


def test_int8_mode_restores_on_exception():
    try:
        with C.int8_mode(True):
            assert C._INT8_TRACING
            raise RuntimeError
    except RuntimeError:
        pass
    assert not C._INT8_TRACING


def _tiny_cfg(**kw):
    base = dict(fine_size=32, ngf=8, ndf=8, vgg_width_scale=1 / 8,
                is_train=False, use_dropout=False)
    base.update(kw)
    return Config(**base)


def test_inference_int8_close_to_f32():
    """End-to-end: quantized two-stage inference tracks the f32 pipeline.

    Random weights are the worst case for PTQ (no trained structure to
    absorb rounding); the trained-checkpoint delta is measured on TPU
    (BENCH_NOTES.md int8 section).
    """
    from deepinpainting_tpu.engine import init_params, make_inference_fn
    cfg = _tiny_cfg()
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(4)
    gt = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)), jnp.float32)
    ref = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)), jnp.float32)
    mask = np.zeros((1, 32, 32), np.float32)
    mask[:, 12:20, 12:20] = 1.0
    mask = jnp.asarray(mask)
    args = (params["G"], params["P"], params["vgg"], gt, mask, ref)
    f32_out, _ = jax.jit(make_inference_fn(cfg))(*args)
    q_out, _ = jax.jit(make_inference_fn(cfg.replace(quant="int8")))(*args)
    assert np.isfinite(np.asarray(q_out)).all()
    # outputs live in ~[-1,1]; require agreement well under the image range
    mae = float(jnp.mean(jnp.abs(q_out - f32_out)))
    assert mae < 0.05, mae
    # and the graphs genuinely differ (int8 path actually taken)
    assert not np.array_equal(np.asarray(q_out), np.asarray(f32_out))


def test_train_step_rejects_quant():
    from deepinpainting_tpu.engine.inpaint import make_train_step
    with pytest.raises(NotImplementedError):
        make_train_step(_tiny_cfg(is_train=True, quant="int8"))


def test_unknown_quant_rejected():
    from deepinpainting_tpu.engine.inpaint import build_models
    with pytest.raises(NotImplementedError):
        build_models(_tiny_cfg(quant="int4"))


def test_coarse_fn_int8_runs():
    from deepinpainting_tpu.engine import init_params
    from deepinpainting_tpu.engine.inpaint import make_coarse_fn
    cfg = _tiny_cfg(quant="int8")
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    gt = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)), jnp.float32)
    mask = np.zeros((1, 32, 32), np.float32)
    mask[:, 8:24, 8:24] = 1.0
    fake_P, comp = jax.jit(make_coarse_fn(cfg))(params["P"], gt,
                                                jnp.asarray(mask))
    assert np.isfinite(np.asarray(fake_P)).all()
    # known region passes through exactly in the composite
    m = np.asarray(mask)[..., None]
    np.testing.assert_allclose(np.asarray(comp) * (1 - m),
                               np.asarray(gt) * (1 - m), atol=1e-6)
