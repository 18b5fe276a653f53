"""Benchmark: two-stage 256x256 inpainting inference throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N, ...}

`value` is the median-of-repeats images/sec/chip of the full jitted
two-stage pipeline (rough U-Net -> compose -> refinement U-Net with IPSR
attention, including on-device mask preprocessing and the VGG16
reference-feature extraction) at the throughput batch size.  `vs_baseline`
divides by the reference PyTorch implementation executed on CPU (the only
way the reference runs in this image), measured once and cached in
`.bench_baseline.json` — BASELINE.md records that the reference publishes
no throughput numbers, so the baseline must be measured (north star:
>=50x reference-CPU img/s per chip).

Extra keys (BASELINE.json's metric names p50 latency; VERDICT r1 #2):
  p50_ms_per_image_b{B} — median per-image latency at the throughput batch
  p50_ms_per_image_b1   — median single-image latency (batch 1)
  mfu                   — model-FLOPs utilisation: analytic HLO flops/image
                          (jit lower + cost_analysis, no TPU compile) x
                          measured img/s / chip bf16 peak
  spread_pct            — (max-min)/median of the timed repeats (raw:
                          single tunnel stalls inflate it)
  spread_core_pct       — middle-half spread (q3-q1)/median — the
                          stall-robust stability number
  stalled_repeats       — repeats discarded as physically impossible
                          (negative differenced time: a stall hit the
                          short window)
  unstable              — present (true) ONLY when the WINNING batch's
                          measurement never reached the 5% core-spread
                          target within the BENCH_QUALIFY_MIN wall-clock
                          budget; the value is then the best
                          (lowest-core-spread) window's median, explicitly
                          flagged rather than silently published
                          (VERDICT r3 weak #1)
  unstable_b{B} / unstable_b1
                        — same flag for a specific batch size's
                          p50_ms_per_image_b{B} entry (incl. losing
                          batches of a sweep and the batch-1 latency),
                          so no unqualified median is published unmarked

Timing method: the axon TPU tunnel makes per-call block_until_ready
unreliable and adds a ~32 ms fixed overhead per host->device call, so we
run chained (data-dependent) inference iterations inside one jit with a
DYNAMIC trip count (one compile) and time the *difference* between a long
and a short run — the per-call overhead cancels exactly.  Every input is
derived from the loop carry (gt = ref = previous fake_B, and the mask is
data-dependently recomputed), so XLA cannot hoist any stage out of the
loop: round-1 numbers let LICM hoist the loop-invariant VGG/mask/ref work,
inflating b8 throughput ~2x and manufacturing a phantom b16 "cliff" (see
BENCH_NOTES.md).  Each config is timed BENCH_REPEATS (default 5) times and
the median reported.
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

_BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".bench_baseline.json")


def _example(b, s, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.uniform(-1, 1, (b, s, s, 3)).astype(np.float32)
    ref = rng.uniform(-1, 1, (b, s, s, 3)).astype(np.float32)
    mask = np.zeros((b, s, s), np.float32)
    q = s // 4
    mask[:, q + 4: 3 * q - 4, q + 4: 3 * q - 4] = 1.0
    return img, mask, ref


def _enable_compile_cache():
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass


# Chip bf16 peak FLOP/s by device_kind substring (lowercased match).
_PEAK_BF16 = {
    "v5 lite": 197e12, "v5e": 197e12,
    "v5p": 459e12, "v5": 197e12,
    "v6 lite": 918e12, "v6e": 918e12,
    "v4": 275e12, "v3": 123e12,
}


def _chip_peak_flops():
    import jax
    kind = jax.devices()[0].device_kind.lower()
    for key, peak in _PEAK_BF16.items():
        if key in kind:
            return peak, kind
    return None, kind


def _core_spread(s):
    """Middle-half spread of a sorted sample: (q3-q1)/median.

    Robust to the single-stall outliers the axon tunnel injects into a
    minority of repeats; the raw (max-min)/median spread is still
    reported alongside it."""
    q = len(s) // 4
    mid = s[q:len(s) - q] or s
    return (mid[-1] - mid[0]) / s[len(s) // 2]


def _collect_qualified(measure_once, repeats, max_repeats, qualify_min,
                       label="", settle_s=30.0, _now=time.time,
                       _sleep=time.sleep):
    """Self-qualifying sample collection (VERDICT r3: BENCH_r03 published a
    91.5% core spread — the record must qualify itself or say it didn't).

    Calls `measure_once()` for per-iter estimates.  Estimates <= 0 are
    physically impossible (a tunnel stall landed inside the SHORT
    differencing window) and are discarded, counted as stalls; this
    censoring is asymmetric — long-window stalls (inflated estimates)
    survive — so stall-heavy days bias the median mildly UPWARD in
    ms/iter (throughput understated, never flattered).  A window escalates
    from `repeats` to `max_repeats` estimates while its core spread
    exceeds 5%; a window still failing at `max_repeats` is DISCARDED and
    a fresh window starts after a `settle_s` pause, until one qualifies
    or the `qualify_min` wall-clock budget expires — then the best
    (lowest-core-spread) discarded window is returned flagged unstable.

    Returns (sorted per-iter estimates, total stalls, unstable: bool).
    `_now`/`_sleep` are injectable for tests."""
    deadline = _now() + qualify_min * 60
    best_s, best_core = None, float("inf")
    window, total_stalls = 0, 0
    while True:
        window += 1
        per_iter, stalls = [], 0
        while True:
            est = measure_once()
            if est <= 0:
                stalls += 1
                total_stalls += 1
                print(f"[bench] discarded impossible estimate "
                      f"{est * 1e3:.2f} ms/iter (short-window stall "
                      f"#{stalls})", file=sys.stderr)
                if stalls >= 2 * max_repeats:
                    raise RuntimeError(
                        f"bench: {stalls} impossible per-iter estimates at "
                        f"{label} — tunnel too unstable for a valid "
                        "record; rerun when the backend settles")
                continue
            per_iter.append(est)
            if len(per_iter) < repeats:
                continue
            s = sorted(per_iter)
            if _core_spread(s) <= 0.05:
                return s, total_stalls, False
            if len(per_iter) >= max_repeats:
                break
            if len(per_iter) == repeats:
                print(f"[bench] core spread {_core_spread(s) * 100:.1f}% "
                      f"> 5% after {repeats} repeats — escalating to "
                      f"{max_repeats}", file=sys.stderr)
        core = _core_spread(s)
        if core < best_core:
            best_s, best_core = s, core
        remaining = deadline - _now()
        if remaining <= 0:
            print(f"[bench] qualify budget ({qualify_min:.0f} min) "
                  f"exhausted after {window} windows at {label}; "
                  f"publishing best window (core {best_core * 100:.1f}%) "
                  f"flagged UNSTABLE", file=sys.stderr)
            return best_s, total_stalls, True
        print(f"[bench] window {window} core spread {core * 100:.1f}% "
              f"> 5% at {max_repeats} repeats — discarding window, "
              f"re-measuring ({remaining / 60:.1f} min budget left)",
              file=sys.stderr)
        _sleep(min(settle_s, remaining))


def _collect_windows(measure_once, repeats, max_repeats, qualify_min,
                     label="", windows=1, gap_s=None, _now=time.time,
                     _sleep=time.sleep):
    """k >= 1 qualified windows spaced over the run (VERDICT r4 weak #1:
    the record drifted 873 -> 846 across rounds/hours with nothing
    bounding within-run drift vs a real regression).

    Each window self-qualifies via `_collect_qualified`; windows are
    separated by `gap_s` (default BENCH_WINDOW_GAP_S, 90 s) so they sample
    different tunnel weather.  Published value = the MEDIAN window's
    median; `band_pct` = (max - min) / median over the window medians —
    the measured within-run drift band that cross-day comparisons should
    be read against.

    Returns (median window's sorted estimates, total stalls,
    any-window-unstable, band_pct, n_windows)."""
    if gap_s is None:
        gap_s = float(os.environ.get("BENCH_WINDOW_GAP_S", "90"))
    results = []
    for w in range(windows):
        if w:
            _sleep(gap_s)
        results.append(_collect_qualified(
            measure_once, repeats, max_repeats, qualify_min,
            label=f"{label} w{w + 1}/{windows}" if windows > 1 else label,
            _now=_now, _sleep=_sleep))
    meds = sorted(s[len(s) // 2] for s, _, _ in results)
    med_of_meds = meds[len(meds) // 2]
    band = (meds[-1] - meds[0]) / med_of_meds * 100.0
    mid = min(range(len(results)),
              key=lambda i: abs(results[i][0][len(results[i][0]) // 2]
                                - med_of_meds))
    s_mid = results[mid][0]
    total_stalls = sum(r[1] for r in results)
    unstable = any(r[2] for r in results)
    if windows > 1:
        print(f"[bench] {label}: {windows} windows, medians "
              f"{[round(m * 1e3, 2) for m in meds]} ms/iter, band "
              f"{band:.1f}%", file=sys.stderr)
    return s_mid, total_stalls, unstable, band, windows


def _assign_winner_stats(out, spread, core, stalls, unstable):
    """(Re)assign ALL winner-qualification stats together, clearing any
    previous winner's, so a losing batch's stall count or instability flag
    can't be misattributed to the final winner (ADVICE r3)."""
    out["spread_pct"] = round(spread, 2)
    out["spread_core_pct"] = round(core, 2)
    out.pop("stalled_repeats", None)
    out.pop("unstable", None)
    if stalls:
        out["stalled_repeats"] = stalls
    if unstable:
        out["unstable"] = True


def measure_ours(batch_sizes=(32,), size=256, iters=64,
                 repeats=None, with_b1=True):
    # One throughput batch size by default: each jit variant costs ~4 min of
    # (remote) TPU compile in this environment and the persistent cache
    # cannot capture remote-compiled executables.  batch=32 is the measured
    # throughput sweet spot; see BENCH_NOTES.md for the batch sweep.
    import jax
    import jax.numpy as jnp
    from deepinpainting_tpu.config import Config
    from deepinpainting_tpu.engine import init_params, make_inference_fn
    _enable_compile_cache()
    repeats = repeats or int(os.environ.get("BENCH_REPEATS", "5"))

    # Inference operating point (BENCH_NOTES.md round 2): bf16 activations
    # with f32 MXU accumulation and the streamed Pallas attention kernels.
    # Knobs for A/B runs: BENCH_DTYPE=float32, BENCH_ATTN=lax,
    # BENCH_QUANT=int8 (dynamic-int8 convs, ops/quant.py).
    # BENCH_PACK=1 packs the tiny-Cin first convs (Config.pack_small_cin);
    # BENCH_PACKOUT=1 enables the output-pixel packing rewrites
    # (Config.pack_out — hpack2/dpack4, ops/convs.py).
    cfg = Config(fine_size=size, is_train=False, use_dropout=False,
                 dtype=os.environ.get("BENCH_DTYPE", "bfloat16"),
                 attention_impl=os.environ.get("BENCH_ATTN", "pallas"),
                 quant=os.environ.get("BENCH_QUANT", "none"),
                 pack_small_cin=os.environ.get("BENCH_PACK", "0") == "1",
                 pack_out=os.environ.get("BENCH_PACKOUT", "0") == "1")
    params = init_params(cfg, jax.random.PRNGKey(0))
    infer = make_inference_fn(cfg)
    p3 = (params["G"], params["P"], params["vgg"])

    # Params must be jit *arguments*, not closure constants — constants are
    # baked into the HLO, which is catastrophic over a remote-compile tunnel.
    # Every per-iteration input derives from the carry: gt and ref are the
    # previous fake_B (self-reference, the evaluator's semantics) and the
    # mask is recomputed through a value-preserving data dependence
    # (1 + mean*1e-30 rounds to exactly 1), so no stage can be hoisted.
    @jax.jit
    def chained(p3, mask0, x, n):
        pG, pP, vgg = p3

        def body(i, x):
            mask = mask0 * (1.0 + jnp.mean(x) * 1e-30)
            fake_B, _ = infer(pG, pP, vgg, x, mask, x)
            return fake_B
        return jax.lax.fori_loop(0, n, body, x)

    def _timed(b, n, windows=1):
        """Per-iter seconds by long/short differencing (overhead cancels).

        One compile per batch size (dynamic trip count); `repeats`
        (short, long) pairs -> sorted per-iter estimates.  On a noisy
        tunnel day single multi-hundred-ms stalls blow the raw
        (max-min)/median spread past the methodology's ~1.5% even while
        the median holds (BENCH_r02: 16.6%; 2026-08-18 probe log: >100%);
        the stall/escalation/self-qualification defenses — incl. the
        BENCH_QUALIFY_MIN window budget and the unstable flag — live in
        `_collect_qualified`, and `windows` > 1 collects that many
        qualified windows spaced over the run to bound within-run drift
        (`_collect_windows`).

        Returns (median window's sorted estimates, total stalls, unstable,
        band_pct, n_windows)."""
        img, mask, _ = _example(b, size)
        gt, mk = jnp.asarray(img), jnp.asarray(mask)
        n_small = max(2, n // 8)
        max_repeats = int(os.environ.get("BENCH_MAX_REPEATS", "13"))
        qualify_min = float(os.environ.get("BENCH_QUALIFY_MIN", "15"))
        np.asarray(chained(p3, mk, gt, n))  # compile + warm

        def once():
            t0 = time.time()
            np.asarray(chained(p3, mk, gt, n_small))
            t1 = time.time()
            np.asarray(chained(p3, mk, gt, n_small + n))
            t2 = time.time()
            return ((t2 - t1) - (t1 - t0)) / n

        return _collect_windows(once, repeats, max_repeats, qualify_min,
                                label=f"batch {b} ({size}px)",
                                windows=windows)

    # k qualified windows for the throughput record (VERDICT r4 weak #1);
    # the b1 latency stays single-window (latency comparisons are coarser)
    n_windows = max(1, int(os.environ.get("BENCH_WINDOWS", "3")))
    out = {}
    best, best_b = 0.0, batch_sizes[0]
    for b in batch_sizes:
        ts, stalls, unstable, band, nw = _timed(b, iters, windows=n_windows)
        med = ts[len(ts) // 2]
        ips = b / med
        spread = (ts[-1] - ts[0]) / med * 100.0
        core = _core_spread(ts) * 100.0
        print(f"[bench] ours batch={b}: {ips:.1f} img/s "
              f"({med * 1000:.2f} ms/iter, {len(ts)} repeats, "
              f"spread {spread:.1f}% core {core:.1f}%, "
              f"band {band:.1f}% over {nw} windows"
              f"{', UNSTABLE' if unstable else ''})", file=sys.stderr)
        out[f"p50_ms_per_image_b{b}"] = round(med * 1000 / b, 3)
        if unstable:
            # per-batch flag: even a LOSING batch's published p50 must not
            # be a silent unqualified median
            out[f"unstable_b{b}"] = True
        if ips > best:
            best, best_b = ips, b
            _assign_winner_stats(out, spread, core, stalls, unstable)
            out["window_band_pct"] = round(band, 2)
            out["n_windows"] = nw

    if with_b1 and 1 not in batch_sizes:
        try:
            ts1, _, unstable1, _, _ = _timed(1, iters)
            out["p50_ms_per_image_b1"] = round(ts1[len(ts1) // 2] * 1000, 3)
            if unstable1:
                out["unstable_b1"] = True
            print(f"[bench] batch-1 p50 latency: "
                  f"{out['p50_ms_per_image_b1']:.2f} ms/img"
                  f"{' (UNSTABLE)' if unstable1 else ''}", file=sys.stderr)
        except Exception as e:  # pragma: no cover
            print(f"[bench] batch-1 latency failed: {e}", file=sys.stderr)
            out["p50_ms_per_image_b1"] = None

    # Analytic model FLOPs per image: HLO cost analysis of one lowered
    # forward step.  The axon backend's Lowered.cost_analysis() returns
    # None, so the analysis runs in a CPU-platform subprocess (shape-only
    # lowering, no execution) and is cached next to the baseline.
    try:
        # always lower the lax attention path for the flop count: model
        # flops are implementation-independent and Pallas kernels don't
        # lower on the CPU platform
        flops = _flops_per_image(size, cfg.dtype, "lax", best_b)
        peak, kind = _chip_peak_flops()
        out["flops_per_image"] = flops
        out["mfu"] = round(best * flops / peak, 4) if peak else None
        print(f"[bench] {flops / 1e9:.1f} GFLOP/img, chip '{kind}' "
              f"peak {peak and peak / 1e12}T -> MFU {out['mfu']}",
              file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"[bench] MFU estimate failed: {e}", file=sys.stderr)
        out["mfu"] = None

    return best, best_b, out


_FLOPS_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            ".bench_flops.json")

_FLOPS_PROG = """
import sys, json
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
sys.path.insert(0, {repo!r})
from deepinpainting_tpu.config import Config
from deepinpainting_tpu.engine import init_params, make_inference_fn

size, dtype, attn, b = {size}, {dtype!r}, {attn!r}, {b}
cfg = Config(fine_size=size, is_train=False, use_dropout=False,
             dtype=dtype, attention_impl=attn)
shapes = jax.eval_shape(lambda k: init_params(cfg, k), jax.random.PRNGKey(0))
sds = jax.tree_util.tree_map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                             shapes)
infer = make_inference_fn(cfg)
args = (sds["G"], sds["P"], sds["vgg"],
        jax.ShapeDtypeStruct((b, size, size, 3), jnp.float32),
        jax.ShapeDtypeStruct((b, size, size), jnp.float32),
        jax.ShapeDtypeStruct((b, size, size, 3), jnp.float32))
ca = jax.jit(infer).lower(*args).cost_analysis()
print(json.dumps({{"flops": float(ca["flops"])}}))
"""


def _flops_per_image(size, dtype, attn, b):
    """Total HLO flops of one forward / batch, via a CPU-lowering
    subprocess (cached in .bench_flops.json)."""
    import subprocess
    key = f"{size}_{dtype}_{attn}_{b}"
    cache = {}
    if os.path.exists(_FLOPS_CACHE):
        with open(_FLOPS_CACHE) as f:
            cache = json.load(f)
    if key not in cache:
        repo = os.path.dirname(os.path.abspath(__file__))
        prog = _FLOPS_PROG.format(repo=repo, size=size, dtype=dtype,
                                  attn=attn, b=b)
        r = subprocess.run([sys.executable, "-c", prog], capture_output=True,
                           text=True, timeout=900)
        if r.returncode != 0:
            raise RuntimeError(f"flops subprocess failed: {r.stderr[-400:]}")
        cache[key] = json.loads(r.stdout.strip().splitlines()[-1])["flops"]
        with open(_FLOPS_CACHE, "w") as f:
            json.dump(cache, f)
    return cache[key] / b


def measure_reference_cpu(n_images=10, size=256):
    """Drive the reference's torch networks on CPU (CUDA stubbed).

    The reference's VGG16 needs torchvision (absent); the attention layer
    consumes the VGG latent directly, so we feed a fixed random relu4_3 —
    this *excludes* VGG compute from the baseline, biasing the comparison in
    the reference's favor (our measured pipeline includes VGG).
    """
    import contextlib
    import torch
    torch.cuda.FloatTensor = torch.FloatTensor
    torch.cuda.LongTensor = torch.LongTensor
    torch.cuda.ByteTensor = torch.ByteTensor
    torch.cuda.BoolTensor = torch.BoolTensor
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    sys.path.insert(0, "/root/reference")
    import models.networks as rnet

    class Opt:
        threshold = 5 / 16.0
        fixed_mask = 1
        shift_sz = 1
        stride = 1
        mask_thred = 1
        triple_weight = 1
        strength = 1
        skip = 0

    opt = Opt()
    mask_global = torch.zeros(1, 1, size, size, dtype=torch.bool)
    q = size // 4
    mask_global[:, :, q + 4: 3 * q - 4, q + 4: 3 * q - 4] = True

    # the reference prints from init_weights; keep our stdout JSON-clean
    with contextlib.redirect_stdout(sys.stderr):
        netG, cosis, cosis2, ipsr = rnet.define_G(
            6, 3, 64, "unet_ipsr", opt, mask_global, "instance", False,
            "normal", [], 0.02)
        netP, _, _, _ = rnet.define_G(
            3, 3, 64, "unet_256", opt, mask_global, "instance", False,
            "normal", [], 0.02)
    netG.eval()
    netP.eval()

    from collections import namedtuple
    VggOut = namedtuple("VggOutputs", ["relu4_3"])
    fs = size // 8
    ipsr[0].set_ref(VggOut(torch.randn(1, 512, fs, fs)))
    cosis[0].set_target(torch.randn(1, 512, fs, fs))
    cosis2[0].set_target(torch.randn(1, 512, fs, fs))

    img = torch.rand(1, 3, size, size) * 2 - 1
    m3 = mask_global.expand(1, 3, size, size)
    masked = img.clone()
    for c, v in enumerate([2 * 123.0 / 255.0 - 1, 2 * 104.0 / 255.0 - 1,
                           2 * 117.0 / 255.0 - 1]):
        masked[:, c][mask_global[0]] = v

    def one():
        with torch.no_grad():
            fake_p = netP(masked)
            un = fake_p.masked_fill(~m3, 0)
            known = masked.masked_fill(m3, 0)
            middle = torch.cat([un + known, known], 1)
            return netG(middle)

    one()  # warmup
    times = []
    for _ in range(n_images):
        t = time.time()
        one()
        times.append(time.time() - t)
    times.sort()
    med = times[len(times) // 2]
    spread_pct = (times[-1] - times[0]) / med * 100.0
    return n_images / sum(times), n_images, spread_pct


def get_baseline():
    if os.path.exists(_BASELINE_CACHE):
        with open(_BASELINE_CACHE) as f:
            cached = json.load(f)
        # re-measure thin records (VERDICT r4 weak #2: the artifact of
        # record rested on an n=2 forward sample with no spread)
        if cached.get("n", 0) >= 10:
            return cached["reference_cpu_images_per_sec"]
    try:
        ips, n, spread_pct = measure_reference_cpu()
        with open(_BASELINE_CACHE, "w") as f:
            json.dump({"reference_cpu_images_per_sec": ips, "n": n,
                       "per_image_spread_pct": round(spread_pct, 2),
                       "note": "reference torch nets on CPU, CUDA stubbed, "
                               "VGG excluded (favors reference)"}, f)
        return ips
    except Exception as e:  # pragma: no cover
        print(f"[bench] baseline measurement failed: {e}", file=sys.stderr)
        return None


def _wait_for_backend():
    """Block until the TPU backend answers, up to BENCH_WAIT_MIN minutes.

    The axon tunnel has transient outages where backend init hangs
    indefinitely or raises UNAVAILABLE (observed: multi-hour windows).  A
    hung in-process init cannot be interrupted, so probe `jax.devices()`
    in a killable subprocess and only let the real run start once a probe
    succeeds — this keeps a driver-launched bench alive across a flapping
    tunnel instead of failing on the first hang.
    """
    import subprocess
    import time as _time
    max_min = float(os.environ.get("BENCH_WAIT_MIN", "30"))
    deadline = _time.time() + max_min * 60
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=300, capture_output=True)
            if r.returncode == 0:
                if attempt > 1:
                    print(f"[bench] backend up after {attempt} probes",
                          file=sys.stderr, flush=True)
                return
        except subprocess.TimeoutExpired:
            pass
        if _time.time() >= deadline:
            print(f"[bench] backend still unavailable after {attempt} "
                  f"probes / {max_min:.0f} min — proceeding (will fail "
                  "loudly)", file=sys.stderr, flush=True)
            return
        print(f"[bench] backend probe {attempt} failed; retrying",
              file=sys.stderr, flush=True)
        _time.sleep(60)


def main():
    _wait_for_backend()
    size = int(os.environ.get("BENCH_SIZE", "256"))
    iters = int(os.environ.get("BENCH_ITERS", "64"))
    with_b1 = os.environ.get("BENCH_B1", "1") == "1"
    # batch 32 is the measured throughput sweet spot (BENCH_NOTES.md:
    # 812 img/s @8, 809 @16, ~883 @32, 836 @64 — and @64 compiles 27 min)
    batches = (int(os.environ.get("BENCH_BATCH", "32")),)
    ours, best_b, extra = measure_ours(batch_sizes=batches, size=size,
                                       iters=iters, with_b1=with_b1)
    baseline = get_baseline()
    vs = (ours / baseline) if baseline else None
    rec = {
        "metric": f"two_stage_{size}px_inpaint_images_per_sec_per_chip_b{best_b}",
        "value": round(ours, 2),
        "unit": "images/sec",
        "vs_baseline": round(vs, 2) if vs else None,
    }
    rec.update(extra)
    # BASELINE config 3 (512x512 irregular-mask batched inference) as extra
    # keys of the same record, so the driver artifact carries both
    # resolutions.  b8 bf16+pallas is the measured 512px operating point
    # (BENCH_NOTES.md "512px coverage"); one extra jit variant ~4 min
    # remote compile.  BENCH_512=0 skips.
    if os.environ.get("BENCH_512", "1") == "1" and size == 256:
        try:
            # iters=64: at ~44 ms/iter the long run is ~3 s, so ms-scale
            # tunnel jitter divides down below the 5% spread target (32
            # iters measured 30% spread even at 9 repeats)
            ours5, b5, extra5 = measure_ours(batch_sizes=(8,), size=512,
                                             iters=64, with_b1=False)
            rec[f"images_per_sec_512px_b{b5}"] = round(ours5, 2)
            for k, v in extra5.items():
                rec[k + "_512px"] = v
        except Exception as e:  # pragma: no cover
            print(f"[bench] 512px measurement failed: {e}", file=sys.stderr)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
