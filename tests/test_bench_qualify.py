"""Unit tests for bench.py's self-qualifying measurement loop.

VERDICT r3 weak #1: BENCH_r03 published a 256px record with 91.5% core
spread — the escalation logic capped out and published anyway.  The loop
(`bench._collect_qualified`) must now discard failing windows and
re-measure until a window passes the 5% core-spread target, and if the
wall-clock budget expires, return the best window explicitly flagged
unstable instead of a silent wide-spread median.  ADVICE r3 also flagged
`stalled_repeats` misattribution across batch sizes (covered in
`test_winner_stats_reassigned`).

Pure control-flow tests: no jax, no TPU — `measure_once`, `_now` and
`_sleep` are injected fakes.
"""

import sys

import pytest

sys.path.insert(0, "/root/repo")
from bench import _assign_winner_stats, _collect_qualified, _core_spread  # noqa: E402


def _run(estimates, repeats=3, max_repeats=5, qualify_min=10.0,
         clock_step=1.0):
    """Drive _collect_qualified over a scripted estimate sequence with a
    fake clock advancing `clock_step` seconds per estimate."""
    seq = iter(estimates)
    t = [0.0]

    def once():
        t[0] += clock_step
        return next(seq)

    def now():
        return t[0]

    def sleep(s):
        t[0] += s

    return _collect_qualified(once, repeats, max_repeats, qualify_min,
                              label="test", settle_s=1.0, _now=now,
                              _sleep=sleep)


def test_tight_window_qualifies_first_try():
    s, stalls, unstable = _run([1.00, 1.01, 1.005])
    assert not unstable
    assert stalls == 0
    assert s == sorted([1.00, 1.01, 1.005])
    assert _core_spread(s) <= 0.05


def test_stalls_discarded_and_counted():
    # two impossible (<=0) estimates interleaved; sample still qualifies
    s, stalls, unstable = _run([-0.5, 1.00, 0.0, 1.01, 1.005])
    assert stalls == 2
    assert not unstable
    assert len(s) == 3
    assert all(e > 0 for e in s)


def test_escalates_then_qualifies_within_window():
    # first 3 estimates spread >5%, escalation adds tight ones until the
    # core (middle of sorted) passes — qualifies past `repeats` without
    # opening a fresh window
    s, stalls, unstable = _run([1.0, 2.0, 3.0, 2.01, 2.02],
                               repeats=3, max_repeats=5)
    assert not unstable
    assert 3 < len(s) <= 5
    assert _core_spread(s) <= 0.05


def test_failing_window_discarded_then_fresh_window_qualifies():
    # window 1: 5 estimates, hopeless spread at max_repeats -> discarded;
    # window 2: tight -> qualifies.  The returned sample must be ONLY the
    # second window's (3 estimates), not a mixture.
    est = [1.0, 5.0, 9.0, 13.0, 17.0] + [2.0, 2.01, 2.005]
    s, stalls, unstable = _run(est, repeats=3, max_repeats=5)
    assert not unstable
    assert s == sorted([2.0, 2.01, 2.005])


def test_budget_expiry_returns_best_window_flagged_unstable():
    # every window is hopeless; the fake clock (1 s per estimate +
    # settle sleeps) crosses the 0.2-min budget after ~2 windows.  The
    # best (lowest-core-spread) window must come back with unstable=True.
    wide1 = [1.0, 5.0, 9.0, 13.0, 17.0]     # core spread huge
    wide2 = [1.0, 2.0, 3.0, 4.0, 5.0]       # smaller, still >5%
    s, stalls, unstable = _run(wide1 + wide2 + wide1 * 10,
                               repeats=3, max_repeats=5, qualify_min=0.2)
    assert unstable
    assert _core_spread(s) > 0.05
    # best window kept: wide2's core spread < wide1's
    assert _core_spread(sorted(wide2)) <= _core_spread(s) or s == sorted(wide2)


def test_too_many_stalls_raises():
    with pytest.raises(RuntimeError, match="impossible"):
        _run([-1.0] * 20, repeats=3, max_repeats=5)


def test_winner_stats_reassigned():
    """ADVICE r3: a losing batch's stalled_repeats/unstable must not leak
    into the winner's record — `_assign_winner_stats` clears them."""
    out = {}
    # first (losing-then-overwritten) batch stalls and is unstable
    _assign_winner_stats(out, spread=50.0, core=20.0, stalls=3,
                         unstable=True)
    assert out["stalled_repeats"] == 3 and out["unstable"] is True
    # second batch wins cleanly: stale keys must vanish
    _assign_winner_stats(out, spread=2.0, core=1.0, stalls=0,
                         unstable=False)
    assert "stalled_repeats" not in out
    assert "unstable" not in out
    assert out["spread_core_pct"] == 1.0


def _run_windows(estimates, windows, repeats=3, max_repeats=5,
                 qualify_min=10.0):
    from bench import _collect_windows
    seq = iter(estimates)
    t = [0.0]

    def once():
        t[0] += 1.0
        return next(seq)

    return _collect_windows(once, repeats, max_repeats, qualify_min,
                            label="test", windows=windows, gap_s=1.0,
                            _now=lambda: t[0],
                            _sleep=lambda s: t.__setitem__(0, t[0] + s))


def test_windows_band_and_median_of_medians():
    """VERDICT r4 weak #1: k qualified windows spaced over the run; the
    published value is the MEDIAN window's median and band_pct bounds the
    within-run drift."""
    # three tight windows with drifting medians 1.0, 1.10, 1.05
    est = [1.00, 1.01, 1.005, 1.10, 1.11, 1.105, 1.05, 1.06, 1.055]
    s, stalls, unstable, band, nw = _run_windows(est, windows=3)
    assert nw == 3 and not unstable and stalls == 0
    # median window is the 1.05 one
    assert s == sorted([1.05, 1.06, 1.055])
    # band = (1.105 - 1.005) / 1.055 (window medians: 1.005, 1.105, 1.055)
    assert abs(band - (1.105 - 1.005) / 1.055 * 100.0) < 1e-6


def test_single_window_band_is_zero():
    s, stalls, unstable, band, nw = _run_windows([1.0, 1.01, 1.005],
                                                 windows=1)
    assert nw == 1 and band == 0.0
    assert s == sorted([1.0, 1.01, 1.005])


def test_any_unstable_window_flags_record():
    # window 1 tight, window 2 hopeless until the budget expires
    wide = [1.0, 5.0, 9.0, 13.0, 17.0]
    est = [1.0, 1.01, 1.005] + wide * 20
    s, stalls, unstable, band, nw = _run_windows(est, windows=2,
                                                 qualify_min=0.3)
    assert unstable
