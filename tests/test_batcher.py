"""Request-coalescing micro-batcher (serve/batcher.py) and its wiring into
the serving app.

The reference hard-requires batchSize=1 in serving (app.py:7); coalescing
concurrent requests into one fixed-shape device call is a TPU-native
capability with no reference counterpart (b1 ~2.5 ms/img vs b8 ~1.2 —
BENCH_NOTES.md).
"""

import io
import threading
import time

import numpy as np
import pytest

from deepinpainting_tpu.serve.batcher import MicroBatcher


def test_single_item_roundtrip():
    mb = MicroBatcher(lambda b: b["x"] * 2.0, max_batch=4, wait_ms=1.0)
    try:
        out = mb.submit({"x": np.full((3,), 2.0, np.float32)})
        np.testing.assert_array_equal(out, np.full((3,), 4.0))
        assert mb.batches_run == 1 and mb.items_served == 1
    finally:
        mb.close()


def test_concurrent_items_coalesce():
    seen_batches = []

    def fn(stacked):
        seen_batches.append(int(stacked["x"].shape[0]))
        time.sleep(0.01)  # make the device call slow enough to pile up
        return stacked["x"] + 1.0

    mb = MicroBatcher(fn, max_batch=4, wait_ms=20.0)
    try:
        results = [None] * 8
        errs = []

        def call(i):
            try:
                results[i] = mb.submit({"x": np.full((2,), float(i),
                                                     np.float32)})
            except BaseException as e:  # pragma: no cover
                errs.append(e)

        threads = [threading.Thread(target=call, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs
        for i in range(8):
            np.testing.assert_array_equal(results[i],
                                          np.full((2,), i + 1.0))
        # every submitted item served, in FEWER device calls than items,
        # and every stacked call was padded to the static max_batch shape
        assert mb.items_served == 8
        assert mb.batches_run < 8
        assert all(b == 4 for b in seen_batches)
    finally:
        mb.close()


def test_padding_not_returned():
    # 3 items into max_batch=8: the 5 padded rows must never leak out
    def fn(stacked):
        assert stacked["x"].shape[0] == 8
        return stacked["x"] * 10.0

    mb = MicroBatcher(fn, max_batch=8, wait_ms=30.0)
    try:
        outs = []
        threads = [threading.Thread(
            target=lambda i=i: outs.append((i, mb.submit(
                {"x": np.full((1,), float(i), np.float32)}))))
            for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert sorted((i, float(o[0])) for i, o in outs) == [
            (0, 0.0), (1, 10.0), (2, 20.0)]
    finally:
        mb.close()


def test_batch_error_propagates_to_all_callers():
    def fn(stacked):
        raise RuntimeError("device exploded")

    mb = MicroBatcher(fn, max_batch=2, wait_ms=5.0)
    try:
        with pytest.raises(RuntimeError, match="device exploded"):
            mb.submit({"x": np.zeros((1,), np.float32)})
    finally:
        mb.close()


def test_tuple_results_split_per_item():
    mb = MicroBatcher(lambda b: (b["x"] + 1, b["x"] - 1), max_batch=2,
                      wait_ms=1.0)
    try:
        a, b = mb.submit({"x": np.full((2,), 5.0, np.float32)})
        np.testing.assert_array_equal(a, np.full((2,), 6.0))
        np.testing.assert_array_equal(b, np.full((2,), 4.0))
    finally:
        mb.close()


def test_closed_batcher_rejects():
    mb = MicroBatcher(lambda b: b["x"], max_batch=2, wait_ms=1.0)
    mb.close()
    with pytest.raises(RuntimeError, match="closed"):
        mb.submit({"x": np.zeros((1,), np.float32)})


def test_close_completes_enqueued_items():
    """Items enqueued before close() must be served, not stranded: enqueue
    and close are serialized (batcher._submit_lock), so every accepted item
    sits ahead of the shutdown sentinel in the FIFO."""
    release = threading.Event()

    def fn(stacked):
        release.wait(5.0)  # hold the worker so close() races real work
        return stacked["x"] + 1.0

    mb = MicroBatcher(fn, max_batch=2, wait_ms=1.0)
    results = []
    t = threading.Thread(target=lambda: results.append(
        mb.submit({"x": np.full((1,), 7.0, np.float32)}, timeout=10.0)))
    t.start()
    time.sleep(0.05)  # let the worker pick the item up
    release.set()
    mb.close()  # blocks until the in-flight batch finishes
    t.join(10.0)
    assert results and float(results[0][0]) == 8.0


def test_close_is_idempotent():
    mb = MicroBatcher(lambda b: b["x"], max_batch=2, wait_ms=1.0)
    mb.close()
    mb.close()  # second close: no deadlock, no error


def test_serving_app_with_batching():
    """End-to-end: the WSGI app with max_batch>1 serves concurrent POSTs
    through coalesced device calls and returns valid images."""
    from PIL import Image

    from deepinpainting_tpu.config import Config
    from deepinpainting_tpu.serve import make_app
    from test_serve import img_bytes, mask_bytes, multipart_body, wsgi_call

    cfg = Config(fine_size=32, ngf=8, ndf=8, vgg_width_scale=1 / 8,
                 mask_type="random")
    import tempfile
    static = tempfile.mkdtemp(prefix="batch_static")
    app = make_app(cfg, None, static, warmup=True, max_batch=4,
                   batch_wait_ms=10.0)

    statuses = []

    def post(seed):
        body, ctype = multipart_body({
            "srcImage": img_bytes(seed), "binaryMask": mask_bytes(),
            "refImage": img_bytes(seed + 100)})
        status, _, _ = wsgi_call(app, "POST", "/getImage", body, ctype)
        statuses.append(status)

    threads = [threading.Thread(target=post, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert statuses == ["302 Found"] * 6
    served = app.session._batcher.items_served
    assert served == 7  # 6 requests + 1 warmup
    # the result page artifact decodes as a real image
    status, _, out = wsgi_call(app, "GET", "/static/img/test.jpg")
    assert status == "200 OK"
    assert Image.open(io.BytesIO(out)).size == (32, 32)
    app.session._batcher.close()
