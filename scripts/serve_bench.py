"""Measure end-to-end serving request latency: POST /getImage round trips
through the WSGI app (multipart parse -> PIL decode -> host->device ->
jitted two-stage inference -> jpg encode -> redirect).

The reference's serving path (app.py:96-162) wipes and repopulates three
upload directories and builds a fresh DataLoader per request; ours decodes
in memory and reuses one jitted function — this script records the request
-level p50/p90 next to the device-level p50 bench.py reports.

  python scripts/serve_bench.py            # TPU (axon), 256px, 20 requests
  python scripts/serve_bench.py --cpu --fine_size 32 --ngf 8 ...
"""

import argparse
import io
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def multipart(fields):
    boundary = b"servebench123"
    parts = []
    for name, payload in fields.items():
        parts.append(b"--" + boundary + b"\r\n"
                     b'Content-Disposition: form-data; name="' +
                     name.encode() + b'"; filename="f"\r\n'
                     b"Content-Type: application/octet-stream\r\n\r\n" +
                     payload + b"\r\n")
    parts.append(b"--" + boundary + b"--\r\n")
    return b"".join(parts), "multipart/form-data; boundary=servebench123"


def wsgi_post(app, path, body, ctype):
    captured = {}

    def start_response(status, headers):
        captured["status"] = status

    environ = {"REQUEST_METHOD": "POST", "PATH_INFO": path,
               "CONTENT_LENGTH": str(len(body)), "CONTENT_TYPE": ctype,
               "wsgi.input": io.BytesIO(body)}
    b"".join(app(environ, start_response))
    return captured["status"]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--fine_size", type=int, default=256)
    ap.add_argument("--ngf", type=int, default=64)
    ap.add_argument("--ndf", type=int, default=64)
    ap.add_argument("--vgg_width_scale", type=float, default=1.0)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--requests", type=int, default=20)
    ap.add_argument("--concurrency", type=int, default=1,
                    help="POST from N threads at once (pair with "
                         "--max_batch to measure request coalescing)")
    ap.add_argument("--max_batch", type=int, default=1,
                    help="serve-side request coalescing (serve/batcher.py)")
    ap.add_argument("--batch_wait_ms", type=float, default=5.0)
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from PIL import Image

    from deepinpainting_tpu.config import Config
    from deepinpainting_tpu.serve import make_app

    cfg = Config(fine_size=args.fine_size, ngf=args.ngf, ndf=args.ndf,
                 vgg_width_scale=args.vgg_width_scale, dtype=args.dtype,
                 mask_type="random", is_train=False)
    app = make_app(cfg, None, "/tmp/serve_bench_static", warmup=True,
                   max_batch=args.max_batch,
                   batch_wait_ms=args.batch_wait_ms)

    s = args.fine_size
    rng = np.random.default_rng(0)

    def jpg(seed):
        buf = io.BytesIO()
        Image.fromarray(rng.integers(0, 255, (s, s, 3), dtype=np.uint8)
                        ).save(buf, "JPEG")
        return buf.getvalue()

    mask = np.zeros((s, s, 3), np.uint8)
    q = s // 4
    mask[q:3 * q, q:3 * q] = 255
    mbuf = io.BytesIO()
    Image.fromarray(mask).save(mbuf, "PNG")
    body, ctype = multipart({"srcImage": jpg(0), "binaryMask": mbuf.getvalue(),
                             "refImage": jpg(1)})

    assert wsgi_post(app, "/getImage", body, ctype) == "302 Found"  # warm
    times = []
    t_lock = __import__("threading").Lock()

    def one_request():
        t0 = time.perf_counter()
        status = wsgi_post(app, "/getImage", body, ctype)
        dt = time.perf_counter() - t0
        assert status == "302 Found", status
        with t_lock:
            times.append(dt)

    t_start = time.perf_counter()
    if args.concurrency <= 1:
        for _ in range(args.requests):
            one_request()
    else:
        import threading
        pending = args.requests
        while pending > 0:
            wave = min(args.concurrency, pending)
            threads = [threading.Thread(target=one_request)
                       for _ in range(wave)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            pending -= wave
    wall = time.perf_counter() - t_start
    times.sort()
    p50 = times[len(times) // 2] * 1000
    p90 = times[int(len(times) * 0.9)] * 1000
    rps = args.requests / wall
    print(f"serve @ {s}px: {args.requests} requests, concurrency "
          f"{args.concurrency}, max_batch {args.max_batch} -> "
          f"{rps:.1f} req/s, p50 {p50:.1f} ms, p90 {p90:.1f} ms "
          f"(min {times[0] * 1000:.1f}, max {times[-1] * 1000:.1f})")
    if args.max_batch > 1:
        mb = app.session._batcher
        print(f"  coalescing: {mb.items_served} items in {mb.batches_run} "
              f"device calls ({mb.items_served / max(1, mb.batches_run):.1f} "
              f"items/call)")


if __name__ == "__main__":
    main()
