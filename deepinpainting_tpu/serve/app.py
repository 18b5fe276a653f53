"""Web serving app: browser mask-painting demo backed by jitted inference.

Capability parity with the reference Flask app (app.py:77-172) and its
browser UI: the same HTTP surface —
    GET  /          -> mask-painting page (canvas over the source image)
    POST /getImage  -> multipart fields `srcImage`, `binaryMask`, `refImage`
                       (templates/index.html:101-114), runs the model,
                       writes static/img/test.jpg, 302 -> /result
    GET  /result    -> page showing static/img/test.jpg (force-reloaded)
    GET  /static/*  -> static assets
— but implemented as a dependency-free WSGI application (this image has no
Flask; any WSGI server can host it, `scripts/serve.py` uses wsgiref).

TPU-native difference: the reference round-trips uploads through on-disk
directories and a torch DataLoader per request (app.py:101-140, wiping
test1/test2/test3 each time); here uploads are decoded in memory and fed
straight to one pre-jitted inference function — no filesystem churn, no
per-request graph rebuild, compile happens once at startup.
"""

from __future__ import annotations

import io
import os
import threading
from email.parser import BytesParser
from email.policy import HTTP
from typing import Callable, Dict, Optional, Tuple

import numpy as np
from PIL import Image

import jax

from ..config import Config
from ..engine import create_state, make_serving_fn
from ..engine.checkpoint import CheckpointManager


_TEMPLATE_DIR = os.path.join(os.path.dirname(__file__), "templates")


def parse_multipart(content_type: str, body: bytes) -> Dict[str, bytes]:
    """Parse multipart/form-data into {field_name: file_bytes}."""
    parser = BytesParser(policy=HTTP)
    msg = parser.parsebytes(
        b"Content-Type: " + content_type.encode() + b"\r\n\r\n" + body)
    if not msg.is_multipart():
        raise ValueError("expected multipart/form-data")
    fields: Dict[str, bytes] = {}
    for part in msg.iter_parts():
        name = part.get_param("name", header="content-disposition")
        if name:
            fields[name] = part.get_payload(decode=True) or b""
    return fields


class InferenceSession:
    """Loads a checkpoint once and serves jitted single-image inference.

    The role of the reference's module-level model construction + load
    (app.py:79-83): cold-start once, then every request is one device call.
    """

    def __init__(self, cfg: Config, which_epoch: Optional[int] = None, *,
                 state=None, max_batch: int = 1, batch_wait_ms: float = 2.0,
                 sp: bool = False):
        self.cfg = cfg.replace(is_train=False, mask_type="random",
                               batch_size=1)
        if state is None:
            state = create_state(self.cfg, jax.random.PRNGKey(self.cfg.seed))
            if which_epoch is not None:
                mgr = CheckpointManager(self.cfg)
                state = mgr.restore(which_epoch, state)
                mgr.close()
        self.state = state
        # uint8 both directions (engine.inpaint.make_serving_fn): the
        # result travels device->host as 1 byte/px instead of 4 — over a
        # remote tunnel the fetch is the request critical path — and the
        # jpg encoder wants uint8 anyway.
        _infer_u8 = make_serving_fn(self.cfg)

        if sp and len(jax.devices()) > 1:
            # Spatial partitioning: ONE request's image rows spread over
            # every chip (parallel/spatial.py) — the batch-1 latency axis
            # that request coalescing can't touch.  numpy args are placed
            # per in_shardings by the jit call itself; the uint8 result
            # gathers on fetch.
            from .. import parallel as PP
            from ..ops.convs import sp_hint_mode
            mesh = PP.make_sp_mesh()
            rep, spd = PP.replicated(mesh), PP.spatial_sharding(mesh)

            def hinted(*args):
                # live whenever XLA traces the body: the U-Net blocks pin
                # unshardable bottleneck heights to an explicit sharding
                # instead of GSPMD's warned involuntary reshard (same as
                # the parallel/spatial.py builders)
                with sp_hint_mode(mesh, "sp"):
                    return _infer_u8(*args)

            self._infer = jax.jit(hinted,
                                  in_shardings=(rep, rep, rep, spd, spd, spd),
                                  out_shardings=spd)
        else:
            self._infer = jax.jit(_infer_u8)
        self._lock = threading.Lock()  # wsgiref may thread; device calls serialize
        # max_batch > 1: coalesce concurrent requests into one device call
        # (serve/batcher.py) — b1 is ~2.5 ms/img on-device but b8 is
        # ~1.2 ms/img, so batching ~2x's loaded serving throughput.
        self._batcher = self._make_batcher(max_batch, batch_wait_ms)

    @classmethod
    def from_export(cls, artifact_dir: str, *, max_batch: int = 1,
                    batch_wait_ms: float = 2.0) -> "InferenceSession":
        """Serve a pre-exported AOT artifact (engine/export_model.py).

        The graph comes from serialized StableHLO — no model construction
        and no tracing happen in the serving process.  Artifacts are
        batch-polymorphic (symbolic batch dim, or a fixed exported set
        with pad-and-chunk dispatch — see export_model.py), so request
        coalescing (--max_batch) works exactly as in a live session.
        Spatial partitioning (--sp) remains export-time-only: shardings
        are part of the traced graph.
        """
        from ..engine.export_model import load_serving
        loaded = load_serving(artifact_dir)
        sess = cls.__new__(cls)
        sess.cfg = loaded.cfg.replace(is_train=False, batch_size=1)
        sess.state = loaded  # duck-types params_G / params_P / vgg
        sess._infer = loaded.call
        sess._lock = threading.Lock()
        sess._batcher = sess._make_batcher(max_batch, batch_wait_ms)
        return sess

    def _make_batcher(self, max_batch: int, batch_wait_ms: float):
        """Shared by __init__ and from_export: both set .state (or a
        duck-typed artifact namespace) and ._infer before calling."""
        if max_batch <= 1:
            return None
        from .batcher import MicroBatcher

        def batched(stacked):
            u8 = self._infer(
                self.state.params_G, self.state.params_P, self.state.vgg,
                stacked["image"], stacked["mask"], stacked["ref"])
            return np.asarray(u8)

        return MicroBatcher(batched, max_batch, batch_wait_ms)

    def warmup(self) -> None:
        # uint8, matching run_bytes' transport, so the first real request
        # hits the already-compiled jit signature
        s = self.cfg.fine_size
        z = np.zeros((1, s, s, 3), np.uint8)
        m = np.zeros((1, s, s), np.uint8)
        self.run(z, m, z)

    def run(self, image: np.ndarray, mask: np.ndarray, ref: np.ndarray
            ) -> np.ndarray:
        """image/ref: [1,H,W,3] uint8 (or [-1,1] f32); mask: [1,H,W] uint8
        0/1 (or f32).  Returns the inpainted result as uint8 [1,H,W,3]
        (quantized ON DEVICE — see _infer_u8).  uint8 both directions
        quarters the per-request tunnel/PCIe traffic."""
        if self._batcher is not None and image.shape[0] == 1:
            u8 = self._batcher.submit(
                {"image": image[0], "mask": mask[0], "ref": ref[0]})
            return u8[None]
        with self._lock:
            # numpy args go straight to the jit call: argument transfers
            # ride the ONE execute dispatch.  (An explicit device_put first
            # was measured SLOWER over the remote-TPU tunnel — it adds its
            # own blocking round trip: p50 156 ms direct vs 303 ms with the
            # extra device_put, scripts/serve_bench.py.)
            u8 = self._infer(
                self.state.params_G, self.state.params_P, self.state.vgg,
                image, mask, ref)
        return np.asarray(u8)

    def run_bytes(self, src: bytes, mask: bytes, ref: bytes) -> np.ndarray:
        """Decode uploaded bytes (the app.py:126-149 transform chain:
        resize, normalize, mask channel 0 -> bool) and inpaint."""
        s = self.cfg.fine_size

        def dec(b, what):
            try:
                return Image.open(io.BytesIO(b)).convert("RGB").resize(
                    (s, s), Image.BILINEAR)
            except Exception as e:
                raise ValueError(f"could not decode {what}: {e}") from e

        def dec_img(b, what):
            return np.asarray(dec(b, what), np.uint8)[None]

        def dec_mask(b):
            return (np.asarray(dec(b, "binaryMask"), np.uint8)[..., 0]
                    > 0).astype(np.uint8)[None]

        fake_B = self.run(dec_img(src, "srcImage"), dec_mask(mask),
                          dec_img(ref, "refImage"))
        return fake_B[0]  # uint8 [H,W,3]


class InpaintApp:
    """The WSGI application."""

    def __init__(self, session: InferenceSession, static_dir: str):
        self.session = session
        self.static_dir = os.path.abspath(static_dir)
        os.makedirs(os.path.join(self.static_dir, "img"), exist_ok=True)

    # -- templating (stdlib string substitution; templates are self-owned) --
    def _render(self, name: str, **ctx) -> bytes:
        with open(os.path.join(_TEMPLATE_DIR, name)) as f:
            html = f.read()
        for k, v in ctx.items():
            html = html.replace("{{ %s }}" % k, str(v))
        return html.encode()

    # -- wsgi ----------------------------------------------------------------
    def __call__(self, environ, start_response):
        method = environ["REQUEST_METHOD"]
        path = environ.get("PATH_INFO", "/")
        try:
            if path == "/" and method == "GET":
                return self._ok(start_response, self._render("index.html"))
            if path == "/getImage":
                if method != "POST":
                    # app.py:96 allows GET on the route; it falls through to
                    # the redirect without running the model.
                    return self._redirect(start_response, "/result")
                return self._get_image(environ, start_response)
            if path == "/result" and method == "GET":
                return self._ok(start_response,
                                self._render("result.html"))
            if path.startswith("/static/") and method == "GET":
                return self._static(start_response, path[len("/static/"):])
            return self._error(start_response, "404 Not Found", "not found")
        except ValueError as e:
            return self._error(start_response, "400 Bad Request", str(e))

    def _get_image(self, environ, start_response):
        length = int(environ.get("CONTENT_LENGTH") or 0)
        body = environ["wsgi.input"].read(length)
        fields = parse_multipart(environ.get("CONTENT_TYPE", ""), body)
        missing = [k for k in ("srcImage", "binaryMask", "refImage")
                   if not fields.get(k)]
        if missing:
            raise ValueError(f"missing upload field(s): {', '.join(missing)}")
        fake_B = self.session.run_bytes(
            fields["srcImage"], fields["binaryMask"], fields["refImage"])
        # app.py:160-161: save (fake_B+1)/2 as static/img/test.jpg
        # (fake_B is already device-quantized uint8 == tensor2im output)
        out_path = os.path.join(self.static_dir, "img", "test.jpg")
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        Image.fromarray(fake_B).save(out_path)
        return self._redirect(start_response, "/result")

    def _static(self, start_response, rel: str):
        full = os.path.abspath(os.path.join(self.static_dir, rel))
        if not full.startswith(self.static_dir + os.sep) or not \
                os.path.isfile(full):
            return self._error(start_response, "404 Not Found", "not found")
        ctype = ("image/jpeg" if full.endswith((".jpg", ".jpeg")) else
                 "image/png" if full.endswith(".png") else
                 "text/css" if full.endswith(".css") else
                 "application/javascript" if full.endswith(".js") else
                 "application/octet-stream")
        with open(full, "rb") as f:
            data = f.read()
        start_response("200 OK", [("Content-Type", ctype),
                                  ("Content-Length", str(len(data))),
                                  ("Cache-Control", "no-store")])
        return [data]

    def _ok(self, start_response, body: bytes):
        start_response("200 OK", [("Content-Type", "text/html; charset=utf-8"),
                                  ("Content-Length", str(len(body)))])
        return [body]

    def _redirect(self, start_response, location: str):
        start_response("302 Found", [("Location", location),
                                     ("Content-Length", "0")])
        return [b""]

    def _error(self, start_response, status: str, message: str):
        body = message.encode()
        start_response(status, [("Content-Type", "text/plain"),
                                ("Content-Length", str(len(body)))])
        return [body]


def make_app(cfg: Config, which_epoch: Optional[int] = None,
             static_dir: Optional[str] = None, *, state=None,
             warmup: bool = True, max_batch: int = 1,
             batch_wait_ms: float = 2.0, sp: bool = False,
             from_export: Optional[str] = None) -> InpaintApp:
    if from_export:
        session = InferenceSession.from_export(from_export,
                                               max_batch=max_batch,
                                               batch_wait_ms=batch_wait_ms)
        cfg = session.cfg
    else:
        session = InferenceSession(cfg, which_epoch, state=state,
                                   max_batch=max_batch,
                                   batch_wait_ms=batch_wait_ms, sp=sp)
    if warmup:
        session.warmup()
    return InpaintApp(session, static_dir or os.path.join(
        cfg.checkpoints_dir, cfg.name, "static"))
