"""HTTP serving adapter (ref demos/yolov3_huaweiShip/customize_service.py).

Mirrors the ModelArts PTVisionService contract (:344-488):
  request (image bytes) -> _preprocess (decode + letterbox)
  -> _inference (jitted forward+decode+NMS on device)
  -> _postprocess (unscale to native coords)
  -> JSON {detection_classes, detection_scores, detection_boxes} with boxes
     as [y1, x1, y2, x2] (the reference's serving layout, :472-488).

`VisionService` is framework-agnostic (callable from any HTTP layer);
`serve()` runs it behind the stdlib http.server for a dependency-free
deployment (POST /predict with an image body or multipart file).
"""
from __future__ import annotations

import json
import time
from typing import Sequence

import numpy as np

from .predictor import Detector


class ServerClosing(RuntimeError):
    """Raised to callers whose request arrived after graceful shutdown
    began — the ONE retryable-elsewhere condition. A dedicated type so the
    HTTP layer's 503 mapping can't swallow real runtime failures (jaxlib's
    XlaRuntimeError subclasses RuntimeError)."""


class VisionService:
    """preprocess -> infer -> postprocess -> JSON-able dict."""

    def __init__(self, detector: Detector, class_names: Sequence[str] | None = None):
        self.detector = detector
        self.class_names = list(class_names) if class_names else detector.class_names

    def _decode_bytes(self, data: bytes) -> np.ndarray:
        import cv2

        arr = np.frombuffer(data, np.uint8)
        img = cv2.imdecode(arr, cv2.IMREAD_COLOR)
        if img is None:
            raise ValueError("cannot decode image payload")
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

    def _to_json(self, res: dict) -> dict:
        names = self.class_names
        classes = [
            names[int(c)] if names else int(c) for c in res["classes"]
        ]
        # serving box layout is y1, x1, y2, x2 (customize_service.py:472-488)
        boxes = [
            [float(b[1]), float(b[0]), float(b[3]), float(b[2])]
            for b in res["boxes"]
        ]
        return {
            "detection_classes": classes,
            "detection_scores": [round(float(s), 5) for s in res["scores"]],
            "detection_boxes": boxes,
        }

    def predict(self, image_bytes: bytes) -> dict:
        return self._to_json(
            self.detector.predict_image(self._decode_bytes(image_bytes))
        )

    def warmup(self) -> None:
        """Compile every batch bucket BEFORE taking traffic: a bucket's
        first use otherwise compiles mid-request (tens of seconds over a
        slow link — measured as 24-30 s p99 spikes; docs/PERF.md). With a
        persistent compile cache (cfg.compile_cache) this is a disk load.
        The warmed bucket list is reported by GET /healthz."""
        dummy = np.zeros((64, 64, 3), np.uint8)
        buckets = getattr(self.detector, "batch_buckets",
                          (self.detector.batch_size,))
        for b in buckets:
            self.detector.predict_batch([dummy] * int(b))
        self.warmed_buckets = sorted(int(b) for b in buckets)

    def predict_many(self, payloads: Sequence[bytes]) -> list[dict]:
        """One device call for several requests (micro-batching path)."""
        images = [self._decode_bytes(b) for b in payloads]
        return [self._to_json(r) for r in self.detector.predict_batch(images)]

    def predict_stream(self, payloads: Sequence[bytes]):
        """Yield one JSON-able result per payload, produced batch-by-batch
        (device batch_size at a time) so callers can stream large jobs
        without waiting for the whole set (POST /predict_stream)."""
        bs = self.detector.batch_size
        for i in range(0, len(payloads), bs):
            yield from self.predict_many(payloads[i : i + bs])


class _MicroBatcher:
    """Aggregates concurrent requests into one compiled-batch device call.

    Requests enqueue; a worker drains up to `max_batch` at a time and runs
    them through VisionService.predict_many. Each caller blocks on its own
    event. Replaces the per-request `_inference` of the ModelArts host with
    a batching layer that keeps the fixed-batch jitted program full.

    Window policies (how long to wait for stragglers after the first
    arrival):
      - fixed (window_ms = float): wait up to that long. A lone request
        always pays the full window; the right value depends on queue
        depth (docs/PERF.md: 5 ms wins p50 at low concurrency, 20 ms wins
        throughput at conc 8 once batch_buckets make partial batches cheap).
      - 'adaptive' (default): wait in small quanta and KEEP waiting only
        while the batch is still growing — one idle quantum flushes. A
        lone request pays ~one quantum (2 ms); a busy queue keeps filling
        toward max_batch, capped at `max_window_ms`. Tracks both fixed
        policies' best cells without tuning.
    """

    QUANTUM = 0.002  # s — idle-flush granularity of the adaptive policy

    def __init__(self, service: VisionService, max_batch: int | None = None,
                 window_ms: float | str = "adaptive",
                 max_window_ms: float = 20.0):
        import queue
        import threading

        self.service = service
        self.max_batch = max_batch or service.detector.batch_size
        self.adaptive = window_ms == "adaptive"
        self.window = (max_window_ms if self.adaptive else float(window_ms)) / 1000.0
        self._q: "queue.Queue" = queue.Queue()
        self._closed = False
        self._lock = threading.Lock()  # orders closed-check+put vs shutdown
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def predict(self, payload: bytes) -> dict:
        import threading

        slot = {"event": threading.Event(), "payload": payload}
        with self._lock:  # no slot may enqueue after the shutdown sentinel
            if self._closed:
                raise ServerClosing("server is shutting down")
            self._q.put(slot)
        slot["event"].wait()
        if "error" in slot:
            raise slot["error"]
        return slot["result"]

    def queue_depth(self) -> int:
        return self._q.qsize()

    def shutdown(self, timeout: float = 30.0) -> bool:
        """Graceful drain: stop accepting new requests, finish every
        already-queued one (each blocked caller gets its real result), then
        stop the worker. Idempotent.

        Returns True when the backlog fully drained within `timeout`;
        False when requests were still in flight when it expired (callers
        still blocked then see connection resets if the process exits —
        size `timeout` to cover queue_depth() x worst batch latency)."""
        with self._lock:
            if self._closed:
                return not self._thread.is_alive()
            self._closed = True
            self._q.put(None)  # sentinel wakes the worker after the backlog
        self._thread.join(timeout)
        drained = not self._thread.is_alive()
        if not drained:
            print(f"[serve] WARNING: drain timed out after {timeout}s with "
                  f"~{self._q.qsize()} request(s) still queued")
        return drained

    def _gather(self, slots: list) -> None:
        """Fill `slots` up to max_batch according to the window policy."""
        import queue

        deadline = time.monotonic() + self.window
        while len(slots) < self.max_batch:
            now = time.monotonic()
            if now >= deadline:
                return
            q_deadline = min(now + self.QUANTUM, deadline) if self.adaptive else deadline
            grew = False
            while len(slots) < self.max_batch:
                remaining = q_deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    slots.append(self._q.get(timeout=remaining))
                    grew = True
                except queue.Empty:
                    break
            if self.adaptive and not grew:
                return  # an idle quantum: the burst is over, flush now
            if not self.adaptive:
                return  # fixed window elapsed (or batch full)

    def _worker(self):
        while True:
            first = self._q.get()
            if first is None:  # shutdown sentinel — backlog already drained
                return
            slots = [first]
            self._gather(slots)
            if None in slots:  # sentinel swept up mid-drain: put it back
                slots.remove(None)  # so the loop exits after this batch
                self._q.put(None)
                if not slots:
                    continue
            try:
                results = self.service.predict_many([s["payload"] for s in slots])
                for s, r in zip(slots, results):
                    s["result"] = r
            except Exception as e:  # noqa: BLE001 — isolate bad payloads
                # retry one-by-one so a single bad image fails only itself
                for s in slots:
                    try:
                        s["result"] = self.service.predict(s["payload"])
                    except Exception as ee:  # noqa: BLE001
                        s["error"] = ee
                del e
            for s in slots:
                s["event"].set()


def serve(service: VisionService, host: str = "0.0.0.0", port: int = 8080,
          batch_window_ms: float | str = "adaptive"):
    """Run the service behind a THREADED stdlib HTTP server (blocking).

    Concurrent POST /predict requests are micro-batched into one device
    call; GET /healthz reports liveness, warmed batch buckets, and queue
    depth. SIGTERM/SIGINT shut down gracefully: stop accepting, drain the
    micro-batch queue (every in-flight request gets its result), then stop
    — the ModelArts platform gave the reference this from the outside
    (customize_service.py:344); a stdlib server must self-cover."""
    import signal

    print("[serve] warming compiled batch buckets...")
    service.warmup()
    server = make_server(service, host, port, batch_window_ms)

    def _graceful(signum, frame):
        print(f"[serve] signal {signum}: draining micro-batch queue...")
        server.batcher.shutdown()
        # shutdown() must come from another thread than serve_forever's
        import threading

        threading.Thread(target=server.shutdown, daemon=True).start()

    import threading

    if threading.current_thread() is threading.main_thread():
        # signal handlers are main-thread-only; embedded serve() threads
        # (tests, notebooks) drain via server.batcher.shutdown() instead
        signal.signal(signal.SIGTERM, _graceful)
        signal.signal(signal.SIGINT, _graceful)
    print(f"[serve] listening on {host}:{port} "
          f"(POST /predict, GET /healthz)")
    server.serve_forever()
    print("[serve] drained; bye")


def make_server(service: VisionService, host: str = "127.0.0.1",
                port: int = 8080, batch_window_ms: float | str = "adaptive",
                max_body_mb: float = 32.0):
    """Build (but don't start) the HTTP server — separable for tests.

    The returned server exposes `.batcher` (call `.shutdown()` to drain
    gracefully). Requests larger than `max_body_mb` are rejected with 413
    before the body is read."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    batcher = _MicroBatcher(service, window_ms=batch_window_ms)
    max_body = int(max_body_mb * 1024 * 1024)

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, obj: dict):
            payload = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def do_GET(self):
            if self.path.rstrip("/") in ("/health", "/healthz"):
                self._send(200, {
                    "status": "draining" if batcher._closed else "ok",
                    "warmed_buckets": getattr(service, "warmed_buckets", []),
                    "queue_depth": batcher.queue_depth(),
                })
            else:
                self.send_error(404)

        def _chunk(self, data: bytes):
            self.wfile.write(f"{len(data):X}\r\n".encode() + data + b"\r\n")
            self.wfile.flush()

        def _stream(self, body: bytes):
            """POST /predict_stream: request body is NDJSON lines
            {"image": "<base64>"}; response is CHUNKED NDJSON, one result
            line per image, flushed as each device micro-batch completes —
            large jobs stream instead of buffering server-side."""
            import base64

            payloads = [
                base64.b64decode(json.loads(line)["image"])
                for line in body.splitlines() if line.strip()
            ]
            self.send_response(200)
            self.send_header("Content-Type", "application/x-ndjson")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()
            try:
                for res in service.predict_stream(payloads):
                    self._chunk(json.dumps(res).encode() + b"\n")
            except Exception as e:  # noqa: BLE001 — headers already sent:
                # report mid-stream failures as a final NDJSON error line
                self._chunk(json.dumps({"error": str(e)}).encode() + b"\n")
            self._chunk(b"")  # terminal 0-length chunk

        def do_POST(self):
            path = self.path.rstrip("/")
            if path not in ("", "/predict", "/predict_stream"):
                self.send_error(404)
                return
            length = int(self.headers.get("Content-Length", 0))
            if length > max_body:
                # reject BEFORE reading: a huge body must not be buffered
                self._send(413, {"error": f"request body {length} B exceeds "
                                          f"cap {max_body} B"})
                self.close_connection = True
                return
            body = self.rfile.read(length)
            try:
                if path == "/predict_stream":
                    self._stream(body)
                else:
                    self._send(200, batcher.predict(body))
            except ServerClosing as e:  # shutting down — retryable elsewhere
                self._send(503, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — serving boundary
                self._send(400, {"error": str(e)})

        def log_message(self, *args):
            pass

    server = ThreadingHTTPServer((host, port), Handler)
    server.batcher = batcher
    return server
