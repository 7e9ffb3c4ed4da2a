"""Serving latency probe: p50/p99 and img/s vs concurrency (VERDICT r4 #8).

Spins `make_server` (infer/serving.py) on an ephemeral port with a real
YOLOv3-416 detector on the chip, then measures POST /predict under
concurrency 1/4/8 with the micro-batcher window at 0 ms (per-request
inference — the reference customize_service.py behavior) and at the
default 5 ms, plus /predict_stream NDJSON throughput.

Run alone on the chip host:
    python tools/probe_serving.py [--requests N]
Prints one JSON line; paste the table into docs/PERF.md.
"""
import argparse
import base64
import http.client
import json
import socket
import threading
import time

import numpy as np


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _latency_run(port: int, payload: bytes, n_requests: int, conc: int):
    lats: list[float] = []
    lock = threading.Lock()

    def client(k):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        mine = []
        for _ in range(k):
            t0 = time.perf_counter()
            conn.request("POST", "/predict", body=payload)
            r = conn.getresponse()
            r.read()
            assert r.status == 200
            mine.append(time.perf_counter() - t0)
        conn.close()
        with lock:
            lats.extend(mine)

    per = n_requests // conc
    threads = [threading.Thread(target=client, args=(per,)) for _ in range(conc)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    lats_ms = np.asarray(sorted(lats)) * 1000
    return {
        "conc": conc,
        "p50_ms": round(float(np.percentile(lats_ms, 50)), 1),
        "p99_ms": round(float(np.percentile(lats_ms, 99)), 1),
        "img_s": round(per * conc / wall, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--input-size", type=int, default=416)
    args = ap.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    from fastvision_tpu.infer import Detector, VisionService
    from fastvision_tpu.infer.serving import make_server
    from fastvision_tpu.models.detection import YOLOv3
    from fastvision_tpu.ops import COCO_ANCHORS

    S = args.input_size
    anchors = COCO_ANCHORS.reshape(3, 3, 2)[::-1].astype(np.float32)
    model = YOLOv3(num_classes=80, dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(0), jnp.zeros((1, S, S, 3), jnp.bfloat16),
                           train=True)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (480, 640, 3), np.uint8)
    payload = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, 90])[1].tobytes()

    results = {}
    for window_ms, tag in ((0.0, "window0"), (5.0, "window5"), (20.0, "window20"),
                           ("adaptive", "adaptive")):
        # same bucket set cmd_serve uses: lone requests ride a bs1 program
        det = Detector(model, variables, anchors, input_size=S, batch_size=8,
                       dtype=jnp.bfloat16, batch_buckets=(1, 2, 4))
        svc = VisionService(det)
        port = _free_port()
        server = make_server(svc, "127.0.0.1", port, batch_window_ms=window_ms)
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        svc.warmup()  # compile every bucket BEFORE traffic (as serve() does)
        svc.predict(payload)
        rows = []
        for conc in (1, 4, 8):
            rows.append(_latency_run(port, payload, args.requests, conc))
        results[tag] = rows
        server.shutdown()

    # streaming path: one connection, NDJSON body of `requests` images
    det = Detector(model, variables, anchors, input_size=S, batch_size=8,
                   dtype=jnp.bfloat16)
    svc = VisionService(det)
    port = _free_port()
    server = make_server(svc, "127.0.0.1", port)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    svc.predict(payload)
    body = "\n".join(
        json.dumps({"image": base64.b64encode(payload).decode()})
        for _ in range(args.requests)
    ).encode()
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
    t0 = time.perf_counter()
    conn.request("POST", "/predict_stream", body=body)
    r = conn.getresponse()
    n_lines = len([l for l in r.read().splitlines() if l.strip()])
    wall = time.perf_counter() - t0
    server.shutdown()
    assert n_lines == args.requests
    results["stream_img_s"] = round(args.requests / wall, 1)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
