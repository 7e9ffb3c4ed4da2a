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
from typing import Sequence

import numpy as np

from .predictor import Detector


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

    def predict(self, image_bytes: bytes) -> dict:
        image = self._decode_bytes(image_bytes)
        res = self.detector.predict_image(image)
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


def serve(service: VisionService, host: str = "0.0.0.0", port: int = 8080):
    """Run the service behind the stdlib HTTP server (blocking)."""
    from http.server import BaseHTTPRequestHandler, HTTPServer

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            if self.path.rstrip("/") not in ("", "/predict"):
                self.send_error(404)
                return
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length)
            try:
                result = service.predict(body)
                payload = json.dumps(result).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)
            except Exception as e:  # noqa: BLE001 — serving boundary
                err = json.dumps({"error": str(e)}).encode()
                self.send_response(400)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(err)))
                self.end_headers()
                self.wfile.write(err)

        def log_message(self, *args):
            pass

    server = HTTPServer((host, port), Handler)
    print(f"[serve] listening on {host}:{port} (POST /predict)")
    server.serve_forever()
