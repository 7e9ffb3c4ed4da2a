"""Faster R-CNN int8 (w8a8 PTQ) end-to-end demo on the toy-shapes dataset.

Quantizes the VGG backbone of a trained toy-convergence Faster R-CNN
checkpoint (the RPN/Fast heads stay float — infer/quantize.py auto-skips
their plain convs), evaluates float vs int8 through the full
RPN -> RoI -> NMS -> mAP stack, and times both eval programs.

    python examples/toy_convergence.py --model faster_rcnn --out /tmp/toy_run
    python examples/toy_frcnn_int8.py --out /tmp/toy_run

Prints one JSON line: {"map50_float", "map50_int8", "img_s_float",
"img_s_int8"}.  (ROADMAP round-3: FRCNN int8 e2e demo.)
"""
import argparse
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.dirname(_HERE))

import numpy as np  # noqa: E402


def evaluate(model, variables, ds, input_size, batch_size=8, conf=0.05):
    import jax
    import jax.numpy as jnp

    from fastvision_tpu.data import DetectionLoader
    from fastvision_tpu.data.pipeline import normalize_images
    from fastvision_tpu.infer.postprocess import scale_coords
    from fastvision_tpu.models.detection.faster_rcnn import fastrcnn_postprocess
    from fastvision_tpu.ops.map import MeanAveragePrecision

    # NOT make_frcnn_eval_step: TrainState.variables() carries only
    # params/batch_stats — the int8 path needs the 'quant' collection to
    # flow through apply, so jit over the raw variables dict
    @jax.jit
    def eval_step(v, images):
        cls_logits, boxes, _, valid = model.apply(
            v, normalize_images(images, jnp.float32, imagenet=True),
            train=False)
        return fastrcnn_postprocess(cls_logits, boxes, valid, 0.05, 0.3, 100)

    loader = DetectionLoader(ds, input_size, batch_size, max_boxes=8,
                             train=False, drop_last=False)
    m = MeanAveragePrecision()
    n = 0
    t0 = time.perf_counter()
    for batch in loader.epoch(0):
        det = jax.device_get(eval_step(variables, jnp.asarray(batch["images"])))
        for i in range(batch["num_real"]):
            meta = batch["meta"][i]
            v = det.valid[i] & (det.scores[i] > conf)
            boxes = scale_coords(det.boxes[i][v], meta["scale"], meta["pad"],
                                 meta["orig_hw"])
            gt = meta["gt_pixels"]
            m.update(boxes, det.scores[i][v], det.classes[i][v],
                     gt[:, 1:5], gt[:, 0])
            n += 1
    dt = time.perf_counter() - t0
    r = m.compute()
    return r.map50, n / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/toy_run")
    ap.add_argument("--input-size", type=int, default=320)
    ap.add_argument("--calib", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fastvision_tpu.core.checkpoint import CheckpointManager
    from fastvision_tpu.data import DetectionDataset
    from fastvision_tpu.data.pipeline import normalize_images
    from fastvision_tpu.infer.quantize import quantize_model
    from fastvision_tpu.models.detection import FasterRCNN

    size = args.input_size
    ckpt_dir = os.path.join(args.out, "ckpt_faster_rcnn")
    if not os.path.isdir(ckpt_dir):
        raise SystemExit(
            f"no checkpoint at {ckpt_dir} — run "
            "`python examples/toy_convergence.py --model faster_rcnn` first")
    model = FasterRCNN(num_classes=3, image_size=size,
                       anchor_scales=(2, 4, 6))
    labels0 = jnp.full((2, 8, 5), -1, jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "sampling": jax.random.key(1),
         "dropout": jax.random.key(2)},
        jnp.zeros((2, size, size, 3)), labels0, train=True)
    mgr = CheckpointManager(ckpt_dir)
    like = {"params": variables["params"]}
    if variables.get("batch_stats"):
        like["batch_stats"] = variables["batch_stats"]
    restored = mgr.restore(like=like)["state"]
    variables = dict(variables)
    variables["params"] = restored["params"]
    if "batch_stats" in restored:
        variables["batch_stats"] = restored["batch_stats"]

    val = DetectionDataset(os.path.join(args.out, "data"), "val")
    # calibration: first val images through the same normalize as eval
    from fastvision_tpu.data.dataset import letterbox

    imgs = []
    for i in range(min(args.calib, len(val))):
        img = val[i][0]
        canvas, _, _ = letterbox(img, size)
        imgs.append(canvas)
    x = normalize_images(jnp.asarray(np.stack(imgs)), jnp.float32, imagenet=True)
    qv = quantize_model(model, variables, [x])
    assert "backbone" in qv["quant"] and "rpn" not in qv["quant"]

    map50_f, ips_f = evaluate(model, variables, val, size)
    map50_q, ips_q = evaluate(model, qv, val, size)
    out = {"map50_float": round(map50_f, 4), "map50_int8": round(map50_q, 4),
           "img_s_float": round(ips_f, 1), "img_s_int8": round(ips_q, 1)}
    print(json.dumps(out))
    assert map50_q >= map50_f - 0.03, out  # int8 must not cost real accuracy


if __name__ == "__main__":
    main()
