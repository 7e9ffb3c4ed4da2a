"""Model export to TensorFlow SavedModel via jax2tf.

The reference's "exporter" (demos/yolov3_u/pytorch_2_onnx.py) is a misnamed
copy of its inference script — no torch.onnx anywhere (SURVEY.md §2.4).
This is the real thing: any jitted inference function (e.g. the Detector's
forward+decode+NMS program) exports to a SavedModel servable by TF-Serving
or convertible onward (tf2onnx, TFLite) outside this zero-egress image.
"""
from __future__ import annotations

from typing import Callable, Sequence


def export_savedmodel(
    infer_fn: Callable,
    variables: dict,
    example_inputs: Sequence,
    path: str,
    input_names: Sequence[str] | None = None,
) -> str:
    """Export `infer_fn(variables, *inputs)` with `variables` baked in.

    Args:
      infer_fn: a jax function (params closed over arrays is fine).
      variables: the flax variables pytree to freeze into the graph.
      example_inputs: example arrays defining input signatures.
      path: output SavedModel directory.
    """
    import tensorflow as tf
    from jax.experimental import jax2tf

    def fn(*inputs):
        return infer_fn(variables, *inputs)

    tf_fn = jax2tf.convert(fn, with_gradient=False)
    module = tf.Module()
    names = list(input_names or [f"input_{i}" for i in range(len(example_inputs))])
    sigs = [
        tf.TensorSpec(x.shape, tf.as_dtype(str(x.dtype)), name=n)
        for x, n in zip(example_inputs, names)
    ]
    module.f = tf.function(tf_fn, input_signature=sigs, autograph=False)
    tf.saved_model.save(module, path)
    return path
