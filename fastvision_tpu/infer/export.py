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


def export_tflite(
    infer_fn: Callable,
    variables: dict,
    example_inputs: Sequence,
    path: str,
    input_names: Sequence[str] | None = None,
    allow_select_ops: bool = True,
    representative_inputs: Sequence | None = None,
) -> str:
    """Export `infer_fn(variables, *inputs)` as a `.tflite` flatbuffer.

    Same contract as :func:`export_savedmodel` but produces a single-file
    TFLite model (edge/mobile deployment — a path the reference's misnamed
    "onnx" exporter, demos/yolov3_u/pytorch_2_onnx.py, never provided).
    `variables` are frozen into the flatbuffer.

    int8 note: our device w8a8 bake (infer/quantize.py) emits raw s8
    lax.conv arithmetic, which XLA compiles but TFLite builtins reject
    (they require quantized QI8 *types*, not plain i8 tensors). For an
    int8 TFLite artifact, export the FLOAT variables and pass
    `representative_inputs` — the TFLite-idiomatic converter-side PTQ.

    Args:
      allow_select_ops: permit TF "flex" ops for graph pieces with no
        builtin TFLite kernel (e.g. the sort inside fixed-K NMS). The
        standard TF python interpreter and the flex-delegate AARs run
        these; pass False to require pure-builtin graphs (raises at
        conversion if anything falls outside the builtin set).
      representative_inputs: iterable of example input tuples (or single
        arrays) used as the TFLite PTQ representative dataset; enables
        converter-side int8 quantization with float fallback.
    """
    import tensorflow as tf
    from jax.experimental import jax2tf

    def fn(*inputs):
        return infer_fn(variables, *inputs)

    tf_fn = jax2tf.convert(fn, with_gradient=False)
    names = list(input_names or [f"input_{i}" for i in range(len(example_inputs))])
    sigs = [
        tf.TensorSpec(x.shape, tf.as_dtype(str(x.dtype)), name=n)
        for x, n in zip(example_inputs, names)
    ]
    cf = tf.function(tf_fn, input_signature=sigs, autograph=False).get_concrete_function()

    def _convert(op_sets):
        conv = tf.lite.TFLiteConverter.from_concrete_functions([cf])
        conv.target_spec.supported_ops = op_sets
        if representative_inputs is not None:
            import numpy as _np

            def _rep():
                for ex in representative_inputs:
                    if not isinstance(ex, (tuple, list)):
                        ex = (ex,)
                    yield [_np.asarray(e) for e in ex]

            conv.optimizations = [tf.lite.Optimize.DEFAULT]
            conv.representative_dataset = _rep
        return conv.convert()

    if allow_select_ops:
        try:
            blob = _convert([tf.lite.OpsSet.TFLITE_BUILTINS,
                             tf.lite.OpsSet.SELECT_TF_OPS])
        except Exception as e:
            # Some builtin kernels reject dtypes the graph needs (e.g.
            # tfl.pad on the int8 activations of a w8a8-baked graph fails
            # MLIR legalization). Flex-only keeps those ops as TF kernels —
            # bigger binary, same numerics. Surface the builtin failure so
            # real converter bugs aren't silently masked by the fallback.
            import warnings

            warnings.warn(
                "TFLite builtin+select conversion failed; retrying with "
                f"SELECT_TF_OPS only (bigger, TF-kernel-dependent artifact). "
                f"Original error: {e!r}",
                RuntimeWarning,
                stacklevel=2,
            )
            blob = _convert([tf.lite.OpsSet.SELECT_TF_OPS])
    else:
        blob = _convert([tf.lite.OpsSet.TFLITE_BUILTINS])
    with open(path, "wb") as f:
        f.write(blob)
    return path


def export_stablehlo(
    infer_fn: Callable,
    variables: dict,
    example_inputs: Sequence,
    path: str,
) -> str:
    """Serialize `infer_fn(variables, *inputs)` as a StableHLO artifact.

    The TPU-native deployment format: `jax.export` captures the traced
    program (weights baked in) as versioned, backward-compatible
    StableHLO bytes — no Python model code, flax, or checkpoint needed at
    the destination; :func:`load_stablehlo` (or any jax >= the artifact's
    minimum version, on any backend) calls it directly. Complements the
    persistent compile cache (core.mesh.enable_compile_cache): the
    artifact pins the PROGRAM, the cache skips recompiling it.
    """
    import jax
    from jax import export as jax_export

    def fn(*inputs):
        return infer_fn(variables, *inputs)

    specs = [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in example_inputs]
    exported = jax_export.export(jax.jit(fn))(*specs)
    with open(path, "wb") as f:
        f.write(exported.serialize())
    return path


def load_stablehlo(path: str) -> Callable:
    """Load a :func:`export_stablehlo` artifact; returns a callable jax
    function (jit-compatible, differentiable=no, weights baked in)."""
    from jax import export as jax_export

    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    return exported.call
