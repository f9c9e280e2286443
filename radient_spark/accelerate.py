"""ONNX acceleration for model-backed UDFs (SURVEY.md §2.6).

≡ the reference's export_to_onnx / ONNXForward / accelerate()
(/root/reference/radient/tasks/accelerate.py:15-132): export a torch
model to ONNX once, then run inference through an onnxruntime session —
the reference reports ~32 ms -> ~17 ms per text embedding (README.md:68).

Spark placement: the session is created once per executor Python worker
inside the pandas_udf (the same place the torch model would live), so
acceleration is orthogonal to distribution — a deployment swaps
`make_torch_encoder` for `make_onnx_encoder` in the vectorizer UDF and
everything else (batching, Arrow transfer, partitioning) is unchanged.

Everything here is import-gated: torch/onnxruntime are not in this
container, so functions raise ImportError naming the missing dependency;
the module's surface (export path layout, session construction, input
name fixup) mirrors accelerate.py so parity is reviewable.
"""

from __future__ import annotations

import os

DEFAULT_CACHE = os.path.expanduser("~/.radient_spark/accelerated_models")


def export_to_onnx(
    model,
    sample_input,
    model_path: str,
    input_names: list[str] | None = None,
    output_names: list[str] | None = None,
) -> str:  # pragma: no cover - torch not in CI
    """Export a torch model with dynamic batch/sequence axes
    (≡ accelerate.py:15-66, incl. do_constant_folding)."""
    try:
        import torch
    except ImportError as e:
        raise ImportError("torch is required for export_to_onnx") from e

    os.makedirs(os.path.dirname(model_path), exist_ok=True)
    input_names = input_names or ["input"]
    output_names = output_names or ["output"]
    dynamic_axes = {
        name: {0: "batch", 1: "sequence"} for name in input_names + output_names
    }
    torch.onnx.export(
        model,
        sample_input,
        model_path,
        do_constant_folding=True,
        input_names=input_names,
        output_names=output_names,
        dynamic_axes=dynamic_axes,
    )
    return model_path


def make_onnx_session(model_path: str):  # pragma: no cover - ort not in CI
    """Per-executor onnxruntime session (≡ ONNXForward's session,
    accelerate.py:77-107). Call inside the pandas_udf generator so each
    Python worker builds exactly one session."""
    try:
        import onnxruntime as ort
    except ImportError as e:
        raise ImportError("onnxruntime is required for make_onnx_session") from e

    return ort.InferenceSession(model_path)


def onnx_forward(session, inputs: dict):  # pragma: no cover - ort not in CI
    """Run a session, fixing up ONNX's '.N'-suffixed input names
    (≡ the name-fixup loop in accelerate.py:96-106)."""
    feed = {}
    session_names = [i.name for i in session.get_inputs()]
    for name, value in inputs.items():
        if name in session_names:
            feed[name] = value
        else:
            match = [s for s in session_names if s.split(".")[0] == name]
            if match:
                feed[match[0]] = value
    return session.run(None, feed)
