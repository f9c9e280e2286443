"""accelerate() equivalence property (VERDICT r4 item 6): the
reference's one de-facto test is np.allclose(vec0, vec1) across the
ONNX swap (/root/reference/README.md:59-66).  onnxruntime is absent in
this container, so the session path is exercised with an INJECTED fake
runtime (the repo's established injected-module pattern — same as the
YoutubeSource and ffmpeg tests): a deterministic linear stand-in model
is "exported" as its weight matrix, the fake InferenceSession executes
that matrix, and the outputs must match the eager stand-in bit-exactly.
This drives the real make_onnx_session construction and onnx_forward's
'.N'-suffix input-name fixup (≡ reference accelerate.py:96-106); only
ort's C++ graph executor is faked."""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest


def _install_fake_ort(monkeypatch):
    fake = types.ModuleType("onnxruntime")

    class _Input:
        def __init__(self, name):
            self.name = name

    class InferenceSession:
        def __init__(self, model_path):
            self.W = np.load(model_path)
            # ONNX exports commonly suffix graph input names ('input.1')
            self._inputs = [_Input("input.1")]

        def get_inputs(self):
            return self._inputs

        def run(self, _out_names, feed):
            X = np.asarray(feed["input.1"], dtype=np.float64)
            return [X @ self.W.T]

    fake.InferenceSession = InferenceSession
    monkeypatch.setitem(sys.modules, "onnxruntime", fake)


def test_onnx_swap_equivalence(tmp_path, monkeypatch):
    from radient_spark.accelerate import make_onnx_session, onnx_forward

    _install_fake_ort(monkeypatch)
    rng = np.random.RandomState(7)
    W = rng.randn(8, 16)
    model_path = str(tmp_path / "model.onnx.npy")
    np.save(model_path, W)

    def eager_model(X):
        return np.asarray(X, dtype=np.float64) @ W.T

    session = make_onnx_session(model_path)
    X = rng.randn(5, 16)
    vec0 = eager_model(X)
    # caller uses the logical name 'input'; the session exposes
    # 'input.1' — onnx_forward must resolve the prefix match
    [vec1] = onnx_forward(session, {"input": X})
    assert np.allclose(vec0, vec1)


def test_onnx_forward_drops_unknown_inputs(tmp_path, monkeypatch):
    from radient_spark.accelerate import make_onnx_session, onnx_forward

    _install_fake_ort(monkeypatch)
    W = np.eye(4)
    model_path = str(tmp_path / "model.onnx.npy")
    np.save(model_path, W)
    session = make_onnx_session(model_path)
    X = np.ones((2, 4))
    [out] = onnx_forward(
        session, {"input": X, "token_type_ids": np.zeros((2, 4))}
    )
    assert np.allclose(out, X)


def test_gated_imports_raise_cleanly():
    from radient_spark.accelerate import export_to_onnx, make_onnx_session

    if "torch" not in sys.modules:
        with pytest.raises(ImportError, match="torch"):
            export_to_onnx(None, None, "/tmp/never.onnx")
    # no injected fake here: the real import must fail with a message
    # naming the dependency
    sys.modules.pop("onnxruntime", None)
    with pytest.raises(ImportError, match="onnxruntime"):
        make_onnx_session("/tmp/never.onnx")
