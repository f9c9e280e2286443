"""ImageBind-equivalent media preprocessing as Spark operators
(SURVEY.md §2.3 "preprocessors"): the deterministic, model-free stages
that feed the gated ImageBind trunks.

- audio_to_melspec_clips: waveform rows -> one row per 2 s clip carrying
  a normalized (128, 204) log-mel image (vectorizers/audio/imagebind.py:
  38-52 + the resample contract of audio/_base.py:24-39), flattened to
  array<float> for a stable Arrow schema.
- images_to_clip_tensors: image source rows (path / base64 / raw bytes)
  -> (3, 224, 224) CLIP tensors (vectorizers/image/imagebind.py:35-43 +
  the input sniffing of image/_base.py:33-64). Raw ndarray-shaped inputs
  (pixels + height/width columns) preprocess for real; encoded bytes
  need a codec — decode is gated on Pillow, with a clearly-marked
  deterministic stand-in when absent (this container has no codecs).

Both run as mapInPandas over Arrow batches: numpy kernels from
functions/media.py, no per-row Python in the driver, schema and fan-out
real regardless of which decoder branch runs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from radient_spark.functions import media as M

MEL_SCHEMA = (
    "id long, clip_idx int, n_mel int, n_frames int, mel array<float>"
)
CLIP_TENSOR_SCHEMA = (
    "id long, kind string, channels int, height int, width int, "
    "tensor array<float>"
)


def audio_to_melspec_clips(
    df: DataFrame,
    id_col: str = "id",
    wave_col: str = "waveform",
    sr_col: str = "sample_rate",
    clip_duration: int = M.CLIP_DURATION,
    num_mel_bins: int = M.NUM_MEL_BINS,
    target_length: int = M.TARGET_LENGTH,
) -> DataFrame:
    """(id, waveform array<float>, sample_rate int) -> one row per clip:
    (id, clip_idx, n_mel, n_frames, mel flattened row-major). Resamples
    to 16 kHz, splits into `clip_duration`-second clips (trailing partial
    kept), log-mels each, pads/trims to `target_length` frames and
    applies the ImageBind normalization — the full audio _preprocess
    chain, distributed."""
    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("id", "clip_idx", "n_mel", "n_frames", "mel")}
            for row in pdf.itertuples(index=False):
                wave = np.asarray(getattr(row, wave_col), dtype=np.float64)
                sr = int(getattr(row, sr_col))
                mels = M.waveform_to_melspec_clips(
                    wave,
                    orig_sr=sr,
                    clip_duration=clip_duration,
                    num_mel_bins=num_mel_bins,
                    target_length=target_length,
                )
                for i, mel in enumerate(mels):
                    out["id"].append(getattr(row, id_col))
                    out["clip_idx"].append(i)
                    out["n_mel"].append(mel.shape[0])
                    out["n_frames"].append(mel.shape[1])
                    out["mel"].append(mel.ravel())
            if out["id"]:  # empty frames degrade array cols to float64
                yield pd.DataFrame(out)

    return df.select(id_col, wave_col, sr_col).mapInPandas(gen, MEL_SCHEMA)


def _fake_decode_rgb(payload: bytes, h: int = 64, w: int = 64) -> np.ndarray:
    """CLEARLY-MARKED STAND-IN for image decode (no codecs in this
    container): a deterministic RGB gradient seeded from the payload's
    md5, so plumbing tests are stable and collisions are unlikely.
    Production replaces this branch with Pillow (gated import below)."""
    seed = int(hashlib.md5(payload).hexdigest()[:8], 16)
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 256, size=(4, 4, 3))
    return np.clip(M.resize_bicubic(base.astype(np.float64), h, w), 0, 255)


def images_to_clip_tensors(
    df: DataFrame,
    id_col: str = "id",
    source_col: str = "source",
    size: int = M.IMAGE_SIZE,
) -> DataFrame:
    """(id, source) -> (id, kind, 3, size, size, tensor flattened).

    `source` may be a string (path to an existing image file, or base64
    payload — sniffed exactly like image/_base.py:33-64) or raw encoded
    bytes. Decoding encoded bytes uses Pillow when importable; otherwise
    the deterministic stand-in keeps the pipeline runnable in codec-free
    CI. The resize/crop/normalize math is always real."""
    import pandas as pd

    try:  # gated codec: real decode when Pillow is present
        import importlib.util

        _HAVE_PIL = importlib.util.find_spec("PIL") is not None
    except Exception:  # pragma: no cover
        _HAVE_PIL = False

    def decode(payload: bytes) -> np.ndarray:
        if _HAVE_PIL:  # pragma: no cover — codec path exercised off-CI
            import io

            from PIL import Image

            return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
        return _fake_decode_rgb(payload)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                k: []
                for k in ("id", "kind", "channels", "height", "width", "tensor")
            }
            for row in pdf.itertuples(index=False):
                src = getattr(row, source_col)
                kind, payload = M.sniff_image_source(src)
                if kind == "url":
                    # network fetch is out of scope in executors here;
                    # surface the classification, skip the row
                    continue
                arr = payload if kind == "array" else decode(payload)
                tensor = M.image_to_clip_tensor(arr, size=size)
                out["id"].append(getattr(row, id_col))
                out["kind"].append(kind)
                out["channels"].append(tensor.shape[0])
                out["height"].append(tensor.shape[1])
                out["width"].append(tensor.shape[2])
                out["tensor"].append(tensor.ravel())
            if out["id"]:  # empty frames degrade array cols to float64
                yield pd.DataFrame(out)

    return df.select(id_col, source_col).mapInPandas(gen, CLIP_TENSOR_SCHEMA)
