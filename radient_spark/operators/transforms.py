"""Media transforms: one-to-many modality converters (SURVEY.md §2.2).

Reference operators re-expressed:
- video demux (transforms/video_demux/default.py:18-61 + ffmpeg.py:9-61):
  one video -> frame rows (modality 'image') + clip rows (modality
  'audio'), one row per `interval` seconds.
- PDF screenshot (transforms/document_screenshot/pymupdf.py:16-47):
  one document -> one row per page.
- speech-to-text (transforms/speech_to_text/whisper.py:16-45):
  audio -> transcript text row.

Spark shape: `mapInPandas` (Arrow batches in/out, one-to-many row fan-out
— the DataFrame-native `explode`), with per-executor decoder state. The
heavy codecs (OpenCV/librosa/ffmpeg/PyMuPDF/Whisper) are NOT in this
container, so the decode step is pluggable: `decoder=None` uses a
deterministic metadata-only stand-in (unit counts derived from the
payload), keeping schema/partitioning/batch plumbing real and tested,
while a production deployment passes a real decoder callable that runs
inside executors (subprocess ffmpeg etc. is fine there, exactly like the
reference shells out).
"""

from __future__ import annotations

import math
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEMUX_SCHEMA = (
    "id long, uri string, modality string, unit_index int, "
    "unit_uri string, payload binary"
)


def _fake_duration_seconds(uri: str, payload: bytes | None) -> float:
    """Deterministic stand-in for ffprobe duration: derived from payload
    size (1 KiB ~ 1 s) or uri hash. Replaced by a real prober in prod."""
    if payload is not None:
        return max(1.0, len(payload) / 1024.0)
    return float(sum(uri.encode()) % 60 + 1)


def video_demux(
    df: DataFrame,
    interval: float = 2.0,
    id_col: str = "id",
    uri_col: str = "uri",
    payload_col: str | None = "payload",
    decoder: Callable | None = None,
) -> DataFrame:
    """One row per sampled frame (modality='image') AND one per audio clip
    (modality='audio') every `interval` seconds — the reference's dual
    fan-out (video_demux/default.py:36-57), as a single mapInPandas.

    The interval default 2.0 matches video_demux/_base.py:10-14.
    """
    import pandas as pd

    cols = [id_col, uri_col] + ([payload_col] if payload_col else [])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "id", "uri", "modality", "unit_index", "unit_uri", "payload"
            )}
            for row in pdf.itertuples(index=False):
                rid = getattr(row, id_col)
                uri = getattr(row, uri_col)
                payload = getattr(row, payload_col) if payload_col else None
                if decoder is not None:
                    units = decoder(uri, payload, interval)
                else:
                    dur = _fake_duration_seconds(uri, payload)
                    n = max(1, int(math.floor(dur / interval)))
                    units = [
                        (m, i, f"{uri}#{m}_{i}", None)
                        for m in ("image", "audio")
                        for i in range(n)
                    ]
                for modality, idx, unit_uri, unit_payload in units:
                    out["id"].append(rid)
                    out["uri"].append(uri)
                    out["modality"].append(modality)
                    out["unit_index"].append(idx)
                    out["unit_uri"].append(unit_uri)
                    out["payload"].append(unit_payload)
            yield pd.DataFrame(out)

    return df.select(*cols).mapInPandas(gen, DEMUX_SCHEMA)


def _parse_frame_rate(s: str) -> float:
    """ffprobe r_frame_rate is a fraction like '30000/1001' (parsed
    safely — the reference eval()s it, video_demux/ffmpeg.py:40)."""
    if "/" in s:
        num, den = s.split("/", 1)
        return float(num) / float(den)
    return float(s)


def ffmpeg_demux_decoder(
    output_dir: str | None = None,
    read_payloads: bool = False,
    runner: Callable | None = None,
):
    """Factory: a `decoder` for video_demux that shells out to ffmpeg
    INSIDE executors (≡ video_demux/ffmpeg.py:9-61 — the reference's
    only codec-library-free decode path, and likewise ours: it needs the
    ffmpeg/ffprobe binaries, nothing in Python).

    Per video: one ffprobe for frame rate + packet count, then one frame
    PNG and one `interval`-second audio WAV per interval, emitted as
    ('image'|'audio', idx, path, payload?) units. `runner` injects a
    subprocess.run replacement for codec-free tests; when None, the real
    binaries are required and a missing ffmpeg raises FileNotFoundError
    (same contract as the reference, which tells users to fall back to
    the default demux).
    """

    def decode(uri: str, payload, interval: float):
        import hashlib
        import os
        import shutil
        import subprocess
        import tempfile

        if interval <= 0:
            raise ValueError(f"interval must be positive, got {interval}")
        run = runner or subprocess.run
        if runner is None and not (
            shutil.which("ffmpeg") and shutil.which("ffprobe")
        ):
            raise FileNotFoundError(
                "ffmpeg/ffprobe not found; use the default deterministic "
                "demux (decoder=None)"
            )
        # namespace outputs per video so a shared output_dir across rows
        # and concurrent executor tasks can never cross-contaminate
        base = output_dir or tempfile.mkdtemp(prefix="radient_demux_")
        out_dir = os.path.join(base, hashlib.md5(uri.encode()).hexdigest()[:16])
        os.makedirs(out_dir, exist_ok=True)
        info = run(
            ["ffprobe", "-v", "error", "-select_streams", "v:0",
             "-count_packets", "-show_entries",
             "stream=r_frame_rate,nb_read_packets", "-of",
             "default=noprint_wrappers=1:nokey=1", uri],
            capture_output=True, text=True,
        ).stdout.split()
        if len(info) < 2:
            raise ValueError(f"ffprobe gave no video stream info for {uri!r}")
        rate = _parse_frame_rate(info[0])
        frame_count = int(info[1])
        if rate <= 0:
            raise ValueError(f"ffprobe reported frame rate {info[0]!r} for {uri!r}")
        step = rate * interval
        units = []
        i, n = 0, 0.0
        while n < frame_count:
            start = n / rate
            frame_path = os.path.join(out_dir, f"frame_{i:04d}.png")
            r1 = run(
                ["ffmpeg", "-v", "error", "-y", "-ss", str(start), "-i", uri,
                 "-vframes", "1", frame_path],
                capture_output=True,
            )
            audio_path = os.path.join(out_dir, f"audio_{i:04d}.wav")
            r2 = run(
                ["ffmpeg", "-v", "error", "-y", "-ss", str(start), "-i", uri,
                 "-t", str(interval), "-q:a", "0", "-map", "a", audio_path],
                capture_output=True,
            )
            for r, path in ((r1, frame_path), (r2, audio_path)):
                if getattr(r, "returncode", 0) not in (0, None) and not os.path.exists(path):
                    raise RuntimeError(
                        f"ffmpeg failed extracting {path} from {uri!r}: "
                        f"{getattr(r, 'stderr', b'')[:200]}"
                    )
            for modality, path in (("image", frame_path), ("audio", audio_path)):
                unit_payload = None
                if read_payloads and os.path.exists(path):
                    with open(path, "rb") as f:
                        unit_payload = f.read()
                units.append((modality, i, path, unit_payload))
            i += 1
            n += step
        return units

    return decode


def cv2_demux_decoder(
    output_dir: str | None = None,
    read_payloads: bool = False,
    cv2_mod=None,
    librosa_mod=None,
    sf_mod=None,
):
    """Factory: a `decoder` for video_demux backed by OpenCV + librosa +
    soundfile — the reference's DEFAULT decode path
    (/root/reference/radient/tasks/transforms/video_demux/default.py:18-61),
    completing the §2.2 mapping next to the ffmpeg-subprocess decoder.

    Contract reproduced: one PNG frame at every `fps * interval` frame
    position (starting at frame 0) and one `interval`-second WAV clip at
    every `sample_rate * interval` sample offset, preserving the source
    sample rate and channel count. The reference's mono path references
    an undefined variable (`y = np.expand_dims(y, ...)`,
    default.py:52-53 — it would NameError on any mono file); here mono
    waveforms are correctly lifted to (1, n) before slicing.

    `cv2_mod`/`librosa_mod`/`sf_mod` inject stand-ins for codec-free
    tests (the injected-runner pattern ffmpeg_demux_decoder uses); when
    None the real libraries are required and a missing one raises
    ImportError, steering users to decoder=None."""

    def decode(uri: str, payload, interval: float):
        import hashlib
        import importlib
        import importlib.util
        import os
        import tempfile

        import numpy as np

        if interval <= 0:
            raise ValueError(f"interval must be positive, got {interval}")
        mods = {}
        for name, inj in (
            ("cv2", cv2_mod), ("librosa", librosa_mod), ("soundfile", sf_mod)
        ):
            if inj is not None:
                mods[name] = inj
            elif importlib.util.find_spec(name) is None:
                raise ImportError(
                    f"{name} not installed; use the ffmpeg decoder "
                    "(ffmpeg_demux_decoder) or the deterministic stand-in "
                    "(decoder=None)"
                )
            else:  # pragma: no cover - codec libs absent in CI container
                mods[name] = importlib.import_module(name)
        cv2, librosa, sf = mods["cv2"], mods["librosa"], mods["soundfile"]

        base = output_dir or tempfile.mkdtemp(prefix="radient_demux_")
        out_dir = os.path.join(base, hashlib.md5(uri.encode()).hexdigest()[:16])
        os.makedirs(out_dir, exist_ok=True)
        units = []

        cap = cv2.VideoCapture(uri)
        try:
            frame_count = cap.get(cv2.CAP_PROP_FRAME_COUNT)
            fps = cap.get(cv2.CAP_PROP_FPS)
            if fps <= 0:
                raise ValueError(f"OpenCV reported fps {fps!r} for {uri!r}")
            step = fps * interval
            for i, n in enumerate(np.arange(0, frame_count, step)):
                cap.set(cv2.CAP_PROP_POS_FRAMES, int(n))
                retval, frame = cap.read()
                if not retval:
                    break
                frame_path = os.path.join(out_dir, f"frame_{i:04d}.png")
                cv2.imwrite(frame_path, frame)
                units.append(("image", i, frame_path, None))
        finally:
            cap.release()

        waveform, sample_rate = librosa.load(uri, sr=None, mono=False)
        waveform = np.asarray(waveform)
        if waveform.ndim == 1:
            waveform = np.expand_dims(waveform, axis=0)
        sample_interval = int(sample_rate * interval)
        for i, n in enumerate(range(0, waveform.shape[1], sample_interval)):
            audio_path = os.path.join(out_dir, f"audio_{i:04d}.wav")
            sf.write(audio_path, waveform[:, n:n + sample_interval].T, sample_rate)
            units.append(("audio", i, audio_path, None))

        if read_payloads:
            units = [
                (m, i, p, open(p, "rb").read() if os.path.exists(p) else None)
                for (m, i, p, _) in units
            ]
        return units

    return decode


def whisper_transcriber(model_id: str = "openai/whisper-large-v3"):
    """Factory: a `transcriber` for speech_to_text backed by the HF
    Whisper ASR pipeline (≡ speech_to_text/whisper.py:16-45). The
    pipeline loads ONCE per executor Python worker (closure state) —
    the per-worker-singleton pattern the model vectorizers share.
    Gated: raises ImportError without transformers/torch."""
    state: dict = {}

    def transcribe(uri: str, payload) -> str:  # pragma: no cover - gated
        import importlib.util

        for mod in ("transformers", "torch"):
            if importlib.util.find_spec(mod) is None:
                raise ImportError(
                    f"{mod} not installed; use the deterministic stand-in "
                    "(transcriber=None)"
                )
        if "pipe" not in state:
            from transformers import pipeline

            state["pipe"] = pipeline(
                "automatic-speech-recognition", model=model_id, device="cpu"
            )
        return state["pipe"](uri)["text"]

    return transcribe


def pymupdf_screenshot_decoder(read_payloads: bool = True):
    """Factory: a `decoder` for document_screenshot backed by PyMuPDF
    (≡ document_screenshot/pymupdf.py:16-47): one PNG per page at the
    given zoom; accepts a path or the in-plan binary payload. Gated:
    raises ImportError without pymupdf."""

    def decode(uri: str, payload, zoom: float):  # pragma: no cover - gated
        import importlib.util

        if importlib.util.find_spec("pymupdf") is None and (
            importlib.util.find_spec("fitz") is None
        ):
            raise ImportError(
                "pymupdf not installed; use the deterministic stand-in "
                "(decoder=None)"
            )
        try:
            import pymupdf
        except ImportError:  # older distributions expose `fitz`
            import fitz as pymupdf

        if payload is not None:
            import io

            pdf = pymupdf.open(stream=io.BytesIO(bytes(payload)), filetype="pdf")
        else:
            pdf = pymupdf.open(uri, filetype="pdf")
        mat = pymupdf.Matrix(zoom, zoom)
        pages = []
        for n in range(pdf.page_count):
            pix = pdf[n].get_pixmap(matrix=mat)
            png = pix.tobytes("png") if read_payloads else None
            pages.append((n, f"{uri}#page_{n}", png))
        return pages

    return decode


def document_screenshot(
    df: DataFrame,
    zoom: float = 1.0,
    id_col: str = "id",
    uri_col: str = "uri",
    payload_col: str | None = "payload",
    decoder: Callable | None = None,
) -> DataFrame:
    """One row per PDF page (pymupdf.py:16-47). zoom default 1.0 matches
    document_screenshot/_base.py."""
    import pandas as pd

    cols = [id_col, uri_col] + ([payload_col] if payload_col else [])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            out = {k: [] for k in (
                "id", "uri", "modality", "unit_index", "unit_uri", "payload"
            )}
            for row in pdf_batch.itertuples(index=False):
                rid = getattr(row, id_col)
                uri = getattr(row, uri_col)
                payload = getattr(row, payload_col) if payload_col else None
                if decoder is not None:
                    pages = decoder(uri, payload, zoom)
                else:
                    n = max(1, int(_fake_duration_seconds(uri, payload) // 4) + 1)
                    pages = [(i, f"{uri}#page_{i}", None) for i in range(n)]
                for idx, unit_uri, unit_payload in pages:
                    out["id"].append(rid)
                    out["uri"].append(uri)
                    out["modality"].append("image")
                    out["unit_index"].append(idx)
                    out["unit_uri"].append(unit_uri)
                    out["payload"].append(unit_payload)
            yield pd.DataFrame(out)

    return df.select(*cols).mapInPandas(gen, DEMUX_SCHEMA)


def speech_to_text(
    df: DataFrame,
    id_col: str = "id",
    uri_col: str = "uri",
    payload_col: str | None = "payload",
    transcriber: Callable | None = None,
) -> DataFrame:
    """Audio -> transcript rows (whisper.py:16-45): modality becomes
    'text'. A real deployment passes `transcriber` (loaded once per
    executor inside the generator — the per-worker model-singleton
    pattern); the stand-in emits a deterministic pseudo-transcript."""
    import pandas as pd

    cols = [id_col, uri_col] + ([payload_col] if payload_col else [])
    schema = "id long, uri string, modality string, text string"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = transcriber  # loaded once per worker if callable factory
        for pdf in batches:
            out = {"id": [], "uri": [], "modality": [], "text": []}
            for row in pdf.itertuples(index=False):
                rid = getattr(row, id_col)
                uri = getattr(row, uri_col)
                payload = getattr(row, payload_col) if payload_col else None
                if model is not None:
                    text = model(uri, payload)
                else:
                    text = f"transcript of {uri.rsplit('/', 1)[-1]}"
                out["id"].append(rid)
                out["uri"].append(uri)
                out["modality"].append("text")
                out["text"].append(text)
            yield pd.DataFrame(out)

    return df.select(*cols).mapInPandas(gen, schema)
