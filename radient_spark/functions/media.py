"""Pure-numpy media preprocessing kernels — the deterministic, model-free
half of the ImageBind-equivalent pipeline (SURVEY.md §2.3).

Reference behavior re-expressed (no torch/torchaudio/librosa in this
container, so the kernels are numpy implementations of the same public
algorithms):

- audio clips -> log-mel spectrograms: vectorizers/audio/imagebind.py:20-52
  (CLIP_DURATION=2 s, NUM_MEL_BINS=128, TARGET_LENGTH=204 frames,
  Normalize(mean=-4.268, std=9.138)); the mel computation follows the
  Kaldi fbank recipe ImageBind's waveform2melspec delegates to
  (torchaudio.compliance.kaldi.fbank: 25 ms frames / 10 ms shift,
  per-frame DC removal, 0.97 preemphasis, hanning window, power
  spectrum, HTK mel scale, log energies) — same algorithm, not a
  bit-for-bit torchaudio clone.
- audio resample to the model rate: vectorizers/audio/_base.py:24-39
  (librosa.resample there; windowed-sinc polyphase here).
- image -> 224x224 CLIP tensor: vectorizers/image/imagebind.py:35-43
  (bicubic resize of the short side to 224, center crop, scale to [0,1],
  Normalize(mean=(0.48145466, 0.4578275, 0.40821073),
            std=(0.26862954, 0.26130258, 0.27577711))).
- image input sniffing: vectorizers/image/_base.py:33-64 (ndarray / path
  / URL / base64 string -> a decodable payload).

Everything here is batch-shaped numpy so the Spark operators
(operators/preprocess.py) can call it inside mapInPandas over Arrow
batches.
"""

from __future__ import annotations

import base64
import binascii
import os

import numpy as np

# --- ImageBind audio constants (audio/imagebind.py:20-22, 36) ---
CLIP_DURATION = 2
NUM_MEL_BINS = 128
TARGET_LENGTH = 204
AUDIO_SAMPLE_RATE = 16_000
AUDIO_NORM_MEAN = -4.268
AUDIO_NORM_STD = 9.138

# --- CLIP / ImageBind image constants (image/imagebind.py:35-43) ---
IMAGE_SIZE = 224
IMAGE_NORM_MEAN = (0.48145466, 0.4578275, 0.40821073)
IMAGE_NORM_STD = (0.26862954, 0.26130258, 0.27577711)


# ---------------------------------------------------------------- audio
def resample_waveform(
    wave: np.ndarray, orig_sr: int, target_sr: int, taps: int = 32
) -> np.ndarray:
    """Resample (channels, n) float waveform with a Kaiser-windowed-sinc
    interpolator (the numpy stand-in for librosa.resample,
    audio/_base.py:31-37). Identity when rates match."""
    wave = np.atleast_2d(np.asarray(wave, dtype=np.float64))
    if orig_sr == target_sr:
        return wave
    if orig_sr <= 0 or target_sr <= 0:
        raise ValueError(f"invalid rates {orig_sr} -> {target_sr}")
    n_in = wave.shape[1]
    n_out = int(round(n_in * target_sr / orig_sr))
    # output sample m sits at input position m * orig/target
    pos = np.arange(n_out) * (orig_sr / target_sr)
    left = np.floor(pos).astype(np.int64)
    # window of `taps` input samples around each output position
    offs = np.arange(-taps // 2 + 1, taps // 2 + 1)
    idx = left[:, None] + offs[None, :]
    frac = pos[:, None] - idx
    # anti-aliasing cutoff when downsampling
    cutoff = min(1.0, target_sr / orig_sr)
    kern = cutoff * np.sinc(cutoff * frac) * _kaiser_window(frac, taps)
    kern /= np.maximum(kern.sum(axis=1, keepdims=True), 1e-12)
    idx = np.clip(idx, 0, n_in - 1)
    return np.einsum("cmk,mk->cm", wave[:, idx], kern)


def _kaiser_window(frac: np.ndarray, taps: int) -> np.ndarray:
    """Kaiser(beta=8) window evaluated at fractional tap offsets."""
    x = frac / (taps / 2.0)
    x = np.clip(x, -1.0, 1.0)
    beta = 8.0
    return np.i0(beta * np.sqrt(1.0 - x * x)) / np.i0(beta)


def split_clips(
    wave: np.ndarray, sample_rate: int = AUDIO_SAMPLE_RATE,
    clip_duration: int = CLIP_DURATION,
) -> list[np.ndarray]:
    """Split (channels, n) into consecutive clips of `clip_duration`
    seconds; the trailing partial clip is kept (the reference's arange
    loop slices past the end, audio/imagebind.py:41-49)."""
    wave = np.atleast_2d(np.asarray(wave, dtype=np.float64))
    samples_per_clip = sample_rate * clip_duration
    return [
        wave[:, n : n + samples_per_clip]
        for n in range(0, wave.shape[1], samples_per_clip)
    ]


def _mel_from_hz(hz):
    return 2595.0 * np.log10(1.0 + np.asarray(hz, dtype=np.float64) / 700.0)


def _hz_from_mel(mel):
    return 700.0 * (10.0 ** (np.asarray(mel, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(
    num_bins: int, n_fft: int, sample_rate: int,
    low_hz: float = 20.0, high_hz: float | None = None,
) -> np.ndarray:
    """Triangular HTK-mel filterbank, (num_bins, n_fft//2+1)."""
    high_hz = high_hz or sample_rate / 2.0
    mels = np.linspace(_mel_from_hz(low_hz), _mel_from_hz(high_hz), num_bins + 2)
    hz = _hz_from_mel(mels)
    freqs = np.arange(n_fft // 2 + 1) * (sample_rate / n_fft)
    fb = np.zeros((num_bins, len(freqs)))
    for b in range(num_bins):
        lo, ctr, hi = hz[b], hz[b + 1], hz[b + 2]
        up = (freqs - lo) / max(ctr - lo, 1e-9)
        down = (hi - freqs) / max(hi - ctr, 1e-9)
        fb[b] = np.maximum(0.0, np.minimum(up, down))
    return fb


def log_mel_spectrogram(
    wave: np.ndarray,
    sample_rate: int = AUDIO_SAMPLE_RATE,
    num_mel_bins: int = NUM_MEL_BINS,
    frame_ms: float = 25.0,
    shift_ms: float = 10.0,
    preemphasis: float = 0.97,
) -> np.ndarray:
    """Kaldi-fbank-style log-mel of a mono waveform -> (num_mel_bins,
    n_frames). Snip-edges framing, per-frame DC removal, preemphasis,
    hanning window, power spectrum, HTK mel triangle bank, log."""
    x = np.asarray(wave, dtype=np.float64).reshape(-1)
    flen = int(sample_rate * frame_ms / 1000.0)
    shift = int(sample_rate * shift_ms / 1000.0)
    if len(x) < flen:
        return np.zeros((num_mel_bins, 0))
    n_frames = 1 + (len(x) - flen) // shift
    idx = np.arange(flen)[None, :] + shift * np.arange(n_frames)[:, None]
    fr = x[idx]
    fr = fr - fr.mean(axis=1, keepdims=True)  # remove_dc_offset
    fr = fr - preemphasis * np.concatenate([fr[:, :1], fr[:, :-1]], axis=1)
    fr = fr * np.hanning(flen)[None, :]
    n_fft = 1 << (flen - 1).bit_length()
    power = np.abs(np.fft.rfft(fr, n=n_fft, axis=1)) ** 2
    fb = mel_filterbank(num_mel_bins, n_fft, sample_rate)
    mel = power @ fb.T
    return np.log(np.maximum(mel, 1e-10)).T  # (mel, frames)


def clip_to_melspec(
    clip: np.ndarray,
    sample_rate: int = AUDIO_SAMPLE_RATE,
    num_mel_bins: int = NUM_MEL_BINS,
    target_length: int = TARGET_LENGTH,
    normalize: bool = True,
) -> np.ndarray:
    """One audio clip -> (num_mel_bins, target_length) normalized log-mel
    image, reproducing waveform2melspec's pad-or-trim to TARGET_LENGTH
    and the ImageBind Normalize(mean=-4.268, std=9.138)."""
    clip = np.atleast_2d(np.asarray(clip, dtype=np.float64))
    mono = clip.mean(axis=0)
    mono = mono - mono.mean()  # waveform2melspec mean-centers first
    mel = log_mel_spectrogram(mono, sample_rate, num_mel_bins)
    n = mel.shape[1]
    if n < target_length:
        mel = np.pad(mel, ((0, 0), (0, target_length - n)))
    elif n > target_length:
        mel = mel[:, :target_length]
    if normalize:
        mel = (mel - AUDIO_NORM_MEAN) / AUDIO_NORM_STD
    return mel.astype(np.float32)


def waveform_to_melspec_clips(
    wave: np.ndarray,
    orig_sr: int,
    sample_rate: int = AUDIO_SAMPLE_RATE,
    clip_duration: int = CLIP_DURATION,
    num_mel_bins: int = NUM_MEL_BINS,
    target_length: int = TARGET_LENGTH,
) -> list[np.ndarray]:
    """Full audio path: resample -> 2 s clips -> normalized log-mels,
    i.e. ImageBindAudioVectorizer._preprocess without the model."""
    wave = resample_waveform(wave, orig_sr, sample_rate)
    return [
        clip_to_melspec(c, sample_rate, num_mel_bins, target_length)
        for c in split_clips(wave, sample_rate, clip_duration)
    ]


# ---------------------------------------------------------------- image
def _cubic_kernel(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    """Keys cubic convolution kernel (a=-0.5, the PIL/torchvision
    BICUBIC kernel family)."""
    x = np.abs(x)
    x2, x3 = x * x, x * x * x
    return np.where(
        x <= 1,
        (a + 2) * x3 - (a + 3) * x2 + 1,
        np.where(x < 2, a * x3 - 5 * a * x2 + 8 * a * x - 4 * a, 0.0),
    )


def _resize_axis(img: np.ndarray, out_len: int, axis: int) -> np.ndarray:
    """Separable bicubic resize along one axis with edge clamp."""
    in_len = img.shape[axis]
    if in_len == out_len:
        return img
    scale = in_len / out_len
    # pixel-center alignment (the torchvision/PIL convention)
    pos = (np.arange(out_len) + 0.5) * scale - 0.5
    left = np.floor(pos).astype(np.int64)
    offs = np.arange(-1, 3)
    idx = left[:, None] + offs[None, :]
    w = _cubic_kernel(pos[:, None] - idx)
    w /= np.maximum(w.sum(axis=1, keepdims=True), 1e-12)
    idx = np.clip(idx, 0, in_len - 1)
    moved = np.moveaxis(img, axis, 0)
    out = np.einsum("ok,ok...->o...", w, moved[idx])
    return np.moveaxis(out, 0, axis)


def resize_bicubic(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """(H, W, C) float -> (out_h, out_w, C) bicubic."""
    img = np.asarray(img, dtype=np.float64)
    return _resize_axis(_resize_axis(img, out_h, 0), out_w, 1)


def center_crop(img: np.ndarray, size: int) -> np.ndarray:
    h, w = img.shape[:2]
    top = max(0, (h - size) // 2)
    left = max(0, (w - size) // 2)
    return img[top : top + size, left : left + size]


def image_to_clip_tensor(img: np.ndarray, size: int = IMAGE_SIZE) -> np.ndarray:
    """(H, W, 3) uint8/float RGB -> (3, size, size) float32 CLIP tensor:
    bicubic resize of the SHORT side to `size`, center crop, scale to
    [0,1], per-channel Normalize — transforms.Compose of
    image/imagebind.py:35-43."""
    raw = np.asarray(img)
    # integer dtype => 0-255 range by definition; a float input is
    # assumed already in [0,1] unless its values clearly exceed it
    # (a max()-only heuristic misreads near-black uint8 images)
    is_byte_range = np.issubdtype(raw.dtype, np.integer)
    img = raw.astype(np.float64)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    if img.shape[-1] != 3:
        raise ValueError(f"expected RGB last dim, got shape {img.shape}")
    h, w = img.shape[:2]
    if h <= w:
        out_h, out_w = size, max(size, int(round(w * size / h)))
    else:
        out_h, out_w = max(size, int(round(h * size / w))), size
    img = center_crop(resize_bicubic(img, out_h, out_w), size)
    if is_byte_range or img.max() > 1.5:
        img = img / 255.0
    img = (img - np.array(IMAGE_NORM_MEAN)) / np.array(IMAGE_NORM_STD)
    return np.transpose(img, (2, 0, 1)).astype(np.float32)


_IMAGE_EXTS = {".jpg", ".jpeg", ".png", ".gif", ".bmp", ".webp", ".tif", ".tiff"}


def sniff_image_source(value) -> tuple[str, object]:
    """Classify an image input the way the reference's _preprocess does
    (image/_base.py:33-64): returns (kind, payload) with kind one of
    'array' (ndarray passthrough), 'bytes' (raw encoded bytes), 'path'
    (existing file read to bytes), 'url' (left to a gated fetcher), or
    'base64' (decoded to bytes). Raises TypeError otherwise."""
    if isinstance(value, np.ndarray):
        return "array", value
    if isinstance(value, (bytes, bytearray)):
        return "bytes", bytes(value)
    if isinstance(value, str):
        if value.startswith(("http://", "https://")):
            return "url", value  # any http(s) source, extension or not
        ext = os.path.splitext(value.split("?")[0])[1].lower()
        if ext in _IMAGE_EXTS and os.path.exists(value):
            with open(value, "rb") as f:
                return "path", f.read()
        try:
            decoded = base64.b64decode(value, validate=True)
            if decoded:
                return "base64", decoded
        except (binascii.Error, ValueError):
            pass
        raise TypeError(f"unrecognized image source {value[:60]!r}")
    raise TypeError(f"unsupported image input type {type(value).__name__}")
