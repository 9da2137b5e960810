"""Pure-Python WAV (RIFF/PCM) codec: the audio leg of the multimodal
surface.

Like PPM/BMP (operators/imagecodec.py), uncompressed WAV is a header
over raw samples — a genuine decode/encode needs numpy, not ffmpeg.
Supports PCM integer 16-bit (the interchange default) and 8-bit
unsigned, mono or interleaved stereo.

Analysis primitives are integer-exact (sum of squares, peak, sample
counts) so a SQL oracle can reproduce them bit-for-bit — the same
determinism contract every other operator in this engine follows;
float DSP (FFTs, resampling filters) would belong behind the same
Arrow boundary but cannot be oracle-checked exactly.
"""

from __future__ import annotations

import numpy as np

RIFF_MAGIC = b"RIFF"
WAVE_MAGIC = b"WAVE"


def sniff(data: bytes) -> bool:
    return data[:4] == RIFF_MAGIC and data[8:12] == WAVE_MAGIC


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """(n,) mono or (n, ch) interleaved int16 samples -> canonical
    44-byte-header PCM WAV bytes."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        channels = 1
    elif arr.ndim == 2:
        channels = arr.shape[1]
    else:
        raise ValueError("expected (n,) or (n, channels)")
    payload = arr.tobytes()
    block_align = channels * 2
    byte_rate = sample_rate * block_align
    hdr = (
        RIFF_MAGIC
        + (36 + len(payload)).to_bytes(4, "little")
        + WAVE_MAGIC
        + b"fmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")  # PCM
        + channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + block_align.to_bytes(2, "little")
        + (16).to_bytes(2, "little")  # bits per sample
        + b"data"
        + len(payload).to_bytes(4, "little")
    )
    return hdr + payload


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes -> ((n, channels) int16 array, sample_rate).

    Walks RIFF chunks (fmt may be padded / followed by LIST etc.),
    accepts PCM 16-bit signed and 8-bit unsigned (widened to int16 by
    centering, the standard WAV convention)."""
    if not sniff(data):
        raise ValueError("not a RIFF/WAVE stream")
    pos, fmt, payload = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            payload = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or payload is None:
        raise ValueError("missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits not in (8, 16) or channels < 1:
        raise ValueError(f"unsupported WAV: fmt={audio_format} bits={bits} ch={channels}")
    if bits == 16:
        arr = np.frombuffer(payload[: len(payload) // (2 * channels) * 2 * channels], "<i2")
    else:
        raw = np.frombuffer(payload[: len(payload) // channels * channels], "u1")
        arr = (raw.astype("i2") - 128) << 8
    return arr.reshape(-1, channels), sample_rate


def analyze(samples: np.ndarray, sample_rate: int) -> dict[str, int]:
    """Integer-exact per-clip stats: frame count, peak |sample|, sum of
    squared samples (bigint — the RMS numerator), duration in
    microseconds (exact integer division)."""
    s = samples.astype("int64")
    n_frames = int(s.shape[0])
    return {
        "n_frames": n_frames,
        "peak": int(np.abs(s).max()) if n_frames else 0,
        "energy": int((s * s).sum()),
        "duration_us": n_frames * 1_000_000 // sample_rate,
    }


def downsample(samples: np.ndarray, factor: int) -> np.ndarray:
    """Keep every ``factor``-th frame (deterministic decimation — no
    anti-alias filter, so output samples are exact input samples and
    oracle-reproducible)."""
    if factor < 1:
        raise ValueError("factor must be >= 1")
    return samples[::factor]
