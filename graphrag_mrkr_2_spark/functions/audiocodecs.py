"""Pure-stdlib audio codec: RIFF/WAVE PCM (r4 — the imagecodecs playbook
applied to the audio-sample seam).

WAV is the one mainstream audio container decodable with nothing but
``struct`` + byte arithmetic (the public RIFF spec): chunk walk (fmt /
data, unknown chunks skipped by size, odd-size padding honored), PCM
format code 1 at 8-bit unsigned or 16-bit signed little-endian, any
channel count / sample rate. An encoder is included so every decode path
has an exact encode→decode round-trip oracle.

Compressed audio (MP3/AAC/Opus/FLAC) stays the codec seam — exactly like
JPEG for images — raising in strict mode, deterministic-fake otherwise.

Samples are numpy arrays shaped (n_frames, n_channels): int16 for 16-bit,
uint8 for 8-bit. Spark-facing plumbing lives in operators/multimodal.py.
"""

from __future__ import annotations

import struct

import numpy as np


def _ulaw_table() -> np.ndarray:
    """G.711 μ-law byte → int16 (the CCITT reference expansion)."""
    out = np.zeros(256, dtype=np.int16)
    for b in range(256):
        u = ~b & 0xFF
        t = ((u & 0x0F) << 3) + 0x84
        t <<= (u & 0x70) >> 4
        out[b] = (0x84 - t) if (u & 0x80) else (t - 0x84)
    return out


def _alaw_table() -> np.ndarray:
    """G.711 A-law byte → int16."""
    out = np.zeros(256, dtype=np.int16)
    for b in range(256):
        a = b ^ 0x55
        t = (a & 0x0F) << 4
        seg = (a & 0x70) >> 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        out[b] = t if (a & 0x80) else -t
    return out


_ULAW = _ulaw_table()
_ALAW = _alaw_table()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM / G.711 μ-law / A-law WAV payload →
    (samples (n, channels), sample_rate). Companded formats (codes 6/7)
    expand to int16 through the CCITT tables."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            raw = body
            if fmt is not None:
                break
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _byte_rate, _block_align, bits = fmt
    if n_channels == 0:
        raise ValueError("WAV declares zero channels")
    if audio_format in (6, 7):  # A-law / μ-law (8-bit companded)
        if bits != 8:
            raise ValueError(f"G.711 WAV with bit depth {bits} (must be 8)")
        table = _ALAW if audio_format == 6 else _ULAW
        idx = np.frombuffer(
            raw[: len(raw) - (len(raw) % n_channels)], dtype=np.uint8
        )
        return table[idx].reshape(-1, n_channels), sample_rate
    if audio_format != 1:
        raise ValueError(
            f"unsupported WAV format code {audio_format} (PCM/A-law/mu-law only)"
        )
    if bits == 16:
        samples = np.frombuffer(raw[: len(raw) - (len(raw) % (2 * n_channels))], dtype="<i2")
    elif bits == 8:
        samples = np.frombuffer(raw[: len(raw) - (len(raw) % n_channels)], dtype=np.uint8)
    else:
        raise ValueError(f"unsupported WAV bit depth {bits} (8/16 only)")
    return samples.reshape(-1, n_channels), sample_rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode (n, channels) int16 or uint8 samples to a PCM WAV."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    if s.dtype == np.int16:
        bits = 16
        raw = s.astype("<i2").tobytes()
    elif s.dtype == np.uint8:
        bits = 8
        raw = s.tobytes()
    else:
        raise ValueError("encode_wav expects int16 or uint8 samples")
    n_channels = s.shape[1]
    block_align = n_channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, sample_rate * block_align, block_align, bits
    )
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(raw)) + raw
    if len(raw) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def sniff_audio(data: bytes) -> str | None:
    """Return 'wav' | None from magic bytes (compressed formats are the
    codec seam, reported as None)."""
    if data and len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return None
