"""Pure-stdlib baseline TIFF codec (r4 — closes the last container format
of the reference's image loader list: jpg/jpeg/png/bmp/tiff,
ingestion/loaders/image_loader.py).

TIFF 6.0 baseline per the public spec: header (II/MM byte order), IFD
walk, the baseline tags (ImageWidth/ImageLength/BitsPerSample/Compression/
PhotometricInterpretation/StripOffsets/SamplesPerPixel/RowsPerStrip/
StripByteCounts), 8-bit samples, grayscale (incl. WhiteIsZero inversion)
and RGB(A), strip assembly, Compression 1 (none) and 32773 (PackBits).
LZW/JPEG-in-TIFF compression raises cleanly — that sliver plus OCR is all
that remains of the raster seam.

An encoder (uncompressed, single strip, little-endian) is included for the
exact encode→decode round-trip oracle. Pixels are (h, w, c) uint8.
"""

from __future__ import annotations

import struct

import numpy as np


def _unpackbits(data: bytes, expected: int) -> bytes:
    """PackBits (TIFF 6.0 §9): n >= 0 → copy n+1 literal; -127 <= n <= -1 →
    repeat next byte 1-n times; -128 → no-op."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = struct.unpack("b", data[i : i + 1])[0]
        i += 1
        if n >= 0:
            out += data[i : i + n + 1]
            i += n + 1
        elif n != -128:
            out += data[i : i + 1] * (1 - n)
            i += 1
    return bytes(out[:expected])


def decode_tiff(data: bytes) -> np.ndarray:
    """Decode a baseline 8-bit TIFF (first IFD) to (h, w, c) uint8."""
    if data[:2] == b"II":
        e = "<"
    elif data[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order mark")
    (magic,) = struct.unpack(e + "H", data[2:4])
    if magic != 42:
        raise ValueError("not a TIFF: bad magic")
    (ifd_off,) = struct.unpack(e + "I", data[4:8])
    (n_entries,) = struct.unpack(e + "H", data[ifd_off : ifd_off + 2])

    _SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}

    def read_values(ftype: int, count: int, raw: bytes) -> list[int]:
        size = _SIZES.get(ftype, 1)
        total = size * count
        if total > 4:
            (off,) = struct.unpack(e + "I", raw)
            body = data[off : off + total]
        else:
            body = raw[:total]
        fmt = {1: "B", 3: "H", 4: "I"}.get(ftype)
        if fmt is None:
            return []
        return list(struct.unpack(e + fmt * count, body))

    tags: dict[int, list[int]] = {}
    for k in range(n_entries):
        entry = data[ifd_off + 2 + 12 * k : ifd_off + 14 + 12 * k]
        tag, ftype, count = struct.unpack(e + "HHI", entry[:8])
        tags[tag] = read_values(ftype, count, entry[8:12])

    def one(tag: int, default: int | None = None) -> int:
        v = tags.get(tag)
        if not v:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    w = one(256)
    h = one(257)
    compression = one(259, 1)
    photometric = one(262, 1)
    spp = one(277, 1)
    bits = tags.get(258, [8] * spp)
    rows_per_strip = one(278, h)
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts:
        raise ValueError("TIFF missing strip offsets/byte counts")
    if any(b != 8 for b in bits):
        raise ValueError(f"unsupported TIFF bit depths {bits} (8-bit only)")
    if compression not in (1, 32773):
        raise ValueError(
            f"unsupported TIFF compression {compression} (none/PackBits only)"
        )
    if photometric not in (0, 1, 2):
        raise ValueError(f"unsupported TIFF photometric {photometric}")

    row_bytes = w * spp
    raw = bytearray()
    remaining_rows = h
    for off, cnt in zip(offsets, counts):
        strip_rows = min(rows_per_strip, remaining_rows)
        body = data[off : off + cnt]
        if compression == 32773:
            body = _unpackbits(body, strip_rows * row_bytes)
        raw += body[: strip_rows * row_bytes]
        remaining_rows -= strip_rows
    if len(raw) < h * row_bytes:
        raise ValueError("TIFF strip data too short")
    px = np.frombuffer(bytes(raw[: h * row_bytes]), dtype=np.uint8).reshape(h, w, spp)
    if photometric == 0:  # WhiteIsZero
        px = 255 - px
    return px


def encode_tiff(pixels: np.ndarray) -> bytes:
    """Encode (h, w, c∈{1,3,4}) uint8 to an uncompressed little-endian
    single-strip TIFF."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, spp = px.shape
    if spp not in (1, 3, 4):
        raise ValueError("encode_tiff expects 1, 3 or 4 channels")
    body = px.tobytes()
    photometric = 1 if spp == 1 else 2

    entries = []

    def entry(tag, ftype, count, value_bytes):
        entries.append((tag, ftype, count, value_bytes))

    # layout: header(8) + pixel data + bits table + IFD
    data_off = 8
    bits_off = data_off + len(body)
    ifd_off = bits_off + 2 * spp

    def short(v):
        return struct.pack("<HH", v, 0)

    def long_(v):
        return struct.pack("<I", v)

    entry(256, 4, 1, long_(w))
    entry(257, 4, 1, long_(h))
    if spp == 1:
        entry(258, 3, 1, short(8))
    else:
        entry(258, 3, spp, long_(bits_off))
    entry(259, 3, 1, short(1))
    entry(262, 3, 1, short(photometric))
    entry(273, 4, 1, long_(data_off))
    entry(277, 3, 1, short(spp))
    entry(278, 4, 1, long_(h))
    entry(279, 4, 1, long_(len(body)))

    out = bytearray(b"II" + struct.pack("<HI", 42, ifd_off))
    out += body
    out += struct.pack("<" + "H" * spp, *([8] * spp))
    out += struct.pack("<H", len(entries))
    for tag, ftype, count, vb in sorted(entries):
        out += struct.pack("<HHI", tag, ftype, count) + vb
    out += struct.pack("<I", 0)  # no next IFD
    return bytes(out)
