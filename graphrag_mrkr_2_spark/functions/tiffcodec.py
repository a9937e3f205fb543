"""Pure-stdlib baseline TIFF codec (r4 — closes the last container format
of the reference's image loader list: jpg/jpeg/png/bmp/tiff,
ingestion/loaders/image_loader.py).

TIFF 6.0 baseline per the public spec: header (II/MM byte order), IFD
walk, the baseline tags (ImageWidth/ImageLength/BitsPerSample/Compression/
PhotometricInterpretation/StripOffsets/SamplesPerPixel/RowsPerStrip/
StripByteCounts), 8-bit samples, grayscale (incl. WhiteIsZero inversion)
and RGB(A), strip AND tile (§15, tags 322-325) assembly, Compression 1
(none), 5 (LZW per §13 with the spec's early-change variable widths),
7 (new-style JPEG-in-TIFF per TechNote 2, with JPEGTables tag-347
splicing, decoded by our own jpegcodec) and 32773 (PackBits), and
Predictor 2 (horizontal differencing, the standard LZW companion).

An encoder (single strip, little-endian, optional LZW + predictor) is
included for the exact encode→decode round-trip oracle. Pixels are
(h, w, c) uint8.
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


def _tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF 6.0 §13 LZW: MSB-first variable-width codes, 8-bit symbols,
    Clear=256, EOI=257, first entry 258, initial width 9, 12-bit cap, and
    the spec's EARLY CHANGE — widths grow one code sooner than GIF because
    the decoder runs one add behind the encoder (libtiff's MAXCODE-1)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: dict[int, bytes] = {i: bytes([i]) for i in range(256)}
    next_code = 258
    width = 9
    prev: bytes | None = None
    bitpos = 0
    total_bits = len(data) * 8
    while bitpos + width <= total_bits and len(out) < expected:
        byte_i = bitpos // 8
        chunk = data[byte_i : byte_i + 3].ljust(3, b"\x00")
        window = int.from_bytes(chunk, "big")
        shift = 24 - (bitpos % 8) - width
        code = (window >> shift) & ((1 << width) - 1)
        bitpos += width
        if code == CLEAR:
            table = {i: bytes([i]) for i in range(256)}
            next_code = 258
            width = 9
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            entry = table[code]
        else:
            if code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + prev[:1]
            else:
                raise ValueError(f"bad TIFF LZW code {code}")
            if next_code < 4096:
                table[next_code] = prev + entry[:1]
                next_code += 1
                # early change: the encoder is one add ahead — grow when
                # ITS next free entry (next_code + 1) crosses the width
                # (threshold (1<<w)-1, verified byte-exact against libtiff)
                if next_code + 1 > (1 << width) - 1 and width < 12:
                    width += 1
        out += entry
        prev = entry
    return bytes(out[:expected])


class _MsbBitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc = (self.acc << width) | code
        self.nbits += width
        while self.nbits >= 8:
            self.buf.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.buf.append((self.acc << (8 - self.nbits)) & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.buf)


def _tiff_lzw_encode(data: bytes) -> bytes:
    CLEAR, EOI = 256, 257
    bw = _MsbBitWriter()

    def reset():
        return {bytes([i]): i for i in range(256)}, 258, 9

    table, next_code, width = reset()
    bw.write(CLEAR, width)
    w = b""
    for b in data:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        bw.write(table[w], width)
        if next_code < 4094:  # leave room: table refills at 4094 per spec
            table[wk] = next_code
            next_code += 1
            # encoder-side early change (decoder checks next_code + 1: it
            # runs one add behind); threshold (1<<w)-1 per libtiff
            if next_code > (1 << width) - 1 and width < 12:
                width += 1
        else:
            bw.write(CLEAR, width)
            table, next_code, width = reset()
        w = bytes([b])
    if w:
        bw.write(table[w], width)
    bw.write(EOI, width)
    return bw.flush()


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
    raw_tags: dict[int, bytes] = {}  # BYTE/UNDEFINED payloads (JPEGTables)
    for k in range(n_entries):
        entry = data[ifd_off + 2 + 12 * k : ifd_off + 14 + 12 * k]
        tag, ftype, count = struct.unpack(e + "HHI", entry[:8])
        tags[tag] = read_values(ftype, count, entry[8:12])
        if tag == 347 and ftype in (1, 7):  # only JPEGTables is consumed
            if count > 4:
                (off,) = struct.unpack(e + "I", entry[8:12])
                raw_tags[tag] = data[off : off + count]
            else:
                raw_tags[tag] = entry[8 : 8 + count]

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
    # Unify strips and tiles (§15) into (offset, count, row0, col0, seg_h,
    # seg_w) segments: strips are full-width row bands; tiles form a grid
    # whose segments are always padded to the full tile size.
    if w < 1 or h < 1:
        raise ValueError(f"bad TIFF dimensions {w}x{h}")
    if 322 in tags or 324 in tags:
        tile_w = one(322)
        tile_h = one(323)
        if tile_w < 1 or tile_h < 1:
            raise ValueError(f"bad TIFF tile size {tile_w}x{tile_h}")
        offsets = tags.get(324)
        counts = tags.get(325)
        if not offsets or not counts:
            raise ValueError("TIFF missing tile offsets/byte counts")
        across = -(-w // tile_w)
        down = -(-h // tile_h)
        if len(offsets) < across * down or len(counts) < across * down:
            raise ValueError("TIFF tile data too short")
        segments = [
            (
                offsets[i],
                counts[i],
                (i // across) * tile_h,
                (i % across) * tile_w,
                tile_h,
                tile_w,
            )
            for i in range(across * down)
        ]
    else:
        offsets = tags.get(273)
        counts = tags.get(279)
        if not offsets or not counts:
            raise ValueError("TIFF missing strip offsets/byte counts")
        segments = []
        row0 = 0
        for off, cnt in zip(offsets, counts):
            if row0 >= h:
                break
            seg_h = min(rows_per_strip, h - row0)
            segments.append((off, cnt, row0, 0, seg_h, w))
            row0 += seg_h
        if row0 < h:
            raise ValueError("TIFF strip data too short")
    if any(b != 8 for b in bits):
        raise ValueError(f"unsupported TIFF bit depths {bits} (8-bit only)")
    predictor = one(317, 1)
    if compression not in (1, 5, 7, 32773):
        raise ValueError(
            f"unsupported TIFF compression {compression} "
            "(none/LZW/JPEG/PackBits only)"
        )
    if predictor not in (1, 2):
        raise ValueError(f"unsupported TIFF predictor {predictor}")

    if compression == 7:
        # New-style JPEG-in-TIFF (TIFF TechNote 2): each strip/tile is an
        # abbreviated JPEG stream; shared quant/huffman tables live in the
        # JPEGTables tag (347) as SOI <table segments> EOI and are spliced
        # in after each segment's SOI (writers may also inline full streams
        # per segment — redefinition mid-stream is legal JPEG and the later
        # tables win, so splicing is safe either way). Photometric 6
        # (YCbCr) is what the JPEG decoder already emits as RGB; 0/1 is
        # grayscale.
        if photometric not in (0, 1, 6):
            raise ValueError(
                f"unsupported JPEG-in-TIFF photometric {photometric}"
            )
        from .jpegcodec import decode_jpeg

        tables = raw_tags.get(347, b"")
        if tables[:2] == b"\xff\xd8" and tables[-2:] == b"\xff\xd9":
            tables = tables[2:-2]
        canvas: np.ndarray | None = None
        for off, cnt, row0, col0, seg_h, seg_w in segments:
            body = data[off : off + cnt]
            if body[:2] != b"\xff\xd8":
                raise ValueError("JPEG-in-TIFF segment missing SOI")
            seg_px = decode_jpeg(b"\xff\xd8" + tables + body[2:])
            if seg_px.ndim == 2:
                seg_px = seg_px[:, :, None]
            if canvas is None:
                canvas = np.zeros((h, w, seg_px.shape[2]), dtype=np.uint8)
            vh = min(seg_h, h - row0)
            vw = min(seg_w, w - col0)
            if seg_px.shape[0] < vh or seg_px.shape[1] < vw:
                raise ValueError("JPEG-in-TIFF segment data too short")
            canvas[row0 : row0 + vh, col0 : col0 + vw] = seg_px[:vh, :vw]
        if canvas is None:  # unreachable given the w/h >= 1 guard above,
            raise ValueError("JPEG-in-TIFF has no segments")  # but cheap
        if photometric == 0:  # WhiteIsZero
            canvas = 255 - canvas
        return canvas

    if photometric not in (0, 1, 2):
        raise ValueError(f"unsupported TIFF photometric {photometric}")

    px = np.zeros((h, w, spp), dtype=np.uint8)
    for off, cnt, row0, col0, seg_h, seg_w in segments:
        body = data[off : off + cnt]
        expected = seg_h * seg_w * spp
        if compression == 32773:
            body = _unpackbits(body, expected)
        elif compression == 5:
            body = _tiff_lzw_decode(body, expected)
        if len(body) < expected:
            raise ValueError("TIFF strip data too short")
        seg = np.frombuffer(bytes(body[:expected]), dtype=np.uint8).reshape(
            seg_h, seg_w, spp
        )
        if predictor == 2:  # horizontal differencing: undo = per-row cumsum
            # per segment — a tile's differences restart at ITS left edge
            seg = (np.cumsum(seg, axis=1, dtype=np.int64) % 256).astype(np.uint8)
        vh = min(seg_h, h - row0)
        vw = min(seg_w, w - col0)
        px[row0 : row0 + vh, col0 : col0 + vw] = seg[:vh, :vw]
    if photometric == 0:  # WhiteIsZero
        px = 255 - px
    return px


def encode_tiff(
    pixels: np.ndarray, compression: str = "none", predictor: int = 1
) -> bytes:
    """Encode (h, w, c∈{1,3,4}) uint8 to a little-endian single-strip TIFF.
    ``compression``: 'none' or 'lzw' (TIFF §13, early-change widths);
    ``predictor``: 1 (none) or 2 (horizontal differencing — the standard
    LZW companion). Round-trip oracle for the decoder's compressed paths."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, spp = px.shape
    if spp not in (1, 3, 4):
        raise ValueError("encode_tiff expects 1, 3 or 4 channels")
    if predictor == 2:
        diff = px.astype(np.int16)
        diff[:, 1:, :] -= px[:, :-1, :].astype(np.int16)
        body_px = (diff & 0xFF).astype(np.uint8)
    elif predictor == 1:
        body_px = px
    else:
        raise ValueError(f"unsupported predictor {predictor}")
    body = body_px.tobytes()
    if compression == "lzw":
        comp_tag = 5
        body = _tiff_lzw_encode(body)
    elif compression == "none":
        comp_tag = 1
    else:
        raise ValueError(f"unsupported compression {compression!r}")
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
    entry(259, 3, 1, short(comp_tag))
    entry(262, 3, 1, short(photometric))
    if predictor == 2:
        entry(317, 3, 1, short(2))
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
