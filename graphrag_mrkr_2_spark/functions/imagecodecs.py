"""Pure-stdlib raster image codecs: PNG, BMP, GIF (VERDICT r3 'Next round'
#5 — the docformats.py playbook applied to S1's raster leg).

The reference OCRs standalone images through PIL/pytesseract
(ingestion/loaders/image_loader.py:24, core/ocr.py); neither library ships
in this container, but the CONTAINER formats are pure-public-spec
decodable with zlib + byte arithmetic, exactly like the r3 PDF/DOCX work:

- PNG (RFC 2083 / W3C PNG spec): chunk stream, IHDR/PLTE/IDAT, zlib
  inflate, per-scanline filters 0-4 (None/Sub/Up/Average/Paeth),
  bit-depth 8, color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha),
  6 (RGBA), non-interlaced.
- BMP (BITMAPINFOHEADER): 24/32-bit uncompressed, bottom-up or top-down,
  4-byte row padding.
- GIF (GIF87a/89a spec): logical screen + image descriptors, global/local
  color tables, extension-block skipping, 4-pass interlace, full LZW
  decode/encode with variable code width (LSB-first packing, clear/end
  codes, 12-bit cap), animated frames with disposal compositing.

Encoders exist for all three so every decode path has an exact
encode→decode round-trip oracle (tests/test_imagecodecs.py) without any
third-party fixture generator. OCR itself remains the one model seam.

Pixels are numpy uint8 arrays shaped (h, w, c) with c in {1, 2, 3, 4};
channel order RGB(A). All functions are driver/executor-side kernels —
Spark-facing plumbing lives in operators/multimodal.py.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# channels per color type
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> np.ndarray:
    """Decode a non-interlaced 8-bit PNG to (h, w, c) uint8."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", chunk)
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(chunk, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"unsupported PNG bit depth {bit_depth} (only 8)")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    nch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * nch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG IDAT size mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = bytes(stride)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        cur = raw[off + 1 : off + 1 + stride]
        # filters 0/1/2 (the common adaptive choices) run vectorized —
        # Sub's left-recurrence is a per-lane prefix sum mod 256 (review r4
        # finding #7); Average/Paeth depend on left AND up reconstructed
        # bytes, an inherently sequential recurrence, and stay byte loops
        if ftype == 0:
            line = cur
        elif ftype == 1:  # Sub: per-channel-lane cumsum mod 256
            lanes = np.frombuffer(cur, dtype=np.uint8).reshape(width, nch)
            line = (
                (np.cumsum(lanes, axis=0, dtype=np.int64) % 256)
                .astype(np.uint8)
                .tobytes()
            )
        elif ftype == 2:  # Up: one vector add against the previous row
            line = (
                (
                    np.frombuffer(cur, dtype=np.uint8).astype(np.int16)
                    + np.frombuffer(prev, dtype=np.uint8)
                )
                & 0xFF
            ).astype(np.uint8).tobytes()
        elif ftype == 3:  # Average
            buf = bytearray(cur)
            for i in range(stride):
                a = buf[i - nch] if i >= nch else 0
                buf[i] = (buf[i] + ((a + prev[i]) >> 1)) & 0xFF
            line = bytes(buf)
        elif ftype == 4:  # Paeth
            buf = bytearray(cur)
            for i in range(stride):
                a = buf[i - nch] if i >= nch else 0
                c = prev[i - nch] if i >= nch else 0
                buf[i] = (buf[i] + _paeth(a, prev[i], c)) & 0xFF
            line = bytes(buf)
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = np.frombuffer(line, dtype=np.uint8)
        prev = line
    px = out.reshape(height, width, nch)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        px = palette[px[:, :, 0]]
    return px


def _png_chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode (h, w, c) uint8 to PNG, applying ``filter_type`` (0-4) to
    every scanline — selectable so tests exercise every unfilter path."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nch = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
    stride = w * nch
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"bad filter type {filter_type}")
    # forward filtering reads ONLY original bytes, so every filter is fully
    # vectorizable over the whole image (review r4 finding #7): `left` /
    # `up` / `upleft` are shifted views of the original pixel matrix —
    # built only for the filters that use them (the filter-0 default path
    # copies nothing beyond the reshape)
    if filter_type == 0:
        enc = px.reshape(h, stride)
    else:
        flat = px.reshape(h, stride).astype(np.int16)
        left = np.zeros_like(flat)
        left[:, nch:] = flat[:, :-nch]
        if filter_type == 1:
            enc = flat - left
        else:
            up = np.zeros_like(flat)
            up[1:] = flat[:-1]
            if filter_type == 2:
                enc = flat - up
            elif filter_type == 3:
                enc = flat - ((left + up) >> 1)
            else:  # Paeth predictor, vectorized
                upleft = np.zeros_like(flat)
                upleft[1:, nch:] = flat[:-1, :-nch]
                p = left + up - upleft
                pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
                )
                enc = flat - pred
        enc = (enc & 0xFF).astype(np.uint8)
    lines = bytearray()
    for y in range(h):
        lines.append(filter_type)
        lines += enc[y].tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(lines)))
        + _png_chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode an uncompressed 24/32-bit BITMAPINFOHEADER BMP to (h, w, 3|4)
    uint8 RGB(A)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (pix_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    width, height = struct.unpack("<ii", data[18:26])
    (bpp,) = struct.unpack("<H", data[28:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    bottom_up = height > 0
    height = abs(height)
    nch = bpp // 8
    row_bytes = (width * nch + 3) & ~3
    px = np.zeros((height, width, nch), dtype=np.uint8)
    for y in range(height):
        row = data[pix_off + y * row_bytes : pix_off + y * row_bytes + width * nch]
        arr = np.frombuffer(row, dtype=np.uint8).reshape(width, nch)
        py = height - 1 - y if bottom_up else y
        px[py] = arr
    # BGR(A) -> RGB(A)
    if nch >= 3:
        px = px[:, :, [2, 1, 0] + ([3] if nch == 4 else [])]
    return px


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode (h, w, 3) uint8 RGB to a 24-bit bottom-up BMP."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_bmp expects (h, w, 3) RGB")
    h, w, _ = px.shape
    row_bytes = (w * 3 + 3) & ~3
    pad = bytes(row_bytes - w * 3)
    body = bytearray()
    for y in range(h - 1, -1, -1):
        body += px[y, :, [2, 1, 0]].T.tobytes()  # RGB -> BGR
        body += pad
    pix_off = 14 + 40
    file_size = pix_off + len(body)
    header = (
        b"BM"
        + struct.pack("<IHHI", file_size, 0, 0, pix_off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    )
    return header + bytes(body)


# ---------------------------------------------------------------------------
# GIF (LZW per the GIF89a spec, LSB-first variable-width codes)
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: dict[int, list[int]] = {i: [i] for i in range(clear)}
    next_code = end + 1
    out: list[int] = []
    prev: list[int] | None = None
    bitpos = 0
    total_bits = len(data) * 8
    while bitpos + code_size <= total_bits:
        byte_i = bitpos // 8
        window = int.from_bytes(data[byte_i : byte_i + 3], "little")
        code = (window >> (bitpos % 8)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            code_size = min_code_size + 1
            table = {i: [i] for i in range(clear)}
            next_code = end + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        else:
            if code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + [prev[0]]
            else:
                raise ValueError(f"bad LZW code {code}")
            if next_code < 4096:
                table[next_code] = prev + [entry[0]]
                next_code += 1
                if next_code == (1 << code_size) and code_size < 12:
                    code_size += 1
        out.extend(entry)
        prev = entry
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, size: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += size
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.buf.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.buf)


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    bw = _BitWriter()

    def reset():
        return {(i,): i for i in range(clear)}, end + 1, min_code_size + 1

    table, next_code, code_size = reset()
    bw.write(clear, code_size)
    w: tuple[int, ...] = ()
    for k in indices:
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        bw.write(table[w], code_size)
        if next_code < 4096:
            table[wk] = next_code
            # the encoder grows width when the JUST-ADDED code fills the
            # current range (decoder grows after its mirrored add)
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
            next_code += 1
        else:
            bw.write(clear, code_size)
            table, next_code, code_size = reset()
        w = (k,)
    if w:
        bw.write(table[w], code_size)
    bw.write(end, code_size)
    return bw.flush()


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    """Undo GIF 4-pass interlacing: stream rows arrive in pass order
    (every 8th from 0, every 8th from 4, every 4th from 2, every 2nd
    from 1); map them back to display order."""
    h = idx.shape[0]
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    out = np.empty_like(idx)
    out[order] = idx
    return out


def gif_frames(data: bytes) -> list[tuple[int, np.ndarray]]:
    """Decode ALL frames of a non-interlaced animated GIF to
    [(delay_ms, (h, w, 3) uint8 RGB)], composited onto the logical screen
    per the GIF89a disposal model (disposal 0/1 = draw over previous,
    2 = restore background, 3 = restore previous; transparency honored
    through the GCE transparent-color index)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, flags, bg_idx, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    global_table = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_table = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(
            n, 3
        )
        pos += 3 * n
    if global_table is not None and bg_idx < len(global_table):
        canvas = np.tile(global_table[bg_idx], (sh, sw, 1)).astype(np.uint8)
        background = canvas.copy()
    else:
        canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
        background = canvas.copy()
    frames: list[tuple[int, np.ndarray]] = []
    delay_ms = 0
    transparent: int | None = None
    disposal = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            label = data[pos]
            pos += 1
            if label == 0xF9 and data[pos] >= 4:  # Graphic Control Extension
                gflags, delay_cs, tidx = struct.unpack(
                    "<BHB", data[pos + 1 : pos + 5]
                )
                delay_ms = delay_cs * 10
                disposal = (gflags >> 2) & 0x7
                transparent = tidx if gflags & 1 else None
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, w, h, iflags = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        table = global_table
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            table = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF image without a color table")
        min_code_size = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos] != 0:
            size = data[pos]
            lzw += data[pos + 1 : pos + 1 + size]
            pos += 1 + size
        pos += 1
        indices = _lzw_decode(bytes(lzw), min_code_size)
        if len(indices) < w * h:
            raise ValueError("GIF LZW data too short")
        idx = np.asarray(indices[: w * h], dtype=np.int32).reshape(h, w)
        if iflags & 0x40:
            idx = _deinterlace(idx)
        # clip rects that overhang the logical screen (browsers clip too —
        # review r4 pass-4 finding #3)
        ch_, cw_ = max(0, min(h, sh - top)), max(0, min(w, sw - left))
        idx = idx[:ch_, :cw_]
        # 'before' snapshot only when the disposal mode needs it (pass-4 #4)
        before = canvas.copy() if disposal == 3 else None
        region = canvas[top : top + ch_, left : left + cw_]
        px = table[idx]
        if transparent is not None:
            mask = (idx != transparent)[:, :, None]
            region[...] = np.where(mask, px, region)
        else:
            region[...] = px
        frames.append((delay_ms, canvas.copy()))
        if disposal == 2:  # restore background in the frame's region
            canvas[top : top + ch_, left : left + cw_] = background[
                top : top + ch_, left : left + cw_
            ]
        elif disposal == 3 and before is not None:  # restore pre-frame pixels
            canvas = before
        delay_ms = 0
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF contains no image descriptor")
    return frames


def _gif_palette(stack: np.ndarray):
    """Quantize (n, 3) uint8 rows to a power-of-two GIF color table.
    Returns (table bytes-ready array, per-pixel indices, bits,
    min_code_size) — the ONE palette builder shared by encode_gif and
    encode_gif_frames (review r4 pass-4 finding #5)."""
    colors, inverse = np.unique(stack, axis=0, return_inverse=True)
    inverse = np.asarray(inverse).reshape(-1)  # numpy 2.0 axis-unique quirk
    if len(colors) > 256:
        raise ValueError(f"GIF encoding needs <=256 colors, got {len(colors)}")
    bits = max(1, int(len(colors) - 1).bit_length())
    table = np.zeros((1 << bits, 3), dtype=np.uint8)
    table[: len(colors)] = colors
    return table, inverse, bits, max(2, bits)


def _write_subblocks(out: bytearray, seg: bytes) -> None:
    """Append LZW data as <=255-byte GIF sub-blocks plus the terminator."""
    for i in range(0, len(seg), 255):
        chunk = seg[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00"


def encode_gif_frames(
    frames: list[np.ndarray], delays_ms: list[int] | None = None
) -> bytes:
    """Encode full-screen RGB frames (shared <=256-color palette across all
    frames) to an animated GIF89a with per-frame GCE delays — the
    round-trip oracle for :func:`gif_frames` (disposal 0, no
    transparency)."""
    if not frames:
        raise ValueError("encode_gif_frames needs at least one frame")
    h, w, _ = frames[0].shape
    if any(f.shape != (h, w, 3) for f in frames):
        raise ValueError("encode_gif_frames needs uniform (h, w, 3) frames")
    delays_ms = delays_ms or [100] * len(frames)
    if len(delays_ms) != len(frames):
        raise ValueError("delays_ms must have one entry per frame")
    stack = np.concatenate([f.reshape(-1, 3) for f in frames], axis=0)
    table, inverse, bits, min_code_size = _gif_palette(stack)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += table.tobytes()
    per = w * h
    for fi, _frame in enumerate(frames):
        delay_cs = max(0, delays_ms[fi] // 10)
        out += b"\x21\xf9\x04" + struct.pack("<BHB", 0, delay_cs, 0) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(min_code_size)
        _write_subblocks(
            out,
            _lzw_encode(
                [int(i) for i in inverse[fi * per : (fi + 1) * per]], min_code_size
            ),
        )
    out += b"\x3b"
    return bytes(out)


def decode_gif(data: bytes) -> np.ndarray:
    """Decode the FIRST frame of a non-interlaced GIF87a/89a to (h, w, 3)
    uint8 RGB."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, flags, _bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    global_table = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_table = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(
            n, 3
        )
        pos += 3 * n
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        _left, _top, w, h, iflags = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        interlaced = bool(iflags & 0x40)
        table = global_table
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            table = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF image without a color table")
        min_code_size = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos] != 0:
            size = data[pos]
            lzw += data[pos + 1 : pos + 1 + size]
            pos += 1 + size
        pos += 1
        indices = _lzw_decode(bytes(lzw), min_code_size)
        if len(indices) < w * h:
            raise ValueError("GIF LZW data too short")
        px = np.asarray(indices[: w * h], dtype=np.int32).reshape(h, w)
        if interlaced:
            px = _deinterlace(px)
        return table[px]
    raise ValueError("GIF contains no image descriptor")


def encode_gif(pixels: np.ndarray) -> bytes:
    """Encode (h, w, 3) uint8 RGB (<= 256 distinct colors) to a GIF89a —
    single-frame body built on the same palette/sub-block helpers as
    encode_gif_frames (review r4 pass-4 finding #5: one copy of that
    logic)."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_gif expects (h, w, 3) RGB")
    h, w, _ = px.shape
    table, inverse, bits, min_code_size = _gif_palette(px.reshape(-1, 3))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += table.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(min_code_size)
    _write_subblocks(out, _lzw_encode([int(i) for i in inverse], min_code_size))
    out += b"\x3b"
    return bytes(out)


# ---------------------------------------------------------------------------
# sniffing
# ---------------------------------------------------------------------------


def sniff_image(data: bytes) -> str | None:
    """Return 'png' | 'bmp' | 'gif' | 'jpeg' | 'tiff' | None from magic bytes."""
    if not data:
        return None
    if data[:8] == _PNG_SIG:
        return "png"
    if data[:2] == b"BM":
        return "bmp"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "webp"
    if len(data) >= 12 and data[4:8] == b"ftyp":
        # HEIF image family (every HEIF also sniffs as generic MP4, so this
        # must classify here, before any video dispatch sees the payload)
        brand = data[8:12]
        if brand in (b"avif", b"avis"):
            return "avif"
        if brand in (b"heic", b"heix", b"heim", b"heis", b"hevc", b"hevx"):
            return "heic"
        if brand in (b"mif1", b"msf1"):
            from graphrag_mrkr_2_spark.functions.mediaprobe import _ftyp_brands

            brands = set(_ftyp_brands(data))
            if brands & {b"avif", b"avis"}:
                return "avif"
            if brands & {b"heic", b"heix", b"heim", b"heis", b"hevc", b"hevx"}:
                return "heic"
    return None


def decode_image(data: bytes) -> np.ndarray:
    """Decode any supported raster payload to (h, w, c) uint8."""
    fmt = sniff_image(data)
    if fmt == "png":
        return decode_png(data)
    if fmt == "bmp":
        return decode_bmp(data)
    if fmt == "gif":
        return decode_gif(data)
    if fmt == "jpeg":
        from .jpegcodec import decode_jpeg

        return decode_jpeg(data)
    if fmt == "tiff":
        from .tiffcodec import decode_tiff

        return decode_tiff(data)
    if fmt == "webp":
        from .webpcodec import decode_webp

        return decode_webp(data)
    if fmt in ("avif", "heic"):
        raise ValueError(
            "AVIF/HEIC decode requires an AV1/HEVC codec library not present "
            "in this environment — inject one through the image_features "
            "decoder seam (functions/nativecodecs.py); metadata still probes "
            "via mediaprobe.probe_heif"
        )
    raise ValueError(
        "unrecognized image payload "
        "(supported: PNG, BMP, GIF, baseline JPEG, baseline TIFF, WEBP)"
    )
