"""Zstandard decoder (RFC 8878), pure stdlib.

Completes the Content-Encoding chain (functions/httppayload.py): after r7's
pure brotli decoder, zstd was the one token still requiring a system
library. This is a from-scratch implementation of the RFC — frame headers,
raw/RLE/compressed blocks, Huffman-coded literals (1- and 4-stream, direct
and FSE-compressed weights, treeless repeat), FSE-compressed sequences with
the predefined/RLE/compressed/repeat table modes, repeat-offset semantics,
and the XXH64 content checksum — bit-A/B'd in tests/test_zstddec.py against
the system libzstd over libzstd-encoded corpora at every compression level,
with truncation/corruption accept-reject agreement. No external-dictionary
support (crawl HTTP payloads are self-contained; a nonzero Dictionary_ID
raises).

The system library remains the measured hot path via
httppayload.decode_zstd_native — same posture as brotlidec/nativecodecs:
pure is the always-available correctness baseline, native is injected at
scale, and the A/B suite proves they agree.
"""

from __future__ import annotations

import struct

# --------------------------------------------------------------------------
# RFC 8878 §3.1.1.3.2.1.1: sequence code tables
# --------------------------------------------------------------------------

_LL_BASE = tuple(range(16)) + (16, 18, 20, 22, 24, 28, 32, 40, 48, 64,
                               128, 256, 512, 1024, 2048, 4096, 8192,
                               16384, 32768, 65536)
_LL_BITS = (0,) * 16 + (1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11,
                        12, 13, 14, 15, 16)
_ML_BASE = tuple(range(3, 35)) + (35, 37, 39, 41, 43, 47, 51, 59, 67, 83,
                                  99, 131, 259, 515, 1027, 2051, 4099,
                                  8195, 16387, 32771, 65539)
_ML_BITS = (0,) * 32 + (1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11,
                        12, 13, 14, 15, 16)

# §3.1.1.3.2.2: predefined FSE distributions
_LL_DEFAULT = (4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
               2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
               -1, -1, -1, -1)
_LL_DEFAULT_LOG = 6
_OF_DEFAULT = (1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
               1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1)
_OF_DEFAULT_LOG = 5
_ML_DEFAULT = (1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
               1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
               1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1,
               -1, -1, -1, -1, -1)
_ML_DEFAULT_LOG = 6

_MAX_LL_LOG = 9
_MAX_OF_LOG = 8
_MAX_ML_LOG = 9
_MAX_HUF_LOG = 11


class _Fwd:
    """Forward LSB-first bit reader (FSE table descriptions)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, n: int) -> int:
        p = self.pos
        if p + n > len(self.data) * 8:
            raise ValueError("zstd: table description truncated")
        self.pos = p + n
        if n == 0:
            return 0
        shift = p & 7
        first = p >> 3
        chunk = self.data[first:first + ((n + shift + 7) >> 3)]
        return (int.from_bytes(chunk, "little") >> shift) & ((1 << n) - 1)

    def peek(self, n: int) -> int:
        p = self.pos
        shift = p & 7
        first = p >> 3
        chunk = self.data[first:first + ((n + shift + 7) >> 3)]
        return (int.from_bytes(chunk, "little") >> shift) & ((1 << n) - 1)


class _Back:
    """Backward bitstream (§3.1.1.3.2.1.2): written LSB-first, read from
    the top — the last byte carries a 1-sentinel above the data bits."""

    __slots__ = ("data", "bitpos")

    def __init__(self, data: bytes):
        if not data or data[-1] == 0:
            raise ValueError("zstd: bitstream missing sentinel")
        self.data = data
        self.bitpos = (len(data) - 1) * 8 + data[-1].bit_length() - 1

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.bitpos - n
        if p < 0:
            raise ValueError("zstd: bitstream underflow")
        self.bitpos = p
        shift = p & 7
        first = p >> 3
        chunk = self.data[first:first + ((n + shift + 7) >> 3)]
        return (int.from_bytes(chunk, "little") >> shift) & ((1 << n) - 1)


def _read_ncount(fr: _Fwd, max_symbol: int, max_log: int):
    """§4.1.1 FSE table description → (normalized counts, accuracy_log)."""
    accuracy = fr.read(4) + 5
    if accuracy > max_log:
        raise ValueError("zstd: accuracy log too large")
    table_size = 1 << accuracy
    remaining = table_size + 1
    threshold = table_size
    nbits = accuracy + 1
    probs: list[int] = []
    while remaining > 1:
        if len(probs) > max_symbol:
            raise ValueError("zstd: FSE table has too many symbols")
        maxv = 2 * threshold - 1 - remaining
        v = fr.peek(nbits)
        if (v & (threshold - 1)) < maxv:
            fr.pos += nbits - 1
            count = v & (threshold - 1)
        else:
            v &= 2 * threshold - 1
            fr.pos += nbits
            count = v if v < threshold else v - maxv
        count -= 1  # -1 = "less than one"
        remaining -= -count if count < 0 else count
        probs.append(count)
        if count == 0:
            while True:
                rep = fr.read(2)
                probs.extend([0] * rep)
                if len(probs) > max_symbol + 1:
                    raise ValueError("zstd: FSE zero-run overflows alphabet")
                if rep < 3:
                    break
        while 1 < remaining < threshold:
            threshold >>= 1
            nbits -= 1
    if remaining != 1:
        raise ValueError("zstd: corrupted FSE table description")
    fr.pos = (fr.pos + 7) & ~7  # table description is byte-padded
    return probs, accuracy


def _fse_table(probs, table_log: int):
    """§4.1.2 decoding table: per state -> (symbol, nb_bits, baseline)."""
    size = 1 << table_size_check(table_log)
    symbol_of = [0] * size
    high = size - 1
    for s, p in enumerate(probs):
        if p == -1:
            symbol_of[high] = s
            high -= 1
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    pos = 0
    for s, p in enumerate(probs):
        for _ in range(max(p, 0)):
            symbol_of[pos] = s
            pos = (pos + step) & mask
            while pos > high:
                pos = (pos + step) & mask
    if pos != 0:
        raise ValueError("zstd: FSE table spread did not close")
    nxt = [1 if p == -1 else p for p in probs]
    table = [None] * size
    for state in range(size):
        s = symbol_of[state]
        k = nxt[s]
        nxt[s] = k + 1
        nb = table_log - (k.bit_length() - 1)
        table[state] = (s, nb, (k << nb) - size)
    return table


def table_size_check(table_log: int) -> int:
    if not 0 < table_log <= 12:
        raise ValueError("zstd: invalid FSE table log")
    return table_log


_PREDEFINED = {
    "ll": _fse_table(_LL_DEFAULT, _LL_DEFAULT_LOG),
    "of": _fse_table(_OF_DEFAULT, _OF_DEFAULT_LOG),
    "ml": _fse_table(_ML_DEFAULT, _ML_DEFAULT_LOG),
}


class _FseState:
    __slots__ = ("table", "log", "state")

    def __init__(self, table, log, br: _Back):
        self.table = table
        self.log = log
        self.state = br.read(log)

    @property
    def symbol(self) -> int:
        return self.table[self.state][0]

    def update(self, br: _Back) -> None:
        _, nb, base = self.table[self.state]
        self.state = base + br.read(nb)


class _RleState:
    """Degenerate 'FSE' for RLE mode: one symbol, zero bits."""

    __slots__ = ("sym",)

    def __init__(self, sym: int):
        self.sym = sym

    @property
    def symbol(self) -> int:
        return self.sym

    def update(self, br: _Back) -> None:
        pass


# --------------------------------------------------------------------------
# Huffman literals (§4.2)
# --------------------------------------------------------------------------

def _huffman_table(weights: list[int]):
    """Weights (last one implicit, already appended) → flat decode table
    indexed by a table_log-bit peek: (symbol, nb_bits)."""
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ValueError("zstd: empty Huffman table")
    table_log = total.bit_length() - 1
    if (1 << table_log) != total:
        raise ValueError("zstd: Huffman weights do not sum to a power of 2")
    if table_log > _MAX_HUF_LOG:
        raise ValueError("zstd: Huffman table log too large")
    size = 1 << table_log
    table = [None] * size
    pos = 0
    # regions filled by ascending weight (longest codes first); within a
    # weight, symbols in natural order
    for w in range(1, table_log + 2):
        span = 1 << (w - 1)
        for sym, sw in enumerate(weights):
            if sw != w:
                continue
            nb = table_log + 1 - w
            for _ in range(span):
                table[pos] = (sym, nb)
                pos += 1
    if pos != size:
        raise ValueError("zstd: Huffman table fill mismatch")
    return table, table_log


def _read_huffman(data: bytes):
    """§4.2.1 Huffman tree description → (table, table_log, bytes used)."""
    if not data:
        raise ValueError("zstd: missing Huffman description")
    hb = data[0]
    if hb >= 128:  # direct 4-bit weights
        nsym = hb - 127
        nbytes = (nsym + 1) >> 1
        if 1 + nbytes > len(data):
            raise ValueError("zstd: Huffman weights truncated")
        weights = []
        for i in range(nsym):
            b = data[1 + (i >> 1)]
            weights.append((b >> 4) if i % 2 == 0 else (b & 15))
        used = 1 + nbytes
    else:  # FSE-compressed weights, two interleaved states
        if 1 + hb > len(data):
            raise ValueError("zstd: Huffman FSE weights truncated")
        blob = data[1:1 + hb]
        fr = _Fwd(blob)
        probs, log = _read_ncount(fr, 255, 6)
        table = _fse_table(probs, log)
        br = _Back(blob[fr.pos >> 3:])
        even = _FseState(table, log, br)
        odd = _FseState(table, log, br)
        weights = []
        # states flip-flop; stream ends when a state update would underflow
        while True:
            weights.append(even.symbol)
            if br.bitpos < even.table[even.state][1]:
                weights.append(odd.symbol)
                break
            even.update(br)
            weights.append(odd.symbol)
            if br.bitpos < odd.table[odd.state][1]:
                weights.append(even.symbol)
                break
            odd.update(br)
            if len(weights) > 255:
                raise ValueError("zstd: too many Huffman weights")
        used = 1 + hb
    if len(weights) > 255:
        raise ValueError("zstd: too many Huffman weights")
    # last weight is implicit: it completes the sum to the next power of
    # two STRICTLY above the partial total (the implicit weight is > 0)
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ValueError("zstd: all-zero Huffman weights")
    missing = (1 << total.bit_length()) - total
    if missing & (missing - 1):
        raise ValueError("zstd: invalid Huffman weight sum")
    weights.append(missing.bit_length())
    table, table_log = _huffman_table(weights)
    return table, table_log, used


def _huffman_decode(stream: bytes, table, table_log: int, count: int) -> bytes:
    br = _Back(stream)
    out = bytearray()
    data = br.data
    bitpos = br.bitpos
    mask = (1 << table_log) - 1
    for _ in range(count):
        p = bitpos - table_log
        if p >= 0:
            shift = p & 7
            first = p >> 3
            chunk = data[first:first + ((table_log + shift + 7) >> 3)]
            v = (int.from_bytes(chunk, "little") >> shift) & mask
        else:
            # final symbols may peek past the start; missing bits are 0
            # (they are never consumed on a valid stream)
            chunk = data[0:(bitpos + 7) >> 3]
            v = (int.from_bytes(chunk, "little") & ((1 << bitpos) - 1)) \
                << (table_log - bitpos)
            v &= mask
        sym, nb = table[v]
        if nb > bitpos:
            raise ValueError("zstd: Huffman stream underflow")
        bitpos -= nb
        out.append(sym)
    if bitpos != 0:
        raise ValueError("zstd: Huffman stream not fully consumed")
    return bytes(out)


# --------------------------------------------------------------------------
# frame / block decoding
# --------------------------------------------------------------------------

def _decode_literals(block: bytes, pos: int, prev_huffman):
    """§3.1.1.3.1 literals section → (literals, new pos, huffman state)."""
    if pos >= len(block):
        raise ValueError("zstd: missing literals section")
    b0 = block[pos]
    ltype = b0 & 3
    size_format = (b0 >> 2) & 3
    if ltype in (0, 1):  # raw / RLE
        if size_format in (0, 2):
            regen = b0 >> 3
            pos += 1
        elif size_format == 1:
            if pos + 2 > len(block):
                raise ValueError("zstd: literals header truncated")
            regen = (b0 >> 4) | (block[pos + 1] << 4)
            pos += 2
        else:
            if pos + 3 > len(block):
                raise ValueError("zstd: literals header truncated")
            regen = (b0 >> 4) | (block[pos + 1] << 4) | (block[pos + 2] << 12)
            pos += 3
        if ltype == 0:
            lits = block[pos:pos + regen]
            if len(lits) != regen:
                raise ValueError("zstd: raw literals truncated")
            return bytes(lits), pos + regen, prev_huffman
        if pos >= len(block):
            raise ValueError("zstd: RLE literal truncated")
        return bytes([block[pos]]) * regen, pos + 1, prev_huffman

    # compressed (2) / treeless (3)
    hdr_bytes = (3, 3, 4, 5)[size_format]
    if pos + hdr_bytes > len(block):
        raise ValueError("zstd: literals header truncated")
    hdr = int.from_bytes(block[pos:pos + hdr_bytes], "little")
    pos += hdr_bytes
    if size_format == 0:
        regen = (hdr >> 4) & 0x3FF
        comp = (hdr >> 14) & 0x3FF
        streams = 1
    elif size_format == 1:
        regen = (hdr >> 4) & 0x3FF
        comp = (hdr >> 14) & 0x3FF
        streams = 4
    elif size_format == 2:
        regen = (hdr >> 4) & 0x3FFF
        comp = (hdr >> 18) & 0x3FFF
        streams = 4
    else:
        regen = (hdr >> 4) & 0x3FFFF
        comp = (hdr >> 22) & 0x3FFFF
        streams = 4
    section = block[pos:pos + comp]
    if len(section) != comp:
        raise ValueError("zstd: compressed literals truncated")
    pos += comp
    if ltype == 2:
        table, table_log, used = _read_huffman(section)
        section = section[used:]
        huffman = (table, table_log)
    else:
        if prev_huffman is None:
            raise ValueError("zstd: treeless literals with no previous table")
        table, table_log = prev_huffman
        huffman = prev_huffman
    if streams == 1:
        return (_huffman_decode(section, table, table_log, regen),
                pos, huffman)
    if len(section) < 6:
        raise ValueError("zstd: jump table truncated")
    s1, s2, s3 = struct.unpack_from("<HHH", section, 0)
    body = section[6:]
    if s1 + s2 + s3 > len(body):
        raise ValueError("zstd: literal streams overrun section")
    sizes = [s1, s2, s3, len(body) - s1 - s2 - s3]
    r123 = (regen + 3) >> 2
    counts = [r123, r123, r123, regen - 3 * r123]
    if counts[3] < 0:
        raise ValueError("zstd: bad 4-stream regenerated size")
    out = bytearray()
    off = 0
    for sz, cnt in zip(sizes, counts):
        out += _huffman_decode(body[off:off + sz], table, table_log, cnt)
        off += sz
    return bytes(out), pos, huffman


def _seq_table(block, pos, mode, kind, predefined_key, max_symbol, max_log,
               prev):
    """One of LL/OF/ML table slots per the 2-bit compression mode."""
    if mode == 0:
        return ("fse", _PREDEFINED[predefined_key],
                {"ll": _LL_DEFAULT_LOG, "of": _OF_DEFAULT_LOG,
                 "ml": _ML_DEFAULT_LOG}[predefined_key]), pos
    if mode == 1:
        if pos >= len(block):
            raise ValueError("zstd: RLE sequence symbol truncated")
        sym = block[pos]
        if sym > max_symbol:
            raise ValueError(f"zstd: RLE {kind} symbol out of range")
        return ("rle", sym, 0), pos + 1
    if mode == 2:
        fr = _Fwd(block[pos:])
        probs, log = _read_ncount(fr, max_symbol, max_log)
        table = _fse_table(probs, log)
        return ("fse", table, log), pos + (fr.pos >> 3)
    if prev is None:
        raise ValueError(f"zstd: repeat {kind} table with no previous")
    return prev, pos


def _make_state(slot, br: _Back):
    kind, a, b = slot
    if kind == "rle":
        return _RleState(a)
    return _FseState(a, b, br)


def decode_zstd(data: bytes, max_output: int | None = None) -> bytes:
    """Decode a complete zstd frame sequence (incl. skippable frames);
    raises ValueError on any format violation. ``max_output`` caps the
    decompressed size (bomb guard)."""
    out = bytearray()
    pos = 0
    n = len(data)
    if n < 4:
        raise ValueError("zstd: truncated magic")
    saw_frame = False
    while pos < n:
        if pos + 4 > n:
            raise ValueError("zstd: truncated frame header")
        magic = int.from_bytes(data[pos:pos + 4], "little")
        pos += 4
        if (magic & 0xFFFFFFF0) == 0x184D2A50:  # skippable frame
            if pos + 4 > n:
                raise ValueError("zstd: truncated skippable frame")
            fsz = int.from_bytes(data[pos:pos + 4], "little")
            pos += 4
            if pos + fsz > n:
                raise ValueError("zstd: skippable frame overruns input")
            pos += fsz
            continue
        if magic != 0xFD2FB528:
            raise ValueError("zstd: bad magic")
        saw_frame = True
        pos, produced = _decode_frame(data, pos, out, max_output)
    if not saw_frame:
        raise ValueError("zstd: no content frame")
    return bytes(out)


def _decode_frame(data: bytes, pos: int, out: bytearray,
                  max_output: int | None) -> tuple[int, int]:
    n = len(data)
    if pos >= n:
        raise ValueError("zstd: truncated frame header")
    fhd = data[pos]
    pos += 1
    if fhd & 0x08:
        raise ValueError("zstd: reserved frame header bit set")
    single_segment = bool(fhd & 0x20)
    checksum = bool(fhd & 0x04)
    did_size = (0, 1, 2, 4)[fhd & 3]
    fcs_code = fhd >> 6
    if not single_segment:
        if pos >= n:
            raise ValueError("zstd: truncated window descriptor")
        wd = data[pos]
        pos += 1
        base = 1 << (10 + (wd >> 3))
        window = base + (base >> 3) * (wd & 7)
    else:
        window = None
    if did_size:
        if pos + did_size > n:
            raise ValueError("zstd: truncated dictionary id")
        if int.from_bytes(data[pos:pos + did_size], "little") != 0:
            raise ValueError("zstd: external dictionary not supported")
        pos += did_size
    fcs = None
    fcs_bytes = (1 if single_segment else 0, 2, 4, 8)[fcs_code]
    if fcs_bytes:
        if pos + fcs_bytes > n:
            raise ValueError("zstd: truncated frame content size")
        fcs = int.from_bytes(data[pos:pos + fcs_bytes], "little")
        if fcs_bytes == 2:
            fcs += 256
        pos += fcs_bytes
    if single_segment:
        window = fcs if fcs is not None else 0

    frame_start = len(out)
    huffman = None
    tables = {"ll": None, "of": None, "ml": None}
    rep = [1, 4, 8]
    # §3.1.1.2.3/4: every block's DECOMPRESSED size is capped at
    # min(Window_Size, 128 KiB) — also the memory bound one hostile block
    # can claim before the bomb guard fires (review r7 finding: without
    # this, 38 crafted bytes expanded to gigabytes)
    block_max = min(window if window is not None else 1 << 40, 128 << 10)
    while True:
        if pos + 3 > n:
            raise ValueError("zstd: truncated block header")
        bh = int.from_bytes(data[pos:pos + 3], "little")
        pos += 3
        last = bh & 1
        btype = (bh >> 1) & 3
        bsize = bh >> 3
        if btype == 0:  # raw
            if bsize > block_max:
                raise ValueError("zstd: block exceeds Block_Maximum_Size")
            if pos + bsize > n:
                raise ValueError("zstd: raw block truncated")
            out += data[pos:pos + bsize]
            pos += bsize
        elif btype == 1:  # RLE
            if bsize > block_max:
                raise ValueError("zstd: block exceeds Block_Maximum_Size")
            if pos >= n:
                raise ValueError("zstd: RLE block truncated")
            out += bytes([data[pos]]) * bsize
            pos += 1
        elif btype == 2:
            if pos + bsize > n:
                raise ValueError("zstd: compressed block truncated")
            huffman = _decode_block(data[pos:pos + bsize], out, huffman,
                                    tables, rep, frame_start, window,
                                    block_max, max_output)
            pos += bsize
        else:
            raise ValueError("zstd: reserved block type")
        if max_output is not None and len(out) > max_output:
            raise ValueError("zstd: output exceeds max_output")
        if last:
            break
    if fcs is not None and len(out) - frame_start != fcs:
        raise ValueError("zstd: frame content size mismatch")
    if checksum:
        if pos + 4 > n:
            raise ValueError("zstd: truncated content checksum")
        want = int.from_bytes(data[pos:pos + 4], "little")
        if xxh64(memoryview(out)[frame_start:]) & 0xFFFFFFFF != want:
            raise ValueError("zstd: content checksum mismatch")
        pos += 4
    return pos, len(out) - frame_start


def _decode_block(block: bytes, out: bytearray, huffman, tables, rep,
                  frame_start: int, window, block_max: int,
                  max_output) -> object:
    block_start = len(out)
    lits, pos, huffman = _decode_literals(block, 0, huffman)
    if len(lits) > block_max:
        raise ValueError("zstd: literals exceed Block_Maximum_Size")

    # sequences section header
    if pos >= len(block):
        raise ValueError("zstd: missing sequences section")
    b0 = block[pos]
    pos += 1
    if b0 == 0:
        out += lits
        return huffman
    if b0 < 128:
        nseq = b0
    elif b0 < 255:
        if pos >= len(block):
            raise ValueError("zstd: truncated sequence count")
        nseq = ((b0 - 128) << 8) + block[pos]
        pos += 1
    else:
        if pos + 2 > len(block):
            raise ValueError("zstd: truncated sequence count")
        nseq = block[pos] + (block[pos + 1] << 8) + 0x7F00
        pos += 2
    if pos >= len(block):
        raise ValueError("zstd: missing compression modes")
    modes = block[pos]
    pos += 1
    if modes & 3:
        raise ValueError("zstd: reserved compression-mode bits set")
    tables["ll"], pos = _seq_table(block, pos, (modes >> 6) & 3, "LL",
                                   "ll", 35, _MAX_LL_LOG, tables["ll"])
    tables["of"], pos = _seq_table(block, pos, (modes >> 4) & 3, "OF",
                                   "of", 31, _MAX_OF_LOG, tables["of"])
    tables["ml"], pos = _seq_table(block, pos, (modes >> 2) & 3, "ML",
                                   "ml", 52, _MAX_ML_LOG, tables["ml"])

    br = _Back(block[pos:])
    ll_state = _make_state(tables["ll"], br)
    of_state = _make_state(tables["of"], br)
    ml_state = _make_state(tables["ml"], br)

    lit_pos = 0
    for i in range(nseq):
        of_code = of_state.symbol
        ml_code = ml_state.symbol
        ll_code = ll_state.symbol
        if of_code > 31 or ml_code > 52 or ll_code > 35:
            raise ValueError("zstd: sequence code out of range")
        of_value = (1 << of_code) + br.read(of_code)
        ml = _ML_BASE[ml_code] + br.read(_ML_BITS[ml_code])
        ll = _LL_BASE[ll_code] + br.read(_LL_BITS[ll_code])

        if of_value > 3:
            offset = of_value - 3
            rep[2] = rep[1]
            rep[1] = rep[0]
            rep[0] = offset
        else:
            idx = of_value - 1
            if ll == 0:
                idx += 1
            if idx == 0:
                offset = rep[0]
            elif idx == 1:
                offset = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            elif idx == 2:
                offset = rep[2]
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            else:  # idx == 3: repeat offset 1 minus one
                offset = rep[0] - 1
                if offset == 0:
                    raise ValueError("zstd: zero repeat offset")
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset

        if lit_pos + ll > len(lits):
            raise ValueError("zstd: literal run overruns literals")
        out += lits[lit_pos:lit_pos + ll]
        lit_pos += ll

        if offset > len(out) - frame_start:
            raise ValueError("zstd: offset beyond frame start "
                             "(dictionaries unsupported)")
        if window is not None and offset > window:
            raise ValueError("zstd: offset beyond window")
        src = len(out) - offset
        if offset >= ml:
            out += out[src:src + ml]
        else:
            # overlapping copy: replicate the trailing `offset` bytes
            # cyclically by doubling — O(log(ml/offset)) slice ops, not
            # one interpreter iteration per byte (review r7 finding)
            frag = bytes(out[src:])
            while len(frag) < ml:
                frag += frag
            out += frag[:ml]
        if len(out) - block_start > block_max:
            raise ValueError("zstd: block exceeds Block_Maximum_Size")
        if max_output is not None and len(out) > max_output:
            raise ValueError("zstd: output exceeds max_output")

        if i != nseq - 1:
            ll_state.update(br)
            ml_state.update(br)
            of_state.update(br)
    if br.bitpos != 0:
        raise ValueError("zstd: sequence bitstream not fully consumed")
    out += lits[lit_pos:]
    return huffman


# --------------------------------------------------------------------------
# XXH64 (content checksum) — pure-Python, spec constants
# --------------------------------------------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    n = len(data)
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed
        v4 = (seed - _P1) & _M64
        i = 0
        for i in range(0, n - 31, 32):
            a, b, c, d = struct.unpack_from("<QQQQ", data, i)
            v1 = (_rotl((v1 + a * _P2) & _M64, 31) * _P1) & _M64
            v2 = (_rotl((v2 + b * _P2) & _M64, 31) * _P1) & _M64
            v3 = (_rotl((v3 + c * _P2) & _M64, 31) * _P1) & _M64
            v4 = (_rotl((v4 + d * _P2) & _M64, 31) * _P1) & _M64
        i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) \
            & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ ((_rotl((v * _P2) & _M64, 31) * _P1) & _M64))
                 * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
        i = 0
    h = (h + n) & _M64
    while i + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, i)
        h = ((_rotl(h ^ ((_rotl((k * _P2) & _M64, 31) * _P1) & _M64), 27)
              * _P1) + _P4) & _M64
        i += 8
    if i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h = ((_rotl(h ^ (k * _P1) & _M64, 23) * _P2) + _P3) & _M64
        i += 4
    while i < n:
        h = ((_rotl(h ^ (data[i] * _P5) & _M64, 11)) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h
