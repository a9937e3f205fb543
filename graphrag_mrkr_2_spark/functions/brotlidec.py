"""Brotli decoder (RFC 7932), pure stdlib.

Web crawls ship `Content-Encoding: br` everywhere and CPython has no brotli
module, so the webtext ingestion path needs a real decoder — the reference
(danve93/graphrag-mrkr-2) has no compression layer at all; its loaders
assume pre-decoded text (`ingestion/loaders/`). This is a from-scratch
implementation of the RFC, bit-A/B'd in tests/test_brotlidec.py against the
system libbrotlidec over libbrotlienc-encoded corpora at every quality level
and window size (byte-identical output, identical accept/reject on
truncations). Constant tables (Appendix A dictionary, Appendix B transforms,
context LUTs, block-count ranges) live in _brotlitables.py, extracted from
libbrotlicommon by scripts/extract_brotli_tables.py and re-verified against
the library on every test run.

Also provides ``encode_brotli_uncompressed`` — a trivial valid encoder
(uncompressed metablocks only) so driver oracles can build decodable
fixtures with zero dependencies — and ``decode_brotli_native``, the ctypes
libbrotlidec binding used as the injected scale path (same posture as
functions/nativecodecs.py: the pure decoder is the always-available
correctness baseline, the system library is the measured hot path).

Decode throughput is disclosed in SCALE.md; at 100 TB you inject the native
decoder on day one — the seam is proven byte-identical here.
"""

from __future__ import annotations

from graphrag_mrkr_2_spark.functions._brotlitables import (
    BLOCK_LEN_RANGES,
    CONTEXT_LUT,
    DICTIONARY,
    OFFSETS_BY_LENGTH,
    SIZE_BITS_BY_LENGTH,
    TRANSFORMS,
)

# --------------------------------------------------------------------------
# RFC 7932 §5: insert/copy length codes (24 each) and the combined
# insert-and-copy code cell mapping
# --------------------------------------------------------------------------

_INSERT_BASE = (0, 1, 2, 3, 4, 5, 6, 8, 10, 14, 18, 26, 34, 50, 66, 98,
                130, 194, 322, 578, 1090, 2114, 6210, 22594)
_INSERT_EXTRA = (0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5,
                 6, 7, 8, 9, 10, 12, 14, 24)
_COPY_BASE = (2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 18, 22, 30, 38, 54,
              70, 102, 134, 198, 326, 582, 1094, 2118)
_COPY_EXTRA = (0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4,
               5, 5, 6, 7, 8, 9, 10, 24)
# combined code: cell = sym >> 6; cells 0,1 imply distance code 0 (reuse
# last distance, no distance symbol read); cells 2..10 map through these
# high-part tables after subtracting 2
_INSERT_CELL = (0, 0, 8, 8, 0, 16, 8, 16, 16)
_COPY_CELL = (0, 8, 0, 8, 16, 0, 16, 8, 16)

# §3.5: fixed prefix code for the code-length code lengths — peek 4 bits,
# entry = (bits consumed, symbol)
_CL_FIXED = ((2, 0), (2, 4), (2, 3), (3, 2), (2, 0), (2, 4), (2, 3), (4, 1),
             (2, 0), (2, 4), (2, 3), (3, 2), (2, 0), (2, 4), (2, 3), (4, 5))
_CL_ORDER = (1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9, 10, 11, 12, 13, 14, 15)

# §4: initial "last four distances" and the 16 short distance codes as
# (ring index, delta)
_SHORT_DIST = ((0, 0), (1, 0), (2, 0), (3, 0),
               (0, -1), (0, 1), (0, -2), (0, 2), (0, -3), (0, 3),
               (1, -1), (1, 1), (1, -2), (1, 2), (1, -3), (1, 3))


class _Bits:
    """LSB-first bit reader with hard truncation errors."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.nbits = len(data) * 8

    def read(self, n: int) -> int:
        p = self.pos
        if p + n > self.nbits:
            raise ValueError("brotli: bitstream truncated")
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

    def align_byte(self) -> None:
        """Skip to the next byte boundary; the discarded bits must be 0
        (§9.1 — non-zero padding is a format error)."""
        n = (-self.pos) & 7
        if n and self.read(n) != 0:
            raise ValueError("brotli: non-zero padding bits")


_FAST_BITS = 10  # flat-table cap; brotli codes reach length 15


def _canonical(lengths) -> tuple:
    """Canonical prefix code from code lengths (increasing length, then
    symbol order; code bits decoded MSB-first — brotli writes each code
    word reversed so an LSB-first stream yields MSB-first accumulation).
    Must be complete (§3.5); single-symbol codes read zero bits."""
    nonzero = [(L, s) for s, L in enumerate(lengths) if L > 0]
    if not nonzero:
        raise ValueError("brotli: empty prefix code")
    if len(nonzero) == 1:
        return ("single", nonzero[0][1], 0)
    table = {}
    code = 0
    prev_len = 0
    max_len = 0
    for L, s in sorted(nonzero):
        code <<= L - prev_len
        prev_len = L
        table[(L, code)] = s
        code += 1
        max_len = L
    if code != (1 << max_len):
        raise ValueError("brotli: incomplete or over-subscribed prefix code")
    if max_len <= _FAST_BITS:
        flat = [None] * (1 << max_len)
        for (L, c), s in table.items():
            rev = 0
            for i in range(L):
                rev |= ((c >> i) & 1) << (L - 1 - i)
            for hi in range(1 << (max_len - L)):
                flat[(hi << L) | rev] = (s, L)
        return ("fast", flat, max_len)
    return ("table", table, max_len)


def _simple_code(symbols, deep: bool) -> tuple:
    """§3.4 simple prefix codes: code words assigned in symbol-list order
    (after the spec'd per-shape sorts done by the caller)."""
    n = len(symbols)
    if n == 1:
        return ("single", symbols[0], 0)
    if n == 2:
        shape = ((1, 0b0), (1, 0b1))
    elif n == 3:
        shape = ((1, 0b0), (2, 0b10), (2, 0b11))
    elif deep:
        shape = ((1, 0b0), (2, 0b10), (3, 0b110), (3, 0b111))
    else:
        shape = ((2, 0b00), (2, 0b01), (2, 0b10), (2, 0b11))
    table = {lc: s for lc, s in zip(shape, symbols)}
    max_len = max(L for L, _ in table)
    flat = [None] * (1 << max_len)
    for (L, c), s in table.items():
        rev = 0
        for i in range(L):
            rev |= ((c >> i) & 1) << (L - 1 - i)
        for hi in range(1 << (max_len - L)):
            flat[(hi << L) | rev] = (s, L)
    return ("fast", flat, max_len)


def _read_symbol(br: _Bits, huff) -> int:
    kind = huff[0]
    if kind == "single":
        return huff[1]
    if kind == "fast":
        entry = huff[1][br.peek(huff[2])]
        if entry is None:
            raise ValueError("brotli: invalid prefix code word")
        br.pos += entry[1]
        if br.pos > br.nbits:
            raise ValueError("brotli: bitstream truncated")
        return entry[0]
    table, max_len = huff[1], huff[2]
    code = 0
    length = 0
    while length <= max_len:
        code = (code << 1) | br.read(1)
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("brotli: invalid prefix code word")


def _read_prefix_code(br: _Bits, alphabet: int) -> tuple:
    """§3.4/§3.5: one prefix code, simple or complex."""
    hskip = br.read(2)
    if hskip == 1:  # simple
        nsym = br.read(2) + 1
        abits = max(1, (alphabet - 1).bit_length())
        symbols = [br.read(abits) for _ in range(nsym)]
        for s in symbols:
            if s >= alphabet:
                raise ValueError("brotli: simple-code symbol out of range")
        if len(set(symbols)) != nsym:
            raise ValueError("brotli: duplicate simple-code symbol")
        deep = False
        if nsym == 4:
            deep = br.read(1) == 1
        # spec'd canonical sorts: 2 and 3 sort the equal-length tail;
        # the flat 4-symbol tree sorts everything, the deep one only the
        # two 3-bit symbols
        if nsym == 2:
            symbols.sort()
        elif nsym == 3:
            if symbols[1] > symbols[2]:
                symbols[1], symbols[2] = symbols[2], symbols[1]
        elif nsym == 4:
            if deep:
                if symbols[2] > symbols[3]:
                    symbols[2], symbols[3] = symbols[3], symbols[2]
            else:
                symbols.sort()
        return _simple_code(symbols, nsym == 4 and deep)

    # complex: code lengths for the code-length code, fixed-coded,
    # starting at position hskip in the spec order
    cl_lengths = [0] * 18
    space = 32
    num_codes = 0
    for i in range(hskip, 18):
        nbits, v = _CL_FIXED[br.peek(4)]
        br.pos += nbits
        if br.pos > br.nbits:
            raise ValueError("brotli: bitstream truncated")
        cl_lengths[_CL_ORDER[i]] = v
        if v:
            space -= 32 >> v
            num_codes += 1
            if space <= 0:
                break
    if num_codes == 1:
        cl_code = ("single",
                   next(s for s, L in enumerate(cl_lengths) if L), 0)
    elif space != 0:
        raise ValueError("brotli: invalid code-length code")
    else:
        cl_code = _canonical(cl_lengths)

    lengths = [0] * alphabet
    space = 32768
    prev_len = 8  # kDefaultCodeLength
    repeat = 0
    repeat_len = 0
    i = 0
    while i < alphabet and space > 0:
        sym = _read_symbol(br, cl_code)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev_len = sym
                space -= 32768 >> sym
            repeat = 0
        else:
            extra = 2 if sym == 16 else 3
            new_len = prev_len if sym == 16 else 0
            if repeat_len != new_len:
                repeat = 0
                repeat_len = new_len
            old = repeat
            if repeat:
                repeat = (repeat - 2) << extra
            repeat += br.read(extra) + 3
            delta = repeat - old
            if i + delta > alphabet:
                raise ValueError("brotli: repeat past end of alphabet")
            for _ in range(delta):
                lengths[i] = repeat_len
                i += 1
            if repeat_len:
                space -= delta << (15 - repeat_len)
    if space != 0:
        raise ValueError("brotli: incomplete or over-subscribed prefix code")
    return _canonical(lengths)


def _read_varlen_256(br: _Bits) -> int:
    """§9.2 variable-length 1..256 value (NBLTYPES, NTREES)."""
    if not br.read(1):
        return 1
    k = br.read(3)
    if k == 0:
        return 2
    return (1 << k) + br.read(k) + 1


def _read_context_map(br: _Bits, size: int, ntrees: int) -> bytes:
    """§7.3: run-length-coded context map + optional inverse MTF."""
    if ntrees == 1:
        return bytes(size)
    rlemax = (br.read(4) + 1) if br.read(1) else 0
    code = _read_prefix_code(br, rlemax + ntrees)
    cmap = bytearray(size)
    i = 0
    while i < size:
        sym = _read_symbol(br, code)
        if sym == 0:
            i += 1
        elif sym <= rlemax:
            reps = (1 << sym) + br.read(sym)
            if i + reps > size:
                raise ValueError("brotli: context-map run overflows")
            i += reps
        else:
            v = sym - rlemax
            if v >= ntrees:
                raise ValueError("brotli: context-map value out of range")
            cmap[i] = v
            i += 1
    if br.read(1):  # inverse move-to-front
        mtf = list(range(256))
        for j in range(size):
            v = cmap[j]
            val = mtf.pop(v)
            mtf.insert(0, val)
            cmap[j] = val
    return bytes(cmap)


class _BlockState:
    """One block-category state machine (§6)."""

    __slots__ = ("ntypes", "btype", "prev", "remaining", "type_code",
                 "len_code")

    def __init__(self, br: _Bits):
        self.ntypes = _read_varlen_256(br)
        self.btype = 0
        self.prev = 1
        if self.ntypes > 1:
            self.type_code = _read_prefix_code(br, self.ntypes + 2)
            self.len_code = _read_prefix_code(br, 26)
            self.remaining = self._read_count(br)
        else:
            self.type_code = self.len_code = None
            self.remaining = 1 << 62  # one implicit block covers everything

    def _read_count(self, br: _Bits) -> int:
        first, nbits = BLOCK_LEN_RANGES[_read_symbol(br, self.len_code)]
        return first + br.read(nbits)

    def switch(self, br: _Bits) -> None:
        sym = _read_symbol(br, self.type_code)
        if sym == 0:
            t = self.prev
        elif sym == 1:
            t = (self.btype + 1) % self.ntypes
        else:
            t = sym - 2
        self.prev = self.btype
        self.btype = t
        self.remaining = self._read_count(br)


def _ferment(buf: bytearray, start: int, all_chars: bool) -> None:
    """RFC 7932 §8 'uppercase' transform over UTF-8-ish bytes in place."""
    i = start
    end = len(buf)
    while i < end:
        c = buf[i]
        if c < 192:
            if 97 <= c <= 122:
                buf[i] ^= 32
            i += 1
        elif c < 224:
            if i + 1 < end:
                buf[i + 1] ^= 32
            i += 2
        else:
            if i + 2 < end:
                buf[i + 2] ^= 5
            i += 3
        if not all_chars:
            break


def _dict_word(copy_len: int, word_id: int) -> bytes:
    """§8: static dictionary word + transform for a given copy length and
    distance-derived word id."""
    bits = SIZE_BITS_BY_LENGTH[copy_len] if copy_len < 25 else 0
    if copy_len > 24 or bits == 0:
        raise ValueError("brotli: invalid dictionary reference length")
    index = word_id & ((1 << bits) - 1)
    transform_id = word_id >> bits
    if transform_id >= len(TRANSFORMS):
        raise ValueError("brotli: invalid dictionary transform")
    off = OFFSETS_BY_LENGTH[copy_len] + index * copy_len
    word = DICTIONARY[off:off + copy_len]
    prefix, typ, suffix = TRANSFORMS[transform_id]
    if typ == 0:
        mid = word
    elif 1 <= typ <= 9:  # omit last N
        mid = word[:-typ] if typ < copy_len else b""
    elif 12 <= typ <= 20:  # omit first N
        mid = word[typ - 11:]
    elif typ in (10, 11):
        mid = word
    else:
        raise ValueError("brotli: unknown transform type")
    out = bytearray(prefix)
    mstart = len(out)
    out += mid
    if typ in (10, 11):
        _ferment(out, mstart, typ == 11)
    out += suffix
    return bytes(out)


def _window_bits(br: _Bits) -> int:
    """§9.1 WBITS variable-length code."""
    if br.read(1) == 0:
        return 16
    n = br.read(3)
    if n != 0:
        return 17 + n
    n = br.read(3)
    if n == 1:
        raise ValueError("brotli: reserved WBITS code")
    if n != 0:
        return 8 + n
    return 17


def decode_brotli(data: bytes, max_output: int | None = None) -> bytes:
    """Decode a complete brotli stream; raises ValueError on any format
    violation (truncation, bad codes, padding, trailing garbage).

    ``max_output`` bounds the decompressed size (zip-bomb guard for crawl
    payloads — a format-valid stream can expand ~1e6:1)."""
    br = _Bits(bytes(data))
    wbits = _window_bits(br)
    window = (1 << wbits) - 16
    out = bytearray()
    # distance ring, most recent first: the spec's initial ring contents
    # are {16, 15, 11, 4} with the write index at 0, so in recency order
    # ("last", "second-last", ...) the initial values are 4, 11, 15, 16
    dring = [4, 11, 15, 16]

    while True:
        islast = br.read(1)
        if islast and br.read(1):  # ISLASTEMPTY
            break
        mnibbles = br.read(2)
        if mnibbles == 3:  # metadata (§9.2)
            if islast:
                raise ValueError("brotli: metadata block marked last")
            if br.read(1):
                raise ValueError("brotli: reserved metadata bit set")
            skip_bytes = br.read(2)
            skip = 0
            for i in range(skip_bytes):
                b = br.read(8)
                if i == skip_bytes - 1 and skip_bytes and b == 0:
                    raise ValueError("brotli: zero-padded metadata length")
                skip |= b << (8 * i)
            if skip_bytes:
                skip += 1
            br.align_byte()
            if br.pos + skip * 8 > br.nbits:
                raise ValueError("brotli: metadata overruns stream")
            br.pos += skip * 8
            continue
        mlen = 0
        for i in range(4 + mnibbles):
            nib = br.read(4)
            if i == 3 + mnibbles and mnibbles and nib == 0:
                raise ValueError("brotli: zero-padded MLEN nibble")
            mlen |= nib << (4 * i)
        mlen += 1
        if max_output is not None and len(out) + mlen > max_output:
            raise ValueError("brotli: output exceeds max_output")

        if not islast and br.read(1):  # ISUNCOMPRESSED
            br.align_byte()
            if br.pos + mlen * 8 > br.nbits:
                raise ValueError("brotli: uncompressed block truncated")
            start = br.pos >> 3
            out += br.data[start:start + mlen]
            br.pos += mlen * 8
            continue

        # ---- compressed metablock header (§9.2) ----
        blocks_l = _BlockState(br)
        blocks_i = _BlockState(br)
        blocks_d = _BlockState(br)
        npostfix = br.read(2)
        ndirect = br.read(4) << npostfix
        postfix_mask = (1 << npostfix) - 1
        context_modes = [br.read(2) << 9 for _ in range(blocks_l.ntypes)]
        ntrees_l = _read_varlen_256(br)
        cmap_l = _read_context_map(br, 64 * blocks_l.ntypes, ntrees_l)
        ntrees_d = _read_varlen_256(br)
        cmap_d = _read_context_map(br, 4 * blocks_d.ntypes, ntrees_d)
        lit_codes = [_read_prefix_code(br, 256) for _ in range(ntrees_l)]
        iac_codes = [_read_prefix_code(br, 704)
                     for _ in range(blocks_i.ntypes)]
        dist_alphabet = 16 + ndirect + (48 << npostfix)
        dist_codes = [_read_prefix_code(br, dist_alphabet)
                      for _ in range(ntrees_d)]

        produced = 0
        while produced < mlen:
            if blocks_i.remaining == 0:
                blocks_i.switch(br)
            blocks_i.remaining -= 1
            sym = _read_symbol(br, iac_codes[blocks_i.btype])
            cell = sym >> 6
            implied_dist0 = cell < 2
            if not implied_dist0:
                cell -= 2
            ins_code = _INSERT_CELL[cell] + ((sym >> 3) & 7)
            cp_code = _COPY_CELL[cell] + (sym & 7)
            ilen = _INSERT_BASE[ins_code] + br.read(_INSERT_EXTRA[ins_code])
            clen = _COPY_BASE[cp_code] + br.read(_COPY_EXTRA[cp_code])

            # ---- insert part: ilen context-modeled literals ----
            if ilen:
                if produced + ilen > mlen:
                    raise ValueError("brotli: insert overruns metablock")
                p1 = out[-1] if out else 0
                p2 = out[-2] if len(out) > 1 else 0
                mode = context_modes[blocks_l.btype]
                cmap_base = blocks_l.btype << 6
                for _ in range(ilen):
                    if blocks_l.remaining == 0:
                        blocks_l.switch(br)
                        mode = context_modes[blocks_l.btype]
                        cmap_base = blocks_l.btype << 6
                    blocks_l.remaining -= 1
                    ctx = (CONTEXT_LUT[mode + p1]
                           | CONTEXT_LUT[mode + 256 + p2])
                    b = _read_symbol(br, lit_codes[cmap_l[cmap_base + ctx]])
                    out.append(b)
                    p2 = p1
                    p1 = b
                produced += ilen
            if produced == mlen:
                break  # copy part of the last command is ignored

            # ---- distance ----
            max_distance = min(len(out), window)
            if implied_dist0:
                distance = dring[0]
                dcode_is_zero = True
            else:
                if blocks_d.remaining == 0:
                    blocks_d.switch(br)
                blocks_d.remaining -= 1
                dctx = clen - 2 if clen <= 4 else 3
                dsym = _read_symbol(
                    br, dist_codes[cmap_d[(blocks_d.btype << 2) + dctx]])
                dcode_is_zero = dsym == 0
                if dsym < 16:
                    idx, delta = _SHORT_DIST[dsym]
                    distance = dring[idx] + delta
                    if distance <= 0:
                        raise ValueError("brotli: non-positive distance")
                elif dsym < 16 + ndirect:
                    distance = dsym - 16 + 1
                else:
                    rest = dsym - ndirect - 16
                    ndistbits = 1 + (rest >> (npostfix + 1))
                    hcode = rest >> npostfix
                    lcode = rest & postfix_mask
                    offset = ((2 + (hcode & 1)) << ndistbits) - 4
                    distance = (((offset + br.read(ndistbits)) << npostfix)
                                + lcode + ndirect + 1)

            if distance > max_distance:
                # ---- static dictionary reference (§8) ----
                word = _dict_word(clen, distance - max_distance - 1)
                if produced + len(word) > mlen:
                    raise ValueError("brotli: dictionary word overruns "
                                     "metablock")
                out += word
                produced += len(word)
            else:
                if produced + clen > mlen:
                    raise ValueError("brotli: copy overruns metablock")
                pos = len(out) - distance
                if distance >= clen:
                    out += out[pos:pos + clen]
                else:  # overlapping copy, LZ77 semantics
                    for _ in range(clen):
                        out.append(out[pos])
                        pos += 1
                produced += clen
                if not dcode_is_zero:
                    dring.insert(0, distance)
                    dring.pop()
        if islast:
            break

    br.align_byte()
    if br.pos != br.nbits:
        raise ValueError("brotli: trailing garbage after final metablock")
    return bytes(out)


# --------------------------------------------------------------------------
# minimal valid encoder: uncompressed metablocks only (fixture path — a
# driver oracle can round-trip through the pure decoder with no libraries)
# --------------------------------------------------------------------------

def encode_brotli_uncompressed(data: bytes) -> bytes:
    """A valid RFC 7932 stream that stores ``data`` uncompressed: WBITS=16,
    a chain of ISUNCOMPRESSED metablocks (≤ 65536 bytes each, MNIBBLES=4),
    then an empty ISLAST metablock."""
    bits = []  # (value, nbits), LSB-first

    def put(v: int, n: int) -> None:
        bits.append((v, n))

    out = bytearray()
    acc = 0
    nacc = 0

    def flush_byte_boundary() -> None:
        nonlocal acc, nacc
        for v, n in bits:
            acc |= v << nacc
            nacc += n
        bits.clear()
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    put(0, 1)  # WBITS = 16
    view = memoryview(data)
    for i in range(0, len(data), 65536):
        chunk = view[i:i + 65536]
        put(0, 1)                      # ISLAST = 0
        put(0, 2)                      # MNIBBLES code 0 → 4 nibbles
        put(len(chunk) - 1, 16)        # MLEN - 1
        put(1, 1)                      # ISUNCOMPRESSED
        flush_byte_boundary()
        if nacc:                       # align with zero padding
            out.append(acc & 0xFF)
            acc = 0
            nacc = 0
        out += chunk
    put(1, 1)  # ISLAST
    put(1, 1)  # ISLASTEMPTY
    flush_byte_boundary()
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


# --------------------------------------------------------------------------
# native seam: system libbrotli via ctypes (scale path, A/B'd in tests)
# --------------------------------------------------------------------------

_BROTLI_LIB = "/lib/x86_64-linux-gnu/libbrotlidec.so.1"
_BROTLI_ENC_LIB = "/lib/x86_64-linux-gnu/libbrotlienc.so.1"


def encode_brotli_native(data: bytes, quality: int = 5, lgwin: int = 22,
                         mode: int = 0) -> bytes:
    """Compress via the system libbrotlienc — the independent-encoder
    fixture path for A/B tests and oracles (this repo ships no compressing
    brotli encoder of its own beyond the uncompressed-metablock one)."""
    import ctypes

    try:
        lib = ctypes.CDLL(_BROTLI_ENC_LIB)
    except OSError as e:  # pragma: no cover - lib present in this image
        raise ValueError(f"libbrotlienc unavailable: {e}") from e
    lib.BrotliEncoderCompress.restype = ctypes.c_int
    lib.BrotliEncoderCompress.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p]
    n = ctypes.c_size_t(len(data) + (len(data) >> 1) + 1024)
    buf = ctypes.create_string_buffer(n.value)
    if not lib.BrotliEncoderCompress(quality, lgwin, mode, len(data),
                                     data, ctypes.byref(n), buf):
        raise ValueError("libbrotlienc: compression failed")
    return buf.raw[:n.value]


_NATIVE_DEC_LIB = None


def _load_brotli_dec():
    """One-time ctypes load + prototype setup per process (the hot WARC
    path decodes one payload per record — re-running CDLL + argtype
    assignment per payload is avoidable overhead)."""
    global _NATIVE_DEC_LIB
    if _NATIVE_DEC_LIB is None:
        import ctypes

        lib = ctypes.CDLL(_BROTLI_LIB)
        lib.BrotliDecoderCreateInstance.restype = ctypes.c_void_p
        lib.BrotliDecoderCreateInstance.argtypes = [ctypes.c_void_p] * 3
        lib.BrotliDecoderDecompressStream.restype = ctypes.c_int
        lib.BrotliDecoderDecompressStream.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
            ctypes.POINTER(ctypes.c_size_t),
        ]
        _NATIVE_DEC_LIB = lib
    return _NATIVE_DEC_LIB


def decode_brotli_native(data: bytes, max_output: int | None = None) -> bytes:
    """Decode via the system libbrotlidec (streaming API). Raises
    ValueError on malformed input or when the library is unavailable —
    callers that need an always-available path use decode_brotli."""
    import ctypes

    try:
        lib = _load_brotli_dec()
    except OSError as e:  # pragma: no cover - lib present in this image
        raise ValueError(f"libbrotlidec unavailable: {e}") from e
    st = lib.BrotliDecoderCreateInstance(None, None, None)
    if not st:
        raise ValueError("libbrotlidec: instance creation failed")
    try:
        inbuf = (ctypes.c_ubyte * max(1, len(data))).from_buffer_copy(
            data or b"\x00")
        next_in = ctypes.cast(inbuf, ctypes.POINTER(ctypes.c_ubyte))
        avail_in = ctypes.c_size_t(len(data))
        chunks = []
        total = 0
        while True:
            outbuf = (ctypes.c_ubyte * 65536)()
            next_out = ctypes.cast(outbuf, ctypes.POINTER(ctypes.c_ubyte))
            avail_out = ctypes.c_size_t(len(outbuf))
            res = lib.BrotliDecoderDecompressStream(
                st, ctypes.byref(avail_in), ctypes.byref(next_in),
                ctypes.byref(avail_out), ctypes.byref(next_out), None)
            produced = len(outbuf) - avail_out.value
            if produced:
                chunks.append(bytes(outbuf[:produced]))
                total += produced
                if max_output is not None and total > max_output:
                    raise ValueError("brotli: output exceeds max_output")
            if res == 1:  # SUCCESS
                if avail_in.value:
                    raise ValueError(
                        "brotli: trailing garbage after final metablock")
                return b"".join(chunks)
            if res == 3:  # NEEDS_MORE_OUTPUT
                continue
            if res == 2:  # NEEDS_MORE_INPUT -> truncated stream
                raise ValueError("brotli: bitstream truncated")
            raise ValueError("brotli: malformed stream (native)")
    finally:
        lib.BrotliDecoderDestroyInstance(ctypes.c_void_p(st))
