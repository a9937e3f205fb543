"""Brotli decoder (functions/brotlidec.py) — RFC 7932 conformance.

The oracle is the system brotli itself: fixtures are compressed by
libbrotlienc (an encoder this repo does not reimplement), the pure decoder
must reproduce libbrotlidec's output byte-for-byte, agree with it on every
truncation point and on accept/reject for bit corruptions, and the constant
tables in _brotlitables.py must equal a fresh extraction from
libbrotlicommon. The reference (danve93/graphrag-mrkr-2) has no compression
layer at all — this backs the webtext Content-Encoding path.
"""

from __future__ import annotations

import os
import random

import pytest

from graphrag_mrkr_2_spark.functions import _brotlitables as T
from graphrag_mrkr_2_spark.functions.brotlidec import (
    _dict_word,
    decode_brotli,
    decode_brotli_native,
    encode_brotli_native,
    encode_brotli_uncompressed,
)

_LIB = "/lib/x86_64-linux-gnu/libbrotlienc.so.1"
needs_lib = pytest.mark.skipif(not os.path.exists(_LIB),
                               reason="system brotli not present")

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _corpora() -> list[bytes]:
    rng = random.Random(7)
    return [
        b"",
        b"a",
        b"hello world",
        b"The quick brown fox jumps over the lazy dog. " * 200,
        bytes(rng.randrange(256) for _ in range(5000)),   # incompressible
        b"\x00" * 10000,                                  # degenerate runs
        ("<html><body>" + "word common data time life back. " * 500
         + "</body></html>").encode(),
        "Καλημέρα κόσμε — 你好世界 — مرحبا بالعالم\n".encode() * 300,
        open(os.path.join(_REPO, "SURVEY.md"), "rb").read()[:50000],
    ]


@needs_lib
class TestAgainstSystemBrotli:
    def test_tables_match_fresh_extraction(self):
        import sys
        sys.path.insert(0, os.path.join(_REPO, "scripts"))
        from extract_brotli_tables import extract

        fresh = extract()
        assert fresh["dictionary"] == T.DICTIONARY
        assert fresh["size_bits_by_length"] == T.SIZE_BITS_BY_LENGTH
        assert fresh["offsets_by_length"] == T.OFFSETS_BY_LENGTH
        assert fresh["transforms"] == [tuple(t) for t in T.TRANSFORMS]
        assert fresh["context_lut"] == T.CONTEXT_LUT
        assert fresh["block_len_ranges"] == [tuple(r)
                                             for r in T.BLOCK_LEN_RANGES]

    def test_roundtrip_all_qualities_windows_modes(self):
        # qualities pick distinct encoder paths (q0/q1 fast two-pass, q2-9
        # hash chains, q10/q11 zopflification + static dictionary); small
        # windows force dictionary references, mode 1 is TEXT
        for t in _corpora():
            for q in (0, 1, 2, 5, 9, 11):
                for w in (10, 18, 24):
                    for mode in (0, 1):
                        c = encode_brotli_native(t, q, w, mode)
                        assert decode_brotli_native(c) == t
                        assert decode_brotli(c) == t, (len(t), q, w, mode)

    def test_dictionary_transforms_all_121(self):
        """_dict_word vs BrotliTransformDictionaryWord for every transform
        over several word lengths/indices."""
        import ctypes

        c = ctypes.CDLL("/lib/x86_64-linux-gnu/libbrotlicommon.so.1")
        c.BrotliGetTransforms.restype = ctypes.c_void_p
        trs = c.BrotliGetTransforms()
        c.BrotliTransformDictionaryWord.restype = ctypes.c_int
        c.BrotliTransformDictionaryWord.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int]
        for length in (4, 5, 8, 13, 19, 24):
            bits = T.SIZE_BITS_BY_LENGTH[length]
            for idx in (0, 1, (1 << bits) - 1):
                off = T.OFFSETS_BY_LENGTH[length] + idx * length
                word = T.DICTIONARY[off:off + length]
                for t in range(len(T.TRANSFORMS)):
                    dst = ctypes.create_string_buffer(length + 32)
                    n = c.BrotliTransformDictionaryWord(
                        dst, word, length, trs, t)
                    assert _dict_word(length, (t << bits) | idx) == \
                        dst.raw[:n], (length, idx, t)

    def test_truncation_agreement(self):
        """Every proper prefix must be rejected by BOTH decoders."""
        rng = random.Random(1)
        stream = encode_brotli_native(
            open(os.path.join(_REPO, "SURVEY.md"), "rb").read()[:20000],
            9, 22)
        cuts = sorted(rng.sample(range(1, len(stream)), 40))
        cuts += [len(stream) - 1]
        for cut in cuts:
            with pytest.raises(ValueError):
                decode_brotli(stream[:cut])
            with pytest.raises(ValueError):
                decode_brotli_native(stream[:cut])

    def test_bit_corruption_agreement(self):
        """Single-bit flips: pure and native must agree on accept/reject,
        and produce identical bytes when both accept."""
        rng = random.Random(2)
        stream = encode_brotli_native(
            open(os.path.join(_REPO, "SURVEY.md"), "rb").read()[:20000],
            9, 22)
        for _ in range(150):
            b = bytearray(stream)
            i = rng.randrange(len(b))
            b[i] ^= 1 << rng.randrange(8)
            try:
                pv = decode_brotli(bytes(b), max_output=10_000_000)
            except ValueError:
                pv = None
            try:
                nv = decode_brotli_native(bytes(b), max_output=10_000_000)
            except ValueError:
                nv = None
            assert (pv is None) == (nv is None), i
            if pv is not None:
                assert pv == nv, i

    def test_native_accepts_our_uncompressed_encoder(self):
        for t in _corpora():
            assert decode_brotli_native(encode_brotli_uncompressed(t)) == t


class TestPureDecoder:
    """Cases that need no system library."""

    def test_uncompressed_roundtrip(self):
        for t in _corpora():
            assert decode_brotli(encode_brotli_uncompressed(t)) == t

    def test_uncompressed_multi_metablock(self):
        data = bytes(range(256)) * 1024  # 256 KiB -> four metablocks
        assert decode_brotli(encode_brotli_uncompressed(data)) == data

    def test_empty_input_rejected(self):
        with pytest.raises(ValueError):
            decode_brotli(b"")

    def test_trailing_garbage_rejected(self):
        s = encode_brotli_uncompressed(b"hi")
        with pytest.raises(ValueError):
            decode_brotli(s + b"\x00")

    def test_max_output_guard(self):
        s = encode_brotli_uncompressed(b"x" * 100_000)
        assert len(decode_brotli(s, max_output=100_000)) == 100_000
        with pytest.raises(ValueError):
            decode_brotli(s, max_output=99_999)

    def test_metadata_block_skipped(self):
        # hand-assembled: WBITS=16, one metadata block (2 skip bytes), then
        # an uncompressed block, then ISLAST+ISLASTEMPTY
        payload = b"ok"
        # 304 bytes: the 2-byte little-endian skip length must have a
        # non-zero high byte (zero-padded lengths are a format error)
        meta = b"IGNORED-METADATA" * 19
        bits = []

        def put(v, n):
            bits.append((v, n))

        put(0, 1)            # WBITS 16
        put(0, 1)            # ISLAST = 0
        put(3, 2)            # MNIBBLES code 3 -> metadata block
        put(0, 1)            # reserved
        put(2, 2)            # MSKIPBYTES = 2
        put(len(meta) - 1, 16)  # MSKIPLEN - 1, little-endian bytes
        out = bytearray()
        acc = nacc = 0
        for v, n in bits:
            acc |= v << nacc
            nacc += n
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8
        if nacc:
            out.append(acc & 0xFF)  # zero padding to byte boundary
        out += meta
        # remainder of the stream is byte-aligned: reuse the uncompressed
        # encoder minus its WBITS bit by re-assembling manually
        bits = [(0, 1), (0, 2), (len(payload) - 1, 16), (1, 1)]
        acc = nacc = 0
        for v, n in bits:
            acc |= v << nacc
            nacc += n
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8
        if nacc:
            out.append(acc & 0xFF)
        out += payload
        out.append(0x03)  # ISLAST, ISLASTEMPTY
        assert decode_brotli(bytes(out)) == payload

    def test_nonzero_padding_rejected(self):
        s = bytearray(encode_brotli_uncompressed(b"hi"))
        # final byte carries ISLAST+ISLASTEMPTY in its low 2 bits; the rest
        # is padding that must be zero
        s[-1] |= 0x80
        with pytest.raises(ValueError):
            decode_brotli(bytes(s))

    def test_metadata_cannot_be_last(self):
        # ISLAST=1 followed by ISLASTEMPTY=0 + MNIBBLES=3 is a format error
        with pytest.raises(ValueError):
            decode_brotli(bytes([0b0_11_0_1_0 | 0]))  # crafted low bits

    def test_fuzz_never_crashes(self):
        """Random garbage must raise ValueError, never anything else."""
        rng = random.Random(3)
        for _ in range(500):
            blob = bytes(rng.randrange(256)
                         for _ in range(rng.randrange(1, 200)))
            try:
                decode_brotli(blob, max_output=1 << 20)
            except ValueError:
                pass
