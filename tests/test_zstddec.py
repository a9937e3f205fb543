"""Zstandard decoder (functions/zstddec.py) — RFC 8878 conformance.

Oracle = the system libzstd: fixtures compressed by libzstd at every level
and parameter combination must decode byte-identically; truncations must be
rejected by both; on bit corruptions the pure decoder may only be STRICTER
(libzstd skips Huffman-stream consumption checks and accepts some corrupt
literal sections, emitting garbage — verified during development), never
looser: whatever the pure decoder accepts, libzstd accepts with identical
output.
"""

from __future__ import annotations

import ctypes
import os
import random

import pytest

from graphrag_mrkr_2_spark.functions.zstddec import decode_zstd, xxh64

_LIB = "/lib/x86_64-linux-gnu/libzstd.so.1"
needs_lib = pytest.mark.skipif(not os.path.exists(_LIB),
                               reason="libzstd not present")

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _corpora() -> list[bytes]:
    rng = random.Random(7)
    return [
        b"",
        b"a",
        b"hello world",
        b"The quick brown fox jumps over the lazy dog. " * 200,
        bytes(rng.randrange(256) for _ in range(5000)),
        b"\x00" * 10000,
        "Καλημέρα κόσμε — 你好世界\n".encode() * 400,
        open(os.path.join(_REPO, "SURVEY.md"), "rb").read()[:50000],
    ]


def _compress2(data: bytes, level: int = 3, checksum: int = 0,
               content_size: int = 1) -> bytes:
    lib = ctypes.CDLL(_LIB)
    lib.ZSTD_createCCtx.restype = ctypes.c_void_p
    lib.ZSTD_CCtx_setParameter.restype = ctypes.c_size_t
    lib.ZSTD_CCtx_setParameter.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                           ctypes.c_int]
    lib.ZSTD_compress2.restype = ctypes.c_size_t
    lib.ZSTD_compress2.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                   ctypes.c_size_t, ctypes.c_char_p,
                                   ctypes.c_size_t]
    lib.ZSTD_compressBound.restype = ctypes.c_size_t
    lib.ZSTD_isError.restype = ctypes.c_uint
    lib.ZSTD_isError.argtypes = [ctypes.c_size_t]
    lib.ZSTD_freeCCtx.argtypes = [ctypes.c_void_p]
    c = lib.ZSTD_createCCtx()
    lib.ZSTD_CCtx_setParameter(c, 100, level)        # compressionLevel
    lib.ZSTD_CCtx_setParameter(c, 201, checksum)     # checksumFlag
    lib.ZSTD_CCtx_setParameter(c, 200, content_size)  # contentSizeFlag
    bound = lib.ZSTD_compressBound(len(data))
    dst = ctypes.create_string_buffer(bound)
    n = lib.ZSTD_compress2(c, dst, bound, data, len(data))
    assert not lib.ZSTD_isError(n)
    lib.ZSTD_freeCCtx(c)
    return dst.raw[:n]


@needs_lib
class TestAgainstSystemZstd:
    def test_roundtrip_levels_and_flags(self):
        # levels pick distinct encoder strategies (fast/dfast/greedy/
        # lazy2/btopt/btultra2); content_size=0 forces the streaming-style
        # header (window descriptor, no FCS); checksum exercises XXH64
        for t in _corpora():
            for lvl in (1, 3, 6, 12, 19, 22):
                for ck in (0, 1):
                    for cs in (0, 1):
                        blob = _compress2(t, lvl, ck, cs)
                        assert decode_zstd(blob) == t, (len(t), lvl, ck, cs)

    def test_multiblock_with_table_repeats(self):
        # >128 KiB forces multiple blocks: treeless literal repeats and
        # repeat FSE tables carry across block boundaries
        big = (" ".join(f"tok{i % 571}" for i in range(120000))).encode()
        for lvl in (1, 3, 19):
            assert decode_zstd(_compress2(big, lvl, checksum=1)) == big

    def test_concatenated_frames_and_skippable(self):
        a, b = b"first frame " * 100, b"second frame " * 100
        skip = ((0x184D2A50).to_bytes(4, "little")
                + (5).to_bytes(4, "little") + b"metaX")
        blob = skip + _compress2(a, 3, 1) + skip + _compress2(b, 19, 1)
        assert decode_zstd(blob) == a + b

    def test_truncation_rejected_by_both(self):
        from graphrag_mrkr_2_spark.functions.httppayload import (
            decode_zstd_native,
        )

        rng = random.Random(1)
        stream = _compress2(
            open(os.path.join(_REPO, "SURVEY.md"), "rb").read()[:30000], 9)
        for cut in sorted(rng.sample(range(1, len(stream)), 40)):
            with pytest.raises(ValueError):
                decode_zstd(stream[:cut])
            with pytest.raises(ValueError):
                decode_zstd_native(stream[:cut])

    def test_bit_corruption_pure_only_stricter(self):
        """Pure may reject what libzstd sloppily accepts (libzstd skips
        Huffman-consumption checks) but must NEVER accept what libzstd
        rejects, and must match its output whenever both accept."""
        from graphrag_mrkr_2_spark.functions.httppayload import (
            decode_zstd_native,
        )

        rng = random.Random(2)
        stream = _compress2(
            open(os.path.join(_REPO, "SURVEY.md"), "rb").read()[:30000], 9)
        for _ in range(150):
            b = bytearray(stream)
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            try:
                pv = decode_zstd(bytes(b), max_output=10_000_000)
            except ValueError:
                pv = None
            try:
                nv = decode_zstd_native(bytes(b), max_output=10_000_000)
            except ValueError:
                nv = None
            if pv is not None:
                assert nv is not None and pv == nv

    def test_checksum_detects_tamper(self):
        blob = bytearray(_compress2(b"checksummed payload " * 50, 3,
                                    checksum=1))
        # flip a bit in the stored checksum (last 4 bytes)
        blob[-2] ^= 1
        with pytest.raises(ValueError, match="checksum"):
            decode_zstd(bytes(blob))


class TestPureOnly:
    def test_bad_magic(self):
        with pytest.raises(ValueError):
            decode_zstd(b"\x00\x01\x02\x03\x04\x05")

    def test_dictionary_id_rejected(self):
        # frame header declaring a 1-byte dictionary id of 7
        hdr = (0xFD2FB528).to_bytes(4, "little") + bytes([0x01, 0x00, 7])
        with pytest.raises(ValueError, match="dictionary"):
            decode_zstd(hdr + b"\x01\x00\x00")

    def test_max_output_guard(self):
        blob = None
        if os.path.exists(_LIB):
            blob = _compress2(b"x" * 100_000, 3)
            assert len(decode_zstd(blob, max_output=100_000)) == 100_000
            with pytest.raises(ValueError):
                decode_zstd(blob, max_output=99_999)
        # raw-block path needs no library: hand-build a tiny frame
        frame = ((0xFD2FB528).to_bytes(4, "little")
                 + bytes([0x20, 4])          # single-segment, FCS=4
                 + (4 * 8 + 1).to_bytes(3, "little") + b"abcd")
        assert decode_zstd(frame) == b"abcd"
        with pytest.raises(ValueError):
            decode_zstd(frame, max_output=3)

    def test_rle_block(self):
        # single-segment frame: one RLE block of 10 x 'z'
        frame = ((0xFD2FB528).to_bytes(4, "little")
                 + bytes([0x20, 10])
                 + ((10 << 3) | (1 << 1) | 1).to_bytes(3, "little") + b"z")
        assert decode_zstd(frame) == b"z" * 10

    def test_block_maximum_size_bomb_guard(self):
        """Review r7 repro: a hand-crafted ~25-byte frame whose one
        sequence expands to 65 KiB against a 1 KiB window must trip the
        Block_Maximum_Size check promptly (it used to expand unbounded
        before the max_output check between blocks)."""
        block = bytes([
            0x51, 0x41,        # RLE literals, regen 10, byte 'A'
            0x01,              # one sequence
            0x54,              # LL/OF/ML all RLE mode
            10, 0, 52,         # LL sym 10 (ll=10), OF sym 0, ML sym 52
            0x00, 0x00, 0x01,  # backward bitstream: 16 ml-extra bits + sentinel
        ])
        frame = ((0xFD2FB528).to_bytes(4, "little")
                 + bytes([0x00, 0x00])  # window descriptor: 1 KiB window
                 + ((len(block) << 3) | (2 << 1) | 1).to_bytes(3, "little")
                 + block)
        with pytest.raises(ValueError, match="Block_Maximum_Size"):
            decode_zstd(frame)
        if os.path.exists(_LIB):  # libzstd rejects it too (never looser)
            from graphrag_mrkr_2_spark.functions.httppayload import (
                decode_zstd_native,
            )

            with pytest.raises(ValueError):
                decode_zstd_native(frame)

    def test_hostile_headers_raise_valueerror_not_indexerror(self):
        """Review r7 repros: truncated literal headers escaped as
        IndexError, breaking the loader's ValueError-only quarantine."""
        # zero-size compressed block
        f1 = bytes.fromhex("28b52ffd0000050000")
        # compressed block of 1 byte: raw literals with size_format 1
        f2 = ((0xFD2FB528).to_bytes(4, "little") + bytes([0x00, 0x00])
              + ((1 << 3) | (2 << 1) | 1).to_bytes(3, "little")
              + bytes([0x04]))
        for f in (f1, f2):
            with pytest.raises(ValueError):
                decode_zstd(f)

    def test_fuzz_never_crashes(self):
        rng = random.Random(3)
        magic = (0xFD2FB528).to_bytes(4, "little")
        for _ in range(500):
            blob = magic + bytes(rng.randrange(256)
                                 for _ in range(rng.randrange(1, 120)))
            try:
                decode_zstd(blob, max_output=1 << 20)
            except ValueError:
                pass


class TestXxh64:
    def test_known_vectors(self):
        # reference vectors from the published XXH64 test suite
        assert xxh64(b"") == 0xEF46DB3751D8E999
        assert xxh64(b"", seed=1) == 0xD5AFBA1336A3BE4B
        # cross-checked against libzstd's frame checksums in
        # test_checksum_detects_tamper / roundtrip tests; plus length
        # regimes: <4, 4-7, 8-31, >=32 bytes
        for blob in (b"a", b"abcd", b"abcdefgh" * 3, b"x" * 100):
            h = xxh64(blob)
            assert 0 <= h < (1 << 64)

    @needs_lib
    def test_against_libzstd_xxh64(self):
        lib = ctypes.CDLL(_LIB)
        if not hasattr(lib, "ZSTD_XXH64"):
            pytest.skip("libzstd does not export ZSTD_XXH64")
        lib.ZSTD_XXH64.restype = ctypes.c_uint64
        lib.ZSTD_XXH64.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                   ctypes.c_uint64]
        rng = random.Random(4)
        for n in (0, 1, 3, 4, 7, 8, 31, 32, 33, 100, 1000, 31337):
            blob = bytes(rng.randrange(256) for _ in range(n))
            for seed in (0, 1, 0xDEADBEEF):
                assert xxh64(blob, seed) == lib.ZSTD_XXH64(blob, n, seed), n
