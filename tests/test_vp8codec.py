"""Lossy WEBP (VP8) codec — libwebp ctypes conformance + crafted streams.

The reference ingests .webp image documents via PIL
(ingestion/document_processor.py:680, ingestion/converters.py:50); the repo
decodes lossy VP8 keyframes with the pure-stdlib implementation in
functions/vp8codec.py. Conformance pins the decoded Y/U/V planes AND the
fancy-upsampled RGB bit-exact against the system libwebp across content
types, sizes, quality levels and encoder config knobs (simple filter,
sharpness, multi-partition, segments), the same
independent-implementation-oracle standard the TIFF/JPEG/VP8L codecs use.

Because libwebp's encoder never emits the ``mb_no_coeff_skip`` feature, the
skip path is exercised with a hand-built bitstream (boolean ENCODER below):
both libwebp and our decoder must produce identical pixels from it.
"""

from __future__ import annotations

import ctypes
import struct

import numpy as np
import pytest

from graphrag_mrkr_2_spark.functions.vp8codec import (
    decode_vp8,
    decode_vp8_frame,
    yuv420_to_rgb,
)
from graphrag_mrkr_2_spark.functions.webpcodec import decode_webp, webp_dimensions


def _rng(seed=77):
    return np.random.RandomState(seed)


def _smooth(h, w, seed=0):
    r = np.random.RandomState(seed)
    base = r.randint(0, 256, (h // 8 + 2, w // 8 + 2, 3)).astype(np.float32)
    ys = np.arange(h) / 8.0
    xs = np.arange(w) / 8.0
    y0 = ys.astype(int)
    x0 = xs.astype(int)
    dy = (ys - y0)[:, None, None]
    dx = (xs - x0)[None, :, None]
    out = (base[y0][:, x0] * (1 - dy) * (1 - dx) + base[y0 + 1][:, x0] * dy * (1 - dx)
           + base[y0][:, x0 + 1] * (1 - dy) * dx + base[y0 + 1][:, x0 + 1] * dy * dx)
    return np.clip(out, 0, 255).astype(np.uint8)


def _vp8_payload(data: bytes) -> bytes:
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        if fourcc == b"VP8 ":
            return data[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise AssertionError("encoder did not produce a VP8 chunk")


# ---------------------------------------------------------------------------
# ctypes bindings (simple + advanced libwebp APIs)
# ---------------------------------------------------------------------------


class _WebPConfig(ctypes.Structure):
    _fields_ = [("lossless", ctypes.c_int), ("quality", ctypes.c_float),
                ("method", ctypes.c_int), ("image_hint", ctypes.c_int),
                ("target_size", ctypes.c_int), ("target_PSNR", ctypes.c_float),
                ("segments", ctypes.c_int), ("sns_strength", ctypes.c_int),
                ("filter_strength", ctypes.c_int), ("filter_sharpness", ctypes.c_int),
                ("filter_type", ctypes.c_int), ("autofilter", ctypes.c_int),
                ("alpha_compression", ctypes.c_int), ("alpha_filtering", ctypes.c_int),
                ("alpha_quality", ctypes.c_int), ("pass_", ctypes.c_int),
                ("show_compressed", ctypes.c_int), ("preprocessing", ctypes.c_int),
                ("partitions", ctypes.c_int), ("partition_limit", ctypes.c_int),
                ("emulate_jpeg_size", ctypes.c_int), ("thread_level", ctypes.c_int),
                ("low_memory", ctypes.c_int), ("near_lossless", ctypes.c_int),
                ("exact", ctypes.c_int), ("use_delta_palette", ctypes.c_int),
                ("use_sharp_yuv", ctypes.c_int), ("qmin", ctypes.c_int),
                ("qmax", ctypes.c_int)]


class _MemoryWriter(ctypes.Structure):
    _fields_ = [("mem", ctypes.POINTER(ctypes.c_uint8)), ("size", ctypes.c_size_t),
                ("max_size", ctypes.c_size_t), ("pad", ctypes.c_uint32 * 1)]


class _WebPPicture(ctypes.Structure):
    _fields_ = [("use_argb", ctypes.c_int), ("colorspace", ctypes.c_int),
                ("width", ctypes.c_int), ("height", ctypes.c_int),
                ("y", ctypes.POINTER(ctypes.c_uint8)), ("u", ctypes.POINTER(ctypes.c_uint8)),
                ("v", ctypes.POINTER(ctypes.c_uint8)),
                ("y_stride", ctypes.c_int), ("uv_stride", ctypes.c_int),
                ("a", ctypes.POINTER(ctypes.c_uint8)), ("a_stride", ctypes.c_int),
                ("pad1", ctypes.c_uint32 * 2),
                ("argb", ctypes.POINTER(ctypes.c_uint32)), ("argb_stride", ctypes.c_int),
                ("pad2", ctypes.c_uint32 * 3),
                ("writer", ctypes.c_void_p), ("custom_ptr", ctypes.c_void_p),
                ("extra_info_type", ctypes.c_int),
                ("extra_info", ctypes.POINTER(ctypes.c_uint8)),
                ("stats", ctypes.c_void_p), ("error_code", ctypes.c_int),
                ("progress_hook", ctypes.c_void_p), ("user_data", ctypes.c_void_p),
                ("pad3", ctypes.c_uint32 * 3),
                ("pad4", ctypes.POINTER(ctypes.c_uint8)),
                ("pad5", ctypes.POINTER(ctypes.c_uint8)),
                ("pad6", ctypes.c_uint32 * 8), ("memory_", ctypes.c_void_p),
                ("memory_argb_", ctypes.c_void_p), ("pad7", ctypes.c_void_p * 2)]


class _Lib:
    """Lazy libwebp handle; every accessor skips the test if unavailable."""

    def __init__(self):
        try:
            lib = ctypes.CDLL("libwebp.so.7")
        except OSError:
            pytest.skip("libwebp shared library not present")
        lib.WebPEncodeRGB.restype = ctypes.c_size_t
        lib.WebPEncodeRGB.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
        lib.WebPDecodeRGB.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.WebPDecodeRGB.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.WebPDecodeRGBA.argtypes = lib.WebPDecodeRGB.argtypes
        lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.WebPDecodeYUV.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.WebPFree.argtypes = [ctypes.c_void_p]
        self.lib = lib
        self._enc_abi = None

    # -- simple API --------------------------------------------------------
    def encode(self, rgb: np.ndarray, q: float) -> bytes:
        h, w, _ = rgb.shape
        out = ctypes.POINTER(ctypes.c_uint8)()
        n = self.lib.WebPEncodeRGB(np.ascontiguousarray(rgb).tobytes(), w, h,
                                   w * 3, float(q), ctypes.byref(out))
        assert n > 0
        data = ctypes.string_at(out, n)
        self.lib.WebPFree(out)
        return data

    def decode_rgb(self, data: bytes, channels=3) -> np.ndarray:
        w, h = ctypes.c_int(), ctypes.c_int()
        fn = self.lib.WebPDecodeRGB if channels == 3 else self.lib.WebPDecodeRGBA
        p = fn(data, len(data), ctypes.byref(w), ctypes.byref(h))
        assert p, "libwebp rejected the stream"
        out = np.frombuffer(ctypes.string_at(p, w.value * h.value * channels),
                            np.uint8).reshape(h.value, w.value, channels).copy()
        self.lib.WebPFree(p)
        return out

    def decode_yuv(self, data: bytes):
        w, h = ctypes.c_int(), ctypes.c_int()
        u = ctypes.POINTER(ctypes.c_uint8)()
        v = ctypes.POINTER(ctypes.c_uint8)()
        st, uvst = ctypes.c_int(), ctypes.c_int()
        y = self.lib.WebPDecodeYUV(data, len(data), ctypes.byref(w),
                                   ctypes.byref(h), ctypes.byref(u),
                                   ctypes.byref(v), ctypes.byref(st),
                                   ctypes.byref(uvst))
        assert y, "libwebp rejected the stream"
        W, H = w.value, h.value
        cw, ch = (W + 1) // 2, (H + 1) // 2
        Y = np.frombuffer(ctypes.string_at(y, st.value * H),
                          np.uint8).reshape(H, st.value)[:, :W].copy()
        U = np.frombuffer(ctypes.string_at(u, uvst.value * ch),
                          np.uint8).reshape(ch, uvst.value)[:, :cw].copy()
        V = np.frombuffer(ctypes.string_at(v, uvst.value * ch),
                          np.uint8).reshape(ch, uvst.value)[:, :cw].copy()
        self.lib.WebPFree(y)
        return Y, U, V

    # -- advanced encoder (config knobs, RGBA import) -----------------------
    def _abi(self) -> int:
        if self._enc_abi is None:
            lib = self.lib
            lib.WebPConfigInitInternal.argtypes = [
                ctypes.POINTER(_WebPConfig), ctypes.c_int, ctypes.c_float,
                ctypes.c_int]
            lib.WebPConfigInitInternal.restype = ctypes.c_int
            for cand in (0x0210, 0x020f, 0x020e, 0x0211, 0x0202):
                cfg = _WebPConfig()
                if lib.WebPConfigInitInternal(ctypes.byref(cfg), 0, 75.0, cand) == 1:
                    # layout sanity: defaults documented by the public API
                    if (cfg.method, cfg.pass_, cfg.sns_strength,
                            cfg.filter_strength, cfg.alpha_quality) != (4, 1, 50, 60, 100):
                        pytest.skip("WebPConfig ABI layout mismatch")
                    self._enc_abi = cand
                    break
            else:
                pytest.skip("no compatible libwebp encoder ABI")
        return self._enc_abi

    def encode_cfg(self, rgb: np.ndarray, alpha: np.ndarray = None, **kw) -> bytes:
        lib = self.lib
        abi = self._abi()
        lib.WebPPictureInitInternal.argtypes = [ctypes.POINTER(_WebPPicture), ctypes.c_int]
        lib.WebPPictureInitInternal.restype = ctypes.c_int
        lib.WebPPictureImportRGB.argtypes = [ctypes.POINTER(_WebPPicture),
                                             ctypes.c_char_p, ctypes.c_int]
        lib.WebPPictureImportRGB.restype = ctypes.c_int
        lib.WebPPictureImportRGBA.argtypes = lib.WebPPictureImportRGB.argtypes
        lib.WebPPictureImportRGBA.restype = ctypes.c_int
        lib.WebPEncode.argtypes = [ctypes.POINTER(_WebPConfig),
                                   ctypes.POINTER(_WebPPicture)]
        lib.WebPEncode.restype = ctypes.c_int
        lib.WebPPictureFree.argtypes = [ctypes.POINTER(_WebPPicture)]
        lib.WebPMemoryWriterInit.argtypes = [ctypes.POINTER(_MemoryWriter)]
        lib.WebPMemoryWriterClear.argtypes = [ctypes.POINTER(_MemoryWriter)]
        lib.WebPValidateConfig.argtypes = [ctypes.POINTER(_WebPConfig)]
        lib.WebPValidateConfig.restype = ctypes.c_int

        h, w, _ = rgb.shape
        cfg = _WebPConfig()
        assert lib.WebPConfigInitInternal(
            ctypes.byref(cfg), 0, float(kw.pop("quality", 75.0)), abi) == 1
        for k, v in kw.items():
            setattr(cfg, k, v)
        assert lib.WebPValidateConfig(ctypes.byref(cfg)) == 1
        pic = _WebPPicture()
        assert lib.WebPPictureInitInternal(ctypes.byref(pic), abi) == 1
        pic.width, pic.height = w, h
        pic.use_argb = 1
        if alpha is not None:
            rgba = np.dstack([rgb, alpha])
            assert lib.WebPPictureImportRGBA(
                ctypes.byref(pic), np.ascontiguousarray(rgba).tobytes(), w * 4) == 1
        else:
            assert lib.WebPPictureImportRGB(
                ctypes.byref(pic), np.ascontiguousarray(rgb).tobytes(), w * 3) == 1
        wr = _MemoryWriter()
        lib.WebPMemoryWriterInit(ctypes.byref(wr))
        pic.writer = ctypes.cast(lib.WebPMemoryWrite, ctypes.c_void_p)
        pic.custom_ptr = ctypes.cast(ctypes.byref(wr), ctypes.c_void_p)
        ok = lib.WebPEncode(ctypes.byref(cfg), ctypes.byref(pic))
        lib.WebPPictureFree(ctypes.byref(pic))
        assert ok == 1, f"libwebp encode failed (error {pic.error_code})"
        data = ctypes.string_at(wr.mem, wr.size)
        lib.WebPMemoryWriterClear(ctypes.byref(wr))
        return data


@pytest.fixture(scope="module")
def lw():
    return _Lib()


def _assert_exact(lw, data: bytes):
    """Decode `data` with libwebp and with vp8codec; require bit-identical
    YUV planes AND RGB output."""
    payload = _vp8_payload(data)
    refY, refU, refV = lw.decode_yuv(data)
    Y, U, V, w, h = decode_vp8_frame(payload)
    assert (refY == Y).all(), "Y plane mismatch"
    assert (refU == U).all(), "U plane mismatch"
    assert (refV == V).all(), "V plane mismatch"
    assert (lw.decode_rgb(data) == yuv420_to_rgb(Y, U, V)).all(), "RGB mismatch"


# ---------------------------------------------------------------------------
# conformance: simple encoder
# ---------------------------------------------------------------------------


class TestConformance:
    @pytest.mark.parametrize("q", [5, 25, 50, 75, 90, 100])
    def test_quality_sweep_smooth(self, lw, q):
        _assert_exact(lw, lw.encode(_smooth(48, 64, q), q))

    @pytest.mark.parametrize("dims", [(1, 1), (3, 2), (16, 16), (17, 16),
                                      (16, 17), (15, 15), (33, 31), (64, 1),
                                      (1, 64), (70, 130), (47, 81)])
    def test_dimension_sweep(self, lw, dims):
        h, w = dims
        r = _rng(h * 131 + w)
        _assert_exact(lw, lw.encode(r.randint(0, 256, (h, w, 3)).astype(np.uint8), 50))
        _assert_exact(lw, lw.encode(_smooth(h, w, h + w), 75))

    def test_textlike_bpred_heavy(self, lw):
        r = _rng(5)
        img = np.full((64, 96, 3), 245, np.uint8)
        for _ in range(200):
            y, x = r.randint(0, 64), r.randint(0, 96)
            img[y:y + r.randint(1, 3), x:x + r.randint(1, 6)] = r.randint(0, 60)
        for q in (30, 70):
            _assert_exact(lw, lw.encode(img, q))

    def test_hard_edge_segments(self, lw):
        img = np.zeros((64, 64, 3), np.uint8)
        img[:32] = 250
        _assert_exact(lw, lw.encode(img, 75))

    def test_solid(self, lw):
        _assert_exact(lw, lw.encode(np.full((80, 80, 3), 77, np.uint8), 80))


# ---------------------------------------------------------------------------
# conformance: encoder config knobs (rare decoder paths)
# ---------------------------------------------------------------------------


class TestConfigKnobs:
    def _mixed(self):
        img = _smooth(80, 112, 5).copy()
        img[20:60, 30:80] = _rng(9).randint(0, 256, (40, 50, 3)).astype(np.uint8)
        return img

    def test_simple_filter(self, lw):
        _assert_exact(lw, lw.encode_cfg(self._mixed(), quality=55.0,
                                        filter_type=0, filter_strength=40))
        _assert_exact(lw, lw.encode_cfg(self._mixed(), quality=25.0,
                                        filter_type=0, filter_strength=80))

    @pytest.mark.parametrize("sharp", [1, 3, 7])
    def test_sharpness(self, lw, sharp):
        _assert_exact(lw, lw.encode_cfg(self._mixed(), quality=45.0,
                                        filter_sharpness=sharp,
                                        filter_strength=80))

    @pytest.mark.parametrize("parts,method", [(1, 1), (2, 0), (3, 0)])
    def test_multi_partition(self, lw, parts, method):
        """method<=1 makes libwebp honor the partitions knob; assert the
        stream really is multi-partition before comparing."""
        from graphrag_mrkr_2_spark.functions.vp8codec import _parse_headers

        img = _rng(11).randint(0, 256, (128, 160, 3)).astype(np.uint8)
        data = lw.encode_cfg(img, quality=60.0, method=method, partitions=parts)
        assert len(_parse_headers(_vp8_payload(data))["parts"]) == 1 << parts
        _assert_exact(lw, data)

    @pytest.mark.parametrize("segs", [1, 2, 4])
    def test_segments(self, lw, segs):
        _assert_exact(lw, lw.encode_cfg(self._mixed(), quality=60.0,
                                        segments=segs, sns_strength=90))

    def test_q_extremes_and_autofilter(self, lw):
        _assert_exact(lw, lw.encode_cfg(self._mixed(), quality=0.0))
        _assert_exact(lw, lw.encode_cfg(self._mixed(), quality=100.0))
        _assert_exact(lw, lw.encode_cfg(self._mixed(), quality=45.0, autofilter=1))

    def test_filter_disabled(self, lw):
        _assert_exact(lw, lw.encode_cfg(self._mixed(), quality=85.0,
                                        filter_strength=0))


# ---------------------------------------------------------------------------
# lossy + alpha (VP8X container with ALPH chunk)
# ---------------------------------------------------------------------------


class TestLossyAlpha:
    @pytest.mark.parametrize("alpha_filtering", [0, 1, 2])
    def test_alpha_roundtrip(self, lw, alpha_filtering):
        r = _rng(31 + alpha_filtering)
        rgb = _smooth(40, 56, 3)
        alpha = np.clip(r.randint(-40, 296, (40, 56)), 0, 255).astype(np.uint8)
        data = lw.encode_cfg(rgb, alpha=alpha, quality=60.0,
                             alpha_filtering=alpha_filtering)
        ref = lw.decode_rgb(data, channels=4)
        out = decode_webp(data)
        assert out.shape == (40, 56, 4)
        assert (out == ref).all()

    def test_alpha_uncompressed(self, lw):
        rgb = _smooth(24, 33, 4)
        alpha = _rng(8).randint(0, 256, (24, 33)).astype(np.uint8)
        data = lw.encode_cfg(rgb, alpha=alpha, quality=70.0, alpha_compression=0)
        assert (decode_webp(data) == lw.decode_rgb(data, channels=4)).all()

    def test_palettized_alpha_mask(self, lw):
        """A binary 0/255 alpha mask: libwebp's alpha encoder palettizes it
        (color-indexing transform inside the headerless VP8L stream), which
        a green-channel-only read would decode as palette indices (review
        r5 finding #1)."""
        r = _rng(12)
        rgb = _smooth(48, 64, 2)
        alpha = np.where(r.rand(48, 64) > 0.5, 255, 0).astype(np.uint8)
        data = lw.encode_cfg(rgb, alpha=alpha, quality=60.0)
        ref = lw.decode_rgb(data, channels=4)
        out = decode_webp(data)
        assert out.shape == (48, 64, 4)
        assert (out == ref).all()
        # the mask survives lossy alpha compression only approximately in
        # general, but must be IDENTICAL to what libwebp itself decodes
        assert set(np.unique(out[..., 3])) <= {0, 255}

    def test_few_level_alpha(self, lw):
        """4-level alpha — small palette, sub-byte bundling width_bits>0."""
        r = _rng(13)
        rgb = _smooth(32, 40, 9)
        alpha = np.asarray([0, 85, 170, 255], np.uint8)[r.randint(0, 4, (32, 40))]
        data = lw.encode_cfg(rgb, alpha=alpha, quality=70.0)
        assert (decode_webp(data) == lw.decode_rgb(data, channels=4)).all()

    def test_vp8x_dimensions(self, lw):
        rgb = _smooth(25, 38, 4)
        alpha = np.full((25, 38), 7, np.uint8)
        data = lw.encode_cfg(rgb, alpha=alpha, quality=70.0)
        assert data[12:16] == b"VP8X"
        assert webp_dimensions(data) == (38, 25)


# ---------------------------------------------------------------------------
# crafted bitstream: the skip path libwebp's encoder never emits
# ---------------------------------------------------------------------------


class _BoolEnc:
    """RFC 6386 §7.1 boolean encoder (tests only — used to craft streams)."""

    def __init__(self):
        self.out = bytearray()
        self.rng = 255
        self.bottom = 0
        self.bit_count = 24

    def _carry(self):
        i = len(self.out) - 1
        while self.out[i] == 255:
            self.out[i] = 0
            i -= 1
        self.out[i] += 1

    def bit(self, prob: int, value: int):
        split = 1 + (((self.rng - 1) * prob) >> 8)
        if value:
            self.bottom += split
            self.rng -= split
        else:
            self.rng = split
        while self.rng < 128:
            self.rng <<= 1
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= 0xFFFFFF
                self.bit_count = 8

    def literal(self, n: int, v: int):
        for i in range(n - 1, -1, -1):
            self.bit(128, (v >> i) & 1)

    def flush(self) -> bytes:
        c = self.bit_count
        v = self.bottom
        if v & (1 << (32 - c)):
            self._carry()
        v = (v << (c & 7)) & 0xFFFFFFFF
        c >>= 3
        while c > 0:
            v = (v << 8) & 0xFFFFFFFF
            c -= 1
        for _ in range(4):
            self.out.append((v >> 24) & 0xFF)
            v = (v << 8) & 0xFFFFFFFF
        return bytes(self.out)


def _craft_frame(mb_plan, filter_level=0, sharpness=0, simple=0,
                 seg=None, lf_deltas=None, q=40) -> bytes:
    """Build a legal 32x32 keyframe (2x2 MBs, all DC16/DC-chroma modes).

    ``mb_plan`` is 4 entries in raster order: ``"skip"`` or an int — the
    (signed) token value coded as the MB's Y2 DC coefficient (0 = coded but
    empty).  ``seg`` = dict(abs=0/1, lf=[4 ints]) enables segmentation with
    those loop-filter strengths (no per-MB map — every MB is segment 0).
    ``lf_deltas`` = dict(ref0=..., mode0=...) enables loop-filter deltas.
    Streams like filter_level=0-with-segment-strengths or
    over-63-base-with-negative-delta are legal but never produced by
    libwebp's encoder — crafting them pins the decoder's filter-level
    semantics against libwebp's decoder."""
    from graphrag_mrkr_2_spark.functions._vp8tables import COEFF_UPDATE_PROBS
    from graphrag_mrkr_2_spark.functions import vp8codec as vc

    use_skip = any(m == "skip" for m in mb_plan)
    e = _BoolEnc()
    e.bit(128, 0)  # color space
    e.bit(128, 0)  # clamping
    if seg is None:
        e.bit(128, 0)  # segmentation_enabled
    else:
        e.bit(128, 1)
        e.bit(128, 0)  # update_mb_segmentation_map: no
        e.bit(128, 1)  # update_segment_feature_data
        e.bit(128, seg.get("abs", 1))
        for _ in range(4):
            e.bit(128, 0)  # quantizer updates absent
        for v in seg["lf"]:
            e.bit(128, 1)
            e.literal(6, abs(v))
            e.bit(128, 1 if v < 0 else 0)
    e.bit(128, simple)  # filter type
    e.literal(6, filter_level)
    e.literal(3, sharpness)
    if lf_deltas is None:
        e.bit(128, 0)  # lf delta enabled
    else:
        e.bit(128, 1)
        e.bit(128, 1)  # delta update flag
        for i, v in enumerate([lf_deltas.get("ref0", 0), 0, 0, 0,
                               lf_deltas.get("mode0", 0), 0, 0, 0]):
            if v:
                e.bit(128, 1)
                e.literal(6, abs(v))
                e.bit(128, 1 if v < 0 else 0)
            else:
                e.bit(128, 0)
    e.literal(2, 0)  # log2 partitions = 0 -> 1 partition
    e.literal(7, q)  # y_ac_q
    for _ in range(5):
        e.bit(128, 0)  # quant deltas absent
    e.bit(128, 1)  # refresh entropy probs
    for i in range(1056):
        e.bit(COEFF_UPDATE_PROBS[i], 0)  # no token prob updates
    e.bit(128, 1 if use_skip else 0)  # mb_no_coeff_skip
    if use_skip:
        e.literal(8, 200)  # prob_skip_false

    for m in mb_plan:
        if use_skip:
            e.bit(200, 1 if m == "skip" else 0)
        # kf ymode tree: DC_PRED = bits 1,0,0 against probs 145,156,163
        e.bit(145, 1)
        e.bit(156, 0)
        e.bit(163, 0)
        e.bit(142, 0)  # uv mode: DC ("0")
    part0 = e.flush()

    # token partition — mirror the decoder's nonzero-context tracking
    t = _BoolEnc()
    probs = [[[[vc.COEFF_PROBS[((ty * 8 + b) * 3 + c) * 11 + p] for p in range(11)]
               for c in range(3)] for b in range(8)] for ty in range(4)]

    def put_y2_token(p, v):
        """Encode one signed token value v (|v| in {1,2,3,4}) then rely on
        the caller for the following EOB."""
        a = abs(v)
        t.bit(p[0], 1)  # not EOB
        t.bit(p[1], 1)  # not DCT_0
        if a == 1:
            t.bit(p[2], 0)
        else:
            t.bit(p[2], 1)
            t.bit(p[3], 0)  # {2,3,4} branch
            if a == 2:
                t.bit(p[4], 0)
            else:
                t.bit(p[4], 1)
                t.bit(p[5], 0 if a == 3 else 1)
        t.bit(128, 1 if v < 0 else 0)  # sign

    above_y2 = [0, 0]
    for idx, m in enumerate(mb_plan):
        mb_x, row_start = idx & 1, (idx & 1) == 0
        if row_start:
            left_y2 = 0
        if m == "skip":
            above_y2[mb_x] = left_y2 = 0  # DC16 MBs have a Y2 block
            continue
        ctx = above_y2[mb_x] + left_y2
        v = int(m)
        if v == 0:
            t.bit(probs[1][0][ctx][0], 0)  # immediate EOB
            above_y2[mb_x] = left_y2 = 0
        else:
            put_y2_token(probs[1][0][ctx], v)
            nxt_ctx = 1 if abs(v) == 1 else 2
            t.bit(probs[1][1][nxt_ctx][0], 0)  # EOB at position 1 (band 1)
            above_y2[mb_x] = left_y2 = 1
        for _ in range(16):  # luma, first=1 -> band 1; own ctx stays 0
            t.bit(probs[0][1][0][0], 0)
        for _ in range(8):  # chroma, band 0 ctx 0
            t.bit(probs[2][0][0][0], 0)
    part1 = t.flush()

    tag = (len(part0) << 5) | (1 << 4) | 0  # keyframe, show_frame, version 0
    frame = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    frame += b"\x9d\x01\x2a" + struct.pack("<HH", 32, 32)
    frame += part0 + part1
    chunk = b"VP8 " + struct.pack("<I", len(frame)) + frame
    if len(frame) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _craft_skip_frame() -> bytes:
    """A legal 32x32 keyframe: mb_no_coeff_skip on, MB(0,0) coded with one
    Y2 DC coefficient, the other three MBs skipped."""
    return _craft_frame([1, "skip", "skip", "skip"])


class TestCraftedFilterSemantics:
    """Legal streams libwebp's encoder never emits, decoded by BOTH
    libwebp's decoder and ours — pins the filter-level corner semantics
    (review r5 findings #2/#3)."""

    def _ab(self, lw, data):
        refY, refU, refV = lw.decode_yuv(data)
        Y, U, V, w, h = decode_vp8_frame(_vp8_payload(data))
        assert (refY == Y).all() and (refU == U).all() and (refV == V).all()
        return Y

    def test_level0_with_segment_strengths_disables_filter(self, lw):
        """frame filter_level=0 + absolute segment strengths 20: every
        reference decoder skips ALL filtering (libwebp keys filter_type off
        hdr->level_ alone)."""
        data = _craft_frame([4, 0, 0, -4], filter_level=0,
                            seg={"abs": 1, "lf": [20, 20, 20, 20]})
        self._ab(lw, data)

    def test_overflow_base_negative_delta_single_clamp(self, lw):
        """base level 60 + non-absolute segment delta +30 (=90, >63) with
        ref_lf_delta -40: libwebp clamps ONCE after the deltas (-> 50);
        a libvpx-style intermediate clamp would give 23. The Y2 DC edges
        between MBs make the two strengths produce different pixels."""
        data = _craft_frame([4, -3, 2, -4], filter_level=60,
                            seg={"abs": 0, "lf": [30, 0, 0, 0]},
                            lf_deltas={"ref0": -40})
        self._ab(lw, data)

    def test_segment_strengths_with_nonzero_base(self, lw):
        data = _craft_frame([4, -4, 3, -2], filter_level=10,
                            seg={"abs": 1, "lf": [35, 0, 0, 0]},
                            sharpness=2)
        self._ab(lw, data)

    def test_simple_filter_crafted(self, lw):
        data = _craft_frame([4, -4, 4, -4], filter_level=30, simple=1)
        self._ab(lw, data)

    def test_mode_delta_applies_only_to_bpred(self, lw):
        """mode_lf_deltas[0] targets B_PRED; these MBs are DC16, so only
        the ref delta applies — both decoders must agree."""
        data = _craft_frame([4, -4, 2, -2], filter_level=25,
                            lf_deltas={"ref0": 10, "mode0": -25})
        self._ab(lw, data)


class TestCraftedSkipStream:
    def test_skip_semantics_match_libwebp(self, lw):
        data = _craft_skip_frame()
        refY, refU, refV = lw.decode_yuv(data)
        Y, U, V, w, h = decode_vp8_frame(_vp8_payload(data))
        assert (w, h) == (32, 32)
        assert (refY == Y).all() and (refU == U).all() and (refV == V).all()
        assert (lw.decode_rgb(data) == decode_webp(data)).all()

    def test_skip_frame_expected_pixels(self, lw):
        """Self-check without the library: MB(0,0) carries a +1 Y2 DC that
        the WHT spreads to every luma subblock; skipped MBs stay at the DC
        prediction of their (constant) neighbors."""
        Y, U, V, w, h = decode_vp8_frame(_vp8_payload(_craft_skip_frame()))
        # Every MB is flat: MB(0,0) is DC prediction plus the WHT-spread Y2
        # DC; the skipped MBs are pure DC predictions of their flat
        # neighbors. Assert that structure (values are quantizer-derived).
        assert (Y[:16, :16] == Y[0, 0]).all()       # coded MB flat
        assert (Y[:16, 16:] == Y[0, 16]).all()      # skipped MBs flat
        assert (Y[16:, :16] == Y[16, 0]).all()
        assert (Y[16:, 16:] == Y[16, 16]).all()
        assert Y[0, 0] != 128  # the Y2 DC coefficient moved the coded MB
        assert (U == 128).all() and (V == 128).all()  # chroma all EOB/skip


# ---------------------------------------------------------------------------
# vendored tables == the spec tables compiled into libwebp
# ---------------------------------------------------------------------------


class TestVendoredTables:
    def _blob(self):
        import ctypes.util

        for cand in (ctypes.util.find_library("webp"),
                     "/lib/x86_64-linux-gnu/libwebp.so.7",
                     "/usr/lib/x86_64-linux-gnu/libwebp.so.7"):
            if not cand:
                continue
            try:
                with open(cand, "rb") as fh:
                    return fh.read()
            except OSError:
                continue
        pytest.skip("libwebp binary not readable")

    def test_tables_byte_identical(self):
        from graphrag_mrkr_2_spark.functions._vp8tables import (
            AC_QLOOKUP, COEFF_PROBS, COEFF_UPDATE_PROBS, DC_QLOOKUP,
            KF_BMODE_PROBS)

        blob = self._blob()
        assert bytes(COEFF_PROBS) in blob
        assert bytes(COEFF_UPDATE_PROBS) in blob
        assert bytes(KF_BMODE_PROBS) in blob
        assert bytes(DC_QLOOKUP) in blob
        assert struct.pack("<128H", *AC_QLOOKUP) in blob

    def test_table_shapes(self):
        from graphrag_mrkr_2_spark.functions._vp8tables import (
            AC_QLOOKUP, COEFF_PROBS, COEFF_UPDATE_PROBS, DC_QLOOKUP,
            KF_BMODE_PROBS)

        assert len(COEFF_PROBS) == 4 * 8 * 3 * 11
        assert len(COEFF_UPDATE_PROBS) == 4 * 8 * 3 * 11
        assert len(KF_BMODE_PROBS) == 10 * 10 * 9
        assert len(DC_QLOOKUP) == len(AC_QLOOKUP) == 128
        assert DC_QLOOKUP[0] == 4 and DC_QLOOKUP[127] == 157
        assert AC_QLOOKUP[0] == 4 and AC_QLOOKUP[127] == 284


# ---------------------------------------------------------------------------
# malformed payload contracts
# ---------------------------------------------------------------------------


class TestMalformed:
    def _frame(self, lw):
        return bytearray(_vp8_payload(lw.encode(_smooth(32, 32, 1), 60)))

    def test_truncated(self, lw):
        f = self._frame(lw)
        with pytest.raises(ValueError):
            decode_vp8_frame(bytes(f[:8]))

    def test_interframe_rejected(self, lw):
        f = self._frame(lw)
        f[0] |= 1  # keyframe bit cleared means interframe
        with pytest.raises(ValueError, match="keyframe"):
            decode_vp8_frame(bytes(f))

    def test_bad_start_code(self, lw):
        f = self._frame(lw)
        f[3] ^= 0xFF
        with pytest.raises(ValueError, match="start code"):
            decode_vp8_frame(bytes(f))

    def test_partition_overrun(self, lw):
        f = self._frame(lw)
        big = (len(f) + 1000) << 5 | (f[0] & 0x1F)
        f[0], f[1], f[2] = big & 0xFF, (big >> 8) & 0xFF, (big >> 16) & 0xFF
        with pytest.raises(ValueError, match="overrun"):
            decode_vp8_frame(bytes(f))

    def test_zero_dims_rejected(self, lw):
        f = self._frame(lw)
        f[6:8] = struct.pack("<H", 0)
        with pytest.raises(ValueError, match="dimensions"):
            decode_vp8_frame(bytes(f))


# ---------------------------------------------------------------------------
# dispatch through the image stack
# ---------------------------------------------------------------------------


class TestDispatch:
    def test_decode_image_routes_lossy(self, lw):
        from graphrag_mrkr_2_spark.functions.imagecodecs import (
            decode_image, sniff_image)

        data = lw.encode(_smooth(24, 40, 2), 75)
        assert sniff_image(data) == "webp"
        assert (decode_image(data) == lw.decode_rgb(data)).all()

    def test_probe_media_lossy_dims(self, lw):
        from graphrag_mrkr_2_spark.operators.multimodal import probe_media

        data = lw.encode(_smooth(21, 35, 2), 75)
        info = probe_media(data)
        assert info["kind"] == "image"
        assert (info["width"], info["height"]) == (35, 21)

    def test_deterministic(self, lw):
        data = lw.encode(_smooth(33, 47, 6), 50)
        assert (decode_webp(data) == decode_webp(data)).all()
