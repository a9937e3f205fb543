"""AVIF/HEIC decode (and test-fixture encode) via the system libheif.

The HEIF family (AVIF = AV1-in-HEIF, HEIC = HEVC-in-HEIF) carries a full
video codec per image — a from-scratch AV1/HEVC entropy decoder is out of
scope, so AVIF/HEIC decode rides the ``image_features(decoder=...)``
injection seam (``functions/nativecodecs.py``) instead of the pure-stdlib
kernel path. This module is the binding: ctypes over libheif's stable
opaque-pointer C API (no struct-layout guessing beyond the tiny public
``heif_error``/nclx value types), dispatching to the distro's dav1d/libde265
decoder plugins.

Correctness anchor: libheif on this host also ships the aom AV1 and x265
HEVC *encoder* plugins, so the tests build real AVIF/HEIC payloads and
require the decode round trip to be BIT-EXACT. Exactness needs the
identity (GBR) matrix: RGB planes are fed to the encoder as YCbCr 4:4:4
with nclx ``matrix_coefficients=0, full_range=1`` (Y=G, Cb=B, Cr=R per
ISO 23091-2) and ``lossless`` + ``chroma=444`` set on the encoder —
routing through libheif's default BT.601 conversion instead costs a ±1
rounding error each direction and would make every conformance assertion
a tolerance test.

Reference analog: the reference's only image ingestion is OCR over
PIL-decoded rasters (``ingestion/loaders/image_loader.py``) and has no
AVIF/HEIC path at all; this closes the format for the 100-TB crawl brief
(AVIF is the fastest-growing raster on the public web). Metadata probing
is independent of this module — ``functions/mediaprobe.probe_heif`` reads
dims/codec/duration from the item-property boxes with no codec at all.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import os
import tempfile
import threading

import numpy as np

_LOCK = threading.Lock()
_STATE: dict[str, object] = {}

_HEIF_CANDIDATES = (
    "libheif.so.1",
    "libheif.so",
    "/usr/lib/x86_64-linux-gnu/libheif.so.1",
)

# public enums (libheif.h, stable since 1.0)
_COLORSPACE_YCBCR = 0
_COLORSPACE_RGB = 1
_CHROMA_444 = 3
_CHROMA_INTERLEAVED_RGB = 10
_CHROMA_INTERLEAVED_RGBA = 11
_CHANNEL_Y, _CHANNEL_CB, _CHANNEL_CR = 0, 1, 2
_CHANNEL_INTERLEAVED = 10
_COMPRESSION_HEVC = 1
_COMPRESSION_AV1 = 4


class _HeifError(ctypes.Structure):
    _fields_ = [
        ("code", ctypes.c_int),
        ("subcode", ctypes.c_int),
        ("message", ctypes.c_char_p),
    ]


class _Nclx(ctypes.Structure):
    # struct heif_color_profile_nclx (value layout is public API)
    _fields_ = [
        ("version", ctypes.c_uint8),
        ("color_primaries", ctypes.c_int),
        ("transfer_characteristics", ctypes.c_int),
        ("matrix_coefficients", ctypes.c_int),
        ("full_range_flag", ctypes.c_uint8),
    ]


def _sig(lib, name, restype, argtypes):
    fn = getattr(lib, name)
    fn.restype = restype
    fn.argtypes = argtypes
    return fn


def _load_heif():
    """CDLL for libheif with argtypes set, or None. Cached per process."""
    if "heif" in _STATE:
        return _STATE["heif"]
    with _LOCK:
        if "heif" in _STATE:
            return _STATE["heif"]
        lib = None
        names = list(_HEIF_CANDIDATES)
        found = ctypes.util.find_library("heif")
        if found:
            names.insert(0, found)
        for name in names:
            try:
                lib = ctypes.CDLL(name)
                break
            except OSError:
                continue
        try:
            if lib is None:
                raise AttributeError("libheif not loadable")
            p, vp, i = ctypes.POINTER, ctypes.c_void_p, ctypes.c_int
            u8p = p(ctypes.c_uint8)
            _sig(lib, "heif_context_alloc", vp, [])
            _sig(lib, "heif_context_free", None, [vp])
            _sig(lib, "heif_context_read_from_memory_without_copy",
                 _HeifError, [vp, vp, ctypes.c_size_t, vp])
            _sig(lib, "heif_context_get_primary_image_handle",
                 _HeifError, [vp, p(vp)])
            _sig(lib, "heif_image_handle_get_width", i, [vp])
            _sig(lib, "heif_image_handle_get_height", i, [vp])
            _sig(lib, "heif_image_handle_has_alpha_channel", i, [vp])
            _sig(lib, "heif_decode_image", _HeifError, [vp, p(vp), i, i, vp])
            _sig(lib, "heif_image_get_plane_readonly", u8p, [vp, i, p(i)])
            _sig(lib, "heif_image_get_width", i, [vp, i])
            _sig(lib, "heif_image_get_height", i, [vp, i])
            _sig(lib, "heif_image_release", None, [vp])
            _sig(lib, "heif_image_handle_release", None, [vp])
            _sig(lib, "heif_have_decoder_for_format", i, [i])
            _sig(lib, "heif_have_encoder_for_format", i, [i])
            _sig(lib, "heif_context_get_encoder_for_format",
                 _HeifError, [vp, i, p(vp)])
            _sig(lib, "heif_encoder_release", None, [vp])
            _sig(lib, "heif_encoder_set_lossless", _HeifError, [vp, i])
            _sig(lib, "heif_encoder_set_parameter_string", _HeifError,
                 [vp, ctypes.c_char_p, ctypes.c_char_p])
            _sig(lib, "heif_encoder_set_parameter_integer", _HeifError,
                 [vp, ctypes.c_char_p, i])
            _sig(lib, "heif_image_create", _HeifError, [i, i, i, i, p(vp)])
            _sig(lib, "heif_image_add_plane", _HeifError, [vp, i, i, i, i])
            _sig(lib, "heif_image_get_plane", u8p, [vp, i, p(i)])
            _sig(lib, "heif_image_set_nclx_color_profile", _HeifError, [vp, vp])
            _sig(lib, "heif_nclx_color_profile_alloc", vp, [])
            _sig(lib, "heif_nclx_color_profile_free", None, [vp])
            _sig(lib, "heif_context_encode_image", _HeifError,
                 [vp, vp, vp, vp, p(vp)])
            _sig(lib, "heif_context_write_to_file", _HeifError,
                 [vp, ctypes.c_char_p])
            _sig(lib, "heif_encoding_options_alloc", vp, [])
            _sig(lib, "heif_encoding_options_free", None, [vp])
        except AttributeError:
            # a libheif too old to export every bound symbol (e.g. 1.6.x
            # predates heif_have_decoder_for_format) is "unavailable", not
            # a crash — callers check for None (review r6 finding #1)
            lib = None
        _STATE["heif"] = lib
        return lib


def _check(err: _HeifError, what: str) -> None:
    if err.code != 0:
        msg = (err.message or b"").decode("utf-8", "replace")
        raise ValueError(f"libheif {what} failed ({err.code}/{err.subcode}): {msg}")


def heif_available(fmt: str = "avif") -> bool:
    """True when libheif + the decoder plugin for ``fmt`` are loadable."""
    lib = _load_heif()
    if lib is None:
        return False
    comp = _COMPRESSION_AV1 if fmt == "avif" else _COMPRESSION_HEVC
    return bool(lib.heif_have_decoder_for_format(comp))


def heif_encoder_available(fmt: str = "avif") -> bool:
    """True when the host can also ENCODE ``fmt`` (test fixtures only)."""
    lib = _load_heif()
    if lib is None:
        return False
    comp = _COMPRESSION_AV1 if fmt == "avif" else _COMPRESSION_HEVC
    return bool(lib.heif_have_encoder_for_format(comp))


def decode_heif_native(data: bytes) -> np.ndarray:
    """Decode an AVIF/HEIC payload to ``(h, w, 3|4) uint8`` via libheif.

    Alpha is preserved (interleaved RGBA) when the primary item carries an
    alpha auxiliary; plain images come back RGB. Raises ValueError on any
    libheif error — ``image_features`` quarantines per payload.
    """
    lib = _load_heif()
    if lib is None:
        raise ValueError("libheif is not available on this host")
    ctx = lib.heif_context_alloc()
    if not ctx:
        raise ValueError("libheif context allocation failed")
    handle = ctypes.c_void_p()
    img = ctypes.c_void_p()
    # without_copy: the buffer must outlive the context — it does (locals)
    buf = ctypes.create_string_buffer(data, len(data))
    try:
        _check(lib.heif_context_read_from_memory_without_copy(
            ctx, buf, len(data), None), "read")
        _check(lib.heif_context_get_primary_image_handle(
            ctx, ctypes.byref(handle)), "primary handle")
        w = lib.heif_image_handle_get_width(handle)
        h = lib.heif_image_handle_get_height(handle)
        if w <= 0 or h <= 0 or w * h > 100_000_000:
            raise ValueError(f"implausible HEIF dims {w}x{h}")
        has_alpha = bool(lib.heif_image_handle_has_alpha_channel(handle))
        chroma = _CHROMA_INTERLEAVED_RGBA if has_alpha else _CHROMA_INTERLEAVED_RGB
        channels = 4 if has_alpha else 3
        _check(lib.heif_decode_image(
            handle, ctypes.byref(img), _COLORSPACE_RGB, chroma, None), "decode")
        stride = ctypes.c_int()
        ptr = lib.heif_image_get_plane_readonly(
            img, _CHANNEL_INTERLEAVED, ctypes.byref(stride))
        if not ptr:
            raise ValueError("libheif returned no interleaved plane")
        rows = np.ctypeslib.as_array(ptr, shape=(h, stride.value))
        return rows[:, : w * channels].reshape(h, w, channels).copy()
    finally:
        if img:
            lib.heif_image_release(img)
        if handle:
            lib.heif_image_handle_release(handle)
        lib.heif_context_free(ctx)


def decode_heif_native_yuv(data: bytes, chroma: str = "420") -> tuple:
    """Decode an AVIF/HEIC payload to raw ``(y, cb, cr)`` uint8 planes (no
    RGB conversion; cb/cr keep their subsampled dims, None when absent).
    This is the plane-level A/B surface: a direct codec binding
    (``hevccodec``/``av1codec``) must reproduce these planes bit-exactly
    on the same payload, with no color conversion policy in the
    comparison.

    ``chroma`` must STATE the stream's native subsampling ('420'/'422'/
    '444'): libheif only passes planes through untouched when the
    requested chroma equals the coded one — requesting
    heif_chroma_undefined makes 1.15 CONVERT (measured: a 4:2:0 stream
    came back 4:4:4 with ±1 luma wobble from the resampling round-trip),
    which would poison the A/B."""
    lib = _load_heif()
    if lib is None:
        raise ValueError("libheif is not available on this host")
    ctx = lib.heif_context_alloc()
    if not ctx:
        raise ValueError("libheif context allocation failed")
    handle = ctypes.c_void_p()
    img = ctypes.c_void_p()
    buf = ctypes.create_string_buffer(data, len(data))
    try:
        _check(lib.heif_context_read_from_memory_without_copy(
            ctx, buf, len(data), None), "read")
        _check(lib.heif_context_get_primary_image_handle(
            ctx, ctypes.byref(handle)), "primary handle")
        chroma_enum = {"420": 1, "422": 2, "444": _CHROMA_444}.get(chroma)
        if chroma_enum is None:
            raise ValueError(f"unsupported chroma {chroma!r}")
        _check(lib.heif_decode_image(
            handle, ctypes.byref(img), _COLORSPACE_YCBCR,
            chroma_enum, None), "decode")

        def _read(channel):
            w = lib.heif_image_get_width(img, channel)
            h = lib.heif_image_get_height(img, channel)
            if w <= 0 or h <= 0:
                return None
            stride = ctypes.c_int()
            ptr = lib.heif_image_get_plane_readonly(
                img, channel, ctypes.byref(stride))
            if not ptr:
                return None
            rows = np.ctypeslib.as_array(ptr, shape=(h, stride.value))
            return rows[:, :w].copy()

        y = _read(_CHANNEL_Y)
        if y is None:
            raise ValueError("libheif returned no luma plane")
        return y, _read(_CHANNEL_CB), _read(_CHANNEL_CR)
    finally:
        if img:
            lib.heif_image_release(img)
        if handle:
            lib.heif_image_handle_release(handle)
        lib.heif_context_free(ctx)


def encode_heif_lossless(px: np.ndarray, fmt: str = "avif",
                         chroma: str = "444") -> bytes:
    """Encode ``(h, w, 1|3|4) uint8`` pixels to a LOSSLESS AVIF/HEIC payload.

    Test-fixture path (conformance corpus + probe oracles), not a pipeline
    stage: the interleaved RGB(A) image carries an identity-matrix nclx
    (matrix 0 / GBR, full range) so libheif's RGB→YCbCr step is a plane
    permutation, not a BT.601 rounding — ``decode_heif_native`` must then
    reproduce the input bit-exactly (alpha included); any tolerance would
    mask binding bugs. Empirically pinned quirks on libheif 1.15: the nclx
    must be set on the IMAGE (the encoding-options nclx is ignored for the
    conversion), and the encoding options must be the alloc'd defaults —
    passing NULL options silently drops the alpha plane.

    ``chroma='420'`` trades the RGB bit-exactness away (subsampling) for
    layout coverage — fixtures that exercise decoders' 4:2:0 path, the
    layout real crawl video actually uses.
    """
    lib = _load_heif()
    if lib is None:
        raise ValueError("libheif is not available on this host")
    if px.ndim == 2:
        px = px[:, :, None]
    if px.ndim != 3 or px.shape[2] not in (1, 3, 4):
        raise ValueError(f"expected (h, w, 1|3|4) uint8, got {px.shape}")
    if px.shape[2] == 1:
        px = np.repeat(px, 3, axis=2)
    px = np.ascontiguousarray(px, dtype=np.uint8)
    h, w = px.shape[:2]
    channels = px.shape[2]
    interleave = (_CHROMA_INTERLEAVED_RGBA if channels == 4
                  else _CHROMA_INTERLEAVED_RGB)
    comp = _COMPRESSION_AV1 if fmt == "avif" else _COMPRESSION_HEVC
    ctx = lib.heif_context_alloc()
    enc = ctypes.c_void_p()
    img = ctypes.c_void_p()
    handle = ctypes.c_void_p()
    nclx = None
    opts = None
    try:
        _check(lib.heif_context_get_encoder_for_format(
            ctx, comp, ctypes.byref(enc)), "get encoder")
        _check(lib.heif_encoder_set_lossless(enc, 1), "set lossless")
        _check(lib.heif_encoder_set_parameter_string(
            enc, b"chroma", chroma.encode()), "chroma")
        # fastest settings: this is a fixture encoder — losslessness is a
        # property of the quantizer config, not the speed preset, and the
        # decode side (the thing under test) is unaffected. Measured at
        # 16x12: aom 3.9→2.6 ms (speed 9), x265 71.7→51.8 ms (ultrafast).
        try:
            if comp == _COMPRESSION_AV1:
                _check(lib.heif_encoder_set_parameter_integer(
                    enc, b"speed", 9), "speed")
            else:
                _check(lib.heif_encoder_set_parameter_string(
                    enc, b"preset", b"ultrafast"), "preset")
        except ValueError:
            pass  # older plugin without the tuning knob: just slower
        _check(lib.heif_image_create(
            w, h, _COLORSPACE_RGB, interleave, ctypes.byref(img)), "image")
        _check(lib.heif_image_add_plane(
            img, _CHANNEL_INTERLEAVED, w, h, 8), "plane")
        stride = ctypes.c_int()
        ptr = lib.heif_image_get_plane(
            img, _CHANNEL_INTERLEAVED, ctypes.byref(stride))
        np.ctypeslib.as_array(ptr, shape=(h, stride.value))[:, : w * channels] = \
            px.reshape(h, w * channels)
        if chroma == "444":
            nclx = lib.heif_nclx_color_profile_alloc()
            prof = _Nclx.from_address(nclx)
            prof.color_primaries = 1  # BT.709 (cosmetic under identity)
            prof.transfer_characteristics = 13  # sRGB
            prof.matrix_coefficients = 0  # identity / GBR: the lossless key
            prof.full_range_flag = 1
            _check(lib.heif_image_set_nclx_color_profile(img, nclx), "nclx")
        # 420: identity (GBR) is spec-illegal with subsampling — libheif
        # ABORTS on it; let the default BT.601 conversion apply instead
        opts = lib.heif_encoding_options_alloc()
        _check(lib.heif_context_encode_image(
            ctx, img, enc, opts, ctypes.byref(handle)), "encode")
        fd, path = tempfile.mkstemp(suffix=f".{fmt}")
        os.close(fd)
        try:
            _check(lib.heif_context_write_to_file(ctx, path.encode()), "write")
            with open(path, "rb") as fh:
                return fh.read()
        finally:
            os.unlink(path)
    finally:
        if handle:
            lib.heif_image_handle_release(handle)
        if img:
            lib.heif_image_release(img)
        if enc:
            lib.heif_encoder_release(enc)
        if nclx:
            lib.heif_nclx_color_profile_free(nclx)
        if opts:
            lib.heif_encoding_options_free(opts)
        lib.heif_context_free(ctx)
