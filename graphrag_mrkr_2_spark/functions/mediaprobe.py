"""Header-only metadata probes for compressed media containers.

Decode for MP4/H.264, MP3, AAC, Opus and Vorbis stays an explicit codec
seam (no decoder library exists in this environment, so no independent
oracle is possible — see operators/multimodal.py). But a 100-TB crawl
pipeline still has to CLASSIFY and ROUTE those payloads: the reference
accepts media uploads by extension/mimetype (ingestion/converters.py,
ingestion/document_processor.py) and records their metadata. These probes
parse the container headers for real — box/frame/page structures per the
public specs (ISO 14496-12, MPEG-1/2 audio frame headers, RFC 3533/7845,
the FLAC format spec) — returning kind/codec/dims/sample-rate/duration
without touching the entropy-coded payloads.

Every parser is defensive: malformed structures raise ValueError; callers
(operators/multimodal.probe_media) quarantine to kind-only metadata.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# MP4 / ISO BMFF (ISO 14496-12)
# ---------------------------------------------------------------------------

_MP4_VIDEO_CODECS = {b"avc1", b"avc3", b"hvc1", b"hev1", b"vp09", b"av01",
                     b"mp4v", b"h263", b"s263"}
_MP4_AUDIO_CODECS = {b"mp4a", b"opus", b"ac-3", b"ec-3", b"alac", b"flac",
                     b"samr", b"sawb",
                     # the registered fourccs are mixed-case (Encapsulation
                     # of Opus/FLAC in ISO-BMFF): an audio-only MP4 with a
                     # fLaC entry was misrouted kind=video (r7 review)
                     b"Opus", b"fLaC"}


def sniff_mp4(data: bytes) -> bool:
    return len(data) >= 12 and data[4:8] == b"ftyp"


def _walk_boxes(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        btype = data[pos + 4:pos + 8]
        header = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("MP4: truncated 64-bit box size")
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            header = 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < header or pos + size > end:
            raise ValueError("MP4: box overruns its container")
        yield btype, pos + header, pos + size
        pos += size


def _find_box(data: bytes, start: int, end: int, path: tuple):
    """First box matching a fourcc path, as (payload_start, payload_end)."""
    for btype, ps, pe in _walk_boxes(data, start, end):
        if btype == path[0]:
            if len(path) == 1:
                return ps, pe
            return _find_box(data, ps, pe, path[1:])
    return None


def _mvhd_duration_ms(data: bytes, moov_start: int, moov_end: int):
    """Presentation duration in ms from the mvhd inside [moov_start, moov_end),
    or None when absent / flagged unknown (the spec's all-ones sentinel)."""
    mvhd = _find_box(data, moov_start, moov_end, (b"mvhd",))
    if mvhd is None:
        return None
    ps = mvhd[0]
    version = data[ps]
    if version == 1:
        timescale, duration = struct.unpack_from(">IQ", data, ps + 20)
        unknown = duration == 0xFFFFFFFFFFFFFFFF
    else:
        timescale, duration = struct.unpack_from(">II", data, ps + 12)
        unknown = duration == 0xFFFFFFFF  # the spec's 'unknown' sentinel
    if timescale and not unknown:
        return int(duration * 1000 // timescale)
    return None


def _mvhd_timescale(data: bytes, moov_start: int, moov_end: int):
    """Movie timescale (ticks/second) from the mvhd, or None."""
    mvhd = _find_box(data, moov_start, moov_end, (b"mvhd",))
    if mvhd is None:
        return None
    ps = mvhd[0]
    off = 20 if data[ps] == 1 else 12
    if ps + off + 4 > mvhd[1]:
        return None
    (timescale,) = struct.unpack_from(">I", data, ps + off)
    return timescale or None


def _mehd_duration_ms(data: bytes, moov_start: int, moov_end: int):
    """Fragmented-movie duration from moov/mvex/mehd (ISO 14496-12
    §8.8.2: fragment_duration in mvhd-timescale ticks, covering the whole
    fragmented presentation), or None when mehd/mvex is absent.  This is
    the spec'd fast path for fMP4 probes — mvhd.duration is 0 there."""
    mehd = _find_box(data, moov_start, moov_end, (b"mvex", b"mehd"))
    if mehd is None:
        return None
    ps, pe = mehd
    timescale = _mvhd_timescale(data, moov_start, moov_end)
    if timescale is None:
        return None
    if pe - ps >= 12 and data[ps] == 1:
        (duration,) = struct.unpack_from(">Q", data, ps + 4)
    elif pe - ps >= 8 and data[ps] == 0:
        (duration,) = struct.unpack_from(">I", data, ps + 4)
    else:
        return None
    return int(duration * 1000 // timescale)


def _sidx_duration_ms(data: bytes):
    """Presentation duration from top-level segment-index boxes (ISO
    14496-12 §8.16.3), or None when no usable sidx exists.

    Two spec'd layouts: a hierarchical index (the first sidx carries
    reference_type=1 entries pointing at child sidx boxes — its own
    subsegment_durations already sum to the full duration, so later
    sidx boxes must NOT be added again) and a sequential per-segment
    chain (one media-referencing sidx per segment, same reference_ID —
    sum across all of them)."""
    total_ticks = 0
    first_timescale = None
    first_ref_id = None
    hierarchical = False
    for btype, ps, pe in _walk_boxes(data, 0, len(data)):
        if btype != b"sidx":
            continue
        if pe - ps < 12:
            raise ValueError("MP4: sidx header truncated")
        version = data[ps]
        ref_id, timescale = struct.unpack_from(">II", data, ps + 4)
        pos = ps + 12 + (16 if version else 8)  # skip EPT + first_offset
        if pos + 4 > pe:
            raise ValueError("MP4: sidx header truncated")
        (ref_count,) = struct.unpack_from(">H", data, pos + 2)
        pos += 4
        if first_timescale is None:
            first_timescale, first_ref_id = timescale, ref_id
        elif hierarchical or ref_id != first_ref_id:
            break  # parent already covered the presentation / other track
        if pos + 12 * ref_count > pe:
            raise ValueError("MP4: sidx references truncated")
        for _ in range(ref_count):
            (ref_word, dur) = struct.unpack_from(">II", data, pos)
            if ref_word >> 31:
                hierarchical = True
            total_ticks += dur
            pos += 12
    if first_timescale:
        return int(total_ticks * 1000 // first_timescale)
    return None


def probe_mp4(data: bytes) -> dict:
    """MP4/MOV: duration from mvhd — falling back to mvex/mehd then sidx
    for fragmented files, where mvhd.duration is 0/absent (r7) — dims
    from the first video tkhd, codec from the first stsd sample entry
    (video preferred)."""
    if not sniff_mp4(data):
        raise ValueError("not an MP4 (no ftyp box)")
    out = {"kind": "video", "codec": None, "width": None, "height": None,
           "duration_ms": None}
    moov = _find_box(data, 0, len(data), (b"moov",))
    if moov is None:
        # streaming/fragmented file with moov beyond the prefix — a sidx
        # in the prefix can still yield the duration
        out["duration_ms"] = _sidx_duration_ms(data)
        return out
    ms, me = moov
    out["duration_ms"] = (_mvhd_duration_ms(data, ms, me)
                          or _mehd_duration_ms(data, ms, me)
                          or _sidx_duration_ms(data))
    video_seen = False
    for btype, ts, te in _walk_boxes(data, ms, me):
        if btype != b"trak":
            continue
        stsd = _find_box(data, ts, te, (b"mdia", b"minf", b"stbl", b"stsd"))
        if stsd is None:
            continue
        ps, pe = stsd
        if pe - ps < 16:
            continue
        entry_type = data[ps + 12:ps + 16]  # first sample entry fourcc
        is_video = entry_type in _MP4_VIDEO_CODECS
        if is_video and not video_seen:
            video_seen = True
            out["codec"] = entry_type.decode("ascii", "replace")
            tkhd = _find_box(data, ts, te, (b"tkhd",))
            if tkhd is not None:
                hs, he = tkhd
                if he - hs >= 8:  # width/height are the last two 16.16s
                    w_fx, h_fx = struct.unpack_from(">II", data, he - 8)
                    out["width"], out["height"] = w_fx >> 16, h_fx >> 16
        elif out["codec"] is None and entry_type in _MP4_AUDIO_CODECS:
            out["codec"] = entry_type.decode("ascii", "replace")
    if not video_seen and out["codec"] is not None:
        out["kind"] = "audio"
    return out


# ---------------------------------------------------------------------------
# AVIF / HEIC still images and sequences (ISO 23008-12 item boxes over BMFF)
# ---------------------------------------------------------------------------

_HEIF_BRANDS = {b"avif", b"avis", b"heic", b"heix", b"heim", b"heis",
                b"hevc", b"hevx", b"mif1", b"msf1"}
_HEIF_CODEC_PROPS = {b"av1C": "av1", b"hvcC": "hevc", b"vvcC": "vvc"}


def _ftyp_brands(data: bytes) -> list:
    """Major brand + compatible brands from a leading ftyp box.

    A malformed size (< 16, incl. the 0/1 to-EOF/64-bit escapes a real
    ftyp never uses) returns [] rather than scanning arbitrary payload
    bytes as brands (review r6 finding #4 — an adversarial MP4 body
    containing the bytes 'avif' must not reroute a video to the image
    path)."""
    if len(data) < 16 or data[4:8] != b"ftyp":
        return []
    (size,) = struct.unpack_from(">I", data, 0)
    if size < 16:
        return []
    end = min(size, len(data))
    return [data[pos:pos + 4] for pos in range(8, end - 3, 4)
            if pos != 12]  # skip minor_version at offset 12


def sniff_heif(data: bytes) -> bool:
    """True when the ftyp major or compatible brands name a HEIF image
    (AVIF/HEIC family). Must be sniffed BEFORE generic MP4 — every HEIF
    file also satisfies sniff_mp4."""
    return any(b in _HEIF_BRANDS for b in _ftyp_brands(data))


def _pitm_item_id(data: bytes, ms: int, me: int):
    """Primary item ID from the pitm FullBox, or None."""
    pitm = _find_box(data, ms, me, (b"pitm",))
    if pitm is None:
        return None
    ps, pe = pitm
    if data[ps] == 0 and pe - ps >= 6:
        return struct.unpack_from(">H", data, ps + 4)[0]
    if data[ps] >= 1 and pe - ps >= 8:
        return struct.unpack_from(">I", data, ps + 4)[0]
    return None


def _ipma_property_indices(data: bytes, ms: int, me: int, item_id: int):
    """1-based ipco child indices associated with item_id (ipma FullBox;
    flags&1 selects 15-bit vs 7-bit property indices)."""
    ipma = _find_box(data, ms, me, (b"iprp", b"ipma"))
    if ipma is None or item_id is None:
        return []
    ps, pe = ipma
    if ps + 8 > pe:
        raise ValueError("HEIF: ipma header truncated")
    version = data[ps]
    flags = struct.unpack_from(">I", data, ps)[0] & 0xFFFFFF
    pos = ps + 4
    (count,) = struct.unpack_from(">I", data, pos)
    pos += 4
    for _ in range(count):
        if pos >= pe:
            break
        iid_w = 2 if version < 1 else 4
        if pos + iid_w + 1 > pe:
            raise ValueError("HEIF: ipma entry truncated")
        if version < 1:
            (iid,) = struct.unpack_from(">H", data, pos)
        else:
            (iid,) = struct.unpack_from(">I", data, pos)
        pos += iid_w
        assoc_count = data[pos]
        pos += 1
        idxs = []
        for _ in range(assoc_count):
            if flags & 1:
                if pos + 2 > pe:
                    raise ValueError("HEIF: ipma association truncated")
                (raw,) = struct.unpack_from(">H", data, pos)
                pos += 2
                idxs.append(raw & 0x7FFF)  # bit 15 = essential flag
            else:
                if pos >= pe:
                    raise ValueError("HEIF: ipma association truncated")
                raw = data[pos]
                pos += 1
                idxs.append(raw & 0x7F)  # bit 7 = essential flag
        if iid == item_id:
            return [i for i in idxs if i]  # index 0 = "no property"
    return []


def probe_heif(data: bytes) -> dict:
    """AVIF/HEIC: dims from the PRIMARY item's ispe property — resolved
    pitm → ipma → ipco index, because real encoders put the alpha/thumb
    item's ispe first in ipco; falls back to the first ispe when the
    association walk fails. Codec from the av1C/hvcC/vvcC config property
    (brand fallback), duration from the moov mvhd for image sequences
    (avis/msf1 animated AVIF)."""
    if not sniff_heif(data):
        raise ValueError("not a HEIF/AVIF (no HEIF brand in ftyp)")
    out = {"kind": "image", "codec": None, "width": None, "height": None,
           "duration_ms": None}
    meta = _find_box(data, 0, len(data), (b"meta",))
    if meta is not None:
        ms, me = meta[0] + 4, meta[1]  # meta is a FullBox: skip version/flags
        ipco = _find_box(data, ms, me, (b"iprp", b"ipco"))
        if ipco is not None:
            props = list(_walk_boxes(data, ipco[0], ipco[1]))
            try:
                assoc = _ipma_property_indices(
                    data, ms, me, _pitm_item_id(data, ms, me))
            except Exception:
                assoc = []  # malformed ipma/pitm: fall back to ipco order
            pool = [props[i - 1] for i in assoc if 0 < i <= len(props)]
            pool += props  # primary item's properties take precedence
            for btype, ps, pe in pool:
                if btype == b"ispe" and pe - ps >= 12 and out["width"] is None:
                    w, h = struct.unpack_from(">II", data, ps + 4)
                    out["width"], out["height"] = int(w), int(h)
                elif out["codec"] is None and btype in _HEIF_CODEC_PROPS:
                    out["codec"] = _HEIF_CODEC_PROPS[btype]
    if out["codec"] is None:
        brands = set(_ftyp_brands(data))
        if brands & {b"avif", b"avis"}:
            out["codec"] = "av1"
        elif brands & (_HEIF_BRANDS - {b"avif", b"avis", b"mif1", b"msf1"}):
            out["codec"] = "hevc"
    # animated AVIF / HEIF sequence: a moov track carries the timing, same
    # convention as animated GIF/WEBP (kind stays image, duration_ms set).
    # Guarded: a truncated mdat (bounded-prefix reads) must not discard the
    # dims/codec already parsed from meta (review r6 finding #2)
    try:
        moov = _find_box(data, 0, len(data), (b"moov",))
        if moov is not None:
            out["duration_ms"] = _mvhd_duration_ms(data, moov[0], moov[1])
    except Exception:
        pass
    return out


# ---------------------------------------------------------------------------
# MP3 (MPEG-1/2 audio frame header + ID3v2 skip)
# ---------------------------------------------------------------------------

_MP3_BITRATES_V1L3 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                      224, 256, 320, 0)
_MP3_BITRATES_V2L3 = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                      144, 160, 0)
_MP3_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000),
              0: (11025, 12000, 8000)}  # version bits -> rates


def sniff_mp3(data: bytes) -> bool:
    if data[:3] == b"ID3":
        return True
    return _find_mp3_frame(data, limit=4096) is not None


def _id3v2_size(data: bytes) -> int:
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    ss = data[6:10]
    return 10 + ((ss[0] & 0x7F) << 21 | (ss[1] & 0x7F) << 14
                 | (ss[2] & 0x7F) << 7 | (ss[3] & 0x7F))


def _parse_mp3_header(data: bytes, pos: int):
    if pos + 4 > len(data):
        return None
    b1, b2, b3 = data[pos + 1], data[pos + 2], data[pos + 3]
    if data[pos] != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    version = (b1 >> 3) & 3       # 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
    layer = (b1 >> 1) & 3         # 1 = Layer III
    if version == 1 or layer != 1:
        return None
    bitrate_idx = (b2 >> 4) & 0xF
    rate_idx = (b2 >> 2) & 3
    if rate_idx == 3:
        return None
    table = _MP3_BITRATES_V1L3 if version == 3 else _MP3_BITRATES_V2L3
    bitrate = table[bitrate_idx] * 1000
    if not bitrate:
        return None
    sample_rate = _MP3_RATES[version][rate_idx]
    padding = (b2 >> 1) & 1
    spf = 1152 if version == 3 else 576  # samples per Layer-III frame
    frame_len = spf // 8 * bitrate // sample_rate + padding
    channels = 1 if ((b3 >> 6) & 3) == 3 else 2
    return {"bitrate": bitrate, "sample_rate": sample_rate,
            "frame_len": frame_len, "channels": channels, "spf": spf}


def _find_mp3_frame(data: bytes, limit: int = 1 << 16):
    pos = _id3v2_size(data)
    end = min(len(data) - 4, pos + limit)
    while pos <= end:
        hdr = _parse_mp3_header(data, pos)
        if hdr is not None:
            # require a second consistent frame right after (kills random
            # 0xFFEx byte pairs inside non-MP3 payloads)
            nxt = _parse_mp3_header(data, pos + hdr["frame_len"])
            if nxt is not None and nxt["sample_rate"] == hdr["sample_rate"]:
                return pos, hdr
        pos += 1
    return None


def probe_mp3(data: bytes) -> dict:
    """MP3: first valid Layer-III frame header (after ID3v2) gives
    rate/channels; duration is the CBR estimate over the payload bytes."""
    found = _find_mp3_frame(data)
    if found is None:
        raise ValueError("no MP3 frame sync found")
    pos, hdr = found
    audio_bytes = len(data) - pos
    return {
        "kind": "audio",
        "codec": "mp3",
        "sample_rate": hdr["sample_rate"],
        "channels": hdr["channels"],
        "duration_ms": int(audio_bytes * 8000 // hdr["bitrate"]),
    }


# ---------------------------------------------------------------------------
# Ogg (RFC 3533) carrying Opus (RFC 7845) or Vorbis
# ---------------------------------------------------------------------------


def sniff_ogg(data: bytes) -> bool:
    return data[:4] == b"OggS"


def probe_ogg(data: bytes) -> dict:
    """Ogg: codec from the first page's payload magic; duration from the
    last page's granule position (Opus: 48 kHz ticks minus pre-skip;
    Vorbis: sample-rate ticks)."""
    if not sniff_ogg(data):
        raise ValueError("not an Ogg stream")
    if len(data) < 28:
        raise ValueError("Ogg: truncated first page")
    nseg = data[26]
    payload0 = 27 + nseg
    head = data[payload0:payload0 + 16]
    out = {"kind": "audio", "codec": None, "sample_rate": None,
           "channels": None, "duration_ms": None}
    pre_skip = 0
    if head.startswith(b"\x80theora"):
        out["kind"], out["codec"] = "video", "theora"
        return out
    if head.startswith(b"OpusHead"):
        out["codec"] = "opus"
        out["channels"] = head[9]
        pre_skip = struct.unpack_from("<H", data, payload0 + 10)[0]
        out["sample_rate"] = 48000  # Opus always decodes at 48 kHz
        tick_rate = 48000
    elif head.startswith(b"\x01vorbis"):
        out["codec"] = "vorbis"
        out["channels"] = data[payload0 + 11]
        out["sample_rate"] = struct.unpack_from("<I", data, payload0 + 12)[0]
        tick_rate = out["sample_rate"]
    else:
        return out  # other codec: kind only
    # final granule: scan the tail backwards for the last VALID page header
    # — a raw 'OggS' match inside entropy-coded packet data is expected at
    # crawl scale, so require version 0 and a segment table that fits
    # (review r5 finding #3)
    tail_start = max(0, len(data) - (1 << 16))
    last = data.rfind(b"OggS", tail_start)
    while last >= 0:
        if last + 27 <= len(data) and data[last + 4] == 0:
            nseg = data[last + 26]
            if last + 27 + nseg <= len(data):
                (granule,) = struct.unpack_from("<q", data, last + 6)
                if granule > 0 and tick_rate:
                    samples = max(0, granule - pre_skip)
                    out["duration_ms"] = int(samples * 1000 // tick_rate)
                break
        last = data.rfind(b"OggS", tail_start, last)
    return out


# ---------------------------------------------------------------------------
# FLAC (format spec: fLaC magic + STREAMINFO)
# ---------------------------------------------------------------------------


def sniff_flac(data: bytes) -> bool:
    return data[:4] == b"fLaC"


def probe_flac(data: bytes) -> dict:
    """FLAC STREAMINFO: exact sample rate / channels / duration."""
    if not sniff_flac(data):
        raise ValueError("not a FLAC stream")
    if len(data) < 8 + 34 or (data[4] & 0x7F) != 0:
        raise ValueError("FLAC: first metadata block is not STREAMINFO")
    si = data[8:8 + 34]
    sample_rate = (si[10] << 12) | (si[11] << 4) | (si[12] >> 4)
    channels = ((si[12] >> 1) & 0x7) + 1
    total = ((si[13] & 0x0F) << 32) | struct.unpack_from(">I", si, 14)[0]
    out = {"kind": "audio", "codec": "flac", "sample_rate": sample_rate,
           "channels": channels, "duration_ms": None}
    if sample_rate:
        out["duration_ms"] = int(total * 1000 // sample_rate)
    return out


# ---------------------------------------------------------------------------
# animation durations for formats we DO decode (header walk, no decode)
# ---------------------------------------------------------------------------


def webp_animation_info(data: bytes):
    """(n_frames, total_duration_ms) for an animated WEBP, else None —
    a pure chunk walk (ANMF headers), no frame decode."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        return None
    pos = 12
    n, total = 0, 0
    while pos + 8 <= len(data):
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        if fourcc == b"ANMF" and size >= 16:
            n += 1
            total += (data[pos + 20] | (data[pos + 21] << 8)
                      | (data[pos + 22] << 16))
        pos += 8 + size + (size & 1)
    # n > 1 to match gif_animation_info: a one-frame ANMF container is a
    # de-facto still and gets no duration (review r5 finding #5)
    return (n, total) if n > 1 else None


def gif_animation_info(data: bytes):
    """(n_frames, total_duration_ms) for an animated GIF, else None —
    walks blocks skipping LZW sub-blocks, reading GCE delays only."""
    if data[:6] not in (b"GIF87a", b"GIF89a") or len(data) < 13:
        return None
    pos = 13
    flags = data[10]
    if flags & 0x80:  # global color table
        pos += 3 * (2 << (flags & 7))
    n, total, delay = 0, 0, 0
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            if pos + 2 > len(data):
                break
            label = data[pos + 1]
            pos += 2
            if label == 0xF9 and pos + 5 <= len(data):  # GCE
                delay = struct.unpack_from("<H", data, pos + 2)[0] * 10
            while pos < len(data) and data[pos]:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            n += 1
            total += delay
            delay = 0
            if pos + 10 > len(data):
                break
            lflags = data[pos + 9]
            pos += 10
            if lflags & 0x80:
                pos += 3 * (2 << (lflags & 7))
            pos += 1  # LZW min code size
            while pos < len(data) and data[pos]:
                pos += 1 + data[pos]
            pos += 1
        else:
            break  # malformed: stop, report what we saw
    return (n, total) if n > 1 else None


# ---------------------------------------------------------------------------
# Matroska / WebM (EBML)
# ---------------------------------------------------------------------------

_EBML_MAGIC = b"\x1a\x45\xdf\xa3"
# element ids (already including their length-marker bits)
_MKV_SEGMENT = 0x18538067
_MKV_INFO = 0x1549A966
_MKV_TRACKS = 0x1654AE6B
_MKV_TIMESCALE = 0x2AD7B1
_MKV_DURATION = 0x4489
_MKV_TRACKENTRY = 0xAE
_MKV_TRACKTYPE = 0x83
_MKV_CODECID = 0x86
_MKV_VIDEO = 0xE0
_MKV_AUDIO = 0xE1
_MKV_PIXELW = 0xB0
_MKV_PIXELH = 0xBA
_MKV_SAMPLERATE = 0xB5
_MKV_CHANNELS = 0x9F


def sniff_mkv(data: bytes) -> bool:
    return data[:4] == _EBML_MAGIC


def _ebml_vint(data: bytes, pos: int, keep_marker: bool):
    """(value, next_pos) for an EBML variable-length integer."""
    if pos >= len(data):
        raise ValueError("EBML: truncated vint")
    first = data[pos]
    if first == 0:
        raise ValueError("EBML: invalid vint leading byte")
    length = 1
    mask = 0x80
    while not (first & mask):
        mask >>= 1
        length += 1
    if pos + length > len(data):
        raise ValueError("EBML: vint overruns buffer")
    v = first if keep_marker else (first & (mask - 1))
    for i in range(1, length):
        v = (v << 8) | data[pos + i]
    if not keep_marker and v == (1 << (7 * length)) - 1:
        v = None  # all-ones data bits: the spec's "unknown size"
    return v, pos + length


def _walk_ebml(data: bytes, pos: int, end: int):
    while pos < end:
        eid, pos = _ebml_vint(data, pos, keep_marker=True)
        size, pos = _ebml_vint(data, pos, keep_marker=False)
        if size is None:
            # unknown-size element (streamed Segment/Cluster): extends to
            # the end of its parent scope (review r5 finding)
            size = end - pos
        if pos + size > end:
            raise ValueError("EBML: element overruns its parent")
        yield eid, pos, pos + size
        pos += size


def _ebml_uint(data: bytes, start: int, end: int) -> int:
    v = 0
    for b in data[start:end]:
        v = (v << 8) | b
    return v


def _ebml_float(data: bytes, start: int, end: int) -> float:
    n = end - start
    if n == 0:
        return 0.0  # zero-length element encodes the default value
    if n == 4:
        return struct.unpack(">f", data[start:end])[0]
    if n == 8:
        return struct.unpack(">d", data[start:end])[0]
    raise ValueError(f"EBML: bad float size {n}")


def probe_mkv(data: bytes) -> dict:
    """Matroska/WebM: duration from Info (TimecodeScale x Duration), codec
    and dims/rate from the first video (preferred) or audio TrackEntry."""
    if not sniff_mkv(data):
        raise ValueError("not an EBML/Matroska stream")
    out = {"kind": "video", "codec": None, "width": None, "height": None,
           "duration_ms": None, "sample_rate": None, "channels": None}
    segment = None
    for eid, ps, pe in _walk_ebml(data, 0, len(data)):
        if eid == _MKV_SEGMENT:
            segment = (ps, pe)
            break
    if segment is None:
        return out
    timescale = 1_000_000  # default: 1 ms ticks
    duration_ticks = None
    first_video = None  # (codec, w, h)
    first_audio = None  # (codec, rate, channels)
    for eid, ps, pe in _walk_ebml(data, segment[0], segment[1]):
        if eid == _MKV_INFO:
            for iid, ips, ipe in _walk_ebml(data, ps, pe):
                if iid == _MKV_TIMESCALE:
                    timescale = _ebml_uint(data, ips, ipe)
                elif iid == _MKV_DURATION:
                    duration_ticks = _ebml_float(data, ips, ipe)
        elif eid == _MKV_TRACKS:
            for tid, tps, tpe in _walk_ebml(data, ps, pe):
                if tid != _MKV_TRACKENTRY:
                    continue
                ttype, codec = None, None
                vdims, adims = (None, None), (None, None)
                for fid, fps, fpe in _walk_ebml(data, tps, tpe):
                    if fid == _MKV_TRACKTYPE:
                        ttype = _ebml_uint(data, fps, fpe)
                    elif fid == _MKV_CODECID:
                        codec = _mkv_codec_name(data[fps:fpe])
                    elif fid == _MKV_VIDEO:
                        w = h = None
                        for vid, vps, vpe in _walk_ebml(data, fps, fpe):
                            if vid == _MKV_PIXELW:
                                w = _ebml_uint(data, vps, vpe)
                            elif vid == _MKV_PIXELH:
                                h = _ebml_uint(data, vps, vpe)
                        vdims = (w, h)
                    elif fid == _MKV_AUDIO:
                        rate = ch = None
                        for aid, aps, ape in _walk_ebml(data, fps, fpe):
                            if aid == _MKV_SAMPLERATE:
                                rate = int(_ebml_float(data, aps, ape))
                            elif aid == _MKV_CHANNELS:
                                ch = _ebml_uint(data, aps, ape)
                        adims = (rate, ch)
                if ttype == 1 and first_video is None:
                    first_video = (codec, *vdims)
                elif ttype == 2 and first_audio is None:
                    first_audio = (codec, *adims)
    # video track wins; audio fields surface only for audio-only files so
    # track ORDER in the container cannot change the result (review r5)
    if first_video is not None:
        out["codec"], out["width"], out["height"] = first_video
    elif first_audio is not None:
        out["kind"] = "audio"
        out["codec"], out["sample_rate"], out["channels"] = first_audio
    if duration_ticks is not None and timescale:
        out["duration_ms"] = int(duration_ticks * timescale / 1_000_000)
    return out


def _mkv_codec_name(raw: bytes) -> str:
    """Matroska CodecID -> the short lowercase convention the other probes
    use ('V_VP9' -> 'vp9', 'A_OPUS' -> 'opus')."""
    name = raw.decode("ascii", "replace")
    if len(name) > 2 and name[1] == "_" and name[0] in "VAS":
        name = name[2:]
    name = name.lower()
    # the MPEG family IDs carry a path-ish suffix; collapse to the short
    # names the MP4/HEIF probes use so routing can compare one string
    return {"mpegh/iso/hevc": "hevc", "mpeg4/iso/avc": "h264",
            "mpegi/iso/vvc": "vvc"}.get(name, name)


def _mkv_num_vint(data: bytes, pos: int, end: int):
    """EBML vint as a plain NUMBER (track numbers): unlike element SIZES,
    an all-ones pattern here is a valid value (0xFF = track 127), not the
    'unknown size' sentinel — mapping it to None silently drops every
    block of tracks numbered 127, 16383, … Returns (value, next_pos) or
    (None, pos) on malformed/truncated input."""
    if pos >= end:
        return None, pos
    b0 = data[pos]
    if b0 == 0:
        return None, pos
    length, mask = 1, 0x80
    while not (b0 & mask):
        length += 1
        mask >>= 1
    if pos + length > end:
        return None, pos
    val = b0 & (mask - 1)
    for i in range(1, length):
        val = (val << 8) | data[pos + i]
    return val, pos + length


def _delace(data: bytes, pos: int, bpe: int, flags: int) -> list:
    """Frame payload extents for a (possibly laced) block body.

    ``pos`` points just past the block's flags byte, ``bpe`` is the block
    end.  Returns ``[(start, end), ...]`` — one extent per frame, in
    order, covering the body exactly.  Implements all three Matroska
    lacing modes (Xiph 0x02, fixed-size 0x04, EBML 0x06); audio tracks
    lace routinely (Vorbis/MP3 pack many short frames per block), so the
    audio demuxer needs real de-lacing, not a skip.  Malformed lace
    tables raise ValueError — callers quarantine."""
    lacing = flags & 0x06
    if lacing == 0:
        return [(pos, bpe)]
    if pos >= bpe:
        raise ValueError("MKV: laced block missing frame count")
    n = data[pos] + 1
    pos += 1
    if lacing == 0x04:  # fixed-size: remainder splits evenly
        total = bpe - pos
        if total % n:
            raise ValueError("MKV: fixed lacing body not divisible")
        step = total // n
        return [(pos + i * step, pos + (i + 1) * step) for i in range(n)]
    sizes = []
    if lacing == 0x02:  # Xiph: runs of 255 + terminator, first n-1 frames
        for _ in range(n - 1):
            sz = 0
            while True:
                if pos >= bpe:
                    raise ValueError("MKV: Xiph lace sizes truncated")
                b = data[pos]
                pos += 1
                sz += b
                if b != 255:
                    break
            sizes.append(sz)
    else:  # 0x06 EBML: first size a vint, then signed-vint deltas
        sz, npos = _mkv_num_vint(data, pos, bpe)
        if sz is None:
            raise ValueError("MKV: EBML lace first size malformed")
        sizes.append(sz)
        pos = npos
        for _ in range(n - 2):
            raw, npos = _mkv_num_vint(data, pos, bpe)
            if raw is None:
                raise ValueError("MKV: EBML lace delta malformed")
            # signed vint: unsigned value minus the length-keyed bias
            delta = raw - ((1 << (7 * (npos - pos) - 1)) - 1)
            sizes.append(sizes[-1] + delta)
            pos = npos
    out = []
    for sz in sizes:
        if sz < 0 or pos + sz > bpe:
            raise ValueError("MKV: lace frame overruns block")
        out.append((pos, pos + sz))
        pos += sz
    out.append((pos, bpe))  # last frame: the remainder
    return out


def mkv_track_blocks(data: bytes, want_type: int, codec_filter=None,
                     on_laced: str = "raise"):
    """Shared Matroska/WebM block walk for the video demuxer
    (av1codec.mkv_video_samples), audio demuxer
    (multimodal.sample_audio_payloads) and subtitle extraction
    (subtitles.mkv_subtitle_cues) — one implementation of track
    selection, TimestampScale handling, cluster-base + s16-relative
    timestamps, SimpleBlock/BlockGroup framing, and lacing.

    Returns ``(track, blocks)``: ``track`` is ``{"num", "codec",
    "codec_private"}`` — plus ``sample_rate``/``channels`` when the
    TrackEntry carries an Audio element, and ``default_duration_ns``
    when present — for the FIRST track of ``want_type`` (1=video,
    2=audio, 0x11=subtitle; ``codec_filter(codec_id_bytes)`` optionally
    narrows), or None when absent; ``blocks`` is a generator of
    ``(ts_ms, keyframe, duration_ms, payload)`` in stream order.

    Keyframe flags: SimpleBlocks carry theirs in bit 0x80; BlockGroup
    blocks are keyframes iff the group has NO ReferenceBlock (0xFB)
    child, per the Matroska spec — treating every BlockGroup as a
    keyframe routed VP8 interframes into the keyframe-only decode path
    (ADVICE r6 finding).

    Robustness pinned by review r6: a two-pass Segment walk reads
    Info+Tracks BEFORE any Cluster, so the legal Tracks-after-Cluster
    ordering some remuxers emit yields cues instead of silently nothing;
    block track numbers parse via ``_mkv_num_vint`` so all-ones vints
    (track 127…) aren't dropped as 'unknown size'. ``on_laced``:
    'raise' (video — a skipped frame breaks inter prediction anyway),
    'skip' (subtitles — cues are independent; one laced block must not
    void a file of good cues), or 'expand' (audio — de-lace into one
    yield per frame, timestamps spaced by the track DefaultDuration
    when declared, sharing the block timestamp otherwise).
    """
    if not sniff_mkv(data):
        raise ValueError("not a Matroska/WebM file")
    seg = None
    for eid, ps, pe in _walk_ebml(data, 0, len(data)):
        if eid == _MKV_SEGMENT:
            seg = (ps, pe)
            break
    if seg is None:
        return None, iter(())

    timescale_ns = 1_000_000
    track = None
    for seid, sps, spe in _walk_ebml(data, seg[0], seg[1]):
        if seid == _MKV_INFO:
            for ieid, ips, ipe in _walk_ebml(data, sps, spe):
                if ieid == _MKV_TIMESCALE:
                    timescale_ns = _ebml_uint(data, ips, ipe) or timescale_ns
        elif seid == _MKV_TRACKS and track is None:
            for teid, tps, tpe in _walk_ebml(data, sps, spe):
                if teid != _MKV_TRACKENTRY:
                    continue
                num = ttype = default_dur = None
                codec, private = b"", None
                sample_rate = channels = None
                for feid, fps, fpe in _walk_ebml(data, tps, tpe):
                    if feid == 0xD7:
                        num = _ebml_uint(data, fps, fpe)
                    elif feid == _MKV_TRACKTYPE:
                        ttype = _ebml_uint(data, fps, fpe)
                    elif feid == _MKV_CODECID:
                        codec = data[fps:fpe]
                    elif feid == 0x63A2:  # CodecPrivate
                        private = data[fps:fpe]
                    elif feid == 0x23E383:  # DefaultDuration (ns)
                        default_dur = _ebml_uint(data, fps, fpe)
                    elif feid == _MKV_AUDIO:
                        for aeid, aps, ape in _walk_ebml(data, fps, fpe):
                            if aeid == _MKV_SAMPLERATE:
                                sample_rate = _ebml_float(data, aps, ape)
                            elif aeid == _MKV_CHANNELS:
                                channels = _ebml_uint(data, aps, ape)
                if (ttype == want_type and num is not None
                        and (codec_filter is None or codec_filter(codec))):
                    track = {"num": num, "codec": codec,
                             "codec_private": private,
                             "default_duration_ns": default_dur,
                             "sample_rate": sample_rate,
                             "channels": channels}
                    break
    if track is None:
        return None, iter(())

    import struct as _st

    def _blocks():
        for seid, sps, spe in _walk_ebml(data, seg[0], seg[1]):
            if seid != 0x1F43B675:  # Cluster
                continue
            cluster_ts = 0
            for ceid, cps, cpe in _walk_ebml(data, sps, spe):
                if ceid == 0xE7:  # Cluster Timestamp
                    cluster_ts = _ebml_uint(data, cps, cpe) or 0
                elif ceid in (0xA3, 0xA0):  # SimpleBlock | BlockGroup
                    bps, bpe = cps, cpe
                    duration = 0
                    group_keyframe = None
                    if ceid == 0xA0:
                        blk, referenced = None, False
                        for geid, gps, gpe in _walk_ebml(data, cps, cpe):
                            if geid == 0xA1:  # Block
                                blk = (gps, gpe)
                            elif geid == 0x9B:  # BlockDuration
                                duration = _ebml_uint(data, gps, gpe) or 0
                            elif geid == 0xFB:  # ReferenceBlock
                                referenced = True
                        if blk is None:
                            continue
                        bps, bpe = blk
                        # spec: a BlockGroup block is a keyframe iff it
                        # references nothing (no ReferenceBlock child)
                        group_keyframe = not referenced
                    tnum, pos = _mkv_num_vint(data, bps, bpe)
                    if tnum is None or pos + 3 > bpe:
                        continue
                    if tnum != track["num"]:
                        continue
                    rel_ts = _st.unpack_from(">h", data, pos)[0]
                    flags = data[pos + 2]
                    if flags & 0x06 and on_laced != "expand":
                        if on_laced == "raise":
                            raise ValueError("MKV: laced blocks unsupported")
                        continue  # skip: one laced block, not the file
                    ts_ms = (cluster_ts + rel_ts) * timescale_ns // 1_000_000
                    dur_ms = duration * timescale_ns // 1_000_000
                    keyframe = (group_keyframe if group_keyframe is not None
                                else bool(flags & 0x80))
                    extents = _delace(data, pos + 3, bpe, flags)
                    if len(extents) == 1:
                        s0, e0 = extents[0]
                        yield int(ts_ms), keyframe, int(dur_ms), data[s0:e0]
                        continue
                    # laced frames have implicit timestamps: spaced by the
                    # track DefaultDuration when declared, else sharing the
                    # block timestamp (duration then unknowable → 0)
                    dd_ns = track.get("default_duration_ns") or 0
                    for i, (fs, fe) in enumerate(extents):
                        f_ts = int(ts_ms + i * dd_ns // 1_000_000)
                        f_dur = int(dd_ns // 1_000_000)
                        yield f_ts, keyframe, f_dur, data[fs:fe]

    return track, _blocks()
