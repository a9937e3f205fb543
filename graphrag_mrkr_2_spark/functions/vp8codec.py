"""Lossy WEBP (VP8 keyframe) decoder — pure stdlib + numpy.

Decodes the VP8 intra-frame bitstream per RFC 6386: boolean entropy
decoder (§7), keyframe headers (§9), intra mode parsing (§11), token /
coefficient decode (§13), dequantization (§14.1), inverse DCT/WHT
(§14.3-14.4), intra prediction (§12) and the in-loop deblocking filter
(§15).  Only keyframes (i.e. still images — every lossy WEBP) are
supported; interframes need a reference-frame store that a still-image
pipeline never exercises.

Conformance: tests/test_vp8codec.py pins the decoded Y/U/V planes
bit-exact against the system libwebp (``WebPDecodeYUV``) over random and
structured images at several quality levels / sizes, and the RGB output
bit-exact against ``WebPDecodeRGB`` (fancy upsampling).  The reference
system consumes WEBP via PIL inside its image loader
(/root/reference/ingestion/loaders/image_loader.py:20-60); this repo
decodes natively so the Spark path has no C extension dependency.

Scale note: this is the correctness/default path of the media seam —
CPU cost is disclosed in SCALE.md alongside the JPEG kernels, and a
native codec can be injected through the decode seam in
operators/multimodal.py for 100-TB image corpora.
"""

from __future__ import annotations

import struct

import numpy as np

from graphrag_mrkr_2_spark.functions._vp8tables import (
    AC_QLOOKUP,
    COEFF_PROBS,
    COEFF_UPDATE_PROBS,
    DC_QLOOKUP,
    KF_BMODE_PROBS,
)

# --------------------------------------------------------------------------
# small constant tables (RFC 6386 §11, §13, §14)
# --------------------------------------------------------------------------

# intra 16x16 / chroma modes
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4
# intra 4x4 submodes.  NOTE: the vendored KF_BMODE_PROBS table is indexed
# by this ordering (RD/VR before LD/VL), which is how the spec tables are
# laid out in the deployed decoders; RFC 6386's enum listing orders
# LD,RD,VR,VL instead — the tree *structure* is identical, so only these
# context-index values care.
(B_DC, B_TM, B_VE, B_HE, B_RD, B_VR, B_LD, B_VL, B_HD, B_HU) = range(10)

# tree tables: pairs (left, right); negative = -1 - leaf_value
def _leaf(v: int) -> int:
    return -1 - v

KF_YMODE_TREE = (_leaf(B_PRED), 2, 4, 6, _leaf(DC_PRED), _leaf(V_PRED),
                 _leaf(H_PRED), _leaf(TM_PRED))
KF_YMODE_PROBS = (145, 156, 163, 128)

UV_MODE_TREE = (_leaf(DC_PRED), 2, _leaf(V_PRED), 4, _leaf(H_PRED),
                _leaf(TM_PRED))
KF_UV_MODE_PROBS = (142, 114, 183)

BMODE_TREE = (_leaf(B_DC), 2,
              _leaf(B_TM), 4,
              _leaf(B_VE), 6,
              8, 12,
              _leaf(B_HE), 10,
              _leaf(B_RD), _leaf(B_VR),
              _leaf(B_LD), 14,
              _leaf(B_VL), 16,
              _leaf(B_HD), _leaf(B_HU))

# 16x16 mode -> implied submode for neighbor context (RFC §11.3)
_MODE_TO_B = {DC_PRED: B_DC, V_PRED: B_VE, H_PRED: B_HE, TM_PRED: B_TM}

ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)
BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)

# DCT token extra-bit probabilities (§13.2 Pcat1..Pcat6)
_CAT_PROBS = ((159,), (165, 145), (173, 148, 140), (176, 155, 140, 135),
              (180, 157, 141, 134, 130),
              (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129))
_CAT_BASE = (5, 7, 11, 19, 35, 67)


def _clip127(v: int) -> int:
    return 0 if v < 0 else (127 if v > 127 else v)


# --------------------------------------------------------------------------
# boolean entropy decoder (RFC 6386 §7)
# --------------------------------------------------------------------------


class _BoolDec:
    __slots__ = ("data", "pos", "val", "rng", "bits")

    def __init__(self, data: bytes) -> None:
        self.data = data
        b0 = data[0] if len(data) > 0 else 0
        b1 = data[1] if len(data) > 1 else 0
        self.val = (b0 << 8) | b1
        self.pos = min(2, len(data))
        self.rng = 255
        self.bits = 0

    def bit(self, prob: int) -> int:
        split = 1 + (((self.rng - 1) * prob) >> 8)
        big = split << 8
        if self.val >= big:
            ret = 1
            self.rng -= split
            self.val -= big
        else:
            ret = 0
            self.rng = split
        while self.rng < 128:
            self.val <<= 1
            self.rng <<= 1
            self.bits += 1
            if self.bits == 8:
                self.bits = 0
                if self.pos < len(self.data):
                    self.val |= self.data[self.pos]
                    self.pos += 1
        return ret

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit(128)
        return v

    def signed(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.bit(128) else v

    def tree(self, tree, probs) -> int:
        i = 0
        while True:
            i = tree[i + self.bit(probs[i >> 1])]
            if i < 0:
                return -1 - i


# --------------------------------------------------------------------------
# header parsing (RFC 6386 §9)
# --------------------------------------------------------------------------


def _parse_headers(data: bytes):
    if len(data) < 10:
        raise ValueError("VP8: truncated frame")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:
        raise ValueError("VP8: interframe in still image (keyframe expected)")
    part0_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("VP8: bad keyframe start code")
    (w16, h16) = struct.unpack_from("<HH", data, 6)
    w, h = w16 & 0x3FFF, h16 & 0x3FFF
    if w < 1 or h < 1:
        raise ValueError(f"VP8: bad dimensions {w}x{h}")
    if 10 + part0_size > len(data):
        raise ValueError("VP8: first partition overruns frame")
    bd = _BoolDec(data[10:10 + part0_size])

    hdr = {"w": w, "h": h}
    bd.bit(128)  # color_space (0 = YCbCr per spec; only informative here)
    bd.bit(128)  # clamping_type

    # segmentation (§9.3)
    seg_enabled = bd.bit(128)
    seg_update_map = 0
    seg_abs = 0
    seg_quant = [0, 0, 0, 0]
    seg_lf = [0, 0, 0, 0]
    seg_tree_probs = [255, 255, 255]
    if seg_enabled:
        seg_update_map = bd.bit(128)
        update_data = bd.bit(128)
        if update_data:
            seg_abs = bd.bit(128)
            for i in range(4):
                if bd.bit(128):
                    seg_quant[i] = bd.signed(7)
            for i in range(4):
                if bd.bit(128):
                    seg_lf[i] = bd.signed(6)
        if seg_update_map:
            for i in range(3):
                if bd.bit(128):
                    seg_tree_probs[i] = bd.literal(8)
    hdr.update(seg_enabled=seg_enabled, seg_update_map=seg_update_map,
               seg_abs=seg_abs, seg_quant=seg_quant, seg_lf=seg_lf,
               seg_tree_probs=seg_tree_probs)

    # loop filter (§9.4)
    hdr["filter_simple"] = bd.bit(128)
    hdr["filter_level"] = bd.literal(6)
    hdr["sharpness"] = bd.literal(3)
    lf_delta_enabled = bd.bit(128)
    ref_deltas = [0, 0, 0, 0]
    mode_deltas = [0, 0, 0, 0]
    if lf_delta_enabled and bd.bit(128):  # mode_ref_lf_delta_update
        for i in range(4):
            if bd.bit(128):
                ref_deltas[i] = bd.signed(6)
        for i in range(4):
            if bd.bit(128):
                mode_deltas[i] = bd.signed(6)
    hdr.update(lf_delta_enabled=lf_delta_enabled, ref_deltas=ref_deltas,
               mode_deltas=mode_deltas)

    # token partitions (§9.5)
    nparts = 1 << bd.literal(2)
    part_base = 10 + part0_size
    sizes_end = part_base + 3 * (nparts - 1)
    if sizes_end > len(data):
        raise ValueError("VP8: partition size table overruns frame")
    parts = []
    off = sizes_end
    for i in range(nparts):
        if i < nparts - 1:
            sz = data[part_base + 3 * i] | (data[part_base + 3 * i + 1] << 8) \
                | (data[part_base + 3 * i + 2] << 16)
        else:
            sz = len(data) - off
        if sz < 0 or off + sz > len(data):
            raise ValueError("VP8: token partition overruns frame")
        parts.append(_BoolDec(data[off:off + sz]))
        off += sz
    hdr["parts"] = parts

    # quantizer indices (§9.6)
    q = bd.literal(7)
    deltas = []
    for _ in range(5):  # ydc, y2dc, y2ac, uvdc, uvac
        deltas.append(bd.signed(4) if bd.bit(128) else 0)
    hdr["q"] = q
    hdr["q_deltas"] = deltas

    bd.bit(128)  # refresh_entropy_probs (keyframe: no-op for a still)

    # token probability updates (§13.4)
    probs = bytearray(COEFF_PROBS)
    for i in range(1056):
        if bd.bit(COEFF_UPDATE_PROBS[i]):
            probs[i] = bd.literal(8)
    # [plane][band][ctx] -> 11-tuple
    hdr["coeff_probs"] = [
        [[tuple(probs[((t * 8 + b) * 3 + c) * 11:((t * 8 + b) * 3 + c) * 11 + 11])
          for c in range(3)] for b in range(8)] for t in range(4)]

    hdr["use_skip"] = bd.bit(128)
    hdr["prob_skip"] = bd.literal(8) if hdr["use_skip"] else 0
    hdr["bd0"] = bd
    return hdr


def _quant_factors(hdr):
    """Per-segment (y1dc, y1ac, y2dc, y2ac, uvdc, uvac) per RFC §14.1."""
    out = []
    for s in range(4):
        if hdr["seg_enabled"]:
            q = hdr["seg_quant"][s] if hdr["seg_abs"] \
                else hdr["q"] + hdr["seg_quant"][s]
        else:
            q = hdr["q"]
        q = _clip127(q)
        d = hdr["q_deltas"]
        y1dc = DC_QLOOKUP[_clip127(q + d[0])]
        y1ac = AC_QLOOKUP[q]
        y2dc = DC_QLOOKUP[_clip127(q + d[1])] * 2
        y2ac = AC_QLOOKUP[_clip127(q + d[2])] * 155 // 100
        if y2ac < 8:
            y2ac = 8
        uvdc = DC_QLOOKUP[min(117, _clip127(q + d[3]))]
        uvac = AC_QLOOKUP[_clip127(q + d[4])]
        out.append((y1dc, y1ac, y2dc, y2ac, uvdc, uvac))
    return out


# --------------------------------------------------------------------------
# coefficient/token decode (RFC 6386 §13)
# --------------------------------------------------------------------------


def _decode_coeffs(bd: _BoolDec, plane_probs, first: int, ctx: int,
                   qdc: int, qac: int, out) -> int:
    """Decode one 4x4 block's tokens into ``out`` (length-16 list, natural
    order, dequantized).  Returns 1 if any nonzero coefficient was read."""
    n = first
    nonzero = 0
    skip_eob = False
    bit = bd.bit
    while n < 16:
        p = plane_probs[BANDS[n]][ctx]
        if not skip_eob and not bit(p[0]):
            break
        if not bit(p[1]):  # DCT_0
            n += 1
            skip_eob = True
            ctx = 0
            continue
        skip_eob = False
        if not bit(p[2]):
            val = 1
            ctx = 1
        else:
            ctx = 2
            if not bit(p[3]):
                if not bit(p[4]):
                    val = 2
                else:
                    val = 3 + bit(p[5])
            else:
                if not bit(p[6]):
                    cat = 0 if not bit(p[7]) else 1
                else:
                    if not bit(p[8]):
                        cat = 2 if not bit(p[9]) else 3
                    else:
                        cat = 4 if not bit(p[10]) else 5
                extra = 0
                for cp in _CAT_PROBS[cat]:
                    extra = (extra << 1) | bit(cp)
                val = _CAT_BASE[cat] + extra
        if bit(128):
            val = -val
        out[ZIGZAG[n]] = val * (qdc if n == 0 else qac)
        nonzero = 1
        n += 1
    return nonzero


# --------------------------------------------------------------------------
# inverse transforms (RFC 6386 §14.3-14.4)
# --------------------------------------------------------------------------

_C1 = 20091  # cospi8sqrt2 - 1, Q16
_C2 = 35468  # sinpi8sqrt2, Q16


def _idct_batch(ip: np.ndarray) -> np.ndarray:
    """Vectorized exact inverse DCT over a (B, 4, 4) int64 batch."""
    # columns
    a1 = ip[:, 0] + ip[:, 2]
    b1 = ip[:, 0] - ip[:, 2]
    c1 = ((ip[:, 1] * _C2) >> 16) - (ip[:, 3] + ((ip[:, 3] * _C1) >> 16))
    d1 = (ip[:, 1] + ((ip[:, 1] * _C1) >> 16)) + ((ip[:, 3] * _C2) >> 16)
    tmp = np.empty_like(ip)
    tmp[:, 0] = a1 + d1
    tmp[:, 3] = a1 - d1
    tmp[:, 1] = b1 + c1
    tmp[:, 2] = b1 - c1
    # rows
    a1 = tmp[:, :, 0] + tmp[:, :, 2]
    b1 = tmp[:, :, 0] - tmp[:, :, 2]
    c1 = ((tmp[:, :, 1] * _C2) >> 16) - (tmp[:, :, 3] + ((tmp[:, :, 3] * _C1) >> 16))
    d1 = (tmp[:, :, 1] + ((tmp[:, :, 1] * _C1) >> 16)) + ((tmp[:, :, 3] * _C2) >> 16)
    out = np.empty_like(ip)
    out[:, :, 0] = (a1 + d1 + 4) >> 3
    out[:, :, 3] = (a1 - d1 + 4) >> 3
    out[:, :, 1] = (b1 + c1 + 4) >> 3
    out[:, :, 2] = (b1 - c1 + 4) >> 3
    return out


def _iwht4x4(block) -> list:
    """Inverse Walsh-Hadamard for the Y2 block; returns 16 DC values in
    subblock raster order."""
    ip = np.asarray(block, dtype=np.int64).reshape(4, 4)
    a1 = ip[0] + ip[3]
    b1 = ip[1] + ip[2]
    c1 = ip[1] - ip[2]
    d1 = ip[0] - ip[3]
    tmp = np.empty((4, 4), dtype=np.int64)
    tmp[0] = a1 + b1
    tmp[1] = c1 + d1
    tmp[2] = a1 - b1
    tmp[3] = d1 - c1
    a1 = tmp[:, 0] + tmp[:, 3]
    b1 = tmp[:, 1] + tmp[:, 2]
    c1 = tmp[:, 1] - tmp[:, 2]
    d1 = tmp[:, 0] - tmp[:, 3]
    out = np.empty((4, 4), dtype=np.int64)
    out[:, 0] = (a1 + b1 + 3) >> 3
    out[:, 1] = (c1 + d1 + 3) >> 3
    out[:, 2] = (a1 - b1 + 3) >> 3
    out[:, 3] = (d1 - c1 + 3) >> 3
    return [int(v) for v in out.reshape(16)]


def _residuals(coeff_blocks):
    """Batched IDCT over an MB's coefficient blocks; returns a list with
    None for all-zero blocks (prediction passes through untouched), or
    None when every block is zero."""
    live = [n for n, blk in enumerate(coeff_blocks) if any(blk)]
    if not live:
        return None
    batch = np.asarray([coeff_blocks[n] for n in live],
                       dtype=np.int64).reshape(len(live), 4, 4)
    out = _idct_batch(batch)
    res = [None] * len(coeff_blocks)
    for i, n in enumerate(live):
        res[n] = out[i]
    return res


# --------------------------------------------------------------------------
# intra prediction (RFC 6386 §12)
# --------------------------------------------------------------------------


def _pred_block(buf, y0, x0, size, mode, have_above, have_left):
    """16x16 / 8x8 whole-macroblock prediction into an int32 array.

    ``buf`` carries a 1-pixel top/left border (127 top, 129 left), so
    neighbor reads are unconditional; ``have_above``/``have_left`` only
    gate the DC averaging rule."""
    top = buf[y0 - 1, x0:x0 + size].astype(np.int32)
    left = buf[y0:y0 + size, x0 - 1].astype(np.int32)
    tl = int(buf[y0 - 1, x0 - 1])
    if mode == DC_PRED:
        if have_above and have_left:
            dc = (int(top.sum()) + int(left.sum()) + size) >> \
                (5 if size == 16 else 4)
        elif have_above:
            dc = (int(top.sum()) + (size >> 1)) >> (4 if size == 16 else 3)
        elif have_left:
            dc = (int(left.sum()) + (size >> 1)) >> (4 if size == 16 else 3)
        else:
            dc = 128
        return np.full((size, size), dc, dtype=np.int32)
    if mode == V_PRED:
        return np.tile(top, (size, 1))
    if mode == H_PRED:
        return np.tile(left[:, None], (1, size))
    # TM_PRED
    return np.clip(left[:, None] + top[None, :] - tl, 0, 255)


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _avg2(a, b):
    return (a + b + 1) >> 1


def _pred_b(mode, top4, topright4, left4, tl):
    """4x4 submode prediction (RFC §12.3).  All inputs are Python ints /
    int lists; returns a 4x4 int array."""
    t = list(top4) + list(topright4)  # t[0..7]
    l = list(left4)
    p = [[0] * 4 for _ in range(4)]
    if mode == B_DC:
        dc = (sum(t[:4]) + sum(l) + 4) >> 3
        for r in range(4):
            for c in range(4):
                p[r][c] = dc
    elif mode == B_TM:
        for r in range(4):
            for c in range(4):
                v = l[r] + t[c] - tl
                p[r][c] = 0 if v < 0 else (255 if v > 255 else v)
    elif mode == B_VE:
        row = [_avg3(tl, t[0], t[1]), _avg3(t[0], t[1], t[2]),
               _avg3(t[1], t[2], t[3]), _avg3(t[2], t[3], t[4])]
        for r in range(4):
            p[r] = row[:]
    elif mode == B_HE:
        col = [_avg3(tl, l[0], l[1]), _avg3(l[0], l[1], l[2]),
               _avg3(l[1], l[2], l[3]), _avg3(l[2], l[3], l[3])]
        for r in range(4):
            for c in range(4):
                p[r][c] = col[r]
    elif mode == B_LD:
        for r in range(4):
            for c in range(4):
                i = r + c
                p[r][c] = _avg3(t[i], t[i + 1], t[i + 2]) if i < 6 \
                    else _avg3(t[6], t[7], t[7])
    elif mode == B_RD:
        e = [l[3], l[2], l[1], l[0], tl, t[0], t[1], t[2], t[3]]
        for r in range(4):
            for c in range(4):
                i = c - r + 3  # distance along the diagonal
                p[r][c] = _avg3(e[i], e[i + 1], e[i + 2])
    elif mode == B_VR:
        e = [l[3], l[2], l[1], l[0], tl, t[0], t[1], t[2], t[3]]
        # pixels on even "diagonals" average two, odd average three
        p[3][0] = _avg3(e[1], e[2], e[3])
        p[2][0] = _avg3(e[2], e[3], e[4])
        p[3][1] = p[1][0] = _avg3(e[3], e[4], e[5])
        p[2][1] = p[0][0] = _avg2(e[4], e[5])
        p[3][2] = p[1][1] = _avg3(e[4], e[5], e[6])
        p[2][2] = p[0][1] = _avg2(e[5], e[6])
        p[3][3] = p[1][2] = _avg3(e[5], e[6], e[7])
        p[2][3] = p[0][2] = _avg2(e[6], e[7])
        p[1][3] = _avg3(e[6], e[7], e[8])
        p[0][3] = _avg2(e[7], e[8])
    elif mode == B_VL:
        p[0][0] = _avg2(t[0], t[1])
        p[1][0] = _avg3(t[0], t[1], t[2])
        p[2][0] = p[0][1] = _avg2(t[1], t[2])
        p[1][1] = p[3][0] = _avg3(t[1], t[2], t[3])
        p[2][1] = p[0][2] = _avg2(t[2], t[3])
        p[3][1] = p[1][2] = _avg3(t[2], t[3], t[4])
        p[2][2] = p[0][3] = _avg2(t[3], t[4])
        p[3][2] = p[1][3] = _avg3(t[3], t[4], t[5])
        p[2][3] = _avg3(t[4], t[5], t[6])
        p[3][3] = _avg3(t[5], t[6], t[7])
    elif mode == B_HD:
        e = [l[3], l[2], l[1], l[0], tl, t[0], t[1], t[2]]
        p[3][0] = _avg2(e[0], e[1])
        p[3][1] = _avg3(e[0], e[1], e[2])
        p[2][0] = p[3][2] = _avg2(e[1], e[2])
        p[2][1] = p[3][3] = _avg3(e[1], e[2], e[3])
        p[2][2] = p[1][0] = _avg2(e[2], e[3])
        p[2][3] = p[1][1] = _avg3(e[2], e[3], e[4])
        p[1][2] = p[0][0] = _avg2(e[3], e[4])
        p[1][3] = p[0][1] = _avg3(e[3], e[4], e[5])
        p[0][2] = _avg3(e[4], e[5], e[6])
        p[0][3] = _avg3(e[5], e[6], e[7])
    else:  # B_HU
        p[0][0] = _avg2(l[0], l[1])
        p[0][1] = _avg3(l[0], l[1], l[2])
        p[0][2] = p[1][0] = _avg2(l[1], l[2])
        p[0][3] = p[1][1] = _avg3(l[1], l[2], l[3])
        p[1][2] = p[2][0] = _avg2(l[2], l[3])
        p[1][3] = p[2][1] = _avg3(l[2], l[3], l[3])
        p[2][2] = p[2][3] = p[3][0] = p[3][1] = p[3][2] = p[3][3] = l[3]
    return np.array(p, dtype=np.int32)


# --------------------------------------------------------------------------
# loop filter (RFC 6386 §15) — vectorized over the pixels along one edge
# --------------------------------------------------------------------------


def _s8(x):
    return np.minimum(np.maximum(x, -128), 127)


def _common_adjust(use_outer, p1, p0, q0, q1):
    """RFC §15.1 common_adjust on signed-domain int32 arrays (in place for
    p0/q0); returns the F adjustment array."""
    a = _s8(np.where(use_outer, _s8(p1 - q1), 0) + 3 * (q0 - p0))
    f = _s8(a + 4) >> 3
    e = _s8(a + 3) >> 3
    q0 -= f
    p0 += e
    return f


def _simple_filter(edge_limit, rows):
    s = np.stack(rows).astype(np.int32) - 128  # [p1, p0, q0, q1]
    p1, p0, q0, q1 = s[0], s[1].copy(), s[2].copy(), s[3]
    mask = (np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1)) <= edge_limit
    if not mask.any():
        return
    _common_adjust(True, p1, p0, q0, q1)
    rows[1][:] = (np.where(mask, _s8(p0), s[1]) + 128).astype(np.uint8)
    rows[2][:] = (np.where(mask, _s8(q0), s[2]) + 128).astype(np.uint8)


def _edge_mask(limit, interior, s):
    m = (np.abs(s[3] - s[4]) * 2 + (np.abs(s[2] - s[5]) >> 1)) <= limit
    d = np.abs(np.diff(s, axis=0))  # |p3-p2| ... |q2-q3| plus the center
    d[3] = 0  # center difference is governed by the edge limit, not interior
    return m & (d <= interior).all(axis=0)


def _subblock_filter(hev_thresh, interior, edge_limit, rows):
    s = np.stack(rows).astype(np.int32) - 128
    mask = _edge_mask(edge_limit, interior, s)
    if not mask.any():
        return
    p1, p0, q0, q1 = s[2].copy(), s[3].copy(), s[4].copy(), s[5].copy()
    hv = (np.abs(p1 - p0) > hev_thresh) | (np.abs(q1 - q0) > hev_thresh)
    f = _common_adjust(hv, p1, p0, q0, q1)
    a = (f + 1) >> 1
    take2 = mask & ~hv
    p1 = np.where(take2, _s8(p1 + a), p1)
    q1 = np.where(take2, _s8(q1 - a), q1)
    for i, v in enumerate((p1, p0, q0, q1)):
        rows[i + 2][:] = (np.where(mask, _s8(v), s[i + 2]) + 128).astype(np.uint8)


def _mb_filter(hev_thresh, interior, edge_limit, rows):
    s = np.stack(rows).astype(np.int32) - 128
    mask = _edge_mask(edge_limit, interior, s)
    if not mask.any():
        return
    p2, p1, p0, q0, q1, q2 = (s[i] for i in range(1, 7))
    hv = (np.abs(p1 - p0) > hev_thresh) | (np.abs(q1 - q0) > hev_thresh)
    # hev pixels: common_adjust with outer taps
    ph1, ph0, qh0, qh1 = p1.copy(), p0.copy(), q0.copy(), q1.copy()
    _common_adjust(True, ph1, ph0, qh0, qh1)
    # non-hev pixels: 3-tap wide filter
    w = _s8(_s8(p1 - q1) + 3 * (q0 - p0))
    a = _s8((27 * w + 63) >> 7)
    pn0, qn0 = _s8(p0 + a), _s8(q0 - a)
    a = _s8((18 * w + 63) >> 7)
    pn1, qn1 = _s8(p1 + a), _s8(q1 - a)
    a = _s8((9 * w + 63) >> 7)
    pn2, qn2 = _s8(p2 + a), _s8(q2 - a)
    sel = [
        (1, np.where(hv, p2, pn2)),
        (2, np.where(hv, _s8(ph1), pn1)),
        (3, np.where(hv, _s8(ph0), pn0)),
        (4, np.where(hv, _s8(qh0), qn0)),
        (5, np.where(hv, _s8(qh1), qn1)),
        (6, np.where(hv, q2, qn2)),
    ]
    for idx, v in sel:
        rows[idx][:] = (np.where(mask, v, s[idx]) + 128).astype(np.uint8)


class _EdgeView:
    """Mutable rows/columns crossing an edge of a plane, as a list of
    1-D uint8 views: [p3, p2, p1, p0, q0, q1, q2, q3] (or 4 for simple)."""

    @staticmethod
    def vertical(plane, y, x, n, taps=4):
        return [plane[y:y + n, x + d] for d in range(-taps, taps)]

    @staticmethod
    def horizontal(plane, y, x, n, taps=4):
        return [plane[y + d, x:x + n] for d in range(-taps, taps)]


# --------------------------------------------------------------------------
# frame decode
# --------------------------------------------------------------------------


def decode_vp8_frame(data: bytes):
    """Decode a VP8 keyframe payload (the content of a ``VP8 `` chunk).

    Returns ``(y, u, v, w, h)`` — cropped uint8 planes: y is (h, w),
    u/v are ((h+1)//2, (w+1)//2)."""
    hdr = _parse_headers(data)
    w, h = hdr["w"], hdr["h"]
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    bd0 = hdr["bd0"]
    quant = _quant_factors(hdr)
    probs = hdr["coeff_probs"]

    # ---- pass 1: per-MB mode info from partition 0 -----------------------
    mbs = []  # dicts: segment, skip, ymode, uvmode, bmodes(list[16]|None)
    above_b = [[B_DC] * 4 for _ in range(mb_w)]  # bottom bmode row per col
    for mb_y in range(mb_h):
        left_b = [B_DC] * 4
        for mb_x in range(mb_w):
            seg = 0
            if hdr["seg_enabled"] and hdr["seg_update_map"]:
                p = hdr["seg_tree_probs"]
                seg = (2 + bd0.bit(p[2])) if bd0.bit(p[0]) else bd0.bit(p[1])
            skip = bd0.bit(hdr["prob_skip"]) if hdr["use_skip"] else 0
            ymode = bd0.tree(KF_YMODE_TREE, KF_YMODE_PROBS)
            if ymode == B_PRED:
                bmodes = []
                for i in range(16):
                    r, c = i >> 2, i & 3
                    above_mode = bmodes[i - 4] if r > 0 else above_b[mb_x][c]
                    left_mode = bmodes[i - 1] if c > 0 else left_b[r]
                    probs9 = KF_BMODE_PROBS[(above_mode * 10 + left_mode) * 9:
                                            (above_mode * 10 + left_mode) * 9 + 9]
                    bmodes.append(bd0.tree(BMODE_TREE, probs9))
                above_b[mb_x] = bmodes[12:16]
                left_b = [bmodes[3], bmodes[7], bmodes[11], bmodes[15]]
            else:
                bmodes = None
                implied = _MODE_TO_B[ymode]
                above_b[mb_x] = [implied] * 4
                left_b = [implied] * 4
            uvmode = bd0.tree(UV_MODE_TREE, KF_UV_MODE_PROBS)
            mbs.append({"seg": seg, "skip": skip, "ymode": ymode,
                        "uvmode": uvmode, "bmodes": bmodes})

    # ---- pass 2: residuals + reconstruction ------------------------------
    W16, H16 = mb_w * 16, mb_h * 16
    W8, H8 = mb_w * 8, mb_h * 8
    # planes with 1-px top/left border and +4 right columns on luma
    YB = np.empty((1 + H16, 1 + W16 + 4), dtype=np.uint8)
    UB = np.empty((1 + H8, 1 + W8), dtype=np.uint8)
    VB = np.empty((1 + H8, 1 + W8), dtype=np.uint8)
    for buf in (YB, UB, VB):
        buf[0, :] = 127
        buf[1:, 0] = 129

    above_y = [0] * (4 * mb_w)
    above_u = [0] * (2 * mb_w)
    above_v = [0] * (2 * mb_w)
    above_y2 = [0] * mb_w
    filter_info = []  # (level, inner, seg, is_b) per MB

    for mb_y in range(mb_h):
        bd = hdr["parts"][mb_y % len(hdr["parts"])]
        left_y, left_u, left_v = [0] * 4, [0] * 2, [0] * 2
        left_y2 = 0
        # replicate above-right beyond the frame for the last MB column
        row_top = mb_y * 16
        YB[row_top, W16 + 1:] = YB[row_top, W16]
        for mb_x in range(mb_w):
            mb = mbs[mb_y * mb_w + mb_x]
            qv = quant[mb["seg"]]
            has_y2 = mb["ymode"] != B_PRED
            y_coeffs = [[0] * 16 for _ in range(16)]
            u_coeffs = [[0] * 16 for _ in range(4)]
            v_coeffs = [[0] * 16 for _ in range(4)]
            nonzero = 0

            if mb["skip"]:
                for c in range(4):
                    above_y[mb_x * 4 + c] = 0
                for c in range(2):
                    above_u[mb_x * 2 + c] = 0
                    above_v[mb_x * 2 + c] = 0
                left_y, left_u, left_v = [0] * 4, [0] * 2, [0] * 2
                if has_y2:
                    above_y2[mb_x] = left_y2 = 0
            else:
                if has_y2:
                    y2 = [0] * 16
                    ctx = above_y2[mb_x] + left_y2
                    nz = _decode_coeffs(bd, probs[1], 0, ctx, qv[2], qv[3], y2)
                    above_y2[mb_x] = left_y2 = nz
                    nonzero |= nz
                    dcs = _iwht4x4(y2)
                    for n in range(16):
                        y_coeffs[n][0] = dcs[n]
                plane = probs[0] if has_y2 else probs[3]
                first = 1 if has_y2 else 0
                for n in range(16):
                    r, c = n >> 2, n & 3
                    ctx = above_y[mb_x * 4 + c] + left_y[r]
                    nz = _decode_coeffs(bd, plane, first, ctx, qv[0], qv[1],
                                        y_coeffs[n])
                    above_y[mb_x * 4 + c] = left_y[r] = nz
                    nonzero |= nz
                for coeffs, above, left in ((u_coeffs, above_u, left_u),
                                            (v_coeffs, above_v, left_v)):
                    for n in range(4):
                        r, c = n >> 1, n & 1
                        ctx = above[mb_x * 2 + c] + left[r]
                        nz = _decode_coeffs(bd, probs[2], 0, ctx, qv[4],
                                            qv[5], coeffs[n])
                        above[mb_x * 2 + c] = left[r] = nz
                        nonzero |= nz

            # ---- reconstruct ------------------------------------------
            y0, x0 = 1 + mb_y * 16, 1 + mb_x * 16
            have_above, have_left = mb_y > 0, mb_x > 0
            y_res = _residuals(y_coeffs)
            if has_y2:
                pred = _pred_block(YB, y0, x0, 16, mb["ymode"],
                                   have_above, have_left)
                if y_res is not None:
                    for n in range(16):
                        if y_res[n] is None:
                            continue
                        r, c = (n >> 2) * 4, (n & 3) * 4
                        blk = pred[r:r + 4, c:c + 4] + y_res[n]
                        np.clip(blk, 0, 255, out=blk)
                        pred[r:r + 4, c:c + 4] = blk
                YB[y0:y0 + 16, x0:x0 + 16] = pred.astype(np.uint8)
            else:
                mb_topright = [int(v) for v in YB[y0 - 1, x0 + 16:x0 + 20]]
                for n in range(16):
                    r, c = (n >> 2) * 4, (n & 3) * 4
                    by, bx = y0 + r, x0 + c
                    top4 = [int(v) for v in YB[by - 1, bx:bx + 4]]
                    if (n & 3) == 3:
                        tr4 = mb_topright if n > 3 else \
                            [int(v) for v in YB[by - 1, bx + 4:bx + 8]]
                    else:
                        tr4 = [int(v) for v in YB[by - 1, bx + 4:bx + 8]]
                    left4 = [int(v) for v in YB[by:by + 4, bx - 1]]
                    tl = int(YB[by - 1, bx - 1])
                    pred = _pred_b(mb["bmodes"][n], top4, tr4, left4, tl)
                    if y_res is not None and y_res[n] is not None:
                        pred = np.clip(pred + y_res[n], 0, 255)
                    YB[by:by + 4, bx:bx + 4] = pred.astype(np.uint8)
            cy0, cx0 = 1 + mb_y * 8, 1 + mb_x * 8
            for CB, coeffs in ((UB, u_coeffs), (VB, v_coeffs)):
                pred = _pred_block(CB, cy0, cx0, 8, mb["uvmode"],
                                   have_above, have_left)
                c_res = _residuals(coeffs)
                if c_res is not None:
                    for n in range(4):
                        if c_res[n] is None:
                            continue
                        r, c = (n >> 1) * 4, (n & 1) * 4
                        blk = pred[r:r + 4, c:c + 4] + c_res[n]
                        np.clip(blk, 0, 255, out=blk)
                        pred[r:r + 4, c:c + 4] = blk
                CB[cy0:cy0 + 8, cx0:cx0 + 8] = pred.astype(np.uint8)

            filter_info.append((mb["seg"], not has_y2,
                                bool(nonzero) or not has_y2))

    # ---- loop filter ------------------------------------------------------
    _loop_filter(hdr, filter_info, YB, UB, VB, mb_w, mb_h)

    Y = YB[1:1 + h, 1:1 + w]
    ch, cw = (h + 1) // 2, (w + 1) // 2
    U = UB[1:1 + ch, 1:1 + cw]
    V = VB[1:1 + ch, 1:1 + cw]
    return Y.copy(), U.copy(), V.copy(), w, h


def _filter_levels(hdr):
    """Per-(segment, is_bpred) filter level.

    Matches libwebp's VP8PrecomputeFilterStrengths exactly: the segment
    stage is NOT clamped — one clamp to [0, 63] after the ref/mode deltas.
    (libvpx clamps the segment stage too; the two differ only on streams no
    encoder emits, e.g. base 90 with a -40 ref delta.  The crafted-stream
    test pins this decoder to the libwebp behavior, our declared oracle.)"""
    out = {}
    for s in range(4):
        if hdr["seg_enabled"]:
            lvl = hdr["seg_lf"][s] if hdr["seg_abs"] \
                else hdr["filter_level"] + hdr["seg_lf"][s]
        else:
            lvl = hdr["filter_level"]
        for is_b in (False, True):
            v = lvl
            if hdr["lf_delta_enabled"]:
                v += hdr["ref_deltas"][0]  # intra frame
                if is_b:
                    v += hdr["mode_deltas"][0]
            out[(s, is_b)] = max(0, min(63, v))
    return out


def _limits(level, sharpness):
    interior = level
    if sharpness:
        interior >>= 2 if sharpness > 4 else 1
        if interior > 9 - sharpness:
            interior = 9 - sharpness
    if interior < 1:
        interior = 1
    hev_t = 2 if level >= 40 else (1 if level >= 15 else 0)
    mb_lim = ((level + 2) * 2) + interior
    sub_lim = (level * 2) + interior
    return interior, hev_t, mb_lim, sub_lim


def _loop_filter(hdr, filter_info, YB, UB, VB, mb_w, mb_h):
    # a frame-level filter level of 0 disables ALL filtering, regardless of
    # per-segment strengths (libwebp: filter_type_ = (hdr->level_ == 0) ? 0
    # : ...; libvpx: if (pc->filter_level) vp8_loop_filter_frame(...))
    if hdr["filter_level"] == 0:
        return
    levels = _filter_levels(hdr)
    simple = hdr["filter_simple"]
    sharp = hdr["sharpness"]
    for mb_y in range(mb_h):
        for mb_x in range(mb_w):
            seg, is_b, inner = filter_info[mb_y * mb_w + mb_x]
            level = levels[(seg, is_b)]
            if level == 0:
                continue
            interior, hev_t, mb_lim, sub_lim = _limits(level, sharp)
            y0, x0 = 1 + mb_y * 16, 1 + mb_x * 16
            cy0, cx0 = 1 + mb_y * 8, 1 + mb_x * 8
            if simple:
                if mb_x > 0:
                    _simple_filter(mb_lim, _EdgeView.vertical(
                        YB, y0, x0, 16, taps=2))
                if inner:
                    for dx in (4, 8, 12):
                        _simple_filter(sub_lim, _EdgeView.vertical(
                            YB, y0, x0 + dx, 16, taps=2))
                if mb_y > 0:
                    _simple_filter(mb_lim, _EdgeView.horizontal(
                        YB, y0, x0, 16, taps=2))
                if inner:
                    for dy in (4, 8, 12):
                        _simple_filter(sub_lim, _EdgeView.horizontal(
                            YB, y0 + dy, x0, 16, taps=2))
                continue
            if mb_x > 0:
                _mb_filter(hev_t, interior, mb_lim,
                           _EdgeView.vertical(YB, y0, x0, 16))
                _mb_filter(hev_t, interior, mb_lim,
                           _EdgeView.vertical(UB, cy0, cx0, 8))
                _mb_filter(hev_t, interior, mb_lim,
                           _EdgeView.vertical(VB, cy0, cx0, 8))
            if inner:
                for dx in (4, 8, 12):
                    _subblock_filter(hev_t, interior, sub_lim,
                                     _EdgeView.vertical(YB, y0, x0 + dx, 16))
                _subblock_filter(hev_t, interior, sub_lim,
                                 _EdgeView.vertical(UB, cy0, cx0 + 4, 8))
                _subblock_filter(hev_t, interior, sub_lim,
                                 _EdgeView.vertical(VB, cy0, cx0 + 4, 8))
            if mb_y > 0:
                _mb_filter(hev_t, interior, mb_lim,
                           _EdgeView.horizontal(YB, y0, x0, 16))
                _mb_filter(hev_t, interior, mb_lim,
                           _EdgeView.horizontal(UB, cy0, cx0, 8))
                _mb_filter(hev_t, interior, mb_lim,
                           _EdgeView.horizontal(VB, cy0, cx0, 8))
            if inner:
                for dy in (4, 8, 12):
                    _subblock_filter(hev_t, interior, sub_lim,
                                     _EdgeView.horizontal(YB, y0 + dy, x0, 16))
                _subblock_filter(hev_t, interior, sub_lim,
                                 _EdgeView.horizontal(UB, cy0 + 4, cx0, 8))
                _subblock_filter(hev_t, interior, sub_lim,
                                 _EdgeView.horizontal(VB, cy0 + 4, cx0, 8))


# --------------------------------------------------------------------------
# YUV420 -> RGB, libwebp "fancy upsampling" semantics (exact integers)
# --------------------------------------------------------------------------


def _yuv_to_rgb_rows(yrow, urow, vrow):
    """libwebp VP8YuvToRgb fixed-point conversion, vectorized."""
    yv = yrow.astype(np.int32)
    uv = urow.astype(np.int32)
    vv = vrow.astype(np.int32)
    yy = (yv * 19077) >> 8
    r = yy + ((vv * 26149) >> 8) - 14234
    g = yy - ((uv * 6419) >> 8) - ((vv * 13320) >> 8) + 8708
    b = yy + ((uv * 33050) >> 8) - 17685

    def clip8(x):
        return np.where((x & ~16383) == 0, x >> 6,
                        np.where(x < 0, 0, 255)).astype(np.uint8)

    return clip8(r), clip8(g), clip8(b)


def _upsample_pair(u_top, v_top, u_cur, v_cur, w):
    """One libwebp fancy-upsample step: blend two chroma rows into the
    full-width chroma values for the two luma rows between them.  Returns
    (u_for_top_y, v_for_top_y, u_for_bottom_y, v_for_bottom_y)."""
    tu = u_top.astype(np.int32)
    tv = v_top.astype(np.int32)
    cu = u_cur.astype(np.int32)
    cv = v_cur.astype(np.int32)
    out = [np.empty(w, dtype=np.int32) for _ in range(4)]
    # col 0
    out[0][0] = (3 * tu[0] + cu[0] + 2) >> 2
    out[1][0] = (3 * tv[0] + cv[0] + 2) >> 2
    out[2][0] = (3 * cu[0] + tu[0] + 2) >> 2
    out[3][0] = (3 * cv[0] + tv[0] + 2) >> 2
    last_pair = (w - 1) >> 1
    if last_pair >= 1:
        tl_u, tl_v = tu[:last_pair], tv[:last_pair]   # top-left samples
        l_u, l_v = cu[:last_pair], cv[:last_pair]     # left samples
        t_u, t_v = tu[1:last_pair + 1], tv[1:last_pair + 1]
        c_u, c_v = cu[1:last_pair + 1], cv[1:last_pair + 1]
        avg_u = tl_u + t_u + l_u + c_u + 8
        avg_v = tl_v + t_v + l_v + c_v + 8
        diag12_u = (avg_u + 2 * (t_u + l_u)) >> 3
        diag12_v = (avg_v + 2 * (t_v + l_v)) >> 3
        diag03_u = (avg_u + 2 * (tl_u + c_u)) >> 3
        diag03_v = (avg_v + 2 * (tl_v + c_v)) >> 3
        xs = np.arange(1, last_pair + 1)
        out[0][2 * xs - 1] = (diag12_u + tl_u) >> 1
        out[1][2 * xs - 1] = (diag12_v + tl_v) >> 1
        out[0][2 * xs] = (diag03_u + t_u) >> 1
        out[1][2 * xs] = (diag03_v + t_v) >> 1
        out[2][2 * xs - 1] = (diag03_u + l_u) >> 1
        out[3][2 * xs - 1] = (diag03_v + l_v) >> 1
        out[2][2 * xs] = (diag12_u + c_u) >> 1
        out[3][2 * xs] = (diag12_v + c_v) >> 1
    if not (w & 1):
        out[0][w - 1] = (3 * tu[-1] + cu[-1] + 2) >> 2
        out[1][w - 1] = (3 * tv[-1] + cv[-1] + 2) >> 2
        out[2][w - 1] = (3 * cu[-1] + tu[-1] + 2) >> 2
        out[3][w - 1] = (3 * cv[-1] + tv[-1] + 2) >> 2
    return out


def yuv420_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Upsample 4:2:0 chroma with libwebp's fancy upsampler and convert to
    RGB with its exact fixed-point formula (bit-identical output)."""
    h, w = y.shape
    rgb = np.empty((h, w, 3), dtype=np.uint8)

    def emit(row, uu, vv):
        r, g, b = _yuv_to_rgb_rows(y[row], uu.astype(np.uint8),
                                   vv.astype(np.uint8))
        rgb[row, :, 0] = r
        rgb[row, :, 1] = g
        rgb[row, :, 2] = b

    # first luma row: chroma row 0 mirrored
    uu0, vv0, _, _ = _upsample_pair(u[0], v[0], u[0], v[0], w)
    emit(0, uu0, vv0)
    # interior pairs
    row = 1
    for cr in range(len(u) - 1):
        o = _upsample_pair(u[cr], v[cr], u[cr + 1], v[cr + 1], w)
        if row < h:
            emit(row, o[0], o[1])
        if row + 1 < h:
            emit(row + 1, o[2], o[3])
        row += 2
    # even-height: last luma row pairs with mirrored last chroma row
    if row < h:
        o = _upsample_pair(u[-1], v[-1], u[-1], v[-1], w)
        emit(row, o[0], o[1])
    return rgb


def decode_vp8(data: bytes) -> np.ndarray:
    """VP8 keyframe payload -> (h, w, 3) uint8 RGB (libwebp-identical)."""
    y, u, v, w, h = decode_vp8_frame(data)
    return yuv420_to_rgb(y, u, v)
