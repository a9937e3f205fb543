"""HTML character-set sniffing and decoding for the webtext path.

A real crawl is ~5% non-UTF-8 (windows-125x, shift_jis, gbk, euc-kr,
big5, iso-8859-*); hard-coding ``utf-8/replace`` silently mojibakes those
pages into the corpus. This implements the practical subset of the WHATWG
encoding-sniffing algorithm browsers use, on top of CPython's codec
registry (which ships every web-relevant codec):

1. byte-order marks (UTF-8 / UTF-16LE / UTF-16BE),
2. a ``charset`` parameter from the transport (Content-Type header),
3. a bounded prescan of the first bytes for ``<meta charset=...>`` /
   ``<meta http-equiv="Content-Type" ...>`` / an XML declaration,
4. strict UTF-8 attempt, falling back to windows-1252 (the WHATWG
   default for the general web) with replacement.

Encoding labels are normalized per the WHATWG Encoding Standard's label
table (the subset that differs from Python's own aliases: x-user-defined
aside, browsers decode ``iso-8859-1``/``ascii`` as windows-1252,
``gb2312`` as GBK, ``tis-620`` as windows-874, ...). The reference
(danve93/graphrag-mrkr-2) assumes decoded text throughout and has no
charset handling at all.
"""

from __future__ import annotations

import codecs
import re

# WHATWG label → Python codec, where they differ from Python's alias table
# (plus the high-traffic exact labels so lookups skip codecs.lookup)
_WHATWG_LABELS = {
    # the latin-1 family is DECODED as windows-1252 on the web
    "iso-8859-1": "windows-1252",
    "iso8859-1": "windows-1252",
    "latin1": "windows-1252",
    "latin-1": "windows-1252",
    "us-ascii": "windows-1252",
    "ascii": "windows-1252",
    "ansi_x3.4-1968": "windows-1252",
    "iso-8859-9": "windows-1254",
    "iso-8859-8-i": "iso8859-8",
    "logical": "iso8859-8",
    "iso-8859-11": "cp874",
    "tis-620": "cp874",
    "gb2312": "gbk",
    "gb_2312-80": "gbk",
    "csgb2312": "gbk",
    "x-euc-jp": "euc_jp",
    "ks_c_5601-1987": "cp949",
    "korean": "cp949",
    "euc-kr": "cp949",
    "macintosh": "mac_roman",
    "x-mac-cyrillic": "mac_cyrillic",
    "utf8": "utf-8",
    "unicode-1-1-utf-8": "utf-8",
    # UTF-16 labels: WHATWG decodes the generic label as LE
    "utf-16": "utf-16-le",
    "ucs-2": "utf-16-le",
}

# the closed set of encodings the WHATWG Encoding Standard defines, as
# Python canonical codec names — anything else (utf-7, hz-gb-2312, utf-32,
# EBCDIC, ...) is an UNKNOWN label to a browser, and honoring it would
# reopen the encoding-confusion attacks (e.g. utf-7 '+ADw-script+AD4-')
# the standard removed those encodings to prevent
_WHATWG_ENCODINGS = frozenset({
    "utf-8", "utf-16-le", "utf-16-be",
    "cp866", "koi8-r", "koi8-u", "mac-roman", "mac-cyrillic",
    "cp874", "cp1250", "cp1251", "cp1252", "cp1253", "cp1254", "cp1255",
    "cp1256", "cp1257", "cp1258",
    "iso8859-2", "iso8859-3", "iso8859-4", "iso8859-5", "iso8859-6",
    "iso8859-7", "iso8859-8", "iso8859-10", "iso8859-13", "iso8859-14",
    "iso8859-15", "iso8859-16",
    "gbk", "gb18030", "big5", "big5hkscs",
    "euc_jp", "iso2022_jp", "shift_jis",
    "cp949", "euc_kr",
    "x-user-defined",
})

# meta/header charset scan, ASCII-compatible prefix only
_COMMENT_RE = re.compile(rb"<!--.*?(-->|\Z)", re.DOTALL)
_META_TAG_RE = re.compile(rb"<meta\b([^>]*)>", re.IGNORECASE | re.DOTALL)
_ATTR_RE = re.compile(
    rb"""([a-zA-Z-]+)\s*=\s*("[^"]*"|'[^']*'|[^\s"'>]+)""")
_XML_RE = re.compile(
    rb"""\A\s*<\?xml[^>]+?encoding\s*=\s*["']([a-zA-Z0-9._:-]+)["']""",
    re.IGNORECASE,
)
_CT_CHARSET_RE = re.compile(r"charset\s*=\s*\"?([a-zA-Z0-9._:-]+)\"?",
                            re.IGNORECASE)

_PRESCAN_BYTES = 1024


def _c1_controls(err: UnicodeError):
    """The WHATWG windows-125x/874 indexes map most 0x80-0x9F bytes that
    Python's codecs leave undefined to the C1 controls (e.g. cp1252
    0x81→U+0081, cp1251 0x98→U+0098); bytes undefined outside that range
    stay U+FFFD like errors='replace'."""
    if isinstance(err, UnicodeDecodeError):
        return ("".join(chr(b) if 0x80 <= b <= 0x9F else "�"
                        for b in err.object[err.start:err.end]),
                err.end)
    raise err


codecs.register_error("whatwg-c1", _c1_controls)


def _x_user_defined_decode(data, errors="strict"):
    """WHATWG x-user-defined: ASCII passes through, 0x80-0xFF map to the
    private-use range U+F780..U+F7FF (used by sites that ship binary
    glyph data through a text channel)."""
    b = bytes(data)
    return ("".join(chr(c) if c < 0x80 else chr(0xF780 + c - 0x80)
                    for c in b), len(b))


class _XUserDefinedCodec(codecs.Codec):
    def decode(self, data, errors="strict"):
        return _x_user_defined_decode(data, errors)

    def encode(self, text, errors="strict"):  # pragma: no cover - unused
        raise UnicodeError("x-user-defined is decode-only here")


def _x_user_defined_search(name):
    if name in ("x-user-defined", "x_user_defined"):
        codec = _XUserDefinedCodec()
        return codecs.CodecInfo(codec.encode, codec.decode,
                                name="x-user-defined")
    return None


codecs.register(_x_user_defined_search)


def resolve_encoding(label: str | None) -> str | None:
    """WHATWG-style label → Python codec name, or None when the label is
    unknown to (or forbidden by) the Encoding Standard."""
    if not label:
        return None
    label = label.strip().strip("\"'").lower()
    try:
        name = codecs.lookup(_WHATWG_LABELS.get(label, label)).name
    except LookupError:
        return None
    # Python resolves iso-8859-1 to 'iso8859-1'; the web decodes it (and
    # anything else that normalizes to latin-1/ascii) as windows-1252
    if name in ("iso8859-1", "latin-1", "ascii"):
        name = "cp1252"
    elif name == "utf-16":
        name = "utf-16-le"
    return name if name in _WHATWG_ENCODINGS else None


def _prescan_meta(head: bytes) -> bytes | None:
    """WHATWG-style prescan: comment-stripped, attribute-parsed meta tags
    — a ``charset`` attribute, or ``content`` when http-equiv is
    content-type. A bare regex over the head would let 'charset=' inside
    comments or unrelated content= values hijack the decoder (review r7
    finding)."""
    head = _COMMENT_RE.sub(b" ", head)
    for m in _META_TAG_RE.finditer(head):
        attrs = {}
        for am in _ATTR_RE.finditer(m.group(1)):
            name = am.group(1).lower()
            if name not in attrs:  # first occurrence wins, per spec
                attrs[name] = am.group(2).strip(b"\"'")
        if b"charset" in attrs:
            return attrs[b"charset"]
        if (attrs.get(b"http-equiv", b"").lower() == b"content-type"
                and b"content" in attrs):
            cm = _CT_CHARSET_RE.search(
                attrs[b"content"].decode("ascii", "replace"))
            if cm:
                return cm.group(1).encode("ascii")
    return None


def sniff_html_encoding(raw: bytes, content_type: str | None = None):
    """(encoding, bom_length) for an HTML byte payload, BOM > transport
    header > meta prescan > None (caller applies the UTF-8→1252 policy)."""
    if raw.startswith(b"\xef\xbb\xbf"):
        return "utf-8", 3
    if raw.startswith(b"\xff\xfe"):
        return "utf-16-le", 2
    if raw.startswith(b"\xfe\xff"):
        return "utf-16-be", 2
    if content_type:
        m = _CT_CHARSET_RE.search(content_type)
        if m:
            enc = resolve_encoding(m.group(1))
            if enc:
                return enc, 0
    head = raw[:_PRESCAN_BYTES]
    label = _prescan_meta(head)
    if label is None:
        xm = _XML_RE.match(head)
        if xm:
            label = xm.group(1)
    if label is not None:
        enc = resolve_encoding(label.decode("ascii", "replace"))
        if enc:
            # a meta claiming UTF-16 on an ASCII-compatible prescan is
            # self-contradictory; WHATWG coerces it to UTF-8
            if enc.startswith("utf-16"):
                enc = "utf-8"
            return enc, 0
    return None, 0


def decode_html_bytes(raw: bytes, content_type: str | None = None):
    """Decode an HTML payload to text: returns (text, encoding_used).

    Declared/sniffed encodings decode with 'replace' (a stray bad byte
    must not drop a page); with no declaration, strict UTF-8 is tried
    first and windows-1252 is the fallback."""
    if not raw:
        return "", "utf-8"
    enc, bom = sniff_html_encoding(raw, content_type)
    if enc is not None:
        errors = ("whatwg-c1"
                  if enc.startswith("cp12") or enc == "cp874"
                  else "replace")
        try:
            return raw[bom:].decode(enc, errors), enc
        except LookupError:  # pragma: no cover - resolve_encoding vetted it
            pass
    try:
        return raw.decode("utf-8"), "utf-8"
    except UnicodeDecodeError:
        return raw.decode("cp1252", "whatwg-c1"), "cp1252"


def to_text(value) -> str:
    """The pipeline's bytes-or-str html column → text (sniffing decode
    for bytes, pass-through for str)."""
    if isinstance(value, (bytes, bytearray)):
        return decode_html_bytes(bytes(value))[0]
    return value or ""
