"""RSS 2.0 / Atom feed parsing for the webtext discovery path.

Feeds are the other URL-discovery surface a crawl processes besides
sitemaps (functions/sitemaps.py) — and mime_route already classifies
``<rss``/``<feed`` payloads as XML; this turns them into rows. Same
hostile-input posture as the sitemap parser: xml.parsers.expat with
entity declarations rejected, a size cap, ValueError-only errors for
per-payload quarantine.

Returns (kind, entries): kind ∈ {"rss", "atom"}; each entry is
{title, link, published, summary}. RSS reads channel/item with
title/link/pubDate/description; Atom reads feed/entry with title,
link[@href] (rel=alternate preferred), published|updated, summary.
The reference has no feed handling (its ingestion starts from files).
"""

from __future__ import annotations

_MAX_FEED_BYTES = 10_485_760  # 10 MiB — far above any real feed
_MAX_ENTRIES = 10_000


def parse_feed(data: bytes) -> tuple[str, list[dict]]:
    if len(data) > _MAX_FEED_BYTES:
        raise ValueError("feed: exceeds size cap")
    if data.startswith(b"\xef\xbb\xbf"):
        data = data[3:]

    from xml.parsers import expat

    parser = expat.ParserCreate(namespace_separator=" ")

    def _reject_entities(*_args):
        raise ValueError("feed: entity declarations are not allowed")

    parser.EntityDeclHandler = _reject_entities
    parser.ExternalEntityRefHandler = lambda *a: 0

    state = {"kind": None, "stack": [], "cur": None, "text": [],
             "link_rel_alt": False}
    entries: list[dict] = []

    def _local(name: str) -> str:
        return name.rsplit(" ", 1)[-1].lower()

    def start(name, attrs):
        tag = _local(name)
        state["stack"].append(tag)
        depth = len(state["stack"])
        if depth == 1:
            if tag == "rss":
                state["kind"] = "rss"
            elif tag == "feed":
                state["kind"] = "atom"
            else:
                raise ValueError(f"feed: unexpected root <{tag}>")
        elif (state["kind"] == "rss" and depth == 3 and tag == "item") or \
                (state["kind"] == "atom" and depth == 2 and tag == "entry"):
            state["cur"] = {"title": None, "link": None,
                            "published": None, "summary": None}
            if len(entries) >= _MAX_ENTRIES:
                raise ValueError("feed: exceeds entry cap")
        elif state["kind"] == "atom" and state["cur"] is not None \
                and tag == "link":
            rel = None
            href = None
            for k, v in attrs.items():
                lk = _local(k)
                if lk == "rel":
                    rel = v
                elif lk == "href":
                    href = v
            if href:
                is_alt = rel in (None, "alternate")
                if is_alt and not state["link_rel_alt"]:
                    # FIRST rel=alternate wins (feed convention; ADVICE r7
                    # — later alternates no longer overwrite it)
                    state["cur"]["link"] = href
                    state["link_rel_alt"] = True
                elif not is_alt and state["cur"]["link"] is None:
                    # non-alternate only ever fills an empty placeholder
                    state["cur"]["link"] = href
        state["text"] = []

    def chars(text):
        state["text"].append(text)

    def end(name):
        tag = _local(name)
        cur = state["cur"]
        kind = state["kind"]
        depth = len(state["stack"])
        value = "".join(state["text"]).strip()
        if cur is not None:
            if kind == "rss" and depth == 4:
                if tag == "title":
                    cur["title"] = value or None
                elif tag == "link":
                    cur["link"] = value or None
                elif tag == "pubdate":
                    cur["published"] = value or None
                elif tag == "description":
                    cur["summary"] = value or None
            elif kind == "atom" and depth == 3:
                if tag == "title":
                    cur["title"] = value or None
                elif tag in ("published", "updated"):
                    # published preferred; updated only fills a gap
                    if tag == "published" or cur["published"] is None:
                        cur["published"] = value or None
                elif tag == "summary":
                    cur["summary"] = value or None
            if (kind == "rss" and depth == 3 and tag == "item") or \
                    (kind == "atom" and depth == 2 and tag == "entry"):
                entries.append(cur)
                state["cur"] = None
                state["link_rel_alt"] = False
        state["stack"].pop()
        state["text"] = []

    parser.StartElementHandler = start
    parser.EndElementHandler = end
    parser.CharacterDataHandler = chars
    try:
        parser.Parse(data, True)
    except expat.ExpatError as e:
        raise ValueError(f"feed: malformed XML: {e}") from e
    if state["kind"] is None:
        raise ValueError("feed: no root element")
    return state["kind"], entries
