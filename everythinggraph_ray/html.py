"""Serial reference HTML extractor — THE byte-identity contract.

The reference engine has no web front end (its input is a binary edge file,
/root/reference/README.md:21-23); BASELINE.json's input_hint adds one: pages
``(url, warc_ts, html, text, lang)`` whose extracted text must be
byte-identical, per url, between this serial extractor and the distributed
``map_batches`` run. These pure functions ARE the reference semantics; the
Ray stage in :mod:`everythinggraph_ray.stages.extract` must call exactly
these and nothing else.

Pure Python + stdlib only, deterministic, no network.
"""

from __future__ import annotations

import re
from html import unescape
from urllib.parse import urljoin, urlsplit, urlunsplit

# Compiled once at import; stages reuse these (no per-batch compile).
_RE_DROP = re.compile(
    r"<script\b[^>]*>.*?</script\s*>|<style\b[^>]*>.*?</style\s*>|<!--.*?-->",
    re.IGNORECASE | re.DOTALL,
)
_RE_BLOCK_CLOSE = re.compile(
    r"</(?:p|div|li|ul|ol|h[1-6]|title|tr|table|blockquote|section|article|header|footer)\s*>"
    r"|<br\s*/?>|<hr\s*/?>",
    re.IGNORECASE,
)
_RE_TAG = re.compile(r"<[^>]*>")
_RE_HSPACE = re.compile(r"[ \t\r\f\v]+")
_RE_BLANKLINES = re.compile(r"\n{2,}")
_RE_HREF = re.compile(
    r"""<a\b[^>]*?\bhref\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""",
    re.IGNORECASE | re.DOTALL,
)

_DEFAULT_PORT = {"http": ":80", "https": ":443"}


def extract_text(html: bytes | str) -> str:
    """Visible text of an HTML document (deterministic reference rendering).

    Rules: drop script/style/comments; closing block tags and <br>/<hr>
    become newlines; all other tags vanish; entities unescaped; horizontal
    whitespace collapsed to single spaces; lines stripped; blank-line runs
    collapsed; result stripped.
    """
    if isinstance(html, bytes):
        html = html.decode("utf-8", errors="replace")
    s = _RE_DROP.sub("", html)
    s = _RE_BLOCK_CLOSE.sub("\n", s)
    s = _RE_TAG.sub("", s)
    s = unescape(s)
    s = _RE_HSPACE.sub(" ", s)
    lines = [ln.strip() for ln in s.split("\n")]
    s = "\n".join(lines)
    s = _RE_BLANKLINES.sub("\n", s)
    return s.strip()


def normalize_url(url: str) -> str | None:
    """Canonical form of an absolute url; None if not http(s).

    Lowercase scheme+host, strip default ports and fragments, empty path
    becomes '/'; query kept verbatim.
    """
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    netloc = parts.netloc.lower()
    if netloc.endswith(_DEFAULT_PORT[scheme]):
        netloc = netloc.rsplit(":", 1)[0]
    if not netloc:
        return None
    path = parts.path or "/"
    return urlunsplit((scheme, netloc, path, parts.query, ""))


def extract_links(html: bytes | str, base_url: str) -> list[str]:
    """All out-links of a page: href values of <a> tags, resolved against
    ``base_url``, normalized, http(s) only. Order of appearance, duplicates
    KEPT (the edge pipeline decides about dedup — the reference treats
    duplicate edges as multiplicity, init_all.h:40 keeps self-loops too).
    """
    if isinstance(html, bytes):
        html = html.decode("utf-8", errors="replace")
    html = _RE_DROP.sub("", html)
    out: list[str] = []
    for m in _RE_HREF.finditer(html):
        raw = unescape(m.group(1) or m.group(2) or m.group(3) or "").strip()
        if not raw or raw.startswith(("javascript:", "mailto:", "data:", "#")):
            continue
        try:
            resolved = urljoin(base_url, raw)
        except ValueError:
            continue
        norm = normalize_url(resolved)
        if norm is not None:
            out.append(norm)
    return out


_RE_ANCHOR = re.compile(
    r"""<a\b[^>]*?\bhref\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))[^>]*>(.*?)</a\s*>""",
    re.IGNORECASE | re.DOTALL,
)


def extract_anchors(html: bytes | str, base_url: str) -> list[tuple[str, str]]:
    """(normalized target url, anchor text) per <a> element — the anchor
    text signal (in-link text describes the TARGET page; a core ranking /
    training-label source). Same href filtering as ``extract_links``
    (script/style/comment regions dropped first; javascript:/mailto:/
    data:/fragment hrefs skipped; urls resolved + normalized); anchor
    text is the element's visible inner text (tags stripped, entities
    unescaped, whitespace collapsed)."""
    if isinstance(html, bytes):
        html = html.decode("utf-8", errors="replace")
    html = _RE_DROP.sub("", html)
    out: list[tuple[str, str]] = []
    for m in _RE_ANCHOR.finditer(html):
        raw = unescape(m.group(1) or m.group(2) or m.group(3) or "").strip()
        if not raw or raw.startswith(("javascript:", "mailto:", "data:", "#")):
            continue
        try:
            resolved = urljoin(base_url, raw)
        except ValueError:
            continue
        norm = normalize_url(resolved)
        if norm is None:
            continue
        # mirror extract_text's tag handling: block closers and <br>/<hr>
        # separate words, every other tag vanishes
        text = unescape(_RE_TAG.sub("", _RE_BLOCK_CLOSE.sub("\n", m.group(4))))
        text = _RE_HSPACE.sub(" ", text.replace("\n", " ")).strip()
        out.append((norm, text))
    return out
