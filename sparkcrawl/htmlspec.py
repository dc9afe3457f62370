"""Reference implementation of the extraction SPEC (pure Python, html.parser).

The reference extracts text with ``Jsoup.parse(html).text()`` and links with
``jdoc.select("a[href]")`` + ``abs:href`` (DocumentParserBolt.java:171-216).
We pin the equivalent spec precisely so two independent implementations
(this one, used by the fixture generator and the oracle; and the regex-based
vectorized one in extract.py, used by the engine) can be checked for
byte-identical output — the driver's per-row invariant.

SPEC
----
text:   all character data of the document in order, with <script>/<style>
        contents removed, HTML entities decoded, whitespace runs collapsed
        to a single space, and leading/trailing whitespace stripped.
links:  the href attribute value of every <a> element, in document order,
        raw (resolution happens in urlnorm.canonicalize).
lang:   the lang attribute of the <html> element, lowercased; '' if absent.
title:  text content of the first <title> element, same whitespace rule.
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser

_WS = re.compile(r"\s+")


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []
        self.links: list[str] = []
        self.lang = ""
        self.title_chunks: list[str] = []
        self._skip = 0
        self._in_title = False

    def handle_starttag(self, tag, attrs):
        if tag in ("script", "style"):
            self._skip += 1
        elif tag == "a":
            for k, v in attrs:
                if k == "href" and v is not None:
                    self.links.append(v)
                    break
        elif tag == "html":
            for k, v in attrs:
                if k == "lang" and v:
                    self.lang = v.lower()
        elif tag == "title":
            self._in_title = True

    def handle_endtag(self, tag):
        if tag in ("script", "style") and self._skip:
            self._skip -= 1
        elif tag == "title":
            self._in_title = False

    def handle_data(self, data):
        if self._skip:
            return
        self.chunks.append(data)
        if self._in_title:
            self.title_chunks.append(data)


def _collapse(s: str) -> str:
    return _WS.sub(" ", s).strip()


def extract(html: bytes | str) -> dict:
    """html -> {text, links, lang, title} per the SPEC above."""
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    p = _Extractor()
    p.feed(html)
    p.close()
    return {
        "text": _collapse("".join(p.chunks)),
        "links": p.links,
        "lang": p.lang,
        "title": _collapse("".join(p.title_chunks)),
    }


# expose unescape so the vectorized twin and tests share entity semantics
decode_entities = unescape
