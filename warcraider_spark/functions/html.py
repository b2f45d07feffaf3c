"""HTML parsing operator (SURVEY §2.4) — the heavy UDF.

Replaces the reference's four-stage fallback cascade (ammonia clean →
strict quick-xml → tidy repair → soup DOM, /root/reference/src/lib.rs:
184-553) with ONE robust event parser (Python stdlib ``html.parser``,
which is lenient like tidy+soup). Per SURVEY §2.4 the fidelity target is
the *output columns* of the cascade, not the cascade itself; the golden
contract is the reference's own moneysmart snapshot
(/root/reference/tests/snapshots/tests__html_parser_snapshots.snap).

Event-routing semantics replicated from the strict parser
(lib.rs:244-383), including its quirks:
- text collected while ``in_body`` (initially TRUE — pre-<head> text
  counts); head/noscript/script/style/link set in_body=False; only
  head/noscript/script/style ENDS restore it — a bare ``<link>`` in body
  suppresses text until the next such end tag (lib.rs:302-324);
- meta key = LAST present of name/http-equiv/itemprop/property in
  attribute order, value = content, both non-empty (lib.rs:268-289);
- links: every a[href], document order, duplicates kept — the SOUP-path
  semantics (lib.rs:435-439) that the golden snapshot pins; the strict
  path's '_'/'#' prefix filter is available separately as
  extract.filter_link_prefixes. Dangerous schemes (javascript:, data:,
  vbscript:) are dropped, replicating the ammonia sanitizer's effect on
  the cascade input (lib.rs:61-153 — ammonia strips such hrefs);
- resource_urls: src/href of script/style/link tags (lib.rs:303-314);
- headings: h1-h6 raw inner text grouped BY LEVEL then document order —
  the soup path iterates h1s, then h2s, … (lib.rs:471-487), which is the
  order the golden pins;
- per-event text trimming (quick-xml ``trim_text(true)``), empties dropped.

Known deliberate divergence: attribute values arrive entity-unescaped
(html.parser resolves them; quick-xml kept them raw).

The oversize guard (>2 MB skips parsing, main.rs:376-381) lives in
plans.pipeline as a native ``when()`` OUTSIDE the UDF, so Catalyst short-
circuits without crossing into Python.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    MapType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["HTML_RESULT_SCHEMA", "parse_html_py", "parse_html_udf", "empty_html_result"]

HTML_RESULT_SCHEMA = StructType(
    [
        StructField("ok", BooleanType(), False),
        StructField("html_errors", StringType(), False),
        StructField("title", StringType(), False),
        StructField("text", ArrayType(StringType()), False),
        StructField("headings_text", ArrayType(StringType()), False),
        StructField("links", ArrayType(StringType()), False),
        StructField("resource_urls", ArrayType(StringType()), False),
        StructField("meta_tags", MapType(StringType(), StringType()), False),
    ]
)

_HEADINGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})
_META_KEY_ATTRS = ("name", "http-equiv", "itemprop", "property")
# ammonia's default URL-scheme denylist effect: relative URLs and common
# schemes pass; script-ish schemes have the attribute stripped
_BLOCKED_SCHEMES = ("javascript:", "data:", "vbscript:")


def _scheme_ok(href: str) -> bool:
    low = href.strip().lower()
    return not any(low.startswith(s) for s in _BLOCKED_SCHEMES)


def empty_html_result(ok: bool = False, html_errors: str = " ") -> dict:
    """HTMLResult::default() (lib.rs:43-56): ok=false, single-space
    html_errors/title, empty collections."""
    return {
        "ok": ok,
        "html_errors": html_errors,
        "title": " ",
        "text": [],
        "headings_text": [],
        "links": [],
        "resource_urls": [],
        "meta_tags": {},
    }


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.in_body = True  # pre-<head> text counts, like the reference
        self.in_title = False
        self.heading_level = 0  # current hN depth marker (0 = outside)
        self._heading_buf: list[str] = []
        self.title = ""
        self.text: list[str] = []
        self.headings: list[tuple[int, str]] = []  # (level, raw text)
        self.links: list[str] = []
        self.resources: list[str] = []
        self.meta: dict[str, str] = {}
        self.errors: list[str] = []

    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        if tag == "meta":
            key = ""
            value = ""
            for k, v in attrs:
                if k in _META_KEY_ATTRS and v is not None:
                    key = v  # LAST matching attribute wins (lib.rs:270-283)
                if k == "content" and v is not None:
                    value = v
            if key and value:
                self.meta[key] = value
        elif tag == "a":
            for k, v in attrs:
                if k == "href" and v is not None and _scheme_ok(v):
                    self.links.append(v)
        elif tag in ("head", "noscript"):
            self.in_body = False
        elif tag in ("script", "style", "link"):
            self.in_body = False
            for k, v in attrs:
                if k in ("src", "href") and v is not None:
                    self.resources.append(v)
        elif tag == "body":
            self.in_body = True
        elif tag == "title":
            self.in_title = True
        elif tag in _HEADINGS:
            self.heading_level = int(tag[1])
            self._heading_buf = []

    def handle_startendtag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        # <x/> = Start + End, like quick-xml expand_empty_elements
        self.handle_starttag(tag, attrs)
        self.handle_endtag(tag)

    def handle_endtag(self, tag: str) -> None:
        if tag in _HEADINGS:
            if self.heading_level:
                raw = "".join(self._heading_buf).strip()
                if raw:
                    self.headings.append((self.heading_level, raw))
            self.heading_level = 0
            self._heading_buf = []
        elif tag in ("head", "noscript", "script", "style"):
            # note: deliberately NOT "link" (lib.rs:322 quirk)
            self.in_body = True
        elif tag == "title":
            self.in_title = False

    def handle_data(self, data: str) -> None:
        if self.heading_level:
            self._heading_buf.append(data)  # raw, soup-style h.text
        txt = data.strip()
        if not txt:
            return
        if self.in_title:
            self.title = txt  # overwrite, last text event wins (lib.rs:330)
        if self.in_body:
            self.text.append(txt)

    def error(self, message: str) -> None:  # pragma: no cover
        self.errors.append(message)


def parse_html_py(raw_html: str) -> dict:
    """Parse one document → HTMLResult dict (schema above)."""
    if not raw_html:
        return empty_html_result(ok=False)
    parser = _Extractor()
    try:
        parser.feed(raw_html)
        parser.close()
    except Exception as exc:  # html.parser almost never raises, but be safe
        return empty_html_result(ok=False, html_errors=str(exc))
    # headings grouped by level, document order within a level (the soup
    # path's h1..h6 sweep, lib.rs:471-487); python's sort is stable
    headings = [t for _, t in sorted(parser.headings, key=lambda lt: lt[0])]
    return {
        "ok": True,
        "html_errors": "\n".join(parser.errors),
        "title": parser.title,
        "text": parser.text,
        "headings_text": headings,
        "links": parser.links,
        "resource_urls": parser.resources,
        "meta_tags": parser.meta,
    }


def parse_html_udf() -> F.Column:
    """Arrow-batched pandas UDF: raw_html string → HTMLResult struct.

    One UDF call per row; the pipeline projects all derived columns from a
    SINGLE invocation (SURVEY §4: never duplicate a Python UDF expression —
    Catalyst may re-execute it)."""
    from warcraider_spark.dist import ensure_package_on_executors
    ensure_package_on_executors()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(HTML_RESULT_SCHEMA)
    def _parse(html: pd.Series) -> pd.DataFrame:
        rows = [parse_html_py(h or "") for h in html]
        return pd.DataFrame(rows)

    return _parse
