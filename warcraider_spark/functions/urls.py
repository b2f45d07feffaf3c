"""URL absolutization + registrable-domain extraction (SURVEY §2.9 #4).

Replaces /root/reference/src/lib.rs:400-417 (make_urls_absolute) and
main.rs:333-339 (public-suffix root domain). Python UDFs because RFC-3986
resolution and suffix rules are not Catalyst expressions; Arrow-batched so
the per-row cost is a dict lookup + urljoin.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlparse, urlunparse

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

__all__ = ["make_urls_absolute", "root_domain", "absolutize_udf", "root_domain_udf"]

# lib.rs:59 — quote marks anywhere, %dd only at end-of-string
_QUOTE_MARKS_RE = re.compile(r"'|“|\"|&quot;|%\d\d$")

# Minimal embedded public-suffix rules for the crawl's domain space (the
# full PSL is overkill for .gov.au-centric data; extend as needed). Two-
# label suffixes first so "foo.gov.au" → "foo.gov.au" roots at 3 labels.
_TWO_LABEL_SUFFIXES = frozenset(
    {
        "gov.au", "com.au", "net.au", "org.au", "edu.au", "asn.au", "id.au",
        "co.uk", "org.uk", "gov.uk", "ac.uk",
        "co.nz", "org.nz", "govt.nz",
    }
)
_ONE_LABEL_SUFFIXES = frozenset({"au", "com", "net", "org", "edu", "gov", "io", "info", "biz", "uk", "nz"})


def make_urls_absolute(url: str, links: list[str]) -> list[str]:
    """Reference semantics (lib.rs:400-417): sort+dedup, resolve each link
    against the page URL (failures keep the original), strip quote marks /
    trailing %dd, sort+dedup again. If the BASE fails to parse, links pass
    through unchanged (after the first sort+dedup)."""
    uniq = sorted(set(links))
    parsed = urlparse(url)
    if not parsed.scheme or not parsed.netloc:
        return uniq
    resolved = []
    for link in uniq:
        try:
            # strip quote marks BEFORE joining too: Python's urljoin drops a
            # trailing ';' (empty-params quirk), which would leave '&quot'
            # unstrippable; the reference strips only after its Url::join,
            # which preserves ';'. Pre+post stripping is idempotent.
            absu = urljoin(url, _QUOTE_MARKS_RE.sub("", link))
            # rust-url renders an empty path as "/" (http://google.com →
            # http://google.com/); mirror that normalization. Rebuild via
            # urlunparse — a substring replace of the netloc can hit an
            # earlier occurrence (e.g. the 'h' of 'http' for host 'h').
            p = urlparse(absu)
            if p.scheme in ("http", "https") and p.netloc and p.path == "":
                absu = urlunparse((p.scheme, p.netloc, "/", p.params, p.query, p.fragment))
            resolved.append(absu)
        except ValueError:
            resolved.append(link)
    cleaned = [_QUOTE_MARKS_RE.sub("", l) for l in resolved]
    return sorted(set(cleaned))


def root_domain(hostname: str) -> str:
    """Registrable root domain (main.rs:333-339 used the `addr` crate's
    PSL; this uses the embedded suffix table). The reference PANICS on an
    invalid hostname (unwrap at main.rs:337) — we return '' instead and
    the pipeline surfaces it as an empty domain_name."""
    if not hostname:
        return ""
    labels = hostname.lower().rstrip(".").split(".")
    if len(labels) < 2:
        return ""
    two = ".".join(labels[-2:])
    if two in _TWO_LABEL_SUFFIXES:
        return ".".join(labels[-3:]) if len(labels) >= 3 else ""
    if labels[-1] in _ONE_LABEL_SUFFIXES:
        return two
    return two


def absolutize_udf() -> F.Column:
    from warcraider_spark.dist import ensure_package_on_executors
    ensure_package_on_executors()

    from pyspark.sql.functions import pandas_udf

    @pandas_udf(ArrayType(StringType()))
    def _abs(urls: pd.Series, links: pd.Series) -> pd.Series:
        return pd.Series(
            [make_urls_absolute(u or "", list(l) if l is not None else []) for u, l in zip(urls, links)]
        )

    return _abs


def root_domain_udf() -> F.Column:
    from warcraider_spark.dist import ensure_package_on_executors
    ensure_package_on_executors()

    from pyspark.sql.functions import pandas_udf

    @pandas_udf(StringType())
    def _root(hosts: pd.Series) -> pd.Series:
        return hosts.map(lambda h: root_domain(h or ""))

    return _root
