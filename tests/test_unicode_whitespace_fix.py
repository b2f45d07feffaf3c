"""r11: the Unicode whitespace-class fix (VERDICT r10 #1) + ADVICE r10 items.

The reference's whitespace regexes are Rust `regex` patterns whose `\\s` is
the Unicode White_Space property; the JVM's default `\\s` and RE2's `\\s`
are ASCII(-ish). Until r11 the engine replicated the PATTERNS byte-for-byte
but not the CLASS — a run of two U+3000/NBSP was deleted by the reference
and kept by us (COVERAGE.md §2.3, the last documented wrong-vs-reference
behavior). The fix: Java `(?U)` (UNICODE_CHARACTER_CLASS) on the
reference-parity patterns, and the explicit class
`[\\s\\x0B\\p{Zs}\\x{0085}\\x{2028}\\x{2029}]` in every DuckDB oracle twin.

Ground truth in these tests is the Python `regex` module, whose `\\s` is
also Unicode White_Space — a third, independent engine agreeing with the
Rust semantics (reference: /root/reference/src/main.rs:54 WHITESPACE_REGEX,
main.rs:470 par_split_whitespace, rake.rs:81 split_whitespace).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from warcraider_spark.functions import extract as X
from warcraider_spark.functions.textfn import DUCK_UWS, word_count, word_count_sql

regex = pytest.importorskip("regex")

RUST_WS_RUN = regex.compile(r"(\s|\\n){2,}")

# Adversarial whitespace shapes: ASCII runs, White_Space-only runs
# (U+3000, NBSP, NEL, LS/PS, ogham, NNBSP/MMSP), mixed runs, singles
# (must be KEPT — the quirk needs {2,}), the literal-backslash-n quirk
# branch, ZWSP (NOT White_Space: never deleted), and empties.
CASES = [
    "a  b",                          # ASCII run
    "a\u3000\u3000b",              # ideographic-space run
    "a\u00a0\u00a0b",              # NBSP run
    "a\u3000b",                     # single U+3000: KEPT by the quirk
    "a \u3000b",                    # mixed ASCII+U+3000 run
    "x\\n\\ny",                  # literal backslash-n quirk branch
    "x\\n\u3000y",                # literal \\n + U+3000 mixed run
    "a\x0b\x0bb",                  # VT run (RE2 \\s lacks VT)
    "a\x85\x85b",                  # NEL run
    "a\u2028\u2029b",              # LS + PS run
    "\u3000\u3000lead",            # leading run
    "only\u3000",                   # trailing single
    "",
    "\u3000 \u00a0",               # whitespace-only text
    "w1 w2\u3000w3 w4",             # word_count mixed separators
    "a\u200bb",                     # ZWSP is NOT White_Space: kept
    "a\u1680\u2009b",              # ogham + thin-space run
    "a\u202f\u205fb",              # NNBSP + MMSP run
    "\u6df1\u5ea6\u5b66\u4e60\u3000\u3000\u6a21\u578b\u3000\u6570\u636e",  # CJK with U+3000 runs
    "nbsp\u00a0word \u00a0run\u00a0\u00a0end",  # NBSP embedded in ASCII
]


def test_quirk_and_word_count_match_rust_semantics(spark):
    """Spark (?U) patterns == DuckDB explicit-class twins == Rust Unicode
    \\s, on every adversarial shape, for both quirk modes and word_count."""
    df = spark.createDataFrame(list(enumerate(CASES)), "i int, t string")
    got = {
        r["i"]: r
        for r in df.select(
            "i",
            X.whitespace_normalize_delete("t").alias("d"),
            X.whitespace_normalize_space("t").alias("s"),
            word_count("t").alias("w"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE c(i INT, t VARCHAR)")
    con.executemany("INSERT INTO c VALUES (?, ?)", list(enumerate(CASES)))
    duck = con.execute(
        f"""
        SELECT i,
               regexp_replace(t, '({DUCK_UWS}|\\\\n){{2,}}', '', 'g'),
               regexp_replace(t, '({DUCK_UWS}|\\\\n){{2,}}', ' ', 'g'),
               {word_count_sql('t')}
        FROM c ORDER BY i
        """
    ).fetchall()
    for i, dd, ds, dw in duck:
        t = CASES[i]
        rust_d = RUST_WS_RUN.sub("", t)
        rust_s = RUST_WS_RUN.sub(" ", t)
        rust_w = len(t.split())  # Python str.split == split_whitespace
        g = got[i]
        assert g["d"] == dd == rust_d, (i, t, g["d"], dd, rust_d)
        assert g["s"] == ds == rust_s, (i, t, g["s"], ds, rust_s)
        assert g["w"] == dw == rust_w, (i, t, g["w"], dw, rust_w)


def test_link_pattern_matches_through_unicode_whitespace(spark):
    """main.rs:66-68 HTML_LINK_REGEX/HTML_RESOURCE_REGEX: Rust \\s+ before
    the attribute is Unicode — '<a\\u3000href=...>' must match (r11 (?sU))."""
    html = (
        'pre <a\u3000href="/u3000"> mid <img\u00a0src="/nbsp.png">'
        ' post <a href="/ascii">'
    )
    df = spark.createDataFrame([(html,)], "h string")
    row = df.select(
        X.links_fallback("h").alias("l"),
        X.resources_fallback("h").alias("r"),
    ).collect()[0]
    assert row["l"] == ["/u3000", "/ascii"]
    assert row["r"] == ["/nbsp.png"]
    # third engine: the Rust pattern via the regex module
    rust = regex.compile(r"""(?s)\s+(?:[^>]*?\s+)?href=["'](.*?)["']""")
    assert [m.group(1) for m in rust.finditer(html)] == ["/u3000", "/ascii"]


def test_scheme_ok_whatwg_tab_newline_stripping():
    """ADVICE r10 #1: url::Url::parse removes ASCII tab/newline ANYWHERE
    before scheme parsing — 'java\\tscript:...' is scheme javascript and
    must be FILTERED, not treated as relative and kept."""
    from warcraider_spark.functions.html import _scheme_ok, parse_html_py

    assert not _scheme_ok("java\tscript:alert(1)")
    assert not _scheme_ok("java\nscript:alert(1)")
    assert not _scheme_ok("\tjavascript:alert(1)")
    assert not _scheme_ok("java\rscri\npt:alert(1)")
    assert _scheme_ok("ht\ttps://ok.example/")  # tabs removed -> https
    assert _scheme_ok("/rel\tative")  # still relative after removal
    assert _scheme_ok("  https://ok.example/  ")
    # leading C0 controls are stripped like WHATWG, then scheme parsed
    assert not _scheme_ok("\x00\x01javascript:x")
    # end-to-end: the dangerous link disappears from the parse result
    r = parse_html_py('<a href="java\tscript:alert(1)">x</a><a href="/keep">y</a>')
    assert r["links"] == ["/keep"]


def test_deleted_region_rawtext_comment_bytes():
    """ADVICE r10 #2: html5ever RAWTEXT ends at the FIRST matching end tag
    even inside comment-looking bytes — '<!-- </noscript> -->x' leaves
    ' -->x' visible. HTMLParser's cdata mode now reproduces that."""
    from warcraider_spark.functions.html import parse_html_py

    r = parse_html_py("<noscript><!-- </noscript> -->x</noscript>")
    assert r["text"] == ["-->x"]

    # regression: nested same-name start stays text, outer end closes
    r2 = parse_html_py("<noscript>one<noscript>two</noscript>three</noscript>tail")
    assert r2["text"] == ["three", "tail"]

    # unterminated region swallows to EOF (html5ever: all raw text inside
    # the deleted element -> equally invisible)
    r3 = parse_html_py("<style>p{}</styl>everything hidden")
    assert r3["text"] == []

    # self-closing raw-text element: html5ever ignores the flag; the
    # region opens until the REAL end tag
    r4 = parse_html_py("<noscript/>hidden<a href='/h'>h</a></noscript>shown")
    assert r4["text"] == ["shown"]
    assert r4["links"] == []

    # a '<script>' inside a deleted region is raw text, not a resource
    r5 = parse_html_py('<noframes><script src="/x.js"></script></noframes>after')
    assert r5["text"] == ["after"]
    assert r5["resource_urls"] == []
