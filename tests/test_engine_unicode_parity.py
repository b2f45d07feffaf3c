"""Exhaustive cross-engine Unicode parity sweeps (r9).

The fixed adversarial corpus (test_oracle_queries._unicode_corpus) pins
the divergences we FOUND; these sweeps prove there are no others hiding
in the BMP — and flag any future JVM/utf8proc Unicode-table skew in CI
instead of as a silent hash mismatch at sf-whatever.

Known results they pin:

- lower(): exactly 15 divergent codepoints. Two are REAL (context
  rules): U+0130 İ (JVM appends U+0307) and word-final U+03A3 Σ (JVM
  'ς') — both neutralized by textfn.fold_lower on every lowercased
  oracle pair. The other 13 are Unicode-VERSION skew on historic/
  phonetic letters (Latin Extended-D Unicode 12-16 additions + two
  Cyrillic/Glagolitic cases) that the fold deliberately does NOT carry:
  they are unreachable in practice and a 13-deep replace chain on every
  row is real cost for zero corpus coverage. If this set ever grows
  into a living-script range, extend fold_lower.
- regex \\s: Java includes U+000B (vertical tab), RE2 does not — the
  single divergence in the whole BMP. Every DuckDB oracle therefore
  splits on [\\s\\v] (RE2 \\v = the VT char; Java-side patterns keep
  plain \\s, already a superset) and SHARED patterns spell \\x0B
  explicitly (Java class \\v would be the vertical-whitespace SET
  incl. U+0085/U+2028/U+2029 — not the same char).
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

# the 13 version-skew codepoints (JVM knows a case mapping utf8proc
# doesn't, or maps differently): Latin Extended-D + U+1C89 + U+2C2F
VERSION_SKEW_LOWER = {
    0x1C89, 0x2C2F, 0xA7C0, 0xA7C7, 0xA7C9, 0xA7CB, 0xA7CC,
    0xA7D0, 0xA7D6, 0xA7D8, 0xA7DA, 0xA7DC, 0xA7F5,
}
FOLDED_LOWER = {0x0130, 0x03A3}


def _fold(s: str) -> str:
    return s.replace("ς", "σ").replace("i̇", "i")


def test_bmp_lower_divergence_is_exactly_known(spark):
    cps = [c for c in range(32, 0x10000) if not (0xD800 <= c <= 0xDFFF)]
    rows = [(c, chr(c), "a" + chr(c)) for c in cps]
    df = spark.createDataFrame(rows, "cp int, solo string, final string")
    sres = df.select(
        "cp", F.lower("solo").alias("ls"), F.lower("final").alias("lf")
    ).collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE t (cp INT, solo VARCHAR, final VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", rows)
    dres = {
        r[0]: (r[1], r[2])
        for r in con.execute("SELECT cp, lower(solo), lower(final) FROM t").fetchall()
    }
    con.close()
    raw_div = set()
    post_fold_div = set()
    for r in sres:
        ds, dfi = dres[r.cp]
        if r.ls != ds or r.lf != dfi:
            raw_div.add(r.cp)
        if _fold(r.ls) != _fold(ds) or _fold(r.lf) != _fold(dfi):
            post_fold_div.add(r.cp)
    assert raw_div == VERSION_SKEW_LOWER | FOLDED_LOWER, sorted(map(hex, raw_div))
    # the fold neutralizes every real-script divergence; only the
    # documented version-skew tail remains
    assert post_fold_div == VERSION_SKEW_LOWER, sorted(map(hex, post_fold_div))


def test_bmp_whitespace_class_divergence_is_exactly_vt(spark):
    cps = [c for c in range(1, 0x10000) if not (0xD800 <= c <= 0xDFFF)]
    rows = [(c, "a" + chr(c) + "b") for c in cps]
    df = spark.createDataFrame(rows, "cp int, s string")
    spark_split = {
        r.cp
        for r in df.select(
            "cp", F.size(F.split("s", r"\s+")).alias("n")
        ).collect()
        if r.n == 2
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (cp INT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?)", rows)
    duck_split = {
        r[0]
        for r in con.execute(
            "SELECT cp, len(string_split_regex(s, '\\s+')) FROM t"
        ).fetchall()
        if r[1] == 2
    }
    duck_aligned = {
        r[0]
        for r in con.execute(
            "SELECT cp, len(string_split_regex(s, '[\\s\\v]+')) FROM t"
        ).fetchall()
        if r[1] == 2
    }
    con.close()
    assert spark_split ^ duck_split == {0x0B}
    # the oracle convention closes it exactly — and RE2's \v is the VT
    # CHAR, not Java's vertical-whitespace class
    assert duck_aligned == spark_split
