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
- property classes: \\p{N}, \\d, \\w are IDENTICAL BMP-wide; \\p{L}
  (56 cps) and \\p{P} (14 cps) carry version skew where utf8proc's
  newer tables match and the JVM's do not — pinned exactly below.
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


# Unicode property-class version skew: for ALL of these, DuckDB/utf8proc
# (newer tables) matches and the JVM does not. \p{L}: Arabic Extended-B
# (U+0870-U+088E, Unicode 14 — Quranic/Arabic, REACHABLE in real crawls),
# late CJK (U+9FFD-U+9FFF, Unicode 13), Telugu/Kannada/Tagalog/Balinese
# singletons, Latin Extended-D additions. \p{P}: U+061D ARABIC END OF
# TEXT MARK (Unicode 14, reachable), Balinese and Supplemental
# Punctuation (U+2E53-U+2E5D).
VERSION_SKEW_LETTER = {
    *range(0x0870, 0x0887 + 1), 0x0889, 0x088A, 0x088B, 0x088C, 0x088D,
    0x088E, 0x08B5, 0x08C8, 0x08C9, 0x0C5D, 0x0CDD, 0x170D, 0x171F,
    0x1B4C, 0x2C2F, 0x2C5F, 0x9FFD, 0x9FFE, 0x9FFF, 0xA7C0, 0xA7C1,
    0xA7D0, 0xA7D1, 0xA7D3, 0xA7D5, 0xA7D6, 0xA7D7, 0xA7D8, 0xA7D9,
    0xA7F2, 0xA7F3, 0xA7F4,
}
VERSION_SKEW_PUNCT = {0x061D, 0x1B7D, 0x1B7E, *range(0x2E53, 0x2E5D + 1)}


def test_bmp_property_class_divergence_is_exactly_known(spark):
    """\\p{L} and \\p{P} carry Unicode-version skew (pinned exactly,
    direction: utf8proc matches, JVM does not); \\p{N}, \\d and \\w are
    IDENTICAL across the whole BMP. The shared-pattern oracles that ride
    these classes (BPE pretokenizer \\p{L}/\\p{N}, RAKE \\p{P}/\\p{N})
    are therefore engine-stable on every corpus avoiding the pinned
    codepoints — and the N/d/w-only patterns are stable everywhere. A
    corpus REACHING the skew (Arabic Extended-B, U+061D) would mismatch
    on q054/q043-family hashes; the fix there is explicit \\x{...}
    ranges in the shared pattern, not silence — this test is the
    tripwire."""
    cps = [c for c in range(1, 0x10000) if not (0xD800 <= c <= 0xDFFF)]
    rows = [(c, chr(c)) for c in cps]
    df = spark.createDataFrame(rows, "cp int, s string")
    classes = {"L": r"\p{L}", "N": r"\p{N}", "P": r"\p{P}", "d": r"\d", "w": r"\w"}
    sel = ["cp"] + [
        F.regexp_like("s", F.lit("^" + pat + "$")).alias(k)
        for k, pat in classes.items()
    ]
    sres = {r.cp: {k: bool(r[k]) for k in classes} for r in df.select(*sel).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (cp INT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?)", rows)
    q = "SELECT cp, " + ", ".join(
        f"regexp_matches(s, '^{pat}$')"
        for pat in ["\\p{L}", "\\p{N}", "\\p{P}", "\\d", "\\w"]
    ) + " FROM t"
    dres = {r[0]: dict(zip(classes, (bool(x) for x in r[1:]))) for r in con.execute(q).fetchall()}
    con.close()
    div = {k: set() for k in classes}
    for c in cps:
        for k in classes:
            if sres[c][k] != dres[c][k]:
                div[k].add(c)
                # direction invariant: utf8proc (newer tables) matches
                assert dres[c][k] and not sres[c][k], (k, hex(c))
    assert div["L"] == VERSION_SKEW_LETTER, sorted(map(hex, div["L"] ^ VERSION_SKEW_LETTER))
    assert div["P"] == VERSION_SKEW_PUNCT, sorted(map(hex, div["P"] ^ VERSION_SKEW_PUNCT))
    assert div["N"] == set() and div["d"] == set() and div["w"] == set()


# ---------------------------------------------------------------------------
# Astral planes (r10, VERDICT r9 #7): the BMP sweeps stop at U+FFFF; these
# cover U+10000-U+10FFFF exhaustively (1,048,576 codepoints, one combined
# pass). Pinned results:
#
# - regex \s, \d, \w: ZERO divergence astral-wide — the single \s
#   divergence in the whole codespace is BMP U+000B. Whitespace-split
#   oracles are astral-safe as-is.
# - lower(): exactly 57 divergent cps, ALL version skew in the
#   utf8proc-newer direction, two blocks: Vithkuqi capitals (Unicode 14)
#   and Garay capitals (Unicode 16) — scripts whose case maps the JVM's
#   tables predate. No astral CONTEXT rules exist (the Σ/İ story is
#   BMP-only), so fold_lower needs no astral entries; established-script
#   astral case pairs (Deseret, Osage, Warang Citi, math alphanumerics
#   stay caseless) agree on both engines.
# - \p{L}: 4,807 skew cps in 42 contiguous ranges — exactly the Unicode
#   14-16 script/CJK allocations (Vithkuqi, Latin Ext-F/G, Old Uyghur,
#   Arabic Ext-C, Kawi, Cypro-Minoan, Tangsa, Kana Ext-B, Nag Mundari,
#   CJK Ext-H, ...). \p{N}: 50 (Kawi/Tangsa/Kaktovik/Nag Mundari
#   digits). \p{P}: 30. Direction invariant holds astral-wide: the
#   DuckDB side matches and the JVM does not, NEVER the reverse.
# - DuckDB-internal nuance the Garay rows expose: lower() goes through
#   utf8proc (Unicode 16 tables) while regexp goes through RE2 (older
#   tables) — so a block can carry case-map skew without \p{L} skew.
#   Cross-engine pattern rules (\x{...} spelling for skew ranges) are
#   unchanged.

ASTRAL_SKEW_LOWER = {
    *range(0x10570, 0x1057A + 1), *range(0x1057C, 0x1058A + 1),
    *range(0x1058C, 0x10592 + 1), 0x10594, 0x10595,
    *range(0x10D50, 0x10D65 + 1),
}
ASTRAL_SKEW_LETTER_RANGES = [
    (0x10570, 0x1057A), (0x1057C, 0x1058A), (0x1058C, 0x10592),
    (0x10594, 0x10595), (0x10597, 0x105A1), (0x105A3, 0x105B1),
    (0x105B3, 0x105B9), (0x105BB, 0x105BC), (0x10780, 0x10785),
    (0x10787, 0x107B0), (0x107B2, 0x107BA), (0x10F70, 0x10F81),
    (0x11071, 0x11072), (0x11075, 0x11075), (0x1123F, 0x11240),
    (0x11740, 0x11746), (0x11AB0, 0x11ABF), (0x11F02, 0x11F02),
    (0x11F04, 0x11F10), (0x11F12, 0x11F33), (0x12F90, 0x12FF0),
    (0x1342F, 0x1342F), (0x13441, 0x13446), (0x16A70, 0x16ABE),
    (0x1AFF0, 0x1AFF3), (0x1AFF5, 0x1AFFB), (0x1AFFD, 0x1AFFE),
    (0x1B11F, 0x1B122), (0x1B132, 0x1B132), (0x1B155, 0x1B155),
    (0x1DF00, 0x1DF1E), (0x1DF25, 0x1DF2A), (0x1E030, 0x1E06D),
    (0x1E290, 0x1E2AD), (0x1E4D0, 0x1E4EB), (0x1E7E0, 0x1E7E6),
    (0x1E7E8, 0x1E7EB), (0x1E7ED, 0x1E7EE), (0x1E7F0, 0x1E7FE),
    (0x2A6DE, 0x2A6DF), (0x2B735, 0x2B739), (0x31350, 0x323AF),
]
ASTRAL_SKEW_NUMBER = {
    *range(0x11F50, 0x11F59 + 1), *range(0x16AC0, 0x16AC9 + 1),
    *range(0x1D2C0, 0x1D2D3 + 1), *range(0x1E4F0, 0x1E4F9 + 1),
}
ASTRAL_SKEW_PUNCT = {
    *range(0x10F86, 0x10F89 + 1), 0x116B9, *range(0x11B00, 0x11B09 + 1),
    *range(0x11F43, 0x11F4F + 1), 0x12FF1, 0x12FF2,
}


def test_astral_divergence_is_exactly_known(spark):
    """One exhaustive pass over every astral codepoint comparing lower()
    and the six regex classes across engines; see the block comment for
    the pinned findings. Arrow both ways (createDataFrame from pandas,
    toPandas, DuckDB register) keeps the 1M-row sweep to seconds."""
    import numpy as np
    import pandas as pd

    cps = np.arange(0x10000, 0x110000, dtype=np.int64)
    pdf = pd.DataFrame({"cp": cps, "s": [chr(int(c)) for c in cps]})
    df = spark.createDataFrame(pdf)
    sres = (
        df.select(
            "cp",
            F.lower("s").alias("lo"),
            F.regexp_like("s", F.lit(r"^\s$")).alias("ws"),
            F.regexp_like("s", F.lit(r"^\p{L}$")).alias("L"),
            F.regexp_like("s", F.lit(r"^\p{N}$")).alias("N"),
            F.regexp_like("s", F.lit(r"^\p{P}$")).alias("P"),
            F.regexp_like("s", F.lit(r"^\d$")).alias("d"),
            F.regexp_like("s", F.lit(r"^\w$")).alias("w"),
        )
        .toPandas()
        .sort_values("cp")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", pdf)
    dres = con.execute(
        r"""
        SELECT cp, lower(s) AS lo,
               regexp_matches(s, '^\s$') AS ws,
               regexp_matches(s, '^\p{L}$') AS L,
               regexp_matches(s, '^\p{N}$') AS N,
               regexp_matches(s, '^\p{P}$') AS P,
               regexp_matches(s, '^\d$') AS d,
               regexp_matches(s, '^\w$') AS w
        FROM t ORDER BY cp
        """
    ).df()
    con.close()
    assert (sres["cp"].values == dres["cp"].values).all()

    lower_div = {int(c) for c in cps[sres["lo"].values != dres["lo"].values]}
    assert lower_div == ASTRAL_SKEW_LOWER, sorted(map(hex, lower_div ^ ASTRAL_SKEW_LOWER))

    expected = {
        "ws": set(),
        "L": {c for a, b in ASTRAL_SKEW_LETTER_RANGES for c in range(a, b + 1)},
        "N": ASTRAL_SKEW_NUMBER,
        "P": ASTRAL_SKEW_PUNCT,
        "d": set(),
        "w": set(),
    }
    for k, exp in expected.items():
        sv = sres[k].values.astype(bool)
        dv = dres[k].values.astype(bool)
        mism = sv != dv
        div = {int(c) for c in cps[mism]}
        assert div == exp, (k, len(div ^ exp), sorted(map(hex, list(div ^ exp)[:20])))
        # direction invariant: the newer-tabled engine matches, never the JVM alone
        assert not (sv & ~dv & mism).any(), k


def test_utf8_lossy_decode_rust_parity():
    """The pipeline decodes gzip output with Python's
    bytes.decode('utf-8', errors='replace'); the reference uses Rust's
    String::from_utf8_lossy (main.rs:303). Both implement the WHATWG
    'substitution of maximal subparts' policy, pinned here on the
    adversarial shapes — surrogate-half encodings (CESU-8 style), each
    byte of the broken pair draws its own U+FFFD; truncated multi-byte
    sequences collapse to ONE U+FFFD per maximal subpart; overlongs are
    rejected per byte; astral sequences cut mid-way count as one."""
    cases = [
        (b"\xed\xa0\x80", "���"),  # UTF-8-encoded surrogate half
        (b"\xed\xa0\x80\xed\xbd\x95", "�" * 6),  # CESU-8 astral pair
        (b"\xf0\x9f\x92", "�"),  # truncated 4-byte (emoji) sequence
        (b"\xf0\x9f\x92a", "�a"),  # truncated then ASCII resumes
        (b"\xf0\x28\x8c\x28", "�(�("),  # bad continuation
        (b"\xc0\xaf", "��"),  # overlong '/': rejected per byte
        (b"\xe0\x80\x80", "���"),  # overlong NUL
        (b"\xf4\x90\x80\x80", "�" * 4),  # beyond U+10FFFF
        (b"\xff\xfe", "��"),  # never-valid lead bytes
        (b"a\xc2b", "a�b"),  # lone lead mid-ASCII
        (b"\xf0\x9f\x98\x80", "\U0001f600"),  # clean astral passes through
        (b"ok", "ok"),
    ]
    for raw, want in cases:
        got = raw.decode("utf-8", errors="replace")
        assert got == want, (raw, got, want)


def test_bpe_pattern_is_skew_proof(spark):
    """The shared BPE pretokenizer pattern spells the \\p{L} skew
    codepoints and \\x0B explicitly, so its counts agree cross-engine
    even on corpora REACHING the skew (Arabic Extended-B, late CJK,
    Latin Ext-D, vertical tab)."""
    from warcraider_spark.operators.text import BPE_ISH_PATTERN

    tests = [
        "hello world 42",
        "arabic ࡰࡱࡲ mark ؝ end",
        "cjk 鿽鿾 text",
        "latin Ꟁꟕ x",
        "vt\x0bsplit",
        "",
    ]
    df = spark.createDataFrame([(t,) for t in tests], "text string")
    sres = [
        r.n
        for r in df.select(
            F.regexp_count("text", F.lit(BPE_ISH_PATTERN)).alias("n")
        ).collect()
    ]
    con = duckdb.connect()
    for t, n in zip(tests, sres):
        d = con.execute(
            "select len(regexp_extract_all(?, ?))", [t, BPE_ISH_PATTERN]
        ).fetchone()[0]
        assert n == d, (repr(t), n, d)
    con.close()
