"""Every registered query hash-matches its DuckDB oracle at sf0.001.

This is a local replica of the driver's t2 gate (run at the smaller sf for
speed; the driver runs sf0.01). Queries without an oracle just must run and
return a stable schema.
"""

from __future__ import annotations

import pytest

from warcraider_spark.oracle import run_oracle
from warcraider_spark.registry import all_specs


@pytest.mark.parametrize("name", sorted(all_specs()))
def test_query_matches_oracle(spark, sf_smoke, name):
    spec = all_specs()[name]
    res = run_oracle(spark, spec, sf_smoke)
    assert res.ok, f"{name}: {res.detail}"
    assert res.spark_rows >= 0


def test_rows_only_list_column_rejected(spark, sf_smoke):
    """A rows-only query emitting an array column must fail LOCALLY: the
    driver's pandas canonicalizer crashes on list cells (q143's r2 ERR), so
    run_oracle hashes rows-only output through the same strict canon."""
    from pyspark.sql import functions as F

    from warcraider_spark.registry import QuerySpec

    spec = QuerySpec(
        name="rows_only_list_probe",
        builder=lambda s, d: s.range(3).select(F.array(F.col("id")).alias("arr")),
        oracle=None,
    )
    with pytest.raises(TypeError, match="array/map"):
        run_oracle(spark, spec, sf_smoke)


def test_pmi_log_domain_guard(spark):
    """q148's int64 headroom guard (ENFORCED this round, VERDICT r4
    "What's wrong" #2): counts large enough that n_xy*nn*1e6 overflows
    int64 must switch to the log-domain micro-nat path, and that path
    must rank identically to driver-side math.log PMI."""
    import math

    from warcraider_spark.operators.text import _pmi_rank_expr, pmi_needs_log_domain

    # cert-scale counts stay on the integer path
    assert not pmi_needs_log_domain(max_nxy=10_000, nn=1_000_000)
    # web-scale counts exceed headroom: 1e7 * 1e12 * 1e6 = 1e25 > 2^63
    assert pmi_needs_log_domain(max_nxy=10_000_000, nn=10**12)
    # ADVICE r7 #1: denominator-side overflow with a SMALL max(n_xy) —
    # the numerator test alone does not fire (5 * 1e10 * 1e6 = 5e16 <
    # 2^63) but max(n_x)*max(n_y) = 16e18 > 2^63 would corrupt the
    # integer division; the extended guard must route to the log path.
    assert not pmi_needs_log_domain(max_nxy=5, nn=10**10)
    assert pmi_needs_log_domain(
        max_nxy=5, nn=10**10, max_nx=4_000_000_000, max_ny=4_000_000_000
    )
    assert not pmi_needs_log_domain(
        max_nxy=5, nn=10**10, max_nx=2_000_000_000, max_ny=2_000_000_000
    )

    nn = 10**12
    rows = [  # (w1, w2, n_xy, n_x, n_y) with web-scale marginals
        ("new", "york", 9_000_000, 20_000_000, 10_000_000),
        ("of", "the", 8_000_000, 40_000_000_000, 60_000_000_000),
        ("machine", "learning", 2_000_000, 5_000_000, 3_000_000),
        ("hong", "kong", 1_500_000, 1_600_000, 1_550_000),
    ]
    df = spark.createDataFrame(rows, "w1 string, w2 string, n_xy long, n_x long, n_y long")
    got = {
        (r["w1"], r["w2"]): r["pmi"]
        for r in df.select(
            "w1", "w2", _pmi_rank_expr(nn, use_log=True).alias("pmi")
        ).collect()
    }
    for w1, w2, n_xy, n_x, n_y in rows:
        exact = math.floor(
            1_000_000 * (math.log(n_xy) + math.log(nn) - math.log(n_x) - math.log(n_y))
        )
        assert abs(got[(w1, w2)] - exact) <= 1, (w1, w2, got[(w1, w2)], exact)
    ranked = sorted(got.items(), key=lambda kv: -kv[1])
    assert [k for k, _ in ranked] == [
        ("hong", "kong"),  # ratio ~6.0e5
        ("machine", "learning"),  # ~1.3e5
        ("new", "york"),  # ~4.5e4
        ("of", "the"),  # ~3.3e-3 (negative PMI)
    ]


def test_gopher_rules_both_ways(spark):
    """q017's rules certified both ways on constructed documents — the
    synthetic corpus never satisfies the stopword rule (its vocabulary
    has no two Gopher stopwords), so without this the intersect logic
    could silently degrade to constant-false."""
    from warcraider_spark.operators.text import gopher_rule_table

    good = "the cat sat with a friend and that was that " * 8  # 80 tokens
    bad_stop = "alpha beta gamma delta " * 20  # 80 tokens, no stopwords
    bullets = "the bull and that pen\n" + "\n".join("- item %d" % i for i in range(19))
    ellipsis = "the start and that end\n" + "\n".join(
        "line %d trails ..." % i for i in range(9)
    )
    df = spark.createDataFrame(
        [(0, good), (1, bad_stop), (2, "the of"), (3, bullets), (4, ellipsis)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in gopher_rule_table(df).collect()}
    assert rows[0].stopword_ok and rows[0].word_count_ok and rows[0].kept
    assert not rows[1].stopword_ok and not rows[1].kept
    assert rows[1].word_count_ok  # fails ONLY the stopword rule
    assert rows[2].stopword_ok and not rows[2].word_count_ok  # 2 tokens
    # 19 of 20 lines bulleted = 95% > 90% threshold
    assert not rows[3].bullet_lines_ok
    # 9 of 10 lines end in ellipsis = 90% > 30% threshold
    assert not rows[4].ellipsis_lines_ok
