"""q001_winnowing_dedup_keep (NEW r13): the end-to-end substring-dedup
keep decision — winnowing pairs → connected-component clusters →
longest-document canonical election — pinned on hand-built corpora
where the cluster structure and the election are known by construction."""

from __future__ import annotations

import random
import string

from pyspark.sql import functions as F

from warcraider_spark.operators.dedup import (
    WINNOW_DF_CAP,
    winnowing_dedup_keep,
    winnowing_pairs,
)


def _rand_text(rng: random.Random, n: int) -> str:
    return "".join(rng.choice(string.ascii_lowercase + " ") for _ in range(n))


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _out(df):
    return {
        r.canonical_doc_id: (r.n_members, r.n_removed, r.chars_removed, r.removed_checksum)
        for r in df.collect()
    }


def test_transitive_cluster_and_longest_canonical(spark):
    """A-B share run X, B-C share run Y (A and C share NOTHING): one
    transitive cluster of three; the canonical is the LONGEST text."""
    rng = random.Random(41)
    x = _rand_text(rng, 60)
    y = _rand_text(rng, 60)
    a = x + _rand_text(rng, 10)                       # len 70
    b = x + _rand_text(rng, 30) + y                   # len 150 — longest
    c = y + _rand_text(rng, 20)                       # len 80
    d = _rand_text(rng, 200)                          # unrelated singleton
    df = winnowing_dedup_keep(_docs(spark, [(1, a), (2, b), (3, c), (4, d)]))
    got = _out(df)
    # doc 4 is in no pair → no cluster row; docs 1-3 form ONE cluster
    assert got == {2: (3, 2, len(a) + len(c), 1 + 3)}
    # sanity: A and C really share no pair directly
    pairs = {
        (r.doc_a, r.doc_b)
        for r in winnowing_pairs(_docs(spark, [(1, a), (3, c)])).collect()
    }
    assert pairs == set()


def test_tie_breaks_to_smallest_doc_id(spark):
    """Equal-length twins: the smaller doc_id survives."""
    rng = random.Random(43)
    t = _rand_text(rng, 120)
    df = winnowing_dedup_keep(_docs(spark, [(7, t), (3, t), (9, t)]))
    assert _out(df) == {3: (3, 2, 2 * len(t), 7 + 9)}


def test_excerpt_dies_superset_survives(spark):
    """The substring-dup shape the election rule is FOR: a doc whose
    text is an excerpt of a longer one is removed, the superset kept."""
    rng = random.Random(47)
    full = _rand_text(rng, 300)
    excerpt = full[80:200]  # 120 chars, verbatim run ≥ 27
    df = winnowing_dedup_keep(_docs(spark, [(10, excerpt), (11, full)]))
    assert _out(df) == {11: (2, 1, len(excerpt), 10)}


def test_independent_clusters_stay_separate(spark):
    rng = random.Random(53)
    x, y = _rand_text(rng, 80), _rand_text(rng, 80)
    rows = [
        (1, x + "a" * 5),
        (2, x + "b" * 50),      # cluster 1 canonical (longer)
        (3, y + "c" * 9),
        (4, y),                  # cluster 2: 3 is longer
    ]
    got = _out(winnowing_dedup_keep(_docs(spark, rows)))
    assert set(got) == {2, 3}
    assert got[2][:2] == (2, 1) and got[3][:2] == (2, 1)


def test_df_capped_boilerplate_forms_no_cluster(spark):
    """Fingerprints over the df cap never form pairs, hence no clusters —
    the same C(n,2) guard the pair operator pins. IDENTICAL docs make
    every fingerprint's df exactly n > cap (prefixed variants would
    leak low-df boundary grams — prefix-tail + boiler-head — whose
    selection is position-dependent)."""
    rng = random.Random(59)
    boiler = _rand_text(rng, 70)
    rows = [(i, boiler) for i in range(1, WINNOW_DF_CAP + 3)]
    assert _out(winnowing_dedup_keep(_docs(spark, rows))) == {}


def test_plan_shape(spark):
    """No cartesian, no row-at-a-time Python, canonical election fused
    as max_by inside ONE aggregate on the cluster key; the composition
    consumes the UNORDERED pair stream (no global pair sort feeding the
    component contraction)."""
    rng = random.Random(61)
    t = _rand_text(rng, 150)
    docs = _docs(spark, [(1, t), (2, t + "zz")])
    df = winnowing_dedup_keep(docs)
    plan = df._jdf.queryExecution().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan
    assert "max_by" in plan
    # the pair stream enters the CC contraction without its cosmetic
    # global sort (ordered=False): no Sort over (doc_a, doc_b) exists
    phys = plan.split("== Physical Plan ==")[-1]
    assert "Sort [doc_a" not in phys
