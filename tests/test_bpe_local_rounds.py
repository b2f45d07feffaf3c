"""r14: the BPE merge rounds run executor-LOCALLY by default (one task
over the ≤BPE_VOCAB_TOP-row vocabulary) instead of one distributed
pair-count shuffle + top-1 + broadcast-replace trio per round. These
tests pin that the local path is output-identical to the distributed
loop — merges AND final segmented words — on the real corpus and on a
constructed tie-heavy vocabulary, and that the empty-vocabulary edge
emits zero rows rather than erroring."""

from __future__ import annotations

from warcraider_spark.operators.text import (
    BPE_MERGES,
    _bpe_rounds_local,
    _bpe_train,
)


def _distributed_rounds_on(spark, words_rows):
    """Run the distributed per-round loop on an explicit vocabulary."""
    from pyspark.sql import functions as F

    from warcraider_spark.lineage import cut_lineage
    from warcraider_spark.operators.text import _bpe_pair_counts

    words = spark.createDataFrame(words_rows, "s string, cnt long").transform(
        cut_lineage
    )
    merges = []
    for i in range(1, BPE_MERGES + 1):
        best = (
            _bpe_pair_counts(words)
            .orderBy(F.desc("pc"), "l", "r")
            .limit(1)
            .transform(cut_lineage)
        )
        merges.append(best)
        words = (
            words.crossJoin(F.broadcast(best.select("l", "r")))
            .select(
                F.expr(
                    "replace(s, concat('<', l, '><', r, '>'),"
                    " concat('<', l, r, '>'))"
                ).alias("s"),
                "cnt",
            )
            .transform(cut_lineage)
        )
    rows = []
    for i, b in enumerate(merges, start=1):
        for r in b.collect():
            rows.append((i, r["l"], r["r"], r["l"] + r["r"], r["pc"]))
    final = sorted((r["s"], r["cnt"]) for r in words.collect())
    return final, rows


def test_local_equals_distributed_on_corpus(spark, sf_correct):
    words_df, merge_rows = _bpe_train(spark, sf_correct, distributed_rounds=True)
    dist_merges = sorted(
        tuple(r)
        for m in merge_rows
        for r in m.collect()
    )
    dist_final = sorted((r["s"], r["cnt"]) for r in words_df.collect())

    lwords_df, lmerges = _bpe_train(spark, sf_correct)
    local_merges = sorted(tuple(r) for m in lmerges for r in m.collect())
    local_final = sorted((r["s"], r["cnt"]) for r in lwords_df.collect())

    assert local_merges == dist_merges
    assert local_final == dist_final
    assert len(local_merges) == BPE_MERGES


def test_local_equals_distributed_on_tie_heavy_vocab(spark):
    # counts engineered so several pairs tie on pc and the (l, r)
    # lexicographic tie-break decides — the risk point of any rewrite
    rows = [
        ("<a><b>", 4),
        ("<a><c>", 4),
        ("<b><a>", 4),
        ("<a><b><a><b>", 2),
        ("<c>", 9),
        ("<z><z><z>", 3),
    ]
    dist_final, dist_merges = _distributed_rounds_on(spark, rows)
    final_local, merges_local = _bpe_rounds_local(rows)
    assert sorted(final_local) == dist_final
    assert [tuple(m) for m in merges_local] == dist_merges


def test_empty_vocabulary_emits_zero_rows(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sf_empty"
    d.mkdir()
    # only doc_id/text are read by the trainer, so a minimal empty file
    # with those columns suffices
    pq.write_table(
        pa.table({"doc_id": pa.array([], "int64"),
                  "text": pa.array([], "string"),
                  "n_chars": pa.array([], "int32"),
                  "lang": pa.array([], "string")}),
        str(d / "documents.parquet"),
    )
    words_df, merge_rows = _bpe_train(spark, str(d))
    assert merge_rows[0].count() == 0
    assert words_df.count() == 0
