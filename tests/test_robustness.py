"""Production-robustness behaviors a long-lived 100 TB lake hits weekly:
schema evolution across parquet batches, and corrupt-file tolerance.

These are engine behaviors (reader options), not operators — pinned here
so an upgrade that silently changes them fails CI."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT
from warcraider_spark.tables import load_table


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Day-1 files lack a column day-2 files carry: mergeSchema=true must
    union the schemas and null-fill the missing column — the append-only
    evolution pattern (never rewrite 100 TB to add a column)."""
    path = os.path.join(str(tmp_path), "evolving")
    docs = load_table(spark, SF_CORRECT, "documents")
    docs.select("doc_id", "lang").write.parquet(os.path.join(path, "day=1"))
    docs.select("doc_id", "lang", F.col("n_chars").alias("quality")).write.parquet(
        os.path.join(path, "day=2")
    )

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"doc_id", "lang", "quality", "day"}
    n = docs.count()
    assert merged.count() == 2 * n
    # day-1 rows surface the evolved column as NULL, day-2 rows keep values
    assert merged.filter((F.col("day") == 1) & F.col("quality").isNotNull()).count() == 0
    assert merged.filter((F.col("day") == 2) & F.col("quality").isNull()).count() == 0

    # without mergeSchema Spark picks one footer; the evolved column must
    # not be silently assumed present in both
    single = spark.read.parquet(path)
    assert set(single.columns) <= {"doc_id", "lang", "quality", "day"}


def test_ignore_corrupt_files(spark, tmp_path):
    """One truncated file in a 10k-file directory must not kill the job
    when ignoreCorruptFiles is on — and MUST kill it when off (silent
    data loss is worse than a failure unless explicitly opted into)."""
    path = os.path.join(str(tmp_path), "mixed")
    docs = load_table(spark, SF_CORRECT, "documents").select("doc_id", "lang")
    docs.write.parquet(path)
    bad = os.path.join(path, "part-corrupt.parquet")
    with open(bad, "wb") as fh:
        fh.write(b"PAR1this is not a real parquet file")

    good_count = docs.count()

    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try:
        assert spark.read.parquet(path).count() == good_count
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")

    with pytest.raises(Exception, match="[Cc]orrupt|[Ff]ooter|[Pp]arquet"):
        spark.read.parquet(path).count()


def test_cdc_chunking_is_shift_resistant(spark):
    """The property q136 exists for: prepending a sentence to a document
    re-aligns chunk boundaries after the insertion point, so most chunk
    hashes survive — while fixed-stride chunking (q100's scheme) shifts
    every downstream block. Also pins determinism: same text -> same
    chunks."""
    from pyspark.sql import functions as F

    from warcraider_spark.operators.dedup import cdc_chunks

    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "green bottles stand quietly on the old stone wall near the "
        "river where children played every warm summer afternoon until "
        "sunset painted the entire valley in shades of amber and gold "
        "and the church bells rang across the quiet fields once more"
    ) * 3
    shifted = "breaking news inserted here. " + base
    df = spark.createDataFrame(
        [(1, base), (2, shifted), (3, base)], "doc_id long, text string"
    )
    rows = cdc_chunks(df).groupBy("doc_id").agg(
        F.collect_list("chunk").alias("chunks")
    ).collect()
    by_id = {r["doc_id"]: r["chunks"] for r in rows}
    assert by_id[1] == by_id[3]  # deterministic
    shared = set(by_id[1]) & set(by_id[2])
    # the insertion destroys at most the chunks up to the first boundary
    # after it; the majority of base chunks must re-align and survive
    assert len(shared) >= len(set(by_id[1])) * 0.6, (len(shared), len(set(by_id[1])))


def test_table_row_count_matches_scan_and_handles_directories(spark, tmp_path):
    """tables.table_row_count (VERDICT r6 #8) must equal the full-scan
    count on the single-file driver layout AND on a Spark-written
    directory-of-parts layout (footer sum over part files)."""
    from warcraider_spark.tables import table_row_count

    n_footer = table_row_count(SF_CORRECT, "documents")
    n_scan = load_table(spark, SF_CORRECT, "documents").count()
    assert n_footer == n_scan

    # Spark-written directory layout under a sf_dir-shaped tmp dir
    d = tmp_path / "sfdir"
    d.mkdir()
    load_table(spark, SF_CORRECT, "documents").repartition(4).write.parquet(
        str(d / "documents.parquet")
    )
    assert table_row_count(str(d), "documents") == n_scan

    with pytest.raises(KeyError):
        table_row_count(SF_CORRECT, "not_a_table")
