"""Reliable-checkpoint option for iterative operators (VERDICT r4 note #3):
cut_lineage uses localCheckpoint by default and fault-tolerant checkpoint()
when a directory is configured — executor loss then costs one partition
recompute instead of the whole job. Both paths must produce identical
results, and the reliable path must actually write checkpoint data."""

from __future__ import annotations

from warcraider_spark.lineage import (
    clear_reliable_checkpoint_dir,
    cut_lineage,
    reliable_checkpoint_dir,
    set_reliable_checkpoint_dir,
)
from warcraider_spark.registry import all_specs

ITERATIVE = ("q134_connected_components", "q046_kmeans_codebook", "q159_pagerank")


def test_dir_resolution(monkeypatch):
    monkeypatch.delenv("WARCRAIDER_CHECKPOINT_DIR", raising=False)
    clear_reliable_checkpoint_dir()
    assert reliable_checkpoint_dir() is None
    monkeypatch.setenv("WARCRAIDER_CHECKPOINT_DIR", "/ckpt/env")
    assert reliable_checkpoint_dir() == "/ckpt/env"
    set_reliable_checkpoint_dir("/ckpt/explicit")  # explicit beats env
    try:
        assert reliable_checkpoint_dir() == "/ckpt/explicit"
        # explicit None DISABLES even with the env var set (ADVICE r5)
        set_reliable_checkpoint_dir(None)
        assert reliable_checkpoint_dir() is None
    finally:
        clear_reliable_checkpoint_dir()
    assert reliable_checkpoint_dir() == "/ckpt/env"  # clear restores env fallback


def test_iterative_ops_identical_through_both_paths(spark, sf_smoke, tmp_path):
    """CC (large-star/small-star loop) and k-means (Lloyd loop) through
    localCheckpoint AND reliable checkpoint(): identical rows, and the
    reliable run leaves RDD checkpoint files in the directory."""
    specs = all_specs()
    local_rows = {
        n: sorted(tuple(r) for r in specs[n].builder(spark, sf_smoke).collect())
        for n in ITERATIVE
    }
    ckpt = tmp_path / "reliable"
    set_reliable_checkpoint_dir(str(ckpt))
    try:
        for n in ITERATIVE:
            rows = sorted(tuple(r) for r in specs[n].builder(spark, sf_smoke).collect())
            assert rows == local_rows[n], n
        written = [p for p in ckpt.rglob("*") if p.is_file()]
        assert written, "reliable path must materialize checkpoint files"
    finally:
        set_reliable_checkpoint_dir(None)


def test_cut_lineage_truncates_plan(spark):
    """The reason the helper exists: after cut_lineage the logical plan is
    a scan of checkpointed data, not the original expression tree."""
    from pyspark.sql import functions as F

    df = spark.range(100).select((F.col("id") * 2).alias("x"))
    cut = cut_lineage(df)
    assert "LogicalRDD" in cut._jdf.queryExecution().logical().toString()
