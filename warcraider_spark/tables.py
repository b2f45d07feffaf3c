"""Synthetic-table loaders (the driver's TPC-H-ish star schema, TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under /root/testdata/sf*/.

Scale note: ``spark.read.parquet`` gives splittable columnar scans with
predicate pushdown + column pruning; at 100 TB the same call reads a
partitioned directory tree and prunes partitions — nothing here changes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "default_sf_dir",
    "table_row_count",
]

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# (session-id, sf_dir, table) → DataFrame. A DataFrame is an immutable lazy
# plan, so reuse is safe; caching skips the parquet footer-read job that
# spark.read.parquet schedules on every call (~0.3s × 90 queries in a
# driver correctness run).
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    if name == "events":
        # events.parquet stores timestamp[ns], which Spark's parquet reader
        # rejects. Set nanosAsLong here (runtime SQLConf) rather than in the
        # session factory so this works under ANY caller-provided session —
        # the correctness driver constructs its own.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # ts arrives as raw nanos (see session.py nanosAsLong); convert to
            # a proper TimestampType (micros) once at the scan boundary.
            # Integer division, NOT (ts / 1000).cast("long"): bigint `/`
            # promotes to double, whose 256ns ulp at ~1.8e18 rounds where
            # DuckDB's µs read truncates — a latent off-by-one on frame
            # boundaries (ADVICE r1).
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # Parquet timestamp[us] without isAdjustedToUTC infers as
            # TIMESTAMP_NTZ under Spark 4; watermarks/window state require
            # TimestampType (LTZ). Session tz is pinned to UTC (session.py),
            # so this cast is value-preserving — same wall clock, same
            # unix_micros — and matches what timestamp_micros produced when
            # the table shipped as int64 nanos.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    _TABLE_CACHE[key] = df
    return df


def table_row_count(sf_dir: str, name: str) -> int:
    """Row count straight from the parquet FOOTER — no Spark job, so
    builders that need a count for plan STRUCTURE (q039's band layout,
    q023's df-cap literal) stay side-effect-free at plan-construction
    time (VERDICT r6 #8: explain() on every builder launches zero jobs).
    At 100 TB the same number comes from table metadata — catalog
    statistics or a footer-sum over the manifest — never a full scan."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(path):  # Spark-written layout: sum the part footers
        return sum(
            pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    return pq.ParquetFile(path).metadata.num_rows


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() queries see them."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
