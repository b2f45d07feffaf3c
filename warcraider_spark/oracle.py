"""Local replica of the driver's duckdb-oracle correctness check.

For each QuerySpec with an oracle: run the Spark builder and the DuckDB SQL
on the same parquet tables, then compare row count, schema shape, and an
order-insensitive value hash (columns sorted by name, rows sorted, floats
canonicalized). Used by tests/ so divergence is caught before the driver
runs CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import hashlib
import math
import os
from dataclasses import dataclass

import duckdb
from pyspark.sql import SparkSession

from warcraider_spark.registry import QuerySpec
from warcraider_spark.tables import TABLES

__all__ = ["OracleResult", "duckdb_connect", "run_oracle", "compare"]


@dataclass
class OracleResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(v: object) -> str:
    """Canonicalize a cell value for hashing (engine-neutral)."""
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        v += 0.0  # normalize IEEE -0.0 → +0.0 (string canons differ otherwise)
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.12g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def _hash_rows(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def run_oracle(spark: SparkSession, spec: QuerySpec, sf_dir: str) -> OracleResult:
    sdf = spec.builder(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    if spec.oracle is None:
        return OracleResult(spec.name, True, len(spark_rows), -1, "rows-only (no oracle)")

    con = duckdb_connect(sf_dir)
    try:
        cur = con.execute(spec.oracle)
        oracle_cols = [d[0] for d in cur.description]
        oracle_rows = [tuple(r) for r in cur.fetchall()]
    finally:
        con.close()

    return compare(spec.name, spark_cols, spark_rows, oracle_cols, oracle_rows)


def compare(
    name: str,
    spark_cols: list[str],
    spark_rows: list[tuple],
    oracle_cols: list[str],
    oracle_rows: list[tuple],
) -> OracleResult:
    if sorted(spark_cols) != sorted(oracle_cols):
        return OracleResult(
            name, False, len(spark_rows), len(oracle_rows),
            f"schema mismatch: spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}",
        )
    if len(spark_rows) != len(oracle_rows):
        return OracleResult(
            name, False, len(spark_rows), len(oracle_rows),
            f"row count mismatch: {len(spark_rows)} vs {len(oracle_rows)}",
        )
    hs = _hash_rows(spark_cols, spark_rows)
    ho = _hash_rows(oracle_cols, oracle_rows)
    if hs != ho:
        # find first differing row for debuggability
        order_s = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
        order_o = sorted(range(len(oracle_cols)), key=lambda i: oracle_cols[i])
        ls = sorted("|".join(_canon(r[i]) for i in order_s) for r in spark_rows)
        lo = sorted("|".join(_canon(r[i]) for i in order_o) for r in oracle_rows)
        diff = next(
            (f"spark={a!r} oracle={b!r}" for a, b in zip(ls, lo) if a != b),
            "tail rows differ",
        )
        return OracleResult(name, False, len(spark_rows), len(oracle_rows), f"value hash mismatch; first diff: {diff}")
    return OracleResult(name, True, len(spark_rows), len(oracle_rows), "hash match")
