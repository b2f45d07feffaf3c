"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All three functions are thin views over ``warcraider_spark.registry`` —
the engine's single source of truth for the declared query surface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from warcraider_spark.registry import all_specs  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the composed training-data pipeline
    (quality filter → exact dedup → per-bucket accounting in ONE plan —
    the BASELINE.json north star)."""
    spec = all_specs()["q174_training_data_pipeline"]
    return spec.builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.builder for name, spec in sorted(all_specs().items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return {name: spec.oracle for name, spec in sorted(all_specs().items()) if spec.oracle is not None}
