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
    driver's pandas canonicalizer crashes on list cells (q034's r2 ERR), so
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
